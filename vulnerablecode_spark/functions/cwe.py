"""CWE weakness dimension + validation.

Reference: models.py:512-586 — the Weakness model resolves every stored
``cwe_id`` against the cwe2 database (official MITRE catalog loaded from
the CWE CSV/XML exports) and drops/logs unknown ids; importers (e.g.
curl_importer.py:137-157) validate ids at parse time with ``db.get``.

Spark shape: the catalog is a broadcast DIMENSION — weaknesses explode to
(advisory, cwe_id) rows and validate via one broadcast join, never a
shuffle. ``load_cwe_catalog`` ingests the official MITRE CSV export
(what cwe2 wraps); ``default_cwe_catalog`` ships a curated embedded
subset of well-known ids (top-25s, common memory/web/crypto classes) so
validation works out of the box — point it at the full export in
deployment for complete coverage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Curated well-known CWE ids (categories the advisory corpus actually
# uses; MITRE top-25 across years + common weakness classes). The full
# official catalog loads via load_cwe_catalog.
KNOWN_CWE_IDS: tuple[int, ...] = (
    16, 17, 19, 20, 21, 22, 23, 36, 37, 41, 59, 61, 73, 74, 75, 76, 77, 78,
    79, 80, 81, 88, 89, 90, 91, 93, 94, 95, 96, 98, 99, 112, 113, 115, 116,
    117, 118, 119, 120, 121, 122, 123, 124, 125, 126, 127, 128, 129, 130,
    131, 134, 138, 140, 150, 157, 170, 172, 178, 184, 185, 190, 191, 193,
    197, 200, 203, 208, 209, 212, 228, 248, 250, 252, 259, 262, 263, 264,
    266, 267, 268, 269, 270, 271, 272, 273, 274, 276, 277, 281, 284, 285,
    287, 288, 289, 290, 294, 295, 297, 300, 303, 305, 306, 307, 311, 312,
    313, 319, 320, 321, 322, 323, 325, 326, 327, 328, 329, 330, 331, 335,
    336, 337, 338, 345, 346, 347, 348, 352, 354, 358, 362, 363, 365, 367,
    369, 377, 378, 379, 384, 385, 400, 401, 402, 404, 405, 407, 415, 416,
    417, 420, 425, 426, 427, 428, 434, 436, 440, 441, 444, 451, 457, 459,
    460, 467, 470, 471, 476, 477, 487, 489, 494, 497, 501, 502, 521, 522,
    523, 524, 525, 526, 532, 538, 547, 552, 564, 565, 567, 601, 610, 611,
    613, 614, 616, 617, 639, 640, 641, 642, 643, 645, 647, 648, 649, 650,
    652, 653, 657, 664, 665, 667, 668, 669, 670, 672, 674, 680, 681, 682,
    684, 688, 690, 693, 694, 697, 703, 704, 706, 707, 732, 749, 754, 755,
    759, 760, 763, 770, 772, 776, 787, 798, 805, 822, 824, 825, 829, 834,
    835, 838, 841, 842, 843, 862, 863, 908, 909, 912, 913, 915, 916, 917,
    918, 920, 921, 922, 923, 924, 925, 926, 939, 940, 941, 942, 943, 1004,
    1021, 1188, 1236, 1321, 1333, 1336, 1390, 1391, 1392, 1393, 1394, 1395,
)


def default_cwe_catalog(spark: SparkSession) -> DataFrame:
    """(cwe_id int) dimension from the embedded curated id set."""
    return spark.createDataFrame([(i,) for i in KNOWN_CWE_IDS], "cwe_id int")


def load_cwe_catalog(spark: SparkSession, csv_path: str) -> DataFrame:
    """Load the official MITRE CWE CSV export (the files cwe2 wraps,
    models.py:512-535 get_cwes): column ``CWE-ID`` → (cwe_id int)."""
    raw = spark.read.option("header", "true").csv(csv_path)
    id_col = "CWE-ID" if "CWE-ID" in raw.columns else raw.columns[0]
    return (
        raw.select(F.col(id_col).cast("int").alias("cwe_id"))
        .filter(F.col("cwe_id").isNotNull())
        .distinct()
    )


def validate_weaknesses(advisories: DataFrame, catalog: DataFrame,
                        key: str = "advisory_pk") -> DataFrame:
    """(key, weaknesses, invalid_weaknesses): weaknesses split into
    catalog-validated ids and dropped unknown ids (models.py:552-586 —
    the reference logs-and-skips unknown CWE ids when rendering).

    The catalog broadcast-joins the exploded ids; advisories with no
    weaknesses keep empty arrays.
    """
    exploded = advisories.select(
        key, F.explode_outer("weaknesses").alias("cwe_id"))
    checked = exploded.join(
        F.broadcast(catalog.withColumn("known", F.lit(True))),
        "cwe_id", "left")
    return checked.groupBy(key).agg(
        F.array_sort(F.collect_list(
            F.when(F.col("known"), F.col("cwe_id")))).alias("weaknesses"),
        F.array_sort(F.collect_list(
            F.when(~F.coalesce(F.col("known"), F.lit(False)) &
                   F.col("cwe_id").isNotNull(),
                   F.col("cwe_id")))).alias("invalid_weaknesses"),
    )
