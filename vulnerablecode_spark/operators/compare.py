"""Cross-source comparison: align the same package across N datasources.

Reference: vulntotal (vulntotal_cli.py:261-340, validator.py:39-70) — fan
the same purl out to multiple vulnerability databases, align results by
CVE, and report where the sources agree/disagree on affected ranges.

Spark shape: each source contributes (base_purl, cve, affecting_vers)
rows; a full outer join on (base_purl, cve) + per-source presence flags
and range-agreement columns gives the comparison matrix in one pass —
N sources means one union + one grouped pivot, not N² pairwise joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def source_claims(advisories: DataFrame, impacts: DataFrame,
                  datasource_id: str | None = None) -> DataFrame:
    """(datasource_id, base_purl, cve, affecting_vers) claims from one
    advisory corpus — CVE taken from aliases."""
    latest = advisories.filter(F.col("is_latest"))
    # apply the override BEFORE selecting it: the parameter exists for
    # corpora that LACK a datasource_id column, where selecting first
    # would raise on the unresolved name
    if datasource_id:
        latest = latest.withColumn("datasource_id", F.lit(datasource_id))
    cves = latest.select(
        "advisory_pk", "datasource_id",
        F.explode("aliases").alias("cve"),
    ).filter(F.col("cve").rlike(r"(?i)^CVE-\d{4}-\d{4,19}$"))
    claims = cves.join(
        impacts.select("advisory_pk", "base_purl", "affecting_vers"),
        "advisory_pk",
    )
    return claims.select("datasource_id", "base_purl", "cve",
                         "affecting_vers").distinct()


def compare_sources(claims: DataFrame) -> DataFrame:
    """Alignment matrix per (base_purl, cve): which sources report it,
    how many distinct ranges they claim, and whether they agree
    (validator.py:39-70 semantics, set-oriented)."""
    return (
        claims.groupBy("base_purl", "cve")
        .agg(
            F.array_sort(F.collect_set("datasource_id")).alias("sources"),
            F.countDistinct("datasource_id").cast("int").alias("n_sources"),
            F.countDistinct("affecting_vers").cast("int").alias("n_distinct_ranges"),
            F.array_sort(F.collect_set("affecting_vers")).alias("ranges"),
        )
        .withColumn(
            "agreement",
            F.when(F.col("n_sources") == 1, F.lit("single_source"))
            .when(F.col("n_distinct_ranges") == 1, F.lit("agree"))
            .otherwise(F.lit("conflict")),
        )
    )
