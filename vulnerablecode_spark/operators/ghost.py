"""Ghost-package flagging: package versions absent upstream.

Reference: flag_ghost_packages.py:36-90 — per purl group, versions not in
the upstream version list get is_ghost=true (leading v/V stripped before
comparing); ghosts are excluded from fixing/non-vulnerable results
(models.py:818, api.py:369-371). Spark shape: left-anti join against the
package_versions dimension on (base_purl, cleaned version).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _cleaned(version_col: str) -> F.Column:
    return F.regexp_replace(F.regexp_replace(F.col(version_col), r"\s+", ""),
                            r"^[vV]", "")


def flag_ghost_packages(packages: DataFrame,
                        package_versions: DataFrame) -> DataFrame:
    """Recompute is_ghost for every package row.

    Only purls COVERED by the version dimension can be flagged: a base
    purl with no dimension rows at all means its upstream version list
    could not be fetched (unsupported ecosystem / fetch error), and the
    reference skips those rather than flagging them
    (flag_ghost_packages.py:74-77 ``known_versions is None → return 0``)
    — otherwise an entire unfetchable ecosystem would read as ghost and
    vanish from fixing/non-vulnerable results."""
    base_purl = F.regexp_replace("package_url", r"@[^@]*$", "")
    known = package_versions.select(
        F.col("base_purl").alias("k_purl"), _cleaned("version").alias("k_version")
    ).distinct()
    covered = known.select(F.col("k_purl").alias("c_purl")).distinct()
    flagged = (
        packages.withColumn("_purl", base_purl)
        .withColumn("_v", _cleaned("version"))
        .join(
            known,
            (F.col("_purl") == known.k_purl) & (F.col("_v") == known.k_version),
            "left",
        )
        .join(covered, F.col("_purl") == F.col("c_purl"), "left")
        .withColumn(
            "is_ghost",
            F.col("c_purl").isNotNull() & F.col("k_purl").isNull(),
        )
        .drop("_purl", "_v", "k_purl", "k_version", "c_purl")
    )
    return flagged
