"""Version-navigation operators over rank-encoded packages.

Reference semantics:
- next/latest non-vulnerable version (models.py:1031-1069): among the same
  purl group's non-vulnerable, non-ghost versions with rank strictly
  greater than the current row's — the first (next) and last (latest).
- nearest fixed version (models.py:1107-1147, utils.py:176-203): the as-of
  join — first fixed version above each affected version.

All operate on ``version_rank`` (functions/version_funcs.rank_versions)
so comparisons are integer windows, never version-string UDF calls
(SURVEY.md §2.11.1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

GROUP = ("type", "namespace", "name")


def with_non_vulnerable_versions(packages: DataFrame) -> DataFrame:
    """Annotate next_non_vulnerable and latest_non_vulnerable per row.

    One window pass: conditional min/max of candidate ranks over the
    strictly-following frame (ordered by version_rank), candidates =
    non-vulnerable ∧ non-ghost (models.py:1046-1069).
    """
    w = (
        Window.partitionBy(*GROUP)
        .orderBy("version_rank")
        .rangeBetween(1, Window.unboundedFollowing)
    )
    candidate_version = F.when(
        (~F.col("is_vulnerable")) & (~F.col("is_ghost")),
        F.struct("version_rank", "version"),
    )
    return (
        packages.withColumn("_next", F.min(candidate_version).over(w))
        .withColumn("_latest", F.max(candidate_version).over(w))
        .withColumn("next_non_vulnerable", F.col("_next.version"))
        .withColumn("latest_non_vulnerable", F.col("_latest.version"))
        .drop("_next", "_latest")
    )


def nearest_fixed_version(affected: DataFrame, fixed: DataFrame) -> DataFrame:
    """As-of join: for each affected (group, version_rank), the smallest
    fixed version with a strictly greater rank (utils.py:176-203 bisect →
    merge-sorted window, ONE shuffle on the group key, no self-join)."""
    a = affected.select(
        *GROUP, F.col("version").alias("affected_version"),
        F.col("version_rank").alias("rank"), F.lit(1).alias("is_probe"),
        F.lit(None).cast("string").alias("fixed_version"),
    )
    fx = fixed.select(
        *GROUP, F.lit(None).cast("string").alias("affected_version"),
        F.col("version_rank").alias("rank"), F.lit(0).alias("is_probe"),
        F.col("version").alias("fixed_version"),
    )
    merged = a.unionByName(fx)
    # walk ranks DESCENDING: the "first fixed above me" is the last fixed
    # seen so far; fixed rows at the SAME rank must not match (strictly
    # greater), so probes order before fixes at equal rank on the way down.
    w = (
        Window.partitionBy(*GROUP)
        .orderBy(F.col("rank").desc(), F.col("is_probe").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        merged.withColumn("nearest_fix",
                          F.last("fixed_version", ignorenulls=True).over(w))
        .filter(F.col("is_probe") == 1)
        .select(*GROUP, "affected_version", F.col("nearest_fix").alias("fixed_version"))
    )
