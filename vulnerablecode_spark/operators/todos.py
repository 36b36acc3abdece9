"""Data-quality issue detection (ToDos): cross-source conflicts per alias.

Reference: pipelines/v2_improvers/compute_advisory_todo.py (1295 LoC) —
per alias across datasources, detect: missing summary / affected /
fixed packages, conflicting CVSS metrics (consensus majority vote,
:781-838), conflicting severity scores. Spark shape: groupBy(alias) +
collect_list(struct) + array comparisons — one shuffle on the alias key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

ISSUE_MISSING_SUMMARY = "MISSING_SUMMARY"
ISSUE_MISSING_AFFECTED = "MISSING_AFFECTED_PACKAGE"
ISSUE_MISSING_FIXED = "MISSING_FIXED_BY_PACKAGE"
ISSUE_CONFLICTING_SEVERITY = "CONFLICTING_SEVERITY_SCORES"
ISSUE_CONFLICTING_AFFECTED = "CONFLICTING_AFFECTED_PACKAGES"


def per_advisory_issues(advisories: DataFrame) -> DataFrame:
    """Single-advisory completeness issues (todo checks on each latest
    advisory)."""
    latest = advisories.filter(F.col("is_latest"))
    has_fixed = F.exists("affected_packages", lambda p: p["fixed_version"].isNotNull())
    issues = F.filter(
        F.array(
            F.when(F.length(F.trim(F.coalesce("summary", F.lit("")))) == 0,
                   F.lit(ISSUE_MISSING_SUMMARY)),
            F.when(F.size(F.coalesce("affected_packages",
                                     F.array().cast("array<struct<package:string,affected_version_range:string,fixed_version:string>>"))) == 0,
                   F.lit(ISSUE_MISSING_AFFECTED)),
            F.when(~has_fixed, F.lit(ISSUE_MISSING_FIXED)),
        ),
        lambda x: x.isNotNull(),
    )
    return latest.select(
        "advisory_pk", "avid", F.explode(issues).alias("issue_type")
    )


def conflicting_severity_issues(advisories: DataFrame) -> DataFrame:
    """Across sources sharing an alias: distinct CVSS vectors for the same
    scoring system → conflict (compute_advisory_todo.py:781-838)."""
    latest = advisories.filter(F.col("is_latest"))
    sev = latest.select(
        "advisory_pk",
        F.explode("aliases").alias("alias"),
    ).join(
        latest.select("advisory_pk", F.explode("severities").alias("s")),
        "advisory_pk",
    ).select(
        "alias", F.col("s.system").alias("system"),
        F.col("s.scoring_elements").alias("vector"),
    ).filter(F.col("vector").isNotNull() & (F.col("vector") != ""))
    conflicts = (
        sev.groupBy("alias", "system")
        .agg(F.countDistinct("vector").alias("n_vectors"))
        .filter(F.col("n_vectors") > 1)
    )
    return conflicts.select(
        "alias", "system", "n_vectors",
        F.lit(ISSUE_CONFLICTING_SEVERITY).alias("issue_type"),
    )


def consensus_severity(advisories: DataFrame) -> DataFrame:
    """Majority-vote vector per (alias, system) with deterministic
    tie-break — the consensus the todo pipeline compares against."""
    latest = advisories.filter(F.col("is_latest"))
    sev = latest.select(F.explode("aliases").alias("alias"), "advisory_pk").join(
        latest.select("advisory_pk", F.explode("severities").alias("s")),
        "advisory_pk",
    ).select("alias", F.col("s.system").alias("system"),
             F.col("s.scoring_elements").alias("vector"))
    counts = sev.groupBy("alias", "system", "vector").agg(
        F.count(F.lit(1)).alias("votes")
    )
    w = Window.partitionBy("alias", "system").orderBy(
        F.col("votes").desc(), F.col("vector").asc()
    )
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("alias", "system", F.col("vector").alias("consensus_vector"), "votes")
    )


def conflicting_affected_issues(advisories: DataFrame) -> DataFrame:
    """Sources sharing an alias but disagreeing on the affected package
    set (different purl+range content hashes)."""
    latest = advisories.filter(F.col("is_latest"))
    content = latest.select(
        "advisory_pk",
        F.explode("aliases").alias("alias"),
        F.md5(F.to_json(F.array_sort("affected_packages"))).alias("content_hash"),
    )
    return (
        content.groupBy("alias")
        .agg(F.countDistinct("content_hash").alias("n_variants"))
        .filter(F.col("n_variants") > 1)
        .select("alias", "n_variants",
                F.lit(ISSUE_CONFLICTING_AFFECTED).alias("issue_type"))
    )
