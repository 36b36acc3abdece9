"""Data-quality issue detection (ToDos): cross-source conflicts per alias.

Reference: pipelines/v2_improvers/compute_advisory_todo.py (1295 LoC) +
models.py:2450-2467 (ISSUE_TYPE_CHOICES, the full 9-type enum). Per alias
across datasources, detect: missing summary / affected / fixed / both,
conflicting affected / fixed / both package sets, conflicting CVSS
metrics (per-metric consensus, :781-838), conflicting weaknesses
(:577-657). Spark shape: groupBy(alias) + set-hash comparisons — one
shuffle on the alias key; per-metric consensus is an explode + two-level
aggregation (map-side combinable counts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# models.py:2450-2467 ISSUE_TYPE_CHOICES
ISSUE_MISSING_SUMMARY = "MISSING_SUMMARY"
ISSUE_MISSING_AFFECTED = "MISSING_AFFECTED_PACKAGE"
ISSUE_MISSING_FIXED = "MISSING_FIXED_BY_PACKAGE"
ISSUE_MISSING_BOTH = "MISSING_AFFECTED_AND_FIXED_BY_PACKAGES"
ISSUE_CONFLICTING_SEVERITY = "CONFLICTING_SEVERITY_SCORES"
ISSUE_CONFLICTING_AFFECTED = "CONFLICTING_AFFECTED_PACKAGES"
ISSUE_CONFLICTING_FIXED = "CONFLICTING_FIXED_BY_PACKAGES"
ISSUE_CONFLICTING_BOTH = "CONFLICTING_AFFECTED_AND_FIXED_BY_PACKAGES"
ISSUE_CONFLICTING_WEAKNESSES = "CONFLICTING_WEAKNESSES"

ISSUE_TYPES = (
    ISSUE_MISSING_SUMMARY, ISSUE_MISSING_AFFECTED, ISSUE_MISSING_FIXED,
    ISSUE_MISSING_BOTH, ISSUE_CONFLICTING_SEVERITY,
    ISSUE_CONFLICTING_AFFECTED, ISSUE_CONFLICTING_FIXED,
    ISSUE_CONFLICTING_BOTH, ISSUE_CONFLICTING_WEAKNESSES,
)

_AP_EMPTY = ("array<struct<package:string,affected_version_range:string,"
             "fixed_version:string>>")

# Pipelines whose advisories are ineligible for ToDo computation
# (models.py:3069-3073 todo_excluded + importers/__init__.py:134-138 —
# pipelines marked exclude_from_package_todo: enrichment/catalog sources
# that never carry package claims worth conflict-checking).
TODO_EXCLUDED_PIPELINES = (
    "alpine_linux_importer_v2", "epss_importer_v2",
    "fireeye_importer_v2", "mozilla_importer_v2",
    "nvd_importer_v2", "project-kb-msr-2019_v2",
    "suse_importer_v2", "vulnrichment_importer_v2", "xen_importer_v2",
    # reference pipeline_id spellings (aosp_importer.py:30,
    # linux_kernel_importer.py:32, project_kb_statements_importer.py):
    "aosp_dataset_fix_commits", "linux_kernel_cves_fix_commits",
    "project-kb-statements_v2",
    # legacy spellings kept for advisories ingested under earlier ids:
    "aosp_importer_v2", "linux_kernel_importer_v2",
    "project_kb_statements_importer_v2",
)


def todo_excluded(advisories: DataFrame) -> DataFrame:
    """Drop advisories from ToDo-excluded pipelines (models.py:3069-3073:
    ``exclude(pipeline_id__in=TODO_EXCLUDED_PIPELINES)`` → ``~isin``)."""
    return advisories.filter(
        ~F.col("pipeline_id").isin(*TODO_EXCLUDED_PIPELINES))


def per_advisory_issues(advisories: DataFrame) -> DataFrame:
    """Single-advisory completeness issues on each latest advisory
    (check_missing_summary :839-858 +
    check_missing_affected_and_fixed_by_packages :859-909: missing BOTH
    affected and fixed collapses to one MISSING_AFFECTED_AND_FIXED_BY_
    PACKAGES issue, not two)."""
    latest = advisories.filter(F.col("is_latest"))
    packages = F.coalesce("affected_packages", F.array().cast(_AP_EMPTY))
    has_affected = F.exists(packages,
                            lambda p: p["affected_version_range"].isNotNull())
    has_fixed = F.exists(packages, lambda p: p["fixed_version"].isNotNull())
    missing_pkg_issue = (
        F.when(~has_affected & ~has_fixed, F.lit(ISSUE_MISSING_BOTH))
        .when(~has_affected, F.lit(ISSUE_MISSING_AFFECTED))
        .when(~has_fixed, F.lit(ISSUE_MISSING_FIXED))
    )
    issues = F.filter(
        F.array(
            F.when(F.length(F.trim(F.coalesce("summary", F.lit("")))) == 0,
                   F.lit(ISSUE_MISSING_SUMMARY)),
            missing_pkg_issue,
        ),
        lambda x: x.isNotNull(),
    )
    return latest.select(
        "advisory_pk", "avid", F.explode(issues).alias("issue_type")
    )


def _alias_set_hashes(advisories: DataFrame) -> DataFrame:
    """(alias, advisory_pk, affected_hash, fixed_hash, weakness_hash):
    deterministic content hashes of each advisory's sorted affected-purl
    set, fixed-version set, and weakness set."""
    latest = advisories.filter(F.col("is_latest"))
    packages = F.coalesce("affected_packages", F.array().cast(_AP_EMPTY))
    # same null guard as the fixed set below: an entry with no affected
    # range (a fixed-only claim, common for distro trackers) must not
    # collapse to its bare package name via concat_ws's null-skip and
    # pollute the affected hash — the reference's affected sets hold
    # actual range claims only
    affected_set = F.array_sort(F.array_distinct(F.filter(
        F.transform(
            packages,
            lambda p: F.when(p["affected_version_range"].isNotNull(),
                             F.concat_ws("@", p["package"],
                                         p["affected_version_range"]))),
        lambda x: x.isNotNull())))
    # Guard the null fixed_version case explicitly: concat_ws SKIPS nulls,
    # so without the when() a package with no fixed version would collapse
    # to its bare name (non-null) and pollute the fixed-set hash — the
    # reference's fixed sets hold only actual fixed-by versions
    # (compute_advisory_todo.py:201).
    fixed_set = F.array_sort(F.array_distinct(F.filter(
        F.transform(packages,
                    lambda p: F.when(p["fixed_version"].isNotNull(),
                                     F.concat_ws("@", p["package"],
                                                 p["fixed_version"]))),
        lambda x: x.isNotNull())))
    weakness_set = F.array_sort(F.array_distinct(
        F.coalesce("weaknesses", F.array().cast("array<int>"))))
    return latest.select(
        F.explode("aliases").alias("alias"),
        "advisory_pk",
        F.md5(F.to_json(affected_set)).alias("affected_hash"),
        F.md5(F.to_json(fixed_set)).alias("fixed_hash"),
        F.md5(F.to_json(weakness_set)).alias("weakness_hash"),
    )


def conflicting_package_issues(advisories: DataFrame,
                               hashes: DataFrame | None = None) -> DataFrame:
    """Sources sharing an alias but disagreeing on package sets
    (check_conflicting_affected_and_fixed_by_packages_for_alias
    :933-1062): affected-only → CONFLICTING_AFFECTED_PACKAGES,
    fixed-only → CONFLICTING_FIXED_BY_PACKAGES, both →
    CONFLICTING_AFFECTED_AND_FIXED_BY_PACKAGES. Set disagreement
    (union != intersection) is equivalent to "not all per-advisory sets
    identical", i.e. countDistinct(set hash) > 1."""
    hashes = (_alias_set_hashes(advisories)
              if hashes is None else hashes)
    agg = hashes.groupBy("alias").agg(
        F.countDistinct("affected_hash").alias("n_affected"),
        F.countDistinct("fixed_hash").alias("n_fixed"),
        F.count(F.lit(1)).alias("n_advisories"),
    ).filter((F.col("n_advisories") > 1)
             & ((F.col("n_affected") > 1) | (F.col("n_fixed") > 1)))
    issue = (
        F.when((F.col("n_affected") > 1) & (F.col("n_fixed") > 1),
               F.lit(ISSUE_CONFLICTING_BOTH))
        .when(F.col("n_affected") > 1, F.lit(ISSUE_CONFLICTING_AFFECTED))
        .otherwise(F.lit(ISSUE_CONFLICTING_FIXED))
    )
    return agg.select("alias", "n_advisories", issue.alias("issue_type"))


def conflicting_weakness_issues(advisories: DataFrame,
                                hashes: DataFrame | None = None) -> DataFrame:
    """Sources sharing an alias but disagreeing on the CWE set
    (check_conflicting_weaknesses_for_alias :590-657 /
    compute_cwe_disagreement :577-588)."""
    hashes = (_alias_set_hashes(advisories)
              if hashes is None else hashes)
    return (
        hashes.groupBy("alias")
        .agg(F.countDistinct("weakness_hash").alias("n_variants"),
             F.count(F.lit(1)).alias("n_advisories"))
        .filter((F.col("n_advisories") > 1) & (F.col("n_variants") > 1))
        .select("alias", "n_variants",
                F.lit(ISSUE_CONFLICTING_WEAKNESSES).alias("issue_type"))
    )


def _sev_by_alias(latest: DataFrame) -> DataFrame:
    """(alias, advisory_pk, system, vector) — the shared alias×severity
    assembly every severity detector builds on; null/empty vectors (value-
    only severities) are dropped here once."""
    return latest.select(
        "advisory_pk",
        F.explode("aliases").alias("alias"),
    ).join(
        latest.select("advisory_pk", F.explode("severities").alias("s")),
        "advisory_pk",
    ).select(
        "alias", "advisory_pk",
        F.col("s.system").alias("system"),
        F.col("s.scoring_elements").alias("vector"),
    ).filter(F.col("vector").isNotNull() & (F.col("vector") != ""))


def conflicting_severity_issues(advisories: DataFrame) -> DataFrame:
    """Across SOURCES sharing an alias: distinct CVSS vectors for the same
    scoring system → conflict (compute_advisory_todo.py:658-759). Like
    the package/weakness detectors, a conflict needs >1 advisory — one
    advisory carrying two vectors for a system (NVD primary + CNA
    secondary) is not a cross-source disagreement."""
    sev = _sev_by_alias(advisories.filter(F.col("is_latest")))
    conflicts = (
        sev.groupBy("alias", "system")
        .agg(F.countDistinct("vector").alias("n_vectors"),
             F.countDistinct("advisory_pk").alias("n_advisories"))
        .filter((F.col("n_vectors") > 1) & (F.col("n_advisories") > 1))
    )
    return conflicts.select(
        "alias", "system", "n_vectors",
        F.lit(ISSUE_CONFLICTING_SEVERITY).alias("issue_type"),
    )


def all_todo_issues(advisories: DataFrame) -> DataFrame:
    """The full ToDo computation: one (key-columns, issue_type) frame per
    detector, unioned on the common (alias-or-avid, issue_type) shape —
    the ComputeToDo pipeline's complete output surface."""
    per_adv = per_advisory_issues(advisories).select(
        F.col("avid").alias("subject"), "issue_type")
    # ONE hash frame feeds both set-conflict detectors — the corpus is
    # scanned and hashed once, not once per detector
    hashes = _alias_set_hashes(advisories)
    pkg = conflicting_package_issues(advisories, hashes=hashes).select(
        F.col("alias").alias("subject"), "issue_type")
    weak = conflicting_weakness_issues(advisories, hashes=hashes).select(
        F.col("alias").alias("subject"), "issue_type")
    sev = conflicting_severity_issues(advisories).select(
        F.col("alias").alias("subject"), "issue_type")
    return per_adv.union(pkg).union(weak).union(sev)


def consensus_severity(advisories: DataFrame) -> DataFrame:
    """Majority-vote vector per (alias, system) with deterministic
    tie-break — the consensus the todo pipeline compares against.
    Null/empty vectors never vote (``_sev_by_alias`` drops them): two
    value-only severities must not outvote the one real vector into a
    NULL consensus."""
    sev = _sev_by_alias(advisories.filter(F.col("is_latest")))
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


def consensus_cvss_metrics(advisories: DataFrame) -> DataFrame:
    """Per-metric CVSS consensus (consensus_cvss_metrics :781-808): for
    each (alias, system), keep each vector metric key whose value is
    IDENTICAL across every reporting advisory — the agreement subset, not
    a majority vote. Output: (alias, system, metric, value) rows.

    Spark shape: explode the vector into metric key/value pairs, then one
    aggregation per (alias, system, metric) — a metric agrees only when
    its value is single AND every reporting vector carries it (a metric
    one vector states and the others omit is not consensus).
    """
    sev = _sev_by_alias(advisories.filter(F.col("is_latest")))
    n_vectors = sev.groupBy("alias", "system").agg(
        F.count(F.lit(1)).alias("n_vectors"))
    pairs = (
        sev.select(
            "alias", "system",
            F.explode(F.split(
                F.regexp_replace(F.col("vector"), r"^CVSS:[0-9.]+/", ""),
                "/")).alias("kv"),
        )
        .filter(F.col("kv").contains(":"))
        .select(
            "alias", "system",
            F.substring_index(F.col("kv"), ":", 1).alias("metric"),
            F.substring_index(F.col("kv"), ":", -1).alias("value"),
        )
    )
    return (
        pairs.groupBy("alias", "system", "metric")
        .agg(F.countDistinct("value").alias("n_values"),
             F.count(F.lit(1)).alias("n_stated"),
             F.min("value").alias("value"))
        .join(n_vectors, ["alias", "system"])
        .filter((F.col("n_values") == 1)
                & (F.col("n_stated") == F.col("n_vectors")))
        .select("alias", "system", "metric", "value")
    )
