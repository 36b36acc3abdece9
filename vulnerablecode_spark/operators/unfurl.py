"""Unfurl: materialize concrete affected/fixed packages from vers ranges.

Reference: UnfurlVersionRangePipeline (unfurl_version_range.py:33-212) —
for each ImpactedPackage, fetch the upstream version list per base purl,
keep versions inside affecting_vers, bulk-create PackageV2 rows + bridges,
stamp watermarks. Spark shape (SURVEY.md §2.3): equi-join impacts to the
``package_versions`` dimension on base_purl (bounded fan-out per package),
filter with the Arrow-batched containment UDF, derive package rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vulnerablecode_spark.functions.version_funcs import version_in_range


def stale_impacts(impacts: DataFrame, reunfurl_after_days: int = 2) -> DataFrame:
    """Incremental selection: never-unfurled or stale rows
    (impacted_package_qs, unfurl_version_range.py:201-212)."""
    cutoff = F.current_timestamp() - F.expr(f"INTERVAL {reunfurl_after_days} DAYS")
    return impacts.filter(
        F.col("last_range_unfurl_at").isNull()
        | (F.col("last_range_unfurl_at") <= cutoff)
    )


def unfurl_affected(impacts: DataFrame, package_versions: DataFrame) -> DataFrame:
    """(impact_pk, base_purl, version) rows for every upstream version
    inside the affecting range. Rows with `*`/empty constraints unfurl to
    nothing but still count as processed (FIXTURES.md §4.5 — handled by
    the caller stamping watermarks on ALL selected impacts)."""
    from vulnerablecode_spark import ensure_shipped

    ensure_shipped(impacts.sparkSession)
    candidates = impacts.select(
        "impact_pk", "advisory_pk", "base_purl", "affecting_vers"
    ).filter(F.col("affecting_vers").isNotNull()).join(
        package_versions.select("base_purl", "version"), "base_purl"
    )
    return candidates.withColumn(
        "in_range", version_in_range(F.col("version"), F.col("affecting_vers"))
    ).filter(F.col("in_range") == True).drop("in_range")  # noqa: E712


def materialize_packages(unfurled: DataFrame) -> DataFrame:
    """Distinct (base_purl, version) → PACKAGE rows with canonical purl
    columns (bulk_get_or_create_from_purls, unfurl_version_range.py:173-186).
    purl fields come from string ops on the already-canonical base_purl —
    the parse UDF ran at ingest, not here."""
    pkgs = unfurled.select("base_purl", "version").distinct()
    no_prefix = F.regexp_replace("base_purl", r"^pkg:", "")
    segments = F.split(no_prefix, "/")

    # storage-key escaping mirrors kernel.purl._raw_escape on EVERY key
    # segment ('%' first), so the stored key always equals raw_purl()
    # of the same purl on the lookup side: version and the final (name)
    # segment of base_purl escape '%'/'@'/'?'/'#' ('/' too for the
    # version — a '/' inside a base_purl name is unrepresentable by
    # plain concatenation and documented out of scope in kernel.purl);
    # namespace segments escape only '%'/'?'/'#' ('@' is literal there,
    # matching _RAW_UNSAFE_NAMESPACE — npm scopes). Ordinary purls stay
    # byte-identical to plain concatenation.
    def _esc(col, pairs):
        for ch, code in pairs:
            col = F.replace(col, F.lit(ch), F.lit(code))
        return col

    _NS = (("%", "%25"), ("?", "%3F"), ("#", "%23"))
    _NAME = (("%", "%25"), ("@", "%40"), ("?", "%3F"), ("#", "%23"))
    _VER = _NAME + (("/", "%2F"),)

    base_segs = F.split("base_purl", "/")  # ["pkg:type", ns..., name]
    n_segs = F.size(base_segs)
    esc_base = F.array_join(
        F.transform(
            base_segs,
            lambda s, i: F.when(i == F.lit(0), s)
                          .when(i == n_segs - 1, _esc(s, _NAME))
                          .otherwise(_esc(s, _NS))),
        "/")
    esc_version = _esc(F.col("version"), _VER)
    key = F.concat(esc_base, F.lit("@"), esc_version)
    return pkgs.select(
        F.xxhash64("base_purl", "version").alias("package_pk"),
        segments[0].alias("type"),
        F.when(F.size(segments) > 2,
               F.array_join(F.slice(segments, 2, F.size(segments) - 2), "/")
               ).otherwise(F.lit("")).alias("namespace"),
        F.element_at(segments, -1).alias("name"),
        F.col("version"),
        F.lit("").alias("qualifiers"),
        F.lit("").alias("subpath"),
        key.alias("package_url"),
        key.alias("plain_package_url"),
        F.lit(False).alias("is_ghost"),
        F.lit(None).cast("string").alias("risk_score"),
        F.lit(0).alias("version_rank"),
    )


def affecting_bridge(unfurled: DataFrame) -> DataFrame:
    """impact↔package bridge rows (ImpactedPackageAffecting,
    models.py:3899-3921)."""
    return unfurled.select(
        "impact_pk",
        F.xxhash64("base_purl", "version").alias("package_pk"),
        F.lit("affecting").alias("relation"),
    ).distinct()


def fixed_package_rows(impacts: DataFrame, package_versions: DataFrame) -> DataFrame:
    """(impact_pk, base_purl, version) for fixed versions confirmed to
    exist upstream (exact-purl extraction, pipes/advisory.py:380-419)."""
    fixed = impacts.filter(F.col("fixed_version").isNotNull()).select(
        "impact_pk", "base_purl", F.col("fixed_version").alias("version")
    )
    return fixed.join(package_versions.select("base_purl", "version"),
                      ["base_purl", "version"], "left_semi")


def fixed_by_bridge(impacts: DataFrame, package_versions: DataFrame) -> DataFrame:
    """impact↔package bridge for fixing packages."""
    return fixed_package_rows(impacts, package_versions).select(
        "impact_pk",
        F.xxhash64("base_purl", "version").alias("package_pk"),
        F.lit("fixed_by").alias("relation"),
    ).distinct()


def unfurled_package_universe(unfurled: DataFrame, impacts: DataFrame,
                              package_versions: DataFrame) -> DataFrame:
    """All package rows the unfurl materializes: affected versions PLUS
    confirmed fixed versions (the reference creates PackageV2 rows for
    both, pipes/advisory.py:380-419)."""
    affected = unfurled.select("base_purl", "version")
    fixed = fixed_package_rows(impacts, package_versions).select(
        "base_purl", "version")
    return materialize_packages(affected.unionByName(fixed))


def stamp_watermarks(impacts: DataFrame, processed_impacts: DataFrame) -> DataFrame:
    """Set last_range_unfurl_at on processed rows (timestamp watermark
    updates, unfurl_version_range.py:106-124)."""
    done = processed_impacts.select("impact_pk").distinct().withColumn(
        "_done", F.lit(True)
    )
    return (
        impacts.join(done, "impact_pk", "left")
        .withColumn(
            "last_range_unfurl_at",
            F.when(F.col("_done"), F.current_timestamp())
            .otherwise(F.col("last_range_unfurl_at")),
        )
        .drop("_done")
    )


def mark_all_impacts_unfurled(advisories: DataFrame, impacts: DataFrame,
                              recheck_after_days: int = 30) -> DataFrame:
    """Advisory-level unfurl watermarks: mark latest advisories whose
    impacts have ALL been attempted / ALL succeeded.

    Reference: MarkUnfurlVersionRangePipeline
    (v2_improvers/mark_unfurl_version_range.py:31-125) — an advisory gets
    ``_all_impacts_unfurled_at`` once no impact is missing
    ``last_range_unfurl_at`` (re-checked past a 30-day cutoff), and
    ``_all_impacts_unfurled_successfully_at`` once every impact also has
    ``last_successful_range_unfurl_at``. The reference walks advisories in
    1000-row batches with per-batch Exists subqueries; the Spark shape is
    ONE aggregation over the impacts (two bool_and lanes — all-attempted /
    all-succeeded — in the same groupBy) joined to the latest advisories,
    so marking 10^9 advisories is a single shuffle on advisory_pk.

    ``impacts`` may carry ``last_successful_range_unfurl_at``; without it
    (the engine's base IMPACT schema tracks attempts only) success falls
    back to attempted.
    """
    success_col = ("last_successful_range_unfurl_at"
                   if "last_successful_range_unfurl_at" in impacts.columns
                   else "last_range_unfurl_at")
    per_adv = impacts.groupBy("advisory_pk").agg(
        F.bool_and(F.col("last_range_unfurl_at").isNotNull())
         .alias("_all_attempted"),
        F.bool_and(F.col(success_col).isNotNull()).alias("_all_succeeded"),
    )
    cutoff = F.current_timestamp() - F.expr(
        f"INTERVAL {recheck_after_days} DAYS")
    eligible = (
        F.col("is_latest")
        & F.col("_all_impacts_unfurled_successfully_at").isNull()
        & (F.col("_all_impacts_unfurled_at").isNull()
           | (F.col("_all_impacts_unfurled_at") < cutoff))
    )
    base = advisories
    for col in ("_all_impacts_unfurled_at",
                "_all_impacts_unfurled_successfully_at"):
        if col not in base.columns:
            base = base.withColumn(col, F.lit(None).cast("timestamp"))
    marked = (
        base.join(per_adv, "advisory_pk", "left")
        # materialize eligibility BEFORE either watermark update: chained
        # withColumns would otherwise re-evaluate it against the column
        # the first update just wrote
        .withColumn("_eligible", eligible)
        # coalesce(True): the reference's rule is NOT-Exists(impact still
        # missing a watermark) — vacuously TRUE for an advisory with zero
        # impacts (scoring-only advisories), which must be marked once
        # rather than re-selected forever
        .withColumn(
            "_all_impacts_unfurled_at",
            F.when(F.col("_eligible")
                   & F.coalesce("_all_attempted", F.lit(True)),
                   F.current_timestamp())
            .otherwise(F.col("_all_impacts_unfurled_at")),
        )
        .withColumn(
            "_all_impacts_unfurled_successfully_at",
            F.when(F.col("_eligible")
                   & F.coalesce("_all_succeeded", F.lit(True)),
                   F.current_timestamp())
            .otherwise(F.col("_all_impacts_unfurled_successfully_at")),
        )
        .drop("_all_attempted", "_all_succeeded", "_eligible")
    )
    return marked
