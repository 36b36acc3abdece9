"""Improver compositions: exact-purl extraction and valid-versions
inference.

Reference semantics:
- get_exact_purls (improvers/default.py:87-141): from a vers range,
  versions mentioned in constraints that SATISFY the range become affected
  purls; ``!=`` constraint versions plus the declared fixed version become
  fixed purls. No upstream version list needed — zero-cost inferences.
- ValidVersionImprover (improvers/valid_versions.py:59-213): merge
  AffectedPackages per purl, resolve ranges against upstream versions
  published before the advisory date, match each affected version to its
  nearest fixed version, emit Inference rows with confidence.

Spark shape: exact extraction is an Arrow pandas UDF over the vers kernel
(per-row, no joins); valid-versions composes the unfurl join + the rank
windows already in the engine.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

MAX_CONFIDENCE = 100


@pandas_udf("affected array<string>, fixed array<string>")
def exact_versions_udf(ranges: pd.Series) -> pd.DataFrame:
    """Per vers range: (versions in constraints satisfying the range,
    '!='-constraint versions). Self-contained closure over the shipped
    kernel (ensure_shipped handles worker import)."""
    from vulnerablecode_spark.kernel.vers import VersError, contains, parse_vers

    affected_out, fixed_out = [], []
    for rng in ranges:
        affected: list[str] = []
        fixed: list[str] = []
        if rng:
            try:
                parsed = parse_vers(rng)
                for c in parsed.constraints:
                    if not c.version:
                        continue
                    if c.op == "!=":
                        fixed.append(c.version)
                    elif contains(parsed, c.version):
                        affected.append(c.version)
            except (VersError, ValueError):
                # unparseable/ill-formed range → no inference for this row;
                # anything else (bugs) must surface, not be swallowed
                pass
        affected_out.append(affected)
        fixed_out.append(fixed)
    return pd.DataFrame({"affected": affected_out, "fixed": fixed_out})


def exact_purl_inferences(impacts: DataFrame) -> DataFrame:
    """(impact_pk, advisory_pk, base_purl, affected_purls, fixed_purls)
    from constraint-mentioned versions only — confidence 100 (the
    reference emits these at MAX_CONFIDENCE)."""
    from vulnerablecode_spark import ensure_shipped

    ensure_shipped(impacts.sparkSession)
    extracted = impacts.withColumn(
        "exact", exact_versions_udf(F.col("affecting_vers"))
    )
    with_fixed = extracted.withColumn(
        "fixed_all",
        F.when(
            F.col("fixed_version").isNotNull(),
            F.array_union(F.col("exact.fixed"), F.array(F.col("fixed_version"))),
        ).otherwise(F.col("exact.fixed")),
    )
    mk = lambda vs: F.transform(vs, lambda v: F.concat(F.col("base_purl"), F.lit("@"), v))  # noqa: E731
    return with_fixed.select(
        "impact_pk", "advisory_pk", "base_purl",
        mk(F.col("exact.affected")).alias("affected_purls"),
        mk(F.col("fixed_all")).alias("fixed_purls"),
        F.lit(MAX_CONFIDENCE).alias("confidence"),
    ).filter(
        (F.size("affected_purls") > 0) | (F.size("fixed_purls") > 0)
    )


def backfill_summaries(vulnerabilities: DataFrame,
                       advisories: DataFrame,
                       alias_bridge: DataFrame) -> DataFrame:
    """Fill missing vulnerability summaries from the best advisory summary
    (populate_vulnerability_summary_pipeline.py): among the latest
    advisories sharing an alias with the vulnerability, take the longest
    non-empty summary (deterministic tie-break on summary text)."""
    candidate = (
        alias_bridge.join(
            advisories.filter(F.col("is_latest"))
            .select("advisory_pk", "summary")
            .filter(F.length(F.trim("summary")) > 0),
            "advisory_pk",
        )
        .groupBy("vulnerability_pk")
        .agg(F.max_by("summary", F.struct(F.length("summary"), F.col("summary")))
             .alias("best_summary"))
    )
    return (
        vulnerabilities.join(candidate, "vulnerability_pk", "left")
        .withColumn(
            "summary",
            F.when(F.length(F.trim(F.coalesce("summary", F.lit("")))) > 0,
                   F.col("summary")).otherwise(F.col("best_summary")),
        )
        .drop("best_summary")
    )


def valid_version_inferences(advisories: DataFrame, impacts: DataFrame,
                             package_versions: DataFrame) -> DataFrame:
    """ValidVersionImprover: unfurl ranges against versions released
    BEFORE the advisory's publication (improvers/valid_versions.py:69-82
    caps the candidate list at date_published), then pair each affected
    version with the impact's fixed version."""
    from vulnerablecode_spark import ensure_shipped
    from vulnerablecode_spark.functions.version_funcs import version_in_range

    ensure_shipped(impacts.sparkSession)
    dated = impacts.join(
        advisories.select("advisory_pk", "date_published"), "advisory_pk"
    )
    # candidate versions are scoped PER IMPACT: each impact only sees
    # versions released before ITS advisory's publication — pooling per
    # purl would leak later releases in through sibling impacts
    candidates = dated.join(
        package_versions.withColumnRenamed("version", "pv_version"),
        "base_purl",
    ).filter(
        F.col("release_date").isNull()
        | F.col("date_published").isNull()
        | (F.col("release_date") <= F.col("date_published"))
    )
    unfurled = candidates.withColumn(
        "in_range",
        version_in_range(F.col("pv_version"), F.col("affecting_vers")),
    ).filter(F.col("in_range") == True).withColumnRenamed(  # noqa: E712
        "pv_version", "version"
    )
    return unfurled.groupBy("impact_pk", "advisory_pk", "base_purl").agg(
        F.array_sort(F.collect_set(
            F.concat(F.col("base_purl"), F.lit("@"), F.col("version"))
        )).alias("affected_purls"),
        F.array_sort(F.collect_set(
            F.when(F.col("fixed_version").isNotNull(),
                   F.concat(F.col("base_purl"), F.lit("@"), F.col("fixed_version")))
        )).alias("fixed_purls"),
        F.lit(90).alias("confidence"),
    )


NO_ARCHIVE = "NO_ARCHIVE"


def urls_needing_archive(references: DataFrame) -> DataFrame:
    """The archive work list: http(s) reference URLs with no archive yet
    (ArchiveImproverPipeline.archive_urls,
    v2_improvers/archive_urls.py:37-48: ``archive_url IS NULL`` and not
    already flagged ``NO_ARCHIVE``). The Wayback fetch itself is external
    I/O — a fetcher materializes (url, archive_url) into a landing zone,
    like the engine's other fetch-bound sources."""
    base = references
    if "archive_url" not in base.columns:
        base = base.withColumn("archive_url", F.lit(None).cast("string"))
    return (
        base.filter(
            F.col("archive_url").isNull()
            & F.col("url").startswith("http")
        )
        .select("url").distinct()
    )


def apply_archive_urls(references: DataFrame, archives: DataFrame) -> DataFrame:
    """Merge fetched archive results back onto the references:
    found → the Wayback URL; attempted-but-missing → the ``NO_ARCHIVE``
    sentinel (archive_urls.py:49-60); rows already archived — or never
    attempted — keep their value. ``archives`` is (url, archive_url) from
    the landing zone, one row per ATTEMPTED url with a null archive_url
    for unreachable ones — dimension-sized next to the reference table,
    broadcast."""
    base = references
    if "archive_url" not in base.columns:
        base = base.withColumn("archive_url", F.lit(None).cast("string"))
    fetched = archives.select(
        "url", F.col("archive_url").alias("_fetched"),
        F.lit(True).alias("_attempted"))
    return (
        base.join(F.broadcast(fetched), "url", "left")
        .withColumn(
            "archive_url",
            F.when(F.col("archive_url").isNotNull(), F.col("archive_url"))
            .when(~F.col("url").startswith("http"), F.col("archive_url"))
            .when(F.col("_attempted").isNull(), F.col("archive_url"))
            .otherwise(F.coalesce(F.col("_fetched"), F.lit(NO_ARCHIVE))),
        )
        .drop("_fetched", "_attempted")
    )


def backfill_reference_ids(references: DataFrame,
                           url_col: str = "url",
                           id_col: str = "reference_id") -> DataFrame:
    """CveIdImprover — set a missing reference id from the reference URL
    (improvers/add_missing_refid.py:26-55): rows whose ``reference_id``
    is NULL/empty AND whose URL contains the NVD detail path (uppercase
    ``CVE-`` only, matching the reference's case-sensitive
    ``url__contains`` filter) get the ``CVE-\\d{4}-\\d{4,7}`` token
    extracted from the URL; every other row is untouched.

    Scale: a map-only projection — one regexp per interesting row, zero
    shuffles, zero joins; pushes nothing but survives anything.
    """
    extracted = F.regexp_extract(
        F.col(url_col), r"(CVE-\d{4}-\d{4,7})", 1)
    interesting = (
        (F.col(id_col).isNull() | (F.col(id_col) == ""))
        & F.col(url_col).contains("nvd.nist.gov/vuln/detail/CVE-")
    )
    return references.withColumn(
        id_col,
        F.when(interesting & (extracted != ""), extracted)
        .otherwise(F.col(id_col)),
    )
