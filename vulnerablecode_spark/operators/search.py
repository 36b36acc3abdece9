"""Search operators: tiered short-circuit search and purl-aware search.

VulnerabilityQuerySet.search (models.py:150-178) runs up to four queries,
each only if the previous returned nothing. Rewritten as ONE scan
computing a per-row match tier + a global-min broadcast join
(SURVEY.md §4 item 4) — at 100 TB that is one pass instead of four.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from vulnerablecode_spark.kernel.purl import PurlError, parse_purl


def tiered_search(advisories: DataFrame, query: str) -> DataFrame:
    """Tier 1: exact advisory_id; 2: exact alias; 3: id/alias contains;
    4: summary/reference-url contains. Rows of the best populated tier
    only, ordered by advisory_id (models.py:150-178)."""
    q = (query or "").strip()
    ql = q.lower()
    tier = (
        F.when(F.col("advisory_id") == q, 1)
        .when(F.array_contains(F.col("aliases"), q), 2)
        .when(
            F.lower(F.col("advisory_id")).contains(ql)
            | F.exists("aliases", lambda a: F.lower(a).contains(ql)),
            3,
        )
        .when(
            F.lower(F.col("summary")).contains(ql)
            | F.exists("references", lambda r: F.lower(r["url"]).contains(ql)),
            4,
        )
        .otherwise(F.lit(None).cast("int"))
    )
    scored = advisories.withColumn("tier", tier).filter(F.col("tier").isNotNull())
    # Global-min via an empty-partition window over the FILTERED match set:
    # one corpus scan total. The broadcast-agg alternative needs a second
    # full scan to re-derive `scored` for the join side (1.8x slower at
    # sf0.1, r9). The single-partition exchange carries only search matches
    # (page-bounded in the serving layer), never the corpus.
    best = Window.partitionBy()
    return (
        scored.withColumn("best_tier", F.min("tier").over(best))
        .filter(F.col("tier") == F.col("best_tier"))
        .drop("best_tier")
        .orderBy("advisory_id")
    )


def search_packages(packages: DataFrame, query: str) -> DataFrame:
    """Purl-aware package search (models.py:746-764, 3565-3583): a query
    that parses as a purl prefix-matches the canonical plain purl;
    otherwise substring-match on package_url. Ordered output."""
    q = (query or "").strip()
    try:
        # raw (unencoded) form — the storage join-key convention, see
        # kernel.purl.Purl.to_raw_string / operators/lookup.py
        canonical = (parse_purl(q).to_raw_string()
                     if q.startswith("pkg:") else None)
    except PurlError:
        canonical = None
    if canonical:
        cond = F.col("plain_package_url").startswith(canonical) | F.col(
            "package_url"
        ).startswith(canonical)
    else:
        # icontains semantics: both sides lowered, or mixed-case stored
        # purls (nuget, gem, …) never substring-match
        cond = F.lower(F.col("package_url")).contains(q.lower())
    return packages.filter(cond).orderBy("type", "namespace", "name", "version_rank")


def search_flags(advisories: DataFrame) -> DataFrame:
    """with_cves / with_cpes style classification flags
    (models.py:120-142): annotate rather than filter so one pass serves
    both lookups."""
    return advisories.withColumn(
        "has_cve", F.exists("aliases", lambda a: a.startswith("CVE-"))
    ).withColumn(
        "has_cpe",
        F.exists("references",
                 lambda r: F.coalesce(r["reference_id"], F.lit("")).startswith("cpe")),
    )
