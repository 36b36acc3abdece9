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


def tiered_search(advisories: DataFrame, query: str,
                  shape: str = "window") -> DataFrame:
    """Tier 1: exact advisory_id; 2: exact alias; 3: id/alias contains;
    4: summary/reference-url contains. Rows of the best populated tier
    only, ordered by advisory_id (models.py:150-178).

    ``shape`` picks the global-min strategy (equal outputs, tested):

    - ``'window'`` (default): empty-partition window over the filtered
      match set — one corpus scan, fastest measured (r9). The single-
      partition exchange carries the MATCH SET, which the serving layer
      page-bounds; a pathological broad query (tier-4 contains matching
      most of the corpus) would serialize those matches through one
      task, so serving paths that cannot bound matches use:
    - ``'agg'``: the unconditionally safe shape — the match set is
      checkpointed once (still one corpus scan), its min tier computed
      by a map-side-combined aggregate (partial min per partition, a
      scalar exchange), and the single-row result broadcast back. No
      operator ever holds more than one partition's matches
      (ADVICE r9: the window shape's page-bound assumption was
      load-bearing but unenforced — this makes the bound a choice).
    """
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
    if shape == "agg":
        # checkpoint = ONE corpus scan materializing the match set
        # distributed across partitions (the r9 measurement against this
        # shape was the un-checkpointed variant paying a second scan);
        # min-agg is map-side combined, the 1-row result broadcasts back
        scored = scored.localCheckpoint(eager=False)
        best_row = scored.agg(F.min("tier").alias("best_tier"))
        return (
            scored.join(F.broadcast(best_row),
                        F.col("tier") == F.col("best_tier"))
            .drop("best_tier")
            .orderBy("advisory_id")
        )
    if shape != "window":
        raise ValueError(f"unknown shape: {shape!r}")
    # Global-min via an empty-partition window over the FILTERED match set:
    # one corpus scan total, no checkpoint storage. The single-partition
    # exchange carries only search matches, never the corpus — callers
    # that cannot page-bound matches use shape='agg'.
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
