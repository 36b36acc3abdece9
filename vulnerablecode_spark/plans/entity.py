"""Graded queries for the entity-resolution / enrichment / federation-compare
operator families (SURVEY §2.10, §2.3) — promoting rows that were previously
fixture-tested only into driver-gradeable, oracle-hashed artifacts.

Each query synthesizes its domain frame from the driver tables (the
q49/q50/q81 pattern) and drives the REAL operator:

- q82: operators/resolution.py resolve_aliases + mint_vcid
  (reference import_runner.py:283-357, aboutcode hashid VCID format) —
  the DuckDB oracle re-derives the deterministic VCID digest character by
  character from sha256, so minting is value-hashed, not just counted.
- q83: operators/exploits.py join_exploits (enhance_with_kev.py:68-99).
- q84: operators/compare.py source_claims + compare_sources
  (vulntotal_cli.py:261-340, validator.py:39-70) — three synthesized
  source corpora, alignment matrix per (purl, cve).
- q85: operators/resolution.py dedupe_relations (models.py:1217-1249).
- q86: operators/improvers.py backfill_summaries
  (populate_vulnerability_summary_pipeline.py) — longest-non-empty
  candidate with a deterministic (length, text) tie-break on both sides.
- q87: operators/improvers.py urls_needing_archive + apply_archive_urls
  COMPOSED (v2_improvers/archive_urls.py:37-60): the work list feeds a
  deterministic fetcher stand-in whose results merge back — found /
  NO_ARCHIVE / already-archived / never-attempted all populated.
- q88: operators/improvers.py exact_purl_inferences
  (improvers/default.py:87-141) — the REAL univers/vers kernel (parse +
  containment, Arrow-batched) graded against a pure-arithmetic oracle,
  including the duplicate-constraint-version and fix-equals-excluded
  edge cases.
- q89/q90: operators/commits.py collect_fix_commits + normalize_vcs_url
  (collect_fix_commits.py, collect_commits.py:110-188) — commit-URL
  mining (hosting-style + cgit/gitweb patterns) and every normalizer
  rewrite branch, oracles derived arithmetically from the URL templates.
- q91: operators/exploits.py parse_github_pocs + join_github_pocs
  composed (enhance_with_github_poc.py:43-82) — from_json/explode with
  html_url-less entries dropped, timestamp parity.
- q92: operators/search.py search_packages, BOTH branches
  (models.py:746-764, 3565-3583): purl-prefix and icontains fallback.
- q93: operators/todos.py todo_excluded (models.py:3069-3073) — the
  oracle is generated from the operator's own exclusion tuple.
- q94: kernel/ssvc.py ssvc_decision (utils.py:752-864) — the full
  36-row CISA decision table, oracle CASE generated from the kernel's
  own DECISION_TABLE.

Scale notes: q82/q85 shuffle once on their natural keys (advisory_pk /
relation key); q83 broadcasts the catalog (dimension-sized by
construction, as in the reference where KEV is a single JSON file); q84 is
one union + one grouped aggregation — N sources never induce pairwise
joins; q86 pre-aggregates candidates before its left join; q87's archive
results broadcast (dimension-sized next to the reference table); q88/q90/
q94 are per-row kernel work with no join; q89/q91–q93 are pure Catalyst
(plan-asserted: no Python eval nodes, catalogs broadcast).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from vulnerablecode_spark.plans.registry import _load, query

# ---------------------------------------------------------------------------
# q82 — alias → vulnerability resolution + VCID minting
# ---------------------------------------------------------------------------

_HEX = "0123456789abcdef"
_ALPHA = "abcdefghjkmnpqrstuvwxyz123456789"  # resolution.py VCID_ALPHABET


def _vcid_sql(seed_sql: str) -> str:
    """DuckDB expression replicating resolution.mint_vcid: sha256(seed) →
    12 alphabet chars from successive hex pairs → VCID-xxxx-xxxx-xxxx."""
    chars = []
    for i in range(12):
        hi = f"(strpos('{_HEX}', substr(sha256({seed_sql}), {1 + 2 * i}, 1)) - 1)"
        lo = f"(strpos('{_HEX}', substr(sha256({seed_sql}), {2 + 2 * i}, 1)) - 1)"
        chars.append(
            f"substr('{_ALPHA}', CAST(({hi} * 16 + {lo}) % {len(_ALPHA)} "
            f"AS INT) + 1, 1)")
    quads = [" || ".join(chars[i:i + 4]) for i in (0, 4, 8)]
    return "'VCID-' || " + " || '-' || ".join(f"({q})" for q in quads)


_Q82_ORACLE = f"""
WITH al AS (
    SELECT o_orderkey AS advisory_pk,
           'CVE-2024-' || lpad(CAST(o_custkey AS VARCHAR), 7, '0') AS alias
    FROM orders
    UNION ALL
    SELECT o_orderkey, 'GHSA-' || CAST(o_orderkey AS VARCHAR)
    FROM orders WHERE o_orderkey % 4 = 0
), ex AS (
    SELECT 'CVE-2024-' || lpad(CAST(c_custkey AS VARCHAR), 7, '0') AS alias,
           'VCID-known-' || CAST(c_custkey AS VARCHAR) AS vulnerability_id
    FROM customer WHERE c_custkey % 2 = 0
    UNION ALL
    SELECT 'GHSA-' || CAST(o_orderkey AS VARCHAR),
           'VCID-poc-' || CAST(o_orderkey AS VARCHAR)
    FROM orders WHERE o_orderkey % 8 = 0
), j AS (
    SELECT al.advisory_pk, al.alias, ex.vulnerability_id
    FROM al LEFT JOIN ex ON al.alias = ex.alias
), agg AS (
    SELECT advisory_pk,
           COUNT(DISTINCT vulnerability_id) AS n_targets,
           MIN(vulnerability_id) AS target,
           array_to_string(list_sort(list(DISTINCT alias)), '|') AS seed
    FROM j GROUP BY advisory_pk
)
SELECT advisory_pk,
       CASE WHEN n_targets > 1 THEN NULL
            WHEN n_targets = 1 THEN target
            ELSE {_vcid_sql('seed')} END AS vulnerability_id,
       CASE WHEN n_targets > 1 THEN 'conflict'
            WHEN n_targets = 1 THEN 'matched'
            ELSE 'minted' END AS resolution
FROM agg
"""


@query("q82_alias_resolution", oracle=_Q82_ORACLE)
def q82_alias_resolution(spark, sf_dir):
    from vulnerablecode_spark.operators.resolution import resolve_aliases

    orders, customer = _load(spark, sf_dir, "orders", "customer")
    k = F.col("o_orderkey")
    cve = F.concat(F.lit("CVE-2024-"),
                   F.lpad(F.col("o_custkey").cast("string"), 7, "0"))
    ghsa = F.concat(F.lit("GHSA-"), k.cast("string"))
    advisory_aliases = (
        orders.select(
            k.alias("advisory_pk"),
            F.explode(F.array(
                cve, F.when(k % 4 == 0, ghsa))).alias("alias"))
        .filter(F.col("alias").isNotNull())
    )
    existing = (
        customer.filter(F.col("c_custkey") % 2 == 0).select(
            F.concat(F.lit("CVE-2024-"),
                     F.lpad(F.col("c_custkey").cast("string"), 7, "0"))
            .alias("alias"),
            F.concat(F.lit("VCID-known-"), F.col("c_custkey").cast("string"))
            .alias("vulnerability_id"))
        .unionByName(
            orders.filter(k % 8 == 0).select(
                ghsa.alias("alias"),
                F.concat(F.lit("VCID-poc-"), k.cast("string"))
                .alias("vulnerability_id")))
    )
    return resolve_aliases(advisory_aliases, existing)


# ---------------------------------------------------------------------------
# q83 — exploit-catalog enrichment (KEV shape)
# ---------------------------------------------------------------------------

_Q83_ORACLE = """
WITH al AS (
    SELECT o_orderkey AS advisory_pk,
           'CVE-2024-' || lpad(CAST(o_custkey AS VARCHAR), 7, '0') AS alias
    FROM orders
), cat AS (
    SELECT 'CVE-2024-' || lpad(CAST(c_custkey AS VARCHAR), 7, '0') AS alias,
           'cisa_kev' AS data_source,
           'Known exploited: ' || c_name AS description,
           -- the KEV feed carries dates as ISO strings (dateAdded/dueDate)
           strftime(DATE '2024-01-01' + CAST(c_custkey % 300 AS INT),
                    '%Y-%m-%d') AS date_added,
           'Apply updates per vendor instructions.' AS required_action,
           strftime(DATE '2024-01-01' + CAST(c_custkey % 300 AS INT)
                    + CAST(21 AS INT), '%Y-%m-%d') AS due_date,
           CASE WHEN c_custkey % 3 = 0 THEN 'Known' ELSE 'Unknown' END
               AS known_ransomware_campaign_use,
           'https://www.cisa.gov/known-exploited-vulnerabilities-catalog#'
               || CAST(c_custkey AS VARCHAR) AS source_url
    FROM customer WHERE c_custkey % 7 = 0
)
SELECT DISTINCT advisory_pk, data_source, description, date_added,
       required_action, due_date, known_ransomware_campaign_use, source_url
FROM al JOIN cat ON al.alias = cat.alias
"""


@query("q83_exploit_enrichment", oracle=_Q83_ORACLE)
def q83_exploit_enrichment(spark, sf_dir):
    from vulnerablecode_spark.operators.exploits import join_exploits

    orders, customer = _load(spark, sf_dir, "orders", "customer")
    aliases = orders.select(
        F.col("o_orderkey").alias("advisory_pk"),
        F.concat(F.lit("CVE-2024-"),
                 F.lpad(F.col("o_custkey").cast("string"), 7, "0"))
        .alias("alias"),
    )
    c = F.col("c_custkey")
    date_added = F.date_add(F.to_date(F.lit("2024-01-01")),
                            (c % 300).cast("int"))
    catalog = customer.filter(c % 7 == 0).select(
        F.concat(F.lit("CVE-2024-"),
                 F.lpad(c.cast("string"), 7, "0")).alias("alias"),
        F.lit("cisa_kev").alias("data_source"),
        F.concat(F.lit("Known exploited: "), F.col("c_name"))
        .alias("description"),
        # the KEV feed carries dates as ISO strings (dateAdded/dueDate)
        F.date_format(date_added, "yyyy-MM-dd").alias("date_added"),
        F.lit("Apply updates per vendor instructions.")
        .alias("required_action"),
        F.date_format(F.date_add(date_added, 21), "yyyy-MM-dd")
        .alias("due_date"),
        F.when(c % 3 == 0, "Known").otherwise("Unknown")
        .alias("known_ransomware_campaign_use"),
        F.concat(
            F.lit("https://www.cisa.gov/known-exploited-vulnerabilities-catalog#"),
            c.cast("string")).alias("source_url"),
    )
    return join_exploits(aliases, catalog)


# ---------------------------------------------------------------------------
# q84 — vulntotal cross-source agreement matrix
# ---------------------------------------------------------------------------

_Q84_ORACLE = """
WITH nvd AS (
    SELECT DISTINCT 'nvd' AS ds,
           'pkg:gen/p' || CAST(o_orderkey % 50 AS VARCHAR) AS base_purl,
           'CVE-2024-' || lpad(CAST(o_custkey AS VARCHAR), 7, '0') AS cve,
           'vers:generic/<=' || CAST(o_orderkey % 5 + 1 AS VARCHAR) || '.0'
               AS affecting_vers
    FROM orders
), osv AS (
    SELECT DISTINCT 'osv' AS ds,
           'pkg:gen/p' || CAST(o_orderkey % 50 AS VARCHAR),
           'CVE-2024-' || lpad(CAST(o_custkey AS VARCHAR), 7, '0'),
           'vers:generic/<=' || CAST(o_orderkey % 5
               + CASE WHEN o_orderkey % 4 = 0 THEN 1 ELSE 2 END
               AS VARCHAR) || '.0'
    FROM orders WHERE o_orderkey % 2 = 0
), gl AS (
    SELECT DISTINCT 'gitlab' AS ds,
           'pkg:gen/p' || CAST(o_orderkey % 50 AS VARCHAR),
           'CVE-2024-' || lpad(CAST(o_custkey AS VARCHAR), 7, '0'),
           'vers:generic/<=' || CAST(o_orderkey % 5 + 1 AS VARCHAR) || '.0'
    FROM orders WHERE o_orderkey % 3 = 0
), claims AS (
    SELECT * FROM nvd UNION ALL SELECT * FROM osv UNION ALL SELECT * FROM gl
), agg AS (
    SELECT base_purl, cve,
           array_to_string(list_sort(list(DISTINCT ds)), ',') AS sources,
           CAST(COUNT(DISTINCT ds) AS INT) AS n_sources,
           CAST(COUNT(DISTINCT affecting_vers) AS INT) AS n_distinct_ranges,
           array_to_string(list_sort(list(DISTINCT affecting_vers)), ',')
               AS ranges
    FROM claims GROUP BY base_purl, cve
)
SELECT base_purl, cve, sources, n_sources, n_distinct_ranges, ranges,
       CASE WHEN n_sources = 1 THEN 'single_source'
            WHEN n_distinct_ranges = 1 THEN 'agree'
            ELSE 'conflict' END AS agreement
FROM agg
"""


def _synth_corpus(orders, range_shift):
    """One source corpus: advisories(is_latest, advisory_pk, aliases) +
    impacts(advisory_pk, base_purl, affecting_vers) from orders."""
    k = F.col("o_orderkey")
    advisories = orders.select(
        k.alias("advisory_pk"),
        F.lit(True).alias("is_latest"),
        F.array(F.concat(
            F.lit("CVE-2024-"),
            F.lpad(F.col("o_custkey").cast("string"), 7, "0"))).alias("aliases"),
    )
    impacts = orders.select(
        k.alias("advisory_pk"),
        F.concat(F.lit("pkg:gen/p"), (k % 50).cast("string")).alias("base_purl"),
        F.concat(F.lit("vers:generic/<="), (k % 5 + range_shift).cast("string"),
                 F.lit(".0")).alias("affecting_vers"),
    )
    return advisories, impacts


@query("q84_vulntotal_agreement", oracle=_Q84_ORACLE)
def q84_vulntotal_agreement(spark, sf_dir):
    from vulnerablecode_spark.operators.compare import (compare_sources,
                                                        source_claims)

    orders = _load(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    nvd_adv, nvd_imp = _synth_corpus(orders, F.lit(1))
    osv_adv, osv_imp = _synth_corpus(
        orders.filter(k % 2 == 0),
        F.when(k % 4 == 0, 1).otherwise(2))
    gl_adv, gl_imp = _synth_corpus(orders.filter(k % 3 == 0), F.lit(1))
    claims = (
        source_claims(nvd_adv, nvd_imp, "nvd")
        .unionByName(source_claims(osv_adv, osv_imp, "osv"))
        .unionByName(source_claims(gl_adv, gl_imp, "gitlab"))
    )
    return compare_sources(claims).select(
        "base_purl", "cve",
        F.array_join("sources", ",").alias("sources"),
        "n_sources", "n_distinct_ranges",
        F.array_join("ranges", ",").alias("ranges"),
        "agreement",
    )


# ---------------------------------------------------------------------------
# q85 — confidence-ranked relation dedup
# ---------------------------------------------------------------------------

_Q85_ORACLE = """
WITH rel AS (
    SELECT l_partkey AS package_pk,
           l_orderkey % 1000 AS vulnerability_pk,
           'affecting' AS relation,
           CAST(l_quantity AS INT) AS confidence,
           'imp-' || CAST(l_orderkey AS VARCHAR) AS created_by
    FROM lineitem
), ranked AS (
    SELECT *, ROW_NUMBER() OVER (
        PARTITION BY package_pk, vulnerability_pk, relation
        ORDER BY confidence DESC, created_by ASC) AS rn
    FROM rel
)
SELECT package_pk, vulnerability_pk, relation, confidence, created_by
FROM ranked WHERE rn = 1
"""


@query("q85_relation_dedup", oracle=_Q85_ORACLE)
def q85_relation_dedup(spark, sf_dir):
    from vulnerablecode_spark.operators.resolution import dedupe_relations

    lineitem = _load(spark, sf_dir, "lineitem")
    relations = lineitem.select(
        F.col("l_partkey").alias("package_pk"),
        (F.col("l_orderkey") % 1000).alias("vulnerability_pk"),
        F.lit("affecting").alias("relation"),
        F.col("l_quantity").cast("int").alias("confidence"),
        F.concat(F.lit("imp-"), F.col("l_orderkey").cast("string"))
        .alias("created_by"),
    )
    return dedupe_relations(relations)


# ---------------------------------------------------------------------------
# q86 — vulnerability summary backfill
# (populate_vulnerability_summary_pipeline.py via operators/improvers.py)
# ---------------------------------------------------------------------------

_Q86_ORACLE = """
WITH vuln AS (
    SELECT c_custkey AS vulnerability_pk,
           CASE WHEN c_custkey % 3 = 0 THEN NULL
                WHEN c_custkey % 5 = 0 THEN '   '
                ELSE 'existing: ' || c_name END AS summary
    FROM customer
), adv AS (
    SELECT o_orderkey AS advisory_pk, o_custkey,
           (o_orderkey % 4 <> 1) AS is_latest,
           CASE WHEN o_orderkey % 7 = 0 THEN ''
                ELSE 'advisory ' || o_orderpriority || ' '
                     || repeat('x', CAST(o_orderkey % 13 AS INT)) END
               AS summary
    FROM orders
), cand AS (
    SELECT o_custkey AS vulnerability_pk, summary,
           ROW_NUMBER() OVER (PARTITION BY o_custkey
                              ORDER BY LENGTH(summary) DESC, summary DESC)
               AS rn
    FROM adv WHERE is_latest AND LENGTH(TRIM(summary)) > 0
), best AS (SELECT vulnerability_pk, summary AS best_summary FROM cand
            WHERE rn = 1)
SELECT v.vulnerability_pk,
       CASE WHEN LENGTH(TRIM(COALESCE(v.summary, ''))) > 0 THEN v.summary
            ELSE b.best_summary END AS summary
FROM vuln v LEFT JOIN best b USING (vulnerability_pk)
"""


@query("q86_summary_backfill", oracle=_Q86_ORACLE)
def q86_summary_backfill(spark, sf_dir):
    from vulnerablecode_spark.operators.improvers import backfill_summaries

    orders, customer = _load(spark, sf_dir, "orders", "customer")
    c, k = F.col("c_custkey"), F.col("o_orderkey")
    vulns = customer.select(
        c.alias("vulnerability_pk"),
        F.when(c % 3 == 0, F.lit(None).cast("string"))
        .when(c % 5 == 0, F.lit("   "))
        .otherwise(F.concat(F.lit("existing: "), F.col("c_name")))
        .alias("summary"),
    )
    advisories = orders.select(
        k.alias("advisory_pk"),
        (k % 4 != 1).alias("is_latest"),
        F.when(k % 7 == 0, F.lit(""))
        .otherwise(F.concat(F.lit("advisory "), F.col("o_orderpriority"),
                            F.lit(" "),
                            F.repeat(F.lit("x"), (k % 13).cast("int"))))
        .alias("summary"),
    )
    bridge = orders.select(k.alias("advisory_pk"),
                           F.col("o_custkey").alias("vulnerability_pk"))
    return backfill_summaries(vulns, advisories, bridge)


# ---------------------------------------------------------------------------
# q87 — archive-URL improver, both halves composed: the work list feeds a
# deterministic fetcher stand-in whose results merge back
# (v2_improvers/archive_urls.py:37-60 via operators/improvers.py)
# ---------------------------------------------------------------------------

_Q87_ORACLE = """
WITH refs AS (
    SELECT o_orderkey AS ref_pk,
           CASE WHEN o_orderkey % 9 = 0
                THEN 'ftp://mirror.example/' || CAST(o_orderkey % 500 AS VARCHAR)
                ELSE 'https://refs.example/page/'
                     || CAST(o_orderkey % 2000 AS VARCHAR) END AS url,
           CASE WHEN o_orderkey % 9 <> 0 AND o_orderkey % 6 = 0
                THEN 'https://archive.example/snap/'
                     || CAST(o_orderkey % 2000 AS VARCHAR) END AS archive_url
    FROM orders
), worklist AS (
    SELECT DISTINCT url FROM refs
    WHERE archive_url IS NULL AND url LIKE 'http%'
), fetched AS (
    SELECT url,
           CAST(regexp_extract(url, '([0-9]+)$', 1) AS INT) AS m
    FROM worklist
), archives AS (
    SELECT url,
           CASE WHEN m % 2 = 0
                THEN 'https://web.archive.org/web/2024/' || url END AS fetched
    FROM fetched WHERE m % 3 <> 2
)
SELECT r.ref_pk, r.url,
       CASE WHEN r.archive_url IS NOT NULL THEN r.archive_url
            WHEN r.url NOT LIKE 'http%' THEN NULL
            WHEN a.url IS NULL THEN NULL
            ELSE COALESCE(a.fetched, 'NO_ARCHIVE') END AS archive_url
FROM refs r LEFT JOIN archives a ON r.url = a.url
"""


@query("q87_archive_urls", oracle=_Q87_ORACLE)
def q87_archive_urls(spark, sf_dir):
    from vulnerablecode_spark.operators.improvers import (apply_archive_urls,
                                                          urls_needing_archive)

    orders = _load(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    refs = orders.select(
        k.alias("ref_pk"),
        F.when(k % 9 == 0,
               F.concat(F.lit("ftp://mirror.example/"),
                        (k % 500).cast("string")))
        .otherwise(F.concat(F.lit("https://refs.example/page/"),
                            (k % 2000).cast("string"))).alias("url"),
        F.when((k % 9 != 0) & (k % 6 == 0),
               F.concat(F.lit("https://archive.example/snap/"),
                        (k % 2000).cast("string"))).alias("archive_url"),
    )
    worklist = urls_needing_archive(refs)
    # deterministic fetcher stand-in over the work list (the real fetch is
    # external I/O — improvers.py docstring): attempted iff m % 3 != 2,
    # found iff m % 2 == 0
    m = F.regexp_extract(F.col("url"), r"([0-9]+)$", 1).cast("int")
    archives = (
        worklist.withColumn("m", m)
        .filter(F.col("m") % 3 != 2)
        .select(
            "url",
            F.when(F.col("m") % 2 == 0,
                   F.concat(F.lit("https://web.archive.org/web/2024/"),
                            F.col("url"))).alias("archive_url"),
        )
    )
    return apply_archive_urls(refs, archives)


# ---------------------------------------------------------------------------
# q88 — exact-purl inferences: the REAL univers/vers kernel (parse +
# containment, Arrow-batched) graded against a pure-arithmetic oracle
# (improvers/default.py:87-141 get_exact_purls via operators/improvers.py)
# ---------------------------------------------------------------------------

_Q88_ORACLE = """
WITH base AS (
    SELECT o_orderkey * 10 AS impact_pk,
           o_orderkey AS advisory_pk,
           'pkg:gen/p' || CAST(o_orderkey % 50 AS VARCHAR) AS base_purl,
           CAST(o_orderkey % 5 + 1 AS INT) AS j,
           CAST(o_orderkey % 5 + 1 + o_orderkey % 8 AS INT) AS kk,
           CAST(o_orderkey % 5 + 2 AS INT) AS x,   -- != constraint = j+1
           (o_orderkey % 4 <> 0) AS has_fix,
           o_orderkey % 8 AS r8
    FROM orders
)
SELECT impact_pk, advisory_pk, base_purl,
       -- constraint order >=j | <=kk | !=x: j always satisfies; kk
       -- duplicates j when r8=0, is excluded when kk=x (r8=1)
       CASE WHEN r8 = 0 THEN base_purl || '@' || j || '.0,'
                             || base_purl || '@' || j || '.0'
            WHEN r8 = 1 THEN base_purl || '@' || j || '.0'
            ELSE base_purl || '@' || j || '.0,'
                 || base_purl || '@' || kk || '.0' END AS affected_purls,
       -- fixed: the != version, then the declared fix (kk+1) unless it
       -- equals x (r8=0 — array_union dedupes) or there is no fix
       CASE WHEN has_fix AND x <> kk + 1
                THEN base_purl || '@' || x || '.0,'
                     || base_purl || '@' || (kk + 1) || '.0'
            ELSE base_purl || '@' || x || '.0' END AS fixed_purls,
       100 AS confidence
FROM base
"""


@query("q88_exact_purl_inferences", oracle=_Q88_ORACLE)
def q88_exact_purl_inferences(spark, sf_dir):
    from vulnerablecode_spark.operators.improvers import exact_purl_inferences

    orders = _load(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    j = (k % 5 + 1).cast("int")
    kk = (j + k % 8).cast("int")
    impacts = orders.select(
        (k * 10).alias("impact_pk"),
        k.alias("advisory_pk"),
        F.concat(F.lit("pkg:gen/p"), (k % 50).cast("string"))
        .alias("base_purl"),
        F.concat(F.lit("vers:generic/>="), j.cast("string"),
                 F.lit(".0|<="), kk.cast("string"),
                 F.lit(".0|!="), (j + 1).cast("string"), F.lit(".0"))
        .alias("affecting_vers"),
        F.when(k % 4 != 0,
               F.concat((kk + 1).cast("string"), F.lit(".0")))
        .alias("fixed_version"),
    )
    inf = exact_purl_inferences(impacts)
    return inf.select(
        "impact_pk", "advisory_pk", "base_purl",
        F.array_join("affected_purls", ",").alias("affected_purls"),
        F.array_join("fixed_purls", ",").alias("fixed_purls"),
        "confidence",
    )


# ---------------------------------------------------------------------------
# q89 — fix-commit collection: commit-URL mining over exploded references
# (pipelines/v2_importers/collect_fix_commits.py + collect_commits.py:110-188
# via operators/commits.py). The oracle derives each row ARITHMETICALLY from
# the template that built the URL — fully independent of the regex pipeline.
# ---------------------------------------------------------------------------

_Q89_ORACLE = """
WITH base AS (
    SELECT o_orderkey AS advisory_pk,
           o_orderkey % 6 AS v,
           CAST(o_orderkey % 20 AS VARCHAR) AS a,
           CAST(o_orderkey % 30 AS VARCHAR) AS b,
           substr(sha256(CAST(o_orderkey AS VARCHAR)), 1, 12) AS sha
    FROM orders
)
SELECT advisory_pk,
       CASE v WHEN 0 THEN 'https://github.com/owner' || a || '/repo' || b
              WHEN 1 THEN 'https://gitlab.com/grp' || a || '/proj' || b
              WHEN 2 THEN 'https://bitbucket.org/team' || a || '/code' || b
              ELSE 'https://git.kernel.org/pub/scm/linux-' || a END AS repo_url,
       sha AS commit_hash,
       CASE v WHEN 0 THEN 'https://github.com/owner' || a || '/repo' || b
                          || '/commit/' || sha
              WHEN 1 THEN 'https://gitlab.com/grp' || a || '/proj' || b
                          || '/-/commit/' || sha
              WHEN 2 THEN 'https://bitbucket.org/team' || a || '/code' || b
                          || '/commits/' || sha
              ELSE 'https://git.kernel.org/pub/scm/linux-' || a
                   || '.git/commit/?id=' || sha END AS source_url
FROM base WHERE v <= 3
"""


@query("q89_fix_commits", oracle=_Q89_ORACLE)
def q89_fix_commits(spark, sf_dir):
    from vulnerablecode_spark.operators.commits import collect_fix_commits

    orders = _load(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    v = k % 6
    a = (k % 20).cast("string")
    b = (k % 30).cast("string")
    sha = F.substring(F.sha2(k.cast("string"), 256), 1, 12)
    commit_url = (
        F.when(v == 0, F.concat(F.lit("https://github.com/owner"), a,
                                F.lit("/repo"), b, F.lit("/commit/"), sha))
        .when(v == 1, F.concat(F.lit("https://gitlab.com/grp"), a,
                               F.lit("/proj"), b, F.lit("/-/commit/"), sha))
        .when(v == 2, F.concat(F.lit("https://bitbucket.org/team"), a,
                               F.lit("/code"), b, F.lit("/commits/"), sha))
        .when(v == 3, F.concat(F.lit("https://git.kernel.org/pub/scm/linux-"),
                               a, F.lit(".git/commit/?id="), sha))
        # v in (4,5): advisory pages / release notes — never commit URLs
        .when(v == 4, F.concat(F.lit("https://example.com/advisory/"),
                               k.cast("string")))
        .otherwise(F.concat(F.lit("https://github.com/owner"), a,
                            F.lit("/repo"), b, F.lit("/releases/tag/v"), b))
    )
    noise = F.concat(F.lit("https://lists.example.org/msg"), k.cast("string"))
    mk_ref = lambda u: F.struct(u.alias("url"),  # noqa: E731
                                F.lit("WEB").alias("reference_type"))
    advisories = orders.select(
        k.alias("advisory_pk"),
        F.when(k % 2 == 0, F.array(mk_ref(commit_url), mk_ref(noise)))
        .otherwise(F.array(mk_ref(commit_url))).alias("references"),
    )
    return collect_fix_commits(advisories)


# ---------------------------------------------------------------------------
# q90 — VCS URL normalizer kernel sweep (collect_commits.py:110-188 via
# operators/commits.py normalize_vcs_url), the q36 scalar-sweep pattern:
# every rewrite branch (scp-style git@, git+https, git://, trailing
# slashes, .git suffix, already-canonical) against an arithmetic oracle.
# ---------------------------------------------------------------------------

_Q90_ORACLE = """
WITH base AS (
    SELECT o_orderkey AS ref_pk, o_orderkey % 5 AS v,
           CAST(o_orderkey % 20 AS VARCHAR) AS a,
           CAST(o_orderkey % 30 AS VARCHAR) AS b
    FROM orders
)
SELECT ref_pk,
       CASE v WHEN 0 THEN 'git@github.com:owner' || a || '/repo' || b || '.git'
              WHEN 1 THEN 'git+https://gitlab.com/g' || a || '/r' || b || '.git/'
              WHEN 2 THEN 'git://host' || a || '.example/r' || b || '/'
              WHEN 3 THEN 'https://bitbucket.org/x' || a || '/y' || b || '.git///'
              ELSE 'https://github.com/a' || a || '/b' || b END AS url,
       CASE v WHEN 0 THEN 'https://github.com/owner' || a || '/repo' || b
              WHEN 1 THEN 'https://gitlab.com/g' || a || '/r' || b
              WHEN 2 THEN 'https://host' || a || '.example/r' || b
              WHEN 3 THEN 'https://bitbucket.org/x' || a || '/y' || b
              ELSE 'https://github.com/a' || a || '/b' || b END AS normalized
FROM base
"""


@query("q90_vcs_normalize", oracle=_Q90_ORACLE)
def q90_vcs_normalize(spark, sf_dir):
    from vulnerablecode_spark.operators.commits import normalize_vcs_url

    orders = _load(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    v = k % 5
    a = (k % 20).cast("string")
    b = (k % 30).cast("string")
    url = (
        F.when(v == 0, F.concat(F.lit("git@github.com:owner"), a,
                                F.lit("/repo"), b, F.lit(".git")))
        .when(v == 1, F.concat(F.lit("git+https://gitlab.com/g"), a,
                               F.lit("/r"), b, F.lit(".git/")))
        .when(v == 2, F.concat(F.lit("git://host"), a,
                               F.lit(".example/r"), b, F.lit("/")))
        .when(v == 3, F.concat(F.lit("https://bitbucket.org/x"), a,
                               F.lit("/y"), b, F.lit(".git///")))
        .otherwise(F.concat(F.lit("https://github.com/a"), a, F.lit("/b"), b))
    )
    return orders.select(
        k.alias("ref_pk"),
        url.alias("url"),
        normalize_vcs_url(url).alias("normalized"),
    )


# ---------------------------------------------------------------------------
# q91 — PoC-in-GitHub parse + join composed: (path, content) JSON files →
# per-CVE PoC rows → advisory join (v2_improvers/enhance_with_github_poc.py
# :43-82 via operators/exploits.py parse_github_pocs + join_github_pocs).
# Pure Catalyst from_json/explode on the Spark side; the oracle
# reconstructs rows arithmetically from the JSON templates.
# ---------------------------------------------------------------------------

_Q91_ORACLE = """
WITH al AS (
    SELECT o_orderkey AS advisory_pk,
           'CVE-2024-' || lpad(CAST(o_custkey AS VARCHAR), 7, '0') AS alias
    FROM orders
), poc AS (
    -- one PoC file per customer: entry 1 always valid; entry 2 valid only
    -- when c % 3 = 0 (else it lacks html_url and is dropped)
    SELECT 'CVE-2024-' || lpad(CAST(c_custkey AS VARCHAR), 7, '0') AS alias,
           'https://github.com/poc/repo' || CAST(c_custkey AS VARCHAR) AS url,
           CAST('2024-01-01 00:00:00' AS TIMESTAMP)
               + INTERVAL (c_custkey % 400) DAY AS created_at,
           CAST('2024-01-01 00:00:00' AS TIMESTAMP)
               + INTERVAL (c_custkey % 400 + 30) DAY AS updated_at
    FROM customer WHERE c_custkey % 2 = 0
    UNION ALL
    SELECT 'CVE-2024-' || lpad(CAST(c_custkey AS VARCHAR), 7, '0'),
           'https://github.com/poc2/repo' || CAST(c_custkey AS VARCHAR),
           CAST('2024-02-01 00:00:00' AS TIMESTAMP)
               + INTERVAL (c_custkey % 200) DAY,
           CAST('2024-02-01 00:00:00' AS TIMESTAMP)
               + INTERVAL (c_custkey % 200 + 7) DAY
    FROM customer WHERE c_custkey % 2 = 0 AND c_custkey % 3 = 0
)
SELECT DISTINCT al.advisory_pk, poc.url, poc.created_at, poc.updated_at
FROM al JOIN poc ON al.alias = poc.alias
"""


@query("q91_github_poc", oracle=_Q91_ORACLE)
def q91_github_poc(spark, sf_dir):
    from vulnerablecode_spark.operators.exploits import (join_github_pocs,
                                                         parse_github_pocs)

    orders, customer = _load(spark, sf_dir, "orders", "customer")
    c = F.col("c_custkey")
    cve = F.concat(F.lit("CVE-2024-"), F.lpad(c.cast("string"), 7, "0"))
    d1u = F.date_format(
        F.date_add(F.to_date(F.lit("2024-01-01")),
                   (c % 400 + 30).cast("int")), "yyyy-MM-dd")
    d2 = F.date_format(
        F.date_add(F.to_date(F.lit("2024-02-01")), (c % 200).cast("int")),
        "yyyy-MM-dd")
    d2u = F.date_format(
        F.date_add(F.to_date(F.lit("2024-02-01")),
                   (c % 200 + 7).cast("int")), "yyyy-MM-dd")
    entry1 = F.concat(
        F.lit('{"html_url":"https://github.com/poc/repo'), c.cast("string"),
        F.lit('","created_at":"'),
        F.date_format(F.date_add(F.to_date(F.lit("2024-01-01")),
                                 (c % 400).cast("int")), "yyyy-MM-dd"),
        F.lit(' 00:00:00","updated_at":"'), d1u, F.lit(' 00:00:00"}'))
    entry2_valid = F.concat(
        F.lit('{"html_url":"https://github.com/poc2/repo'), c.cast("string"),
        F.lit('","created_at":"'), d2,
        F.lit(' 00:00:00","updated_at":"'), d2u, F.lit(' 00:00:00"}'))
    # the reference feed carries entries without html_url; the parser
    # must drop them (enhance_with_github_poc.py:67-69)
    entry2_broken = F.concat(F.lit('{"created_at":"'), d2,
                             F.lit(' 00:00:00"}'))
    entry2 = F.when(c % 3 == 0, entry2_valid).otherwise(entry2_broken)
    files = customer.filter(c % 2 == 0).select(
        F.concat(F.lit("2024/"), cve, F.lit(".json")).alias("path"),
        F.concat(F.lit("["), entry1, F.lit(","), entry2, F.lit("]"))
        .alias("content"),
    )
    aliases = orders.select(
        F.col("o_orderkey").alias("advisory_pk"),
        F.concat(F.lit("CVE-2024-"),
                 F.lpad(F.col("o_custkey").cast("string"), 7, "0"))
        .alias("alias"),
    )
    return join_github_pocs(aliases, parse_github_pocs(files))


# ---------------------------------------------------------------------------
# q92 — purl-aware package search, BOTH branches (models.py:746-764,
# 3565-3583 via operators/search.py search_packages): a purl-parsing query
# prefix-matches the canonical raw key; a non-purl query falls back to
# case-insensitive substring. One row per (mode, hit).
# ---------------------------------------------------------------------------

_Q92_ORACLE = """
WITH pkg AS (
    SELECT p_partkey,
           'pkg:gen/ns' || CAST(p_partkey % 1000 // 100 AS VARCHAR)
               || '/lib' || CAST(p_partkey % 100 AS VARCHAR) AS plain_package_url,
           'pkg:gen/ns' || CAST(p_partkey % 1000 // 100 AS VARCHAR)
               || '/lib' || CAST(p_partkey % 100 AS VARCHAR)
               || '@' || CAST(p_partkey % 20 + 1 AS VARCHAR) || '.0'
               AS package_url
    FROM part
)
SELECT 'purl_prefix' AS mode, p_partkey, package_url
FROM pkg WHERE p_partkey % 1000 = 337
UNION ALL
SELECT 'icontains', p_partkey, package_url
FROM pkg WHERE package_url LIKE '%lib9%'
"""


@query("q92_purl_search", oracle=_Q92_ORACLE)
def q92_purl_search(spark, sf_dir):
    from vulnerablecode_spark.operators.search import search_packages

    part = _load(spark, sf_dir, "part")
    p = F.col("p_partkey")
    plain = F.concat(F.lit("pkg:gen/ns"),
                     ((p % 1000) / 100).cast("int").cast("string"),
                     F.lit("/lib"), (p % 100).cast("string"))
    packages = part.select(
        p.alias("p_partkey"),
        plain.alias("plain_package_url"),
        F.concat(plain, F.lit("@"), (p % 20 + 1).cast("string"),
                 F.lit(".0")).alias("package_url"),
        F.lit("gen").alias("type"),
        ((p % 1000) / 100).cast("int").cast("string").alias("namespace"),
        (p % 100).cast("string").alias("name"),
        (p % 20 + 1).cast("int").alias("version_rank"),
    )
    hits_purl = search_packages(packages, "pkg:gen/ns3/lib37").select(
        F.lit("purl_prefix").alias("mode"), "p_partkey", "package_url")
    # mixed-case query exercises the icontains lowering on BOTH sides
    hits_sub = search_packages(packages, "LIB9").select(
        F.lit("icontains").alias("mode"), "p_partkey", "package_url")
    return hits_purl.unionByName(hits_sub)


# ---------------------------------------------------------------------------
# q93 — ToDo pipeline exclusion (models.py:3069-3073 via
# operators/todos.py todo_excluded): pins the TODO_EXCLUDED_PIPELINES
# list cross-engine — a drifted entry on either side breaks the hash.
# ---------------------------------------------------------------------------


def _q93_oracle() -> str:
    from vulnerablecode_spark.operators.todos import TODO_EXCLUDED_PIPELINES

    ids = ", ".join(f"'{p}'" for p in TODO_EXCLUDED_PIPELINES)
    n = len(TODO_EXCLUDED_PIPELINES) + 3
    return f"""
WITH adv AS (
    SELECT o_orderkey AS advisory_pk,
           CASE CAST(o_orderkey % {n} AS INT)
                {' '.join(f"WHEN {i} THEN '{p}'" for i, p in enumerate(TODO_EXCLUDED_PIPELINES))}
                WHEN {n - 3} THEN 'alpine_importer_v2'
                WHEN {n - 2} THEN 'nginx_importer_v2'
                ELSE 'debian_importer_v2' END AS pipeline_id
    FROM orders
)
SELECT advisory_pk, pipeline_id FROM adv
WHERE pipeline_id NOT IN ({ids})
"""


@query("q93_todo_excluded", oracle=_q93_oracle())
def q93_todo_excluded(spark, sf_dir):
    from vulnerablecode_spark.operators.todos import (TODO_EXCLUDED_PIPELINES,
                                                      todo_excluded)

    orders = _load(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    n = len(TODO_EXCLUDED_PIPELINES) + 3
    expr = F.when(k % n == n - 3, F.lit("alpine_importer_v2")) \
        .when(k % n == n - 2, F.lit("nginx_importer_v2"))
    for i, pid in enumerate(TODO_EXCLUDED_PIPELINES):
        expr = expr.when(k % n == i, F.lit(pid))
    advisories = orders.select(
        k.alias("advisory_pk"),
        expr.otherwise(F.lit("debian_importer_v2")).alias("pipeline_id"),
    )
    return todo_excluded(advisories)


# ---------------------------------------------------------------------------
# q94 — SSVC coordinator-decision kernel sweep (utils.py:752-864 via
# kernel/ssvc.py ssvc_decision): vectors spanning the full 36-row CISA
# decision table, the missing-M default, and invalid decision points.
# The oracle CASE is GENERATED from the kernel's own DECISION_TABLE, so
# a drifted table entry on either side breaks the hash.
# ---------------------------------------------------------------------------


def _q94_oracle() -> str:
    from vulnerablecode_spark.kernel.ssvc import (AUTOMATABLE, EXPLOITATION,
                                                  DECISION_TABLE,
                                                  MISSION_WELLBEING,
                                                  TECHNICAL_IMPACT)
    e_of = {v: k for k, v in EXPLOITATION.items()}
    a_of = {v: k for k, v in AUTOMATABLE.items()}
    t_of = {v: k for k, v in TECHNICAL_IMPACT.items()}
    m_of = {v: k for k, v in MISSION_WELLBEING.items()}
    arms = " ".join(
        f"WHEN e = '{e_of[e]}' AND a = '{a_of[a]}' AND t = '{t_of[t]}' "
        f"AND m = '{m_of[mw]}' THEN '{d}'"
        for (e, a, t, mw), d in DECISION_TABLE.items())
    return f"""
WITH base AS (
    SELECT o_orderkey AS advisory_pk,
           CASE WHEN o_orderkey % 41 = 0 THEN 'X'
                ELSE substr('NPA', CAST(o_orderkey % 3 AS INT) + 1, 1) END AS e,
           substr('NY', CAST(o_orderkey // 3 % 2 AS INT) + 1, 1) AS a,
           substr('PT', CAST(o_orderkey // 6 % 2 AS INT) + 1, 1) AS t,
           CASE WHEN o_orderkey % 37 = 0 THEN 'M'
                ELSE substr('LMH', CAST(o_orderkey // 12 % 3 AS INT) + 1, 1)
                END AS m,
           (o_orderkey % 37 = 0) AS m_omitted
    FROM orders
)
SELECT advisory_pk,
       'SSVCv2/E:' || e || '/A:' || a || '/T:' || t
           || CASE WHEN m_omitted THEN '' ELSE '/M:' || m END
           || '/2024-01-01T00:00:00Z/' AS vector,
       CASE WHEN e = 'X' THEN NULL {arms} END AS decision
FROM base
"""


@query("q94_ssvc_decision", oracle=_q94_oracle())
def q94_ssvc_decision(spark, sf_dir):
    from pyspark.sql.functions import pandas_udf

    from vulnerablecode_spark import ensure_shipped

    ensure_shipped(spark)

    @pandas_udf("string")
    def decide(vec: pd.Series) -> pd.Series:
        from vulnerablecode_spark.kernel.ssvc import ssvc_decision

        return vec.map(ssvc_decision)

    orders = _load(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    e = F.when(k % 41 == 0, F.lit("X")).otherwise(
        F.substring(F.lit("NPA"), (k % 3).cast("int") + 1, 1))
    a = F.substring(F.lit("NY"), F.expr("o_orderkey div 3 % 2").cast("int") + 1, 1)
    t = F.substring(F.lit("PT"), F.expr("o_orderkey div 6 % 2").cast("int") + 1, 1)
    m = F.substring(F.lit("LMH"), F.expr("o_orderkey div 12 % 3").cast("int") + 1, 1)
    vector = F.concat(
        F.lit("SSVCv2/E:"), e, F.lit("/A:"), a, F.lit("/T:"), t,
        F.when(k % 37 == 0, F.lit("")).otherwise(F.concat(F.lit("/M:"), m)),
        F.lit("/2024-01-01T00:00:00Z/"))
    return orders.select(
        k.alias("advisory_pk"),
        vector.alias("vector"),
        decide(vector).alias("decision"),
    )


# ---------------------------------------------------------------------------
# q95 — distinct package-type dimension (api_v3.py:342-355 via
# operators/serve.py package_types): the Redis-cached serving dimension as
# a cached distinct — the last §2.4 aggregation row without a graded row.
# ---------------------------------------------------------------------------

_Q95_ORACLE = """
SELECT DISTINCT
       CASE CAST(p_partkey % 7 AS INT)
            WHEN 0 THEN 'pypi' WHEN 1 THEN 'npm' WHEN 2 THEN 'maven'
            WHEN 3 THEN 'deb' WHEN 4 THEN 'rpm' WHEN 5 THEN 'gem'
            ELSE 'golang' END AS type
FROM part
"""


@query("q95_package_types", oracle=_Q95_ORACLE)
def q95_package_types(spark, sf_dir):
    from vulnerablecode_spark.operators.serve import package_types

    part = _load(spark, sf_dir, "part")
    p = F.col("p_partkey")
    packages = part.select(
        F.element_at(
            F.array(*[F.lit(t) for t in
                      ("pypi", "npm", "maven", "deb", "rpm", "gem",
                       "golang")]),
            (p % 7).cast("int") + 1).alias("type"))
    return package_types(packages)


# ---------------------------------------------------------------------------
# q104 — CVE reference-id backfill (improvers/add_missing_refid.py:26-55
# CveIdImprover): references with a NULL/empty id whose URL contains the
# NVD detail path (case-sensitive, uppercase CVE- only — Django
# url__contains) get the CVE-\d{4}-\d{4,7} token extracted from the URL;
# all other rows pass through untouched. Map-only projection: zero
# shuffles, zero joins (plan-gated).
# ---------------------------------------------------------------------------

_Q104_ORACLE = r"""
WITH refs AS (
    SELECT o_orderkey AS ref_pk,
           CASE CAST(o_orderkey % 4 AS INT)
             WHEN 0 THEN 'https://nvd.nist.gov/vuln/detail/CVE-2024-'
                         || CAST(10000 + o_orderkey % 90000 AS VARCHAR)
             WHEN 1 THEN 'https://nvd.nist.gov/vuln/detail/cve-2024-'
                         || CAST(10000 + o_orderkey % 90000 AS VARCHAR)
             WHEN 2 THEN 'https://example.com/advisory/'
                         || CAST(o_orderkey % 1000 AS VARCHAR)
             ELSE 'https://nvd.nist.gov/vuln/detail/CVE-2021-'
                  || CAST(1000 + o_orderkey % 9000 AS VARCHAR) END AS url,
           CASE CAST(o_orderkey % 5 AS INT)
             WHEN 0 THEN 'CVE-2000-1111'
             WHEN 1 THEN '' END AS reference_id
    FROM orders
)
SELECT ref_pk, url,
       CASE WHEN (reference_id IS NULL OR reference_id = '')
                 AND url LIKE '%nvd.nist.gov/vuln/detail/CVE-%'
                 AND regexp_extract(url, '(CVE-[0-9]{4}-[0-9]{4,7})', 1) <> ''
            THEN regexp_extract(url, '(CVE-[0-9]{4}-[0-9]{4,7})', 1)
            ELSE reference_id END AS reference_id
FROM refs
"""


@query("q104_backfill_ref_ids", oracle=_Q104_ORACLE)
def q104_backfill_ref_ids(spark, sf_dir):
    from vulnerablecode_spark.operators.improvers import \
        backfill_reference_ids

    orders = _load(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    refs = orders.select(
        k.alias("ref_pk"),
        F.when(k % 4 == 0,
               F.concat(F.lit("https://nvd.nist.gov/vuln/detail/CVE-2024-"),
                        (k % 90000 + 10000).cast("string")))
        .when(k % 4 == 1,
              F.concat(F.lit("https://nvd.nist.gov/vuln/detail/cve-2024-"),
                       (k % 90000 + 10000).cast("string")))
        .when(k % 4 == 2,
              F.concat(F.lit("https://example.com/advisory/"),
                       (k % 1000).cast("string")))
        .otherwise(
            F.concat(F.lit("https://nvd.nist.gov/vuln/detail/CVE-2021-"),
                     (k % 9000 + 1000).cast("string"))).alias("url"),
        F.when(k % 5 == 0, F.lit("CVE-2000-1111"))
        .when(k % 5 == 1, F.lit("")).alias("reference_id"),
    )
    return backfill_reference_ids(refs)
