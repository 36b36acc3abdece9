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

Scale notes: q82/q85 shuffle once on their natural keys (advisory_pk /
relation key); q83 broadcasts the catalog (dimension-sized by
construction, as in the reference where KEV is a single JSON file); q84 is
one union + one grouped aggregation — N sources never induce pairwise
joins.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from vulnerablecode_spark.plans.registry import _load, query

# ---------------------------------------------------------------------------
# q82 — alias → vulnerability resolution + VCID minting
# ---------------------------------------------------------------------------

_HEX = "0123456789abcdef"
_ALPHA = "23456789abcdefghjkmnpqrstuvwxyz"  # resolution.py VCID_ALPHABET


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
