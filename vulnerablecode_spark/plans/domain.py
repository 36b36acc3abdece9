"""q81 — the composed domain pipeline as ONE hash-verified artifact.

The vulnerability-side twin of q78 (VERDICT r5 directive #2): every stage
of the reference's advisory lifecycle — content-id dedup → is_latest SCD2 →
impact extraction → version-range unfurl → risk scoring → advisory grouping
→ bulk-lookup membership — run end-to-end through the REAL operators
(operators/ingest.py, operators/unfurl.py, functions/risk.py,
operators/grouping.py, operators/serve.py), producing one verdict row per
advisory whose every column is independently derivable by the DuckDB
oracle from first principles.

Reference trace (SURVEY §3.3): pipes/advisory.py:292-420 (insert_advisory_v2
content-id + SCD2), unfurl_version_range.py:33-212, risk.py:21-105,
group_advisories.py:143-285, api_v3.py:253-341 (bulk lookup). The stages
were previously graded piecewise (q08/q21/q14/q39/q45); this closes the gap
between "every stage correct" and "the pipeline correct".

Scale notes: the composition adds NO shuffle beyond its stages' own —
content-id dedup and is_latest share the avid hash partitioning, impacts
explode in place, the unfurl join fans out over a broadcastable
package_versions dimension, risk pre-aggregates severities before its join,
grouping shuffles once on (package, relation), and the final verdict is a
chain of key-aligned joins on advisory_pk. Plan-asserted in
tests/test_plan_quality.py (no cartesian, bounded Exchange count).

Advisory corpus synthesized from ``orders`` (sf-proportional, like
q49/q50): two collection batches one month apart where every 3rd advisory
revises its summary (→ a second content version; the rest dedupe to the
first collection), one affected package per advisory with a
``vers:generic/>=J.0|<=K.0`` range over a 12-version upstream universe,
severities crafted to exact 1-decimal scores (no float-half-boundary
hazard — see q13's fixed-point note), and aliases shared per customer so
grouping forms real multi-advisory components.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from vulnerablecode_spark.plans.registry import _load, query

# session-scoped upstream version universe: 50 purls × versions 1.0..12.0
# (the package_versions dimension the unfurl joins against — a broadcast
# dim, same cache pattern as relational._weights_dim)
_PV_CACHE: dict[str, object] = {}
N_PURLS = 50
N_VERSIONS = 12


def _package_versions_dim(spark):
    app = spark.sparkContext.applicationId
    pv = _PV_CACHE.get(app)
    if pv is None:
        _PV_CACHE.clear()
        rows = [
            (f"pkg:gen/p{p}", f"{v}.0")
            for p in range(N_PURLS)
            for v in range(1, N_VERSIONS + 1)
        ]
        pv = spark.createDataFrame(
            rows, "base_purl string, version string"
        ).localCheckpoint(eager=True)
        _PV_CACHE[app] = pv
    return pv


def _parsed_batch(orders, revised: bool):
    """ADVISORY_PARSED rows synthesized from orders. ``revised`` marks the
    second collection where every 3rd advisory changed its summary."""
    k = F.col("o_orderkey")
    j = (k % 5 + 1).cast("int")
    kk = (j + k % 8).cast("int")  # J..K with K ≤ 12; K = 12 ⇒ fix missing
    affected = F.array(
        F.struct(
            F.concat(F.lit("pkg:gen/p"), (k % N_PURLS).cast("string"))
            .alias("package"),
            F.concat(F.lit("vers:generic/>="), j.cast("string"),
                     F.lit(".0|<="), kk.cast("string"), F.lit(".0"))
            .alias("affected_version_range"),
            F.when(k % 4 != 0,
                   F.concat((kk + 1).cast("string"), F.lit(".0")))
            .alias("fixed_version"),
        )
    )
    # severity values chosen so every derived score is EXACTLY one decimal
    # digit: value ∈ {0,2,..,10}, weight ∈ {10 (nvd host), 5 (default)} →
    # value×weight/10 is an integer; the epss lane (every 10th) adds 0.9.
    sev_main = F.struct(
        F.lit("generic").alias("system"),
        F.concat(((k % 6) * 2).cast("string"), F.lit(".0")).alias("value"),
        F.lit(None).cast("string").alias("scoring_elements"),
        F.when(k % 2 == 0, F.lit("https://nvd.nist.gov/vuln/detail/x"))
        .otherwise(F.lit("https://advisories.example.org/x")).alias("url"),
    )
    sev_epss = F.struct(
        F.lit("epss").alias("system"),
        F.lit("0.9").alias("value"),
        F.lit(None).cast("string").alias("scoring_elements"),
        F.lit("https://nvd.nist.gov/epss").alias("url"),
    )
    severities = F.when(k % 10 == 0, F.array(sev_main, sev_epss)).otherwise(
        F.array(sev_main)
    )
    base_summary = F.concat(F.lit("initial "), F.col("o_orderpriority"))
    summary = (
        F.when(k % 3 == 0, F.concat(F.lit("revised "),
                                    F.col("o_orderpriority")))
        .otherwise(base_summary)
        if revised else base_summary
    )
    return orders.select(
        F.concat(F.lit("ADV-"), k.cast("string")).alias("advisory_id"),
        F.array(F.concat(F.lit("CVE-2024-"),
                         F.col("o_custkey").cast("string"))).alias("aliases"),
        summary.alias("summary"),
        affected.alias("affected_packages"),
        F.array().cast(
            "array<struct<url:string,reference_type:string>>"
        ).alias("references"),
        severities.alias("severities"),
        F.array().cast("array<int>").alias("weaknesses"),
        F.concat(F.lit("https://synth.example/adv/"),
                 k.cast("string")).alias("url"),
        k.alias("o_orderkey"),
        F.col("o_custkey"),
    )


_Q81_ORACLE = f"""
WITH base AS (
    SELECT o_orderkey AS k, o_custkey,
           'synth/ADV-' || CAST(o_orderkey AS VARCHAR) AS avid,
           CASE WHEN o_orderkey % 3 = 0 THEN 2 ELSE 1 END
               AS n_content_versions,
           (CASE WHEN o_orderkey % 3 = 0 THEN 'revised ' ELSE 'initial ' END)
               || o_orderpriority AS latest_summary,
           CAST(o_orderkey % 5 + 1 AS INT) AS j,
           CAST(o_orderkey % 5 + 1 + o_orderkey % 8 AS INT) AS kk,
           o_orderkey % {N_PURLS} AS p,
           (o_orderkey % 4 <> 0
            AND o_orderkey % 5 + 1 + o_orderkey % 8 + 1 <= {N_VERSIONS})
               AS fixed_ok,
           (o_orderkey % 6) * 2 AS sev_v,
           CASE WHEN o_orderkey % 2 = 0 THEN 10 ELSE 5 END AS w,
           (o_orderkey % 10 = 0) AS high_epss
    FROM orders
),
unf AS (
    SELECT b.k, COUNT(v.n) AS n_affected_versions
    FROM base b
    LEFT JOIN (SELECT n FROM generate_series(1, {N_VERSIONS}) AS t(n)) v
      ON v.n BETWEEN b.j AND b.kk
    GROUP BY b.k
),
risk AS (
    SELECT k,
           CASE WHEN high_epss THEN GREATEST(sev_v * w / 10.0, 0.9)
                ELSE sev_v * w / 10.0 END AS ws,
           CASE WHEN high_epss THEN 2.0 ELSE 0.5 END AS expl
    FROM base
),
grp AS (
    SELECT k,
           COUNT(*) OVER (PARTITION BY p, o_custkey) AS group_size,
           (k = MAX(k) OVER (PARTITION BY p, o_custkey)) AS is_primary
    FROM base
),
bulk AS (SELECT p, COUNT(*) AS bulk_members FROM base GROUP BY p)
SELECT b.avid,
       b.k AS o_orderkey,
       CAST(b.n_content_versions AS BIGINT) AS n_content_versions,
       b.latest_summary,
       CAST(u.n_affected_versions AS BIGINT) AS n_affected_versions,
       b.fixed_ok,
       ROUND(r.ws, 1) AS weighted_severity,
       r.expl AS exploitability,
       LEAST(10.0, ROUND(ROUND(r.ws, 1) * r.expl, 1)) AS risk_score,
       CAST(g.group_size AS BIGINT) AS group_size,
       g.is_primary,
       CAST(bk.bulk_members AS BIGINT) AS bulk_members
FROM base b
JOIN unf u ON u.k = b.k
JOIN risk r ON r.k = b.k
JOIN grp g ON g.k = b.k
JOIN bulk bk ON bk.p = b.p
"""


@query("q81_advisory_pipeline", oracle=_Q81_ORACLE)
def q81_advisory_pipeline(spark, sf_dir):
    from vulnerablecode_spark.functions.risk import compute_advisory_risk
    from vulnerablecode_spark.operators.grouping import group_advisories
    from vulnerablecode_spark.operators.ingest import (extract_impacts,
                                                       merge_advisories,
                                                       to_canonical_advisories)
    from vulnerablecode_spark.operators.serve import bulk_affected_response
    from vulnerablecode_spark.operators.unfurl import (fixed_package_rows,
                                                       unfurl_affected)

    orders = _load(spark, sf_dir, "orders")

    # Stage 1 — ingest two collections: content-id + (avid, content) dedup
    # + is_latest SCD2 (pipes/advisory.py:292-420)
    batch1 = to_canonical_advisories(
        _parsed_batch(orders, revised=False), "synth", "q81",
        date_collected="2024-01-01 00:00:00")
    batch2 = to_canonical_advisories(
        _parsed_batch(orders, revised=True), "synth", "q81",
        date_collected="2024-02-01 00:00:00")
    # the canonical advisory table is STORED in production (ingest writes
    # it once; every later stage reads it) — materialize the surrogate so
    # the six downstream branches don't re-run the two-batch ingest DAG
    merged = merge_advisories(batch1, batch2).localCheckpoint(eager=False)
    n_versions = merged.groupBy("avid").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_content_versions"))
    latest = merged.filter(F.col("is_latest")).withColumn(
        # precedence drives the grouping primary (group_advisories.py:247):
        # orderkey is unique → tie-free, oracle-replicable
        "precedence", F.col("o_orderkey").cast("int"))

    # Stage 2 — impacts + unfurl against the upstream version universe
    # (unfurl_version_range.py:129-186; univers containment kernel)
    impacts = extract_impacts(latest)
    pv = _package_versions_dim(spark)
    unfurled = unfurl_affected(impacts, F.broadcast(pv))
    n_aff = unfurled.groupBy("advisory_pk").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_affected_versions"))
    fixed_adv = fixed_package_rows(impacts, F.broadcast(pv)).join(
        impacts.select("impact_pk", "advisory_pk"), "impact_pk")
    fixed_ok = (
        fixed_adv.select("advisory_pk").distinct()
        .withColumn("fixed_ok", F.lit(True))
    )

    # Stage 3 — risk (risk.py:21-105: severity explode × broadcast weight
    # dim → max; exploitability precedence chain; min(ws×expl, 10))
    risk = compute_advisory_risk(latest, spark)

    # Stage 4 — grouping: union-find over shared identifiers per
    # (package, relation) (group_advisories.py:143-285)
    base_purl = F.element_at(F.col("affected_packages"), 1)["package"]
    membership = latest.select(
        F.xxhash64(base_purl).alias("package_pk"),
        F.lit("affecting").alias("relation_type"),
        "advisory_pk",
    )
    groups = group_advisories(membership, latest)
    w_grp = Window.partitionBy("package_pk", "relation_type", "group_id")
    grp = groups.select(
        F.col("member_advisory_pk").alias("advisory_pk"),
        F.count(F.lit(1)).over(w_grp).cast("bigint").alias("group_size"),
        (F.col("member_advisory_pk") == F.col("primary_advisory_pk"))
        .alias("is_primary"),
    )

    # Stage 5 — bulk-lookup membership (api_v3.py:566-890): the REAL
    # serialized response per purl, member count read back from its JSON
    fixed_purls = (
        fixed_adv
        .groupBy("advisory_pk")
        .agg(F.array_sort(F.collect_set(
            F.concat("base_purl", F.lit("@"), "version")))
            .alias("fixed_by_purls"))
    )
    affected = (
        latest.select("advisory_pk", "avid", "summary", "aliases",
                      base_purl.alias("purl"))
        .join(fixed_purls, "advisory_pk", "left")
        .join(risk.select("advisory_pk", "weighted_severity",
                          "exploitability", "risk_score"),
              "advisory_pk")
    )
    bulk = bulk_affected_response(affected.drop("advisory_pk"))
    bulk_members = bulk.select(
        "purl",
        F.json_array_length("response").cast("bigint").alias("bulk_members"),
    )

    # Verdict — one row per advisory, every stage's outcome as a column
    return (
        latest.select("advisory_pk", "avid", "o_orderkey",
                      F.col("summary").alias("latest_summary"),
                      base_purl.alias("purl"))
        .join(n_versions, "avid")
        .join(n_aff, "advisory_pk")
        .join(fixed_ok, "advisory_pk", "left")
        .join(risk, "advisory_pk")
        .join(grp, "advisory_pk")
        .join(F.broadcast(bulk_members), "purl")
        .select(
            "avid", "o_orderkey", "n_content_versions", "latest_summary",
            "n_affected_versions",
            F.coalesce("fixed_ok", F.lit(False)).alias("fixed_ok"),
            "weighted_severity", "exploitability", "risk_score",
            "group_size", "is_primary", "bulk_members",
        )
    )
