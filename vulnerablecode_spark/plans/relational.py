"""Relational operator inventory (SURVEY.md §2.2-§2.9) as named queries.

Each query re-expresses one operator family of the reference
(aboutcode-org/vulnerablecode, cited file:line) on the driver's synthetic
TPC-H-ish tables. The Spark side is pure DataFrame API (Catalyst-optimized,
no Python UDFs); the oracle is the equivalent ANSI SQL for DuckDB.

Scale notes are attached per query: how the plan behaves at 100 TB /
1000 executors, which side broadcasts, where the shuffles are.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from vulnerablecode_spark.plans.registry import _load, query

# ---------------------------------------------------------------------------
# §2.4 aggregations — flagship pricing-summary scan+agg (the "full-corpus
# sweep" shape of the reference's risk/severity pipelines,
# compute_package_risk.py:24-185).
# Scale: single scan, map-side partial agg, tiny shuffle (6 groups). Filter
# and the 7-column projection push into the parquet scan.
# ---------------------------------------------------------------------------


@query(
    "q01_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2)                                 AS sum_qty,
           ROUND(SUM(l_extendedprice), 2)                            AS sum_base_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)         AS sum_disc_price,
           ROUND(AVG(l_quantity), 2)                                 AS avg_qty,
           ROUND(AVG(l_extendedprice), 2)                            AS avg_price,
           COUNT(*)                                                  AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q01_pricing_summary(spark, sf_dir):
    li = _load(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 2).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 2).alias("avg_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# §2.2 point lookup — BaseQuerySet.get_or_none (models.py:91-96).
# Scale: predicate pushdown to parquet row-group stats; no shuffle.
# ---------------------------------------------------------------------------


@query(
    "q02_point_lookup",
    oracle="SELECT c_custkey, c_name, c_nationkey, c_mktsegment FROM customer WHERE c_custkey = 42",
)
def q02_point_lookup(spark, sf_dir):
    cust = _load(spark, sf_dir, "customer")
    return cust.filter(F.col("c_custkey") == 42).select(
        "c_custkey", "c_name", "c_nationkey", "c_mktsegment"
    )


# ---------------------------------------------------------------------------
# §2.3 semi/anti/exists joins — affecting_vulnerabilities (models.py:114-118),
# with_is_vulnerable (models.py:802-812), ghost detection anti-join
# (flag_ghost_packages.py:36-90).
# Scale: left_semi/left_anti avoid materializing the join payload; with AQE
# the dedup'd key side broadcasts when small.
# ---------------------------------------------------------------------------


@query(
    "q03_semi_join",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
)
def q03_semi_join(spark, sf_dir):
    cust, orders = _load(spark, sf_dir, "customer", "orders")
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


@query(
    "q04_anti_join",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
)
def q04_anti_join(spark, sf_dir):
    cust, orders = _load(spark, sf_dir, "customer", "orders")
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


@query(
    "q05_exists_flag",
    oracle="""
    SELECT c_custkey, c_name,
           (c_custkey IN (SELECT o_custkey FROM orders)) AS is_active
    FROM customer
    """,
)
def q05_exists_flag(spark, sf_dir):
    cust, orders = _load(spark, sf_dir, "customer", "orders")
    active = orders.select(F.col("o_custkey").alias("k")).distinct()
    return (
        cust.join(active, cust.c_custkey == active.k, "left")
        .select("c_custkey", "c_name", F.col("k").isNotNull().alias("is_active"))
    )


# ---------------------------------------------------------------------------
# §2.4 count annotations — with_vulnerability_counts (models.py:725-733,
# 3585-3595): per-parent COUNT(DISTINCT child) kept for parents with zero
# children.
# Scale: pre-aggregate the fact side BEFORE the join (map-side combine),
# then join the small per-key aggregate — never join-then-aggregate.
# ---------------------------------------------------------------------------


@query(
    "q06_counts",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           CAST(COALESCE(o.cnt, 0) AS BIGINT) AS order_count,
           ROUND(COALESCE(o.total, 0.0), 2)   AS total_spent
    FROM customer c
    LEFT JOIN (
        SELECT o_custkey, COUNT(DISTINCT o_orderkey) AS cnt, SUM(o_totalprice) AS total
        FROM orders GROUP BY o_custkey
    ) o ON o.o_custkey = c.c_custkey
    """,
)
def q06_counts(spark, sf_dir):
    cust, orders = _load(spark, sf_dir, "customer", "orders")
    agg = orders.groupBy("o_custkey").agg(
        F.countDistinct("o_orderkey").alias("cnt"),
        F.sum("o_totalprice").alias("total"),
    )
    return (
        cust.join(agg, cust.c_custkey == agg.o_custkey, "left")
        .select(
            "c_custkey",
            "c_name",
            F.coalesce(F.col("cnt"), F.lit(0)).cast("bigint").alias("order_count"),
            F.round(F.coalesce(F.col("total"), F.lit(0.0)), 2).alias("total_spent"),
        )
    )


# ---------------------------------------------------------------------------
# §2.2 tiered short-circuit search — VulnerabilityQuerySet.search
# (models.py:150-178): exact → prefix → contains, each tier only if the
# previous returned nothing. Rewritten as ONE pass computing a match tier
# plus a global-min selection (SURVEY §4 item 4) instead of N round trips.
# Scale: ONE corpus scan. The global min runs as an empty-partition window
# over the already-FILTERED match set (3 narrow columns), not the corpus —
# search matches are page-bounded in the serving layer, so that exchange
# is tiny, while the broadcast-agg alternative costs a second full corpus
# scan (measured 1.8x slower at sf0.1, r9; see SCALE.md q07).
# ---------------------------------------------------------------------------


@query(
    "q07_tiered_search",
    oracle="""
    WITH scored AS (
        SELECT p_partkey, p_name,
               CASE WHEN p_name = 'large' THEN 1
                    WHEN p_name LIKE 'large%' THEN 2
                    ELSE 3 END AS tier
        FROM part
        WHERE p_name LIKE '%large%'
    ), m AS (SELECT MIN(tier) AS mt FROM scored)
    SELECT s.p_partkey, s.p_name, s.tier FROM scored s, m WHERE s.tier = m.mt
    """,
)
def q07_tiered_search(spark, sf_dir):
    part = _load(spark, sf_dir, "part")
    term = "large"
    scored = part.filter(F.col("p_name").contains(term)).select(
        "p_partkey",
        "p_name",
        F.when(F.col("p_name") == term, 1)
        .when(F.col("p_name").startswith(term), 2)
        .otherwise(3)
        .alias("tier"),
    )
    w = Window.partitionBy()  # match-set-sized, see scale note above
    return (
        scored.withColumn("mt", F.min("tier").over(w))
        .filter(F.col("tier") == F.col("mt"))
        .select("p_partkey", "p_name", "tier")
    )


# ---------------------------------------------------------------------------
# §2.5 SCD2 current-version window — is_latest per avid
# (pipes/advisory.py:340-346, index models.py:3309-3312): newest row per
# entity via row_number over (key ORDER BY date DESC, id DESC).
# Scale: one hash shuffle on the entity key; the same partitioning is what
# a Delta MERGE maintaining is_latest would reuse.
# ---------------------------------------------------------------------------


@query(
    "q08_latest_per_key",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate FROM (
        SELECT o_custkey, o_orderkey, o_orderdate,
               ROW_NUMBER() OVER (PARTITION BY o_custkey
                                  ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        FROM orders
    ) WHERE rn = 1
    """,
)
def q08_latest_per_key(spark, sf_dir):
    orders = _load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc()
    )
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_custkey", "o_orderkey", "o_orderdate")
    )


# ---------------------------------------------------------------------------
# §2.5 version_rank — rank 1..N within a (type,namespace,name) group
# (compute_package_version_rank.py:33-94). Versions rank-encode ONCE so all
# later comparisons are integer (models.py:893-898); here the orderable key
# stands in for the univers sort key.
# ---------------------------------------------------------------------------


@query(
    "q09_version_rank",
    oracle="""
    SELECT p_brand, p_partkey,
           CAST(RANK() OVER (PARTITION BY p_brand ORDER BY p_retailprice) AS INT)
               AS version_rank
    FROM part
    """,
)
def q09_version_rank(spark, sf_dir):
    part = _load(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy("p_retailprice")
    return part.select(
        "p_brand", "p_partkey", F.rank().over(w).alias("version_rank")
    )


# ---------------------------------------------------------------------------
# §2.3/§2.5 as-of forward join — nearest_patched_package (utils.py:176-203,
# models.py:1107-1147): first value strictly greater within the group.
# Implemented as a range-frame window min — ONE shuffle on the group key,
# no self-join.
# ---------------------------------------------------------------------------


@query(
    "q10_next_greater",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderdate,
           (SELECT MIN(o2.o_orderdate) FROM orders o2
            WHERE o2.o_custkey = o1.o_custkey AND o2.o_orderdate > o1.o_orderdate)
           AS next_orderdate
    FROM orders o1
    """,
)
def q10_next_greater(spark, sf_dir):
    orders = _load(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").cast("timestamp_ltz").cast("long"))
        .rangeBetween(1, Window.unboundedFollowing)
    )
    return orders.select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        F.min("o_orderdate").over(w).alias("next_orderdate"),
    )


# ---------------------------------------------------------------------------
# §2.6 per-group top-k — max_advisories cap (api_v3.py:267, 326-330).
# Scale: row_number window = single shuffle; with AQE skewed customers
# split. Never ORDER BY the whole table for a per-group limit.
# ---------------------------------------------------------------------------


@query(
    "q11_topk_per_group",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, CAST(rk AS INT) AS rk FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               ROW_NUMBER() OVER (PARTITION BY o_custkey
                                  ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
        FROM orders
    ) WHERE rk <= 3
    """,
)
def q11_topk_per_group(spark, sf_dir):
    orders = _load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        orders.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rk")
    )


# ---------------------------------------------------------------------------
# §2.7 set ops — union of affecting+fixing id sets (models.py:3017-3041).
# ---------------------------------------------------------------------------


@query(
    "q12_union_ids",
    oracle="""
    SELECT CAST(id AS BIGINT) AS id FROM (
        SELECT o_custkey AS id FROM orders
        UNION
        SELECT CAST(s_suppkey AS BIGINT) AS id FROM supplier
    )
    """,
)
def q12_union_ids(spark, sf_dir):
    orders, supplier = _load(spark, sf_dir, "orders", "supplier")
    return (
        orders.select(F.col("o_custkey").alias("id"))
        .union(supplier.select(F.col("s_suppkey").cast("bigint").alias("id")))
        .distinct()
    )


# ---------------------------------------------------------------------------
# §2.4 weighted severity — risk.py:21-61: score × source-weight/10, max per
# entity, weight from a config dimension (WEIGHT_CONFIG ~2900 entries).
# Scale: the weight table is a classic broadcast dimension — never shuffled.
# ---------------------------------------------------------------------------

_PRIORITY_WEIGHTS = [
    ("1-URGENT", 10), ("2-HIGH", 8), ("3-MEDIUM", 6),
    ("4-NOT SPECIFIED", 5), ("5-LOW", 2),
]

# Session-scoped weight dimension: the reference's WEIGHT_CONFIG is a
# static ~2900-entry config table — on a real cluster it's loaded once per
# application and broadcast to every query, never re-created per call
# (spark.createDataFrame is a driver→JVM RPC + parallelize job each time).
# Bounded like plans/llm.py's artifact registry: one entry per application.
_DIM_CACHE: dict[str, object] = {}


def _weights_dim(spark):
    app = spark.sparkContext.applicationId
    w = _DIM_CACHE.get(app)
    if w is None:
        _DIM_CACHE.clear()
        w = spark.createDataFrame(
            _PRIORITY_WEIGHTS, "priority string, weight int"
        ).localCheckpoint(eager=True)
        _DIM_CACHE[app] = w
    return w


@query(
    "q13_weighted_severity",
    # Fixed-point arithmetic: prices have 2 decimals, so work in integer
    # cents and round half-up with (x+5) div 10 — ROUND over a computed
    # double diverges between engines exactly at decimal half-boundaries
    # (Spark rounds the shortest-decimal repr HALF_UP, DuckDB rounds the
    # binary value; first observed at sf0.1: 161890.675 → .68 vs .67).
    oracle="""
    SELECT o_custkey,
           CAST(((MAX(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
                      * CASE o_orderpriority
                        WHEN '1-URGENT' THEN 10 WHEN '2-HIGH' THEN 8
                        WHEN '3-MEDIUM' THEN 6 WHEN '4-NOT SPECIFIED' THEN 5
                        WHEN '5-LOW' THEN 2 ELSE 5 END) + 5) // 10
                ) / 100.0 AS DOUBLE) AS weighted_severity
    FROM orders GROUP BY o_custkey
    """,
)
def q13_weighted_severity(spark, sf_dir):
    orders = _load(spark, sf_dir, "orders")
    weights = _weights_dim(spark)
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
    return (
        orders.join(
            F.broadcast(weights),
            orders.o_orderpriority == weights.priority,
            "left",
        )
        .withColumn("w", F.coalesce(F.col("weight"), F.lit(5)))
        .groupBy("o_custkey")
        .agg(F.max(cents * F.col("w")).alias("_m"))
        .selectExpr(
            "o_custkey",
            "CAST(((_m + 5) div 10) / 100.0 AS DOUBLE) AS weighted_severity",
        )
    )


# ---------------------------------------------------------------------------
# §2.4 risk score — risk.py:95-105 / models.py:305-315:
# min(weighted_severity × exploitability, 10) rounded to 1dp.
# ---------------------------------------------------------------------------


@query(
    "q14_risk_score",
    # Fixed-point like q13: price cents × doubled exploitability factor
    # (so 0.5 stays integer), half-up rounding to 1dp via (x+5e5) div 1e6
    # — no ROUND over computed doubles (decimal-half-boundary hazard).
    oracle="""
    SELECT o_orderkey,
           LEAST(10.0, CAST(
               ((CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) *
                 CASE o_orderpriority WHEN '1-URGENT' THEN 4
                      WHEN '2-HIGH' THEN 2 ELSE 1 END + 500000) // 1000000
               ) / 10.0 AS DOUBLE)) AS risk_score
    FROM orders
    """,
)
def q14_risk_score(spark, sf_dir):
    orders = _load(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
    f2 = (  # exploitability × 2, kept integer
        F.when(F.col("o_orderpriority") == "1-URGENT", 4)
        .when(F.col("o_orderpriority") == "2-HIGH", 2)
        .otherwise(1)
    )
    tenths = F.floor((cents * f2 + F.lit(500000)) / F.lit(1000000))
    return orders.select(
        "o_orderkey",
        F.least(F.lit(10.0),
                (tenths / F.lit(10.0)).cast("double")).alias("risk_score"),
    )


# ---------------------------------------------------------------------------
# §2.4 exploitability level — risk.py:64-92: case-priority aggregation over
# exploit/EPSS/reference evidence → {0.5, 1, 2}.
# ---------------------------------------------------------------------------


@query(
    "q15_exploitability",
    oracle="""
    SELECT user_id,
           MAX(CASE WHEN event_type = 'error' THEN 2.0
                    WHEN event_type = 'purchase' THEN 1.0
                    ELSE 0.5 END) AS exploitability
    FROM events GROUP BY user_id
    """,
)
def q15_exploitability(spark, sf_dir):
    events = _load(spark, sf_dir, "events")
    level = (
        F.when(F.col("event_type") == "error", 2.0)
        .when(F.col("event_type") == "purchase", 1.0)
        .otherwise(0.5)
    )
    return events.groupBy("user_id").agg(F.max(level).alias("exploitability"))


# ---------------------------------------------------------------------------
# §2.4 consensus vote — per-alias majority vote across sources
# (compute_advisory_todo.py:781-838): mode with deterministic tie-break.
# Scale: two-level agg (count then argmax) — both map-side combinable.
# ---------------------------------------------------------------------------


@query(
    "q16_consensus",
    oracle="""
    SELECT user_id, event_type AS consensus_type, CAST(cnt AS BIGINT) AS votes
    FROM (
        SELECT user_id, event_type, cnt,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY cnt DESC, event_type ASC) AS rn
        FROM (SELECT user_id, event_type, COUNT(*) AS cnt
              FROM events GROUP BY user_id, event_type)
    ) WHERE rn = 1
    """,
)
def q16_consensus(spark, sf_dir):
    events = _load(spark, sf_dir, "events")
    counts = events.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy("user_id").orderBy(
        F.col("cnt").desc(), F.col("event_type").asc()
    )
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_type").alias("consensus_type"),
            F.col("cnt").cast("bigint").alias("votes"),
        )
    )


# ---------------------------------------------------------------------------
# §2.8 severity range — get_severity_range (utils.py:512-546): "lo - hi"
# over a value set.
# ---------------------------------------------------------------------------


@query(
    "q17_severity_range",
    oracle="""
    SELECT p_brand,
           ROUND(MIN(p_retailprice), 2) AS min_price,
           ROUND(MAX(p_retailprice), 2) AS max_price,
           COUNT(*) AS n_parts
    FROM part GROUP BY p_brand
    """,
)
def q17_severity_range(spark, sf_dir):
    part = _load(spark, sf_dir, "part")
    return part.groupBy("p_brand").agg(
        F.round(F.min("p_retailprice"), 2).alias("min_price"),
        F.round(F.max("p_retailprice"), 2).alias("max_price"),
        F.count(F.lit(1)).alias("n_parts"),
    )


# ---------------------------------------------------------------------------
# §2.3 prefetch_related — join + group-materialize related rows per parent
# (api.py:666-685) = groupBy(parent).agg(collect_set), rendered as a sorted
# joined string so both engines hash identically.
# ---------------------------------------------------------------------------


@query(
    "q18_collect_related",
    oracle="""
    SELECT o_custkey,
           ARRAY_TO_STRING(LIST_SORT(LIST(DISTINCT o_orderpriority)), ',') AS priorities
    FROM orders GROUP BY o_custkey
    """,
)
def q18_collect_related(spark, sf_dir):
    orders = _load(spark, sf_dir, "orders")
    return orders.groupBy("o_custkey").agg(
        F.array_join(F.array_sort(F.collect_set("o_orderpriority")), ",").alias(
            "priorities"
        )
    )


# ---------------------------------------------------------------------------
# §2.9 incremental/tumbling time bucket — scheduled micro-batch semantics
# (schedules.py:22-44); in Spark a tumbling event-time window.
# ---------------------------------------------------------------------------


@query(
    "q19_hourly_rollup",
    oracle="""
    SELECT DATE_TRUNC('hour', ts) AS bucket, event_type,
           COUNT(*) AS n, ROUND(SUM(value), 2) AS total_value
    FROM events GROUP BY 1, 2
    """,
)
def q19_hourly_rollup(spark, sf_dir):
    events = _load(spark, sf_dir, "events")
    return events.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("bucket"), F.col("event_type")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )


# ---------------------------------------------------------------------------
# §2.8 JSON field access — JSONField columns (models.py:1387-1399) and
# get_item (utils.py:214-246): extract from a JSON props column.
# ---------------------------------------------------------------------------


@query(
    "q20_json_extract",
    oracle="""
    SELECT event_type,
           ROUND(AVG(k), 2) AS avg_k,
           CAST(MAX(k) AS INTEGER) AS max_k
    FROM (SELECT event_type,
                 CAST(REGEXP_EXTRACT(props, '([0-9]+)', 1) AS INTEGER) AS k
          FROM events)
    GROUP BY event_type
    """,
)
def q20_json_extract(spark, sf_dir):
    events = _load(spark, sf_dir, "events")
    k = F.regexp_extract(F.col("props"), r"([0-9]+)", 1).cast("int")
    return (
        events.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.round(F.avg("k"), 2).alias("avg_k"),
            F.max("k").cast("int").alias("max_k"),
        )
    )


# ---------------------------------------------------------------------------
# §2.3 bounded range join — version-in-range unfurl shape
# (unfurl_version_range.py:129-162): interval containment re-expressed as a
# bucketed equi-join + residual filter, NOT a nested-loop theta join.
# Scale: candidate pairs come from an equi-join on (user, hour-bucket);
# the probe side explodes to exactly 2 buckets per row, so the join stays
# hash-partitioned and skew-splittable — this is the 100 TB-safe shape.
# ---------------------------------------------------------------------------


@query(
    "q21_bucketed_range_join",
    oracle="""
    SELECT s.event_id, s.user_id, CAST(COUNT(c.event_id) AS BIGINT) AS click_count
    FROM events s
    LEFT JOIN events c
      ON c.user_id = s.user_id AND c.event_type = 'click'
     AND c.ts >= s.ts AND c.ts < s.ts + INTERVAL 1 HOUR
    WHERE s.event_type = 'signup'
    GROUP BY s.event_id, s.user_id
    """,
)
def q21_bucketed_range_join(spark, sf_dir):
    events = _load(spark, sf_dir, "events")
    signups = events.filter(F.col("event_type") == "signup").select(
        F.col("event_id").alias("s_id"), F.col("user_id").alias("s_user"),
        F.col("ts").alias("s_ts"),
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("c_id"), F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"), F.date_trunc("hour", "ts").alias("c_bucket"),
    )
    probe = signups.withColumn(
        "bucket",
        F.explode(
            F.array(
                F.date_trunc("hour", "s_ts"),
                F.date_trunc("hour", "s_ts") + F.expr("INTERVAL 1 HOUR"),
            )
        ),
    )
    joined = probe.join(
        clicks,
        (probe.s_user == clicks.c_user)
        & (probe.bucket == clicks.c_bucket)
        & (clicks.c_ts >= probe.s_ts)
        & (clicks.c_ts < probe.s_ts + F.expr("INTERVAL 1 HOUR")),
        "left",
    )
    return joined.groupBy(
        F.col("s_id").alias("event_id"), F.col("s_user").alias("user_id")
    ).agg(F.count("c_id").alias("click_count"))


# ---------------------------------------------------------------------------
# §2.3 as-of backward join — "latest event at or before t" (the
# nearest-patched / valid_versions.py:69-82 shape, time instead of version
# rank). Implemented as a merge-sorted union + last(ignorenulls) window:
# ONE shuffle on the key, no self-join, no correlated subquery.
# ---------------------------------------------------------------------------


@query(
    "q22_asof_join",
    oracle="""
    SELECT p.event_id, p.user_id, p.ts,
           (SELECT MAX(v.ts) FROM events v
            WHERE v.user_id = p.user_id AND v.event_type = 'view'
              AND v.ts <= p.ts) AS last_view_ts
    FROM events p WHERE p.event_type = 'purchase'
    """,
)
def q22_asof_join(spark, sf_dir):
    events = _load(spark, sf_dir, "events")
    views = events.filter(F.col("event_type") == "view").select(
        "user_id",
        F.col("ts").alias("t"),
        F.col("ts").alias("view_ts"),
        F.lit(None).cast("long").alias("event_id"),
        F.lit(0).alias("is_purchase"),
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("t"),
        F.lit(None).cast("timestamp").alias("view_ts"),
        "event_id",
        F.lit(1).alias("is_purchase"),
    )
    merged = views.unionByName(purchases)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("t").asc(), F.col("is_purchase").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        merged.withColumn("last_view_ts", F.last("view_ts", ignorenulls=True).over(w))
        .filter(F.col("is_purchase") == 1)
        .select("event_id", "user_id", F.col("t").alias("ts"), "last_view_ts")
    )


# ---------------------------------------------------------------------------
# §2.9 sessionization (batch form) — the stateful streaming operator
# (streaming/stateful.py) has this exact batch equivalent: a gap > 30min
# starts a new session; session id = running count of gap-starts. Windowed
# lag + conditional running sum, one shuffle on the user key.
# ---------------------------------------------------------------------------


@query(
    "q41_sessionization",
    oracle="""
    WITH marked AS (
        SELECT user_id, ts, event_id,
               CASE WHEN ts - LAG(ts) OVER w <= INTERVAL 30 MINUTE
                    THEN 0 ELSE 1 END AS new_session
        FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), numbered AS (
        -- (ts, event_id) ordering like the Spark side: a ts-only ROWS
        -- frame visits tied timestamps in arbitrary order, so a tie at a
        -- session boundary would assign rows nondeterministically
        SELECT user_id, ts,
               SUM(new_session) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING) AS session_no
        FROM marked
    )
    SELECT user_id, CAST(session_no AS BIGINT) AS session_no,
           MIN(ts) AS session_start, MAX(ts) AS session_end,
           COUNT(*) AS n_events
    FROM numbered GROUP BY user_id, session_no
    """,
)
def q41_sessionization(spark, sf_dir):
    events = _load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # timestamp-domain comparison (ts <= prev + 30min ⇔ ts - prev <= 30min):
    # works for TIMESTAMP and TIMESTAMP_NTZ alike — parquet timestamps
    # without a zone annotation load as NTZ, which Spark refuses to cast to
    # a numeric epoch directly.
    prev_ts = F.lag("ts").over(w)
    marked = events.withColumn(
        "new_session",
        F.when(F.col("ts") <= prev_ts + F.expr("INTERVAL 30 MINUTES"),
               0).otherwise(1),
    )
    w_run = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    numbered = marked.withColumn("session_no",
                                 F.sum("new_session").over(w_run))
    return numbered.groupBy(
        "user_id", F.col("session_no").cast("bigint").alias("session_no")
    ).agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
    )


# ---------------------------------------------------------------------------
# §2.4 distribution stats — severity-range style analytics generalized:
# exact median (continuous interpolation) + p95 per group, rounded so both
# engines produce identical doubles.
# ---------------------------------------------------------------------------


@query(
    "q42_percentiles",
    oracle="""
    SELECT event_type,
           ROUND(QUANTILE_CONT(value, 0.5), 3) AS p50,
           ROUND(QUANTILE_CONT(value, 0.95), 3) AS p95,
           ROUND(AVG(value), 3) AS mean
    FROM events GROUP BY event_type
    """,
)
def q42_percentiles(spark, sf_dir):
    events = _load(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        F.round(F.percentile("value", F.lit(0.5)), 3).alias("p50"),
        F.round(F.percentile("value", F.lit(0.95)), 3).alias("p95"),
        F.round(F.avg("value"), 3).alias("mean"),
    )


# ---------------------------------------------------------------------------
# §2.5 sessionization — gap-based session assignment (the batch twin of a
# Structured Streaming session window, and the classic "changelog burst"
# grouping the reference's VulnerabilityChangeLog ordering implies):
# per user, a new session starts when the gap to the previous event
# exceeds 12h. Gaps are compared in INTEGER microseconds
# (timestampdiff / date_diff) — every ts here carries sub-second parts,
# so second-truncated casts would disagree across engines at boundaries.
# Scale: ONE hash shuffle on user_id feeds both windows (lag + running
# sum); the per-session rollup shuffles the already-session-tagged rows
# on the compound key — the q16 two-shuffle shape.
# ---------------------------------------------------------------------------


@query(
    "q108_sessionize",
    oracle="""
    WITH seq AS (
        SELECT user_id, ts, event_id,
               CASE WHEN LAG(ts) OVER w IS NULL
                         OR date_diff('microsecond', LAG(ts) OVER w, ts)
                            > 43200000000
                    THEN 1 ELSE 0 END AS is_new
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
        SELECT user_id, ts,
               SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS session_idx
        FROM seq
    )
    SELECT user_id, CAST(session_idx AS INT) AS session_idx,
           COUNT(*) AS n_events, MIN(ts) AS t_start, MAX(ts) AS t_end
    FROM sess GROUP BY user_id, session_idx
    """,
)
def q108_sessionize(spark, sf_dir):
    events = _load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged = (
        events.select("user_id", "ts", "event_id")
        .withColumn("_prev_ts", F.lag("ts").over(w))
        .withColumn(
            "is_new",
            F.when(
                F.col("_prev_ts").isNull()
                | (F.expr("timestampdiff(MICROSECOND, _prev_ts, ts)")
                   > 43_200_000_000),
                1,
            ).otherwise(0),
        )
        .withColumn("session_idx", F.sum("is_new").over(run).cast("int"))
    )
    return tagged.groupBy("user_id", "session_idx").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("t_start"),
        F.max("ts").alias("t_end"),
    )


# ---------------------------------------------------------------------------
# §2.3/§2.5 single-scan range-count — the SAME-TABLE special case of
# q21's bucketed range join, rewritten as one window: when probe and
# build rows live in one table, "count clicks within [t, t+1h) of each
# signup" needs no join at all — hash the table by user once, sort by
# integer-microsecond ts, and a value-range window frame counts the
# conditional rows. One scan + ONE exchange vs q21's two scans + three
# (probe explode, build, final agg). q21 stays the general shape (two
# DIFFERENT relations); this is the plan a planner should pick when the
# self-join is syntactic. Range arithmetic in integer µs on BOTH
# engines — [0, 3599999999] inclusive ≡ c_ts < s_ts + 1h at µs
# resolution.
# ---------------------------------------------------------------------------


@query(
    "q113_range_count_window",
    oracle="""
    SELECT s.event_id, s.user_id, CAST(COUNT(c.event_id) AS BIGINT) AS click_count
    FROM events s
    LEFT JOIN events c
      ON c.user_id = s.user_id AND c.event_type = 'click'
     AND c.ts >= s.ts AND c.ts < s.ts + INTERVAL 1 HOUR
    WHERE s.event_type = 'signup'
    GROUP BY s.event_id, s.user_id
    """,
)
def q113_range_count_window(spark, sf_dir):
    events = _load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts").cast("timestamp")))
        .rangeBetween(0, 3_599_999_999)
    )
    counted = events.withColumn(
        "click_count",
        F.count(F.when(F.col("event_type") == "click", 1)).over(w)
        .cast("bigint"),
    )
    return counted.filter(F.col("event_type") == "signup").select(
        "event_id", "user_id", "click_count")


# ---------------------------------------------------------------------------
# §2.9 event-time windowed rollup — the batch twin of the Structured
# Streaming tumbling-window aggregation (streaming/windows.py): one
# (window, key) hash shuffle with map-side combine; the value sum is
# quantized to integer micro-units so the double column aggregates
# order-free and bit-stable. The streaming form (withWatermark + append
# mode, late-data semantics) runs the SAME rollup and is exercised in
# tests/test_streaming.py.
# ---------------------------------------------------------------------------


@query(
    "q139_windowed_counts",
    oracle="""
    SELECT date_trunc('hour', ts) AS window_start, event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(FLOOR(value * 1000000.0 + 0.5) AS BIGINT))
                AS BIGINT) AS value_sum_q
    FROM events GROUP BY 1, 2
    """,
)
def q139_windowed_counts(spark, sf_dir):
    from vulnerablecode_spark.streaming.windows import windowed_event_counts

    events = _load(spark, sf_dir, "events")
    return windowed_event_counts(events, window="1 hour")


# ---------------------------------------------------------------------------
# §2.9 event-sequence analytics (operators/events.py): ordered funnel
# and day-grain cohort retention. Funnel stage frames are user-
# cardinality and every join is co-keyed on user_id; retention is two
# user-keyed aggregates meeting on the user key. Strictly-after stage
# semantics compare full-microsecond timestamps.
# ---------------------------------------------------------------------------


@query(
    "q141_event_funnel",
    oracle="""
    WITH s1 AS (
        SELECT user_id, MIN(ts) AS t FROM events
        WHERE event_type = 'view' GROUP BY user_id
    ),
    s2 AS (
        SELECT e.user_id, MIN(e.ts) AS t
        FROM events e JOIN s1 ON e.user_id = s1.user_id AND e.ts > s1.t
        WHERE e.event_type = 'click' GROUP BY e.user_id
    ),
    s3 AS (
        SELECT e.user_id, MIN(e.ts) AS t
        FROM events e JOIN s2 ON e.user_id = s2.user_id AND e.ts > s2.t
        WHERE e.event_type = 'purchase' GROUP BY e.user_id
    ),
    c AS (
        SELECT 1 AS stage, 'view' AS stage_name,
               CAST(COUNT(*) AS BIGINT) AS n_users FROM s1
        UNION ALL
        SELECT 2, 'click', CAST(COUNT(*) AS BIGINT) FROM s2
        UNION ALL
        SELECT 3, 'purchase', CAST(COUNT(*) AS BIGINT) FROM s3
    )
    SELECT CAST(stage AS INT) AS stage, stage_name, n_users,
           (n_users * 10000) // (SELECT COUNT(*) FROM s1) AS conv_bp
    FROM c
    """,
)
def q141_event_funnel(spark, sf_dir):
    from vulnerablecode_spark.operators.events import funnel_report

    events = _load(spark, sf_dir, "events")
    return funnel_report(events, ["view", "click", "purchase"])


@query(
    "q142_retention_cohorts",
    oracle="""
    WITH f AS (
        SELECT user_id, date_trunc('day', MIN(ts)) AS cohort_day
        FROM events GROUP BY user_id
    ),
    a AS (
        SELECT DISTINCT user_id, date_trunc('day', ts) AS d FROM events
    )
    SELECT f.cohort_day,
           CAST(date_diff('day', f.cohort_day, a.d) AS INT) AS day_offset,
           CAST(COUNT(*) AS BIGINT) AS n_users
    FROM a JOIN f USING (user_id)
    GROUP BY 1, 2
    """,
)
def q142_retention_cohorts(spark, sf_dir):
    from vulnerablecode_spark.operators.events import retention_cohorts

    events = _load(spark, sf_dir, "events")
    return retention_cohorts(events)


# ---------------------------------------------------------------------------
# §2.3/§2.9 last-touch conversion attribution — the event-stream as-of
# join realized as union + running-max window (operators/events.py
# attribute_conversions): ONE user-keyed shuffle does the time matching
# (no touch×conversion pair rows), the id-resolution join is co-keyed
# against the touch-cardinality frame, and gaps compare in integer
# microseconds with an inclusive at-the-same-instant touch.
# ---------------------------------------------------------------------------


@query(
    "q143_conversion_attribution",
    oracle="""
    WITH t AS (
        SELECT user_id, ts, event_id,
               CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS is_touch
        FROM events WHERE event_type IN ('click', 'purchase')
    ),
    m AS (
        SELECT *,
               MAX(CASE WHEN is_touch = 1 THEN ts END) OVER (
                   PARTITION BY user_id
                   ORDER BY ts ASC, is_touch DESC, event_id ASC
                   ROWS UNBOUNDED PRECEDING) AS lt
        FROM t
    ),
    conv AS (
        SELECT user_id, ts, event_id, lt,
               date_diff('microsecond', lt, ts) AS gap
        FROM m WHERE is_touch = 0
    ),
    tid AS (
        SELECT user_id, ts AS touch_ts, MAX(event_id) AS touch_id
        FROM events WHERE event_type = 'click' GROUP BY user_id, ts
    )
    SELECT c.event_id AS conv_id, c.user_id,
           CAST(t2.touch_id AS DOUBLE) AS touch_id,
           CASE WHEN t2.touch_id IS NOT NULL
                THEN CAST(c.gap AS DOUBLE) END AS gap_us
    FROM conv c
    LEFT JOIN tid t2 ON c.user_id = t2.user_id AND c.lt = t2.touch_ts
                     AND c.gap <= 86400000000
    """,
)
def q143_conversion_attribution(spark, sf_dir):
    from vulnerablecode_spark.operators.events import attribute_conversions

    events = _load(spark, sf_dir, "events")
    # touch_id/gap_us are NULLABLE integers: DuckDB's .df() widens a
    # nullable BIGINT to float64, so grade both as explicit DOUBLE on
    # BOTH sides — otherwise the dtype agreement depends on whether the
    # sample happens to contain a NULL (the r10 judge's latent-twin
    # finding).
    return (attribute_conversions(events, touch_type="click",
                                  conv_type="purchase",
                                  horizon_us=86_400_000_000)
            .withColumn("touch_id", F.col("touch_id").cast("double"))
            .withColumn("gap_us", F.col("gap_us").cast("double")))


# ---------------------------------------------------------------------------
# §2.4 daily + rolling distinct actives (operators/events.py
# active_users): events collapse to DISTINCT (user, day) first, then
# the O(days) day dimension broadcasts onto the user-day frame with a
# bounded ≤window_days fan-out — the canonical shape for
# distinct-over-sliding-window, which no engine's window functions
# express directly.
# ---------------------------------------------------------------------------


@query(
    "q146_active_users",
    oracle="""
    WITH ud AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    ),
    days AS (SELECT DISTINCT d AS day FROM ud),
    dau AS (
        SELECT d AS day, CAST(COUNT(*) AS BIGINT) AS dau
        FROM ud GROUP BY d
    ),
    wau AS (
        SELECT days.day, CAST(COUNT(DISTINCT ud.user_id) AS BIGINT) AS wau
        FROM days JOIN ud
          ON ud.d <= days.day AND ud.d >= days.day - 6
        GROUP BY days.day
    )
    SELECT CAST(dau.day AS VARCHAR) AS day, dau.dau, wau.wau
    FROM dau JOIN wau USING (day)
    """,
)
def q146_active_users(spark, sf_dir):
    from vulnerablecode_spark.operators.events import active_users

    events = _load(spark, sf_dir, "events")
    # DATE stringifies differently between the engines' client layers
    # (date vs midnight-timestamp repr) — emit ISO strings
    return active_users(events, window_days=7).withColumn(
        "day", F.col("day").cast("string"))


# ---------------------------------------------------------------------------
# §2.5 event-rate anomaly detection (operators/events.py
# rate_anomalies): hourly (key, hour) rollup with map-side combine,
# then trailing-24h z-scores derived purely from integer window sums
# (one sqrt + one division on exact operands, micro-quantized) over the
# O(keys × hours) frame partitioned by key.
# ---------------------------------------------------------------------------


@query(
    "q149_rate_anomalies",
    oracle="""
    WITH hourly AS (
        SELECT date_trunc('hour', ts) AS hour, event_type,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM events GROUP BY 1, 2
    ),
    st AS (
        SELECT *,
               COUNT(*) OVER w AS cnt,
               SUM(n) OVER w AS sx,
               SUM(n * n) OVER w AS sxx
        FROM hourly
        WINDOW w AS (PARTITION BY event_type ORDER BY hour
                     ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
    ),
    z AS (
        SELECT event_type, hour, n,
               CASE WHEN cnt = 24 AND (cnt * sxx - sx * sx) > 0
                    THEN CAST(FLOOR((n * cnt - sx)
                              / sqrt(cnt * sxx - sx * sx)
                              * 10000.0 + 0.5) AS BIGINT)
               END AS z_bp
        FROM st
    )
    SELECT event_type, hour, n, CAST(z_bp AS DOUBLE) AS z_bp,
           CASE WHEN z_bp IS NOT NULL
                THEN CAST(CAST(ABS(z_bp) >= 30000 AS INT) AS DOUBLE)
           END AS is_anomaly
    FROM z
    """,
)
def q149_rate_anomalies(spark, sf_dir):
    from vulnerablecode_spark.operators.events import rate_anomalies

    events = _load(spark, sf_dir, "events")
    # z_bp/is_anomaly are NULLABLE (first 24 hours per key carry no
    # z-score): DuckDB's .df() widens nullable integers to float64, so
    # grade both as explicit DOUBLE on BOTH sides — dtype agreement must
    # not depend on the sample containing a NULL (r10 latent-twin
    # finding). NULL flag also sidesteps the nullable-BOOLEAN repr gap.
    return (rate_anomalies(events, trailing=24, z_bp_threshold=30_000)
            .withColumn("z_bp", F.col("z_bp").cast("double"))
            .withColumn("is_anomaly", F.col("is_anomaly").cast("double")))


# ---------------------------------------------------------------------------
# §2.8 semi-structured JSON column — typed extraction with a declared
# schema (from_json, JVM-side) + per-key rollup (operators/events.py
# json_props_rollup): the event-properties pattern; malformed/missing
# fields count as NULL instead of dropping rows.
# ---------------------------------------------------------------------------


@query(
    "q151_json_props_rollup",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CASE WHEN CAST(props->>'$.k' AS BIGINT) IS NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_missing,
           MIN(CAST(props->>'$.k' AS BIGINT)) AS k_min,
           MAX(CAST(props->>'$.k' AS BIGINT)) AS k_max,
           CAST(SUM(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS k_sum,
           CAST(COUNT(DISTINCT CAST(props->>'$.k' AS BIGINT)) AS BIGINT)
               AS k_distinct
    FROM events GROUP BY event_type
    """,
)
def q151_json_props_rollup(spark, sf_dir):
    from vulnerablecode_spark.operators.events import json_props_rollup

    events = _load(spark, sf_dir, "events")
    return json_props_rollup(events)


# ---------------------------------------------------------------------------
# §2.5 first-order journey transition matrix (operators/events.py
# transition_matrix): one user-keyed lag window (the q108 shape), one
# map-side-combined (prev, next) rollup, per-state rates in basis
# points against the broadcast O(types) totals frame.
# ---------------------------------------------------------------------------


@query(
    "q152_transition_matrix",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type AS next_type,
               LAG(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev_type
        FROM events
    ),
    counts AS (
        SELECT prev_type, next_type, CAST(COUNT(*) AS BIGINT) AS n
        FROM seq WHERE prev_type IS NOT NULL
        GROUP BY prev_type, next_type
    ),
    totals AS (
        SELECT prev_type, CAST(SUM(n) AS BIGINT) AS tot
        FROM counts GROUP BY prev_type
    )
    SELECT c.prev_type, c.next_type, c.n,
           (c.n * 10000) // t.tot AS rate_bp
    FROM counts c JOIN totals t USING (prev_type)
    """,
)
def q152_transition_matrix(spark, sf_dir):
    from vulnerablecode_spark.operators.events import transition_matrix

    events = _load(spark, sf_dir, "events")
    return transition_matrix(events)


# ---------------------------------------------------------------------------
# §2.6 Z-order layout keys (functions/layout.py zorder_key): Morton
# interleave of (l_orderkey, l_partkey) low bits — the write-time
# multi-column data-skipping sort key, pure integer bit arithmetic
# inside codegen (no shuffle, no Python), so the layout primitive
# itself is value-hash graded.
# ---------------------------------------------------------------------------

_SQL_ZKEY = " + ".join(
    f"(((l_orderkey >> {b}) & 1) << {2 * b + 1})"
    f" + (((l_partkey >> {b}) & 1) << {2 * b})"
    for b in range(16))


@query(
    "q155_zorder_key",
    oracle=f"""
    SELECT l_orderkey, l_linenumber, l_partkey,
           CAST({_SQL_ZKEY} AS BIGINT) AS zkey
    FROM lineitem
    """,
)
def q155_zorder_key(spark, sf_dir):
    from vulnerablecode_spark.functions.layout import zorder_key

    li = _load(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey", "l_linenumber", "l_partkey",
        zorder_key([F.col("l_orderkey"), F.col("l_partkey")],
                   bits=16).alias("zkey"))


# ---------------------------------------------------------------------------
# §2.4 daily growth accounting (operators/events.py growth_accounting):
# new vs returning actives per day + cumulative registered users —
# the q142 frames re-joined on the user key, cumulative window over
# the O(days) rollup only.
# ---------------------------------------------------------------------------


@query(
    "q157_growth_accounting",
    oracle="""
    WITH first AS (
        SELECT user_id, CAST(MIN(ts) AS DATE) AS d0
        FROM events GROUP BY user_id
    ),
    active AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    ),
    daily AS (
        SELECT a.day,
               CAST(SUM(CASE WHEN a.day = f.d0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_new,
               CAST(SUM(CASE WHEN a.day <> f.d0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_returning
        FROM active a JOIN first f USING (user_id)
        GROUP BY a.day
    )
    SELECT CAST(day AS VARCHAR) AS day, n_new, n_returning,
           CAST(SUM(n_new) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
                AS BIGINT) AS cum_users
    FROM daily
    """,
)
def q157_growth_accounting(spark, sf_dir):
    from vulnerablecode_spark.operators.events import growth_accounting

    events = _load(spark, sf_dir, "events")
    return growth_accounting(events)


# ---------------------------------------------------------------------------
# §2.4 within-session co-occurrence PMI (operators/events.py
# session_cooccurrence_pmi): the q108 gap sessions collapsed to
# DISTINCT (session, type) presence, pairs enumerated ON THE SESSION
# KEY (bounded by types-per-session), PMI from exact integer counts —
# the order-free association view next to q152's sequential
# transitions.
# ---------------------------------------------------------------------------


@query(
    "q158_session_pmi",
    oracle="""
    WITH seq AS (
        SELECT user_id, ts, event_id, event_type,
               CASE WHEN LAG(ts) OVER w IS NULL
                         OR date_diff('microsecond', LAG(ts) OVER w, ts)
                            > 43200000000
                    THEN 1 ELSE 0 END AS is_new
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
        SELECT DISTINCT
               CAST(user_id AS VARCHAR) || '#' ||
               CAST(SUM(is_new) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING)
                    AS VARCHAR) AS sid,
               event_type AS etype
        FROM seq
    ),
    ns AS (SELECT CAST(COUNT(DISTINCT sid) AS BIGINT) AS n FROM sess),
    tc AS (SELECT etype, CAST(COUNT(*) AS BIGINT) AS n_t
           FROM sess GROUP BY etype),
    pc AS (
        SELECT a.etype AS type_a, b.etype AS type_b,
               CAST(COUNT(*) AS BIGINT) AS n_ab
        FROM sess a JOIN sess b ON a.sid = b.sid AND a.etype < b.etype
        GROUP BY 1, 2
    )
    SELECT p.type_a, p.type_b, p.n_ab,
           ROUND(ln(CAST(ns.n * p.n_ab AS DOUBLE)
                    / CAST(ta.n_t * tb.n_t AS DOUBLE)), 4) AS pmi
    FROM pc p
    JOIN tc ta ON ta.etype = p.type_a
    JOIN tc tb ON tb.etype = p.type_b, ns
    """,
)
def q158_session_pmi(spark, sf_dir):
    from vulnerablecode_spark.operators.events import (
        session_cooccurrence_pmi)

    events = _load(spark, sf_dir, "events")
    return session_cooccurrence_pmi(events)


# ---------------------------------------------------------------------------
# §2.4 grouping sets — one pass computing every marginal of the
# (day, event_type) rollup via CUBE: Spark expands grouping sets inside
# a single aggregate (map-side combined, one shuffle), the same way the
# engines' OLAP cubes do; GROUPING() flags distinguish "NULL because
# subtotal" from data NULLs. Micro-unit value sums keep the double
# column order-free exact.
# ---------------------------------------------------------------------------


@query(
    "q159_event_cube",
    oracle="""
    SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day, event_type,
           CAST(GROUPING(CAST(ts AS DATE)) AS INT) AS g_day,
           CAST(GROUPING(event_type) AS INT) AS g_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(FLOOR(value * 1000000.0 + 0.5) AS BIGINT))
                AS BIGINT) AS value_sum_q
    FROM events
    GROUP BY CUBE (CAST(ts AS DATE), event_type)
    """,
)
def q159_event_cube(spark, sf_dir):
    events = _load(spark, sf_dir, "events")
    base = events.select(
        F.to_date("ts").cast("string").alias("day"), "event_type", "value")
    return (base.cube("day", "event_type")
            .agg(F.grouping("day").cast("int").alias("g_day"),
                 F.grouping("event_type").cast("int").alias("g_type"),
                 F.count(F.lit(1)).cast("bigint").alias("n_events"),
                 F.sum(F.floor(F.col("value") * 1_000_000.0 + 0.5)
                       .cast("bigint")).cast("bigint")
                 .alias("value_sum_q")))
