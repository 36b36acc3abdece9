"""Event-sequence analytics over the events table: ordered funnels and
cohort retention — the two classic user-journey rollups that complement
the gap sessionization (plans/relational.py q108) and the event-time
windowed aggregation (streaming/windows.py).

The reference has no user-journey surface (its closest analogue is the
append-only ChangeLog audit trail, models.py:1530 — per-entity action
sequences), but an analytics engine over a 100 TB event table needs
both of these, and both have a canonical scale shape:

- **funnel**: each stage is a stage-filtered min-aggregate keyed by
  user joined to the previous stage's frame on that same user key —
  stage frames are user-cardinality (not event-cardinality), every
  join is co-keyed, and predicate pushdown prunes each pass of the
  event scan to one stage's rows.
- **retention**: one first-activity aggregate + one distinct
  (user, day) projection, joined on the user key — two user-keyed
  shuffles, output O(users × active-days).

Timestamps compare with full microsecond precision (strictly-after
semantics between stages); all derived metrics are integer arithmetic
(basis points via DIV) so the oracle comparison is bit-stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_report(events: DataFrame, stages: list[str], *,
                  ts_col: str = "ts", user_col: str = "user_id",
                  type_col: str = "event_type") -> DataFrame:
    """Ordered-funnel user counts: a user reaches stage i+1 only with an
    event of that type STRICTLY AFTER their stage-i completion time
    (each stage takes the user's EARLIEST qualifying event, the standard
    first-touch funnel). Returns (stage, stage_name, n_users, conv_bp)
    with conversion in basis points of the stage-1 population.

    Scale: stage i's frame is at most one row per stage-(i-1) user; the
    event scan for stage i prunes to ``event_type = stages[i]`` (pushed
    filter), joins the previous frame on the user key, and min-
    aggregates back to user grain. No window over the raw event stream,
    no per-user event-list collection.
    """
    if len(stages) < 2:
        raise ValueError("funnel_report: need at least two stages")
    base = events.select(F.col(user_col).alias("user_id"),
                         F.col(type_col).alias("event_type"),
                         F.col(ts_col).alias("ts"))
    frames = []
    prev = None
    for stage_name in stages:
        rows = base.filter(F.col("event_type") == stage_name)
        if prev is None:
            cur = rows.groupBy("user_id").agg(F.min("ts").alias("t"))
        else:
            cur = (rows.join(prev.select("user_id",
                                         F.col("t").alias("_pt")),
                             "user_id")
                   .filter(F.col("ts") > F.col("_pt"))
                   .groupBy("user_id").agg(F.min("ts").alias("t")))
        frames.append(cur)
        prev = cur
    counts = None
    for i, (frame, stage_name) in enumerate(zip(frames, stages)):
        c = frame.agg(
            F.lit(i + 1).cast("int").alias("stage"),
            F.lit(stage_name).alias("stage_name"),
            F.count(F.lit(1)).cast("bigint").alias("n_users"))
        counts = c if counts is None else counts.unionByName(c)
    entry = (frames[0].agg(F.count(F.lit(1)).alias("_n0"))
             .withColumn("_k", F.lit(1)))
    return (counts.withColumn("_k", F.lit(1))
            .join(F.broadcast(entry), "_k")
            .selectExpr("stage", "stage_name", "n_users",
                        "(n_users * 10000) DIV _n0 AS conv_bp"))


def retention_cohorts(events: DataFrame, *, ts_col: str = "ts",
                      user_col: str = "user_id") -> DataFrame:
    """Day-grain cohort retention: cohort = the user's first-activity
    day; a (cohort_day, day_offset) cell counts the cohort's users with
    ANY event exactly ``day_offset`` days after their first day. The
    curve every growth/engagement dashboard draws, and the shape is the
    scale-honest one: first-activity is one user-keyed aggregate, the
    activity set is one DISTINCT (user, day) projection (events
    collapse to user-days BEFORE any join), and the two meet on the
    user key.
    """
    first = (events.groupBy(F.col(user_col).alias("user_id"))
             .agg(F.date_trunc("day", F.min(ts_col)).alias("cohort_day")))
    active = (events.select(F.col(user_col).alias("user_id"),
                            F.date_trunc("day", F.col(ts_col)).alias("d"))
              .distinct())
    return (active.join(first, "user_id")
            .groupBy("cohort_day",
                     F.datediff(F.to_date("d"), F.to_date("cohort_day"))
                     .cast("int").alias("day_offset"))
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_users")))


def attribute_conversions(events: DataFrame, *, touch_type: str = "click",
                          conv_type: str = "purchase",
                          horizon_us: int = 86_400_000_000,
                          ts_col: str = "ts", user_col: str = "user_id",
                          id_col: str = "event_id") -> DataFrame:
    """Last-touch attribution: each conversion event is attributed to
    the user's LATEST touch event at-or-before it, provided the gap is
    within the horizon; otherwise it reports unattributed (NULL touch).
    This is the event-stream as-of join — the user-journey counterpart
    of the version as-of join (operators/versions.py
    nearest_patched_package) — realized WITHOUT a join for the
    time-matching step: touches and conversions union into one frame,
    ONE user-keyed shuffle orders it, and a running MAX of touch
    timestamps over (ts, touch-first, id) gives every conversion its
    as-of touch time. Only the id-resolution step joins — co-keyed on
    (user, touch_ts) against the touch-cardinality frame, with
    max(event_id) resolving the (physically improbable) same-microsecond
    duplicate touch deterministically.

    Scale: the union-window form beats the join-then-filter form
    wherever touches are dense — no touch×conversion pair row ever
    materializes; state per task is one running max. Gaps compare in
    INTEGER microseconds (the q108 discipline — second-truncated casts
    disagree across engines at boundaries).
    """
    base = events.select(F.col(user_col).alias("user_id"),
                         F.col(ts_col).alias("ts"),
                         F.col(id_col).alias("event_id"),
                         F.col("event_type"))
    touches = base.filter(F.col("event_type") == touch_type)
    convs = base.filter(F.col("event_type") == conv_type)
    tagged = (touches.select("user_id", "ts", "event_id",
                             F.lit(1).alias("is_touch"))
              .unionByName(convs.select("user_id", "ts", "event_id",
                                        F.lit(0).alias("is_touch"))))
    from pyspark.sql import Window

    # touch-at-equal-ts sorts BEFORE the conversion (is_touch desc) so
    # ts <= conv_ts is inclusive
    w = (Window.partitionBy("user_id")
         .orderBy(F.col("ts").asc(), F.col("is_touch").desc(),
                  F.col("event_id").asc())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    last_touch = F.max(
        F.when(F.col("is_touch") == 1, F.col("ts"))).over(w)
    attributed = (
        tagged.withColumn("_lt", last_touch)
        .filter(F.col("is_touch") == 0)
        .withColumn(
            "_gap",
            F.expr("timestampdiff(MICROSECOND, _lt, ts)"))
        .withColumn(
            "touch_ts",
            F.when(F.col("_gap") <= F.lit(horizon_us), F.col("_lt")))
    )
    touch_ids = touches.groupBy(
        F.col("user_id"), F.col("ts").alias("touch_ts")).agg(
        F.max("event_id").alias("touch_id"))
    return (
        attributed.join(touch_ids, ["user_id", "touch_ts"], "left")
        .select(
            F.col("event_id").alias("conv_id"),
            "user_id",
            "touch_id",
            F.when(F.col("touch_ts").isNotNull(), F.col("_gap"))
            .cast("bigint").alias("gap_us"))
    )


def active_users(events: DataFrame, *, window_days: int = 7,
                 ts_col: str = "ts", user_col: str = "user_id"
                 ) -> DataFrame:
    """Daily + rolling-window distinct active users (DAU/WAU): per
    calendar day, the distinct users active that day and the distinct
    users active in the trailing ``window_days`` window. Distinct-over-
    a-sliding-window has no window-function form in any SQL engine
    (COUNT(DISTINCT) OVER RANGE is unsupported everywhere), so the
    canonical shape is the one here: events collapse to DISTINCT
    (user, day) FIRST — the only event-scale work — then the O(days)
    day dimension broadcast-joins the user-day frame on the day-range
    predicate and re-counts distinct users per anchor day. The
    intermediate is O(days × users-per-window), i.e. each user-day
    lands in ≤ ``window_days`` anchor rows — bounded fan-out, never
    events × days.
    """
    ud = (events.select(F.col(user_col).alias("user_id"),
                        F.to_date(F.col(ts_col)).alias("d"))
          .distinct())
    days = ud.select("d").distinct().select(F.col("d").alias("day"))
    dau = ud.groupBy(F.col("d").alias("day")).agg(
        F.count(F.lit(1)).cast("bigint").alias("dau"))
    wau = (ud.join(
        F.broadcast(days),
        (F.col("d") <= F.col("day"))
        & (F.col("d") >= F.date_sub(F.col("day"), window_days - 1)))
        .groupBy("day")
        .agg(F.count_distinct("user_id").cast("bigint").alias("wau")))
    return dau.join(wau, "day")


def rate_anomalies(events: DataFrame, *, trailing: int = 24,
                   z_bp_threshold: int = 30_000,
                   ts_col: str = "ts", key_col: str = "event_type"
                   ) -> DataFrame:
    """Event-rate anomaly detection: per (key, hour), the z-score of the
    hourly event count against the trailing ``trailing``-hour window
    (frame excludes the current hour), flagged when |z| crosses the
    basis-point threshold. The ops monitor every ingest pipeline runs
    over its own feed — the reference's closest analogue is the
    PipelineRun log it inspects by hand (models.py:1972); this is that
    check as a query.

    Exactness: the z-score is derived purely from integer window sums —
    z = (x·n − Σx) / sqrt(n·Σx² − (Σx)²) — one sqrt and one division on
    integer-exact operands, then micro-quantized to basis points, so
    both engines produce the identical integer. Rows without a full
    trailing window report NULL z (insufficient history, not "normal"),
    as does a zero-variance history (the z scale is undefined there —
    pair with an absolute-rate rule if constant-history spikes matter).

    Scale: the event-scale work is the ONE (key, hour) rollup with
    map-side combine; every window after that runs over the O(keys ×
    hours) frame partitioned by key.
    """
    hourly = (events.groupBy(
        F.date_trunc("hour", F.col(ts_col)).alias("hour"),
        F.col(key_col))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n")))
    from pyspark.sql import Window

    w = (Window.partitionBy(key_col).orderBy("hour")
         .rowsBetween(-trailing, -1))
    stats = (hourly
             .withColumn("_cnt", F.count(F.lit(1)).over(w))
             .withColumn("_sx", F.sum("n").over(w))
             .withColumn("_sxx", F.sum(F.col("n") * F.col("n")).over(w)))
    num = F.col("n") * F.col("_cnt") - F.col("_sx")
    var_n2 = (F.col("_cnt") * F.col("_sxx")
              - F.col("_sx") * F.col("_sx"))
    z = num / F.sqrt(var_n2)
    z_q = F.floor(z * 10_000.0 + 0.5).cast("bigint")
    full = (F.col("_cnt") == trailing) & (var_n2 > 0)
    return stats.select(
        key_col, "hour", "n",
        F.when(full, z_q).alias("z_bp"),
        F.when(full, F.abs(z_q) >= z_bp_threshold).alias("is_anomaly"))


def json_props_rollup(events: DataFrame, *, field: str = "k",
                      props_col: str = "props",
                      key_col: str = "event_type") -> DataFrame:
    """Typed extraction over a semi-structured JSON column + per-key
    rollup — the ubiquitous event-properties pattern (the reference
    stores the same shape as its never-queried-directly JSONFields,
    models.py:1387; here the field IS queried, so it parses with a
    declared schema instead of ad-hoc string surgery). ``from_json``
    with an explicit schema stays JVM-side (Jackson inside codegen — no
    Python, no regex), malformed or missing fields become NULL and are
    counted rather than dropped.

    Scale: parse is a map-side projection on the scan; the rollup is
    one map-side-combined aggregate on the key. At 100 TB the right
    move is materializing the parsed column at ingest — this operator
    is also exactly that ingest projection.
    """
    k = F.from_json(F.col(props_col), f"{field} bigint").getField(field)
    parsed = events.select(F.col(key_col), k.alias("_k"))
    return parsed.groupBy(key_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.sum(F.col("_k").isNull().cast("int")).cast("bigint")
        .alias("n_missing"),
        F.min("_k").alias("k_min"),
        F.max("_k").alias("k_max"),
        F.sum("_k").cast("bigint").alias("k_sum"),
        F.countDistinct("_k").cast("bigint").alias("k_distinct"),
    )


def transition_matrix(events: DataFrame, *, ts_col: str = "ts",
                      user_col: str = "user_id",
                      type_col: str = "event_type",
                      id_col: str = "event_id") -> DataFrame:
    """First-order Markov transition counts/rates over per-user event
    sequences: one lag window per user stream (ordered by full-precision
    timestamp with the event id as total-order tie-break), one
    (prev, next) count rollup, and per-source-state rates in basis
    points — the journey model behind "what do users do after X"
    (complements the funnel's fixed-path view with the full graph).

    Scale: ONE user-keyed shuffle feeds the lag window (the q108
    sessionization shape); the count rollup is map-side combinable and
    the rate denominator joins on the O(types) prev-state frame.
    Integer arithmetic throughout.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(user_col).orderBy(
        F.col(ts_col).asc(), F.col(id_col).asc())
    seq = (events.select(user_col, ts_col, id_col,
                         F.col(type_col).alias("next_type"))
           .withColumn("prev_type", F.lag("next_type").over(w))
           .filter(F.col("prev_type").isNotNull()))
    counts = seq.groupBy("prev_type", "next_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"))
    totals = counts.groupBy("prev_type").agg(
        F.sum("n").cast("bigint").alias("_tot"))
    return (counts.join(F.broadcast(totals), "prev_type")
            .selectExpr("prev_type", "next_type", "n",
                        "(n * 10000) DIV _tot AS rate_bp"))


def growth_accounting(events: DataFrame, *, ts_col: str = "ts",
                      user_col: str = "user_id") -> DataFrame:
    """Daily growth accounting: per calendar day, how many active users
    are NEW (first activity that day), RETURNING (active before, active
    today), and what the cumulative registered-user count is — the
    decomposition every growth dashboard pairs with the q142 retention
    matrix. Shape: one first-activity aggregate + one DISTINCT
    (user, day) projection joined on the user key (the q142 frames,
    re-used arithmetic); the cumulative sum runs over the O(days)
    rollup only.
    """
    from pyspark.sql import Window

    first = (events.groupBy(F.col(user_col).alias("user_id"))
             .agg(F.to_date(F.min(ts_col)).alias("d0")))
    active = (events.select(F.col(user_col).alias("user_id"),
                            F.to_date(F.col(ts_col)).alias("day"))
              .distinct())
    tagged = active.join(first, "user_id")
    daily = tagged.groupBy("day").agg(
        F.sum((F.col("day") == F.col("d0")).cast("int")).cast("bigint")
        .alias("n_new"),
        F.sum((F.col("day") != F.col("d0")).cast("int")).cast("bigint")
        .alias("n_returning"),
    )
    w = (Window.orderBy("day")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (daily.withColumn("cum_users",
                             F.sum("n_new").over(w).cast("bigint"))
            .withColumn("day", F.col("day").cast("string")))


def session_cooccurrence_pmi(events: DataFrame, *,
                             gap_us: int = 43_200_000_000,
                             ts_col: str = "ts",
                             user_col: str = "user_id",
                             type_col: str = "event_type",
                             id_col: str = "event_id") -> DataFrame:
    """Association mining over sessions: pointwise mutual information
    between event-type pairs co-occurring in the same session —
    PMI(a,b) = ln(n·n_ab / (n_a·n_b)) over session-level presence
    counts, the "users who do X in a session also do Y" signal that
    complements the sequential transition matrix (q152) with an
    order-free view.

    Shape: sessions come from the same gap rule as q108 (ONE user-keyed
    shuffle), collapse to DISTINCT (session, type) presence rows, and
    the pair enumeration is a self-join ON THE SESSION KEY — bounded by
    types-per-session (≤ the type vocabulary), never a cross join.
    Counts are exact integers; PMI is one IEEE log of an exact integer
    ratio, quantized to 4dp.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sess = (events.select(user_col, ts_col, id_col,
                          F.col(type_col).alias("etype"))
            .withColumn("_prev", F.lag(ts_col).over(w))
            .withColumn(
                "_new",
                F.when(F.col("_prev").isNull()
                       | (F.expr(f"timestampdiff(MICROSECOND, _prev, "
                                 f"{ts_col})") > gap_us), 1).otherwise(0))
            .withColumn("_sidx", F.sum("_new").over(run))
            .select(F.concat_ws("#", F.col(user_col).cast("string"),
                                F.col("_sidx").cast("string"))
                    .alias("sid"), "etype")
            .distinct())
    n_sessions = (sess.select("sid").distinct()
                  .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
                  .withColumn("_k", F.lit(1)))
    type_counts = sess.groupBy("etype").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_t"))
    a = sess.select("sid", F.col("etype").alias("type_a"))
    b = sess.select("sid", F.col("etype").alias("type_b"))
    pair_counts = (a.join(b, "sid")
                   .filter(F.col("type_a") < F.col("type_b"))
                   .groupBy("type_a", "type_b")
                   .agg(F.count(F.lit(1)).cast("bigint").alias("n_ab")))
    return (pair_counts
            .join(F.broadcast(type_counts.withColumnRenamed(
                "etype", "type_a").withColumnRenamed("n_t", "n_a")),
                "type_a")
            .join(F.broadcast(type_counts.withColumnRenamed(
                "etype", "type_b").withColumnRenamed("n_t", "n_b")),
                "type_b")
            .withColumn("_k", F.lit(1))
            .join(F.broadcast(n_sessions), "_k")
            .select("type_a", "type_b", "n_ab",
                    F.round(F.log((F.col("n") * F.col("n_ab"))
                                  / (F.col("n_a") * F.col("n_b"))), 4)
                    .alias("pmi")))
