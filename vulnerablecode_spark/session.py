"""SparkSession factory tuned for this engine.

The defaults target the driver's local[32] test harness but every knob is the
one you would set on a real 1000-executor cluster: AQE on (runtime shuffle
coalescing, skew-join splitting, broadcast conversion), Arrow on (all our
Python kernels run as vectorized pandas UDFs), and shuffle partitions sized
so a sf0.1 shuffle stays in memory while a 100 TB run simply raises
``spark.sql.shuffle.partitions`` / relies on AQE coalescing.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "vulnerablecode-spark", master: str | None = None,
              shuffle_partitions: int | None = None) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or int(cpus)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # AQE: runtime partition coalescing, skew-join handling, broadcast
        # conversion — the scale path for 100 TB shuffles.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # Respect the advisory partition size when coalescing instead of
        # refusing to go below default parallelism (Spark's own docs
        # recommend false on busy clusters): a tiny shuffle collapses to
        # one task instead of 32 idle ones, and a 100 TB shuffle is sized
        # by bytes — which is the knob that actually matters there.
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
                "false")
        # Advisory size balances two regimes: IO-bound scans want big
        # partitions, but compute-dense join stages (near-dup verify:
        # small bigint rows, heavy per-row fan-out) are underestimated by
        # bytes — 64m coalesced the adversarial verify stage to ONE task
        # (5.1s) where 8m keeps enough width (3.4s). A 1000-executor
        # deployment raises this to 64-256m via the same env knob.
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes",
                os.environ.get("SPARK_GRAFT_ADVISORY_PARTITION", "8m"))
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # NOTE on input splits (measured r9, SCALE.md): Spark's
        # spark.sql.files.minPartitionNum (= default parallelism) already
        # yields 32 byte-range splits per big file here, so lowering
        # maxPartitionBytes changes nothing (128m vs 16m within noise).
        # EFFECTIVE scan parallelism is bounded by parquet ROW GROUPS —
        # a split with no row-group start is an empty task — which is a
        # data-layout property (scripts/gen_sf.py writes ~64 groups per
        # table), not a session knob.
        # Arrow batches for every pandas UDF in functions/ and llm/.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Broadcast threshold: dimension tables (region/nation/weight maps/
        # LSH band tables) must broadcast, never shuffle.
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # local-mode heap: the driver IS the executor pool here, so 32
        # concurrent tasks share this heap's execution region. 8g held
        # to sf10; the sf30 point (180M lineitem / 1.5M docs) blew the
        # q24 shingle hash-aggregation at 8g (AGGREGATE_OUT_OF_MEMORY:
        # ~150 MB execution memory per running task), so the default is
        # now sized to the box (128 GiB shared). On a real cluster this
        # maps to ordinary 8-64g executors — per-task execution memory,
        # not a driver-side requirement. A/B-measured at sf0.1 (6 reps,
        # fresh sessions): 24g is not slower than 8g (q24 min 1.334s vs
        # 1.584s), so the bigger default costs nothing at small SF.
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    return builder.getOrCreate()


def load_tables(spark: SparkSession, sf_dir: str, names: tuple[str, ...] | None = None):
    """Load the driver's parquet tables as a dict of DataFrames —
    delegates to the registry's cached loader, which also handles the
    nanosecond-timestamp events table."""
    from vulnerablecode_spark.plans.registry import _load_one

    names = names or ("region", "nation", "customer", "supplier", "part",
                      "orders", "lineitem", "events", "documents", "embeddings")
    return {n: _load_one(spark, sf_dir, n) for n in names}
