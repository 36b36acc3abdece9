"""Incremental advisory ingest.

Two equivalent drivers around the same SCD2 merge (operators/ingest.py):

- ``stream_ingest``: Structured Streaming file source +
  ``Trigger.AvailableNow`` + ``foreachBatch`` — the engine's version of the
  RQ scheduler waking an importer every run_interval
  (pipelines/__init__.py:293-295): each trigger drains NEW source files
  (process-once semantics = the reference's ``date_imported is null``
  selection, pipelines/__init__.py:231-235) and merges them.
- ``batch_merge_to_table``: one merge pass for externally-scheduled runs.

Storage is parquet snapshot-swap (this environment has no Delta); on Delta
the merge body becomes MERGE INTO + the is_latest window re-flag, and the
checkpoint the stream's own offset log.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from vulnerablecode_spark.operators.ingest import (merge_advisories,
                                                   to_canonical_advisories)
from vulnerablecode_spark.schemas import ADVISORY_PARSED


def _table_exists(spark: SparkSession, path: str) -> bool:
    return os.path.exists(path) and any(
        f.endswith(".parquet") for f in os.listdir(path)
    )


def read_table(spark: SparkSession, path: str) -> DataFrame | None:
    return spark.read.parquet(path) if _table_exists(spark, path) else None


def write_table(df: DataFrame, path: str) -> None:
    """Snapshot-swap write: materialize to a staging dir, then atomically
    replace. (Delta/Iceberg would make this a transactional commit.)"""
    staging = path.rstrip("/") + ".staging"
    df.write.mode("overwrite").parquet(staging)
    backup = path.rstrip("/") + ".old"
    if os.path.exists(path):
        os.replace(path, backup)
    os.replace(staging, path)
    if os.path.exists(backup):
        import shutil

        shutil.rmtree(backup, ignore_errors=True)


def batch_merge_to_table(spark: SparkSession, incoming: DataFrame,
                         table_path: str) -> DataFrame:
    """Merge a batch of canonical advisories into the stored table."""
    existing = read_table(spark, table_path)
    # No driver-side materialization: write_table stages the merged result
    # to a SEPARATE path while the current snapshot's files are still in
    # place (the lazy `existing` plan reads them during the staging write),
    # and only then swaps directories. The merge therefore stays fully
    # distributed — at cluster scale this is the parquet stand-in for
    # Delta's MERGE INTO, and driver memory never holds table data.
    merged = merge_advisories(existing, incoming)
    write_table(merged, table_path)
    return spark.read.parquet(table_path)


def stream_ingest(spark: SparkSession, source_dir: str, table_path: str,
                  checkpoint_dir: str, datasource_id: str = "osv",
                  pipeline_id: str = "stream_ingest") -> None:
    """Drain new parsed-advisory JSON files from ``source_dir`` and merge.

    readStream(file source) tracks processed files in the checkpoint —
    exactly-once per file; Trigger.AvailableNow processes the backlog and
    stops (a scheduled micro-batch run, SURVEY.md §2.9).
    """

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        canonical = to_canonical_advisories(batch_df, datasource_id, pipeline_id)
        batch_merge_to_table(batch_df.sparkSession, canonical, table_path)

    stream = (
        spark.readStream.schema(ADVISORY_PARSED)
        .option("multiLine", "true")
        .json(source_dir)
    )
    (
        stream.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def stream_dedup(spark: SparkSession, source_dir: str, out_dir: str,
                 checkpoint_dir: str) -> None:
    """Streaming exact dedup over a document file stream: emit each
    distinct content fingerprint ONCE across ALL triggers.

    ``dropDuplicates`` on a streaming frame keeps the seen-key set in the
    state store, so a document whose fingerprint arrived in an earlier
    micro-batch (or an earlier AvailableNow run, via the checkpoint) is
    suppressed — the streaming twin of ``llm.dedup.exact_dedup``'s
    keep-first rule, with the state store playing the role of the
    fingerprint window. At scale the state is hash-partitioned by
    fingerprint across executors; a production deployment bounds it with
    ``withWatermark`` + ``dropDuplicatesWithinWatermark`` once payloads
    carry event time.
    """
    from pyspark.sql import functions as F

    from vulnerablecode_spark.llm.text import fingerprint

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("multiLine", "true")
        .json(source_dir)
        .withColumn("fp", fingerprint(F.col("text")))
        .dropDuplicates(["fp"])
    )
    (
        stream.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
