"""Federated corpus export: partitioned output with an incremental
checkpoint.

Reference: pipes/export.py:25-100 + exporters/federate_vulnerabilities.py —
full or incremental export of the advisory corpus to per-purl partitioned
paths, with a checkpoint recording what was already exported so the next
run ships only changes.

Spark shape: ``partitionBy`` write (partition pruning for consumers) + a
watermark checkpoint on ``date_collected`` (Delta change feed would
replace the watermark with table versions).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def load_checkpoint(path: str) -> str | None:
    """Last exported date_collected watermark (export.py:59-76)."""
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f).get("exported_until")


def save_checkpoint(path: str, exported_until: str) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        json.dump({"exported_until": exported_until}, f)


def export_advisories(advisories: DataFrame, out_dir: str,
                      checkpoint_path: str | None = None) -> int:
    """Export latest advisories as JSON partitioned by datasource.

    With a checkpoint: only advisories collected after the watermark
    (incremental export, federate_vulnerabilities.py:78-88); the watermark
    advances to the batch max afterwards. Returns exported row count.

    The batch is materialized ONCE (localCheckpoint) so the count, the
    write, and the watermark max all see the same snapshot — without it a
    concurrent table swap between actions could advance the checkpoint
    past rows never written. The strict ``>`` watermark itself assumes
    the sequential scheduler (streaming/runlog.py): merge runs stamp
    monotone ``date_collected`` values, so no later merge can introduce
    rows at-or-before an exported watermark; a concurrent-writer
    deployment replaces the watermark with Delta table versions (the
    module docstring's note).
    """
    batch = advisories.filter(F.col("is_latest"))
    watermark = load_checkpoint(checkpoint_path) if checkpoint_path else None
    if watermark:
        batch = batch.filter(F.col("date_collected") > F.lit(watermark).cast("timestamp"))
    batch = batch.withColumn(
        "export_path",
        F.concat_ws("/", "datasource_id", "advisory_id"),
    ).localCheckpoint(eager=True)
    count = batch.count()
    if count:
        (
            batch.write.mode("append")
            .partitionBy("datasource_id")
            .json(out_dir)
        )
        if checkpoint_path:
            max_ts = batch.agg(F.max("date_collected")).first()[0]
            save_checkpoint(checkpoint_path, str(max_ts))
    return count
