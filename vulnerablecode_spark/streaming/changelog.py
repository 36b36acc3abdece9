"""Append-only changelog derived from advisory merges.

Reference: ChangeLog models (models.py:1530-1717) — an audit event per
import/improve action. Here the merge result itself yields the events
(new content versions → 'import' rows), written append-only — the exact
shape a Delta change-data-feed consumer would read.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ACTION_IMPORT = 1
ACTION_UPDATE = 2


def changelog_for_merge(before: DataFrame | None, after: DataFrame,
                        actor: str, software_version: str = "0.1.0") -> DataFrame:
    """Rows of the changelog table for advisories newly present in
    ``after``: brand-new avids log an import, new content versions of an
    existing avid log an update."""
    if before is None:
        fresh = after
        known_avids = None
    else:
        known_pks = before.select("advisory_pk")
        fresh = after.join(known_pks, "advisory_pk", "left_anti")
        known_avids = before.select("avid").distinct()
    if known_avids is not None:
        fresh = fresh.join(
            known_avids.withColumn("_known", F.lit(True)), "avid", "left"
        )
    else:
        fresh = fresh.withColumn("_known", F.lit(None).cast("boolean"))
    return fresh.select(
        F.lit("advisory").alias("entity_type"),
        F.col("advisory_pk").alias("entity_pk"),
        F.col("date_collected").alias("action_time"),
        F.lit(actor).alias("actor_name"),
        F.when(F.col("_known"), F.lit(ACTION_UPDATE))
        .otherwise(F.lit(ACTION_IMPORT)).alias("action_type"),
        F.col("url").alias("source_url"),
        F.lit(software_version).alias("software_version"),
    )
