"""Table layout: partitioning, clustering and write helpers.

The reference encodes its physical design in PostgreSQL indexes
(models.py:902-918, 3303-3318); the lakehouse analogue (SURVEY §4) is
partition layout + within-file ordering so scans prune and joins
co-locate:

- ``advisories``  partitioned by datasource_id (partition pruning for
  per-source pipelines), sorted by (avid, date_collected desc) within
  files — the advisory_latest_by_avid_idx ordering.
- ``packages``    partitioned by type (ecosystem), sorted by
  (namespace, name, version_rank) — the composite (type, ns, name)
  indexes; version navigation reads one file run.
- ``impacts`` / bridges sorted by their join key so sort-merge joins skip
  the sort at read when bucketing is available.

On a real deployment these writers target Delta/Iceberg tables with the
same spec (MERGE for the SCD2 path, Z-ORDER/cluster-by instead of
sortWithinPartitions); parquet keeps the layout contract testable here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_advisories(advisories: DataFrame, path: str) -> None:
    (
        advisories
        .repartition("datasource_id")
        .sortWithinPartitions(F.col("avid"), F.col("date_collected").desc())
        .write.mode("overwrite")
        .partitionBy("datasource_id")
        .parquet(path)
    )


def write_packages(packages: DataFrame, path: str) -> None:
    (
        packages
        .repartition("type")
        .sortWithinPartitions("namespace", "name", "version_rank")
        .write.mode("overwrite")
        .partitionBy("type")
        .parquet(path)
    )


def write_bridge(bridge: DataFrame, path: str, key: str = "impact_pk",
                 buckets: int = 0) -> None:
    """Bridges sorted (and optionally bucketed via saveAsTable) on the
    join key; bucketing co-locates the impact↔package joins so repeated
    joins skip the shuffle entirely."""
    df = bridge.repartition(F.col(key)).sortWithinPartitions(key)
    if buckets:
        (df.write.mode("overwrite").bucketBy(buckets, key).sortBy(key)
         .option("path", path).saveAsTable(f"bridge_{key}_{buckets}"))
    else:
        df.write.mode("overwrite").parquet(path)


def read_partition_pruned(spark: SparkSession, path: str,
                          datasource_id: str) -> DataFrame:
    """Partition-pruned read: the filter binds to the partition column so
    only that directory is listed/scanned."""
    return spark.read.parquet(path).filter(
        F.col("datasource_id") == datasource_id)
