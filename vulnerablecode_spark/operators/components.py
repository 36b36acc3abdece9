"""Connected components over an edge list — iterative label propagation.

The scale path for advisory grouping (pipes/group_advisories.py:182-245)
when identifier-share graphs span too many rows for per-package union-find
(operators/grouping.py): alternating small-label-propagation joins until a
fixpoint, the standard DataFrame-only connected-components algorithm
(what GraphFrames' ``connectedComponents`` does under the hood, without
the dependency).

Each iteration is one join + one aggregation, both hash-partitioned on the
node id; convergence takes O(diameter) rounds and real identifier graphs
are shallow (an advisory links to a handful of aliases).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(edges: DataFrame, src: str = "src", dst: str = "dst",
                         max_iterations: int = 20) -> DataFrame:
    """Undirected connected components: returns (node, component) where
    component is the MINIMUM node id reachable from ``node``.

    ``edges`` may be directed input; it is symmetrized internally.
    """
    spark = edges.sparkSession
    both = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .cache()
    )
    labels = (
        both.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
    )
    for _ in range(max_iterations):
        # each node adopts the min label among itself and its neighbors
        neighbor_labels = (
            both.join(labels.withColumnRenamed("node", "b"), "b")
            .select(F.col("a").alias("node"), "component")
        )
        new_labels = (
            labels.unionByName(neighbor_labels)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
        )
        # fixpoint check: any node whose label still shrinks?
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.component") < F.col("o.component"))
            .limit(1)
            .count()
        )
        labels = new_labels.localCheckpoint(eager=True)  # truncate lineage
        if changed == 0:
            break
    both.unpersist()
    return labels
