"""Connected components over an edge list — iterative label propagation.

The scale path for advisory grouping (pipes/group_advisories.py:182-245)
when identifier-share graphs span too many rows for per-package union-find
(operators/grouping.py): alternating small-label-propagation joins until a
fixpoint, the standard DataFrame-only connected-components algorithm
(what GraphFrames' ``connectedComponents`` does under the hood, without
the dependency).

Each iteration is one neighbor-min join + one aggregation + one
pointer-jumping self-join, all hash-partitioned on the node id. Plain
min-label propagation converges in O(diameter) rounds — a silent
correctness hazard on stringy graphs (a 100-node chain needs 100
rounds); the pointer-jumping step (component ← label of component)
halves label-tree depth each round, giving O(log n) convergence like the
small-star/large-star formulations. Non-convergence raises instead of
returning partial labels.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(edges: DataFrame, src: str = "src", dst: str = "dst",
                         max_iterations: int = 30) -> DataFrame:
    """Undirected connected components: returns (node, component) where
    component is the MINIMUM node id reachable from ``node``.

    ``edges`` may be directed input; it is symmetrized internally.
    Raises RuntimeError if ``max_iterations`` rounds don't reach the
    fixpoint — with pointer jumping that bound is ~log2(n) + graph
    constant, so 30 covers any realistic corpus; wrong-but-plausible
    labels must never flow downstream silently.
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
    converged = False
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
        # pointer jumping: follow the label one more hop (component is
        # itself a node id, so its row carries a possibly-smaller label) —
        # label-tree depth halves per round
        parents = new_labels.select(
            F.col("node").alias("component"),
            F.col("component").alias("_parent"))
        jumped = (
            new_labels.join(parents, "component", "left")
            .select("node",
                    F.coalesce("_parent", "component").alias("component"))
        )
        # materialize FIRST, then fixpoint-check against the materialized
        # frame: counting the lazy `jumped` subtree and then checkpointing
        # it would evaluate the whole iteration's joins twice.
        new_mat = jumped.localCheckpoint(eager=True)  # truncate lineage
        # fixpoint check: any node whose label still shrinks? (one cheap
        # scan of two checkpointed frames per round, O(diameter) rounds)
        changed = (
            new_mat.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.component") < F.col("o.component"))
            .limit(1)
            .count()
        )
        # the rebind below drops the ONLY reference to the previous
        # round's checkpointed frame — Spark's ContextCleaner then
        # reclaims its blocks via GC, so rounds hold at most two label
        # frames (current + new), never one per iteration
        labels = new_mat
        if changed == 0:
            converged = True
            break
    both.unpersist()
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_iterations} "
            "iterations")
    return labels


def connected_components_incremental(stored_labels: DataFrame,
                                     new_edges: DataFrame,
                                     src: str = "src", dst: str = "dst",
                                     max_iterations: int = 30) -> DataFrame:
    """Merge NEW edges into stored (node, component) labels WITHOUT
    re-running connected components over the corpus graph — the
    incremental twin of :func:`connected_components`, and the missing
    piece between ``near_dup_pairs_incremental`` (which scores only
    pairs touching a batch) and a maintained cluster labeling.

    New edges can only UNION existing components (min-labels only
    shrink), so the merge reduces to a component-LEVEL meta-graph:
    meta-nodes are the endpoints' current labels (a previously-unseen
    node stands in with its own id), meta-edges are the new pairs
    projected onto those labels, and ONE :func:`connected_components`
    over that — proportional to TOUCHED components + batch nodes, never
    the corpus. Relabeling is then a broadcast map join onto the stored
    frame (the remap dim is batch-proportional by construction).

    Exactness: labels are min-reachable-node ids and min COMPOSES — the
    min over a union of components is the min of their labels and any
    new node ids — so the output equals batch CC over old ∪ new edges
    (property-tested). Returns (node, component) covering stored nodes
    plus every new-edge endpoint.
    """
    e = (new_edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
         .distinct())
    lab_a = stored_labels.select(F.col("node").alias("a"),
                                 F.col("component").alias("_ca"))
    lab_b = stored_labels.select(F.col("node").alias("b"),
                                 F.col("component").alias("_cb"))
    meta_edges = (
        e.join(lab_a, "a", "left").join(lab_b, "b", "left")
        .select(F.coalesce("_ca", F.col("a")).alias("src"),
                F.coalesce("_cb", F.col("b")).alias("dst"))
    )
    meta = connected_components(meta_edges, max_iterations=max_iterations)
    remap = meta.select(F.col("node").alias("_old"),
                        F.col("component").alias("_new"))
    relabeled = (
        stored_labels.join(
            F.broadcast(remap),
            stored_labels["component"] == remap["_old"], "left")
        .select("node", F.coalesce("_new", "component").alias("component"))
    )
    new_nodes = (
        e.select(F.col("a").alias("node"))
        .unionByName(e.select(F.col("b").alias("node")))
        .distinct()
        .join(stored_labels.select("node"), "node", "left_anti")
    )
    new_labeled = (
        new_nodes.join(F.broadcast(remap),
                       new_nodes["node"] == remap["_old"], "left")
        .select("node", F.coalesce("_new", F.col("node")).alias("component"))
    )
    return relabeled.unionByName(new_labeled)


def triangle_counts(edges: DataFrame, src: str = "src",
                    dst: str = "dst") -> DataFrame:
    """Per-node degree and triangle participation over an undirected
    graph given as edge rows — the clustering-structure diagnostic for
    similarity graphs (a near-dup component that is also triangle-dense
    is a true duplicate CLIQUE; a star of coincidental band collisions
    has the same component but zero triangles — this is how a dedup
    pipeline tells template families from hash accidents).

    Algorithm: degree-oriented wedge counting (Cohen 2009 — the
    MapReduce-standard): each edge orients from its lower-(degree, id)
    endpoint, wedges form at each node over its OUT-edges only, and a
    wedge closes into a triangle iff the third edge exists in the
    canonical set. Orientation bounds per-node out-degree by O(√m), so
    the wedge join never explodes at a high-degree hub — THE property
    that makes triangle counting survive web-scale similarity graphs;
    each triangle is found exactly once (at its minimum-(degree, id)
    vertex). Output: (node, degree, n_triangles).
    """
    e = (edges.select(F.least(F.col(src), F.col(dst)).alias("a"),
                      F.greatest(F.col(src), F.col(dst)).alias("b"))
         .filter(F.col("a") != F.col("b")).distinct())
    inc = (e.select(F.col("a").alias("node"))
           .unionByName(e.select(F.col("b").alias("node"))))
    deg = inc.groupBy("node").agg(
        F.count(F.lit(1)).cast("bigint").alias("degree"))
    da = deg.select(F.col("node").alias("a"), F.col("degree").alias("_da"))
    db = deg.select(F.col("node").alias("b"), F.col("degree").alias("_db"))
    ed = e.join(da, "a").join(db, "b")
    lower_first = (F.col("_da") < F.col("_db")) | (
        (F.col("_da") == F.col("_db")) & (F.col("a") < F.col("b")))
    ori = ed.select(
        F.when(lower_first, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(lower_first, F.col("b")).otherwise(F.col("a")).alias("v"))
    w = (ori.alias("e1").join(ori.alias("e2"), "u")
         .filter(F.col("e1.v") < F.col("e2.v"))
         .select("u", F.col("e1.v").alias("x"), F.col("e2.v").alias("y")))
    tri = w.join(
        e.select(F.col("a").alias("_x"), F.col("b").alias("_y")),
        (F.least(F.col("x"), F.col("y")) == F.col("_x"))
        & (F.greatest(F.col("x"), F.col("y")) == F.col("_y")),
        "left_semi")
    part = (tri.select(F.explode(F.array("u", "x", "y")).alias("node"))
            .groupBy("node")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_triangles")))
    return (deg.join(part, "node", "left")
            .select("node", "degree",
                    F.coalesce(F.col("n_triangles"),
                               F.lit(0).cast("bigint")).alias("n_triangles")))
