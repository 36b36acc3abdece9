"""Embedding similarity search: brute-force cosine top-k and LSH-bucketed ANN.

The embedding column is ``array<float>``; all arithmetic is done in DOUBLE
with built-in higher-order functions (zip_with/aggregate) — JVM-side, no
Python. Scale design:

- brute-force top-k broadcasts the (small) query set against the corpus —
  one scan, no shuffle of the corpus, per-partition partial top-k via the
  row_number window;
- the ANN variant buckets vectors by deterministic sign-LSH (sign pattern of
  leading dimensions; on a real deployment, random-hyperplane projections)
  and joins only within buckets, bounding candidates per query — the same
  bucketed-equi-join shape as the engine's version-range unfurl join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

N_SIGN_BITS = 8


def _as_double(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    a, b = _as_double(a), _as_double(b)
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
                id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact top-k cosine neighbors per query vector (self excluded).

    ``queries`` is broadcast — the corpus is scanned once, never shuffled;
    the only shuffle is the tiny (n_queries × corpus) → top-k window.
    """
    q = queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).alias("q_vec"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"),
                      F.col(vec_col).alias("c_vec"))
    sim = F.round(cosine(F.col("q_vec"), F.col("c_vec")), 4)
    scored = (
        c.join(F.broadcast(q))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", sim.alias("cosine_sim"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", "rk")
    )


def hyperplanes(bits: int = N_SIGN_BITS, dim: int = 64,
                seed: str = "vc-spark") -> list[list[float]]:
    """Seeded pseudo-random hyperplane coefficients, one plane per bucket
    bit: integer-valued doubles in [-1000, 1000] derived from
    md5(seed:bit:dim) — fully deterministic and exactly representable, so
    any engine reproduces the identical dot products bit-for-bit.
    """
    import hashlib

    planes = []
    for b in range(bits):
        row = []
        for d in range(dim):
            h = int(hashlib.md5(f"{seed}:{b}:{d}".encode()).hexdigest()[:15], 16)
            row.append(float(h % 2001 - 1000))
        planes.append(row)
    return planes


def sign_bucket(vec: Column, bits: int = N_SIGN_BITS, dim: int = 64,
                seed: str = "vc-spark") -> Column:
    """Random-hyperplane LSH bucket id: bit b = sign of ⟨vec, plane_b⟩.

    Unlike sign-of-leading-dims (which skews badly when early dimensions
    are correlated — e.g. PCA-rotated embeddings where dim 0 dominates),
    seeded random projections split any distribution near-evenly. The dot
    products are a strict left-to-right fold, reproducible across engines.
    """
    acc = F.lit(0)
    for b, plane in enumerate(hyperplanes(bits, dim, seed)):
        dot_b = F.aggregate(
            F.zip_with(vec, F.array(*[F.lit(c) for c in plane]),
                       lambda x, c: x.cast("double") * c),
            F.lit(0.0), lambda s, x: s + x,
        )
        acc = acc + F.when(dot_b >= 0, F.lit(1 << b)).otherwise(0)
    return acc.cast("int")


def _assign_cells(corpus: DataFrame, centroids: DataFrame,
                  id_col: str, vec_col: str) -> DataFrame:
    """Nearest-centroid assignment: broadcast join + argmax window."""
    scored = corpus.join(F.broadcast(centroids)).select(
        id_col, vec_col, "cell",
        F.round(cosine(F.col(vec_col), F.col("centroid")), 6).alias("_sim"),
    )
    w = Window.partitionBy(id_col).orderBy(F.col("_sim").desc(), F.col("cell").asc())
    return (
        scored.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .select(id_col, vec_col, "cell")
    )


def ivf_index(corpus: DataFrame, n_cells: int = 16,
              id_col: str = "vec_id", vec_col: str = "embedding",
              kmeans_iters: int = 2):
    """k-means-lite IVF: deterministic init (the ``n_cells`` lowest-id
    vectors), then ``kmeans_iters`` Lloyd iterations — assign each vector
    to its nearest centroid (broadcast join + argmax), recompute each
    cell's component-wise mean (posexplode + one aggregation). Iterated
    centroids track the data distribution instead of whatever the lowest
    ids happened to be, evening out cell sizes.

    Returns (centroids_df, assigned_df) where assigned carries a ``cell``
    column. Per iteration: one corpus scan + one tiny (n_cells × dim)
    aggregation — the centroid frame never exceeds broadcast size.
    """
    centroids = corpus.orderBy(id_col).limit(n_cells).select(
        F.col(id_col).alias("cell"),
        _as_double(F.col(vec_col)).alias("centroid"),
    )
    for _ in range(kmeans_iters):
        assigned = _assign_cells(corpus, centroids, id_col, vec_col)
        means = (
            assigned.select("cell", F.posexplode(vec_col).alias("pos", "x"))
            .groupBy("cell", "pos")
            .agg(F.avg(F.col("x").cast("double")).alias("m"))
            .groupBy("cell")
            .agg(F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "m"))),
                lambda s: s["m"],
            ).alias("centroid"))
        )
        # empty cells (no members) drop out; keep the previous centroid so
        # the cell count stays stable
        centroids = (
            centroids.select("cell", F.col("centroid").alias("prev"))
            .join(means, "cell", "left")
            .select("cell", F.coalesce("centroid", "prev").alias("centroid"))
        ).localCheckpoint(eager=True)
    assigned = _assign_cells(corpus, centroids, id_col, vec_col)
    return centroids, assigned


def ann_topk_ivf(corpus: DataFrame, queries: DataFrame, k: int = 5,
                 n_cells: int = 16, nprobe: int = 4,
                 id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """IVF search: probe the ``nprobe`` nearest cells per query and rank
    only those cells' members — candidates drop from |corpus| to
    ~|corpus|·nprobe/n_cells per query, the classic ANN scale path.
    """
    centroids, assigned = ivf_index(corpus, n_cells, id_col, vec_col)
    q = queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).alias("q_vec"))
    q_cells = q.join(F.broadcast(centroids)).select(
        "query_id", "q_vec", "cell",
        F.round(cosine(F.col("q_vec"), F.col("centroid")), 6).alias("_sim"),
    )
    wq = Window.partitionBy("query_id").orderBy(
        F.col("_sim").desc(), F.col("cell").asc())
    probes = (
        q_cells.withColumn("_rk", F.row_number().over(wq))
        .filter(F.col("_rk") <= nprobe)
        .select("query_id", "q_vec", "cell")
    )
    cand = probes.join(
        assigned.select(F.col(id_col).alias("neighbor_id"),
                        F.col(vec_col).alias("c_vec"), "cell"),
        "cell",
    ).filter(F.col("query_id") != F.col("neighbor_id"))
    sim = F.round(cosine(F.col("q_vec"), F.col("c_vec")), 4)
    scored = cand.select("query_id", "neighbor_id", sim.alias("cosine_sim"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", "rk")
    )


def ann_topk_lsh(corpus: DataFrame, queries: DataFrame, k: int = 3,
                 id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH bucket.

    Bucket-equi-join bounds work to O(bucket size) per query — the scale
    path when the corpus no longer fits a broadcast brute-force pass.
    """
    c = corpus.select(F.col(id_col).alias("neighbor_id"),
                      F.col(vec_col).alias("c_vec"),
                      sign_bucket(F.col(vec_col)).alias("bucket"))
    q = queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).alias("q_vec"),
                       sign_bucket(F.col(vec_col)).alias("bucket"))
    sim = F.round(cosine(F.col("q_vec"), F.col("c_vec")), 4)
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "bucket", "neighbor_id", sim.alias("cosine_sim"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "bucket", "neighbor_id", "cosine_sim", "rk")
    )
