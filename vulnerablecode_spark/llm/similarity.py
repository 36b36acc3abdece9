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


def sign_bucket(vec: Column, bits: int = N_SIGN_BITS) -> Column:
    """Deterministic LSH bucket id: sign bits of the first ``bits`` dims."""
    acc = F.lit(0)
    for d in range(bits):
        acc = acc + F.when(F.element_at(vec, d + 1) >= 0, F.lit(1 << d)).otherwise(0)
    return acc.cast("int")


def ivf_index(corpus: DataFrame, n_cells: int = 16,
              id_col: str = "vec_id", vec_col: str = "embedding"):
    """Deterministic mini-IVF: the ``n_cells`` lowest-id vectors act as
    centroids (a real deployment would run k-means; determinism matters
    more here), every vector is assigned to its nearest centroid by cosine.

    Returns (centroids_df, assigned_df) where assigned carries a ``cell``
    column. The assignment is one broadcast join + argmax — a single scan
    of the corpus.
    """
    centroids = corpus.orderBy(id_col).limit(n_cells).select(
        F.col(id_col).alias("cell"), F.col(vec_col).alias("centroid")
    )
    scored = corpus.join(F.broadcast(centroids)).select(
        id_col, vec_col, "cell",
        F.round(cosine(F.col(vec_col), F.col("centroid")), 6).alias("_sim"),
    )
    w = Window.partitionBy(id_col).orderBy(F.col("_sim").desc(), F.col("cell").asc())
    assigned = (
        scored.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .select(id_col, vec_col, "cell")
    )
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
