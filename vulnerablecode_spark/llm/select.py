"""Data-selection operators: scoring documents for inclusion in a training
mix — hashed importance resampling (DSIR), unigram-surprisal corpus
partitioning (the CCNet head/middle/tail split), and packing-efficiency
reports for the sequence-packing manifests.

These are the selection half of a pretraining data pipeline: dedup/quality
(llm/dedup.py, llm/text.py) decide what is CLEAN, these decide what is
WORTH TRAINING ON and how efficiently it batches. They generalize the
reference's prioritize-by-signal posture (improvers ranked by confidence,
vulnerabilities ranked by risk, e.g. vulnerabilities/improvers/__init__.py
ordering and vulnerabilities/risk.py weighted scoring) to corpus-scale
selection.

Design rules shared with the rest of the llm package:

- Pure Catalyst expressions — no Python UDFs — so every operator stays
  JVM-side and whole-stage codegen'd.
- Engine-exact arithmetic: integer basis points / micro-units throughout,
  and the md5-derived 60-bit ``hash64`` for every hash, so a DuckDB oracle
  reproduces results bit-for-bit (no float log-probabilities: the DSIR and
  surprisal scores are likelihood RATIOS carried as integer lifts, which
  rank identically to their logs).
- Scale shape: every per-bucket / per-source statistic frame is tiny
  (n_buckets or n_sources rows) and broadcast back onto the corpus; the
  corpus-side plans are one explode + key-partitioned aggregations. No
  global sort except the per-language NTILE in ``surprisal_partition``,
  whose 100 TB variant is documented in its docstring.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from vulnerablecode_spark.llm.dedup import hash64


def _scalar_join(df: DataFrame, scalar: DataFrame) -> DataFrame:
    """Join a 1-row aggregate onto ``df`` via a literal key →
    BroadcastHashJoin, never a nested-loop/cartesian (the plan-quality
    invariant the suite asserts)."""
    return df.withColumn("_k", F.lit(1)).join(
        F.broadcast(scalar.withColumn("_k", F.lit(1))), "_k"
    ).drop("_k")


# ---------------------------------------------------------------------------
# DSIR — hashed importance resampling weights
# ---------------------------------------------------------------------------


def _doc_bucket_counts(
    docs: DataFrame,
    n_buckets: int,
    text_col: str,
    id_col: str,
    flag: "F.Column | None" = None,
) -> DataFrame:
    """Per-(doc, bucket) hashed-unigram counts — one explode, counts
    partial-aggregated map-side before the doc-key shuffle."""
    cols = [F.col(id_col)]
    keys = [id_col, "bucket"]
    if flag is not None:
        cols.append(flag.alias("is_target"))
        keys.insert(1, "is_target")
    toks = docs.select(
        *cols, F.explode(F.split(F.col(text_col), " ")).alias("tok")
    )
    return (
        toks.withColumn("bucket", hash64(F.col("tok")) % int(n_buckets))
        .groupBy(*keys)
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )


def dsir_bucket_lifts(
    docs: DataFrame,
    target: "F.Column",
    n_buckets: int = 4096,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Fit the DSIR importance model: per-bucket integer lifts (basis
    points, Laplace +1 smoothed) comparing the target domain's hashed-
    unigram distribution to the raw side's::

        lift_bp[b] = 10000 * p_target(b) / p_raw(b)
                   = ((t_cnt[b]+1) * (r_tot+B) * 10000)
                     div ((r_cnt[b]+1) * (t_tot+B))

    Output is the DENSE ``n_buckets``-row (bucket, lift_bp) dimension —
    buckets unseen in the fit corpus still get a row, carrying the
    smoothed default lift the ``+1`` terms exist for, so a later scoring
    pass (over a DIFFERENT corpus, batch or streaming) can inner-join it
    safely: every possible ``hash64(tok) % n_buckets`` value has a row.
    This is the STORED model a production pipeline writes once and
    broadcasts into every subsequent scoring pass. Product bound: counts
    × totals × 10⁴ stays under 2⁶³ through ~10⁹ tokens per side; beyond
    that the production plan switches the numerator to DECIMAL(38,0).
    """
    nb = int(n_buckets)
    pdb = _doc_bucket_counts(docs, nb, text_col, id_col, flag=target)
    stats = pdb.groupBy("bucket").agg(
        F.sum(F.when(F.col("is_target"), F.col("cnt")).otherwise(0))
        .cast("bigint").alias("t_cnt"),
        F.sum(F.when(~F.col("is_target"), F.col("cnt")).otherwise(0))
        .cast("bigint").alias("r_cnt"),
    )
    totals = stats.agg(
        F.sum("t_cnt").cast("bigint").alias("t_tot"),
        F.sum("r_cnt").cast("bigint").alias("r_tot"),
    )
    # densify to all n_buckets rows: unseen buckets get (0, 0) counts —
    # i.e. the pure-smoothing default lift — so the model is total over
    # the hash range, not just the fit corpus's occupied buckets
    all_buckets = docs.sparkSession.range(nb).select(
        F.col("id").cast("bigint").alias("bucket"))
    dense = all_buckets.join(F.broadcast(stats), "bucket", "left").select(
        "bucket",
        F.coalesce("t_cnt", F.lit(0)).cast("bigint").alias("t_cnt"),
        F.coalesce("r_cnt", F.lit(0)).cast("bigint").alias("r_cnt"),
    )
    return _scalar_join(dense, totals).select(
        "bucket",
        F.expr(
            f"(t_cnt + 1) * (r_tot + {nb}) * 10000"
            f" div ((r_cnt + 1) * (t_tot + {nb}))"
        ).cast("bigint").alias("lift_bp"),
    )


def dsir_score(
    docs: DataFrame,
    lifts: DataFrame,
    n_buckets: int = 4096,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Score documents against a fitted (bucket, lift_bp) dimension: each
    document's importance weight is its token-count-weighted MEAN bucket
    lift — the integer-ratio analogue of DSIR's mean log-likelihood ratio
    (a monotone transform per bucket, so resampling ranks agree wherever
    one bucket dominates; unlike the float log it is bit-identical across
    engines). The dimension broadcasts, so the corpus is never joined to
    anything its own size. Output: (doc_id, n_tok, importance_bp),
    descending-sortable for top-p resampling.

    The inner join on ``bucket`` is total because ``dsir_bucket_lifts``
    emits a DENSE model (every ``hash64 % n_buckets`` value has a row,
    unseen buckets carrying the smoothed default) — score only against a
    model fit with the same ``n_buckets``.
    """
    pdb = _doc_bucket_counts(docs, n_buckets, text_col, id_col)
    return (
        pdb.join(F.broadcast(lifts), "bucket")
        .groupBy(id_col)
        .agg(
            F.sum("cnt").cast("bigint").alias("n_tok"),
            F.expr("sum(cnt * lift_bp) div sum(cnt)")
            .cast("bigint").alias("importance_bp"),
        )
    )


def dsir_importance(
    docs: DataFrame,
    target: "F.Column",
    n_buckets: int = 4096,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Data Selection via Importance Resampling (Xie et al. 2023), the
    hashed-n-gram variant: fit per-bucket lifts on the target/raw split
    (``dsir_bucket_lifts``), then score every NON-target document against
    them (``dsir_score``). See those stages for arithmetic and the scale
    shape; the streaming twin (streaming/incremental.py
    ``stream_dsir_score``) replays the score stage per micro-batch
    against the stored dimension.
    """
    lifts = dsir_bucket_lifts(docs, target, n_buckets, text_col, id_col)
    return dsir_score(
        docs.filter(~target), lifts, n_buckets, text_col, id_col
    )


# ---------------------------------------------------------------------------
# CCNet-style surprisal partitioning (head / middle / tail)
# ---------------------------------------------------------------------------


def surprisal_partition(
    docs: DataFrame,
    n_parts: int = 3,
    lang_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Partition each language's corpus into equal tiers by a unigram
    surprisal proxy — the CCNet head/middle/tail split (Wenzek et al.
    2020), with the corpus's own unigram model standing in for the
    external KenLM.

    Per-token rarity is the integer inverse probability ``10000 *
    total_tokens div global_tf(token)`` (basis points); a document's
    surprisal score is its mean token rarity. Rarity is a monotone
    transform of unigram -log p, so tier membership matches the
    log-domain split wherever a document's tokens are dominated by one
    frequency band, and the integer form is engine-exact. Tiers come from
    ``NTILE(n_parts)`` per language over (score, doc_id) — tier 1 = head
    (most-probable text), tier ``n_parts`` = tail.

    Scale shape: explode → global term-frequency aggregate (vocabulary-
    sized, orders of magnitude smaller than the corpus) → shuffle join
    tokens⋈tf on the term key → per-doc sum. The per-language NTILE is
    the one global-sort stage; the 100 TB variant replaces it with
    score cutpoints from a per-language quantile sketch (two fixed
    cutpoints broadcast back), which this operator's output is the exact
    small-scale reference for.
    """
    toks = docs.select(
        F.col(id_col),
        F.col(lang_col),
        F.explode(F.split(F.col(text_col), " ")).alias("tok"),
    )
    tf = toks.groupBy("tok").agg(
        F.count(F.lit(1)).cast("bigint").alias("global_tf")
    )
    total = tf.agg(F.sum("global_tf").cast("bigint").alias("total_tokens"))
    scored = (
        _scalar_join(toks.join(tf, "tok"), total)
        .groupBy(id_col, lang_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tok"),
            F.expr("sum(total_tokens * 10000 div global_tf) div count(1)")
            .cast("bigint").alias("surprisal_bp"),
        )
    )
    w = Window.partitionBy(lang_col).orderBy(
        F.col("surprisal_bp").asc(), F.col(id_col).asc()
    )
    tier = F.ntile(int(n_parts)).over(w).cast("bigint")
    return scored.select(
        F.col(id_col),
        F.col(lang_col),
        "n_tok",
        "surprisal_bp",
        tier.alias("tier"),
    )


# ---------------------------------------------------------------------------
# Stupid Backoff bigram LM scoring
# ---------------------------------------------------------------------------


def stupid_backoff_score(
    docs: DataFrame,
    alpha_bp: int = 4000,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document LEAVE-ONE-OUT fluency under a corpus bigram LM with
    Stupid Backoff (Brants et al. 2007 — the smoothing designed for
    MapReduce-scale LMs precisely because it needs only COUNTS, no
    discount normalization). Each document is scored against the corpus
    MINUS ITSELF — naive same-corpus scoring awards singleton contexts a
    perfect conditional probability (a unique bigram predicts itself),
    so only held-out counts measure how predictable a document is from
    the REST of the corpus::

        S(w2|w1) = (c12 - d12) / (c1 - d1)          if both > 0
                 = alpha * (c2 - d2) / (T - n_doc)   else (0 if empty)

    where c* are corpus counts, d* the document's own counts, T the
    corpus token total — all integer basis points (``alpha_bp`` =
    alpha·10⁴). High = built from transitions frequent ELSEWHERE
    (formulaic/duplicated text), low = novel token transitions; the
    fluency/novelty axis CCNet gets from an external KenLM, derived from
    the corpus's own counts. Documents with fewer than 2 tokens have no
    row.

    Scale shape: bigram/unigram count tables are vocabulary-sized,
    partial-aggregated map-side; the per-(doc, bigram) frame joins them
    on token keys — shuffle joins on key-partitioned aggregates, never a
    broadcast of anything corpus-sized. Product bound: count × 10⁴
    stays under 2⁶³ through ~10¹⁴ tokens.
    """
    toks = F.split(F.col(text_col), " ")
    pairs = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - 2),
            lambda i: F.struct(
                F.element_at(toks, i + 1).alias("w1"),
                F.element_at(toks, i + 2).alias("w2"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    doc_bigrams = docs.select(
        F.col(id_col), F.explode(pairs).alias("p")
    ).select(id_col, "p.w1", "p.w2")
    # per-(doc, bigram) multiplicity: the document's own contribution,
    # subtracted for leave-one-out and used as the mean weight
    per_doc = doc_bigrams.groupBy(id_col, "w1", "w2").agg(
        F.count(F.lit(1)).cast("bigint").alias("d12"))
    bigram_counts = per_doc.groupBy("w1", "w2").agg(
        F.sum("d12").cast("bigint").alias("c12"))

    doc_unis = docs.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("w")
    ).groupBy(id_col, "w").agg(
        F.count(F.lit(1)).cast("bigint").alias("d"))
    uni_counts = doc_unis.groupBy("w").agg(
        F.sum("d").cast("bigint").alias("c"))
    doc_len = doc_unis.groupBy(id_col).agg(
        F.sum("d").cast("bigint").alias("n_doc"))
    total = uni_counts.agg(F.sum("c").cast("bigint").alias("total_tokens"))

    scored = (
        per_doc
        .join(bigram_counts, ["w1", "w2"])
        .join(uni_counts.select(F.col("w").alias("w1"),
                                F.col("c").alias("c1")), "w1")
        .join(uni_counts.select(F.col("w").alias("w2"),
                                F.col("c").alias("c2")), "w2")
        .join(doc_unis.select(F.col(id_col), F.col("w").alias("w1"),
                              F.col("d").alias("d1")), [id_col, "w1"])
        .join(doc_unis.select(F.col(id_col), F.col("w").alias("w2"),
                              F.col("d").alias("d2")), [id_col, "w2"])
        .join(doc_len, id_col)
    )
    scored = _scalar_join(scored, total).withColumn(
        "score_bp",
        F.when(
            (F.col("c12") - F.col("d12") > 0) & (F.col("c1") - F.col("d1") > 0),
            F.expr("(c12 - d12) * 10000 div (c1 - d1)"),
        ).when(
            (F.col("c2") - F.col("d2") > 0)
            & (F.col("total_tokens") - F.col("n_doc") > 0),
            F.expr(f"{int(alpha_bp)} * ((c2 - d2) * 10000"
                   " div (total_tokens - n_doc)) div 10000"),
        ).otherwise(F.lit(0).cast("bigint")),
    )
    return scored.groupBy(id_col).agg(
        F.sum("d12").cast("bigint").alias("n_bigrams"),
        F.expr("sum(d12 * score_bp) div sum(d12)").cast("bigint")
        .alias("fluency_bp"),
    )


# ---------------------------------------------------------------------------
# Packing-efficiency report
# ---------------------------------------------------------------------------


def packing_efficiency(
    docs: DataFrame,
    seq_len: int = 128,
    stream_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Per-stream report comparing naive one-doc-per-sequence batching
    against the concat-and-chunk packing of ``curate.pack_sequences``:
    sequence counts, padding waste, and utilization (basis points) for
    both strategies — the artifact that justifies a packing pipeline.

    Naive batching pads every document to a ``seq_len`` multiple
    (``ceil(n_tok / L)`` sequences per doc); packed batching concatenates
    the stream and cuts (``ceil(stream_tokens / L)`` sequences total, all
    padding at the single stream tail). Pure one-pass aggregation —
    integer arithmetic, one shuffle by stream key, no window.
    """
    ln = int(seq_len)
    n_tok = F.size(F.split(F.col(text_col), " ")).cast("bigint")
    return (
        docs.select(
            F.col(stream_col).alias("stream"), n_tok.alias("n_tok")
        )
        .groupBy("stream")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("stream_tokens"),
            F.sum(F.expr(f"(n_tok + {ln} - 1) div {ln}"))
            .cast("bigint").alias("naive_seqs"),
        )
        .select(
            "stream",
            "n_docs",
            "stream_tokens",
            "naive_seqs",
            F.expr(f"(stream_tokens + {ln} - 1) div {ln}")
            .cast("bigint").alias("packed_seqs"),
            F.expr(f"naive_seqs * {ln} - stream_tokens")
            .cast("bigint").alias("naive_pad_tokens"),
            F.expr(
                f"stream_tokens * 10000 div (naive_seqs * {ln})"
            ).cast("bigint").alias("naive_util_bp"),
            F.expr(
                f"stream_tokens * 10000"
                f" div (((stream_tokens + {ln} - 1) div {ln}) * {ln})"
            ).cast("bigint").alias("packed_util_bp"),
        )
    )
