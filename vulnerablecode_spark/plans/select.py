"""Graded queries for the data-selection operators (llm/select.py):
DSIR hashed importance weights, CCNet-style surprisal partitioning, and
the packing-efficiency report.

Every oracle reproduces the Spark plan's integer arithmetic exactly —
``div`` ↔ ``//``, the md5-derived 60-bit hash, basis-point lifts — so the
driver's value-hash comparison is bit-for-bit, never float-tolerant.
DuckDB's SUM(BIGINT) returns HUGEINT, so every aggregate is cast back to
BIGINT explicitly to match Spark's types.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from vulnerablecode_spark.llm import select
from vulnerablecode_spark.plans.registry import _load, query

_SQL_HASH64 = "(('0x' || substr(md5({s}), 1, 15))::BIGINT)"


# ---------------------------------------------------------------------------
# DSIR hashed importance weights — target domain = source 'src0'.
# ---------------------------------------------------------------------------

_DSIR_BUCKETS = 4096


@query(
    "q75_dsir_importance",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, source = 'src0' AS is_target,
               {_SQL_HASH64.format(s='tok')} % {_DSIR_BUCKETS} AS bucket
        FROM (SELECT doc_id, source, UNNEST(string_split(text, ' ')) AS tok
              FROM documents)
    ),
    pdb AS (
        SELECT doc_id, is_target, bucket, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM toks GROUP BY doc_id, is_target, bucket
    ),
    stats AS (
        SELECT bucket,
               CAST(SUM(CASE WHEN is_target THEN cnt ELSE 0 END) AS BIGINT)
                   AS t_cnt,
               CAST(SUM(CASE WHEN NOT is_target THEN cnt ELSE 0 END)
                    AS BIGINT) AS r_cnt
        FROM pdb GROUP BY bucket
    ),
    tot AS (
        SELECT CAST(SUM(t_cnt) AS BIGINT) AS t_tot,
               CAST(SUM(r_cnt) AS BIGINT) AS r_tot
        FROM stats
    ),
    dim AS (
        SELECT bucket,
               (t_cnt + 1) * (r_tot + {_DSIR_BUCKETS}) * 10000
                   // ((r_cnt + 1) * (t_tot + {_DSIR_BUCKETS})) AS lift_bp
        FROM stats, tot
    )
    SELECT doc_id,
           CAST(SUM(cnt) AS BIGINT) AS n_tok,
           CAST(SUM(cnt * lift_bp) // SUM(cnt) AS BIGINT) AS importance_bp
    FROM pdb JOIN dim USING (bucket)
    WHERE NOT is_target
    GROUP BY doc_id
    """,
)
def q75_dsir_importance(spark, sf_dir):
    docs = _load(spark, sf_dir, "documents")
    return select.dsir_importance(
        docs, target=F.col("source") == "src0", n_buckets=_DSIR_BUCKETS
    )


# ---------------------------------------------------------------------------
# CCNet head/middle/tail partitioning by unigram surprisal.
# ---------------------------------------------------------------------------


@query(
    "q76_surprisal_partition",
    oracle="""
    WITH toks AS (
        SELECT doc_id, lang, UNNEST(string_split(text, ' ')) AS tok
        FROM documents
    ),
    tf AS (
        SELECT tok, CAST(COUNT(*) AS BIGINT) AS global_tf
        FROM toks GROUP BY tok
    ),
    tot AS (SELECT CAST(SUM(global_tf) AS BIGINT) AS total_tokens FROM tf),
    scored AS (
        SELECT doc_id, lang,
               CAST(COUNT(*) AS BIGINT) AS n_tok,
               CAST(SUM(total_tokens * 10000 // global_tf) // COUNT(*)
                    AS BIGINT) AS surprisal_bp
        FROM toks JOIN tf USING (tok), tot
        GROUP BY doc_id, lang
    )
    SELECT doc_id, lang, n_tok, surprisal_bp,
           CAST(NTILE(3) OVER (
               PARTITION BY lang ORDER BY surprisal_bp ASC, doc_id ASC
           ) AS BIGINT) AS tier
    FROM scored
    """,
)
def q76_surprisal_partition(spark, sf_dir):
    docs = _load(spark, sf_dir, "documents")
    return select.surprisal_partition(docs, n_parts=3)


# ---------------------------------------------------------------------------
# Packing-efficiency report — naive vs concat-and-chunk (q67's packing).
# ---------------------------------------------------------------------------


@query(
    "q77_packing_efficiency",
    oracle="""
    WITH s AS (
        SELECT source AS stream,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(len(string_split(text, ' '))) AS BIGINT)
                   AS stream_tokens,
               CAST(SUM((len(string_split(text, ' ')) + 127) // 128)
                    AS BIGINT) AS naive_seqs
        FROM documents GROUP BY source
    )
    SELECT stream, n_docs, stream_tokens, naive_seqs,
           CAST((stream_tokens + 127) // 128 AS BIGINT) AS packed_seqs,
           CAST(naive_seqs * 128 - stream_tokens AS BIGINT)
               AS naive_pad_tokens,
           CAST(stream_tokens * 10000 // (naive_seqs * 128) AS BIGINT)
               AS naive_util_bp,
           CAST(stream_tokens * 10000
                // (((stream_tokens + 127) // 128) * 128) AS BIGINT)
               AS packed_util_bp
    FROM s
    """,
)
def q77_packing_efficiency(spark, sf_dir):
    docs = _load(spark, sf_dir, "documents")
    return select.packing_efficiency(docs, seq_len=128)


# ---------------------------------------------------------------------------
# Stupid Backoff bigram fluency — corpus-trained LM scoring.
# ---------------------------------------------------------------------------


@query(
    "q80_stupid_backoff_lm",
    # leave-one-out: each doc scores against corpus counts minus its own
    # contribution (llm/select.py stupid_backoff_score docstring)
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
               FROM documents),
    db AS (
        SELECT doc_id, toks[i + 1] AS w1, toks[i + 2] AS w2
        FROM t, UNNEST(range(0, greatest(len(toks) - 1, 0))) AS u(i)
        WHERE len(toks) >= 2
    ),
    pd AS (SELECT doc_id, w1, w2, CAST(COUNT(*) AS BIGINT) AS d12
           FROM db GROUP BY doc_id, w1, w2),
    bc AS (SELECT w1, w2, CAST(SUM(d12) AS BIGINT) AS c12
           FROM pd GROUP BY w1, w2),
    du AS (
        SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) AS d
        FROM (SELECT doc_id, UNNEST(string_split(text, ' ')) AS w
              FROM documents)
        GROUP BY doc_id, w
    ),
    uni AS (SELECT w, CAST(SUM(d) AS BIGINT) AS c FROM du GROUP BY w),
    dl AS (SELECT doc_id, CAST(SUM(d) AS BIGINT) AS n_doc
           FROM du GROUP BY doc_id),
    tot AS (SELECT CAST(SUM(c) AS BIGINT) AS total_tokens FROM uni),
    scored AS (
        SELECT pd.doc_id, pd.d12,
               CASE WHEN bc.c12 - pd.d12 > 0 AND u1.c - du1.d > 0
                    THEN (bc.c12 - pd.d12) * 10000 // (u1.c - du1.d)
                    WHEN u2.c - du2.d > 0
                         AND tot.total_tokens - dl.n_doc > 0
                    THEN 4000 * ((u2.c - du2.d) * 10000
                                 // (tot.total_tokens - dl.n_doc)) // 10000
                    ELSE 0
               END AS score_bp
        FROM pd
        JOIN bc USING (w1, w2)
        JOIN uni u1 ON u1.w = pd.w1
        JOIN uni u2 ON u2.w = pd.w2
        JOIN du du1 ON du1.doc_id = pd.doc_id AND du1.w = pd.w1
        JOIN du du2 ON du2.doc_id = pd.doc_id AND du2.w = pd.w2
        JOIN dl ON dl.doc_id = pd.doc_id, tot
    )
    SELECT doc_id,
           CAST(SUM(d12) AS BIGINT) AS n_bigrams,
           CAST(SUM(d12 * score_bp) // SUM(d12) AS BIGINT) AS fluency_bp
    FROM scored GROUP BY doc_id
    """,
)
def q80_stupid_backoff_lm(spark, sf_dir):
    docs = _load(spark, sf_dir, "documents")
    return select.stupid_backoff_score(docs)
