"""Graded queries for the corpus-curation operators (llm/curate.py):
stopword stripping, concat-and-chunk sequence packing, stratified sampling,
distinctive-vocabulary lift, and epoch up-sampling manifests.

Every oracle reproduces the Spark plan's integer arithmetic exactly —
``div`` ↔ ``//``, the md5-derived 60-bit hash, basis-point rates — so the
driver's value-hash comparison is bit-for-bit, never float-tolerant.
"""

from __future__ import annotations

from vulnerablecode_spark.llm import curate
from vulnerablecode_spark.plans.registry import _load, query

_SQL_HASH64 = "(('0x' || substr(md5({s}), 1, 15))::BIGINT)"


# ---------------------------------------------------------------------------
# Stopword / boilerplate stripping — cleaned-text fingerprints + counts.
# ---------------------------------------------------------------------------

# generated from the canonical list so the oracle can never drift from
# the Spark operator's STOPWORDS
_SQL_STOPLIST = ", ".join(f"'{w}'" for w in curate.STOPWORDS)
_SQL_KEPT = (
    "list_filter(string_split(text, ' '), "
    f"t -> lower(t) NOT IN ({_SQL_STOPLIST}))"
)


@query(
    "q66_stopword_strip",
    oracle=f"""
    SELECT doc_id,
           md5(array_to_string({_SQL_KEPT}, ' ')) AS clean_fp,
           CAST(len({_SQL_KEPT}) AS BIGINT) AS kept_tokens,
           CAST(len(string_split(text, ' ')) - len({_SQL_KEPT}) AS BIGINT)
               AS removed_tokens
    FROM documents
    """,
)
def q66_stopword_strip(spark, sf_dir):
    docs = _load(spark, sf_dir, "documents")
    return curate.strip_stopwords(docs)


# ---------------------------------------------------------------------------
# PII / secret redaction — typed-placeholder scrub + per-class hit counts.
# ---------------------------------------------------------------------------

# the ONE pattern table (llm/curate.py PII_PATTERNS — order defines the
# scrub); the oracle SQL below is generated from it, so an edited pattern
# can never grade against a stale oracle. Patterns are RE2-safe by that
# table's contract, and the single quotes the SQL embedding would need
# escaping never appear in character-class regexes.
_PII = curate.PII_PATTERNS

_redacted = "text"
for _, _pat, _ph in _PII:
    _redacted = f"regexp_replace({_redacted}, '{_pat}', '{_ph}', 'g')"
_counts = ",\n           ".join(
    f"CAST(len(regexp_extract_all(text, '{pat}')) AS BIGINT) AS n_{name}"
    for name, pat, _ in _PII
)


@query(
    "q71_pii_redaction",
    # The driver corpus is synthetic prose with no PII, so all counts are 0
    # and the fingerprint equals md5(text) — the fuzz harness
    # (tests/test_fuzz_parity.py) plants emails/IPs/card numbers/hex keys
    # into random corpora, where the scrub and counts are exercised for
    # real on both engines.
    oracle=f"""
    SELECT doc_id,
           md5({_redacted}) AS redacted_fp,
           {_counts}
    FROM documents
    """,
)
def q71_pii_redaction(spark, sf_dir):
    docs = _load(spark, sf_dir, "documents")
    return curate.redact_pii(docs)


# ---------------------------------------------------------------------------
# Concat-and-chunk sequence packing — the training-batch manifest.
# ---------------------------------------------------------------------------


@query(
    "q67_sequence_packing",
    oracle="""
    WITH t AS (
        SELECT source AS stream, doc_id,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
        FROM documents
    ),
    o AS (
        SELECT stream, doc_id, n_tok,
               CAST(COALESCE(SUM(n_tok) OVER (
                   PARTITION BY stream ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) AS BIGINT) AS tok_off
        FROM t
    ),
    e AS (
        SELECT stream, doc_id, n_tok, tok_off,
               UNNEST(range(tok_off // 128, (tok_off + n_tok - 1) // 128 + 1))
                   AS seq_id
        FROM o
    )
    SELECT stream, CAST(seq_id AS BIGINT) AS seq_id, doc_id,
           CAST(GREATEST(seq_id * 128 - tok_off, 0) AS BIGINT) AS tok_begin,
           CAST(LEAST((seq_id + 1) * 128, tok_off + n_tok) - tok_off - 1
                AS BIGINT) AS tok_end
    FROM e
    """,
)
def q67_sequence_packing(spark, sf_dir):
    docs = _load(spark, sf_dir, "documents")
    return curate.pack_sequences(docs, seq_len=128)


# ---------------------------------------------------------------------------
# Deterministic stratified sampling — per-(source, lang) equalizing rates.
# ---------------------------------------------------------------------------

# coalesce matches the Spark gate's explicit NULL-stratum handling
# (llm/curate.py stratified_sample) — plain || would propagate NULL
_SQL_STRATUM_KEY = (
    "coalesce(source, '') || ':' || coalesce(lang, '') || ':' "
    "|| CAST(doc_id AS VARCHAR)"
)


@query(
    "q68_stratified_sample",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, source, lang,
               CAST(COUNT(*) OVER (PARTITION BY source, lang) AS BIGINT)
                   AS stratum_n
        FROM documents
    )
    SELECT doc_id, source, lang, stratum_n,
           CAST(LEAST(10000, 250000 // stratum_n) AS BIGINT) AS rate_bp
    FROM t
    WHERE {_SQL_HASH64.format(s=_SQL_STRATUM_KEY)} % 10000
          < LEAST(10000, 250000 // stratum_n)
    """,
)
def q68_stratified_sample(spark, sf_dir):
    docs = _load(spark, sf_dir, "documents")
    return curate.stratified_sample(docs, target_per_stratum=25)


# ---------------------------------------------------------------------------
# Distinctive vocabulary per source — integer PMI lift, top-5.
# ---------------------------------------------------------------------------


@query(
    "q69_distinctive_terms",
    oracle="""
    WITH toks AS (
        SELECT source AS grp, UNNEST(string_split(text, ' ')) AS term
        FROM documents
    ),
    tfq AS (
        SELECT grp, term, CAST(COUNT(*) AS BIGINT) AS tf
        FROM toks GROUP BY grp, term
    ),
    g AS (
        SELECT term, CAST(COUNT(*) AS BIGINT) AS global_tf
        FROM toks GROUP BY term
    ),
    gt AS (
        SELECT grp, CAST(SUM(tf) AS BIGINT) AS grp_tokens
        FROM tfq GROUP BY grp
    ),
    tot AS (SELECT CAST(SUM(grp_tokens) AS BIGINT) AS total_tokens FROM gt),
    scored AS (
        SELECT tfq.grp, tfq.term, tfq.tf,
               tfq.tf * tot.total_tokens * 10000
                   // (gt.grp_tokens * g.global_tf) AS lift_bp
        FROM tfq JOIN g USING (term) JOIN gt USING (grp), tot
        WHERE tfq.tf >= 5
    ),
    ranked AS (
        SELECT grp, term, tf, lift_bp,
               ROW_NUMBER() OVER (
                   PARTITION BY grp ORDER BY lift_bp DESC, term ASC
               ) AS term_rank
        FROM scored
    )
    SELECT grp AS source, term, tf, CAST(lift_bp AS BIGINT) AS lift_bp,
           CAST(term_rank AS BIGINT) AS term_rank
    FROM ranked WHERE term_rank <= 5
    """,
)
def q69_distinctive_terms(spark, sf_dir):
    docs = _load(spark, sf_dir, "documents")
    return curate.distinctive_terms(docs, k=5, min_tf=5)


# ---------------------------------------------------------------------------
# BPE merge statistics — top adjacent-pair counts (tokenizer induction).
# ---------------------------------------------------------------------------


@query(
    "q74_bpe_merge_stats",
    oracle="""
    WITH t AS (SELECT string_split(text, ' ') AS toks FROM documents),
    p AS (
        SELECT toks[i + 1] || ' ' || toks[i + 2] AS pair
        FROM t, UNNEST(range(0, greatest(len(toks) - 1, 0))) AS u(i)
        WHERE len(toks) >= 2
    ),
    c AS (SELECT pair, CAST(COUNT(*) AS BIGINT) AS n FROM p GROUP BY pair),
    top AS (SELECT pair, n FROM c ORDER BY n DESC, pair ASC LIMIT 20)
    SELECT pair, n,
           CAST(ROW_NUMBER() OVER (ORDER BY n DESC, pair ASC) AS BIGINT)
               AS merge_rank
    FROM top
    """,
)
def q74_bpe_merge_stats(spark, sf_dir):
    docs = _load(spark, sf_dir, "documents")
    return curate.bpe_merge_stats(docs, k=20)


# ---------------------------------------------------------------------------
# Epoch up-sampling manifest — token-equalizing per-source multipliers.
# ---------------------------------------------------------------------------


@query(
    "q70_epoch_upsample",
    oracle="""
    WITH per AS (
        SELECT source AS grp,
               CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS src_tokens
        FROM documents GROUP BY source
    ),
    m AS (SELECT CAST(MAX(src_tokens) AS BIGINT) AS max_tokens FROM per),
    f AS (
        SELECT grp, src_tokens,
               CAST(LEAST(4, (max_tokens + src_tokens - 1) // src_tokens)
                    AS BIGINT) AS epochs
        FROM per, m
    )
    SELECT d.doc_id, f.grp AS source, f.epochs,
           CAST(UNNEST(range(1, f.epochs + 1)) AS BIGINT) AS copy_idx
    FROM documents d JOIN f ON d.source IS NOT DISTINCT FROM f.grp
    """,
)
def q70_epoch_upsample(spark, sf_dir):
    docs = _load(spark, sf_dir, "documents")
    return curate.epoch_upsample(docs, max_epochs=4)


# ---------------------------------------------------------------------------
# Temperature-based source rebalancing (mBERT/XLM α-sampling, α=0.5):
# keep rate per source = sqrt(n_min/n_s) in basis points — the smallest
# source kept whole, the head downsampled toward mixture ∝ n^α. sqrt and
# division are IEEE-correctly-rounded, so rates are bit-identical across
# engines (no libm pow in the graded path). Corpus never shuffles: one
# tiny source-count agg, rate dim broadcast back, deterministic hash
# gate (llm/curate.py temperature_sample).
# ---------------------------------------------------------------------------


@query(
    "q109_temperature_sample",
    oracle=f"""
    WITH counts AS (
        SELECT COALESCE(lang, '__null__') AS g, COUNT(*) AS n_source
        FROM documents GROUP BY COALESCE(lang, '__null__')
    ),
    rates AS (
        SELECT g, n_source,
               CAST(FLOOR(10000 * sqrt(
                   CAST((SELECT MIN(n_source) FROM counts) AS DOUBLE)
                   / CAST(n_source AS DOUBLE))) AS BIGINT) AS rate_bp
        FROM counts
    )
    SELECT d.doc_id, d.lang, r.n_source, r.rate_bp
    FROM documents d
    JOIN rates r ON COALESCE(d.lang, '__null__') = r.g
    WHERE {_SQL_HASH64.format(
        s="(COALESCE(d.lang, '__null__') || ':' "
          "|| CAST(d.doc_id AS VARCHAR))")} % 10000
          < r.rate_bp
    """,
)
def q109_temperature_sample(spark, sf_dir):
    # group on lang — the skewed dimension of the corpus (en is ~3.4x
    # fr at sf0.01), so the rebalance actually downsamples the head
    docs = _load(spark, sf_dir, "documents")
    return curate.temperature_sample(docs, alpha=0.5, group_col="lang")


# ---------------------------------------------------------------------------
# Deterministic hash split — reproducible train/val/test assignment that
# is stable under corpus growth (a doc's split depends only on
# (salt, id)). Pure map-side projection: no shuffle, no join — the split
# is computable at scan time for partition layout (llm/curate.py
# hash_split).
# ---------------------------------------------------------------------------


@query(
    "q117_hash_split",
    oracle=f"""
    WITH b AS (
        SELECT doc_id,
               {_SQL_HASH64.format(
                   s="concat_ws(':', 'v1', CAST(doc_id AS VARCHAR))")}
                   % 100 AS bucket
        FROM documents
    )
    SELECT doc_id, bucket,
           CASE WHEN bucket < 80 THEN 'train'
                WHEN bucket < 90 THEN 'val'
                ELSE 'test' END AS split
    FROM b
    """,
)
def q117_hash_split(spark, sf_dir):
    docs = _load(spark, sf_dir, "documents")
    return curate.hash_split(docs)


# ---------------------------------------------------------------------------
# Token-budget corpus selection — "the best N tokens": order by
# (quality desc, id) and keep every doc whose inclusive running token
# total fits the budget. The oracle IS the naive single-window
# formulation; the Spark plan is the two-phase score-class equivalent
# (tiny class-totals frame + broadcast semi-filters; only the one
# boundary class pays a per-doc window) — grading that the scale shape
# selects the identical set (llm/curate.py budget_select).
# ---------------------------------------------------------------------------


@query(
    "q122_budget_select",
    oracle=r"""
    WITH base AS (
        SELECT doc_id,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
               CAST(length(text) AS BIGINT) AS n_chars,
               CAST(len(regexp_extract_all(lower(text), '\b(the|a|of|and)\b'))
                   AS BIGINT) AS stop_hits
        FROM documents
    ), parts AS (
        SELECT doc_id, n_tokens,
               ((n_chars - (n_tokens - 1)) * 100) // n_tokens
                   AS avg_token_len_x100,
               (stop_hits * 10000) // n_tokens AS stopword_ratio_bp,
               (LEAST(n_tokens, 64) * 5000) // 64 AS length_part
        FROM base
    ), scored AS (
        SELECT doc_id, n_tokens,
               CAST(length_part + (LEAST(stopword_ratio_bp * 4, 10000) // 4) +
                    (CASE WHEN avg_token_len_x100 BETWEEN 300 AND 800
                          THEN 2500 ELSE 0 END) AS BIGINT) AS quality_score_bp
        FROM parts
    ), running AS (
        SELECT doc_id, quality_score_bp, n_tokens,
               SUM(n_tokens) OVER (
                   ORDER BY quality_score_bp DESC, doc_id ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS cum_tokens
        FROM scored
    )
    SELECT doc_id, quality_score_bp, n_tokens,
           CAST(cum_tokens AS BIGINT) AS cum_tokens
    FROM running WHERE cum_tokens <= 15000
    """,
)
def q122_budget_select(spark, sf_dir):
    docs = _load(spark, sf_dir, "documents")
    return curate.budget_select(docs, token_budget=15000)



# Shared oracle CTE chain: the UniMax water-fill over per-language token
# totals, parametrized by (budget, max_epochs) — q124 grades it
# directly, q126 through the increment store, q127 through the manifest.
def _sql_unimax(budget: int, max_epochs: int) -> str:
    return f"""
    WITH per_lang AS (
        SELECT COALESCE(lang, '__null__') AS lang,
               CAST(SUM(len(string_split(text, ' '))) AS BIGINT)
                   AS lang_tokens
        FROM documents GROUP BY COALESCE(lang, '__null__')
    ), cap AS (
        SELECT lang, lang_tokens,
               CAST({max_epochs} * lang_tokens AS BIGINT) AS capacity
        FROM per_lang
    ), ranked AS (
        SELECT *,
               CAST(COALESCE(SUM(capacity) OVER (
                   ORDER BY capacity ASC, lang ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS BIGINT) AS cum_before,
               CAST(COUNT(*) OVER (
                   ORDER BY capacity ASC, lang ASC
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
                   AS BIGINT) AS n_left
        FROM cap
    ), flagged AS (
        SELECT *,
               capacity <= (({budget} - cum_before) // n_left) AS capped
        FROM ranked
    ), totals AS (
        SELECT *,
               CAST(SUM(CASE WHEN capped THEN capacity ELSE 0 END)
                    OVER () AS BIGINT) AS capped_total,
               CAST(SUM(CASE WHEN capped THEN 0 ELSE 1 END)
                    OVER () AS BIGINT) AS n_uncapped
        FROM flagged
    ), alloc AS (
        SELECT lang, lang_tokens, capacity, capped,
               CAST(CASE WHEN capped THEN capacity
                    ELSE ({budget} - capped_total) // n_uncapped
                    END AS BIGINT) AS alloc_tokens
        FROM totals
    )
"""


_SQL_UNIMAX_SELECT = """
    SELECT lang, lang_tokens, capacity, alloc_tokens, capped,
           CAST((alloc_tokens * 10000) // lang_tokens AS BIGINT)
               AS epochs_bp
    FROM alloc
"""


# ---------------------------------------------------------------------------
# UniMax budget allocation (Chung et al. 2023) — water-fill a token
# budget across languages, capping each at max_epochs passes. One
# map-side-combined corpus aggregation; the water-fill itself runs on
# the tiny language frame (llm/curate.py unimax_allocate).
# ---------------------------------------------------------------------------


@query(
    "q124_unimax_allocate",
    oracle=_sql_unimax(45000, 2) + _SQL_UNIMAX_SELECT,
)
def q124_unimax_allocate(spark, sf_dir):
    docs = _load(spark, sf_dir, "documents")
    return curate.unimax_allocate(docs, 45000, max_epochs=2)


# ---------------------------------------------------------------------------
# Incremental UniMax — per-language token counts are ADDITIVE deltas
# (the seg-count discipline), so the mixture re-derives exactly from the
# store after every batch: summed deltas → water-fill, no corpus rescan.
# Oracle = the from-scratch q124 formulation over old∪new, grading
# "increment + allocate ≡ rebuild + allocate" (llm/curate.py
# lang_token_counts / unimax_from_counts; streaming/increment.py
# LANG_TOKENS artifact).
# ---------------------------------------------------------------------------


@query(
    "q126_unimax_incremental",
    oracle=_sql_unimax(60000, 3) + _SQL_UNIMAX_SELECT,
)
def q126_unimax_incremental(spark, sf_dir):
    from pyspark.sql import functions as F

    docs = _load(spark, sf_dir, "documents")
    stored = docs.filter(F.col("doc_id") >= 50)
    batch = docs.filter(F.col("doc_id") < 50)
    # the store's read path: per-batch count deltas summed at read
    counts = (curate.lang_token_counts(stored)
              .unionByName(curate.lang_token_counts(batch))
              .groupBy("lang")
              .agg(F.sum("lang_tokens").alias("lang_tokens")))
    return curate.unimax_from_counts(counts, 60000, max_epochs=3)


# ---------------------------------------------------------------------------
# UniMax manifest — the q124 allocation realized as per-document copies:
# full passes + one hash-gated partial pass per language (llm/curate.py
# unimax_manifest). Output-proportional explode; the rate frame
# broadcasts.
# ---------------------------------------------------------------------------


@query(
    "q127_unimax_manifest",
    oracle=_sql_unimax(45000, 2) + f"""
    , rates AS (
        SELECT lang, lang_tokens,
               alloc_tokens // lang_tokens AS full_epochs,
               ((alloc_tokens % lang_tokens) * 10000) // lang_tokens
                   AS part_rate_bp
        FROM alloc
    ), manifest AS (
        SELECT d.doc_id, r.lang,
               CAST(r.full_epochs +
                    (CASE WHEN {_SQL_HASH64.format(
                        s="('unimax-v1:' || r.lang || ':' "
                          "|| CAST(d.doc_id AS VARCHAR))")} % 10000
                          < r.part_rate_bp THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_copies
        FROM documents d
        JOIN rates r ON COALESCE(d.lang, '__null__') = r.lang
    )
    SELECT doc_id, lang, n_copies,
           CAST(u.i + 1 AS BIGINT) AS copy_idx
    FROM manifest, UNNEST(range(0, n_copies)) AS u(i)
    WHERE n_copies >= 1
    """,
)
def q127_unimax_manifest(spark, sf_dir):
    docs = _load(spark, sf_dir, "documents")
    return curate.unimax_manifest(docs, 45000, max_epochs=2)


# ---------------------------------------------------------------------------
# Corpus snapshot diff — per-source added/removed/changed/unchanged
# between two corpus versions via one full-outer join on 32-byte
# fingerprints (llm/curate.py corpus_diff). The query slices the
# documents table into an "old" snapshot (doc_id < 400) and a re-crawl
# "new" snapshot (doc_id ≥ 50, every 7th doc's text re-cased) so all
# four statuses occur.
# ---------------------------------------------------------------------------


@query(
    "q128_corpus_diff",
    oracle="""
    WITH old AS (
        SELECT doc_id, source, md5(text) AS fp, TRUE AS present
        FROM documents WHERE doc_id < 400
    ), new AS (
        SELECT doc_id, source,
               md5(CASE WHEN doc_id % 7 = 0 THEN upper(text)
                        ELSE text END) AS fp, TRUE AS present
        FROM documents WHERE doc_id >= 50
    ), j AS (
        SELECT COALESCE(n.source, o.source) AS source,
               CASE WHEN o.present IS NULL THEN 'added'
                    WHEN n.present IS NULL THEN 'removed'
                    WHEN o.fp IS DISTINCT FROM n.fp THEN 'changed'
                    ELSE 'unchanged' END AS st
        FROM old o FULL OUTER JOIN new n USING (doc_id)
    )
    SELECT source,
           CAST(SUM(CASE WHEN st = 'added' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_added,
           CAST(SUM(CASE WHEN st = 'removed' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_removed,
           CAST(SUM(CASE WHEN st = 'changed' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_changed,
           CAST(SUM(CASE WHEN st = 'unchanged' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_unchanged
    FROM j GROUP BY source
    """,
)
def q128_corpus_diff(spark, sf_dir):
    from pyspark.sql import functions as F

    docs = _load(spark, sf_dir, "documents")
    old = docs.filter(F.col("doc_id") < 400)
    new = (docs.filter(F.col("doc_id") >= 50)
           .withColumn("text",
                       F.when(F.col("doc_id") % 7 == 0,
                              F.upper(F.col("text")))
                       .otherwise(F.col("text"))))
    return curate.corpus_diff(old, new)


# ---------------------------------------------------------------------------
# Distributed global rank → serpentine weight-balanced shards
# (llm/curate.py global_rank / serpentine_shards): global ROW_NUMBER by
# offset recomposition over range partitions — the corpus shuffles once
# and NO stage serializes it through one task (the single-partition
# window runs over the per-partition count frame only, plan-gated).
# ---------------------------------------------------------------------------

_SQL_SERPENTINE = """
    WITH t AS (
        SELECT doc_id,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS tokens
        FROM documents
    ),
    r AS (
        SELECT doc_id, tokens,
               CAST(ROW_NUMBER() OVER (ORDER BY tokens DESC, doc_id)
                    AS BIGINT) AS grank
        FROM t
    ),
    assigned AS (
        SELECT doc_id, tokens, grank,
               CAST(CASE WHEN ((grank - 1) // 8) % 2 = 0
                         THEN (grank - 1) % 8
                         ELSE 7 - ((grank - 1) % 8) END AS INT) AS shard
        FROM r
    )
"""


@query(
    "q135_serpentine_shards",
    oracle=f"""
    {_SQL_SERPENTINE}
    SELECT doc_id, tokens, grank, shard FROM assigned
    """,
)
def q135_serpentine_shards(spark, sf_dir):
    from pyspark.sql import functions as F

    docs = _load(spark, sf_dir, "documents")
    weighted = docs.select(
        "doc_id",
        F.size(F.split(F.col("text"), " ")).cast("bigint").alias("tokens"))
    return curate.serpentine_shards(weighted, 8)


@query(
    "q136_shard_balance",
    oracle=f"""
    {_SQL_SERPENTINE},
    per_shard AS (
        SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(tokens) AS BIGINT) AS w_total
        FROM assigned GROUP BY shard
    )
    SELECT shard, n_docs, w_total,
           CAST((w_total * 10000) // (SELECT SUM(w_total) FROM per_shard)
               AS BIGINT) AS share_bp
    FROM per_shard
    """,
)
def q136_shard_balance(spark, sf_dir):
    from pyspark.sql import functions as F

    docs = _load(spark, sf_dir, "documents")
    weighted = docs.select(
        "doc_id",
        F.size(F.split(F.col("text"), " ")).cast("bigint").alias("tokens"))
    return curate.shard_balance_report(weighted, 8)


# ---------------------------------------------------------------------------
# Token-window chunking — sliding-window training examples
# (llm/curate.py chunk_documents): zero shuffles, output-proportional
# posexplode on the scan's own partitioning (plan-gated: no Exchange).
# ---------------------------------------------------------------------------


@query(
    "q137_chunk_documents",
    oracle="""
    WITH t AS (
        SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ),
    per AS (
        SELECT doc_id, toks, CAST(i AS INT) AS chunk_id,
               CAST(i * 32 AS INT) AS start
        FROM t, UNNEST(range(0, (len(toks) - 1) // 32 + 1)) AS u(i)
    )
    SELECT doc_id, chunk_id,
           CAST(len(toks[start + 1 : start + 64]) AS INT) AS n_tokens,
           md5(array_to_string(toks[start + 1 : start + 64], ' '))
               AS chunk_fp
    FROM per
    """,
)
def q137_chunk_documents(spark, sf_dir):
    docs = _load(spark, sf_dir, "documents")
    return curate.chunk_documents(docs, size=64, stride=32)


# ---------------------------------------------------------------------------
# Chunk-grain exact dedup (llm/curate.py chunk_dedup_report): the
# chunking composition with keep-first fingerprint dedup — one window
# over the 32-byte fingerprint key, rollup back to document grain. The
# query plants true duplicates (every 10th doc re-appears under a
# shifted id) so the dedup path is exercised at every SF.
# ---------------------------------------------------------------------------


@query(
    "q144_chunk_dedup",
    oracle="""
    WITH src AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 10 = 0
    ),
    t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM src),
    per AS (
        SELECT doc_id, CAST(i AS INT) AS chunk_id,
               md5(array_to_string(toks[i*64 + 1 : i*64 + 64], ' ')) AS fp
        FROM t, UNNEST(range(0, (len(toks) - 1) // 64 + 1)) AS u(i)
    ),
    marked AS (
        SELECT doc_id,
               CASE WHEN ROW_NUMBER() OVER (PARTITION BY fp
                        ORDER BY doc_id, chunk_id) = 1
                    THEN 1 ELSE 0 END AS keep
        FROM per
    )
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_chunks,
           CAST(SUM(keep) AS BIGINT) AS kept_chunks,
           CAST((SUM(keep) * 10000) // COUNT(*) AS BIGINT) AS kept_bp
    FROM marked GROUP BY doc_id
    """,
)
def q144_chunk_dedup(spark, sf_dir):
    from pyspark.sql import functions as F

    docs = _load(spark, sf_dir, "documents").select("doc_id", "text")
    planted = docs.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "text")
    return curate.chunk_dedup_report(docs.unionByName(planted), size=64)


# ---------------------------------------------------------------------------
# Deterministic weighted sampling without replacement (llm/curate.py
# weighted_sample): Efraimidis–Spirakis keys u^(1/w) with u drawn from
# the seeded 60-bit hash — reproducible across runs and engines, which
# is what makes the draw GRADEABLE (the q68/q117/q127 sampler
# discipline). Per-language top-k window; no global sort.
# ---------------------------------------------------------------------------


@query(
    "q148_weighted_sample",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, lang,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS tokens
        FROM documents
    ),
    keyed AS (
        SELECT doc_id, lang, tokens,
               ln(({_SQL_HASH64.format(
                   s="'ws:' || CAST(doc_id AS VARCHAR)")} + 1)
                  / 1152921504606846976.0) / tokens AS lnkey
        FROM t WHERE tokens > 0
    )
    SELECT doc_id, lang, tokens, CAST(rk AS INT) AS rk FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY lang
                                     ORDER BY lnkey DESC, doc_id) AS rk
        FROM keyed
    ) WHERE rk <= 20
    """,
)
def q148_weighted_sample(spark, sf_dir):
    from pyspark.sql import functions as F

    docs = _load(spark, sf_dir, "documents")
    weighted = docs.select(
        "doc_id", "lang",
        F.size(F.split(F.col("text"), " ")).cast("bigint").alias("tokens"))
    return curate.weighted_sample(weighted, 20, group_col="lang")


# ---------------------------------------------------------------------------
# Distribution drift — per-source two-sample KS statistic on token
# counts vs the full corpus (llm/curate.py ks_drift): dense
# (value × group) grid over a bounded value domain, per-group running
# sums for the ECDF numerators, corpus ECDF derived per grid row (no
# global window), integer basis-point D.
# ---------------------------------------------------------------------------


@query(
    "q153_ks_drift",
    oracle="""
    WITH counts AS (
        SELECT lang AS grp,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS val,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM documents GROUP BY 1, 2
    ),
    grid AS (
        SELECT v.val, g.grp FROM
            (SELECT DISTINCT val FROM counts) v
            CROSS JOIN (SELECT DISTINCT grp FROM counts) g
    ),
    dense AS (
        SELECT gr.grp, gr.val, COALESCE(c.n, 0) AS n
        FROM grid gr LEFT JOIN counts c
          ON c.grp = gr.grp AND c.val = gr.val
    ),
    cum AS (
        SELECT grp, val, n,
               SUM(n) OVER (PARTITION BY grp ORDER BY val
                            ROWS UNBOUNDED PRECEDING) AS cum_g,
               SUM(n) OVER (PARTITION BY grp) AS n_g
        FROM dense
    ),
    allc AS (
        SELECT *,
               SUM(cum_g) OVER (PARTITION BY val) AS cum_all,
               (SELECT SUM(n) FROM counts) AS n_all
        FROM cum
    )
    SELECT grp AS lang, CAST(MAX(n_g) AS BIGINT) AS n_rows,
           CAST(MAX(ABS(cum_g * 10000 // n_g
                        - cum_all * 10000 // n_all)) AS BIGINT) AS ks_bp
    FROM allc GROUP BY grp
    """,
)
def q153_ks_drift(spark, sf_dir):
    from pyspark.sql import functions as F

    docs = _load(spark, sf_dir, "documents")
    vals = docs.select(
        F.col("lang").alias("source"),
        F.size(F.split(F.col("text"), " ")).cast("bigint").alias("tokens"))
    return (curate.ks_drift(vals, value_col="tokens", group_col="source")
            .withColumnRenamed("source", "lang"))


# ---------------------------------------------------------------------------
# Cross-source quantile calibration (llm/curate.py quantile_calibrate):
# CDF matching of per-source metrics onto the corpus distribution —
# group-partitioned rank windows, corpus CDF on the bounded distinct-
# value frame, densified onto the 10001-slot basis-point grid and
# broadcast back. Integer arithmetic end to end.
# ---------------------------------------------------------------------------


@query(
    "q154_quantile_calibrate",
    oracle="""
    WITH t AS (
        SELECT doc_id, lang,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS tokens
        FROM documents
    ),
    ranked AS (
        SELECT doc_id, lang, tokens,
               (ROW_NUMBER() OVER (PARTITION BY lang
                                   ORDER BY tokens, doc_id) * 10000)
                   // COUNT(*) OVER (PARTITION BY lang) AS src_bp
        FROM t
    ),
    vc AS (SELECT tokens AS v, CAST(COUNT(*) AS BIGINT) AS n
           FROM t GROUP BY tokens),
    vcdf AS (
        SELECT v,
               (SUM(n) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
                * 10000) // (SELECT SUM(n) FROM vc) AS vbp
        FROM vc
    ),
    best AS (SELECT vbp, MAX(v) AS v FROM vcdf GROUP BY vbp),
    grid AS (SELECT CAST(i AS BIGINT) AS bp
             FROM UNNEST(range(0, 10001)) AS u(i)),
    bp_map AS (
        SELECT g.bp,
               COALESCE(MAX(b.v) OVER (ORDER BY g.bp
                                       ROWS UNBOUNDED PRECEDING),
                        (SELECT MIN(v) FROM vcdf)) AS calibrated
        FROM grid g LEFT JOIN best b ON b.vbp = g.bp
    )
    SELECT r.doc_id, r.lang, r.tokens, CAST(r.src_bp AS BIGINT) AS src_bp,
           m.calibrated
    FROM ranked r JOIN bp_map m ON r.src_bp = m.bp
    """,
)
def q154_quantile_calibrate(spark, sf_dir):
    from pyspark.sql import functions as F

    docs = _load(spark, sf_dir, "documents")
    vals = docs.select(
        "doc_id", F.col("lang").alias("source"),
        F.size(F.split(F.col("text"), " ")).cast("bigint").alias("tokens"))
    return (curate.quantile_calibrate(vals, value_col="tokens",
                                      group_col="source")
            .withColumnRenamed("source", "lang"))


# ---------------------------------------------------------------------------
# Incremental shard assignment (llm/curate.py
# serpentine_shards_incremental): the q135 serving half — the batch
# ranks internally and deals serpentine onto shards ordered by STORED
# load ascending (heaviest new doc → lightest shard); the stored
# corpus is never re-dealt. Stored totals derive from the q135 batch
# assignment of the old docs; the oracle replicates both stages.
# ---------------------------------------------------------------------------


@query(
    "q156_shards_incremental",
    oracle="""
    WITH t AS (
        SELECT doc_id,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS tokens
        FROM documents
    ),
    oldr AS (
        SELECT tokens,
               ROW_NUMBER() OVER (ORDER BY tokens DESC, doc_id) AS grank
        FROM t WHERE doc_id % 10 <> 0
    ),
    olda AS (
        SELECT tokens,
               CASE WHEN ((grank - 1) // 8) % 2 = 0
                    THEN (grank - 1) % 8
                    ELSE 7 - ((grank - 1) % 8) END AS shard
        FROM oldr
    ),
    totals AS (
        SELECT shard, CAST(SUM(tokens) AS BIGINT) AS w_total
        FROM olda GROUP BY shard
    ),
    pos AS (
        SELECT shard,
               CAST(ROW_NUMBER() OVER (ORDER BY w_total ASC, shard ASC)
                    - 1 AS BIGINT) AS p
        FROM totals
    ),
    newr AS (
        SELECT doc_id, tokens,
               CAST(ROW_NUMBER() OVER (ORDER BY tokens DESC, doc_id)
                    AS BIGINT) AS grank
        FROM t WHERE doc_id % 10 = 0
    ),
    newa AS (
        SELECT doc_id, tokens, grank,
               CAST(CASE WHEN ((grank - 1) // 8) % 2 = 0
                         THEN (grank - 1) % 8
                         ELSE 7 - ((grank - 1) % 8) END AS BIGINT) AS p
        FROM newr
    )
    SELECT n.doc_id, n.tokens, n.grank, CAST(po.shard AS INT) AS shard
    FROM newa n JOIN pos po USING (p)
    """,
)
def q156_shards_incremental(spark, sf_dir):
    from pyspark.sql import functions as F

    docs = _load(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id",
        F.size(F.split(F.col("text"), " ")).cast("bigint").alias("tokens"))
    old = t.filter(F.col("doc_id") % 10 != 0)
    stored_totals = (curate.serpentine_shards(old, 8)
                     .groupBy("shard")
                     .agg(F.sum("tokens").cast("bigint").alias("w_total"))
                     .select(F.col("shard").cast("int").alias("shard"),
                             "w_total"))
    batch = t.filter(F.col("doc_id") % 10 == 0)
    return curate.serpentine_shards_incremental(
        stored_totals, batch, 8).select(
        "doc_id", "tokens", "grank", F.col("shard").cast("int"))
