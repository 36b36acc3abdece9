"""Randomized Spark↔DuckDB parity: the oracle gate re-run over RANDOM
synthetic tables instead of the driver's fixed dataset.

The fixed-corpus gate proves each query once; this harness proves the
ENGINE-DETERMINISM argument — md5-derived hashing, integer micro-unit
arithmetic, fixed-point means, rounded cosines — on data the queries
were never tuned against. Float-boundary divergences (the q13-style
decimal-half hazards) are data-dependent, so random vectors/documents
are exactly where they would surface.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

import vulnerablecode_spark.plans.coverage  # noqa: F401 — registers queries
import vulnerablecode_spark.plans.curate  # noqa: F401
import vulnerablecode_spark.plans.entity  # noqa: F401
import vulnerablecode_spark.plans.llm  # noqa: F401
import vulnerablecode_spark.plans.relational  # noqa: F401
import vulnerablecode_spark.plans.select  # noqa: F401
from vulnerablecode_spark.testing import compare_query

# queries reading ONLY the documents table
DOC_QUERIES = [
    "q23_exact_dedup", "q24_ngram_jaccard", "q25_minhash_lsh",
    "q26_simhash", "q27_lang_id", "q28_quality_score", "q29_token_count",
    "q57_decontamination", "q58_char_trigram_diversity",
    "q59_feature_hashing", "q60_near_dup_dedup",
    "q63_incremental_near_dup",
    # curation family — integer div / window cumsum / hash-gate arithmetic
    # on corpora with random token multiplicity and stratum sizes
    "q66_stopword_strip", "q67_sequence_packing", "q68_stratified_sample",
    "q69_distinctive_terms", "q70_epoch_upsample",
    # the scrub runs for real here: the generator plants emails / IPs /
    # card numbers / hex keys (the driver corpus has none)
    "q71_pii_redaction",
    # planted near-dups differ by 1-2 tokens → real maximal shared runs
    "q72_exact_substrings",
    # planted near-dups form multi-doc clusters → the cluster-atomic
    # split gate is load-bearing
    "q73_leakage_safe_splits",
    # random token multiplicity exercises the top-k tie-break totally
    "q74_bpe_merge_stats",
    # selection family — the generator's 'src0' source makes the DSIR
    # target side non-empty, so bucket lifts exercise both branches
    "q75_dsir_importance", "q76_surprisal_partition",
    "q77_packing_efficiency",
    # composed pipeline: the planted near-dup clusters make the dup gate
    # load-bearing, and planted PII docs skew quality scores both ways
    "q78_curation_pipeline",
    # planted near-dup chains make multi-size clusters
    "q79_cluster_size_histogram",
    # random bigram multiplicity exercises the count-ratio arithmetic
    "q80_stupid_backoff_lm",
    # round-11 families — sketches on random token distributions (the
    # KMV estimator and histogram read-off run on hash/count patterns
    # the fixed corpus never produces), rank-stat arithmetic on random
    # tie structure, ln-quantization on random byte mixes
    "q160_kmv_cardinality", "q161_kmv_merge_incremental",
    "q162_kmv_jaccard_matrix", "q165_doremi_weights", "q166_auc_eval",
    "q167_histogram_quantiles", "q168_kmv_containment",
    "q169_edit_similarity", "q170_triangle_counts",
    "q171_skipgram_pmi", "q172_histogram_incremental",
    "q173_payload_entropy", "q174_zipf_slope", "q175_byte_tv_drift", "q176_entropy_rate",
    # round-12 corpus-health family — double-ratio ln args with random
    # count structure (JS), within-doc dup structure from the planted
    # near-dups (repetition/diversity), regression sums on random
    # per-doc (tokens, types) points (Heaps), register bit-arithmetic
    # on random hash populations (HLL), rank-1/rank-2 counts on random
    # multiplicity (Good-Turing/Simpson), top-k tie-breaks (burstiness)
    "q177_js_divergence", "q178_gopher_repetition",
    "q179_distinct_ngrams", "q180_term_burstiness", "q181_heaps_law",
    "q182_hll_estimate", "q183_good_turing", "q184_simpson_index",
]
# queries reading ONLY the embeddings table — the float-heavy family
EMB_QUERIES = [
    "q30_embedding_topk", "q31_embedding_ann_lsh", "q46_ann_topk_ivf",
    "q47_embedding_near_dup", "q56_ann_topk_pq", "q64_ann_topk_ivf_pq",
    "q65_semantic_dedup",
    # round-11: margin arithmetic on full-precision random cosines,
    # centroid-trick quantization on random unit vectors
    "q163_bitext_margin", "q164_embedding_dispersion",
]


def _write_documents(path, seed: int, n_docs: int = 120) -> None:
    rng = np.random.default_rng(seed)
    vocab = np.array([f"w{i}" for i in range(60)]
                     + ["the", "a", "of", "and", "le", "der"])
    texts = []
    for i in range(n_docs):
        if texts and rng.random() < 0.3:  # plant near-dups
            toks = texts[int(rng.integers(len(texts)))].split(" ")
            for _ in range(int(rng.integers(1, 3))):
                toks[int(rng.integers(len(toks)))] = str(rng.choice(vocab))
            texts.append(" ".join(toks))
        else:
            toks = list(rng.choice(vocab, size=int(rng.integers(4, 40))))
            if rng.random() < 0.3:  # plant PII for the redaction family
                toks.extend(rng.choice([
                    f"user{i}@example.com", f"10.0.{i % 256}.1",
                    "4111222233334444", "0123456789abcdef" * 2,
                ], size=int(rng.integers(1, 3))))
            texts.append(" ".join(toks))
    pd.DataFrame({
        "doc_id": np.arange(n_docs, dtype=np.int64),
        "text": texts,
        "lang": rng.choice(["en", "fr", "de"], size=n_docs),
        "source": rng.choice(["web", "src0", "paper"], size=n_docs),
        "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
    }).to_parquet(f"{path}/documents.parquet")


def _write_embeddings(path, seed: int, n_vecs: int = 150) -> None:
    rng = np.random.default_rng(seed)
    # clustered + noise: realistic for ANN paths, and full-precision
    # floats (not rounded) so engine arithmetic runs on worst-case ulps
    centers = rng.normal(size=(6, 64)).astype(np.float32)
    mat = (centers[rng.integers(0, 6, size=n_vecs)]
           + rng.normal(scale=0.3, size=(n_vecs, 64)).astype(np.float32))
    pd.DataFrame({
        "vec_id": np.arange(n_vecs, dtype=np.int64),
        "embedding": [row.astype(np.float32) for row in mat],
        "label": rng.integers(0, 6, size=n_vecs).astype(np.int32),
    }).to_parquet(f"{path}/embeddings.parquet")


@pytest.mark.parametrize("seed", [101, 202, 303])
def test_document_queries_match_oracle_on_random_corpora(
        spark, tmp_path, seed):
    d = tmp_path / f"fuzz_docs_{seed}"
    d.mkdir()
    _write_documents(d, seed)
    for name in DOC_QUERIES:
        ok, detail = compare_query(spark, name, str(d))
        assert ok, f"{name} seed={seed}: {detail}"


@pytest.mark.parametrize("seed", [111, 222, 333])
def test_embedding_queries_match_oracle_on_random_vectors(
        spark, tmp_path, seed):
    d = tmp_path / f"fuzz_emb_{seed}"
    d.mkdir()
    _write_embeddings(d, seed)
    for name in EMB_QUERIES:
        ok, detail = compare_query(spark, name, str(d))
        assert ok, f"{name} seed={seed}: {detail}"


def test_stratified_sample_parity_on_null_strata(spark, tmp_path):
    """Dirty-data cross-engine check the random generator doesn't cover:
    NULL stratum values must gate identically on both engines (the Spark
    gate coalesces explicitly; concat_ws's silent NULL-skip and SQL's
    NULL-propagating || would each diverge)."""
    import numpy as np
    import pandas as pd

    d = tmp_path / "nulls"
    d.mkdir()
    rng = np.random.default_rng(7)
    langs = [None if i % 3 == 0 else ("en" if i % 2 else "fr")
             for i in range(90)]
    pd.DataFrame({
        "doc_id": np.arange(90, dtype=np.int64),
        "text": ["w a b" for _ in range(90)],
        "lang": langs,
        "source": rng.choice(["web", None, "paper"], size=90),
        "n_chars": np.int64(5),
    }).to_parquet(f"{d}/documents.parquet")
    ok, detail = compare_query(spark, "q68_stratified_sample", str(d))
    assert ok, detail
