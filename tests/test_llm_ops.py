"""LLM operator tests beyond the oracle gate: ANN recall vs brute force,
dedup behavior on engineered near-duplicates."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def embeddings(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


class TestAnn:
    def test_ivf_recall_vs_bruteforce(self, spark, embeddings):
        from vulnerablecode_spark.llm.similarity import ann_topk_ivf, cosine_topk

        queries = embeddings.filter(F.col("vec_id") < 20)
        exact = cosine_topk(embeddings, queries, k=5)
        approx = ann_topk_ivf(embeddings, queries, k=5, n_cells=16, nprobe=8)
        e = {(r.query_id, r.neighbor_id) for r in exact.collect()}
        a = {(r.query_id, r.neighbor_id) for r in approx.collect()}
        recall = len(e & a) / len(e)
        # nprobe=8 of 16 cells must recover most true neighbors
        assert recall >= 0.6, f"IVF recall too low: {recall}"

    def test_ivf_candidate_reduction(self, spark, embeddings):
        from vulnerablecode_spark.llm.similarity import ivf_index

        _, assigned = ivf_index(embeddings, n_cells=16)
        sizes = assigned.groupBy("cell").count().collect()
        assert len(sizes) <= 16
        assert sum(r["count"] for r in sizes) == embeddings.count()


class TestNearDupEngineered:
    def test_minhash_finds_planted_near_dup(self, spark):
        from vulnerablecode_spark.llm.dedup import (lsh_candidate_pairs,
                                                    ngram_jaccard_pairs)

        docs = spark.read.parquet(f"{SF}/documents.parquet")
        base = docs.filter(F.col("doc_id") == 0).first().text
        # plant a near-duplicate of doc 0 (append two words)
        planted = spark.createDataFrame(
            [(100000, base + " extra token", "en", "srcX", len(base) + 12)],
            "doc_id bigint, text string, lang string, source string, n_chars bigint",
        )
        corpus = docs.unionByName(planted)
        pairs = {(r.doc_a, r.doc_b) for r in lsh_candidate_pairs(corpus).collect()}
        assert (0, 100000) in pairs
        jac = ngram_jaccard_pairs(corpus, threshold=0.8)
        match = jac.filter((F.col("doc_a") == 0) & (F.col("doc_b") == 100000))
        assert match.count() == 1

    def test_simhash_close_for_near_dup(self, spark):
        from vulnerablecode_spark.llm.dedup import simhash

        docs = spark.read.parquet(f"{SF}/documents.parquet")
        base = docs.filter(F.col("doc_id") == 0).first().text
        planted = spark.createDataFrame(
            [(100000, base + " extra", "en", "srcX", len(base) + 6)],
            "doc_id bigint, text string, lang string, source string, n_chars bigint",
        )
        sigs = {r.doc_id: r.simhash for r in
                simhash(docs.unionByName(planted)).collect()}
        ham = bin(sigs[0] ^ sigs[100000]).count("1")
        assert ham <= 6, f"near-dup hamming distance too large: {ham}"


class TestNearDupComposition:
    def test_lsh_verified_matches_exact_on_planted_dup(self, spark):
        from vulnerablecode_spark.llm.dedup import (near_dup_pairs,
                                                    ngram_jaccard_pairs)

        docs = spark.read.parquet(f"{SF}/documents.parquet")
        base = docs.filter(F.col("doc_id") == 0).first().text
        planted = spark.createDataFrame(
            [(100000, base + " extra token", "en", "srcX", len(base) + 12)],
            "doc_id bigint, text string, lang string, source string, n_chars bigint",
        )
        corpus = docs.unionByName(planted)
        fast = {(r.doc_a, r.doc_b): r.jaccard
                for r in near_dup_pairs(corpus, threshold=0.8).collect()}
        exact = {(r.doc_a, r.doc_b): r.jaccard
                 for r in ngram_jaccard_pairs(corpus, threshold=0.8).collect()}
        # the planted pair must appear in both with the same score
        assert (0, 100000) in fast
        assert fast[(0, 100000)] == exact[(0, 100000)]
        # the composition never invents pairs the exact pass wouldn't
        assert set(fast) <= set(exact)
