"""Data-selection operators (llm/select.py): semantic unit tests on
hand-built frames plus physical-plan promises for the graded queries
(q75–q77). Oracle parity at sf0.01 is covered by test_oracle_parity.py;
randomized-corpus parity by test_fuzz_parity.py."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from pyspark.sql import functions as F

import vulnerablecode_spark.plans.select  # noqa: F401 — registers q75–q77
from vulnerablecode_spark.llm import select
from vulnerablecode_spark.plans import QUERIES

from tests.conftest import SF_SMOKE


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string"
    )


def _plan(spark, name):
    df = QUERIES[name](spark, SF_SMOKE)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


class TestDsirImportance:
    def test_target_lookalike_scores_higher(self, spark):
        # target talks about "spark sql", raw doc 1 does too, raw doc 2
        # talks about something disjoint — doc 1 must out-score doc 2.
        docs = _docs(spark, [
            (1, "spark sql query plan spark sql", "en", "tgt"),
            (2, "spark sql plan spark", "en", "raw"),
            (3, "banana kiwi mango papaya", "en", "raw"),
        ])
        out = {
            r.doc_id: r.importance_bp
            for r in select.dsir_importance(
                docs, target=F.col("source") == "tgt", n_buckets=64
            ).collect()
        }
        assert set(out) == {2, 3}  # target docs are never scored
        assert out[2] > out[3]

    def test_empty_target_is_smoothed_uniform(self, spark):
        # no target docs → every bucket lift is the same smoothed
        # constant, so every doc's mean lift is that constant
        docs = _docs(spark, [
            (1, "a b c", "en", "raw"),
            (2, "d e f g", "en", "raw"),
        ])
        out = select.dsir_importance(
            docs, target=F.col("source") == "tgt", n_buckets=16
        ).collect()
        assert len(out) == 2
        assert len({r.importance_bp for r in out}) == 1

    def test_dense_model_scores_novel_documents(self, spark):
        # the stored model must be total over the hash range: a document
        # whose tokens never appeared in the fit corpus still gets a row,
        # carrying the smoothed default lift (t_cnt=0, r_cnt=0)
        nb = 32
        fit = _docs(spark, [
            (1, "spark sql plan", "en", "tgt"),
            (2, "banana kiwi mango", "en", "raw"),
        ])
        lifts = select.dsir_bucket_lifts(
            fit, target=F.col("source") == "tgt", n_buckets=nb)
        assert lifts.count() == nb  # dense: every bucket has a row
        novel = _docs(spark, [(9, "zqxwv qqqzz", "en", "raw")])
        out = select.dsir_score(novel, lifts, n_buckets=nb).collect()
        assert len(out) == 1 and out[0].n_tok == 2
        # both fit sides have 3 tokens → default lift for unseen buckets
        expected = (0 + 1) * (3 + nb) * 10000 // ((0 + 1) * (3 + nb))
        assert out[0].importance_bp == expected

    def test_n_tok_matches_split(self, spark):
        docs = _docs(spark, [(1, "x y z", "en", "raw"),
                             (2, "x", "en", "tgt")])
        row = select.dsir_importance(
            docs, target=F.col("source") == "tgt"
        ).collect()[0]
        assert row.doc_id == 1 and row.n_tok == 3


class TestSurprisalPartition:
    def test_rare_tokens_land_in_tail(self, spark):
        # 6 docs per lang: three of common tokens, three of singletons —
        # the singleton docs must occupy the higher tiers
        rows = []
        for i in range(3):
            rows.append((i, "common common common", "en", "s"))
        for i in range(3, 6):
            rows.append((i, f"rare{i}a rare{i}b rare{i}c", "en", "s"))
        out = {r.doc_id: r for r in
               select.surprisal_partition(
                   _docs(spark, rows), n_parts=2).collect()}
        common_tiers = {out[i].tier for i in range(3)}
        rare_tiers = {out[i].tier for i in range(3, 6)}
        assert max(common_tiers) < min(rare_tiers)
        assert all(out[i].surprisal_bp < out[j].surprisal_bp
                   for i in range(3) for j in range(3, 6))

    def test_tiers_are_per_language_and_balanced(self, spark):
        rows = [(i, f"w{i % 4} w{i % 4} filler{i}", "en" if i < 9 else "fr",
                 "s") for i in range(18)]
        out = select.surprisal_partition(_docs(spark, rows), n_parts=3)
        sizes = {(r.lang, r.tier): r.n for r in
                 out.groupBy("lang", "tier").agg(
                     F.count("*").alias("n")).collect()}
        # NTILE balance: 9 docs per lang → 3 per tier
        assert all(v == 3 for v in sizes.values()) and len(sizes) == 6


class TestPackingEfficiency:
    def test_packed_never_worse_than_naive(self, spark):
        rows = [(i, " ".join(["t"] * (7 + i)), "en", f"s{i % 3}")
                for i in range(12)]
        for r in select.packing_efficiency(
                _docs(spark, rows), seq_len=16).collect():
            assert r.packed_seqs <= r.naive_seqs
            assert r.packed_util_bp >= r.naive_util_bp
            assert 0 < r.naive_util_bp <= 10000
            assert r.naive_pad_tokens == r.naive_seqs * 16 - r.stream_tokens

    def test_exact_arithmetic_single_stream(self, spark):
        # 3 docs of 10 tokens, L=8: naive ceil(10/8)=2 each → 6 seqs,
        # packed ceil(30/8)=4 seqs
        rows = [(i, " ".join(["t"] * 10), "en", "s") for i in range(3)]
        r = select.packing_efficiency(
            _docs(spark, rows), seq_len=8).collect()[0]
        assert (r.n_docs, r.stream_tokens, r.naive_seqs, r.packed_seqs) == \
            (3, 30, 6, 4)
        assert r.naive_pad_tokens == 18
        assert r.naive_util_bp == 30 * 10000 // 48
        assert r.packed_util_bp == 30 * 10000 // 32


class TestSelectPlanQuality:
    # NB: the 1-row totals frame joins via BroadcastNestedLoopJoin over a
    # single broadcast row (the same accepted shape as q69/q70 — see
    # test_curate.py); the corpus-sized joins must be hash joins.

    def test_q75_broadcasts_bucket_dim_no_cartesian(self, spark):
        plan = _plan(spark, "q75_dsir_importance")
        assert "BroadcastHashJoin" in plan  # bucket-dim join
        assert "CartesianProduct" not in plan

    def test_q76_joins_on_term_key_no_cartesian(self, spark):
        plan = _plan(spark, "q76_surprisal_partition")
        assert "CartesianProduct" not in plan
        assert "Window" in plan  # the per-language NTILE stage

    def test_q77_is_single_aggregation_no_join(self, spark):
        plan = _plan(spark, "q77_packing_efficiency")
        assert "Join" not in plan
        # one shuffle for the stream-key aggregate (+ AQE reads)
        assert plan.count("Exchange") <= 2


class TestStupidBackoff:
    def test_leave_one_out_separates_formulaic_from_novel(self, spark):
        # docs 1/2 share the "new york" continuation, so each is
        # predictable from the other; doc 3's transitions exist nowhere
        # else in the corpus → leave-one-out scores them 0
        docs = _docs(spark, [
            (1, "new york new york new york", "en", "s"),
            (2, "new york is big", "en", "s"),
            (3, "zebra quantum pickle", "en", "s"),
        ])
        out = {r.doc_id: r for r in
               select.stupid_backoff_score(docs).collect()}
        assert out[1].fluency_bp > out[3].fluency_bp
        assert out[3].fluency_bp == 0  # fully novel under LOO
        assert out[1].n_bigrams == 5 and out[3].n_bigrams == 2

    def test_single_token_docs_have_no_row(self, spark):
        docs = _docs(spark, [(1, "only", "en", "s"),
                             (2, "two words", "en", "s")])
        out = select.stupid_backoff_score(docs).collect()
        assert {r.doc_id for r in out} == {2}

    def test_exact_loo_arithmetic(self, spark):
        # corpus: doc1 "a b a b", doc2 "a c"; T=6
        # doc1 (a,b)×2: c12-d12=0 → backoff, c(b)-d(b)=0 → 0
        # doc1 (b,a)×1: c12-d12=0 → backoff: (c(a)-d(a))=1, T-n=2
        #   → 4000*(1*10000//2)//10000 = 2000
        # weighted mean: (2*0 + 1*2000)//3 = 666
        docs = _docs(spark, [(1, "a b a b", "en", "s"),
                             (2, "a c", "en", "s")])
        out = {r.doc_id: r.fluency_bp for r in
               select.stupid_backoff_score(docs).collect()}
        assert out[1] == 666
        assert out[2] == 0  # (a,c) exists only in doc2

    def test_shared_phrase_hits_seen_branch(self, spark):
        # (x,y) occurs in BOTH docs: LOO seen-branch gives each
        # (c12-d12)/(c1-d1) = 1/1 = 10000 for that bigram
        docs = _docs(spark, [(1, "x y z", "en", "s"),
                             (2, "x y w", "en", "s")])
        out = {r.doc_id: r.fluency_bp for r in
               select.stupid_backoff_score(docs).collect()}
        # per doc: bigrams (x,y)=10000 and (y,·)=0 → mean 5000
        assert out[1] == 5000 and out[2] == 5000
