"""Unit tests for the round-11 operator families: KMV bottom-k sketches
(llm/sketch.py), margin-based bitext mining and centroid-trick dispersion
(llm/similarity.py), DoReMi-style domain reweighting (llm/curate.py) and
exact rank-based AUC (llm/classify.py)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from vulnerablecode_spark.llm import sketch
from vulnerablecode_spark.llm.classify import auc_rank_eval
from vulnerablecode_spark.llm.curate import domain_excess_weights
from vulnerablecode_spark.llm.similarity import (bitext_margin_mining,
                                                 embedding_dispersion)


def _tok_df(spark, rows):
    return spark.createDataFrame(rows, "source string, tok string")


class TestKMV:
    def test_merge_equals_from_scratch(self, spark):
        rows = [("s", f"t{i}") for i in range(300)]
        full = _tok_df(spark, rows)
        a = _tok_df(spark, rows[:180])
        b = _tok_df(spark, rows[150:])  # overlapping batches
        k = 32
        direct = sketch.kmv_sketch(full, F.col("tok"), k=k)
        merged = sketch.kmv_merge(sketch.kmv_sketch(a, F.col("tok"), k=k),
                                  sketch.kmv_sketch(b, F.col("tok"), k=k),
                                  k=k)
        d = {r.h for r in direct.collect()}
        m = {r.h for r in merged.collect()}
        assert d == m and len(d) == k

    def test_small_group_short_circuit_is_exact(self, spark):
        df = _tok_df(spark, [("s", f"t{i}") for i in range(10)])
        est = sketch.kmv_estimate(
            sketch.kmv_sketch(df, F.col("tok"), k=64), 64).collect()
        assert est[0].est_distinct == 10

    def test_estimate_within_sampling_error(self, spark):
        n = 2000
        df = _tok_df(spark, [("s", f"t{i}") for i in range(n)])
        est = sketch.kmv_estimate(
            sketch.kmv_sketch(df, F.col("tok"), k=128), 128).collect()
        # KMV relative error ~ 1/sqrt(k-2) ≈ 9%; allow 3σ
        assert abs(est[0].est_distinct - n) / n < 0.27

    def test_jaccard_identical_and_disjoint(self, spark):
        same = [(s, f"t{i}") for i in range(200) for s in ("a", "b")]
        disj = [("c", f"x{i}") for i in range(200)]
        sk = sketch.kmv_sketch(_tok_df(spark, same + disj),
                               F.col("tok"), k=64)
        rows = {(r.src_a, r.src_b): r for r in
                sketch.kmv_jaccard_matrix(sk, k=64).collect()}
        assert rows[("a", "b")].jaccard_bp == 10000
        assert rows[("a", "c")].jaccard_bp == 0
        assert rows[("b", "c")].jaccard_bp == 0

    def test_k_must_be_sane(self, spark):
        df = _tok_df(spark, [("s", "t")])
        with pytest.raises(ValueError):
            sketch.kmv_sketch(df, F.col("tok"), k=1)


def _emb_df(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


class TestBitextMargin:
    def test_reciprocal_pair_beats_hub(self, spark):
        # b0 is a hub: moderately close to EVERY a; (a1, b1) is an
        # isolated reciprocal pair. Margin must rank (a1, b1) above any
        # hub match even though raw cosines are comparable.
        a = _emb_df(spark, [
            (0, [1.0, 0.2, 0.0, 0.0]),
            (2, [0.2, 0.0, 1.0, 0.0]),
            (4, [0.0, 0.2, 0.0, 1.0]),
            (6, [0.5, 0.5, 0.5, 0.1]),
        ])
        b = _emb_df(spark, [
            (1, [0.5, 0.5, 0.5, 0.0]),   # hub, near everything
            (3, [0.0, 0.19, 0.0, 0.98]),  # a4's reciprocal partner
            (5, [-1.0, 0.1, 0.0, 0.0]),
        ])
        res = {r.id_a: r for r in
               bitext_margin_mining(a, b, k=2).collect()}
        # a4's best is its true partner b3 and its margin beats the
        # hub-matched rows
        assert res[4].id_b == 3
        hub_margins = [r.margin_bp for i, r in res.items() if r.id_b == 1]
        assert hub_margins and res[4].margin_bp > max(hub_margins)

    def test_nonpositive_matches_excluded(self, spark):
        a = _emb_df(spark, [(0, [1.0, 0.0])])
        b = _emb_df(spark, [(1, [-1.0, 0.0])])
        assert bitext_margin_mining(a, b, k=1).count() == 0


class TestDispersion:
    def test_identical_vectors_cohere(self, spark):
        df = spark.createDataFrame(
            [(i, 7, [3.0, 4.0, 0.0]) for i in range(5)],
            "vec_id long, label int, embedding array<double>")
        row = embedding_dispersion(df).collect()[0]
        assert row.n == 5
        assert 999_000 <= row.mean_pair_cos_e6 <= 1_000_000

    def test_orthogonal_pair_near_zero(self, spark):
        df = spark.createDataFrame(
            [(0, 1, [1.0, 0.0]), (1, 1, [0.0, 1.0])],
            "vec_id long, label int, embedding array<double>")
        row = embedding_dispersion(df).collect()[0]
        assert abs(row.mean_pair_cos_e6) <= 2  # quantization only

    def test_singleton_and_zero_norm_excluded(self, spark):
        df = spark.createDataFrame(
            [(0, 1, [1.0, 0.0]), (1, 2, [0.0, 0.0])],
            "vec_id long, label int, embedding array<double>")
        assert embedding_dispersion(df).count() == 0


class TestDomainWeights:
    def test_below_mean_domain_takes_excess(self, spark):
        df = spark.createDataFrame(
            [("good", 8000), ("good", 8000), ("bad", 2000), ("bad", 2000)],
            "source string, lm_score_bp long")
        rows = {r.source: r for r in domain_excess_weights(df).collect()}
        assert rows["good"].excess_bp == 0 and rows["good"].weight_bp == 0
        assert rows["bad"].excess_bp == 3000  # mean 5000 - 2000
        assert rows["bad"].weight_bp == 10000

    def test_uniform_corpus_all_zero(self, spark):
        df = spark.createDataFrame(
            [("a", 5000), ("b", 5000)], "source string, lm_score_bp long")
        assert all(r.weight_bp == 0
                   for r in domain_excess_weights(df).collect())

    def test_weights_sum_to_at_most_10000(self, spark):
        df = spark.createDataFrame(
            [("a", 1000), ("b", 4000), ("c", 9000), ("c", 9500)],
            "source string, lm_score_bp long")
        total = sum(r.weight_bp for r in domain_excess_weights(df).collect())
        assert 9998 <= total <= 10000  # integer-div remainder only


class TestAUC:
    def _eval(self, spark, rows):
        df = spark.createDataFrame(rows, "source string, score long, y int")
        return {r.source: r for r in
                auc_rank_eval(df, score_col="score", label_col="y").collect()}

    def test_perfect_separation(self, spark):
        rows = ([("s", 10 + i, 1) for i in range(5)]
                + [("s", i, 0) for i in range(5)])
        assert self._eval(spark, rows)["s"].auc_bp == 10000

    def test_reversed_is_zero(self, spark):
        rows = ([("s", i, 1) for i in range(5)]
                + [("s", 10 + i, 0) for i in range(5)])
        assert self._eval(spark, rows)["s"].auc_bp == 0

    def test_all_tied_is_half(self, spark):
        rows = [("s", 7, 1)] * 4 + [("s", 7, 0)] * 6
        assert self._eval(spark, rows)["s"].auc_bp == 5000

    def test_known_hand_value(self, spark):
        # scores: pos {3, 1}, neg {2, 1} → pairs: (3>2)+(3>1)+(1<2 no)
        # +(1=1 half) = 2.5 / 4 = 0.625
        rows = [("s", 3, 1), ("s", 1, 1), ("s", 2, 0), ("s", 1, 0)]
        assert self._eval(spark, rows)["s"].auc_bp == 6250

    def test_single_class_group_excluded(self, spark):
        rows = [("only_pos", 5, 1), ("only_pos", 6, 1),
                ("both", 5, 1), ("both", 4, 0)]
        res = self._eval(spark, rows)
        assert "only_pos" not in res and res["both"].auc_bp == 10000


class TestHistogramSketch:
    def _vals(self, spark, rows):
        return spark.createDataFrame(rows, "source string, v long")

    def test_clamping_into_edge_bins(self, spark):
        df = self._vals(spark, [("s", -50), ("s", 0), ("s", 5000)])
        h = {r.bin: r.c for r in sketch.histogram_sketch(
            df, F.col("v"), n_bins=8, lo=0, hi=80).collect()}
        assert h[0] == 2 and h[7] == 1  # below-range clamps to 0, above to last

    def test_cellwise_additivity(self, spark):
        rows = [("s", i * 13 % 200) for i in range(100)]
        a, b = rows[:60], rows[60:]
        def hist(rs):
            return {(r.source, r.bin): r.c for r in sketch.histogram_sketch(
                self._vals(spark, rs), F.col("v"),
                n_bins=16, lo=0, hi=160).collect()}
        ha, hb, hf = hist(a), hist(b), hist(rows)
        merged = {k: ha.get(k, 0) + hb.get(k, 0) for k in set(ha) | set(hb)}
        assert merged == hf

    def test_quantile_readoff_uniform(self, spark):
        # values 0..99 into 10 bins of width 10: p50 lands in bin 4
        # (cum 50 at value 49), upper edge 50; p99 in bin 9, edge 100
        df = self._vals(spark, [("s", i) for i in range(100)])
        h = sketch.histogram_sketch(df, F.col("v"), n_bins=10, lo=0, hi=100)
        q = {r.probe_pct: r.sketch_q for r in sketch.histogram_quantiles(
            h, probes=(50, 99), n_bins=10, lo=0, hi=100).collect()}
        assert q[50] == 50 and q[99] == 100

    def test_invalid_params(self, spark):
        df = self._vals(spark, [("s", 1)])
        with pytest.raises(ValueError):
            sketch.histogram_sketch(df, F.col("v"), n_bins=1, lo=0, hi=10)
        with pytest.raises(ValueError):
            sketch.histogram_sketch(df, F.col("v"), n_bins=8, lo=10, hi=10)


class TestContainment:
    def test_subset_source_fully_contained(self, spark):
        big = [("big", f"t{i}") for i in range(300)]
        sub = [("sub", f"t{i}") for i in range(40)]  # strict subset
        sk = sketch.kmv_sketch(_tok_df(spark, big + sub),
                               F.col("tok"), k=64)
        rows = {(r.src_a, r.src_b): r for r in
                sketch.kmv_containment_matrix(sk, k=64).collect()}
        # every sub-hash in the union bottom-k is also a big-hash
        assert rows[("sub", "big")].containment_bp == 10000
        # big is NOT contained in sub
        assert rows[("big", "sub")].containment_bp < 5000

    def test_disjoint_sources_zero(self, spark):
        sk = sketch.kmv_sketch(
            _tok_df(spark, [("a", f"x{i}") for i in range(100)]
                    + [("b", f"y{i}") for i in range(100)]),
            F.col("tok"), k=32)
        rows = sketch.kmv_containment_matrix(sk, k=32).collect()
        assert rows and all(r.containment_bp == 0 for r in rows)


class TestEditSimilarity:
    def test_known_pairs(self, spark):
        from vulnerablecode_spark.llm.dedup import edit_similarity_pairs

        docs = spark.createDataFrame(
            [(1, "abcdefghij"), (2, "abcdefghiX"), (3, ""), (4, "")],
            "doc_id long, text string")
        cand = spark.createDataFrame(
            [(1, 2), (3, 4)], "doc_a long, doc_b long")
        rows = {(r.doc_a, r.doc_b): r for r in
                edit_similarity_pairs(docs, cand).collect()}
        assert rows[(1, 2)].lev == 1 and rows[(1, 2)].sim_bp == 9000
        assert rows[(3, 4)].lev == 0 and rows[(3, 4)].sim_bp == 10000

    def test_threshold_filters(self, spark):
        from vulnerablecode_spark.llm.dedup import edit_similarity_pairs

        docs = spark.createDataFrame(
            [(1, "aaaa"), (2, "zzzz")], "doc_id long, text string")
        cand = spark.createDataFrame([(1, 2)], "doc_a long, doc_b long")
        assert edit_similarity_pairs(docs, cand, min_sim_bp=5000).count() == 0


class TestTriangles:
    def _run(self, spark, edges):
        from vulnerablecode_spark.operators.components import triangle_counts

        e = spark.createDataFrame(edges, "src long, dst long")
        return {r.node: (r.degree, r.n_triangles)
                for r in triangle_counts(e).collect()}

    def test_k4_every_node_in_three(self, spark):
        k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
        res = self._run(spark, k4)
        assert res == {i: (3, 3) for i in range(4)}

    def test_path_has_no_triangles(self, spark):
        res = self._run(spark, [(1, 2), (2, 3), (3, 4)])
        assert all(t == 0 for _, t in res.values())
        assert res[2][0] == 2 and res[1][0] == 1

    def test_star_plus_one_closing_edge(self, spark):
        # hub 0 to leaves 1..4, plus edge (1,2): exactly one triangle
        edges = [(0, i) for i in range(1, 5)] + [(1, 2)]
        res = self._run(spark, edges)
        assert res[0] == (4, 1) and res[1] == (2, 1) and res[2] == (2, 1)
        assert res[3] == (1, 0) and res[4] == (1, 0)

    def test_duplicate_and_reversed_edges_collapse(self, spark):
        res = self._run(spark, [(1, 2), (2, 1), (1, 2), (2, 3), (1, 3)])
        assert res[1] == (2, 1) and res[2] == (2, 1) and res[3] == (2, 1)


class TestSkipgramPMI:
    def test_adjacent_collocation_tops(self, spark):
        from vulnerablecode_spark.llm.text import skipgram_pmi

        # "new york" always adjacent; fillers vary — the collocation
        # must carry the highest PMI among pairs meeting min_count
        docs = spark.createDataFrame(
            [(i, f"new york w{i} x{i % 3} y{i % 2}") for i in range(10)],
            "doc_id long, text string")
        rows = skipgram_pmi(docs, window=2, min_count=5).collect()
        by_pair = {(r.tok_a, r.tok_b): r.pmi for r in rows}
        assert ("new", "york") in by_pair
        assert by_pair[("new", "york")] == max(by_pair.values())

    def test_min_count_bounds_output(self, spark):
        from vulnerablecode_spark.llm.text import skipgram_pmi

        docs = spark.createDataFrame(
            [(1, "a b"), (2, "c d")], "doc_id long, text string")
        assert skipgram_pmi(docs, min_count=2).count() == 0

    def test_window_respected(self, spark):
        from vulnerablecode_spark.llm.text import skipgram_pmi

        # distance-3 pair never co-occurs within window 2
        docs = spark.createDataFrame(
            [(i, "far x y z far2") for i in range(6)],
            "doc_id long, text string")
        pairs = {(r.tok_a, r.tok_b)
                 for r in skipgram_pmi(docs, window=2, min_count=1).collect()}
        assert ("far", "far2") not in pairs
        assert ("far", "x") in pairs and ("far", "y") in pairs


class TestHistogramIncremental:
    def test_cellwise_merge_equals_full(self, spark):
        # the q172 invariant at unit grain (additivity is also covered
        # in TestHistogramSketch; this pins the quantile read-off
        # through a merge)
        rows = [("s", i % 500) for i in range(200)]
        df = spark.createDataFrame(rows, "source string, v long")
        a = spark.createDataFrame(rows[:120], "source string, v long")
        b = spark.createDataFrame(rows[120:], "source string, v long")

        def hist(d):
            return sketch.histogram_sketch(d, F.col("v"),
                                           n_bins=32, lo=0, hi=512)
        merged = (hist(a).unionByName(hist(b))
                  .groupBy("source", "bin")
                  .agg(F.sum("c").alias("c")))
        qm = {r.probe_pct: r.sketch_q for r in sketch.histogram_quantiles(
            merged, probes=(50, 99), n_bins=32, lo=0, hi=512).collect()}
        qf = {r.probe_pct: r.sketch_q for r in sketch.histogram_quantiles(
            hist(df), probes=(50, 99), n_bins=32, lo=0, hi=512).collect()}
        assert qm == qf


class TestZipfSlope:
    def test_perfect_zipf_near_minus_one(self, spark):
        from vulnerablecode_spark.llm.text import zipf_slope

        # build a corpus whose token frequencies follow c(r) = 60//r:
        # slope of ln c vs ln r is ~-1
        toks = []
        for r in range(1, 21):
            toks.extend([f"w{r}"] * (60 // r))
        docs = spark.createDataFrame(
            [(1, " ".join(toks))], "doc_id long, text string") \
            .withColumn("source", F.lit("s"))
        row = zipf_slope(docs).collect()[0]
        assert row.vocab == 20
        assert -1_150_000 <= row.slope_e6 <= -850_000

    def test_uniform_frequencies_flat(self, spark):
        from vulnerablecode_spark.llm.text import zipf_slope

        docs = spark.createDataFrame(
            [(1, " ".join(f"t{i}" for i in range(30)) * 1)],
            "doc_id long, text string").withColumn("source", F.lit("s"))
        row = zipf_slope(docs).collect()[0]
        assert row.slope_e6 == 0  # every count 1 -> y constant -> slope 0

    def test_single_type_excluded(self, spark):
        from vulnerablecode_spark.llm.text import zipf_slope

        docs = spark.createDataFrame(
            [(1, "only only only")], "doc_id long, text string") \
            .withColumn("source", F.lit("s"))
        assert zipf_slope(docs).count() == 0  # denominator 0: no fit


class TestByteTVDrift:
    def _hist(self, spark, rows):
        return spark.createDataFrame(rows, "source string, bin int, c long")

    def test_identical_distributions_zero(self, spark):
        from vulnerablecode_spark.llm.multimodal import byte_tv_drift

        h = self._hist(spark, [("a", 0, 10), ("a", 1, 30),
                               ("b", 0, 20), ("b", 1, 60)])
        rows = byte_tv_drift(h).collect()
        assert rows[0].tv_bp == 0  # same shape, different mass

    def test_disjoint_distributions_full(self, spark):
        from vulnerablecode_spark.llm.multimodal import byte_tv_drift

        h = self._hist(spark, [("a", 0, 50), ("b", 1, 70)])
        rows = byte_tv_drift(h).collect()
        assert rows[0].tv_bp == 10000  # one-sided bins ARE counted

    def test_known_half_overlap(self, spark):
        from vulnerablecode_spark.llm.multimodal import byte_tv_drift

        # P = (1/2, 1/2, 0), Q = (1/2, 0, 1/2) -> TV = 1/2
        h = self._hist(spark, [("a", 0, 5), ("a", 1, 5),
                               ("b", 0, 5), ("b", 2, 5)])
        rows = byte_tv_drift(h).collect()
        assert rows[0].tv_bp == 5000


class TestEntropyRate:
    def test_deterministic_sequence_zero_conditional(self, spark):
        from vulnerablecode_spark.llm.text import entropy_rate

        # strict alternation "a b a b ...": H(W2|W1) = 0 (next token is
        # fully determined), H(W) = ln 2 ≈ 0.693147 nats
        docs = spark.createDataFrame(
            [(1, " ".join(["a", "b"] * 50))], "doc_id long, text string") \
            .withColumn("source", F.lit("s"))
        row = entropy_rate(docs).collect()[0]
        assert abs(row.h_unigram_e6 - 693_147) <= 2
        assert 0 <= row.h_bigram_cond_e6 <= 1  # quantization residue

    def test_uniform_iid_gap_near_zero(self, spark):
        from vulnerablecode_spark.llm.text import entropy_rate

        # de Bruijn-ish full coverage: every bigram over {a,b} equally
        # often -> conditional entropy ~= unigram entropy (ln 2)
        seq = "a a b b " * 25 + "a b"
        docs = spark.createDataFrame(
            [(1, seq.strip())], "doc_id long, text string") \
            .withColumn("source", F.lit("s"))
        row = entropy_rate(docs).collect()[0]
        assert abs(row.h_unigram_e6 - row.h_bigram_cond_e6) < 30_000

    def test_single_token_docs_have_no_bigrams(self, spark):
        from vulnerablecode_spark.llm.text import entropy_rate

        docs = spark.createDataFrame(
            [(1, "solo"), (2, "solo")], "doc_id long, text string") \
            .withColumn("source", F.lit("s"))
        assert entropy_rate(docs).count() == 0  # inner join: no bigram side
