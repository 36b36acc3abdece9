"""Round-12 corpus-health operators: known-answer unit tests and the
HLL merge monoid, complementing the oracle-parity and fuzz gates."""

from __future__ import annotations

import math

import pyspark.sql.functions as F

from vulnerablecode_spark.llm import sketch, text


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, source string")


class TestJsDivergence:
    def test_single_source_is_zero(self, spark):
        df = _docs(spark, [(1, "a b c a", "s"), (2, "b c d", "s")])
        out = text.js_divergence(df).collect()
        assert len(out) == 1 and out[0]["js_e6"] == 0

    def test_matches_exact_python_replica(self, spark):
        rows = [(1, "a a a b c", "x"), (2, "b b d d d e", "x"),
                (3, "e e e f g a", "y"), (4, "g g h h h a b", "y"),
                (5, "i i i i j", "z")]
        df = _docs(spark, rows)
        # exact replica of the quantized definition
        from collections import Counter
        per = {}
        for _, t, s in rows:
            per.setdefault(s, Counter()).update(t.split())
        corp = Counter()
        for c in per.values():
            corp.update(c)
        t_all = sum(corp.values())
        g2 = sum(math.floor(cw * math.log(2.0) * 1e6 + 0.5)
                 for cw in corp.values())
        want = {}
        for s, cnt in per.items():
            t_g = sum(cnt.values())
            klp = klq_in = l2_in = 0
            for w, c in cnt.items():
                cw = corp[w]
                den = float(c) * t_all + float(cw) * t_g
                klp += math.floor(
                    c * math.log(2.0 * c * t_all / den) * 1e6 + 0.5)
                klq_in += math.floor(
                    cw * math.log(2.0 * cw * t_g / den) * 1e6 + 0.5)
                l2_in += math.floor(cw * math.log(2.0) * 1e6 + 0.5)
            want[s] = math.floor(klp / (2.0 * t_g)
                                 + (klq_in + g2 - l2_in) / (2.0 * t_all))
        got = {r["source"]: r["js_e6"]
               for r in text.js_divergence(df).collect()}
        assert got == want
        assert all(0 <= v <= 693148 for v in got.values())


class TestRepetition:
    def test_known_dup_share(self, spark):
        # 9 tokens -> 7 overlapping trigrams, 3 distinct -> 4 repeats
        df = _docs(spark, [(1, "a b c a b c a b c", "s")])
        r = text.repetition_stats(df).collect()[0]
        assert (r["n_docs"], r["mean_dup_bp"], r["max_dup_bp"]) \
            == (1, 4 * 10000 // 7, 4 * 10000 // 7)

    def test_all_distinct_is_zero(self, spark):
        df = _docs(spark, [(1, "a b c d e f", "s")])
        assert text.repetition_stats(df).collect()[0]["mean_dup_bp"] == 0

    def test_short_docs_excluded(self, spark):
        df = _docs(spark, [(1, "a b", "s")])
        assert text.repetition_stats(df).count() == 0


class TestDiversity:
    def test_known_ratios(self, spark):
        # tokens: a b a b -> 4 total, 2 distinct; bigrams: "a b","b a",
        # "a b" -> 3 total, 2 distinct
        df = _docs(spark, [(1, "a b a b", "s")])
        r = text.ngram_diversity(df).collect()[0]
        assert (r["n_tokens"], r["distinct1_bp"]) == (4, 5000)
        assert (r["n_bigrams"], r["distinct2_bp"]) == (3, 2 * 10000 // 3)


class TestBurstiness:
    def test_poisson_floor_and_bursty_term(self, spark):
        # 'u' once in every doc -> Fano 0 (the injected-template
        # signature); 'b' 4x in one of 4 docs -> F = 3
        df = _docs(spark, [(1, "u b b b b", "s"), (2, "u z", "s"),
                           (3, "u z", "s"), (4, "u z", "s")])
        got = {r["tok"]: r for r in
               text.term_burstiness(df, top=3).collect()}
        assert got["u"]["fano_bp"] == 0
        assert got["b"]["fano_bp"] == 30000
        assert got["u"]["n_docs_with"] == 4 and got["b"]["n_docs_with"] == 1


class TestHeaps:
    def test_matches_exact_python_replica(self, spark):
        rows = [(i, " ".join(f"w{j % (i + 2)}" for j in range(3 + 4 * i)),
                 "s") for i in range(6)]
        df = _docs(spark, rows)
        xs, ys = [], []
        for _, t, _s in rows:
            toks = t.split()
            xs.append(math.floor(math.log(len(toks)) * 1e6 + 0.5))
            ys.append(math.floor(math.log(len(set(toks))) * 1e6 + 0.5))
        n = len(xs)
        sx, sy = sum(xs), sum(ys)
        sxy = sum(x * y for x, y in zip(xs, ys))
        sxx = sum(x * x for x in xs)
        slope = float(n * sxy - sx * sy) / float(n * sxx - sx * sx)
        r = text.heaps_law(df).collect()[0]
        assert r["n_docs"] == n
        assert r["beta_e6"] == math.floor(slope * 1e6)
        assert r["ln_k_e6"] == math.floor((sy - slope * sx) / n)


class TestHll:
    def test_merge_equals_union_sketch(self, spark):
        a = spark.createDataFrame(
            [("s", f"t{i}") for i in range(200)], "source string, v string")
        b = spark.createDataFrame(
            [("s", f"t{i}") for i in range(150, 400)],
            "source string, v string")
        u = a.unionByName(b)
        merged = sketch.hll_merge(
            sketch.hll_registers(a, F.col("v")),
            sketch.hll_registers(b, F.col("v")))
        direct = sketch.hll_registers(u, F.col("v"))
        assert sorted(map(tuple, merged.collect())) \
            == sorted(map(tuple, direct.collect()))

    def test_registers_match_pure_python_replica(self, spark):
        # exact register-level replica: the same 60-bit md5 hash and
        # ρ = 55 − bitlen(h') register math in plain Python, over 40
        # randomized-but-seeded groups in ONE Spark job — any drift in
        # the hash salt, register split, or bitlen edge cases (h'=0,
        # single-bit h') breaks value equality, not a statistical band
        import hashlib
        import random

        rng = random.Random(12012)
        rows = [(f"g{g}", f"v{rng.randrange(10_000)}")
                for g in range(40) for _ in range(rng.randrange(1, 120))]
        df = spark.createDataFrame(rows, "source string, v string")

        def h60(s: str) -> int:
            return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

        want: dict[tuple[str, int], int] = {}
        for g, v in rows:
            h = h60(f"hll:{v}")
            reg, h2 = h % 64, h // 64
            rho = 55 if h2 == 0 else 55 - h2.bit_length()
            key = (g, reg)
            want[key] = max(want.get(key, 0), rho)
        got = {(r["source"], r["reg"]): r["m"]
               for r in sketch.hll_registers(df, F.col("v")).collect()}
        assert got == want and len(got) > 100

    def test_estimate_tracks_cardinality(self, spark):
        df = spark.createDataFrame(
            [("s", f"item{i}") for i in range(1000)] * 3,  # dups no-op
            "source string, v string")
        r = sketch.hll_estimate(
            sketch.hll_registers(df, F.col("v"))).collect()[0]
        assert r["n_registers_set"] <= 64
        # raw HLL at m=64: sigma ~ 1.04/8 = 13% — generous 4-sigma band
        assert 480 <= r["est_hll"] <= 2100


class TestCoverageAndSimpson:
    def test_good_turing_known(self, spark):
        # counts: a=3, b=1, c=1, d=2 -> hapax 2, dis 1, N=7
        df = _docs(spark, [(1, "a a a b", "s"), (2, "c d d", "s")])
        r = text.coverage_stats(df).collect()[0]
        assert (r["n_tokens"], r["vocab"], r["hapax"], r["dis"]) \
            == (7, 4, 2, 1)
        assert r["p0_bp"] == 2 * 10000 // 7

    def test_simpson_known(self, spark):
        # a a b: sum c(c-1) = 2, T(T-1) = 6 -> 333333 ppm
        df = _docs(spark, [(1, "a a b", "s")])
        assert text.simpson_index(df).collect()[0]["simpson_e6"] == 333333
