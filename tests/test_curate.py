"""Corpus-curation operators (llm/curate.py): semantic unit tests on
hand-built frames plus physical-plan promises for the graded queries
(q66–q70). Oracle parity at sf0.01 is covered by test_oracle_parity.py."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from pyspark.sql import functions as F

import vulnerablecode_spark.plans.curate  # noqa: F401 — registers q66–q70
from vulnerablecode_spark.llm import curate
from vulnerablecode_spark.plans import QUERIES

from tests.conftest import SF_SMOKE


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string"
    )


class TestStripStopwords:
    def test_counts_and_fingerprint(self, spark):
        out = curate.strip_stopwords(
            _docs(spark, [(1, "the quick fox and the dog", "en", "s")])
        ).collect()[0]
        # "the", "and", "the" removed; "quick fox dog" kept
        assert out.kept_tokens == 3
        assert out.removed_tokens == 3
        import hashlib

        assert out.clean_fp == hashlib.md5(b"quick fox dog").hexdigest()

    def test_all_stopwords_doc(self, spark):
        out = curate.strip_stopwords(
            _docs(spark, [(1, "the a of and", "en", "s")])
        ).collect()[0]
        assert out.kept_tokens == 0 and out.removed_tokens == 4


class TestRedactPii:
    def test_typed_placeholders_and_counts(self, spark):
        import hashlib

        text = ("mail me@x.com or me2@y.org ip 10.0.0.1 "
                "card 4111222233334444 key " + "0123456789abcdef" * 2)
        out = curate.redact_pii(_docs(spark, [(1, text, "en", "s")])).collect()[0]
        assert (out.n_email, out.n_ipv4, out.n_longnum, out.n_hexsecret) == (
            2, 1, 1, 1)
        scrubbed = ("mail <EMAIL> or <EMAIL> ip <IP> card <NUM> key <HEX>")
        assert out.redacted_fp == hashlib.md5(scrubbed.encode()).hexdigest()

    def test_clean_text_untouched(self, spark):
        import hashlib

        out = curate.redact_pii(
            _docs(spark, [(1, "just plain words", "en", "s")])
        ).collect()[0]
        assert out.redacted_fp == hashlib.md5(b"just plain words").hexdigest()
        assert out.n_email == out.n_ipv4 == out.n_longnum == out.n_hexsecret == 0


class TestPackSequences:
    def test_every_token_packed_exactly_once(self, spark):
        rows = [
            (i, " ".join(f"t{i}w{j}" for j in range(n)), "en", f"src{i % 2}")
            for i, n in enumerate([5, 130, 128, 3, 260, 1])
        ]
        manifest = curate.pack_sequences(_docs(spark, rows), seq_len=128)
        got = manifest.collect()
        n_tok = {r[0]: len(r[1].split(" ")) for r in rows}
        # within-doc spans cover [0, n_tok) exactly once, in seq order
        by_doc: dict[int, list] = {}
        for m in got:
            by_doc.setdefault(m.doc_id, []).append(m)
        for doc_id, spans in by_doc.items():
            spans.sort(key=lambda m: m.seq_id)
            assert spans[0].tok_begin == 0
            assert spans[-1].tok_end == n_tok[doc_id] - 1
            for a, b in zip(spans, spans[1:]):
                assert b.tok_begin == a.tok_end + 1
                assert b.seq_id == a.seq_id + 1
        # every sequence except each stream's last holds exactly 128 tokens
        seq_sizes: dict[tuple, int] = {}
        for m in got:
            key = (m.stream, m.seq_id)
            seq_sizes[key] = seq_sizes.get(key, 0) + m.tok_end - m.tok_begin + 1
        last = {s: max(q for (t, q) in seq_sizes if t == s)
                for s in {k[0] for k in seq_sizes}}
        for (stream, seq_id), size in seq_sizes.items():
            if seq_id != last[stream]:
                assert size == 128, (stream, seq_id, size)
            else:
                assert 1 <= size <= 128

    def test_sharded_packing_still_covers_every_token(self, spark):
        rows = [
            (i, " ".join(f"t{i}w{j}" for j in range(n)), "en", "src")
            for i, n in enumerate([5, 130, 128, 3, 260, 1])
        ]
        got = curate.pack_sequences(
            _docs(spark, rows), seq_len=128, n_shards=4
        ).collect()
        # sharding re-routes docs to sub-streams but each doc's spans
        # still cover [0, n_tok) exactly once within ONE stream
        n_tok = {r[0]: len(r[1].split(" ")) for r in rows}
        by_doc: dict[int, list] = {}
        for m in got:
            by_doc.setdefault(m.doc_id, []).append(m)
        assert set(by_doc) == set(n_tok)
        for doc_id, spans in by_doc.items():
            assert len({m.stream for m in spans}) == 1
            spans.sort(key=lambda m: m.seq_id)
            assert spans[0].tok_begin == 0
            assert spans[-1].tok_end == n_tok[doc_id] - 1
            for a, b in zip(spans, spans[1:]):
                assert b.tok_begin == a.tok_end + 1
        # more than one shard stream actually used for 6 docs
        assert len({m.stream for m in got}) > 1

    def test_streams_pack_independently(self, spark):
        rows = [(1, "a b c", "en", "s0"), (2, "d e", "en", "s1")]
        got = curate.pack_sequences(_docs(spark, rows), seq_len=128).collect()
        # both docs start their own stream at sequence 0, offset 0
        assert {(m.stream, m.seq_id, m.tok_begin) for m in got} == {
            ("s0", 0, 0), ("s1", 0, 0)
        }


class TestStratifiedSample:
    def test_small_strata_kept_whole(self, spark):
        rows = [(i, "x", "en", "small") for i in range(10)]
        got = curate.stratified_sample(
            _docs(spark, rows), target_per_stratum=25, strata=("source",)
        ).collect()
        assert len(got) == 10
        assert all(r.rate_bp == 10000 for r in got)

    def test_large_stratum_rate(self, spark):
        rows = [(i, "x", "en", "big") for i in range(500)]
        got = curate.stratified_sample(
            _docs(spark, rows), target_per_stratum=25, strata=("source",)
        ).collect()
        assert all(r.rate_bp == 250000 // 500 for r in got)
        # hash gate at 500 bp keeps a few percent — bounded, deterministic
        assert 0 < len(got) < 100

    def test_verdict_stable_under_growth_at_fixed_rate(self, spark):
        # the per-doc gate hash ignores other rows: with the stratum size
        # (hence rate) pinned, adding documents never flips existing ones
        base = [(i, "x", "en", "s") for i in range(100)]
        grown = base + [(i, "x", "en", "other") for i in range(100, 200)]
        kept_base = {
            r.doc_id
            for r in curate.stratified_sample(
                _docs(spark, base), 25, strata=("source",)
            ).collect()
            if r.source == "s"
        }
        kept_grown = {
            r.doc_id
            for r in curate.stratified_sample(
                _docs(spark, grown), 25, strata=("source",)
            ).collect()
            if r.source == "s"
        }
        assert kept_base == kept_grown


class TestDistinctiveTerms:
    def test_source_marker_token_wins(self, spark):
        rows = []
        for i in range(20):
            rows.append((i, "common common common marker" +
                         (" marker" * 4), "en", "special"))
        for i in range(20, 60):
            rows.append((i, "common common common filler filler", "en", "rest"))
        got = curate.distinctive_terms(_docs(spark, rows), k=1, min_tf=5).collect()
        top = {r.source: r.term for r in got}
        assert top["special"] == "marker"
        assert top["rest"] == "filler"
        assert all(r.term_rank == 1 for r in got)

    def test_lift_is_exact_integer(self, spark):
        rows = [(0, "x x y", "en", "a"), (1, "y y y", "en", "b")]
        got = curate.distinctive_terms(_docs(spark, rows), k=2, min_tf=1).collect()
        by = {(r.source, r.term): r.lift_bp for r in got}
        # P(x|a)=2/3 vs P(x)=2/6 → lift 2.0 → 20000 bp exactly
        assert by[("a", "x")] == 2 * 6 * 10000 // (3 * 2)


class TestBpeMergeStats:
    def test_counts_and_rank(self, spark):
        docs = _docs(spark, [
            (1, "a b a b c", "en", "s"),   # "a b"×2, "b a"×1, "b c"×1
            (2, "a b x", "en", "s"),       # "a b"×1, "b x"×1
            (3, "solo", "en", "s"),        # no bigram
        ])
        got = [(r.pair, r.n, r.merge_rank)
               for r in curate.bpe_merge_stats(docs, k=3).collect()]
        assert got[0] == ("a b", 3, 1)
        # ties broken by pair asc
        assert [g[0] for g in got[1:]] == ["b a", "b c"]
        assert [g[2] for g in got] == [1, 2, 3]


class TestEpochUpsample:
    def test_factors_cap_and_equalize(self, spark):
        rows = (
            [(i, " ".join(["t"] * 100), "en", "big") for i in range(10)]
            + [(100, " ".join(["t"] * 10), "en", "small")]
            + [(200, "t", "en", "tiny")]
        )
        got = curate.epoch_upsample(_docs(spark, rows), max_epochs=4)
        per = {
            r.source: r.epochs
            for r in got.select("source", "epochs").distinct().collect()
        }
        assert per == {"big": 1, "small": 4, "tiny": 4}  # tiny capped at 4
        copies = got.groupBy("source").count().collect()
        by = {r.source: r["count"] for r in copies}
        assert by == {"big": 10, "small": 4, "tiny": 4}


class TestCuratePlanQuality:
    @staticmethod
    def _plan(spark, name):
        buf = io.StringIO()
        with redirect_stdout(buf):
            QUERIES[name](spark, SF_SMOKE).explain("formatted")
        return buf.getvalue()

    def test_packing_and_sampling_are_joinless(self, spark):
        # one window shuffle each — no join node may appear
        for name in ("q67_sequence_packing", "q68_stratified_sample"):
            plan = self._plan(spark, name)
            assert "Join" not in plan, name
            assert "CartesianProduct" not in plan, name

    def test_scalar_totals_broadcast(self, spark):
        # Catalyst folds the literal join key, so the 1-row scalar-total
        # side plans as a BroadcastNestedLoopJoin over a single broadcast
        # row — the canonical scalar plan (same acceptance as the q46
        # centroid assertion); what matters is that every join broadcasts
        # its small side and nothing degenerates to a cartesian shuffle.
        for name in ("q69_distinctive_terms", "q70_epoch_upsample"):
            plan = self._plan(spark, name)
            assert "CartesianProduct" not in plan, name
            assert "BroadcastExchange" in plan, name

    def test_stopword_strip_is_mapside(self, spark):
        plan = self._plan(spark, "q66_stopword_strip")
        assert "Exchange" not in plan  # pure projection, shuffle-free

    def test_pii_redaction_is_mapside(self, spark):
        plan = self._plan(spark, "q71_pii_redaction")
        assert "Exchange" not in plan  # pure projection, shuffle-free


class TestBpeEncodeTrain:
    def test_greedy_overlap_and_priority(self, spark):
        import hashlib

        # merge 0: (a, b) outranks merge 1: (b, c) — in "a b c" the
        # higher-priority (a,b) must win even though (b,c) also matches;
        # overlapping "a a a" with (a,a) merges left-to-right → [aa, a]
        out = {r.doc_id: r for r in curate.bpe_apply_merges(
            _docs(spark, [(1, "a b c", "en", "s"),
                          (2, "a a a", "en", "s")]),
            merges=[("a", "b"), ("b", "c"), ("a", "a")]).collect()}
        assert (out[1].n_tok_before, out[1].n_tok_after) == (3, 2)
        assert out[1].encoded_fp == hashlib.md5(
            "a b\x1fc".encode()).hexdigest()
        assert (out[2].n_tok_before, out[2].n_tok_after) == (3, 2)
        assert out[2].encoded_fp == hashlib.md5(
            "a a\x1fa".encode()).hexdigest()

    def test_cascading_merges(self, spark):
        import hashlib

        # (a,b) then (a b, c): the second merge consumes the first's
        # output token — the defining recursive property of BPE vocab
        out = curate.bpe_apply_merges(
            _docs(spark, [(1, "a b c d", "en", "s")]),
            merges=[("a", "b"), ("a b", "c")]).collect()[0]
        assert out.n_tok_after == 2
        assert out.encoded_fp == hashlib.md5(
            "a b c\x1fd".encode()).hexdigest()

    def test_train_learns_frequent_pairs_then_encode_shrinks(self, spark):
        docs = _docs(spark, [
            (1, "new york city has new york weather", "en", "s"),
            (2, "new york is new york", "en", "s"),
            (3, "old york town", "en", "s"),
        ])
        merges = curate.bpe_train(docs, n_merges=2)
        # "new york" occurs 4x — round 1 must adopt it; round 2 then sees
        # the merged token and its most frequent neighbor pair
        assert merges[0] == ("new", "york")
        enc = {r.doc_id: r for r in
               curate.bpe_apply_merges(docs, merges).collect()}
        assert enc[1].n_tok_after < enc[1].n_tok_before
        assert enc[3].n_tok_after == 3  # "old york town" untouched

    def test_train_stops_when_no_repeating_pair(self, spark):
        merges = curate.bpe_train(
            _docs(spark, [(1, "q w e r t y", "en", "s")]), n_merges=5)
        assert merges == []  # every pair occurs once → nothing to learn

    def test_null_text_emits_empty_row_not_drop(self, spark):
        docs = spark.createDataFrame(
            [(1, "a b", "en", "s"), (2, None, "en", "s")],
            "doc_id bigint, text string, lang string, source string")
        out = {r.doc_id: r for r in curate.bpe_apply_merges(
            docs, merges=[("a", "b")]).collect()}
        assert set(out) == {1, 2}  # the null doc is NOT silently dropped
        assert (out[2].n_tok_before, out[2].n_tok_after) == (0, 0)
        assert out[2].encoded_fp is None
        assert out[1].n_tok_after == 1


class TestStratifiedSampleNullStrata:
    def test_null_stratum_docs_gate_deterministically(self, spark):
        # NULL strata must form their own stratum with a well-defined
        # gate key (coalesced to ''), matching the SQL oracle's coalesce
        # — not silently collapse into a neighboring key via concat_ws
        import hashlib

        docs = spark.createDataFrame(
            [(i, "t", None if i % 2 else "en", "web") for i in range(40)],
            "doc_id bigint, text string, lang string, source string")
        out = {r.doc_id: r for r in curate.stratified_sample(
            docs, target_per_stratum=10).collect()}
        assert out, "some docs survive the gate"
        for doc_id, r in out.items():
            assert r.stratum_n == 20  # 20 en + 20 NULL-lang docs
            lang = "" if doc_id % 2 else "en"
            key = f"web:{lang}:{doc_id}"
            gate = int(hashlib.md5(key.encode()).hexdigest()[:15], 16) % 10000
            assert gate < r.rate_bp  # kept rows satisfy the COALESCED key


class TestTemperatureSampleNullGroup:
    """ADVICE r9: NULL group_col must not silently vanish — unlabeled
    docs fold to the '__null__' sentinel and are sampled as their own
    source; non-null groups keep the identical hash gate."""

    def test_null_group_docs_sampled_as_own_source(self, spark):
        docs = spark.createDataFrame(
            [(i, "t", None if i < 20 else "en") for i in range(60)],
            "doc_id bigint, text string, lang string")
        out = {r.doc_id: r for r in curate.temperature_sample(
            docs, alpha=0.5, group_col="lang").collect()}
        assert out, "some docs survive"
        null_rows = [r for r in out.values() if r.lang is None]
        assert null_rows, "unlabeled docs reach the manifest"
        assert all(r.n_source == 20 for r in null_rows)
        # smallest source (the NULL group, 20 docs) is kept whole
        assert all(r.rate_bp == 10000 for r in null_rows)
        assert len(null_rows) == 20

    def test_non_null_gate_unchanged_by_sentinel(self, spark):
        import hashlib

        docs = spark.createDataFrame(
            [(i, "t", "en" if i % 3 else "fr") for i in range(60)],
            "doc_id bigint, text string, lang string")
        out = {r.doc_id: r for r in curate.temperature_sample(
            docs, alpha=0.5, group_col="lang").collect()}
        for doc_id, r in out.items():
            key = f"{r.lang}:{doc_id}"
            gate = int(hashlib.md5(key.encode()).hexdigest()[:15], 16) % 10000
            assert gate < r.rate_bp


class TestBpeTrainSampling:
    def test_sampled_merges_apply_corpus_wide(self, spark):
        # VERDICT r10 directive #6: merges trained on a sample must be a
        # valid merge table for the WHOLE corpus — same (l, r) schema,
        # and bpe_apply_merges encodes every doc with them cleanly
        docs = spark.createDataFrame(
            [(i, "a b a b c d a b") for i in range(30)],
            "doc_id bigint, text string")
        merges = curate.bpe_train(docs, n_merges=2, sample_fraction=0.5)
        assert merges, "sample still learns the dominant pair"
        assert merges[0] == ("a", "b")
        encoded = curate.bpe_apply_merges(docs, merges).collect()
        assert len(encoded) == 30
        assert all(r.n_tok_after < r.n_tok_before for r in encoded)

    def test_sampling_is_deterministic(self, spark):
        docs = spark.createDataFrame(
            [(i, "x y x y z") for i in range(40)],
            "doc_id bigint, text string")
        a = curate.bpe_train(docs, n_merges=2, sample_fraction=0.4)
        b = curate.bpe_train(docs, n_merges=2, sample_fraction=0.4)
        assert a == b


class TestBudgetSelect:
    """q122: two-phase token-budget selection must equal the naive
    global (quality desc, id) prefix — checked against the operator's
    own per-doc metrics re-ranked in the driver."""

    def _naive(self, spark, docs, budget):
        from vulnerablecode_spark.llm.text import quality_metrics

        rows = sorted(
            quality_metrics(docs).select(
                "doc_id", "quality_score_bp", "n_tokens").collect(),
            key=lambda r: (-r.quality_score_bp, r.doc_id))
        kept, run = {}, 0
        for r in rows:
            run += r.n_tokens
            if run > budget:
                break
            kept[r.doc_id] = run
        return kept

    def test_matches_naive_prefix_across_class_boundary(self, spark):
        # texts chosen to spread across several score classes so the
        # boundary class genuinely cuts mid-class
        docs = spark.createDataFrame(
            [(i, ("the quick fox " * (1 + i % 7)).strip())
             for i in range(40)],
            "doc_id bigint, text string")
        for budget in (1, 37, 150, 10_000_000):
            got = {r.doc_id: r.cum_tokens for r in
                   curate.budget_select(docs, budget).collect()}
            assert got == self._naive(spark, docs, budget), budget

    def test_single_score_class_degenerates_to_prefix_by_id(self, spark):
        docs = spark.createDataFrame(
            [(i, "alpha beta gamma delta") for i in range(20)],
            "doc_id bigint, text string")
        out = sorted(curate.budget_select(docs, 18).collect(),
                     key=lambda r: r.doc_id)
        # 4 tokens each -> docs 0..3 fit (16), doc 4 would hit 20 > 18
        assert [r.doc_id for r in out] == [0, 1, 2, 3]
        assert [r.cum_tokens for r in out] == [4, 8, 12, 16]

    def test_budget_below_first_doc_selects_nothing(self, spark):
        docs = spark.createDataFrame(
            [(1, "one two three")], "doc_id bigint, text string")
        assert curate.budget_select(docs, 2).count() == 0


class TestCcnetBuckets:
    """q123: head/middle/tail by cumulative char mass per language must
    equal the naive per-lang (lm_score desc, id) running-sum bucketing."""

    def _naive(self, spark, docs):
        from vulnerablecode_spark.llm.text import bigram_lm_scores

        scores = {r.doc_id: r.lm_score_bp
                  for r in bigram_lm_scores(docs).collect()}
        rows = [(r.doc_id, r.lang or "__null__", r.n_chars)
                for r in docs.collect() if r.doc_id in scores]
        expect = {}
        for lang in {r[1] for r in rows}:
            mine = sorted((r for r in rows if r[1] == lang),
                          key=lambda r: (-scores[r[0]], r[0]))
            total = sum(r[2] for r in mine)
            run = 0
            for doc_id, _, n_chars in mine:
                run += n_chars
                expect[doc_id] = ("head" if 3 * run <= total else
                                  "middle" if 3 * run <= 2 * total
                                  else "tail")
        return expect

    def test_matches_naive_and_excludes_short_docs(self, spark):
        rows = [(i, ("the cat sat " * (1 + i % 5)).strip(),
                 ["en", "fr", None][i % 3], "s",
                 len(("the cat sat " * (1 + i % 5)).strip()))
                for i in range(30)]
        rows.append((99, "solo", "en", "s", 4))  # 1 token: no bigrams
        docs = spark.createDataFrame(
            rows, "doc_id bigint, text string, lang string, "
                  "source string, n_chars bigint")
        out = {r.doc_id: (r.lang, r.bucket)
               for r in curate.ccnet_buckets(docs).collect()}
        assert 99 not in out, "scoreless docs stay out of the buckets"
        expect = self._naive(spark, docs)
        assert {k: v[1] for k, v in out.items()} == expect
        # NULL lang folded to its own corpus, not dropped
        assert any(v[0] == "__null__" for v in out.values())

    def test_every_lang_gets_all_three_buckets_when_mass_allows(self, spark):
        # nine equal-mass docs per lang, three distinct score classes
        rows = []
        for li, lang in enumerate(["en", "fr"]):
            for i in range(9):
                text = ("aa bb " * (1 + i % 3)).strip()
                rows.append((li * 100 + i, text, lang, "s", 30))
        docs = spark.createDataFrame(
            rows, "doc_id bigint, text string, lang string, "
                  "source string, n_chars bigint")
        out = curate.ccnet_buckets(docs).collect()
        for lang in ("en", "fr"):
            got = {r.bucket for r in out if r.lang == lang}
            assert got == {"head", "middle", "tail"}


class TestUnimaxAllocate:
    def _docs(self, spark, spec):
        # spec: {lang: n_tokens} via one doc of that many words
        rows = [(i, " ".join(["w"] * n), lang, "s")
                for i, (lang, n) in enumerate(spec.items())]
        return spark.createDataFrame(
            rows, "doc_id bigint, text string, lang string, source string")

    def test_waterfill_caps_small_langs_and_conserves_budget(self, spark):
        docs = self._docs(spark, {"aa": 10, "bb": 20, "cc": 1000})
        out = {r.lang: r for r in
               curate.unimax_allocate(docs, 500, max_epochs=4).collect()}
        # aa capacity 40, bb 80 — both under the uniform share → capped
        assert out["aa"].capped and out["aa"].alloc_tokens == 40
        assert out["bb"].capped and out["bb"].alloc_tokens == 80
        # cc takes the floor of what is left: (500-120) div 1
        assert not out["cc"].capped and out["cc"].alloc_tokens == 380
        assert sum(r.alloc_tokens for r in out.values()) <= 500
        assert out["aa"].epochs_bp == 40000  # exactly max_epochs

    def test_all_uncapped_equal_share(self, spark):
        docs = self._docs(spark, {"aa": 100, "bb": 100, "cc": 100})
        out = curate.unimax_allocate(docs, 90, max_epochs=1).collect()
        assert all(not r.capped and r.alloc_tokens == 30 for r in out)

    def test_budget_exceeds_total_capacity_all_capped(self, spark):
        docs = self._docs(spark, {"aa": 10, "bb": 20})
        out = {r.lang: r for r in
               curate.unimax_allocate(docs, 10**9, max_epochs=2).collect()}
        assert all(r.capped for r in out.values())
        assert out["aa"].alloc_tokens == 20
        assert out["bb"].alloc_tokens == 40

    def test_null_lang_gets_its_own_allocation(self, spark):
        docs = spark.createDataFrame(
            [(1, "w w w", None, "s"), (2, "w w", "en", "s")],
            "doc_id bigint, text string, lang string, source string")
        out = {r.lang: r for r in
               curate.unimax_allocate(docs, 100, max_epochs=1).collect()}
        assert "__null__" in out and out["__null__"].alloc_tokens == 3


class TestCcnetAssign:
    def test_thresholds_and_tie_up_unseen_tail(self, spark):
        buckets = spark.createDataFrame(
            [(1, "en", 900, 10, "head"), (2, "en", 700, 10, "middle"),
             (3, "en", 500, 10, "tail"), (4, "fr", 800, 10, "head")],
            "doc_id bigint, lang string, lm_score_bp bigint, "
            "n_chars bigint, bucket string")
        thr = {r.lang: r for r in
               curate.ccnet_thresholds(buckets).collect()}
        assert thr["en"].head_min_bp == 900
        assert thr["en"].middle_min_bp == 700
        assert thr["fr"].middle_min_bp is None  # no middle mass
        scored = spark.createDataFrame(
            [(10, "en", 900), (11, "en", 899), (12, "en", 700),
             (13, "en", 699), (14, "fr", 100), (15, "zz", 9999)],
            "doc_id bigint, lang string, lm_score_bp bigint")
        out = {r.doc_id: r.bucket for r in curate.ccnet_assign(
            scored, curate.ccnet_thresholds(buckets)).collect()}
        assert out[10] == "head"      # tie at the cut goes up
        assert out[11] == "middle"
        assert out[12] == "middle"
        assert out[13] == "tail"
        assert out[14] == "tail"      # fr has no middle threshold
        assert out[15] == "tail"      # unseen language → conservative

    def test_assignment_consistent_with_batch_operator(self, spark):
        # a doc already in the corpus must assign to the bucket the
        # batch operator gave it (scores equal, ties go up at the cut)
        rows = [(i, ("the cat sat on " * (1 + i % 6)).strip(), "en", "s",
                 len(("the cat sat on " * (1 + i % 6)).strip()))
                for i in range(24)]
        docs = spark.createDataFrame(
            rows, "doc_id bigint, text string, lang string, "
                  "source string, n_chars bigint")
        from vulnerablecode_spark.llm.text import bigram_lm_scores

        batch_buckets = curate.ccnet_buckets(docs)
        thr = curate.ccnet_thresholds(batch_buckets)
        scored = (bigram_lm_scores(docs)
                  .join(docs.select("doc_id", "lang"), "doc_id")
                  .select("doc_id", "lang", "lm_score_bp"))
        assigned = {r.doc_id: r.bucket
                    for r in curate.ccnet_assign(scored, thr).collect()}
        for r in batch_buckets.collect():
            got, want = assigned[r.doc_id], r.bucket
            # ties across a cut can promote (up-bias by design), never
            # demote: head stays head, middle may become head, etc.
            order = {"tail": 0, "middle": 1, "head": 2}
            assert order[got] >= order[want], (r.doc_id, got, want)


class TestUnimaxManifest:
    def test_full_passes_plus_gated_partial(self, spark):
        # aa: 10 tokens cap 40 → capped, alloc 40 = 4 full passes exactly;
        # bb: alloc = 500-40 = 460 over 200 tokens → 2 full + 60-token
        # partial (rate 3000bp)
        docs = spark.createDataFrame(
            [(1, " ".join(["w"] * 10), "aa", "s")]
            + [(i, " ".join(["w"] * 20), "bb", "s") for i in range(2, 12)],
            "doc_id bigint, text string, lang string, source string")
        out = curate.unimax_manifest(docs, 500, max_epochs=4).collect()
        aa = [r for r in out if r.lang == "aa"]
        assert {r.copy_idx for r in aa} == {1, 2, 3, 4}
        assert all(r.n_copies == 4 for r in aa)
        bb = {r.doc_id: r.n_copies for r in out if r.lang == "bb"}
        assert set(bb.values()) <= {2, 3}
        # manifest rows per doc == n_copies
        from collections import Counter
        c = Counter((r.doc_id) for r in out if r.lang == "bb")
        assert all(c[d] == n for d, n in bb.items())

    def test_deterministic_and_salt_sensitive(self, spark):
        docs = spark.createDataFrame(
            [(i, "w w w w", "en", "s") for i in range(40)],
            "doc_id bigint, text string, lang string, source string")
        a = sorted(map(tuple, curate.unimax_manifest(docs, 100).collect()))
        b = sorted(map(tuple, curate.unimax_manifest(docs, 100).collect()))
        assert a == b
        c = sorted(map(tuple, curate.unimax_manifest(
            docs, 100, salt="other").collect()))
        assert a != c  # different partial-pass membership


class TestCorpusDiff:
    def test_all_four_statuses_and_source_attribution(self, spark):
        def d(rows):
            return spark.createDataFrame(
                rows, "doc_id bigint, text string, source string")

        old = d([(1, "same", "s1"), (2, "was this", "s1"),
                 (3, "going away", "s2")])
        new = d([(1, "same", "s1"), (2, "now this", "s1"),
                 (4, "brand new", "s2")])
        out = {r.source: r for r in curate.corpus_diff(
            old, new, source_col="source").collect()}
        assert (out["s1"].n_unchanged, out["s1"].n_changed) == (1, 1)
        assert out["s1"].n_added == 0 and out["s1"].n_removed == 0
        # removed reports under its OLD source; added under the new one
        assert out["s2"].n_removed == 1 and out["s2"].n_added == 1

    def test_identical_snapshots_all_unchanged(self, spark):
        docs = spark.createDataFrame(
            [(i, f"text {i}", "s") for i in range(10)],
            "doc_id bigint, text string, source string")
        out = curate.corpus_diff(docs, docs).collect()[0]
        assert (out.n_unchanged, out.n_added, out.n_removed,
                out.n_changed) == (10, 0, 0, 0)


class TestReviewFixesR10b:
    def test_ccnet_assign_null_lang_matches_stored_null_thresholds(
            self, spark):
        # review fix: unlabeled docs must hit the stored '__null__'
        # threshold row, not silently fall to tail on a NULL join key
        buckets = spark.createDataFrame(
            [(1, "__null__", 900, 10, "head"),
             (2, "__null__", 500, 10, "middle")],
            "doc_id bigint, lang string, lm_score_bp bigint, "
            "n_chars bigint, bucket string")
        scored = spark.createDataFrame(
            [(10, None, 950), (11, None, 600), (12, None, 100)],
            "doc_id bigint, lang string, lm_score_bp bigint")
        out = {r.doc_id: r.bucket for r in curate.ccnet_assign(
            scored, curate.ccnet_thresholds(buckets)).collect()}
        assert out == {10: "head", 11: "middle", 12: "tail"}

    def test_corpus_diff_null_text_is_presence_not_content(self, spark):
        # review fix: a present row with NULL text is not added/removed;
        # NULL→'x' is a change, NULL→NULL unchanged
        def d(rows):
            return spark.createDataFrame(
                rows, "doc_id bigint, text string, source string")

        old = d([(1, None, "s"), (2, "x", "s"), (3, None, "s")])
        new = d([(1, "x", "s"), (2, None, "s"), (3, None, "s")])
        out = curate.corpus_diff(old, new).collect()[0]
        assert (out.n_changed, out.n_unchanged,
                out.n_added, out.n_removed) == (2, 1, 0, 0)


class TestUnimaxProperties:
    """Water-fill invariants under random corpora (hypothesis): the
    Spark plan must match a direct Python transliteration of the spec
    AND satisfy the allocation laws (never exceed capacity, never
    exceed budget, leave < n_langs tokens unallocated unless every
    language is capped)."""

    @staticmethod
    def _py_waterfill(counts, budget, max_epochs):
        rows = sorted(((max_epochs * t, lang, t)
                       for lang, t in counts.items()))
        out, cum = {}, 0
        flags = []
        for i, (cap, lang, t) in enumerate(rows):
            share = (budget - cum) // (len(rows) - i)
            flags.append((lang, cap, t, cap <= share))
            cum += cap
        capped_total = sum(c for _, c, _, f in flags if f)
        n_unc = sum(1 for *_, f in flags if not f)
        unc = (budget - capped_total) // n_unc if n_unc else None
        for lang, cap, t, f in flags:
            out[lang] = cap if f else unc
        return out

    def test_matches_python_spec_and_laws(self, spark):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        lang_counts = st.dictionaries(
            st.sampled_from(["aa", "bb", "cc", "dd", "ee"]),
            st.integers(min_value=1, max_value=500),
            min_size=1, max_size=5)
        budgets = st.integers(min_value=1, max_value=5000)
        epochs = st.integers(min_value=1, max_value=4)
        got_cache = {}

        @given(lang_counts, budgets, epochs)
        @settings(max_examples=25, deadline=None)
        def check(counts, budget, max_epochs):
            key = (tuple(sorted(counts.items())), budget, max_epochs)
            if key not in got_cache:
                per_lang = spark.createDataFrame(
                    list(counts.items()),
                    "lang string, lang_tokens long")
                got_cache[key] = {
                    r.lang: r for r in curate.unimax_from_counts(
                        per_lang, budget,
                        max_epochs=max_epochs).collect()}
            got = got_cache[key]
            want = self._py_waterfill(counts, budget, max_epochs)
            assert {k: v.alloc_tokens for k, v in got.items()} == want
            total = sum(v.alloc_tokens for v in got.values())
            assert total <= budget
            assert all(v.alloc_tokens <= v.capacity
                       for v in got.values())
            if not all(v.capped for v in got.values()):
                # floor remainders only: what's left unallocated is
                # less than one token per uncapped language
                n_unc = sum(1 for v in got.values() if not v.capped)
                assert budget - total < n_unc

        check()


class TestGlobalRank:
    def test_matches_single_partition_row_number(self, spark):
        # heavy ties + one extreme value + many input partitions: the
        # regime where branch-inconsistent partitioning (the
        # repartitionByRange + spark_partition_id formulation this
        # operator deliberately avoids) would corrupt ranks
        import random

        from pyspark.sql import Window

        rng = random.Random(7)
        rows = [(i, rng.choice([5, 10, 10, 20, 20, 20, 100000]))
                for i in range(5000)]
        df = spark.createDataFrame(
            rows, "doc_id long, tokens long").repartition(16)
        got = curate.global_rank(df, "tokens", "doc_id").select(
            "doc_id", "grank")
        w = Window.orderBy(F.col("tokens").desc(), F.col("doc_id").asc())
        want = df.select(
            "doc_id",
            F.row_number().over(w).cast("bigint").alias("grank"))
        assert got.exceptAll(want).count() == 0
        assert want.exceptAll(got).count() == 0

    def test_ascending_and_all_equal_weights(self, spark):
        from pyspark.sql import Window

        df = spark.createDataFrame(
            [(i, 42) for i in range(100)], "doc_id long, tokens long")
        got = curate.global_rank(df, "tokens", "doc_id",
                                 descending=False).select("doc_id", "grank")
        w = Window.orderBy(F.col("tokens").asc(), F.col("doc_id").asc())
        want = df.select(
            "doc_id", F.row_number().over(w).cast("bigint").alias("grank"))
        assert got.exceptAll(want).count() == 0
        assert want.exceptAll(got).count() == 0


class TestSerpentineShards:
    def test_doc_counts_within_one_and_weight_balanced(self, spark):
        import random

        rng = random.Random(11)
        rows = [(i, rng.randint(1, 2000)) for i in range(803)]
        df = spark.createDataFrame(rows, "doc_id long, tokens long")
        rep = {r.shard: r for r in
               curate.shard_balance_report(df, 8).collect()}
        assert sorted(rep) == list(range(8))
        n_docs = [rep[s].n_docs for s in range(8)]
        assert max(n_docs) - min(n_docs) <= 1
        w_tot = [rep[s].w_total for s in range(8)]
        # serpentine bounds the spread to ~one document weight per
        # direction change; assert a conservative multiple and that it
        # beats a hash split's typical few-percent imbalance
        assert max(w_tot) - min(w_tot) <= 2 * 2000
        assert sum(r.share_bp for r in rep.values()) <= 10000
        assert sum(rep[s].n_docs for s in range(8)) == 803

    def test_assignment_is_a_permutation_of_ranks(self, spark):
        df = spark.createDataFrame(
            [(i, 10 * (i % 17) + 1) for i in range(50)],
            "doc_id long, tokens long")
        rows = curate.serpentine_shards(df, 4).collect()
        assert sorted(r.grank for r in rows) == list(range(1, 51))
        # rank 1..4 deal left-to-right, 5..8 right-to-left
        by_rank = {r.grank: r.shard for r in rows}
        assert [by_rank[r] for r in range(1, 9)] == [0, 1, 2, 3, 3, 2, 1, 0]


class TestChunkDocuments:
    def test_windows_cover_every_token_with_overlap(self, spark):
        import hashlib

        texts = {
            1: "a b c d e f g",     # 7 tokens, size 4 stride 2 → 4 chunks
            2: "x",                 # single token → one chunk
            3: " ".join(f"t{i}" for i in range(9)),  # 9 tokens
        }
        df = spark.createDataFrame(
            [(k, v) for k, v in texts.items()], "doc_id long, text string")
        got = {(r.doc_id, r.chunk_id): r for r in
               curate.chunk_documents(df, size=4, stride=2).collect()}
        for doc_id, text in texts.items():
            toks = text.split(" ")
            n = len(toks)
            starts = list(range(0, n, 2))
            assert ({c for (d, c) in got if d == doc_id}
                    == set(range(len(starts))))
            for cid, start in enumerate(starts):
                row = got[(doc_id, cid)]
                want = toks[start:start + 4]
                assert row.n_tokens == len(want)
                assert row.chunk_fp == hashlib.md5(
                    " ".join(want).encode()).hexdigest()

    def test_null_text_drops_like_oracle(self, spark):
        df = spark.createDataFrame(
            [(1, "a b"), (2, None)], "doc_id long, text string")
        rows = curate.chunk_documents(df, size=4, stride=2).collect()
        assert {r.doc_id for r in rows} == {1}


class TestEventAnalytics:
    def test_funnel_strictly_after_semantics(self, spark):
        from vulnerablecode_spark.operators.events import funnel_report

        rows = [
            # user 1: full ordered journey
            (1, "2024-01-01T00:00:00", "view"),
            (1, "2024-01-01T01:00:00", "click"),
            (1, "2024-01-01T02:00:00", "purchase"),
            # user 2: click BEFORE the first view → stage 1 only
            (2, "2024-01-01T00:00:00", "click"),
            (2, "2024-01-01T01:00:00", "view"),
            # user 3: purchase before click → stops at stage 2
            (3, "2024-01-01T00:00:00", "view"),
            (3, "2024-01-01T01:00:00", "purchase"),
            (3, "2024-01-01T02:00:00", "click"),
            # user 4: never views → not even stage 1
            (4, "2024-01-01T00:00:00", "click"),
            (4, "2024-01-01T01:00:00", "purchase"),
        ]
        events = spark.createDataFrame(
            [(u, t, e) for u, t, e in rows],
            "user_id long, ts string, event_type string"
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        rep = {r.stage: r for r in
               funnel_report(events,
                             ["view", "click", "purchase"]).collect()}
        assert rep[1].n_users == 3 and rep[1].conv_bp == 10000
        assert rep[2].n_users == 2 and rep[2].conv_bp == 6666
        assert rep[3].n_users == 1 and rep[3].conv_bp == 3333
        import pytest as _pytest

        with _pytest.raises(ValueError):
            funnel_report(events, ["view"])

    def test_retention_cells(self, spark):
        from vulnerablecode_spark.operators.events import retention_cohorts

        rows = [
            (1, "2024-01-01T10:00:00"), (1, "2024-01-01T23:00:00"),
            (1, "2024-01-03T00:30:00"),
            (2, "2024-01-02T05:00:00"),
        ]
        events = spark.createDataFrame(
            rows, "user_id long, ts string"
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        got = {(r.cohort_day.day, r.day_offset): r.n_users
               for r in retention_cohorts(events).collect()}
        assert got == {(1, 0): 1, (1, 2): 1, (2, 0): 1}


class TestAttribution:
    def test_horizon_order_and_tie_semantics(self, spark):
        from vulnerablecode_spark.operators.events import (
            attribute_conversions)

        rows = [
            # user 1: click 1h before purchase → attributed
            (1, "2024-01-01T00:00:00", "click", 10),
            (1, "2024-01-01T01:00:00", "purchase", 11),
            # user 2: click 25h before purchase → beyond horizon
            (2, "2024-01-01T00:00:00", "click", 20),
            (2, "2024-01-02T01:00:00", "purchase", 21),
            # user 3: click only AFTER the purchase → unattributed
            (3, "2024-01-01T05:00:00", "purchase", 30),
            (3, "2024-01-01T06:00:00", "click", 31),
            # user 4: click at the SAME microsecond → inclusive match;
            # two same-instant clicks resolve to max event_id
            (4, "2024-01-01T02:00:00", "click", 40),
            (4, "2024-01-01T02:00:00", "click", 41),
            (4, "2024-01-01T02:00:00", "purchase", 42),
        ]
        events = spark.createDataFrame(
            [(u, t, e, i) for u, t, e, i in rows],
            "user_id long, ts string, event_type string, event_id long"
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        got = {r.conv_id: r for r in
               attribute_conversions(events).collect()}
        assert got[11].touch_id == 10
        assert got[11].gap_us == 3_600_000_000
        assert got[21].touch_id is None and got[21].gap_us is None
        assert got[30].touch_id is None
        assert got[42].touch_id == 41 and got[42].gap_us == 0


class TestChunkDedup:
    def test_planted_duplicate_loses_all_chunks(self, spark):
        long_text = " ".join(f"w{i}" for i in range(130))
        docs = spark.createDataFrame(
            [(1, long_text), (2, long_text),
             (3, " ".join(f"u{i}" for i in range(70)))],
            "doc_id long, text string")
        rep = {r.doc_id: r for r in
               curate.chunk_dedup_report(docs, size=64).collect()}
        # doc 1 first by id: keeps all 3 chunks (130 tokens → 3)
        assert rep[1].n_chunks == 3 and rep[1].kept_bp == 10000
        # doc 2 is an exact replica: loses every chunk
        assert rep[2].kept_chunks == 0 and rep[2].kept_bp == 0
        # doc 3 unique: keeps both chunks
        assert rep[3].n_chunks == 2 and rep[3].kept_bp == 10000


class TestActiveUsers:
    def test_dau_and_trailing_window(self, spark):
        from vulnerablecode_spark.operators.events import active_users

        rows = [
            (1, "2024-01-01T10:00:00"), (2, "2024-01-01T11:00:00"),
            (1, "2024-01-03T09:00:00"),
            (3, "2024-01-09T09:00:00"),  # window Jan 3-9 keeps user 1
            (3, "2024-01-10T09:00:00"),  # window Jan 4-10: only user 3
        ]
        events = spark.createDataFrame(
            rows, "user_id long, ts string"
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        got = {str(r.day): (r.dau, r.wau)
               for r in active_users(events, window_days=7).collect()}
        # day 1: users {1,2}; day 3: dau {1}, wau still {1,2};
        # day 9's trailing window [Jan 3, Jan 9] still holds user 1;
        # day 10's [Jan 4, Jan 10] holds only user 3
        assert got["2024-01-01"] == (2, 2)
        assert got["2024-01-03"] == (1, 2)
        assert got["2024-01-09"] == (1, 2)
        assert got["2024-01-10"] == (1, 1)


class TestWeightedSample:
    def test_exact_es_ordering_and_contracts(self, spark):
        import hashlib
        import math

        rows = [(i, "en" if i % 2 == 0 else "fr", (i % 7) + 1)
                for i in range(1, 41)] + [(99, "en", 0), (100, "fr", -3)]
        df = spark.createDataFrame(
            rows, "doc_id long, lang string, tokens long")
        got = curate.weighted_sample(df, 3, group_col="lang").collect()

        def lnkey(doc_id, w):
            h = int(hashlib.md5(f"ws:{doc_id}".encode())
                    .hexdigest()[:15], 16)
            return math.log((h + 1) / float(1 << 60)) / w

        for lang in ("en", "fr"):
            want = sorted(
                [(i, l, w) for i, l, w in rows if l == lang and w > 0],
                key=lambda r: (-lnkey(r[0], r[2]), r[0]))[:3]
            got_lang = sorted([r for r in got if r.lang == lang],
                              key=lambda r: r.rk)
            assert [r.doc_id for r in got_lang] == [w[0] for w in want]
        # non-positive weights never sampled
        assert all(r.doc_id not in (99, 100) for r in got)

    def test_heavy_weight_dominates(self, spark):
        rows = [(i, 1) for i in range(1, 50)] + [(1000, 10_000_000)]
        df = spark.createDataFrame(rows, "doc_id long, tokens long")
        top = curate.weighted_sample(df, 1).head()
        assert top.doc_id == 1000


class TestRateAnomalies:
    def test_spike_flagged_history_required(self, spark):
        from vulnerablecode_spark.operators.events import rate_anomalies

        rows = []
        eid = 0
        # 24 hours alternating 9/11 events (mean 10, var 1), then a
        # 100-event spike in hour 24
        for h in range(24):
            for _ in range(9 if h % 2 == 0 else 11):
                rows.append((eid, f"2024-01-01T{h:02d}:30:00", "click"))
                eid += 1
        for _ in range(100):
            rows.append((eid, "2024-01-02T00:15:00", "click"))
            eid += 1
        events = spark.createDataFrame(
            rows, "event_id long, ts string, event_type string"
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        got = {r.hour.isoformat(): r
               for r in rate_anomalies(events, trailing=24).collect()}
        spike = got["2024-01-02T00:00:00"]
        assert spike.is_anomaly is True
        assert spike.z_bp == 900_000  # (100-10)/1 = 90 sigma
        # first 24 hours lack a full window → NULL z, NULL flag
        assert got["2024-01-01T05:00:00"].z_bp is None
        assert got["2024-01-01T05:00:00"].is_anomaly is None


class TestJsonPropsRollup:
    def test_malformed_and_missing_count_as_null(self, spark):
        from vulnerablecode_spark.operators.events import json_props_rollup

        rows = [
            (1, "a", '{"k": 5}'),
            (2, "a", '{"k": 7}'),
            (3, "a", '{"other": 1}'),   # missing field
            (4, "a", 'not json'),        # malformed
            (5, "b", '{"k": 5}'),
        ]
        events = spark.createDataFrame(
            rows, "event_id long, event_type string, props string")
        got = {r.event_type: r for r in json_props_rollup(events).collect()}
        a = got["a"]
        assert (a.n_events, a.n_missing, a.k_min, a.k_max,
                a.k_sum, a.k_distinct) == (4, 2, 5, 7, 12, 2)
        assert got["b"].n_missing == 0 and got["b"].k_sum == 5


class TestTransitionMatrix:
    def test_counts_rates_and_stream_boundaries(self, spark):
        from vulnerablecode_spark.operators.events import transition_matrix

        rows = [
            (1, "2024-01-01T00:00:00", "view", 1),
            (1, "2024-01-01T01:00:00", "click", 2),
            (1, "2024-01-01T02:00:00", "view", 3),
            (1, "2024-01-01T03:00:00", "click", 4),
            (2, "2024-01-01T00:00:00", "click", 5),   # no prev → no row
            (2, "2024-01-01T01:00:00", "purchase", 6),
        ]
        events = spark.createDataFrame(
            rows, "user_id long, ts string, event_type string, "
                  "event_id long"
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        got = {(r.prev_type, r.next_type): (r.n, r.rate_bp)
               for r in transition_matrix(events).collect()}
        # user 1: view→click ×2, click→view ×1; user 2: click→purchase
        assert got[("view", "click")] == (2, 10000)
        assert got[("click", "view")] == (1, 5000)
        assert got[("click", "purchase")] == (1, 5000)
        # first event of each user stream produces no transition
        assert len(got) == 3


class TestGlobalRankProperty:
    def test_hypothesis_weights_vs_single_window(self, spark):
        """Property: for ANY weight multiset (ties, skew, tiny and huge
        values) and any input partitioning, global_rank equals the
        single-partition window ROW_NUMBER. Randomized via hypothesis
        strategies but executed as one batched Spark comparison per
        example set (Spark jobs are too slow for per-example runs)."""
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from pyspark.sql import Window

        @settings(max_examples=5, deadline=None)
        @given(st.lists(st.integers(min_value=0, max_value=10**12),
                        min_size=1, max_size=300),
               st.integers(min_value=1, max_value=16),
               st.booleans())
        def check(weights, parts, descending):
            rows = [(i, w + 1) for i, w in enumerate(weights)]
            df = spark.createDataFrame(
                rows, "doc_id long, tokens long").repartition(parts)
            got = curate.global_rank(
                df, "tokens", "doc_id",
                descending=descending).select("doc_id", "grank")
            order = (F.col("tokens").desc() if descending
                     else F.col("tokens").asc())
            w = Window.orderBy(order, F.col("doc_id").asc())
            want = df.select(
                "doc_id",
                F.row_number().over(w).cast("bigint").alias("grank"))
            diff = got.exceptAll(want).count() + want.exceptAll(got).count()
            assert diff == 0

        check()


class TestKsDrift:
    def test_identical_and_shifted_distributions(self, spark):
        # group "same" draws the corpus-majority distribution → small D;
        # group "hi" sits entirely above it → D near its mass share
        rows = ([(i, "same", (i % 5) + 1) for i in range(100)]
                + [(1000 + i, "hi", 100 + (i % 3)) for i in range(50)])
        df = spark.createDataFrame(
            rows, "doc_id long, source string, tokens long")
        got = {r.source: r for r in
               curate.ks_drift(df, value_col="tokens",
                               group_col="source").collect()}
        assert got["same"].n_rows == 100 and got["hi"].n_rows == 50
        # at any value < 100: ECDF_hi = 0 while ECDF_corpus = 100/150
        assert got["hi"].ks_bp == 6666
        # "same" differs from the corpus only by "hi"'s upper mass
        assert got["same"].ks_bp == 3334
    def test_self_corpus_is_zero(self, spark):
        df = spark.createDataFrame(
            [(i, "only", (i % 7) + 1) for i in range(50)],
            "doc_id long, source string, tokens long")
        assert curate.ks_drift(df).head().ks_bp == 0


class TestQuantileCalibrate:
    def test_cdf_matching_semantics(self, spark):
        # source "low" holds values 1..4, source "high" 101..104; after
        # calibration both map onto the CORPUS distribution: the k-th of
        # 4 in either source lands at the same corpus quantile value
        rows = ([(i, "low", i) for i in range(1, 5)]
                + [(10 + i, "high", 100 + i) for i in range(1, 5)])
        df = spark.createDataFrame(
            rows, "doc_id long, source string, tokens long")
        got = {(r.source, r.tokens): r for r in
               curate.quantile_calibrate(df, value_col="tokens",
                                         group_col="source").collect()}
        # both sources' k-th values share src_bp → identical calibration
        for k in range(1, 5):
            lo = got[("low", k)]
            hi = got[("high", 100 + k)]
            assert lo.src_bp == hi.src_bp == k * 10000 // 4
            assert lo.calibrated == hi.calibrated
        # top of each source maps to the corpus maximum
        assert got[("low", 4)].calibrated == 104
        # calibrated values are drawn from the corpus value set
        corpus_vals = {r[2] for r in rows}
        assert all(r.calibrated in corpus_vals for r in got.values())

    def test_identity_when_one_source(self, spark):
        # a single source IS the corpus: calibration maps each value to
        # the corpus value at its own quantile — identity for distinct
        # values
        rows = [(i, "s", i * 10) for i in range(1, 21)]
        df = spark.createDataFrame(
            rows, "doc_id long, source string, tokens long")
        got = curate.quantile_calibrate(
            df, value_col="tokens", group_col="source").collect()
        assert all(r.calibrated == r.tokens for r in got)


class TestZorderKey:
    def test_deinterleave_recovers_inputs(self, spark):
        from vulnerablecode_spark.functions.layout import zorder_key

        import random

        rng = random.Random(3)
        rows = [(i, rng.randrange(1 << 16), rng.randrange(1 << 16))
                for i in range(200)]
        df = spark.createDataFrame(rows, "i long, x long, y long")
        got = df.select(
            "i", "x", "y",
            zorder_key([F.col("x"), F.col("y")], bits=16).alias("z")
        ).collect()

        def deinterleave(z):
            x = y = 0
            for b in range(16):
                x |= ((z >> (2 * b + 1)) & 1) << b
                y |= ((z >> (2 * b)) & 1) << b
            return x, y

        for r in got:
            assert deinterleave(r.z) == (r.x, r.y)

    def test_locality_beats_single_column_sort(self, spark):
        # the point of the layout: sort by zkey, cut into row-group-
        # sized runs, and BOTH columns' per-run min/max ranges must be
        # narrow — under a single-column sort the second column's range
        # per run spans the whole domain
        from vulnerablecode_spark.functions.layout import zorder_key

        rows = [(x, y) for x in range(64) for y in range(64)]
        df = spark.createDataFrame(rows, "x long, y long")
        z = df.select("x", "y", zorder_key(
            [F.col("x"), F.col("y")], bits=6).alias("z")).collect()
        z.sort(key=lambda r: r.z)
        run = 256  # rows per simulated row group
        spans_x, spans_y = [], []
        for i in range(0, len(z), run):
            grp = z[i:i + run]
            spans_x.append(max(r.x for r in grp) - min(r.x for r in grp))
            spans_y.append(max(r.y for r in grp) - min(r.y for r in grp))
        # 256 = 16x16 Morton tile: both dimensions span 15 per run,
        # vs 63 for the non-sorted dimension of a lexicographic sort
        assert max(spans_x) <= 16 and max(spans_y) <= 16

    def test_budget_guard(self, spark):
        from vulnerablecode_spark.functions.layout import zorder_key

        import pytest as _pytest

        with _pytest.raises(ValueError):
            zorder_key([F.col("x")] * 4, bits=16)
        with _pytest.raises(ValueError):
            zorder_key([])


class TestShardsIncremental:
    def test_empty_store_equals_batch_assignment(self, spark):
        import random

        rng = random.Random(5)
        rows = [(i, rng.randint(1, 500)) for i in range(200)]
        df = spark.createDataFrame(rows, "doc_id long, tokens long")
        empty = spark.createDataFrame(
            [(s, 0) for s in range(8)], "shard int, w_total long")
        inc = {r.doc_id: r.shard for r in
               curate.serpentine_shards_incremental(
                   empty, df, 8).collect()}
        batch = {r.doc_id: r.shard for r in
                 curate.serpentine_shards(df, 8).collect()}
        assert inc == batch

    def test_heaviest_new_doc_lands_on_lightest_shard(self, spark):
        totals = spark.createDataFrame(
            [(s, (s + 1) * 1000) for s in range(4)],
            "shard int, w_total long")  # shard 0 lightest
        batch = spark.createDataFrame(
            [(1, 900), (2, 800), (3, 700), (4, 600), (5, 500)],
            "doc_id long, tokens long")
        got = {r.doc_id: r.shard for r in
               curate.serpentine_shards_incremental(
                   totals, batch, 4).collect()}
        # pass 1 deals 900..600 onto shards 0,1,2,3; pass 2 reverses:
        # doc 5 (500) back onto shard 3
        assert got == {1: 0, 2: 1, 3: 2, 4: 3, 5: 3}

    def test_overloaded_shard_gets_light_end_of_skewed_batch(self, spark):
        import random

        rng = random.Random(9)
        totals = spark.createDataFrame(
            [(0, 50_000), (1, 0), (2, 0), (3, 0)],
            "shard int, w_total long")  # shard 0 grossly overloaded
        # skewed batch: a few huge docs dominate the weight
        rows = ([(i, rng.randint(10, 20)) for i in range(100)]
                + [(1000, 100_000), (1001, 60_000), (1002, 40_000)])
        batch = spark.createDataFrame(rows, "doc_id long, tokens long")
        assigned = curate.serpentine_shards_incremental(
            totals, batch, 4)
        got = {r.doc_id: r.shard for r in assigned.collect()}
        # the three huge docs fill the three EMPTY shards (lightest
        # first by id tie-break); the overloaded shard 0 only gets the
        # light end of the first pass
        assert got[1000] == 1 and got[1001] == 2 and got[1002] == 3
        per = {r.shard: r.n for r in
               assigned.groupBy("shard").agg(
                   F.count(F.lit(1)).alias("n")).collect()}
        assert max(per.values()) - min(per.values()) <= 1
        w = {r.shard: r.w for r in
             assigned.groupBy("shard").agg(
                 F.sum("tokens").alias("w")).collect()}
        assert w[0] == min(w.values())


class TestGrowthAccounting:
    def test_new_returning_and_cumulative(self, spark):
        from vulnerablecode_spark.operators.events import growth_accounting

        rows = [
            (1, "2024-01-01T10:00:00"), (2, "2024-01-01T11:00:00"),
            (1, "2024-01-02T09:00:00"), (3, "2024-01-02T10:00:00"),
            (1, "2024-01-02T23:00:00"),  # same user-day: one active row
        ]
        events = spark.createDataFrame(
            rows, "user_id long, ts string"
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        got = {r.day: (r.n_new, r.n_returning, r.cum_users)
               for r in growth_accounting(events).collect()}
        assert got["2024-01-01"] == (2, 0, 2)
        assert got["2024-01-02"] == (1, 1, 3)


class TestSessionPmi:
    def test_pair_counts_and_sign(self, spark):
        import math

        from vulnerablecode_spark.operators.events import (
            session_cooccurrence_pmi)

        # 4 sessions (distinct users, far-apart events stay one session
        # each within the 12h gap): a+b together twice, c alone twice
        rows = [
            (1, "2024-01-01T00:00:00", "a", 1),
            (1, "2024-01-01T01:00:00", "b", 2),
            (2, "2024-01-01T00:00:00", "a", 3),
            (2, "2024-01-01T01:00:00", "b", 4),
            (3, "2024-01-01T00:00:00", "c", 5),
            (4, "2024-01-01T00:00:00", "c", 6),
        ]
        events = spark.createDataFrame(
            rows, "user_id long, ts string, event_type string, "
                  "event_id long"
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        got = {(r.type_a, r.type_b): r for r in
               session_cooccurrence_pmi(events).collect()}
        ab = got[("a", "b")]
        # n=4 sessions, n_a=n_b=2, n_ab=2 → PMI = ln(4·2/(2·2)) = ln 2
        assert ab.n_ab == 2
        assert ab.pmi == round(math.log(2), 4)
        # c never co-occurs → no (a,c)/(b,c) rows at all
        assert set(got) == {("a", "b")}

    def test_gap_splits_sessions(self, spark):
        from vulnerablecode_spark.operators.events import (
            session_cooccurrence_pmi)

        # same user, 13h apart → two sessions, so a and b never co-occur
        rows = [(1, "2024-01-01T00:00:00", "a", 1),
                (1, "2024-01-01T13:00:00", "b", 2)]
        events = spark.createDataFrame(
            rows, "user_id long, ts string, event_type string, "
                  "event_id long"
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        assert session_cooccurrence_pmi(events).count() == 0


class TestEventCube:
    def test_marginals_consistent(self, spark):
        import vulnerablecode_spark.plans.relational  # noqa: F401
        from vulnerablecode_spark.plans import QUERIES

        from tests.conftest import SF_SMOKE

        rows = QUERIES["q159_event_cube"](spark, SF_SMOKE).collect()
        total = [r for r in rows if r.g_day == 1 and r.g_type == 1]
        assert len(total) == 1
        by_type = [r for r in rows if r.g_day == 1 and r.g_type == 0]
        by_day = [r for r in rows if r.g_day == 0 and r.g_type == 1]
        cells = [r for r in rows if r.g_day == 0 and r.g_type == 0]
        for sub in (by_type, by_day, cells):
            assert sum(r.n_events for r in sub) == total[0].n_events
            assert sum(r.value_sum_q for r in sub) == total[0].value_sum_q
