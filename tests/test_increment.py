"""Composed incremental maintenance (streaming/increment.py): one pass
per batch updates the near-dup LSH index, the line-dedup count/postings/
cleaned artifacts (incl. the q110 retro re-clean), and the IVF
assignments — atomically, idempotently, and crash-resumably."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vulnerablecode_spark.llm import dedup as nd
from vulnerablecode_spark.streaming import increment as inc


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


BATCH1 = [
    (1, "common seg one alpha beta gamma"),
    (2, "common seg one delta eps zeta"),
    (3, "totally unique text in here now"),
]
BATCH2 = [
    (10, "common seg one batch two tail"),
    (11, "alpha beta gamma delta eps zeta"),
    (12, "totally unique text in here now"),
]


def _emb(spark, ids, dim=4):
    rows = [(i, [float((i * 7 + j * 3) % 5 + 1) for j in range(dim)])
            for i in ids]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


class TestApplyIncrement:
    def _apply_both(self, spark, root, **kw):
        inc.apply_increment(spark, _docs(spark, BATCH1), root, batch_id=1,
                            embeddings=_emb(spark, [1, 2, 3]), **kw)
        inc.apply_increment(spark, _docs(spark, BATCH2), root, batch_id=2,
                            embeddings=_emb(spark, [10, 11, 12]), **kw)

    def test_cleaned_equals_batch_clean_of_full_corpus(self, spark, tmp_path):
        # the q110 invariant, driven end-to-end through the composed
        # driver: incremental clean + retro re-clean across two batches
        # == batch line_level_dedup over everything, for ALL docs
        root = str(tmp_path / "store")
        self._apply_both(spark, root)
        served = {r.doc_id: (r.cleaned_text, r.segs_total, r.segs_dropped)
                  for r in inc.read_cleaned(spark, root).collect()}
        full = _docs(spark, BATCH1 + BATCH2)
        batch = {r.doc_id: (r.cleaned_text, r.segs_total, r.segs_dropped)
                 for r in nd.line_level_dedup(
                     full, w=3, boilerplate_min_docs=3).collect()}
        assert served == batch
        # batch 2 pushes "common seg one" to 3 docs -> docs 1/2 must have
        # been retro re-cleaned (shadowed by a _batch=2 row)
        assert served[1][0] == "alpha beta gamma"
        assert served[2][0] == "delta eps zeta"

    def test_pairs_union_equals_batch_near_dup(self, spark, tmp_path):
        root = str(tmp_path / "store")
        self._apply_both(spark, root)
        got = {(r.doc_a, r.doc_b, r.jaccard)
               for r in inc.read_pairs(spark, root).collect()}
        want = {(r.doc_a, r.doc_b, r.jaccard)
                for r in nd.near_dup_pairs(
                    _docs(spark, BATCH1 + BATCH2), threshold=0.4).collect()}
        assert got == want and got  # (3,12) is an exact dup pair

    def test_seg_counts_additive(self, spark, tmp_path):
        root = str(tmp_path / "store")
        self._apply_both(spark, root)
        got = {(r.seg, r.n_docs)
               for r in inc.read_seg_counts(spark, root).collect()}
        want = {(r.seg, r.n_docs)
                for r in nd.line_seg_counts(
                    _docs(spark, BATCH1 + BATCH2), w=3).collect()}
        assert got == want

    def test_ivf_assignments_cover_all_vectors(self, spark, tmp_path):
        root = str(tmp_path / "store")
        self._apply_both(spark, root)
        assigned = inc.read_ivf_assigned(spark, root)
        assert {r.vec_id for r in assigned.collect()} == {1, 2, 3, 10, 11, 12}
        assert inc.read_ivf_centroids(spark, root) is not None
        ledger = inc.read_ledger(root)
        assert [b["batch_id"] for b in ledger["batches"]] == [1, 2]
        assert ledger["batches"][0]["ivf_first_build"] is True
        assert ledger["batches"][1]["ivf_first_build"] is False
        assert ledger["watermark"] == "2"

    def test_cluster_labels_match_batch_cc(self, spark, tmp_path):
        # q115 composed: the maintained labels equal batch CC over the
        # near-dup pairs of the FULL corpus (docs 3 and 12 are exact
        # dups across batches -> one merged cluster)
        from vulnerablecode_spark.operators.components import \
            connected_components

        root = str(tmp_path / "store")
        self._apply_both(spark, root)
        got = {(r.node, r.component)
               for r in inc.read_components(spark, root).collect()}
        pairs = nd.near_dup_pairs(_docs(spark, BATCH1 + BATCH2),
                                  threshold=0.4)
        want = {(r.node, r.component)
                for r in connected_components(
                    pairs.select(F.col("doc_a").alias("src"),
                                 F.col("doc_b").alias("dst"))).collect()}
        assert got == want and got

    def test_replay_is_noop(self, spark, tmp_path):
        root = str(tmp_path / "store")
        self._apply_both(spark, root)
        before = sorted(map(tuple, inc.read_cleaned(spark, root).collect()))
        out = inc.apply_increment(spark, _docs(spark, BATCH2), root,
                                  batch_id=2)
        assert out == {"applied": False, "batch_id": 2}
        after = sorted(map(tuple, inc.read_cleaned(spark, root).collect()))
        assert before == after
        assert [b["batch_id"] for b in inc.read_ledger(root)["batches"]] \
            == [1, 2]


class TestCrashResume:
    @pytest.mark.parametrize("fault", ["staged", "committed", "mid-install"])
    def test_kill_then_resume_matches_clean_run(self, spark, tmp_path, fault):
        crashed = str(tmp_path / "crashed")
        clean = str(tmp_path / "clean")
        for root in (crashed, clean):
            inc.apply_increment(spark, _docs(spark, BATCH1), root, batch_id=1,
                                embeddings=_emb(spark, [1, 2, 3]))
        with pytest.raises(RuntimeError, match="fault injection"):
            inc.apply_increment(spark, _docs(spark, BATCH2), crashed,
                                batch_id=2, embeddings=_emb(spark, [10, 11, 12]),
                                fault_after=fault)
        # next driver entry recovers, then (re)applies the batch — a
        # pre-marker crash rolls back and re-runs; a post-marker crash
        # rolls forward and the apply becomes a ledger no-op
        inc.apply_increment(spark, _docs(spark, BATCH2), crashed, batch_id=2,
                            embeddings=_emb(spark, [10, 11, 12]))
        inc.apply_increment(spark, _docs(spark, BATCH2), clean, batch_id=2,
                            embeddings=_emb(spark, [10, 11, 12]))
        for reader in (inc.read_cleaned, inc.read_pairs, inc.read_seg_counts,
                       inc.read_postings, inc.read_hashed, inc.read_bands,
                       inc.read_docs, inc.read_ivf_assigned,
                       inc.read_components, inc.read_vocab,
                       inc.read_bm25_postings, inc.read_bm25_lengths,
                       inc.read_bigram_counts, inc.read_lang_tokens,
                       inc.read_token_sketch, inc.read_hll_registers):
            a = sorted(map(tuple, reader(spark, crashed).collect()))
            b = sorted(map(tuple, reader(spark, clean).collect()))
            assert a == b, reader.__name__
        assert [b["batch_id"] for b in inc.read_ledger(crashed)["batches"]] \
            == [1, 2]

    def test_rollback_leaves_prebatch_state_readable(self, spark, tmp_path):
        root = str(tmp_path / "store")
        inc.apply_increment(spark, _docs(spark, BATCH1), root, batch_id=1)
        before = sorted(map(tuple, inc.read_cleaned(spark, root).collect()))
        with pytest.raises(RuntimeError):
            inc.apply_increment(spark, _docs(spark, BATCH2), root, batch_id=2,
                                fault_after="staged")
        # reader entry rolls the uncommitted staging back
        after = sorted(map(tuple, inc.read_cleaned(spark, root).collect()))
        assert before == after
        assert [b["batch_id"] for b in inc.read_ledger(root)["batches"]] == [1]


class TestCompaction:
    def _store(self, spark, tmp_path):
        root = str(tmp_path / "store")
        inc.apply_increment(spark, _docs(spark, BATCH1), root, batch_id=1,
                            embeddings=_emb(spark, [1, 2, 3]))
        inc.apply_increment(spark, _docs(spark, BATCH2), root, batch_id=2,
                            embeddings=_emb(spark, [10, 11, 12]))
        return root

    def _snapshot(self, spark, root):
        out = {}
        for reader in (inc.read_cleaned, inc.read_pairs,
                       inc.read_seg_counts, inc.read_postings,
                       inc.read_hashed, inc.read_bands, inc.read_docs,
                       inc.read_ivf_assigned, inc.read_components):
            out[reader.__name__] = sorted(
                map(tuple, reader(spark, root).collect()))
        return out

    def test_readers_identical_before_and_after(self, spark, tmp_path):
        import os

        root = self._store(spark, tmp_path)
        before = self._snapshot(spark, root)
        res = inc.compact(spark, root)
        assert res["compacted"] and res["through_batch"] == 2
        assert self._snapshot(spark, root) == before
        # delta count actually bounded: one base delta per artifact
        for rel in (inc.LD_COUNTS, inc.LD_CLEANED, inc.ND_PAIRS):
            deltas = [d for d in os.listdir(os.path.join(root, rel))
                      if d.startswith("delta-")]
            assert deltas == ["delta-base-2"], (rel, deltas)
        assert [c["through_batch"]
                for c in inc.read_ledger(root)["compactions"]] == [2]

    def test_apply_after_compact_still_exact(self, spark, tmp_path):
        root = self._store(spark, tmp_path)
        inc.compact(spark, root)
        batch3 = [(20, "common seg one appended later"),
                  (21, "alpha beta gamma more text")]
        inc.apply_increment(spark, _docs(spark, batch3), root, batch_id=3)
        full = _docs(spark, BATCH1 + BATCH2 + batch3)
        served = {r.doc_id: (r.cleaned_text, r.segs_total, r.segs_dropped)
                  for r in inc.read_cleaned(spark, root).collect()}
        batch = {r.doc_id: (r.cleaned_text, r.segs_total, r.segs_dropped)
                 for r in nd.line_level_dedup(
                     full, w=3, boilerplate_min_docs=3).collect()}
        assert served == batch

    @pytest.mark.parametrize("fault", ["staged", "committed"])
    def test_compact_crash_resume(self, spark, tmp_path, fault):
        root = self._store(spark, tmp_path)
        before = self._snapshot(spark, root)
        with pytest.raises(RuntimeError, match="fault injection"):
            inc.compact(spark, root, fault_after=fault)
        # any reader entry recovers to a consistent state: pre-compaction
        # for a pre-marker crash, post-compaction for a post-marker one —
        # either way the resolved frames are identical
        assert self._snapshot(spark, root) == before
        if fault == "committed":
            assert inc.read_ledger(root).get("compactions")


class TestBm25Artifacts:
    def test_index_equals_batch_build_and_survives_compact(
            self, spark, tmp_path):
        # the q116 invariant driven through the composed driver: scoring
        # from the stored postings/lengths after two appends == one-shot
        # bm25_topk over the full corpus; compaction preserves it
        from vulnerablecode_spark.llm.text import (bm25_topk,
                                                   bm25_topk_from_index)

        root = str(tmp_path / "store")
        inc.apply_increment(spark, _docs(spark, BATCH1), root, batch_id=1)
        inc.apply_increment(spark, _docs(spark, BATCH2), root, batch_id=2)
        terms = ["common", "gamma", "unique"]

        def served():
            return sorted(tuple(r) for r in bm25_topk_from_index(
                inc.read_bm25_postings(spark, root),
                inc.read_bm25_lengths(spark, root), terms, k=10).collect())

        want = sorted(tuple(r) for r in bm25_topk(
            _docs(spark, BATCH1 + BATCH2), terms, k=10).collect())
        assert served() == want
        inc.compact(spark, root)
        assert served() == want


class TestBigramLmArtifact:
    def test_counts_additive_and_scoring_matches_batch(self, spark,
                                                       tmp_path):
        # the q121 invariant through the composed driver: summed count
        # deltas == from-scratch counts; scoring any docs against the
        # store's model == scoring against a fresh full-corpus model
        from vulnerablecode_spark.llm.text import (bigram_counts,
                                                   bigram_lm_scores,
                                                   bigram_lm_scores_for)

        root = str(tmp_path / "store")
        inc.apply_increment(spark, _docs(spark, BATCH1), root, batch_id=1)
        inc.apply_increment(spark, _docs(spark, BATCH2), root, batch_id=2)
        full = _docs(spark, BATCH1 + BATCH2)
        got = {(r.w1, r.w2): r.c_big
               for r in inc.read_bigram_counts(spark, root).collect()}
        want = {(r.w1, r.w2): r.c_big
                for r in bigram_counts(full).collect()}
        assert got == want
        vocab = (inc.read_bm25_postings(spark, root).select("tok")
                 .agg(F.countDistinct("tok").cast("bigint")
                      .alias("v_size")))
        served = sorted(tuple(r) for r in bigram_lm_scores_for(
            full, inc.read_bigram_counts(spark, root), vocab).collect())
        batch = sorted(tuple(r) for r in bigram_lm_scores(full).collect())
        assert served == batch
        inc.compact(spark, root)
        got2 = {(r.w1, r.w2): r.c_big
                for r in inc.read_bigram_counts(spark, root).collect()}
        assert got2 == want


class TestLangTokensArtifact:
    def test_counts_additive_and_unimax_matches_batch(self, spark,
                                                      tmp_path):
        # the q126 invariant through the composed driver: summed
        # per-batch language-token deltas == from-scratch counts, and
        # the water-fill from the store == the batch operator
        from vulnerablecode_spark.llm import curate

        def _ldocs(rows):
            return spark.createDataFrame(
                rows, "doc_id long, text string, lang string")

        b1 = _ldocs([(1, "a b c", "en"), (2, "d e", "fr"),
                     (3, "f g h i", None)])
        b2 = _ldocs([(10, "j k", "en"), (11, "l m n o p q", "de")])
        root = str(tmp_path / "store")
        inc.apply_increment(spark, b1, root, batch_id=1)
        inc.apply_increment(spark, b2, root, batch_id=2)
        got = {r.lang: r.lang_tokens
               for r in inc.read_lang_tokens(spark, root).collect()}
        full = b1.unionByName(b2)
        want = {r.lang: r.lang_tokens
                for r in curate.lang_token_counts(full).collect()}
        assert got == want and "__null__" in got
        served = sorted(tuple(r) for r in curate.unimax_from_counts(
            inc.read_lang_tokens(spark, root), 12, max_epochs=2)
            .collect())
        batch = sorted(tuple(r) for r in curate.unimax_allocate(
            full, 12, max_epochs=2).collect())
        assert served == batch
        # compaction folds the deltas into one base; readers unchanged
        inc.compact(spark, root)
        got2 = {r.lang: r.lang_tokens
                for r in inc.read_lang_tokens(spark, root).collect()}
        assert got2 == want

    def test_langless_batch_folds_to_null_sentinel(self, spark, tmp_path):
        root = str(tmp_path / "store")
        inc.apply_increment(spark, _docs(spark, BATCH1), root, batch_id=1)
        got = {r.lang: r.lang_tokens
               for r in inc.read_lang_tokens(spark, root).collect()}
        assert set(got) == {"__null__"}
        assert got["__null__"] == sum(len(t.split()) for _, t in BATCH1)


class TestVocabIndex:
    def test_index_equals_batch_first_seen_and_survives_compact(
            self, spark, tmp_path):
        from vulnerablecode_spark.llm.text import (
            vocabulary_growth, vocabulary_growth_incremental)

        root = str(tmp_path / "store")
        inc.apply_increment(spark, _docs(spark, BATCH1), root, batch_id=1)
        inc.apply_increment(spark, _docs(spark, BATCH2), root, batch_id=2)
        got = {r.tok: r.first_batch
               for r in inc.read_vocab(spark, root).collect()}
        full = _docs(spark, BATCH1 + BATCH2).select(
            F.when(F.col("doc_id") < 10, 1).otherwise(2).alias("batch"),
            "text")
        want = {r.tok: r.batch for r in
                full.select(
                    "batch",
                    F.explode(F.split("text", " ")).alias("tok"))
                .groupBy("tok").agg(F.min("batch").alias("batch"))
                .collect()}
        assert got == want
        # deltas hold NEW types only: batch-2 delta excludes batch-1 toks
        d2 = spark.read.parquet(f"{root}/vocab/firstbatch/delta-2")
        assert d2.filter(F.col("tok") == "common").count() == 0
        assert d2.filter(F.col("tok") == "batch").count() == 1
        # the q147 serving row equals the from-scratch growth curve row
        stored_b1 = inc.read_vocab(spark, root).filter(
            F.col("first_batch") == 1)
        inc_row = vocabulary_growth_incremental(
            stored_b1, _docs(spark, BATCH2), batch_id=2).head()
        batch_row = {r.batch: r for r in
                     vocabulary_growth(full).collect()}[2]
        assert (inc_row.n_tokens, inc_row.new_types, inc_row.cum_types) \
            == (batch_row.n_tokens, batch_row.new_types,
                batch_row.cum_types)
        # compaction preserves the resolved index
        inc.compact(spark, root)
        after = {r.tok: r.first_batch
                 for r in inc.read_vocab(spark, root).collect()}
        assert after == want


class TestTokenSketch:
    def test_store_merge_equals_from_scratch(self, spark, tmp_path):
        # the q161 invariant through the composed store: per-batch
        # bottom-k deltas, re-cut at read, must equal the sketch built
        # over every doc ever applied
        from vulnerablecode_spark.llm.sketch import kmv_sketch

        root = str(tmp_path / "store")
        inc.apply_increment(spark, _docs(spark, BATCH1), root, batch_id=1)
        inc.apply_increment(spark, _docs(spark, BATCH2), root, batch_id=2)
        served = sorted(map(tuple,
                            inc.read_token_sketch(spark, root).collect()))
        full = _docs(spark, BATCH1 + BATCH2).select(
            F.lit("__null__").alias("lang"),
            F.explode(F.split(F.col("text"), " ")).alias("tok"))
        scratch = sorted(map(tuple, kmv_sketch(
            full, F.col("tok"), k=inc.KMV_K,
            group_cols=("lang",)).collect()))
        assert served == scratch and served


class TestHllRegisters:
    def test_store_merge_equals_from_scratch(self, spark, tmp_path):
        # the max-merge monoid through the composed store: per-batch
        # register deltas, max-resolved at read, must equal the sketch
        # built over every doc ever applied — and therefore the q182
        # estimate read-off is identical too
        from vulnerablecode_spark.llm.sketch import hll_registers

        root = str(tmp_path / "store")
        inc.apply_increment(spark, _docs(spark, BATCH1), root, batch_id=1)
        inc.apply_increment(spark, _docs(spark, BATCH2), root, batch_id=2)
        served = sorted(map(tuple,
                            inc.read_hll_registers(spark, root).collect()))
        full = _docs(spark, BATCH1 + BATCH2).select(
            F.lit("__null__").alias("lang"),
            F.explode(F.split(F.col("text"), " ")).alias("tok"))
        scratch = sorted(map(tuple, hll_registers(
            full, F.col("tok"), group_cols=("lang",)).collect()))
        assert served == scratch and served

    def test_double_apply_of_same_content_cannot_inflate(self, spark,
                                                         tmp_path):
        # registers are idempotent maxes: even when the SAME documents
        # arrive again as a NEW batch id (upstream at-least-once without
        # dedup — the ledger can't catch it), the resolved registers are
        # unchanged, unlike the additive counts which double. This is
        # the property that makes the register sketch the store's most
        # replay-tolerant artifact.
        root = str(tmp_path / "store")
        inc.apply_increment(spark, _docs(spark, BATCH1), root, batch_id=1)
        before = sorted(map(tuple,
                            inc.read_hll_registers(spark, root).collect()))
        inc.apply_increment(spark, _docs(spark, BATCH1), root, batch_id=2)
        after = sorted(map(tuple,
                           inc.read_hll_registers(spark, root).collect()))
        assert before == after and before

    def test_compaction_preserves_registers(self, spark, tmp_path):
        root = str(tmp_path / "store")
        inc.apply_increment(spark, _docs(spark, BATCH1), root, batch_id=1)
        inc.apply_increment(spark, _docs(spark, BATCH2), root, batch_id=2)
        before = sorted(map(tuple,
                            inc.read_hll_registers(spark, root).collect()))
        inc.compact(spark, root)
        after = sorted(map(tuple,
                           inc.read_hll_registers(spark, root).collect()))
        assert before == after and before
        # folded to ONE base delta dir
        import os
        path = os.path.join(root, inc.SK_HLLREG)
        assert [d for d in os.listdir(path) if d.startswith("delta-")] \
            == [f"delta-base-2"]


class TestReplayAndCommutation:
    """VERDICT r11 directive #4: a 100 TB lakehouse also REPLAYS — a
    retry after a lost ack re-applies an already-committed batch, and
    upstream reordering can deliver two batches in either order. Replay
    must be a no-op for every stored artifact; with batch ids stamped
    in APPLY order (the foreachBatch contract, now enforced), the
    additive stores must commute in batch CONTENT; the order-dependent
    stores are explicitly serialized — vocab first-seen records the
    applied order, the cleaned copy / CC chain resolve by batch id, and
    a non-monotonic id is rejected loudly instead of letting a stale
    higher-stamped row shadow a repair."""

    ALL_READERS = [
        inc.read_docs, inc.read_hashed, inc.read_bands, inc.read_pairs,
        inc.read_postings, inc.read_seg_counts, inc.read_cleaned,
        inc.read_ivf_assigned, inc.read_components, inc.read_vocab,
        inc.read_bm25_postings, inc.read_bm25_lengths,
        inc.read_bigram_counts, inc.read_lang_tokens,
        inc.read_token_sketch, inc.read_hll_registers,
    ]
    # content-additive (or max-merge) artifacts: the two batches applied
    # in either CONTENT order (ids follow apply order) resolve
    # byte-identically
    COMMUTATIVE = [
        inc.read_docs, inc.read_hashed, inc.read_bands,
        inc.read_seg_counts, inc.read_postings, inc.read_bm25_postings,
        inc.read_bm25_lengths, inc.read_bigram_counts,
        inc.read_lang_tokens, inc.read_token_sketch,
        inc.read_hll_registers,
    ]

    @staticmethod
    def _rows(df):
        def norm(v):
            return tuple(v) if isinstance(v, list) else v
        return sorted(tuple(norm(v) for v in r) for r in df.collect())

    def _snapshot(self, spark, root, readers):
        return [self._rows(r(spark, root)) for r in readers]

    def _apply_content_order(self, spark, root, batches):
        # ids stamp APPLY order — the enforced serialization
        for bid, rows in enumerate(batches, start=1):
            inc.apply_increment(spark, _docs(spark, rows), root,
                                batch_id=bid)

    def test_replay_is_noop_for_all_artifacts(self, spark, tmp_path):
        root = str(tmp_path / "store")
        inc.apply_increment(spark, _docs(spark, BATCH1), root, batch_id=1,
                            embeddings=_emb(spark, [1, 2, 3]))
        inc.apply_increment(spark, _docs(spark, BATCH2), root, batch_id=2,
                            embeddings=_emb(spark, [10, 11, 12]))
        before = self._snapshot(spark, root, self.ALL_READERS)
        ledger_before = inc.read_ledger(root)
        # retry after a lost ack: both committed batches come around
        # again, in either order — both must be pure no-ops
        out2 = inc.apply_increment(spark, _docs(spark, BATCH2), root,
                                   batch_id=2,
                                   embeddings=_emb(spark, [10, 11, 12]))
        out1 = inc.apply_increment(spark, _docs(spark, BATCH1), root,
                                   batch_id=1,
                                   embeddings=_emb(spark, [1, 2, 3]))
        assert out1 == {"applied": False, "batch_id": 1}
        assert out2 == {"applied": False, "batch_id": 2}
        after = self._snapshot(spark, root, self.ALL_READERS)
        for rd, b, a in zip(self.ALL_READERS, before, after):
            assert b == a, f"replay mutated {rd.__name__}"
        assert inc.read_ledger(root) == ledger_before

    def test_additive_artifacts_commute(self, spark, tmp_path):
        a, b = str(tmp_path / "a"), str(tmp_path / "b")
        self._apply_content_order(spark, a, [BATCH1, BATCH2])
        self._apply_content_order(spark, b, [BATCH2, BATCH1])
        for rd in self.COMMUTATIVE:
            assert self._rows(rd(spark, a)) == self._rows(rd(spark, b)), \
                f"{rd.__name__} does not commute"
        # near-dup pairs: the SET of pairs commutes (each pair is found
        # exactly once, when its second member arrives)
        pair_a = {(r.doc_a, r.doc_b) for r in inc.read_pairs(spark, a)
                  .collect()}
        pair_b = {(r.doc_a, r.doc_b) for r in inc.read_pairs(spark, b)
                  .collect()}
        assert pair_a == pair_b and pair_a
        # connected components: the PARTITION commutes even if label
        # representatives differ between orders
        def partition(root):
            comp = {}
            for r in inc.read_components(spark, root).collect():
                comp.setdefault(r.component, set()).add(r.node)
            return {frozenset(v) for v in comp.values()}
        assert partition(a) == partition(b)
        # cleaned serving copy: the q110 invariant makes the CONTENT
        # order-free — either order equals the batch clean of the union
        def cleaned(root):
            return {r.doc_id: (r.cleaned_text, r.segs_total,
                               r.segs_dropped)
                    for r in inc.read_cleaned(spark, root).collect()}
        want = {r.doc_id: (r.cleaned_text, r.segs_total, r.segs_dropped)
                for r in nd.line_level_dedup(
                    _docs(spark, BATCH1 + BATCH2), w=3,
                    boilerplate_min_docs=3).collect()}
        assert cleaned(a) == want
        assert cleaned(b) == want

    def test_vocab_first_seen_is_serialized_by_apply_order(
            self, spark, tmp_path):
        # vocab is NOT content-commutative by design: first_batch
        # records which APPLIED batch introduced the type. The type SET
        # commutes; the stamps follow the ledger order.
        a, b = str(tmp_path / "a"), str(tmp_path / "b")
        self._apply_content_order(spark, a, [BATCH1, BATCH2])
        self._apply_content_order(spark, b, [BATCH2, BATCH1])
        va = {r.tok: r.first_batch for r in inc.read_vocab(spark, a)
              .collect()}
        vb = {r.tok: r.first_batch for r in inc.read_vocab(spark, b)
              .collect()}
        assert set(va) == set(vb)
        assert va["common"] == vb["common"] == 1   # in both batches
        b2_only = ({t for row in BATCH2 for t in row[1].split()}
                   - {t for row in BATCH1 for t in row[1].split()})
        assert b2_only
        for t in b2_only:                          # e.g. 'tail'
            assert va[t] == 2 and vb[t] == 1

    def test_non_monotonic_batch_id_rejected(self, spark, tmp_path):
        # a NEVER-committed lower id after a higher one cannot be
        # serialized by the last-batch-wins artifacts (a stale row with
        # a higher stamp would shadow its own repair) — fail loud
        root = str(tmp_path / "store")
        inc.apply_increment(spark, _docs(spark, BATCH2), root, batch_id=5)
        with pytest.raises(ValueError, match="non-monotonic"):
            inc.apply_increment(spark, _docs(spark, BATCH1), root,
                                batch_id=4)
        # the rejected call left no trace
        assert [x["batch_id"] for x in inc.read_ledger(root)["batches"]] \
            == [5]
