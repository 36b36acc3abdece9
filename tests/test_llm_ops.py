"""LLM operator tests beyond the oracle gate: ANN recall vs brute force,
dedup behavior on engineered near-duplicates."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE as SF


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

    def test_pq_codes_shape(self, spark, embeddings):
        from vulnerablecode_spark.llm.similarity import pq_index

        codebooks, codes = pq_index(embeddings)
        n = embeddings.count()
        # every vector gets exactly one code per subspace
        assert codes.count() == n * 8
        per = codes.groupBy("vec_id").count().collect()
        assert all(r["count"] == 8 for r in per)
        # codebooks: ≤16 cells per subspace, 8-dim centroids
        cb = codebooks.collect()
        assert len(cb) <= 16 * 8
        assert all(len(r.centroid) == 8 for r in cb)

    def test_ivf_pq_agrees_with_pq_on_probed_cells(self, spark, embeddings):
        import pyspark.sql.functions as F

        from vulnerablecode_spark.llm.similarity import (ann_topk_ivf_pq,
                                                         ann_topk_pq)

        q = embeddings.filter(F.col("vec_id") < 10)
        pq = {(r.query_id, r.neighbor_id): r.adc_dist_ui
              for r in ann_topk_pq(embeddings, q, k=5).collect()}
        both = {(r.query_id, r.neighbor_id): r.adc_dist_ui
                for r in ann_topk_ivf_pq(embeddings, q, k=5,
                                         nprobe=8).collect()}
        # same ADC distances wherever both rank a pair (identical codes),
        # and probing half the cells keeps most of the PQ-only top-k
        for pair in set(pq) & set(both):
            assert pq[pair] == both[pair]
        overlap = len(set(pq) & set(both)) / len(pq)
        assert overlap >= 0.5, overlap
        # probing ALL cells must recover the PQ-only ranking exactly
        all_cells = {(r.query_id, r.neighbor_id)
                     for r in ann_topk_ivf_pq(embeddings, q, k=5,
                                              nprobe=16).collect()}
        assert all_cells == set(pq)

    def test_pq_recall_beats_random(self, spark, embeddings):
        import pyspark.sql.functions as F
        from pyspark.sql import Window

        from vulnerablecode_spark.llm.similarity import ann_topk_pq

        q = embeddings.filter(F.col("vec_id") < 10)
        # exact L2 top-5 (PQ approximates L2, not cosine)
        c = embeddings.select(F.col("vec_id").alias("neighbor_id"),
                              F.col("embedding").alias("cv"))
        qq = q.select(F.col("vec_id").alias("query_id"),
                      F.col("embedding").alias("qv"))
        dd = F.aggregate(
            F.zip_with(F.transform("qv", lambda x: x.cast("double")),
                       F.transform("cv", lambda x: x.cast("double")),
                       lambda a, b: (a - b) * (a - b)),
            F.lit(0.0), lambda s, x: s + x)
        w = Window.partitionBy("query_id").orderBy(
            F.col("d").asc(), F.col("neighbor_id").asc())
        exact = {(r.query_id, r.neighbor_id) for r in
                 c.join(F.broadcast(qq))
                 .filter(F.col("query_id") != F.col("neighbor_id"))
                 .select("query_id", "neighbor_id", dd.alias("d"))
                 .withColumn("rk", F.row_number().over(w))
                 .filter("rk <= 5").collect()}
        approx = {(r.query_id, r.neighbor_id)
                  for r in ann_topk_pq(embeddings, q, k=5).collect()}
        recall = len(exact & approx) / len(exact)
        # uniform-random embeddings are PQ's adversarial case (distances
        # concentrate); the bar is "far above chance" (chance ≈ 5/n)
        assert recall >= 0.1, recall


class TestArrowScoringEquivalence:
    """The Arrow-vectorized scoring kernels must produce the SAME values
    as the JVM HOF folds — same IEEE accumulation order, not just close."""

    def test_cosine_arrow_equals_hof(self, spark, embeddings):
        from vulnerablecode_spark.llm.similarity import cosine_topk

        q = embeddings.filter(F.col("vec_id") < 12)
        hof = {(r.query_id, r.neighbor_id): (r.cosine_sim, r.rk)
               for r in cosine_topk(embeddings, q, k=7, impl="hof").collect()}
        arrow = {(r.query_id, r.neighbor_id): (r.cosine_sim, r.rk)
                 for r in cosine_topk(embeddings, q, k=7,
                                      impl="arrow").collect()}
        assert hof == arrow

    def test_semantic_dedup_drops_planted_duplicates(self, spark, embeddings):
        # SemDeDup: an exact copy of a vector lands in the same k-means
        # cell with cosine 1.0 — the higher id must be dropped, the
        # lower kept; and output covers every input exactly once
        import pyspark.sql.functions as F

        from vulnerablecode_spark.llm.similarity import semantic_dedup

        copies = embeddings.filter(F.col("vec_id") < 5).select(
            (F.col("vec_id") + 100000).alias("vec_id"), "embedding")
        corpus = embeddings.select("vec_id", "embedding").unionByName(copies)
        out = {r.vec_id: r for r in
               semantic_dedup(corpus, threshold=0.95).collect()}
        assert len(out) == corpus.count()
        for vid in range(5):
            assert out[vid + 100000].keep is False  # the planted copy
            assert out[vid].keep is True            # the original

    def test_cosine_partial_topk_equals_hof(self, spark, embeddings):
        # the per-partition partial-top-k scan (broadcast query matrix,
        # local candidate cut, global rounded window) must reproduce the
        # pair-join tiers exactly — values, ranks and tie-breaks
        from vulnerablecode_spark.llm.similarity import cosine_topk

        q = embeddings.filter(F.col("vec_id") < 12)
        hof = {(r.query_id, r.neighbor_id): (r.cosine_sim, r.rk)
               for r in cosine_topk(embeddings, q, k=7, impl="hof").collect()}
        part = {(r.query_id, r.neighbor_id): (r.cosine_sim, r.rk)
                for r in cosine_topk(embeddings, q, k=7,
                                     impl="partial").collect()}
        assert hof == part

    def test_sign_bucket_arrow_equals_hof(self, spark, embeddings):
        from vulnerablecode_spark.llm.similarity import (sign_bucket,
                                                         sign_bucket_arrow)

        both = embeddings.select(
            "vec_id",
            sign_bucket(F.col("embedding")).alias("b_hof"),
            sign_bucket_arrow(F.col("embedding")).alias("b_arrow"),
        ).collect()
        assert len(both) > 0
        for r in both:
            assert r.b_hof == r.b_arrow, r.vec_id

    def test_hashed_shingles_arrow_equals_hof(self, spark):
        from vulnerablecode_spark.llm.dedup import hashed_shingles

        docs = spark.read.parquet(f"{SF}/documents.parquet")
        hof = {(r.doc_id, r.h)
               for r in hashed_shingles(docs, impl="hof").collect()}
        arrow = {(r.doc_id, r.h)
                 for r in hashed_shingles(docs, impl="arrow").collect()}
        assert hof and hof == arrow

    def test_positional_shingles_arrow_equals_hof(self, spark):
        import collections

        from vulnerablecode_spark.llm.dedup import positional_shingle_hashes

        docs = spark.read.parquet(f"{SF}/documents.parquet")
        hof = collections.Counter(
            (r.doc_id, r.pos, r.h)
            for r in positional_shingle_hashes(docs, impl="hof").collect())
        arrow = collections.Counter(
            (r.doc_id, r.pos, r.h)
            for r in positional_shingle_hashes(docs, impl="arrow").collect())
        assert hof and hof == arrow


class TestSpreadSizing:
    """spread() sizes its fan-out repartition from the input bytes: tiny
    file scans must not pay 32-task stage barriers, while derived frames
    (no file stats) fall back to full parallelism."""

    def test_small_file_scan_gets_few_partitions(self, spark):
        from vulnerablecode_spark.llm.dedup import spread

        docs = spark.read.parquet(f"{SF}/documents.parquet")
        n = spread(docs, "doc_id").rdd.getNumPartitions()
        assert 2 <= n <= 4, n  # sf0.001 documents.parquet is ~100 KB

    def test_fileless_frame_uses_default_parallelism(self, spark):
        # frames with no file lineage (inputFiles() is empty) have no byte
        # statistic to size from — they get the full session parallelism
        from vulnerablecode_spark.llm.dedup import spread

        fileless = spark.range(0, 1000).selectExpr(
            "id AS doc_id", "CAST(id AS STRING) AS text")
        n = spread(fileless, "doc_id").rdd.getNumPartitions()
        assert n == spark.sparkContext.defaultParallelism, n


class TestDirtyData:
    def test_null_text_yields_no_shingles_in_both_tiers(self, spark):
        # ADVICE r4: the arrow tier must match the HOF tier's NULL
        # behavior (no rows) instead of failing the whole task
        from vulnerablecode_spark.llm.dedup import (hashed_shingles,
                                                    positional_shingle_hashes)

        docs = spark.createDataFrame(
            [(1, "alpha beta gamma delta"), (2, None), (3, "x y z w")],
            "doc_id long, text string")
        for fn in (hashed_shingles, positional_shingle_hashes):
            hof = {(r.doc_id, r.h) for r in fn(docs, impl="hof").collect()}
            arrow = {(r.doc_id, r.h) for r in fn(docs, impl="arrow").collect()}
            assert hof == arrow
            assert not {d for d, _ in hof} & {2}  # null doc absent, not fatal


class TestIncrementalNearDup:
    def test_matches_full_recompute_on_new_pairs(self, spark):
        import pyspark.sql.functions as F

        from vulnerablecode_spark.llm.dedup import (band_frame,
                                                    hashed_shingles,
                                                    minhash_signatures,
                                                    near_dup_pairs,
                                                    near_dup_pairs_incremental)

        docs = spark.read.parquet(f"{SF}/documents.parquet")
        old = docs.filter(F.col("doc_id") % 5 != 0)
        new = docs.filter(F.col("doc_id") % 5 == 0)
        # the "stored index": the old corpus's shingle hashes + band rows
        idx_hashed = hashed_shingles(old).localCheckpoint(eager=True)
        idx_bands = band_frame(
            minhash_signatures(hashed=idx_hashed, with_sizes=True),
            with_sizes=True).localCheckpoint(eager=True)
        got = {(r.doc_a, r.doc_b, r.jaccard) for r in
               near_dup_pairs_incremental(new, idx_hashed, idx_bands,
                                          threshold=0.5).collect()}
        full = near_dup_pairs(docs, threshold=0.5).collect()
        new_ids = {r.doc_id for r in new.select("doc_id").collect()}
        want = {(r.doc_a, r.doc_b, r.jaccard) for r in full
                if r.doc_a in new_ids or r.doc_b in new_ids}
        assert got == want and want  # identical, and non-trivially so


class TestIncrementalNearDupProperties:
    """Property test (VERDICT r4 item 8): on randomized corpora with
    planted near-dups and a randomized increment split, the incremental
    operator must equal the full batch recompute restricted to pairs
    touching a new document — for every split, including empty/full."""

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    @given(st.integers(0, 2**32 - 1), st.integers(1, 4))
    @settings(max_examples=8, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    def test_matches_batch_on_random_increments(self, spark, seed, mod):
        import numpy as np
        import pyspark.sql.functions as F

        from vulnerablecode_spark.llm.dedup import (band_frame,
                                                    hashed_shingles,
                                                    minhash_signatures,
                                                    near_dup_pairs,
                                                    near_dup_pairs_incremental)

        rng = np.random.default_rng(seed)
        vocab = [f"w{i}" for i in range(25)]
        rows, texts = [], []
        for i in range(24):
            if texts and rng.random() < 0.4:  # plant a near-dup
                toks = texts[int(rng.integers(len(texts)))].split()
                j = int(rng.integers(len(toks)))
                toks[j] = str(rng.choice(vocab))
                text = " ".join(toks)
            else:
                text = " ".join(rng.choice(vocab,
                                           size=int(rng.integers(6, 15))))
            texts.append(text)
            rows.append((i, text))
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        is_new = F.col("doc_id") % (mod + 1) == 0
        old, new = docs.filter(~is_new), docs.filter(is_new)
        idx_hashed = hashed_shingles(old).localCheckpoint(eager=True)
        idx_bands = band_frame(
            minhash_signatures(hashed=idx_hashed, with_sizes=True),
            with_sizes=True).localCheckpoint(eager=True)
        got = {(r.doc_a, r.doc_b, r.jaccard) for r in
               near_dup_pairs_incremental(new, idx_hashed, idx_bands,
                                          threshold=0.3).collect()}
        new_ids = {r.doc_id for r in new.select("doc_id").collect()}
        want = {(r.doc_a, r.doc_b, r.jaccard)
                for r in near_dup_pairs(docs, threshold=0.3).collect()
                if r.doc_a in new_ids or r.doc_b in new_ids}
        assert got == want


class TestDecontamination:
    def test_planted_overlap(self, spark):
        from vulnerablecode_spark.llm.dedup import decontamination_overlap

        bench = spark.createDataFrame(
            [(100, "the quick brown fox jumps over the lazy dog")],
            "doc_id long, text string")
        corpus = spark.createDataFrame(
            [(1, "the quick brown fox jumps over the lazy dog"),  # full leak
             (2, "completely unrelated words about spark plans here"),
             (3, "the quick brown fox went somewhere else entirely")],
            "doc_id long, text string")
        out = {r.doc_id: r for r in
               decontamination_overlap(corpus, bench).collect()}
        assert out[1].overlap_bp == 10000          # verbatim benchmark doc
        assert out[2].overlap_bp == 0              # disjoint
        assert 0 < out[3].overlap_bp < 10000       # shared prefix only
        assert out[1].n_shingles == out[1].n_overlap


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


class TestAnnScaleParams:
    def test_recommended_sign_bits_grows_with_corpus(self):
        from vulnerablecode_spark.llm.similarity import recommended_sign_bits

        assert recommended_sign_bits(500) == 4          # tiny corpus floor
        assert recommended_sign_bits(1 << 20) == 10     # 1M/1024 = 1024 buckets
        assert recommended_sign_bits(10**10) == 24      # capped at 24 bits
        # monotone non-decreasing
        vals = [recommended_sign_bits(n) for n in
                (10**3, 10**5, 10**7, 10**9, 10**11)]
        assert vals == sorted(vals)

    def test_recommended_ivf_cells_bounds(self):
        from vulnerablecode_spark.llm.similarity import recommended_ivf_cells

        assert recommended_ivf_cells(100) == 10          # sqrt path, tiny
        assert recommended_ivf_cells(1 << 20) == 1024    # sqrt(1M)
        assert recommended_ivf_cells(10**12) == 65536    # broadcast cap
        vals = [recommended_ivf_cells(n) for n in
                (10**3, 10**5, 10**7, 10**9, 10**12)]
        assert vals == sorted(vals)

    def test_sign_bucket_null_safe_on_short_vectors(self, spark):
        """A vector shorter than the plane dim must not collapse to bucket 0
        via zip_with null padding — the sliced fold uses only the shared
        prefix (ADVICE r3)."""
        from vulnerablecode_spark.llm.similarity import sign_bucket

        df = spark.createDataFrame(
            [(1, [float(i) for i in range(64)]),
             (2, [float(i) for i in range(32)]),   # short vector
             (3, [-1.0] * 64)],
            "vec_id int, embedding array<double>",
        ).select("vec_id", sign_bucket(F.col("embedding")).alias("bucket"))
        rows = {r.vec_id: r.bucket for r in df.collect()}
        assert rows[1] is not None and rows[2] is not None
        # buckets spread — not everything in bucket 0
        assert len(set(rows.values())) > 1

    def test_ann_lsh_precomputed_bucket_matches_inline(self, spark, embeddings):
        from vulnerablecode_spark.llm.similarity import ann_topk_lsh, sign_bucket

        pre = embeddings.select(
            "vec_id", "embedding",
            sign_bucket(F.col("embedding")).alias("bucket"))
        queries = pre.filter(F.col("vec_id") < 10)
        inline = ann_topk_lsh(embeddings, embeddings.filter(F.col("vec_id") < 10))
        stored = ann_topk_lsh(pre, queries, bucket_col="bucket")
        assert sorted(map(tuple, inline.collect())) == \
               sorted(map(tuple, stored.collect()))


class TestConnectedComponentsProperty:
    """Property test: label propagation vs a driver-side union-find oracle
    on seeded random graphs (VERDICT r3 hardening item)."""

    @staticmethod
    def _oracle(n_nodes, edges):
        parent = list(range(n_nodes))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        # canonical component = min node id in the component
        comp = {}
        for v in range(n_nodes):
            r = find(v)
            comp.setdefault(r, v)
        return {v: comp[find(v)] for v in range(n_nodes)
                if any(v in e for e in edges)}

    def test_random_graphs_match_union_find(self, spark):
        import random

        for seed, n_nodes, n_edges in ((7, 200, 150), (13, 500, 700),
                                       (42, 1000, 400)):
            rng = random.Random(seed)
            edges = [(rng.randrange(n_nodes), rng.randrange(n_nodes))
                     for _ in range(n_edges)]
            edges = [(a, b) for a, b in edges if a != b]
            from vulnerablecode_spark.operators.components import (
                connected_components)

            df = spark.createDataFrame(edges, "src long, dst long")
            got = {r.node: r.component
                   for r in connected_components(df).collect()}
            exp_raw = self._oracle(n_nodes, edges)
            # oracle canonicalizes by min-id too; compare per touched node
            touched = {v for e in edges for v in e}
            exp = {}
            parent_min = {}
            for v in sorted(touched):
                r = exp_raw[v]
                parent_min.setdefault(r, min(
                    x for x in touched if exp_raw[x] == r))
                exp[v] = parent_min[r]
            assert got == exp, f"seed {seed}"

    def test_long_chain_converges(self, spark):
        # path graph: worst-case diameter for label propagation
        from vulnerablecode_spark.operators.components import (
            connected_components)

        n = 120
        df = spark.createDataFrame(
            [(i, i + 1) for i in range(n - 1)], "src long, dst long")
        got = {r.node: r.component
               for r in connected_components(df, max_iterations=200).collect()}
        assert set(got.values()) == {0}
        assert len(got) == n


class TestMultimodalStages:
    @pytest.fixture(scope="class")
    def payloads(self, spark):
        from vulnerablecode_spark.llm.multimodal import with_binary_payload

        docs = spark.read.parquet(f"{SF}/documents.parquet").limit(50)
        return with_binary_payload(docs).cache()

    def test_resize_contract(self, spark, payloads):
        from vulnerablecode_spark.llm.multimodal import resize_images

        out = resize_images(payloads, width=8, height=4)
        rows = out.collect()
        assert len(rows) == 50
        assert all(r.width == 8 and r.height == 4 for r in rows)
        # fake resample emits exactly width×height bytes — the binary
        # column survives the Arrow round trip
        assert all(len(r.payload) == 32 for r in rows)

    def test_frame_sampling_fans_out(self, spark, payloads):
        from vulnerablecode_spark.llm.multimodal import sample_frames

        out = sample_frames(payloads, every_n=3, frame_bytes=64)
        frames = out.collect()
        assert len(frames) > 50                      # 1:N fan-out happened
        by_doc = {}
        for r in frames:
            by_doc.setdefault(r.doc_id, []).append(r.frame_idx)
        for idxs in by_doc.values():
            assert sorted(idxs) == idxs              # per-doc frame order
            assert all(i % 3 == 0 for i in idxs)     # every_n stride kept

    def test_byte_histogram_is_valid_embedding(self, spark, payloads):
        from vulnerablecode_spark.llm.multimodal import byte_histogram_features
        from vulnerablecode_spark.llm.similarity import cosine_topk

        feats = byte_histogram_features(payloads, bins=16)
        rows = feats.collect()
        assert len(rows) == 50
        for r in rows:
            assert len(r.features) == 16
            assert abs(sum(r.features) - 1.0) < 1e-9     # normalized
            assert all(v >= 0 for v in r.features)
        # the features column plugs straight into the similarity operators
        emb = feats.withColumnRenamed("doc_id", "vec_id") \
                   .withColumnRenamed("features", "embedding")
        top = cosine_topk(emb, emb.filter(F.col("vec_id") < 3), k=2)
        assert top.count() > 0


class TestRealCodecStages:
    """The REAL decode tier: actual PNG/BMP/WAV/GIF/JPEG payloads through
    the Arrow-batched stages, verified against locally-computed truth."""

    @pytest.fixture(scope="class")
    def media_df(self, spark):
        import numpy as np

        from vulnerablecode_spark.kernel import media as M

        rng = np.random.default_rng(42)
        png_px = rng.integers(0, 256, size=(12, 16, 3), dtype=np.uint8)
        bmp_px = rng.integers(0, 256, size=(10, 10, 3), dtype=np.uint8)
        wav_s = (np.sin(np.arange(400) / 5.0) * 2000).astype(np.int16)
        rows = [
            (1, bytearray(M.encode_png(png_px))),
            (2, bytearray(M.encode_bmp(bmp_px))),
            (3, bytearray(M.encode_wav(wav_s, 16000))),
            (4, bytearray(b"GIF89a" + b"\x14\x00\x0a\x00\x00\x00\x00"
                          + b"\x2c" + bytes(8) + b"\x14\x00\x0a\x00\x00"
                          + bytes([2, 1, 0, 0]) + b"\x3b")),
            (5, bytearray(b"\xff\xd8\xff\xc0\x00\x11\x08\x00\x0a\x00\x14"
                          + b"\x03" + bytes(9) + b"\xff\xda\x00\x02")),
            (6, bytearray(b"just some text bytes")),
        ]
        df = spark.createDataFrame(rows, "doc_id long, payload binary")
        return df, png_px, bmp_px, wav_s

    def test_real_meta_mixed_column(self, spark, media_df):
        from vulnerablecode_spark.llm.multimodal import extract_media_meta_real

        df, png_px, bmp_px, wav_s = media_df
        got = {r.doc_id: r for r in extract_media_meta_real(df).collect()}
        assert len(got) == 6
        assert (got[1].media_format, got[1].width, got[1].height,
                got[1].n_channels) == ("png", 16, 12, 3)
        assert (got[2].media_format, got[2].width, got[2].height,
                got[2].bit_depth) == ("bmp", 10, 10, 24)
        assert (got[3].media_format, got[3].sample_rate, got[3].n_channels,
                got[3].n_samples) == ("wav", 16000, 1, 400)
        assert (got[4].media_format, got[4].width, got[4].height,
                got[4].n_frames) == ("gif", 20, 10, 1)
        assert (got[5].media_format, got[5].width, got[5].height) == \
            ("jpeg", 20, 10)
        assert got[6].media_format == "bin" and got[6].width is None

    def test_real_resize_decodes_and_reencodes(self, spark, media_df):
        import numpy as np

        from vulnerablecode_spark.kernel import media as M
        from vulnerablecode_spark.llm.multimodal import resize_images

        df, png_px, bmp_px, _ = media_df
        out = {r.doc_id: r for r in
               resize_images(df, width=6, height=4, codec="real").collect()}
        # only the two decodable images survive; wav/gif/jpeg/bin dropped
        assert set(out) == {1, 2}
        got_png = M.decode_png(bytes(out[1].payload))
        assert np.array_equal(got_png, M.resize_nearest(png_px, 6, 4))
        got_bmp = M.decode_png(bytes(out[2].payload))
        assert np.array_equal(got_bmp, M.resize_nearest(bmp_px, 6, 4))

    def test_real_gif_frame_sampling(self, spark):
        import numpy as np

        from vulnerablecode_spark.kernel import media as M
        from vulnerablecode_spark.llm.multimodal import sample_frames

        rng = np.random.default_rng(9)
        f6 = rng.integers(0, 256, size=(6, 5, 4), dtype=np.uint8)
        f2 = rng.integers(0, 256, size=(2, 3, 3), dtype=np.uint8)
        df = spark.createDataFrame(
            [(10, bytearray(M.encode_gif(f6))),
             (11, bytearray(M.encode_gif(f2))),
             (12, bytearray(b"not media"))],
            "doc_id long, payload binary")
        out = sample_frames(df, every_n=2, codec="real").collect()
        by_doc = {}
        for r in out:
            by_doc.setdefault(r.doc_id, {})[r.frame_idx] = bytes(r.frame_payload)
        assert set(by_doc) == {10, 11}              # non-gif row dropped
        assert sorted(by_doc[10]) == [0, 2, 4]      # every 2nd of 6 frames
        assert sorted(by_doc[11]) == [0]
        # each emitted frame is a decodable PNG of the composed GIF frame
        got = M.decode_png(by_doc[10][2])
        assert np.array_equal(got[:, :, 0], f6[2])

    def test_real_avi_frame_sampling(self, spark):
        import numpy as np

        from vulnerablecode_spark.kernel import media as M
        from vulnerablecode_spark.llm.multimodal import sample_frames

        frames = np.stack([
            np.full((8, 8, 3), (50 * i + 20, 100, 200 - 40 * i),
                    dtype=np.uint8)
            for i in range(5)
        ])
        df = spark.createDataFrame(
            [(20, bytearray(M.encode_avi_mjpeg(frames, fps=10))),
             (21, bytearray(b"not media"))],
            "doc_id long, payload binary")
        out = sample_frames(df, every_n=2, codec="real").collect()
        by_idx = {r.frame_idx: bytes(r.frame_payload) for r in out
                  if r.doc_id == 20}
        assert {r.doc_id for r in out} == {20}
        assert sorted(by_idx) == [0, 2, 4]  # every 2nd of 5 MJPG frames
        # each emitted frame is a PNG of the JPEG-decoded frame (4:2:0 on
        # constant-color frames: error bounded by the rounded transforms)
        got = M.decode_png(by_idx[4])
        assert int(np.abs(got.astype(int)
                          - frames[4].astype(int)).max()) <= 2

    def test_spectral_features_tone_vs_noise(self, spark):
        import numpy as np

        from vulnerablecode_spark.kernel import media as M
        from vulnerablecode_spark.llm.multimodal import \
            audio_spectral_features

        rate = 8000
        t = np.arange(2048) / rate
        tone = (10000 * np.sin(2 * np.pi * 1000 * t)).astype(np.int16)
        noise = np.random.default_rng(17).integers(
            -8000, 8000, size=2048).astype(np.int16)
        df = spark.createDataFrame(
            [(1, bytearray(M.encode_wav(tone.reshape(-1, 1), rate))),
             (2, bytearray(M.encode_wav(noise.reshape(-1, 1), rate))),
             (3, bytearray(b"not audio"))],
            "doc_id long, payload binary")
        out = {r.doc_id: r for r in audio_spectral_features(df).collect()}
        assert set(out) == {1, 2}                   # non-wav dropped
        # the 1 kHz tone: centroid pinned near 1000 Hz, near-zero flatness
        assert abs(out[1].spectral_centroid_hz - 1000) < 50
        assert out[1].spectral_flatness < 0.01
        # white noise: centroid near band middle, much flatter spectrum
        assert out[2].spectral_centroid_hz > 1500
        assert out[2].spectral_flatness > out[1].spectral_flatness * 10
        assert out[2].spectral_rolloff_hz > out[1].spectral_rolloff_hz

    def test_audio_features_match_numpy(self, spark, media_df):
        import numpy as np

        df, _, _, wav_s = media_df
        from vulnerablecode_spark.llm.multimodal import audio_features

        rows = audio_features(df).collect()
        assert len(rows) == 1                       # only the wav row
        r = rows[0]
        mono = wav_s.astype(np.float64)
        assert r.doc_id == 3 and r.sample_rate == 16000
        assert r.n_samples == 400 and r.duration_ms == 25
        assert abs(r.rms - round(float(np.sqrt(np.mean(mono ** 2))), 6)) < 1e-9
        assert r.zero_crossings == int(
            np.count_nonzero(np.diff(np.signbit(mono))))


class TestWinnowing:
    def test_shared_run_shares_a_fingerprint(self, spark):
        """Winnowing guarantee: two documents sharing a token run of
        length ≥ w+n-1 (= 6 for n=3,w=4) share at least one fingerprint
        hash."""
        from vulnerablecode_spark.llm.dedup import winnowing_fingerprints

        shared = "alpha beta gamma delta epsilon zeta eta theta"
        docs = spark.createDataFrame(
            [(1, "x1 y1 z1 " + shared + " tail one"),
             (2, "completely different prefix words " + shared),
             (3, "no overlap at all here whatsoever in this doc")],
            "doc_id bigint, text string")
        fp = winnowing_fingerprints(docs, n=3, w=4)
        by_doc = {}
        for r in fp.collect():
            by_doc.setdefault(r.doc_id, set()).add(r.h)
        assert by_doc[1] & by_doc[2], "shared run produced no common fingerprint"
        assert not (by_doc[1] & by_doc[3])

    def test_fingerprints_are_sparse(self, spark):
        from vulnerablecode_spark.llm.dedup import (positional_shingle_hashes,
                                                    winnowing_fingerprints)

        docs = spark.read.parquet(f"{SF}/documents.parquet").limit(100)
        n_positions = positional_shingle_hashes(docs).count()
        n_fp = winnowing_fingerprints(docs).count()
        # winnowing keeps roughly 2/(w+1) of positions — assert well under half
        assert 0 < n_fp < n_positions / 2


class TestEmbeddingNearDup:
    def test_subset_of_bruteforce_threshold_pairs(self, spark, embeddings):
        from vulnerablecode_spark.llm.similarity import (
            cosine, embedding_near_dup_pairs)

        got = embedding_near_dup_pairs(embeddings, threshold=0.4)
        rows = got.collect()
        # every reported pair really is >= threshold, and bucket-equal
        for r in rows:
            assert r.cosine_sim >= 0.4
        # brute-force all-pairs >= threshold is a superset
        e = embeddings.select(F.col("vec_id").alias("id_a"),
                              F.col("embedding").alias("va"))
        f = embeddings.select(F.col("vec_id").alias("id_b"),
                              F.col("embedding").alias("vb"))
        brute = (e.join(f, F.col("id_a") < F.col("id_b"))
                 .select("id_a", "id_b",
                         F.round(cosine(F.col("va"), F.col("vb")), 4)
                         .alias("c"))
                 .filter(F.col("c") >= 0.4))
        bset = {(r.id_a, r.id_b) for r in brute.collect()}
        assert {(r.id_a, r.id_b) for r in rows} <= bset


class TestExactSubstringSpans:
    def _docs(self, spark, rows):
        return spark.createDataFrame(rows, "doc_id bigint, text string")

    def test_maximal_run_exact_offsets(self, spark):
        from vulnerablecode_spark.llm.dedup import exact_substring_spans

        shared = " ".join(f"s{i}" for i in range(10))  # 10-token run
        docs = self._docs(spark, [
            (1, "a b c " + shared + " x y"),
            (2, "p q " + shared + " r"),
        ])
        got = exact_substring_spans(docs, min_tokens=8).collect()
        assert len(got) == 1
        r = got[0]
        assert (r.doc_a, r.doc_b) == (1, 2)
        assert (r.start_a, r.start_b, r.n_tokens) == (3, 2, 10)

    def test_short_runs_filtered(self, spark):
        from vulnerablecode_spark.llm.dedup import exact_substring_spans

        shared = " ".join(f"s{i}" for i in range(5))  # below min_tokens=8
        docs = self._docs(spark, [
            (1, "a b " + shared + " c"),
            (2, "x " + shared + " y"),
        ])
        assert exact_substring_spans(docs, min_tokens=8).count() == 0

    def test_two_separate_runs_two_rows(self, spark):
        from vulnerablecode_spark.llm.dedup import exact_substring_spans

        r1 = " ".join(f"p{i}" for i in range(8))
        r2 = " ".join(f"q{i}" for i in range(9))
        docs = self._docs(spark, [
            (1, r1 + " gap1 gapx " + r2),
            (2, r2 + " other stuff here filler " + r1),
        ])
        got = {(r.n_tokens, r.start_a, r.start_b)
               for r in exact_substring_spans(docs, min_tokens=8).collect()}
        # doc 2 layout: r2 at 0 (9 tokens), 4 filler tokens, r1 at 13
        assert got == {(8, 0, 13), (9, 10, 0)}

    def test_df_cap_suppresses_ubiquitous_ngrams(self, spark):
        from vulnerablecode_spark.llm.dedup import exact_substring_spans

        boiler = " ".join(f"b{i}" for i in range(12))
        docs = self._docs(spark, [(i, boiler) for i in range(6)])
        # every n-gram appears in 6 docs > max_df=5 → nothing reported
        assert exact_substring_spans(
            docs, min_tokens=8, max_df=5).count() == 0
        # raising the cap reports all 15 pairs
        assert exact_substring_spans(
            docs, min_tokens=8, max_df=10).count() == 15


class TestLeakageSafeSplits:
    def test_near_dup_clusters_never_straddle_splits(self, spark):
        import vulnerablecode_spark.plans.llm  # noqa: F401 — registers q73
        from vulnerablecode_spark.plans import QUERIES

        out = QUERIES["q73_leakage_safe_splits"](
            spark, SF).collect()
        by_cluster: dict[int, set] = {}
        for r in out:
            by_cluster.setdefault(r.cluster_id, set()).add(r.split)
        # the invariant the operator exists for: one split per cluster
        assert all(len(s) == 1 for s in by_cluster.values())
        # the corpus has real near-dup clusters, so the guard is exercised
        sizes: dict[int, int] = {}
        for r in out:
            sizes[r.cluster_id] = sizes.get(r.cluster_id, 0) + 1
        assert max(sizes.values()) > 1

    def test_split_is_cluster_hash_deterministic(self, spark):
        from vulnerablecode_spark.llm.dedup import hash64
        from pyspark.sql import functions as F

        # recompute the gate for a handful of clusters and check the label
        import vulnerablecode_spark.plans.llm  # noqa: F401 — registers q73
        from vulnerablecode_spark.plans import QUERIES

        out = QUERIES["q73_leakage_safe_splits"](
            spark, SF).limit(20)
        chk = out.withColumn(
            "gate", hash64(F.col("cluster_id").cast("string")) % 10000)
        for r in chk.collect():
            want = ("train" if r.gate < 9000
                    else "val" if r.gate < 9500 else "test")
            assert r.split == want


class TestZeroNormCosine:
    def test_all_tiers_exclude_zero_norm_vectors_identically(self, spark):
        from vulnerablecode_spark.llm.similarity import cosine_topk

        rows = [(0, [1.0, 0.0, 0.0]), (1, [0.9, 0.1, 0.0]),
                (2, [0.0, 0.0, 0.0]),  # zero-norm: undefined cosine
                (3, [0.5, 0.5, 0.0]), (4, [0.1, 0.9, 0.0])]
        corpus = spark.createDataFrame(
            rows, "vec_id bigint, embedding array<double>")
        queries = corpus.filter("vec_id = 0")
        outs = {}
        for impl in ("hof", "arrow", "partial"):
            got = [(r.neighbor_id, r.cosine_sim, r.rk) for r in
                   cosine_topk(corpus, queries, k=4, impl=impl)
                   .orderBy("rk").collect()]
            outs[impl] = got
            # the zero vector never appears — neither as NaN rank-1
            # (the old arrow tier) nor as a trailing null row
            assert all(n != 2 for n, _, _ in got), (impl, got)
        assert outs["hof"] == outs["arrow"] == outs["partial"]


class TestIvfIncremental:
    """ivf_index_incremental (VERDICT r6 directive #8): assign-only
    per-batch maintenance, drift-gated rebuild, forced-rebuild equality
    with building from scratch."""

    def _split(self, embeddings):
        old = embeddings.filter(F.col("vec_id") % 10 != 0)
        new = embeddings.filter(F.col("vec_id") % 10 == 0)
        return old, new

    def test_assign_only_leaves_old_assignment_untouched(
            self, spark, embeddings):
        from vulnerablecode_spark.llm.similarity import (
            _assign_cells, ivf_index, ivf_index_incremental)

        old, new = self._split(embeddings)
        centroids, assigned = ivf_index(old, 16)
        res = ivf_index_incremental(new, centroids, assigned,
                                    baseline_quality=None)
        assert res["rebuilt"] is False
        got = {r.vec_id: r.cell for r in res["assigned"].collect()}
        # old rows: identical to the stored assignment
        for r in assigned.collect():
            assert got[r.vec_id] == r.cell
        # new rows: exactly what assigning against the STORED centroids
        # yields — the increment never moves a centroid
        expected_new = {r.vec_id: r.cell for r in _assign_cells(
            new, centroids, "vec_id", "embedding").collect()}
        for vid, cell in expected_new.items():
            assert got[vid] == cell
        assert len(got) == len(expected_new) + assigned.count()

    def test_forced_rebuild_equals_full_rebuild(self, spark, embeddings):
        from vulnerablecode_spark.llm.similarity import (
            ivf_index, ivf_index_incremental)

        old, new = self._split(embeddings)
        centroids, assigned = ivf_index(old, 16)
        # drift_threshold below any possible drift → always rebuild
        res = ivf_index_incremental(new, centroids, assigned,
                                    baseline_quality=10.0,
                                    drift_threshold=-1.0)
        assert res["rebuilt"] is True
        full_c, full_a = ivf_index(embeddings, 16)
        inc_c = {r.cell: tuple(r.centroid)
                 for r in res["centroids"].collect()}
        ref_c = {r.cell: tuple(r.centroid) for r in full_c.collect()}
        assert inc_c == ref_c
        inc_a = {(r.vec_id, r.cell) for r in res["assigned"].collect()}
        ref_a = {(r.vec_id, r.cell) for r in full_a.collect()}
        assert inc_a == ref_a

    def test_distribution_shift_trips_the_drift_gate(
            self, spark, embeddings):
        from vulnerablecode_spark.llm.similarity import (
            ivf_assignment_quality, ivf_index, ivf_index_incremental)

        old, new = self._split(embeddings)
        centroids, assigned = ivf_index(old, 16)
        baseline = ivf_assignment_quality(assigned, centroids)
        # stationary increment: drift stays within the in-sample vs
        # held-out gap (~0.1 on this near-random synthetic corpus) and
        # the batch spreads over many cells
        stationary = ivf_index_incremental(new, centroids, assigned,
                                           baseline_quality=baseline,
                                           drift_threshold=0.2)
        assert stationary["rebuilt"] is False
        assert stationary["drift"] < 0.2
        assert stationary["batch_max_cell_share"] < 0.5
        # shifted increment: every vector points the same way (a new
        # tight cluster the index has no cell for) — the whole batch
        # lands in one cell and the skew gate orders a rebuild
        shifted = new.select(
            "vec_id",
            F.transform("embedding",
                        lambda x: x * F.lit(0) + F.lit(1.0))
            .alias("embedding"))
        drifted = ivf_index_incremental(shifted, centroids, assigned,
                                        baseline_quality=baseline,
                                        drift_threshold=0.2)
        assert drifted["batch_max_cell_share"] == 1.0
        assert drifted["rebuilt"] is True


class TestLineLevelDedup:
    """llm/dedup.py line_level_dedup — RefinedWeb-style cross-document
    segment (line) dedup: w-token windows occurring in >= K distinct
    documents are boilerplate, removed from every doc."""

    def _docs(self, spark):
        rows = [
            # "hdr foo bar" is segment 0 of three docs -> boilerplate @K=3
            (1, "hdr foo bar alpha beta gamma"),
            (2, "hdr foo bar delta eps zeta"),
            (3, "hdr foo bar eta theta iota"),
            # repeats segment only twice -> kept at K=3
            (4, "two tok seg kappa lam mu"),
            (5, "two tok seg nu xi omicron"),
            # short trailing segment (2 tokens), unique
            (6, "pi rho sigma tau ups"),
        ]
        return spark.createDataFrame(rows, ["doc_id", "text"])

    def test_boilerplate_removed_everywhere(self, spark):
        from vulnerablecode_spark.llm.dedup import line_level_dedup

        got = {r.doc_id: r for r in
               line_level_dedup(self._docs(spark), w=3,
                                boilerplate_min_docs=3).collect()}
        assert got[1].cleaned_text == "alpha beta gamma"
        assert got[2].cleaned_text == "delta eps zeta"
        assert got[3].cleaned_text == "eta theta iota"
        for d in (1, 2, 3):
            assert (got[d].segs_total, got[d].segs_dropped) == (2, 1)

    def test_below_threshold_kept(self, spark):
        from vulnerablecode_spark.llm.dedup import line_level_dedup

        got = {r.doc_id: r for r in
               line_level_dedup(self._docs(spark), w=3,
                                boilerplate_min_docs=3).collect()}
        assert got[4].cleaned_text == "two tok seg kappa lam mu"
        assert got[5].segs_dropped == 0

    def test_short_trailing_segment_and_order(self, spark):
        from vulnerablecode_spark.llm.dedup import line_level_dedup

        got = {r.doc_id: r for r in
               line_level_dedup(self._docs(spark), w=3,
                                boilerplate_min_docs=3).collect()}
        # 5 tokens -> segments "pi rho sigma" + "tau ups" (trailing w=2)
        assert got[6].cleaned_text == "pi rho sigma tau ups"
        assert got[6].segs_total == 2

    def test_all_boilerplate_yields_empty_string(self, spark):
        from vulnerablecode_spark.llm.dedup import line_level_dedup

        docs = spark.createDataFrame(
            [(i, "same seg here") for i in range(4)], ["doc_id", "text"])
        out = {r.doc_id: r for r in
               line_level_dedup(docs, w=3, boilerplate_min_docs=3).collect()}
        assert all(r.cleaned_text == "" for r in out.values())
        assert all(r.segs_dropped == 1 for r in out.values())

    def test_corpus_never_shuffled_plan(self, spark):
        # scale gate: the final join onto the corpus must be broadcast —
        # no Exchange on the with_segs side of the rebuild join
        import io
        from contextlib import redirect_stdout

        from vulnerablecode_spark.llm.dedup import line_level_dedup

        df = line_level_dedup(self._docs(spark), w=3, boilerplate_min_docs=3)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan


class TestLineLevelDedupProperty:
    """Property test: line_level_dedup equals a direct Python reference
    on random corpora for every (w, threshold) — segment chunking,
    distinct-doc counting, original-order rebuild, and counters."""

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    @given(st.integers(0, 2**32 - 1), st.integers(1, 4), st.integers(2, 4))
    @settings(max_examples=8, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    def test_matches_python_reference(self, spark, seed, w, k):
        import random

        from vulnerablecode_spark.llm.dedup import line_level_dedup

        rng = random.Random(seed)
        vocab = ["aa", "bb", "cc", "dd"]
        docs = [(i, " ".join(rng.choice(vocab)
                             for _ in range(rng.randint(1, 12))))
                for i in range(rng.randint(1, 12))]

        # pure-Python reference
        def segments(text):
            toks = text.split(" ")
            return [" ".join(toks[i:i + w]) for i in range(0, len(toks), w)]

        seg_docs = {}
        for did, text in docs:
            for s in set(segments(text)):
                seg_docs.setdefault(s, set()).add(did)
        common = {s for s, ds in seg_docs.items() if len(ds) >= k}
        expect = {}
        for did, text in docs:
            segs = segments(text)
            kept = [s for s in segs if s not in common]
            expect[did] = (" ".join(kept), len(segs),
                           sum(1 for s in segs if s in common))

        got = {r.doc_id: (r.cleaned_text, r.segs_total, r.segs_dropped)
               for r in line_level_dedup(
                   spark.createDataFrame(docs, ["doc_id", "text"]),
                   w=w, boilerplate_min_docs=k).collect()}
        assert got == expect


class TestLineLevelDedupIncremental:
    """line_level_dedup_incremental == batch line_level_dedup on the full
    corpus, restricted to the new docs — for random corpora and random
    increment splits (the q63/q97 incremental-exactness discipline)."""

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    @given(st.integers(0, 2**32 - 1), st.integers(1, 3), st.integers(2, 4))
    @settings(max_examples=8, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    def test_matches_batch_restricted_to_increment(self, spark, seed, w, k):
        import random

        from vulnerablecode_spark.llm.dedup import (
            line_level_dedup, line_level_dedup_incremental, line_seg_counts)

        rng = random.Random(seed)
        vocab = ["aa", "bb", "cc"]
        n = rng.randint(2, 12)
        docs = [(i, " ".join(rng.choice(vocab)
                             for _ in range(rng.randint(1, 10))))
                for i in range(n)]
        cut = rng.randint(0, n)  # includes empty and full increments
        df = spark.createDataFrame(docs, ["doc_id", "text"])
        stored = df.filter(F.col("doc_id") >= cut)
        new = df.filter(F.col("doc_id") < cut)

        batch = {r.doc_id: (r.cleaned_text, r.segs_total, r.segs_dropped)
                 for r in line_level_dedup(
                     df, w=w, boilerplate_min_docs=k).collect()
                 if r.doc_id < cut}
        inc = {r.doc_id: (r.cleaned_text, r.segs_total, r.segs_dropped)
               for r in line_level_dedup_incremental(
                   line_seg_counts(stored, w=w), new,
                   w=w, boilerplate_min_docs=k).collect()}
        assert inc == batch


class TestLineLevelDedupBroadcastGuard:
    """ADVICE r9 / VERDICT r10 directive #3: the boilerplate/drop-map
    broadcasts are an assumption, not a guarantee — ``broadcast_limit``
    probes each dim's cardinality and withholds the hint above it, so an
    adversarial corpus (boilerplate ∝ corpus) degrades to a shuffle join
    instead of an OOM. Forcing limit=0 must flip every dim join to the
    shuffle path while leaving results bit-identical."""

    def _docs(self, spark, n=8):
        rows = [(i, f"hdr foo bar uniq{i} tok{i} x{i}") for i in range(n)]
        return spark.createDataFrame(rows, ["doc_id", "text"])

    def test_batch_fallback_equals_broadcast(self, spark):
        from vulnerablecode_spark.llm.dedup import line_level_dedup

        docs = self._docs(spark)
        fast = {tuple(r) for r in line_level_dedup(
            docs, w=3, boilerplate_min_docs=3).collect()}
        safe = {tuple(r) for r in line_level_dedup(
            docs, w=3, boilerplate_min_docs=3,
            broadcast_limit=0).collect()}
        assert fast == safe and fast

    def test_fallback_plan_has_no_forced_broadcast(self, spark):
        # the static plan must lose the broadcast on the corpus-rebuild
        # join when the guard trips (AQE may still re-broadcast at
        # runtime when the dim turns out tiny — that is the point: the
        # decision moves from a hard hint to a size-aware one)
        import io
        from contextlib import redirect_stdout

        from vulnerablecode_spark.llm.dedup import line_level_dedup

        df = line_level_dedup(self._docs(spark), w=3,
                              boilerplate_min_docs=3, broadcast_limit=0)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        assert "SortMergeJoin" in buf.getvalue()

    def test_incremental_fallback_equals_broadcast(self, spark):
        from vulnerablecode_spark.llm.dedup import (
            line_level_dedup_incremental, line_seg_counts)

        docs = self._docs(spark)
        stored = docs.filter(F.col("doc_id") >= 4)
        new = docs.filter(F.col("doc_id") < 4)
        index = line_seg_counts(stored, w=3)
        fast = {tuple(r) for r in line_level_dedup_incremental(
            index, new, w=3, boilerplate_min_docs=3).collect()}
        safe = {tuple(r) for r in line_level_dedup_incremental(
            index, new, w=3, boilerplate_min_docs=3,
            broadcast_limit=0).collect()}
        assert fast == safe and fast

    def test_null_text_rows_dropped_like_oracle(self, spark):
        # ADVICE r9: the q101 oracle's UNNEST(range(NULL)) eliminates
        # NULL-text docs; the operator must agree instead of emitting a
        # (NULL, NULL, NULL) row
        from vulnerablecode_spark.llm.dedup import (line_level_dedup,
                                                    line_seg_counts,
                                                    line_seg_postings)

        docs = self._docs(spark).unionByName(
            spark.createDataFrame([(99, None)], "doc_id long, text string"))
        out = line_level_dedup(docs, w=3, boilerplate_min_docs=3).collect()
        assert 99 not in {r.doc_id for r in out}
        assert line_seg_counts(docs, w=3).filter(
            F.col("seg").isNull()).count() == 0
        assert line_seg_postings(docs, w=3).filter(
            F.col("doc_id") == 99).count() == 0


class TestRetroReclean:
    """q110: segments crossing the boilerplate threshold on an increment
    poison previously-cleaned documents. newly_common_segments names
    them, retro_reclean_ids emits the work list from the stored postings,
    retro_reclean repairs against merged stored+batch counts."""

    def test_newly_common_excludes_already_common(self, spark):
        from vulnerablecode_spark.llm.dedup import (line_seg_counts,
                                                    newly_common_segments)

        stored = spark.createDataFrame(
            # "old old seg" already common in the store (3 docs);
            # "new new seg" at 2 — one batch hit crosses it
            [(10, "old old seg new new seg"),
             (11, "old old seg new new seg"),
             (12, "old old seg alpha beta gamma")],
            ["doc_id", "text"])
        batch = spark.createDataFrame(
            [(1, "new new seg delta eps zeta")], ["doc_id", "text"])
        newly = {r.seg for r in newly_common_segments(
            line_seg_counts(stored, w=3), line_seg_counts(batch, w=3),
            boilerplate_min_docs=3).collect()}
        assert newly == {"new new seg"}

    def test_worklist_and_repair(self, spark):
        from vulnerablecode_spark.llm import dedup as d

        stored = spark.createDataFrame(
            [(10, "new new seg keep me here"),
             (11, "new new seg other tail toks"),
             (12, "unrelated words only here now")],
            ["doc_id", "text"])
        batch = spark.createDataFrame(
            [(1, "new new seg batch tail x")], ["doc_id", "text"])
        index = d.line_seg_counts(stored, w=3)
        postings = d.line_seg_postings(stored, w=3)
        bc = d.line_seg_counts(batch, w=3)
        newly = d.newly_common_segments(index, bc, boilerplate_min_docs=3)
        ids = {r.doc_id for r in
               d.retro_reclean_ids(postings, newly).collect()}
        assert ids == {10, 11}
        affected = stored.filter(F.col("doc_id").isin(list(ids)))
        got = {r.doc_id: r.cleaned_text for r in d.retro_reclean(
            affected, index, bc, w=3, boilerplate_min_docs=3).collect()}
        assert got == {10: "keep me here", 11: "other tail toks"}


class TestRetroRecleanProperty:
    """VERDICT r10 directive #1, the completing invariant: incremental
    clean of the batch + retro re-clean of the work list + the untouched
    previously-cleaned rows ≡ batch line_level_dedup over old ∪ new, for
    ALL documents (q105's test only covered the new docs)."""

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    @given(st.integers(0, 2**32 - 1), st.integers(1, 3), st.integers(2, 4))
    @settings(max_examples=8, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    def test_incremental_plus_retro_equals_batch(self, spark, seed, w, k):
        import random

        from vulnerablecode_spark.llm import dedup as d

        rng = random.Random(seed)
        vocab = ["aa", "bb", "cc"]
        n = rng.randint(2, 12)
        docs = [(i, " ".join(rng.choice(vocab)
                             for _ in range(rng.randint(1, 10))))
                for i in range(n)]
        cut = rng.randint(0, n)
        df = spark.createDataFrame(docs, ["doc_id", "text"])
        stored = df.filter(F.col("doc_id") >= cut)
        new = df.filter(F.col("doc_id") < cut)

        # state at time T: cleaned store + its indexes
        served = {r.doc_id: (r.cleaned_text, r.segs_total, r.segs_dropped)
                  for r in d.line_level_dedup(
                      stored, w=w, boilerplate_min_docs=k).collect()}
        index = d.line_seg_counts(stored, w=w)
        postings = d.line_seg_postings(stored, w=w)

        # increment at T+1: clean the batch, emit + repair the work list
        bc = d.line_seg_counts(new, w=w)
        for r in d.line_level_dedup_incremental(
                index, new, w=w, boilerplate_min_docs=k).collect():
            served[r.doc_id] = (r.cleaned_text, r.segs_total, r.segs_dropped)
        newly = d.newly_common_segments(index, bc, boilerplate_min_docs=k)
        work = [r.doc_id for r in
                d.retro_reclean_ids(postings, newly).collect()]
        if work:
            affected = stored.filter(F.col("doc_id").isin(work))
            for r in d.retro_reclean(affected, index, bc, w=w,
                                     boilerplate_min_docs=k).collect():
                served[r.doc_id] = (r.cleaned_text, r.segs_total,
                                    r.segs_dropped)

        batch_full = {r.doc_id: (r.cleaned_text, r.segs_total,
                                 r.segs_dropped)
                      for r in d.line_level_dedup(
                          df, w=w, boilerplate_min_docs=k).collect()}
        assert served == batch_full


class TestNearDupCompositionTierEquality:
    """VERDICT r10 directive #4: the tier the 100 TB story cites is now
    the default — assert the FULL near-dup composition (shingle → MinHash
    → LSH candidates → exact verify) is bit-identical from either
    hashed_shingles tier, not just the shingle frames."""

    def test_full_composition_hof_equals_arrow(self, spark):
        from vulnerablecode_spark.llm.dedup import (hashed_shingles,
                                                    near_dup_pairs)

        base = "the quick brown fox jumps over the lazy dog again and again"
        rows = [(1, base), (2, base + " tail"), (3, base.replace("dog", "cat")),
                (4, "completely different text with no overlap at all here"),
                (5, base), (6, None)]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        outs = {}
        for impl in ("hof", "arrow"):
            hashed = hashed_shingles(docs, impl=impl).localCheckpoint(
                eager=True)
            outs[impl] = {(r.doc_a, r.doc_b, r.jaccard)
                          for r in near_dup_pairs(
                              hashed=hashed, threshold=0.2).collect()}
        assert outs["hof"] == outs["arrow"] and outs["hof"]


class TestMinhashCalibration:
    def test_estimate_tracks_exact_and_exact_matches_near_dup(self, spark):
        from vulnerablecode_spark.llm.dedup import (minhash_estimate_pairs,
                                                    near_dup_pairs)

        base = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12"
        docs = spark.createDataFrame(
            [(1, base), (2, base), (3, base + " tail tok"),
             (4, "other words entirely unrelated here now")],
            "doc_id long, text string")
        rows = {(r.doc_a, r.doc_b): (r.est_bp, r.jaccard)
                for r in minhash_estimate_pairs(docs).collect()}
        assert rows, "identical docs must be LSH candidates"
        # exact column == near_dup_pairs at threshold 0 for same pairs
        exact = {(r.doc_a, r.doc_b): r.jaccard
                 for r in near_dup_pairs(docs, threshold=0.0).collect()}
        for pair, (est, jac) in rows.items():
            assert exact[pair] == jac
            assert 0 <= est <= 10000 and est % 625 == 0
        # an identical pair estimates 10000 exactly (all lanes agree)
        assert rows[(1, 2)] == (10000, 1.0)


class TestDecontaminationIncremental:
    """decontamination_incremental == decontamination_overlap(corpus,
    old ∪ delta) restricted to docs touched by (delta \\ old) — random
    corpora and random benchmark splits."""

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    @given(st.integers(0, 2**32 - 1))
    @settings(max_examples=6, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    def test_matches_batch_restricted_to_affected(self, spark, seed):
        import random

        from vulnerablecode_spark.llm.dedup import (
            decontamination_incremental, decontamination_overlap,
            hashed_shingles)

        rng = random.Random(seed)
        vocab = ["aa", "bb", "cc", "dd", "ee"]
        n = rng.randint(4, 12)
        docs = [(i, " ".join(rng.choice(vocab)
                             for _ in range(rng.randint(3, 10))))
                for i in range(n)]
        df = spark.createDataFrame(docs, "doc_id long, text string")
        c1 = rng.randint(0, n)
        c2 = rng.randint(c1, n)
        old_docs = df.filter(F.col("doc_id") < c1)
        delta_docs = df.filter(
            (F.col("doc_id") >= c1) & (F.col("doc_id") < c2))

        index = hashed_shingles(df).localCheckpoint(eager=True)
        old = hashed_shingles(old_docs).localCheckpoint(eager=True)
        delta = hashed_shingles(delta_docs).localCheckpoint(eager=True)
        got = {r.doc_id: (r.n_shingles, r.n_overlap, r.overlap_bp)
               for r in decontamination_incremental(
                   index, old, delta).collect()}

        old_h = {r.h for r in old.collect()}
        fresh = {r.h for r in delta.collect()} - old_h
        affected = {r.doc_id for r in index.collect() if r.h in fresh}
        bench_union = old_docs.unionByName(delta_docs)
        want = {r.doc_id: (r.n_shingles, r.n_overlap, r.overlap_bp)
                for r in decontamination_overlap(
                    df, bench_union).collect()
                if r.doc_id in affected}
        assert got == want


class TestDimSideGuard:
    def test_probe_boundary(self, spark):
        # exactly at the limit -> broadcast hint kept; one over -> plain
        from pyspark.sql.functions import broadcast  # noqa: F401

        from vulnerablecode_spark.llm.dedup import _dim_side

        dim = spark.createDataFrame([(i,) for i in range(5)], "seg long")
        at_limit = _dim_side(dim, 5)
        over_limit = _dim_side(dim, 4)
        none_limit = _dim_side(dim, None)
        # a broadcast hint shows up as ResolvedHint in the analyzed plan
        def hinted(df):
            return "hint" in df._jdf.queryExecution().analyzed().toString().lower()
        assert hinted(at_limit)
        assert not hinted(over_limit)
        assert hinted(none_limit)


class TestKeepBestPerCluster:
    def test_longest_member_wins_not_min_id(self, spark):
        from vulnerablecode_spark.llm.dedup import keep_best_per_cluster

        comps = spark.createDataFrame(
            [(1, 1), (2, 1)], "node long, component long")
        docs = spark.createDataFrame(
            [(1, 10), (2, 50), (3, 7)], "doc_id long, n_chars long")
        got = {r.doc_id: (r.cluster_id, r.n_chars, r.keep)
               for r in keep_best_per_cluster(docs, comps).collect()}
        # min-id member 1 LOSES to the longer member 2 (the q60 rule
        # would have kept 1); singleton 3 keeps trivially
        assert got == {1: (1, 10, False), 2: (1, 50, True), 3: (3, 7, True)}

    def test_tie_breaks_on_min_id(self, spark):
        from vulnerablecode_spark.llm.dedup import keep_best_per_cluster

        comps = spark.createDataFrame(
            [(5, 5), (6, 5), (7, 5)], "node long, component long")
        docs = spark.createDataFrame(
            [(5, 20), (6, 20), (7, 20)], "doc_id long, n_chars long")
        got = {r.doc_id: r.keep
               for r in keep_best_per_cluster(docs, comps).collect()}
        assert got == {5: True, 6: False, 7: False}


class TestComponentsIncremental:
    """connected_components_incremental == batch CC over old ∪ new edges
    — random graphs, random splits (min-labels compose under union)."""

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    @given(st.integers(0, 2**32 - 1))
    @settings(max_examples=6, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    def test_matches_batch_cc(self, spark, seed):
        import random

        from vulnerablecode_spark.operators.components import (
            connected_components, connected_components_incremental)

        rng = random.Random(seed)
        n_nodes = rng.randint(4, 20)
        n_edges = rng.randint(1, 24)
        edges = [(rng.randrange(n_nodes), rng.randrange(n_nodes))
                 for _ in range(n_edges)]
        cut = rng.randint(0, n_edges)
        old, new = edges[:cut], edges[cut:]

        def df(rows):
            return spark.createDataFrame(
                rows or [(None, None)], "src long, dst long").filter(
                F.col("src").isNotNull())

        stored = connected_components(df(old)) if old else \
            spark.createDataFrame([], "node long, component long")
        got = {(r.node, r.component)
               for r in connected_components_incremental(
                   stored, df(new)).collect()}
        want = {(r.node, r.component)
                for r in connected_components(df(edges)).collect()} \
            if edges else set()
        assert got == want

    def test_new_node_bridges_two_old_components(self, spark):
        from pyspark.sql import functions as F  # noqa: F401

        from vulnerablecode_spark.operators.components import (
            connected_components, connected_components_incremental)

        old = spark.createDataFrame([(3, 4), (9, 11)], "src long, dst long")
        stored = connected_components(old)
        # new node 120 bridges components 3 and 9
        new = spark.createDataFrame([(4, 120), (120, 11)],
                                    "src long, dst long")
        got = {r.node: r.component
               for r in connected_components_incremental(
                   stored, new).collect()}
        assert got == {3: 3, 4: 3, 9: 3, 11: 3, 120: 3}


class TestBm25IncrementalIndex:
    """q116's invariant: N disjoint appends into the stored BM25 index
    score identically to a from-scratch index over the union — for any
    split, any term set, including terms absent from one side."""

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    def _score(self, postings, lengths, terms):
        from vulnerablecode_spark.llm.text import bm25_topk_from_index
        return sorted(
            tuple(r) for r in
            bm25_topk_from_index(postings, lengths, terms, k=50).collect())

    @given(st.integers(0, 2**32 - 1), st.integers(1, 5))
    @settings(max_examples=6, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    def test_appends_equal_rebuild(self, spark, seed, mod):
        import numpy as np
        import pyspark.sql.functions as F

        from vulnerablecode_spark.llm.text import (bm25_index,
                                                   bm25_index_increment)

        rng = np.random.default_rng(seed)
        vocab = [f"w{i}" for i in range(12)]
        rows = [(i, " ".join(rng.choice(vocab,
                                        size=int(rng.integers(3, 20)))))
                for i in range(20)]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        is_new = F.col("doc_id") % (mod + 1) == 0
        old, batch = docs.filter(~is_new), docs.filter(is_new)
        terms = ["w0", "w3", "w11"]
        p, ln = bm25_index(old)
        p, ln = bm25_index_increment(p, ln, batch)
        assert self._score(p, ln, terms) == \
            self._score(*bm25_index(docs), terms)

    def test_batch_only_and_empty_batch(self, spark):
        from vulnerablecode_spark.llm.text import (bm25_index,
                                                   bm25_index_increment)
        docs = spark.createDataFrame(
            [(1, "a b a"), (2, "b c"), (3, "a c c")],
            "doc_id long, text string")
        empty = docs.filter("doc_id < 0")
        # empty stored index + full batch ≡ batch build
        p, ln = bm25_index_increment(*bm25_index(empty), docs)
        assert self._score(p, ln, ["a", "c"]) == \
            self._score(*bm25_index(docs), ["a", "c"])
        # empty batch is a no-op
        p2, ln2 = bm25_index_increment(*bm25_index(docs), empty)
        assert self._score(p2, ln2, ["a", "c"]) == \
            self._score(*bm25_index(docs), ["a", "c"])


class TestHashSplit:
    def test_deterministic_and_stable_under_growth(self, spark):
        """A doc's split never depends on what else is in the corpus —
        the property a rand()-based split violates."""
        from vulnerablecode_spark.llm.curate import hash_split
        docs = spark.createDataFrame(
            [(i, f"t{i}") for i in range(200)], "doc_id long, text string")
        full = {r.doc_id: (r.bucket, r.split)
                for r in hash_split(docs).collect()}
        sub = {r.doc_id: (r.bucket, r.split)
               for r in hash_split(docs.filter("doc_id < 50")).collect()}
        assert all(full[i] == sub[i] for i in sub)
        again = {r.doc_id: (r.bucket, r.split)
                 for r in hash_split(docs).collect()}
        assert full == again

    def test_salt_rerolls_and_percents_validated(self, spark):
        from vulnerablecode_spark.llm.curate import hash_split
        import pytest as _pytest
        docs = spark.createDataFrame(
            [(i, "x") for i in range(300)], "doc_id long, text string")
        a = {r.doc_id: r.split for r in hash_split(docs, salt="v1").collect()}
        b = {r.doc_id: r.split for r in hash_split(docs, salt="v2").collect()}
        assert a != b  # a re-roll moves at least one of 300 docs
        with _pytest.raises(ValueError):
            hash_split(docs, splits=(("train", 90), ("val", 5)))

    def test_split_fractions_approximate_percents(self, spark):
        from vulnerablecode_spark.llm.curate import hash_split
        docs = spark.createDataFrame(
            [(i, "x") for i in range(2000)], "doc_id long, text string")
        counts = {r.split: r.n for r in hash_split(docs).groupBy("split")
                  .agg(__import__("pyspark.sql.functions",
                                  fromlist=["F"]).count("*").alias("n"))
                  .collect()}
        assert 0.75 * 2000 < counts["train"] < 0.85 * 2000
        assert counts["train"] + counts["val"] + counts["test"] == 2000


class TestGopherRules:
    def test_handcrafted_failures(self, spark):
        from vulnerablecode_spark.llm.text import gopher_rules_report
        good = "the of and a " + " ".join(
            f"word{i}" for i in range(56))  # 60 tokens, all distinct
        rows = [
            (1, good),                              # passes everything
            (2, "tiny doc the of and a"),           # fails word_count
            (3, " ".join(["zq"] * 60)),             # fails stopword+ttr+awl
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        rep = {r.rule: r.n_failed
               for r in gopher_rules_report(docs).collect()}
        assert rep["word_count"] == 1
        assert rep["stopword_presence"] == 1
        assert rep["distinct_ratio"] == 1
        # doc3 ('zq'×60 → awl 200) and doc2 (short words, awl 266)
        assert rep["mean_word_len"] == 2


class TestSourceDupMatrix:
    def test_mirrored_sources_show_off_diagonal(self, spark):
        from vulnerablecode_spark.llm.dedup import source_dup_matrix
        t = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
        rows = [(1, t, "crawl_a"), (2, t, "crawl_b"),
                (3, "totally different words here all unique ones now",
                 "crawl_a")]
        docs = spark.createDataFrame(
            rows, "doc_id long, text string, source string")
        got = {(r.src_a, r.src_b): (r.n_pairs, r.max_jaccard)
               for r in source_dup_matrix(docs, threshold=0.5).collect()}
        assert got == {("crawl_a", "crawl_b"): (1, 1.0)}


class TestBigramLm:
    def test_corpus_typical_beats_outlier(self, spark):
        from vulnerablecode_spark.llm.text import bigram_lm_scores
        common = "the cat sat on the mat"
        rows = [(i, common) for i in range(9)] + [
            (9, "zyx wvu tsr qpo nml kji")]  # bigrams seen once each
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        scores = {r.doc_id: r.lm_score_bp
                  for r in bigram_lm_scores(docs).collect()}
        assert scores[0] > scores[9]
        assert all(0 <= s <= 10000 for s in scores.values())

    def test_short_docs_excluded(self, spark):
        from vulnerablecode_spark.llm.text import bigram_lm_scores
        docs = spark.createDataFrame(
            [(1, "solo"), (2, "two words")], "doc_id long, text string")
        got = {r.doc_id for r in bigram_lm_scores(docs).collect()}
        assert got == {2}

    def test_unseen_bigrams_take_smoothing_floor(self, spark):
        # scoring docs against a FOREIGN model: every bigram unseen →
        # p_bp = 10000 div v_size for each (left-join floor, not a drop)
        from vulnerablecode_spark.llm.text import (bigram_counts,
                                                   bigram_lm_scores_for)
        model_docs = spark.createDataFrame(
            [(1, "aa bb aa bb")], "doc_id long, text string")
        score_docs = spark.createDataFrame(
            [(2, "qq rr ss")], "doc_id long, text string")
        vocab = spark.createDataFrame([(4,)], "v_size long")
        got = bigram_lm_scores_for(
            score_docs, bigram_counts(model_docs), vocab).collect()
        assert len(got) == 1
        assert got[0].n_bigrams == 2
        assert got[0].lm_score_bp == 10000 // 4


class TestSemanticDedupIncremental:
    """q130: batch-vs-stored SemDeDup — keep flags for the batch plus the
    retro work list of stored keepers demoted by lower-id arrivals."""

    def _setup(self, spark):
        from vulnerablecode_spark.llm.similarity import ivf_index

        # two well-separated clusters on axes; stored ids 5,6 / 7,8
        dim = 64

        def vec(axis, scale=1.0):
            v = [0.0] * dim
            v[axis] = scale
            return v

        stored = spark.createDataFrame(
            [(5, vec(0)), (6, vec(0, 0.9)), (7, vec(1)), (8, vec(1, 0.9))],
            "vec_id long, embedding array<double>")
        centroids, assigned = ivf_index(stored, 2)
        return vec, centroids, assigned

    def test_lower_id_arrival_demotes_stored_keeper(self, spark):
        from vulnerablecode_spark.llm.similarity import \
            semantic_dedup_incremental

        vec, centroids, assigned = self._setup(spark)
        # id 1 < stored 5: stored 5 lands on the retro list, batch keeps;
        # id 100 > stored 7: the batch vector itself drops
        new = spark.createDataFrame(
            [(1, vec(0)), (100, vec(1))],
            "vec_id long, embedding array<double>")
        res = semantic_dedup_incremental(new, centroids, assigned,
                                         threshold=0.9)
        keep = {r.vec_id: r.keep for r in res["keep"].collect()}
        assert keep == {1: True, 100: False}
        retro = {r.vec_id for r in res["retro_dups"].collect()}
        assert 5 in retro
        assert 7 not in retro  # its duplicate has the HIGHER id

    def test_new_vs_new_dedup_within_batch(self, spark):
        from vulnerablecode_spark.llm.similarity import \
            semantic_dedup_incremental

        vec, centroids, assigned = self._setup(spark)
        new = spark.createDataFrame(
            [(20, vec(0)), (21, vec(0, 0.95))],
            "vec_id long, embedding array<double>")
        res = semantic_dedup_incremental(new, centroids, assigned,
                                         threshold=0.9)
        keep = {r.vec_id: r.keep for r in res["keep"].collect()}
        # 20 survives its stored matches only if ids are higher — stored
        # 5,6 are LOWER, so 20 drops; 21 drops on 20/5/6 either way
        assert keep == {20: False, 21: False}

    def test_disjoint_batch_all_keep_no_retro(self, spark):
        from vulnerablecode_spark.llm.similarity import \
            semantic_dedup_incremental

        vec, centroids, assigned = self._setup(spark)
        new = spark.createDataFrame(
            [(30, [float(i % 3 - 1) for i in range(64)])],
            "vec_id long, embedding array<double>")
        res = semantic_dedup_incremental(new, centroids, assigned,
                                         threshold=0.95)
        assert [r.keep for r in res["keep"].collect()] == [True]
        assert res["retro_dups"].count() == 0


class TestNgramNovelty:
    def test_unique_vs_shared_trigram_fractions(self, spark):
        from vulnerablecode_spark.llm.text import ngram_novelty

        docs = spark.createDataFrame(
            [(1, "a b c d"),          # grams: "a b c","b c d"
             (2, "a b c x"),          # shares "a b c" with doc 1
             (3, "p q r s t"),        # all unique
             (4, "xy")],              # < 3 tokens: absent
            "doc_id long, text string")
        out = {r.doc_id: r for r in ngram_novelty(docs, n=3).collect()}
        assert 4 not in out
        assert (out[1].n_grams, out[1].novel_grams,
                out[1].novelty_bp) == (2, 1, 5000)
        assert out[2].novelty_bp == 5000
        assert out[3].novelty_bp == 10000

    def test_repeated_gram_within_one_doc_is_distinct_typed(self, spark):
        from vulnerablecode_spark.llm.text import ngram_novelty

        # "a b a b a b" repeats its grams but no OTHER doc has them:
        # distinct-type counting makes the doc fully novel
        docs = spark.createDataFrame(
            [(1, "a b a b a b")], "doc_id long, text string")
        out = ngram_novelty(docs, n=3).collect()[0]
        assert out.n_grams == 2  # "a b a", "b a b"
        assert out.novelty_bp == 10000


class TestStitchCandidates:
    def test_planted_fragment_pair_found_and_verified(self, spark):
        from vulnerablecode_spark.llm.dedup import stitch_candidates

        docs = spark.createDataFrame(
            [(1, "one two three four five six seven"),   # tail: 3..7
             (2, "three four five six seven eight"),     # head: 3..7
             (3, "unrelated words entirely here now"),
             (4, "tiny doc")],                           # < w tokens
            "doc_id long, text string")
        out = stitch_candidates(docs, w=5).collect()
        assert [(r.id_a, r.id_b) for r in out] == [(1, 2)]

    def test_self_pair_excluded_even_for_periodic_text(self, spark):
        from vulnerablecode_spark.llm.dedup import stitch_candidates

        docs = spark.createDataFrame(
            [(1, "a b c d e a b c d e")], "doc_id long, text string")
        assert stitch_candidates(docs, w=5).count() == 0


class TestRrfFuse:
    def test_hand_computed_fusion(self, spark):
        from vulnerablecode_spark.llm.text import rrf_fuse

        a = spark.createDataFrame(
            [(10, 1), (20, 2), (30, 3)], "doc_id long, rk int")
        b = spark.createDataFrame(
            [(20, 1), (40, 2)], "doc_id long, rk int")
        rows = {r.doc_id: r for r in
                rrf_fuse([a, b], k_const=60, k=10).collect()}
        # doc 20: both lists → 1/62 + 1/61; doc 10 only list a → 1/61
        assert rows[20].n_lists == 2 and rows[20].best_rk == 1
        assert rows[20].rrf_score == round(1 / 62 + 1 / 61, 6)
        assert rows[10].rrf_score == round(1 / 61, 6)
        assert rows[40].rrf_score == round(1 / 62, 6)
        # fused order: 20 (two votes) first, then 10, then 40, then 30
        order = sorted(rows.values(), key=lambda r: r.rk)
        assert [r.doc_id for r in order] == [20, 10, 40, 30]

    def test_topk_truncates_and_requires_input(self, spark):
        from vulnerablecode_spark.llm.text import rrf_fuse

        a = spark.createDataFrame(
            [(i, i + 1) for i in range(20)], "doc_id long, rk int")
        assert rrf_fuse([a], k=5).count() == 5
        with pytest.raises(ValueError):
            rrf_fuse([])


class TestHardNegatives:
    def test_same_label_and_near_dup_excluded(self, spark):
        from vulnerablecode_spark.llm.similarity import hard_negatives

        # anchor 0 (label 0); 1: same label, highest sim → excluded;
        # 2: diff label, sim ≈ 1.0 → excluded by the near-dup cap;
        # 3/4: diff label, moderate sim → ranked by cosine
        rows = [
            (0, [1.0, 0.0, 0.0], 0),
            (1, [0.99, 0.1, 0.0], 0),
            (2, [1.0, 0.001, 0.0], 1),
            (3, [0.8, 0.6, 0.0], 1),
            (4, [0.5, 0.86, 0.0], 2),
        ]
        emb = spark.createDataFrame(
            rows, "vec_id long, embedding array<double>, label int")
        got = hard_negatives(emb, emb.filter(F.col("vec_id") == 0),
                             k=5, sim_cap=0.95).collect()
        ids = [r.neighbor_id for r in sorted(got, key=lambda r: r.rk)]
        assert ids == [3, 4]
        assert all(r.cosine_sim < 0.95 for r in got)

    def test_ranks_are_per_anchor(self, spark):
        from vulnerablecode_spark.llm.similarity import hard_negatives

        rows = [(i, [float(i % 3 + 1), float(i % 5)], i % 2)
                for i in range(30)]
        emb = spark.createDataFrame(
            rows, "vec_id long, embedding array<double>, label int")
        got = hard_negatives(emb, emb.filter(F.col("vec_id") < 4), k=3)
        per = {}
        for r in got.collect():
            per.setdefault(r.query_id, []).append(r.rk)
        assert set(per) == {0, 1, 2, 3}
        assert all(sorted(v) == list(range(1, len(v) + 1))
                   for v in per.values())


class TestWhitening:
    def test_constant_dim_passes_through_unscaled(self, spark):
        from vulnerablecode_spark.llm.similarity import (
            embedding_dim_stats, whitening_summary)

        emb = spark.createDataFrame(
            [(0, [1.0, 2.0]), (1, [1.0, 4.0]), (2, [1.0, 6.0])],
            "vec_id long, embedding array<double>")
        stats = {r.dim: r for r in embedding_dim_stats(emb).collect()}
        assert stats[0].sigma == 0.0 and stats[0].mu == 1.0
        assert stats[1].mu == 4.0 and abs(stats[1].sigma
                                          - 1.632993) < 1e-5
        rows = {r.vec_id: r for r in whitening_summary(emb).collect()}
        # dim 0: (x - 1)/1 = 0 everywhere; dim 1: standardized values
        for vid, x in [(0, 2.0), (1, 4.0), (2, 6.0)]:
            import math

            w = (x - 4.0) / stats[1].sigma
            assert rows[vid].wsum_q == math.floor(w * 10000 + 0.5)
            assert rows[vid].wss_q == math.floor(w * w * 10000 + 0.5)

    def test_whitened_corpus_is_centered_unit_variance(self, spark,
                                                       embeddings):
        from vulnerablecode_spark.llm.similarity import whitening_summary

        n = embeddings.count()
        agg = (whitening_summary(
            embeddings.select(
                "vec_id",
                F.transform("embedding",
                            lambda x: x.cast("double")).alias("embedding")))
            .agg(F.sum("wsum_q").alias("s"), F.sum("wss_q").alias("ss"))
            .head())
        dim = 64
        # mean ~0: quantized sum per value is ±0.5e-4 off, so the total
        # drifts at most n·dim half-units; variance ~1: wss ≈ n·dim·1e4
        assert abs(agg.s) <= n * dim
        assert abs(agg.ss - n * dim * 10000) <= n * dim * 500


class TestTfidfKeywords:
    def test_hand_computed_scores(self, spark):
        import math

        from vulnerablecode_spark.llm.text import tfidf_keywords

        docs = spark.createDataFrame(
            [(1, "apple banana apple"), (2, "banana cherry"),
             (3, "cherry cherry dog")],
            "doc_id long, text string")
        rows = {(r.doc_id, r.rk): r for r in
                tfidf_keywords(docs, k=2).collect()}
        assert rows[(1, 1)].tok == "apple"
        assert rows[(1, 1)].score == round(2 * math.log(3 / 1), 4)
        assert rows[(1, 2)].tok == "banana"
        assert rows[(1, 2)].score == round(1 * math.log(3 / 2), 4)
        # doc 3: cherry tf=2 beats dog idf — 2·ln(1.5) > 1·ln(3)? it
        # doesn't (0.81 < 1.10): dog wins rank 1
        assert rows[(3, 1)].tok == "dog"
        assert rows[(3, 2)].tok == "cherry"


class TestVocabularyGrowth:
    def test_new_types_and_cumulative(self, spark):
        from vulnerablecode_spark.llm.text import vocabulary_growth

        df = spark.createDataFrame(
            [(0, "a b a"), (1, "b c"), (2, "a")],
            "batch long, text string")
        rows = {r.batch: r for r in vocabulary_growth(df).collect()}
        assert (rows[0].n_tokens, rows[0].new_types,
                rows[0].cum_types) == (3, 2, 2)
        assert (rows[1].n_tokens, rows[1].new_types,
                rows[1].cum_types) == (2, 1, 3)
        assert (rows[2].n_tokens, rows[2].new_types,
                rows[2].cum_types) == (1, 0, 3)


class TestCentroidSimilarity:
    def test_identical_and_orthogonal_labels(self, spark):
        from vulnerablecode_spark.llm.similarity import (
            label_centroid_similarity)

        rows = (
            [(i, [1.0, 0.0], 0) for i in range(5)]
            + [(10 + i, [1.0, 0.0], 1) for i in range(5)]   # same centroid
            + [(20 + i, [0.0, 2.0], 2) for i in range(5)]   # orthogonal
        )
        emb = spark.createDataFrame(
            rows, "vec_id long, embedding array<double>, label int")
        got = {(r.label_a, r.label_b): r.cosine_sim
               for r in label_centroid_similarity(emb).collect()}
        assert got[(0, 1)] == 1.0
        assert got[(0, 2)] == 0.0
        assert got[(1, 2)] == 0.0
