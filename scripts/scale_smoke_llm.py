#!/usr/bin/env python
"""Scale smoke for the LLM training-data operators: run the dedup /
similarity family on the sf0.1 corpus replicated K× and print per-stage
timings.

Usage: python scripts/scale_smoke_llm.py [K]

Replication gives each copy fresh doc/vec ids but IDENTICAL text, so the
near-dup operators face the adversarial case: every document has K-1 true
near-duplicates, LSH candidate lists grow K× per doc, and the verify
stage's candidate gate is actually load-bearing. The point is the scaling
SHAPE — every stage must stay set-oriented and shuffle bigints, not text —
absolute numbers on this shared-tenant box are noisy.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

K = int(sys.argv[1]) if len(sys.argv) > 1 else 4
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from pyspark.sql import functions as F

    from vulnerablecode_spark.llm import dedup, similarity
    from vulnerablecode_spark.session import get_spark

    spark = get_spark("llm-scale-smoke")
    spark.sparkContext.setLogLevel("ERROR")

    docs0 = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    emb0 = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    n0 = docs0.count()
    copies = spark.range(K).select(F.col("id").alias("copy"))
    docs = (docs0.crossJoin(copies)
            .withColumn("doc_id", F.col("doc_id") + F.col("copy") * 10_000_000)
            .drop("copy"))
    emb = (emb0.crossJoin(copies)
           .withColumn("vec_id", F.col("vec_id") + F.col("copy") * 10_000_000)
           .drop("copy"))
    print(f"# corpus: {n0} docs × {K} = {n0 * K}", flush=True)

    def timed(label, fn):
        t = time.perf_counter()
        out = fn()
        print(f"{label}: {time.perf_counter() - t:.2f}s  ({out})", flush=True)

    hashed = None

    def build_index():
        nonlocal hashed
        hashed = dedup.hashed_shingles(
            docs, impl="arrow").localCheckpoint(eager=True)
        return f"{hashed.count()} shingle rows"

    timed("shingle_index", build_index)
    sig = dedup.minhash_signatures(hashed=hashed, with_sizes=True)
    cand = dedup.lsh_candidate_pairs(sig=sig)
    timed("lsh_candidates", lambda: f"{cand.count()} pairs")
    timed("near_dup_verify", lambda: "{} pairs >= 0.8".format(
        dedup.near_dup_pairs(hashed=hashed, candidates=cand,
                             sizes=sig.select('doc_id', 'n_sh'),
                             threshold=0.8).count()))
    timed("simhash", lambda: f"{dedup.simhash(docs).count()} signatures")
    timed("decontamination", lambda: "{} docs scored".format(
        dedup.decontamination_overlap(
            docs, docs0.filter(F.col("doc_id") < 20), impl="arrow").count()))
    # incremental dedup: the ORIGINAL corpus as the new batch, the K×
    # replicated corpus as the stored index — increment cost must track the
    # increment, not the index
    idx_bands = dedup.band_frame(
        dedup.minhash_signatures(hashed=hashed, with_sizes=True),
        with_sizes=True).localCheckpoint(eager=True)
    new_batch = docs0.withColumn("doc_id", F.col("doc_id") + 900_000_000)
    timed("incremental_near_dup", lambda: "{} new-touching pairs".format(
        dedup.near_dup_pairs_incremental(
            new_batch, hashed, idx_bands, threshold=0.8,
            impl="arrow").count()))
    timed("winnowing", lambda: "{} fingerprints".format(
        dedup.winnowing_fingerprints(docs, impl="arrow").count()))
    # adversarial for the diagonal-islands join: every replica pair
    # shares its ENTIRE token stream as one maximal run
    timed("exact_substrings", lambda: "{} spans".format(
        dedup.exact_substring_spans(docs, impl="arrow").count()))

    # curation family: every stage is a projection or one partitioned
    # window/agg — wall must track corpus size linearly, no stage may
    # shuffle text except the packing window's narrow (id, n_tok) frame
    from vulnerablecode_spark.llm import curate

    timed("pii_redaction", lambda: "{} docs scrubbed".format(
        curate.redact_pii(docs).count()))
    timed("sequence_packing", lambda: "{} manifest rows".format(
        curate.pack_sequences(docs, seq_len=128).count()))
    timed("stratified_sample", lambda: "{} docs kept".format(
        curate.stratified_sample(docs, target_per_stratum=25).count()))
    timed("distinctive_terms", lambda: "{} terms".format(
        curate.distinctive_terms(docs, k=5, min_tf=5).count()))

    # selection family: DSIR fit is two bucket-key aggregates over one
    # explode; scoring joins the corpus only to the broadcast n_buckets-row
    # model — wall must track corpus size, never corpus × model
    from vulnerablecode_spark.llm import select as sel

    lifts_box: list = []

    def fit_model():
        lifts_box.append(sel.dsir_bucket_lifts(
            docs, target=F.col("source") == "src0")
            .localCheckpoint(eager=True))
        return f"{lifts_box[0].count()} bucket lifts"

    timed("dsir_fit", fit_model)
    lifts = lifts_box[0]
    timed("dsir_score", lambda: "{} docs scored".format(
        sel.dsir_score(docs.filter(F.col("source") != "src0"),
                       lifts).count()))
    timed("surprisal_partition", lambda: "{} docs tiered".format(
        sel.surprisal_partition(docs).count()))

    bucketed = emb.select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
        similarity.sign_bucket_arrow(F.col("embedding")).alias("bucket"),
    ).localCheckpoint(eager=True)
    queries = bucketed.filter(F.col("vec_id") < 10)
    timed("ann_lsh_topk", lambda: "{} rows".format(
        similarity.ann_topk_lsh(bucketed, queries, k=3, bucket_col="bucket",
                                impl="arrow").count()))
    timed("ivf_topk", lambda: "{} rows".format(
        similarity.ann_topk_ivf(emb, emb.filter(F.col('vec_id') < 10),
                                k=5, impl="arrow").count()))
    timed("pq_adc_topk", lambda: "{} rows".format(
        similarity.ann_topk_pq(emb, emb.filter(F.col('vec_id') < 10),
                               k=5).count()))
    spark.stop()


if __name__ == "__main__":
    main()
