"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash.

Extends the reference's content-hash dedup (remove_duplicate_advisories.py,
utils.py:623-726) to corpus-scale near-dedup. All operators are built-in
Catalyst expressions (explode/groupBy/join) — no Python in the hot path —
and every hash is fully deterministic (md5-derived), so results are
reproducible across engines and runs.

Scale design (100 TB):
- shingling explodes each doc into O(tokens) rows → embarrassingly parallel;
- MinHash reduces each doc to a fixed 16-int signature (map-side combinable
  min-aggregation), so the candidate join touches signatures, not text;
- LSH banding turns O(n²) pair search into an equi-join on (band, signature)
  — hash-partitioned, AQE-skew-splittable;
- exact Jaccard verification runs only on LSH candidates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from vulnerablecode_spark.llm.text import fingerprint

# MinHash parameters: 16 permutations in 4 bands of 4 rows.
MINHASH_P = 2_147_483_647  # Mersenne prime 2^31-1
N_HASHES = 16
BAND_ROWS = 4


def spread(df: DataFrame, *cols: str) -> DataFrame:
    """Repartition to the session's default parallelism before a fan-out
    stage. Small-file inputs (one parquet file → one partition) would
    otherwise run the whole explode on a single core; at 100 TB inputs are
    already many splits and this is a cheap round-robin of row groups."""
    n = df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(n, *cols) if cols else df.repartition(n)


def hash64(col: Column) -> Column:
    """Deterministic 60-bit integer hash of a string (md5-derived).

    Matches DuckDB's ``('0x' || substr(md5(s), 1, 15))::BIGINT`` so oracle
    queries can reproduce it exactly.
    """
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep-first exact dedup over the normalized-content fingerprint —
    dropDuplicates with a deterministic min-id keep rule
    (remove_duplicate_advisories.py:17-100 semantics)."""
    w = Window.partitionBy("fp").orderBy(F.col(id_col).asc())
    return (
        df.withColumn("fp", fingerprint(F.col(text_col)))
        .withColumn("rn", F.row_number().over(w))
        .withColumn("keep", F.col("rn") == 1)
        .drop("rn")
    )


def shingles(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
             n: int = 3) -> DataFrame:
    """Distinct word n-gram shingles per document: (id, shingle)."""
    toks = F.split(F.col(text_col), " ")  # plain-space tokenizer: 3-5x cheaper than regex in the hottest explode
    # sequence(0, negative) would generate a DESCENDING sequence, so guard
    # docs shorter than n tokens with an explicit empty array.
    grams = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j + 1) for j in range(n)]),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        spread(df, id_col)
        .select(F.col(id_col), F.explode(grams).alias("shingle"))
        .distinct()
    )


def ngram_jaccard_pairs(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", n: int = 3,
                        threshold: float = 0.5) -> DataFrame:
    """Exact n-gram Jaccard similarity pairs ≥ threshold.

    Inverted-index join on the shingle (never a cross join): |A∩B| comes
    from the per-shingle doc lists, |A∪B| = |A|+|B|-|A∩B|.
    """
    sh = shingles(df, text_col, id_col, n).cache()
    # eager materialization: three subtrees (sizes + both join sides) read
    # this cache concurrently in one action; racing the population can
    # recompute the explode per subtree and triples the hottest stage
    sh.count()
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.select(F.col(id_col).alias("doc_a"), "shingle")
    b = sh.select(F.col(id_col).alias("doc_b"), "shingle")
    common = (
        a.join(b, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col(id_col).alias("doc_a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col(id_col).alias("doc_b"), F.col("n_sh").alias("nb"))
    jac = F.round(
        F.col("n_common") / (F.col("na") + F.col("nb") - F.col("n_common")), 4
    )
    return (
        common.join(sa, "doc_a").join(sb, "doc_b")
        .select("doc_a", "doc_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def minhash_signatures(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id", n: int = 3) -> DataFrame:
    """Wide MinHash signatures: (id, mh_0 … mh_15) in ONE aggregation.

    Universal hashing ((a_j·h + b_j) mod P) over md5-derived shingle
    hashes; h is reduced mod P first so a_j·h never overflows int64 — the
    identical arithmetic is expressible in ANSI SQL for oracle
    verification. All 16 lanes are parallel ``min`` aggregates over the
    shingle rows — no ×16 row explosion, so the shuffle stays the size of
    the shingle set (the thing that matters at 100 TB).
    """
    sh = shingles(df, text_col, id_col, n)
    # materialize the md5-derived hash ONCE per shingle row — referencing
    # hash64() inside each lane would recompute the md5 16 times
    hashed = sh.select(F.col(id_col),
                       (hash64(F.col("shingle")) % MINHASH_P).alias("hp"))
    lanes = [
        F.min(((37 + j * 101) * F.col("hp") + (17 + j * 257)) % MINHASH_P)
        .alias(f"mh_{j}")
        for j in range(N_HASHES)
    ]
    return hashed.groupBy(id_col).agg(*lanes)


def lsh_candidate_pairs(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", n: int = 3) -> DataFrame:
    """Near-duplicate candidate pairs via LSH banding of MinHash signatures.

    Docs agreeing on ALL rows of at least one band become candidates —
    an equi-join on (band, band_signature), never O(n²).
    """
    sig = minhash_signatures(df, text_col, id_col, n)
    # each band's signature string comes straight off the wide columns;
    # stack() unpivots to (id, band, band_sig) for the candidate join
    band_sigs = [
        F.concat_ws("-", *[F.col(f"mh_{b * BAND_ROWS + r}")
                           for r in range(BAND_ROWS)]).alias(f"band_{b}")
        for b in range(N_HASHES // BAND_ROWS)
    ]
    n_bands = N_HASHES // BAND_ROWS
    wide = sig.select(F.col(id_col), *band_sigs)
    stack_expr = ", ".join(f"{b}, band_{b}" for b in range(n_bands))
    bands = wide.selectExpr(
        id_col, f"stack({n_bands}, {stack_expr}) AS (band, band_sig)"
    )
    left = bands.select(F.col(id_col).alias("doc_a"), "band", "band_sig")
    right = bands.select(F.col(id_col).alias("doc_b"), "band", "band_sig")
    return (
        left.join(right, ["band", "band_sig"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def near_dup_pairs(df: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id", n: int = 3,
                   threshold: float = 0.8) -> DataFrame:
    """The corpus-scale near-dup composition: MinHash/LSH candidates first,
    exact Jaccard verification ONLY on candidates.

    ``ngram_jaccard_pairs`` scores every pair sharing ≥1 shingle — exact
    but O(sum d²) over shingle document-frequencies. Here the quadratic
    step runs on the LSH candidate set (pairs agreeing on a full band),
    which is ~linear in the number of true near-dups: candidates join back
    to the inverted index, so only candidate pairs pay the intersect.
    """
    sh = shingles(df, text_col, id_col, n).cache()
    sh.count()  # eager: three consumers below
    candidates = lsh_candidate_pairs(df, text_col, id_col, n)
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.select(F.col(id_col).alias("doc_a"), "shingle")
    b = sh.select(F.col(id_col).alias("doc_b"), "shingle")
    common = (
        a.join(b, "shingle")
        .join(candidates, ["doc_a", "doc_b"], "left_semi")  # candidates only
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col(id_col).alias("doc_a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col(id_col).alias("doc_b"), F.col("n_sh").alias("nb"))
    jac = F.round(
        F.col("n_common") / (F.col("na") + F.col("nb") - F.col("n_common")), 4
    )
    return (
        common.join(sa, "doc_a").join(sb, "doc_b")
        .select("doc_a", "doc_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def simhash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
            bits: int = 32) -> DataFrame:
    """Per-document SimHash signature (bit-majority over token hashes).

    One aggregation: per token row, every bit position contributes ±1 via
    ``bits`` parallel conditional sums; the signature recombines the sums'
    signs. No (token × bit) row explosion — the shuffle stays the size of
    the token stream, map-side-combinable, deterministic md5 hashes.
    """
    toks = F.split(F.col(text_col), " ")  # plain-space tokenizer: 3-5x cheaper than regex in the hottest explode
    t = spread(df, id_col).select(F.col(id_col), F.explode(toks).alias("tok"))
    t = t.select(F.col(id_col), hash64(F.col("tok")).alias("h"))
    lanes = [
        F.sum(
            F.when(F.expr(f"shiftright(h, {b}) & 1") == 1, 1).otherwise(-1)
        ).alias(f"s_{b}")
        for b in range(bits)
    ]
    per_doc = t.groupBy(id_col).agg(*lanes)
    sig = None
    for b in range(bits):
        bit_val = F.when(F.col(f"s_{b}") > 0,
                         F.lit(1 << b).cast("bigint")).otherwise(F.lit(0).cast("bigint"))
        sig = bit_val if sig is None else sig + bit_val
    return per_doc.select(F.col(id_col), sig.cast("bigint").alias("simhash"))
