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
    toks = F.split(F.col(text_col), r"\s+")
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
    """(id, j, minhash) for j in 0..N_HASHES-1.

    Universal hashing ((a_j·h + b_j) mod P) over md5-derived shingle hashes;
    h is reduced mod P first so a_j·h never overflows int64 — the identical
    arithmetic is expressible in ANSI SQL for oracle verification.
    """
    sh = shingles(df, text_col, id_col, n)
    hp = (hash64(F.col("shingle")) % MINHASH_P).alias("hp")
    exploded = sh.select(F.col(id_col), hp, F.explode(
        F.sequence(F.lit(0), F.lit(N_HASHES - 1))).alias("j"))
    a_j = 37 + F.col("j") * 101
    b_j = 17 + F.col("j") * 257
    hj = (a_j * F.col("hp") + b_j) % MINHASH_P
    return (
        exploded.select(F.col(id_col), "j", hj.alias("hj"))
        .groupBy(id_col, "j")
        .agg(F.min("hj").alias("minhash"))
    )


def lsh_candidate_pairs(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", n: int = 3) -> DataFrame:
    """Near-duplicate candidate pairs via LSH banding of MinHash signatures.

    Docs agreeing on ALL rows of at least one band become candidates —
    an equi-join on (band, band_signature), never O(n²).
    """
    sig = minhash_signatures(df, text_col, id_col, n)
    band = (F.col("j") / BAND_ROWS).cast("int").alias("band")
    r = F.col("j") % BAND_ROWS
    # conditional aggregation pivots the band rows into one signature string
    slot = [F.max(F.when(r == k, F.col("minhash"))) for k in range(BAND_ROWS)]
    bands = (
        sig.groupBy(id_col, band)
        .agg(F.concat_ws("-", *slot).alias("band_sig"))
    )
    left = bands.select(F.col(id_col).alias("doc_a"), "band", "band_sig")
    right = bands.select(F.col(id_col).alias("doc_b"), "band", "band_sig")
    return (
        left.join(right, ["band", "band_sig"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def simhash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
            bits: int = 32) -> DataFrame:
    """Per-document SimHash signature (bit-majority over token hashes).

    Explodes (token occurrence × bit position) → weight ±1, sums per bit,
    recombines set bits into one integer. Entirely map-side-combinable
    aggregation; deterministic md5-derived token hashes.
    """
    toks = F.split(F.col(text_col), r"\s+")
    t = spread(df, id_col).select(F.col(id_col), F.explode(toks).alias("tok"))
    t = t.select(F.col(id_col), hash64(F.col("tok")).alias("h"),
                 F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("b"))
    # shiftright/shiftleft with a COLUMN shift amount is SQL-only syntax
    weight = F.when(F.expr("shiftright(h, cast(b as int)) & 1") == 1, 1).otherwise(-1)
    per_bit = t.groupBy(id_col, "b").agg(F.sum(weight).alias("s"))
    bit_val = F.when(F.col("s") > 0,
                     F.expr("shiftleft(cast(1 as bigint), cast(b as int))")
                     ).otherwise(F.lit(0).cast("bigint"))
    return per_bit.groupBy(id_col).agg(F.sum(bit_val).cast("bigint").alias("simhash"))
