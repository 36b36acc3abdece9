"""Mergeable bottom-k (KMV) distinct-count sketches.

The K-Minimum-Values sketch (Bar-Yossef et al. 2002; Beyer et al.
SIGMOD'07 for the unbiased estimator and set operations) is the
mergeable-summary answer to "how many distinct X per group" at corpus
scale: each group keeps only its k smallest hash values, sketches of
disjoint batches merge by union + re-rank (bottom-k of a union IS the
union of bottom-k's re-cut to k), and cardinality, union and Jaccard
estimates all read off the merged sketch. At 100 TB the full distinct
set per group never materializes anywhere — only O(groups × k) rows —
and the incremental-store discipline used by the line-dedup/BM25/vocab
artifacts applies unchanged because the sketch is a pure additive
monoid under union.

Where Spark's own ``approx_count_distinct`` (HyperLogLog++) is the
right production default for a one-shot count, it is NOT gradeable
across engines (register layouts differ) and NOT a set-operation
sketch. KMV with the repo's engine-portable 60-bit md5 hash
(llm/dedup.py ``hash64``) is bit-reproducible in any engine that has
md5 — which is what lets the ESTIMATOR itself be hash-verified against
DuckDB, the same determinism discipline as the seeded samplers
(q68/q117/q148).

Determinism notes shared by every function here:

- hashes are uniform on [0, 2^60); ties are impossible between distinct
  values short of an md5 collision, so ordering by ``h`` alone is total;
- the estimator ``(k-1) · (2^60 / h_k)`` is evaluated in DOUBLE with
  this exact association and floored — IEEE division/multiplication are
  correctly rounded, so both engines produce the identical integer
  (2^60 is an exact double; h_k→double rounds identically);
- groups that kept fewer than k hashes have seen their whole distinct
  set: the exact count is returned (the standard small-set short
  circuit, Beyer et al. §3.1).

Scale shape: building a sketch is one DISTINCT on (group, hash) — the
unavoidable dedup shuffle, map-side combinable — followed by a
rank-limited window that Spark ≥3.5 executes as WindowGroupLimit
(partial per-partition bottom-k BEFORE the shuffle, merge after), so no
executor ever holds more than its partition's k candidates per group.
Merges and estimates run over O(groups × k) rows: broadcast-sized.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from vulnerablecode_spark.llm.dedup import hash64

HASH_SPACE = float(1 << 60)  # hash64 is 15 hex chars = 60 bits, exact double


def kmv_sketch(df: DataFrame, value: Column, k: int = 128,
               group_cols: tuple[str, ...] = ("source",),
               salt: str = "kmv") -> DataFrame:
    """Bottom-k sketch in long form: (group..., h, pos) with pos ≤ k,
    ordered by the salted 60-bit hash of ``value``. The long form (one
    row per kept hash) is what makes merge/Jaccard plain relational
    algebra AND keeps arrays off graded surfaces.

    Scale: DISTINCT(group, h) is one map-side-combinable shuffle; the
    rank filter compiles to WindowGroupLimit (partial bottom-k per input
    partition, then per-group merge) — the classic two-phase top-k.
    """
    if k < 2:
        raise ValueError(f"kmv_sketch: k must be ≥ 2, got {k}")
    h = hash64(F.concat_ws(":", F.lit(salt), value.cast("string")))
    distinct = df.select(*group_cols, h.alias("h")).distinct()
    w = Window.partitionBy(*group_cols).orderBy(F.col("h").asc())
    return (distinct.withColumn("pos", F.row_number().over(w))
            .filter(F.col("pos") <= k))


def kmv_merge(*sketches: DataFrame, k: int,
              group_cols: tuple[str, ...] = ("source",)) -> DataFrame:
    """Union bottom-k sketches of disjoint (or overlapping) batches into
    the sketch of the union: union → distinct h → re-rank → cut to k.
    Exactly equals the sketch built from scratch over the union — the
    KMV merge property — which is what the incremental query grades.
    """
    if not sketches:
        raise ValueError("kmv_merge: need at least one sketch")
    u = sketches[0].select(*group_cols, "h")
    for s in sketches[1:]:
        u = u.unionByName(s.select(*group_cols, "h"))
    w = Window.partitionBy(*group_cols).orderBy(F.col("h").asc())
    return (u.distinct()
            .withColumn("pos", F.row_number().over(w))
            .filter(F.col("pos") <= k))


def kmv_estimate(sketch: DataFrame, k: int,
                 group_cols: tuple[str, ...] = ("source",)) -> DataFrame:
    """Distinct-count estimate per group from a bottom-k sketch:
    ``(k-1) · (2^60 / h_k)`` floored (the unbiased KMV estimator), or
    the exact kept count when the group never filled its k slots.
    """
    agg = sketch.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_kept"),
        F.max("h").alias("h_k"),  # max of the bottom-k = k-th smallest
    )
    est = F.floor(F.lit(float(k - 1)) * (F.lit(HASH_SPACE) / F.col("h_k")))
    return agg.select(
        *group_cols,
        F.when(F.col("n_kept") < k, F.col("n_kept"))
        .otherwise(est).cast("bigint").alias("est_distinct"))


def kmv_jaccard_matrix(sketch: DataFrame, k: int,
                       group_col: str = "source") -> DataFrame:
    """Pairwise Jaccard estimates between every two groups of one
    sketch table (Beyer et al. §5: take the bottom-k of the UNION of
    the two groups' hash sets; the fraction of those present in both
    estimates |A∩B|/|A∪B|). Output: (src_a, src_b, union_k, n_both,
    jaccard_bp) for src_a < src_b.

    Scale: the sketch table is O(groups × k) rows — the pair frame is
    built by two broadcast-joins against the (tiny) group-pair dim, so
    nothing here ever touches the corpus again. This is the whole point:
    cross-source overlap matrices at 100 TB are sketch algebra, not
    corpus joins (the exact twin is q119's equi-join dup matrix, which
    pays a corpus shuffle).
    """
    groups = sketch.select(F.col(group_col).alias("g")).distinct()
    pairs = (groups.select(F.col("g").alias("src_a"))
             .join(F.broadcast(groups.select(F.col("g").alias("src_b"))),
                   F.col("src_a") < F.col("src_b")))
    a = (pairs.join(F.broadcast(sketch.select(
            F.col(group_col).alias("src_a"), "h")), "src_a")
         .select("src_a", "src_b", "h",
                 F.lit(1).alias("in_a"), F.lit(0).alias("in_b")))
    b = (pairs.join(F.broadcast(sketch.select(
            F.col(group_col).alias("src_b"), "h")), "src_b")
         .select("src_a", "src_b", "h",
                 F.lit(0).alias("in_a"), F.lit(1).alias("in_b")))
    merged = (a.unionByName(b)
              .groupBy("src_a", "src_b", "h")
              .agg(F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b")))
    w = Window.partitionBy("src_a", "src_b").orderBy(F.col("h").asc())
    union_k = merged.withColumn("pos", F.row_number().over(w)) \
                    .filter(F.col("pos") <= k)
    return (union_k.groupBy("src_a", "src_b")
            .agg(F.count(F.lit(1)).cast("bigint").alias("union_k"),
                 F.sum(F.col("in_a") * F.col("in_b")).cast("bigint")
                 .alias("n_both"))
            .withColumn("jaccard_bp",
                        F.expr("n_both * 10000 div union_k").cast("bigint")))


def histogram_sketch(df: DataFrame, value: Column, *,
                     group_cols: tuple[str, ...] = ("source",),
                     n_bins: int = 128, lo: int = 0,
                     hi: int = 2048) -> DataFrame:
    """Fixed-range equi-width histogram counts per group — the mergeable
    quantile summary (the deterministic stand-in for t-digest/KLL, whose
    layouts are engine- and order-dependent and therefore ungradeable).
    Bin edges are DATA-INDEPENDENT (lo/hi fixed up front), which is what
    makes two batches' histograms add cell-wise — the same monoid
    discipline as the KMV sketch and the bigram-count store. Values
    outside [lo, hi) clamp into the edge bins (they stay counted; their
    quantile resolution degrades to the edge bin's width, the standard
    fixed-range tradeoff).

    Output: (group..., bin, c) — O(groups × n_bins) state from one
    map-side-combinable aggregate.
    """
    if hi <= lo or n_bins < 2:
        raise ValueError("histogram_sketch: need hi > lo and n_bins ≥ 2")
    # INTEGER division only: a double divide-then-cast would diverge
    # between engines (Spark's cast truncates, DuckDB's rounds). Small
    # negative numerators (v just below lo) trunc to 0 here while the
    # oracle's // floors to -1 — both clamp to bin 0, so the clamped
    # result agrees for every input.
    base = df.select(*group_cols, value.cast("bigint").alias("_v"))
    b = F.expr(f"greatest(0L, least({n_bins - 1}L, "
               f"((_v - {lo}L) * {n_bins}L) div {hi - lo}L))")
    return (base.select(*group_cols, b.alias("bin"))
            .groupBy(*group_cols, "bin")
            .agg(F.count(F.lit(1)).cast("bigint").alias("c")))


def histogram_quantiles(hist: DataFrame, *, probes: tuple[int, ...],
                        group_cols: tuple[str, ...] = ("source",),
                        n_bins: int = 128, lo: int = 0,
                        hi: int = 2048) -> DataFrame:
    """Quantile read-off from a :func:`histogram_sketch`: for probe p%,
    the estimate is the UPPER EDGE of the first bin whose cumulative
    count reaches rank ⌈n·p/100⌉ (type-1 quantile over bins — integer
    arithmetic only, so the read-off is bit-identical in any engine).
    Output: (group..., probe_pct, n, sketch_q).

    Scale: runs entirely on the O(groups × n_bins) sketch; the window's
    running sum is per-group over ≤ n_bins rows.
    """
    from pyspark.sql import Window as W

    w = (W.partitionBy(*group_cols).orderBy(F.col("bin").asc())
         .rowsBetween(W.unboundedPreceding, 0))
    cum = hist.withColumn("cum", F.sum("c").over(w))
    tot = hist.groupBy(*group_cols).agg(F.sum("c").alias("n"))
    pr = tot.sparkSession.createDataFrame(
        [(int(p),) for p in probes], "probe_pct int")
    probed = (cum.join(F.broadcast(tot), list(group_cols))
              .join(F.broadcast(pr))
              .filter(F.col("cum") * 100 >= F.col("n") * F.col("probe_pct")))
    first = (probed.groupBy(*group_cols, "probe_pct", "n")
             .agg(F.min("bin").alias("bin")))
    return first.select(
        *group_cols, "probe_pct", F.col("n").cast("bigint").alias("n"),
        F.expr(f"CAST({lo}L + ((bin + 1L) * {hi - lo}L) div {n_bins}L "
               "AS BIGINT)").alias("sketch_q"))


def kmv_containment_matrix(sketch: DataFrame, k: int,
                           group_col: str = "source") -> DataFrame:
    """Directed containment estimates |A∩B| / |A| for every ordered
    group pair, from the bottom-k of each pair's hash UNION (the KMV
    set-operation estimator, Beyer et al. §5): of the union's k smallest
    hashes, the fraction of A-members that are also B-members estimates
    how much of A lies inside B. The ASYMMETRIC twin of
    :func:`kmv_jaccard_matrix` — a mirrored or quoted-from source shows
    containment ≈ 1 in one direction with a small Jaccard, which the
    symmetric estimate alone cannot distinguish.

    Output: (src_a, src_b, k_a, n_both, containment_bp) for src_a ≠
    src_b; pairs where the union bottom-k holds no A-member (k_a = 0,
    possible when B's hash mass dominates the union's low end) have an
    undefined estimate and are dropped.

    Scale: identical to the Jaccard matrix — sketch-frame algebra only,
    broadcast joins, the corpus is never touched.
    """
    groups = sketch.select(F.col(group_col).alias("g")).distinct()
    pairs = (groups.select(F.col("g").alias("src_a"))
             .join(F.broadcast(groups.select(F.col("g").alias("src_b"))),
                   F.col("src_a") < F.col("src_b")))
    a = (pairs.join(F.broadcast(sketch.select(
            F.col(group_col).alias("src_a"), "h")), "src_a")
         .select("src_a", "src_b", "h",
                 F.lit(1).alias("in_a"), F.lit(0).alias("in_b")))
    b = (pairs.join(F.broadcast(sketch.select(
            F.col(group_col).alias("src_b"), "h")), "src_b")
         .select("src_a", "src_b", "h",
                 F.lit(0).alias("in_a"), F.lit(1).alias("in_b")))
    merged = (a.unionByName(b)
              .groupBy("src_a", "src_b", "h")
              .agg(F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b")))
    w = Window.partitionBy("src_a", "src_b").orderBy(F.col("h").asc())
    union_k = merged.withColumn("pos", F.row_number().over(w)) \
                    .filter(F.col("pos") <= k)
    base = (union_k.groupBy("src_a", "src_b")
            .agg(F.sum("in_a").cast("bigint").alias("k_a"),
                 F.sum("in_b").cast("bigint").alias("k_b"),
                 F.sum(F.col("in_a") * F.col("in_b")).cast("bigint")
                 .alias("n_both")))
    fwd = base.select("src_a", "src_b",
                      F.col("k_a").alias("k_a"), "n_both")
    rev = base.select(F.col("src_b").alias("src_a"),
                      F.col("src_a").alias("src_b"),
                      F.col("k_b").alias("k_a"), "n_both")
    return (fwd.unionByName(rev)
            .filter(F.col("k_a") > 0)
            .withColumn("containment_bp",
                        F.expr("n_both * 10000 div k_a").cast("bigint")))


# ---------------------------------------------------------------------------
# Deterministic HyperLogLog-style register sketch.
# ---------------------------------------------------------------------------

HLL_M = 64          # registers; m = 64 → α·m² = 0.709·4096
_HLL_HBITS = 54     # 60-bit hash minus 6 register-index bits
_HLL_POW = float(1 << 55)  # 2^55, exact in double — the S scale factor


def hll_registers(df: DataFrame, value: Column,
                  group_cols: tuple[str, ...] = ("source",),
                  salt: str = "hll") -> DataFrame:
    """Flajolet-style register sketch (Flajolet et al. 2007) per group,
    in long form (group..., reg, m): the hash's low 6 bits pick one of
    64 registers, the remaining 54 bits contribute their
    leading-zero-rank ρ, and the register keeps max ρ. Unlike Spark's
    own HyperLogLog++ (approx_count_distinct), the register layout here
    is ENGINE-PORTABLE — built on the repo's 60-bit md5 hash with
    integer-only bit arithmetic — so the sketch and its estimator are
    hash-verifiable against DuckDB (the same reason kmv_sketch exists
    beside approx_count_distinct).

    ρ is EXACT integer bit arithmetic, no float log: ρ = 55 − bitlen(h')
    with bitlen via base-2 string length (Spark ``conv``/DuckDB ``bin``
    agree, including bitlen ∈ [1,54] for h' > 0), and max ρ per register
    = 55 − bitlen(min h') because bitlen is monotone — so the register
    aggregate is ONE map-side-combinable MIN, not a max over derived
    ranks. h' = 0 caps at ρ = 55.

    Mergeable monoid: registers of any two corpus slices merge by
    element-wise MAX (equivalently min of the underlying h') — the
    sketch of a 100 TB corpus is maintained as O(groups × 64) rows
    under delta-append exactly like the KMV/histogram artifacts.
    """
    from vulnerablecode_spark.llm.dedup import hash64

    h = hash64(F.concat_ws(":", F.lit(salt), value.cast("string")))
    per = (df.select(*group_cols, h.alias("h"))
           .select(*group_cols, (F.col("h") % HLL_M).alias("reg"),
                   F.expr(f"h div {HLL_M}").alias("h2"))
           .groupBy(*group_cols, "reg")
           .agg(F.min("h2").alias("hmin")))
    m = F.when(F.col("hmin") == 0, F.lit(_HLL_HBITS + 1)).otherwise(
        F.lit(_HLL_HBITS + 1) - F.length(F.conv(F.col("hmin"), 10, 2)))
    return per.select(*group_cols, "reg",
                      m.cast("int").alias("m"))


def hll_merge(*sketches: DataFrame,
              group_cols: tuple[str, ...] = ("source",)) -> DataFrame:
    """Element-wise max of register sketches — the HLL merge monoid:
    merging per-batch sketches equals the sketch of the union."""
    if not sketches:
        raise ValueError("hll_merge: need at least one sketch")
    u = sketches[0].select(*group_cols, "reg", "m")
    for s in sketches[1:]:
        u = u.unionByName(s.select(*group_cols, "reg", "m"))
    return u.groupBy(*group_cols, "reg").agg(F.max("m").alias("m"))


def hll_estimate(registers: DataFrame,
                 group_cols: tuple[str, ...] = ("source",)) -> DataFrame:
    """Raw HLL estimate per group from a register sketch:
    ``E = α_m · m² / Σ_j 2^(−M_j)`` with unset registers at M = 0.

    Exact cross-engine: the harmonic sum is computed SCALED by 2^55 as
    Σ shiftleft(1, 55−M) — every term an exact BIGINT power of two
    (max 64·2^55 = 2^61), unset registers folded in as (64−n_set)·2^55
    — so the only float step is one double multiply-divide chain with
    fixed association, identical in IEEE on both engines. Output:
    (group..., n_registers_set, s_scaled, est_hll). The small/large-
    range corrections of the production HLL (linear counting under
    2.5m, the 2^L clamp) are deliberately omitted: this grades the raw
    estimator; a production counter would wrap this in the standard
    correction ladder.
    """
    alpha = F.lit(0.7213) / (F.lit(1.0) + F.lit(1.079) / F.lit(float(HLL_M)))
    agg = registers.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_set"),
        F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {_HLL_HBITS + 1} - m)")
              .cast("bigint")).alias("s_set"))
    s = (F.col("s_set")
         + (F.lit(HLL_M) - F.col("n_set"))
         * F.lit(1 << (_HLL_HBITS + 1)).cast("bigint")).cast("bigint")
    return agg.select(
        *group_cols,
        F.col("n_set").alias("n_registers_set"),
        s.alias("s_scaled"),
        F.floor(alpha * F.lit(float(HLL_M * HLL_M)) * F.lit(_HLL_POW)
                / s.cast("double")).cast("bigint").alias("est_hll"))
