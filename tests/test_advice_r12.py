"""Round-12 ADVICE regressions: the integer-bp operators whose BIGINT
cross terms wrapped int64 in the web-scale regime (Spark wraps silently,
DuckDB's SUM(BIGINT)->HUGEINT stays exact -> silent cross-engine
divergence). Each test drives the operator INTO the old overflow regime
and asserts exact agreement with a pure-Python big-int replica of the
definition -- values the wrapped arithmetic cannot produce.

ADVICE r11 items closed here:
- zipf_slope: n*sxy and sx*sy wrapped near ~1e3 token types/group
  (llm/text.py) -> moment sums + cross terms now DECIMAL(38,0);
- byte_tv_drift: _num*10000 wrapped near t ~ 7e8 bytes/group, four
  orders below the documented ~3e9 bound (llm/multimodal.py) -> all
  products DECIMAL(38,0), bound corrected;
- auc_rank_eval: (s2 - n1(n1+1))*5000 wrapped near ~2e6 rows/group,
  undocumented (llm/classify.py) -> DECIMAL(38,0) + headroom note;
- byte_entropy: output schema hardcoded 'doc_id', silently renaming any
  caller-supplied id_col (llm/multimodal.py) -> schema built from id_col.
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F


def _zipf_expected(counts: dict[str, int]) -> int:
    """Exact-bigint replica of the zipf_slope definition."""
    ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    xs, ys = [], []
    for r, (_, c) in enumerate(ranked, start=1):
        xs.append(math.floor(math.log(r) * 1e6 + 0.5))
        ys.append(math.floor(math.log(c) * 1e6 + 0.5))
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx = sum(x * x for x in xs)
    num = n * sxy - sx * sy          # exact python bigint
    den = n * sxx - sx * sx
    return math.floor(float(num) * 1e6 / float(den))


def test_zipf_slope_survives_cross_term_overflow(spark):
    """3000 token types with varied counts: n*sxy ~ 1.3e20 and
    sx*sy ~ 2e20 -- both far past int64; the old BIGINT plan wrapped
    here while DuckDB stayed exact."""
    from vulnerablecode_spark.llm.text import zipf_slope

    counts = {f"t{i:04d}": (i % 40) + 1 for i in range(3000)}
    rows = [("g", " ".join([tok] * c)) for tok, c in counts.items()]
    df = spark.createDataFrame(rows, "source string, text string")

    # prove this input IS the overflow regime for the old arithmetic
    ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    xs = [math.floor(math.log(r) * 1e6 + 0.5)
          for r in range(1, len(ranked) + 1)]
    ys = [math.floor(math.log(c) * 1e6 + 0.5) for _, c in ranked]
    assert len(xs) * sum(x * y for x, y in zip(xs, ys)) > 2**63
    assert sum(xs) * sum(ys) > 2**63

    out = zipf_slope(df).collect()
    assert len(out) == 1
    row = out[0]
    assert row["vocab"] == 3000
    assert row["slope_e6"] == _zipf_expected(counts)


def test_byte_tv_drift_survives_num_times_1e4_overflow(spark):
    """Disjoint byte mixes at t = 4e7 bytes/group: TV is exactly 1 and
    the old _num*10000 term is 2*(4e7)^2*1e4 = 3.2e19 > 2^63."""
    from vulnerablecode_spark.llm.multimodal import byte_tv_drift

    t = 40_000_000
    hist = spark.createDataFrame(
        [("a", 0, t), ("b", 15, t)],
        "source string, bin int, c long")
    assert 2 * t * t * 10_000 > 2**63
    out = byte_tv_drift(hist).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["src_a"], r["src_b"], r["t_a"], r["t_b"]) == ("a", "b", t, t)
    assert r["tv_bp"] == 10_000

    # and a partial-overlap case checked against the exact definition
    hist2 = spark.createDataFrame(
        [("a", 0, 30_000_000), ("a", 1, 10_000_000),
         ("b", 1, 25_000_000), ("b", 2, 15_000_000)],
        "source string, bin int, c long")
    ta, tb = 40_000_000, 40_000_000
    num = (abs(30_000_000 * tb - 0 * ta)          # bin 0
           + abs(10_000_000 * tb - 25_000_000 * ta)  # bin 1
           + abs(0 * tb - 15_000_000 * ta))       # bin 2
    expected = num * 10_000 // (2 * ta * tb)
    r2 = byte_tv_drift(hist2).collect()[0]
    assert r2["tv_bp"] == expected


def test_auc_rank_eval_survives_bp_numerator_overflow(spark):
    """72M rows, one group: n_pos = n_neg = 36e6, so the bp numerator
    bound 1e4*n_pos*n_neg ~ 1.3e19 > 2^63 (the old silent-wrap regime).
    Construction: score = id%3, label = id%2 -- every score class is
    exactly half positive, so AUC is exactly 0.5 -> auc_bp = 5000."""
    from vulnerablecode_spark.llm.classify import auc_rank_eval

    n = 72_000_000
    df = (spark.range(n)
          .select(F.lit("g").alias("source"),
                  (F.col("id") % 3).cast("bigint").alias("score"),
                  (F.col("id") % 2).cast("int").alias("y")))
    n_pos = n // 2
    assert 10_000 * n_pos * (n - n_pos) > 2**63
    out = auc_rank_eval(df, score_col="score", label_col="y").collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_pos"] == n_pos and r["n_neg"] == n - n_pos
    assert r["auc_bp"] == 5000


def test_byte_entropy_respects_caller_id_col(spark):
    from vulnerablecode_spark.llm.multimodal import byte_entropy

    df = spark.createDataFrame(
        [(7, bytearray(b"abcabcabc")), (9, bytearray(b""))],
        "vec_id long, payload binary")
    out = byte_entropy(df, id_col="vec_id")
    assert out.columns == ["vec_id", "t_bytes", "h_e6"]
    rows = {r["vec_id"]: r for r in out.collect()}
    assert set(rows) == {7}          # empty payload excluded
    assert rows[7]["t_bytes"] == 9
