"""The local correctness gate must be driver-faithful.

The r10 driver rejected four queries this repo's gate passed, because the
gate was lenient in exactly two ways: it collapsed int-valued floats to the
int string (hiding DuckDB's HUGEINT→float64 widening vs Spark's int64) and
it stringified list cells (hiding array-typed columns that crash the
driver's pandas sort_values canonicalizer). These tests pin the strict
behavior so that class of false-green can never ship again.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from vulnerablecode_spark.testing import (
    GradedSurfaceError,
    _norm_value,
    dtype_divides,
    frame_fingerprint,
)


def test_int_valued_float_keeps_float_repr():
    # the driver distinguishes 6000.0 from 6000 — so must we
    assert _norm_value(6000.0) == "6000.0"
    assert _norm_value(6000) == "6000"
    assert _norm_value(6000.0) != _norm_value(6000)


def test_negative_zero_collapses():
    assert _norm_value(-0.0) == _norm_value(0.0)


def test_float_rounds_at_9dp():
    assert _norm_value(0.1234567894) == _norm_value(0.1234567893)
    assert _norm_value(0.123456789) != _norm_value(0.123456788)


def test_list_cell_rejected():
    with pytest.raises(GradedSurfaceError):
        _norm_value([1.0, 2.0])
    with pytest.raises(GradedSurfaceError):
        _norm_value(np.array([1.0, 2.0]))
    with pytest.raises(GradedSurfaceError):
        _norm_value({"a": 1})


def test_frame_fingerprint_rejects_array_column():
    df = pd.DataFrame({"doc_id": [1, 2], "features": [[0.1], [0.2]]})
    with pytest.raises(GradedSurfaceError):
        frame_fingerprint(df)


def test_int_float_divide_detected():
    sdf = pd.DataFrame({"k": [1, 2], "bp": np.array([10, 20], dtype="int64")})
    odf = pd.DataFrame({"k": [1, 2], "bp": np.array([10.0, 20.0])})
    assert dtype_divides(sdf, odf) == ["bp (spark=int, oracle=float)"]
    # both-float and both-int agree
    assert dtype_divides(odf, odf) == []
    assert dtype_divides(sdf, sdf) == []


def test_int_float_divide_hashes_differently():
    sdf = pd.DataFrame({"bp": np.array([6000], dtype="int64")})
    odf = pd.DataFrame({"bp": np.array([6000.0])})
    assert frame_fingerprint(sdf) != frame_fingerprint(odf)


def test_nullable_graded_columns_are_pinned_double(spark):
    """q143/q149 carry NULLABLE numeric graded columns; both engines must
    hand pandas float64 DETERMINISTICALLY (explicit casts on both sides),
    not only when the sample happens to contain a NULL — the r10 judge's
    latent-twin finding."""
    import vulnerablecode_spark.plans.relational  # noqa: F401
    from pyspark.sql.types import DoubleType

    from vulnerablecode_spark.plans import ORACLES, QUERIES
    from vulnerablecode_spark.testing import duckdb_conn

    pinned = {
        "q143_conversion_attribution": ["touch_id", "gap_us"],
        "q149_rate_anomalies": ["z_bp", "is_anomaly"],
    }
    con = duckdb_conn("/root/testdata/sf0.001")
    for name, cols in pinned.items():
        sdf = QUERIES[name](spark, "/root/testdata/sf0.001")
        fields = {f.name: f.dataType for f in sdf.schema.fields}
        odf = con.execute(ORACLES[name]).df()
        for c in cols:
            assert isinstance(fields[c], DoubleType), (name, c, fields[c])
            assert odf[c].dtype.kind == "f", (name, c, odf[c].dtype)
