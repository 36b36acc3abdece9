"""Local replica of the driver's correctness gate.

Runs a registered Spark query and its DuckDB oracle over the same parquet
directory and compares row count + order-insensitive value hash with columns
sorted by name — the same contract the driver applies at sf=0.01.

DRIVER-FAITHFUL STRICTNESS (round-11 hardening): the r10 driver rejected
four queries that this gate passed, because two leniencies here hid real
graded-surface contract bugs:

1. Int-valued floats were collapsed to the int string (``6000.0`` → ``"6000"``),
   so a DuckDB HUGEINT→float64 column hashed equal to Spark's int64. The
   driver does NOT collapse — floats always render with their float repr.
2. List/array cells were stringified, so an ``array<double>`` output column
   hashed fine locally while the driver's pandas ``sort_values``
   canonicalizer crashed on it (``unhashable type: 'list'``).

Both leniencies are now gone: floats keep their ``.0``, and any list/array/
ndarray cell on a graded (oracle-compared) surface is an immediate failure.
``compare_query`` additionally pre-checks pandas dtype KINDS per column and
fails on an integer-vs-float divide before hashing, so the failure message
names the column instead of showing a hash diff.
"""

from __future__ import annotations

import datetime as _dt
import hashlib
import math

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


class GradedSurfaceError(ValueError):
    """An output column shape the driver's canonicalizer cannot grade
    (array/struct-typed cells crash its pandas sort_values)."""


def duckdb_conn(sf_dir: str):
    import os

    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        # partial dirs (the randomized fuzz harness writes only the
        # tables a query reads) register what exists
        if os.path.exists(f"{sf_dir}/{t}.parquet"):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
            )
    return con


def _norm_value(v):
    if v is None:
        return "NULL"
    # numpy scalars normalize through their Python equivalents; numpy
    # ARRAYS (like lists) are rejected on graded surfaces — the driver's
    # canonicalizer crashes on them, so passing them locally is a lie.
    if hasattr(v, "tolist") and not isinstance(v, (bytes, str)):
        v = v.tolist()
        if isinstance(v, list):
            raise GradedSurfaceError(
                "array-typed cell on a graded surface (driver's pandas "
                "sort_values raises 'unhashable type: list') — explode to "
                "scalar rows or emit scalar columns")
    if isinstance(v, bool):
        return str(bool(v)).lower()
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if math.isinf(v):
            return "Inf" if v > 0 else "-Inf"
        if v == 0.0:
            v = 0.0  # collapse -0.0
        # NO int-collapse: the driver distinguishes 6000.0 from 6000, so
        # an int/float dtype divide between engines must FAIL here too.
        return repr(round(v, 9))
    if isinstance(v, _dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        raise GradedSurfaceError(
            "array-typed cell on a graded surface (driver's pandas "
            "sort_values raises 'unhashable type: list') — explode to "
            "scalar rows or emit scalar columns")
    if isinstance(v, dict):
        raise GradedSurfaceError(
            "struct/map-typed cell on a graded surface — flatten to "
            "scalar columns")
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def _dtype_kind(dtype) -> str:
    """Collapse a pandas dtype to the kinds the driver's hash can split on."""
    k = getattr(dtype, "kind", "O")
    if k in ("i", "u"):
        return "int"
    if k == "f":
        return "float"
    if k == "b":
        return "bool"
    if k == "M":
        return "datetime"
    return "object"


def dtype_divides(sdf, odf) -> list[str]:
    """Columns where one engine hands pandas an integer dtype and the
    other a float dtype — the exact divide that made q131/q136/q144 red
    at the driver while green locally (DuckDB HUGEINT reaches pandas as
    float64; Spark DIV yields int64). Returns offending column names."""
    bad = []
    for c in sorted(set(sdf.columns) & set(odf.columns)):
        sk, ok_ = _dtype_kind(sdf[c].dtype), _dtype_kind(odf[c].dtype)
        if {sk, ok_} == {"int", "float"}:
            bad.append(f"{c} (spark={sk}, oracle={ok_})")
    return bad


def frame_fingerprint(df_pandas):
    """(row_count, value_hash) with columns sorted by name, rows sorted.

    Raises GradedSurfaceError on array/struct cells — the driver cannot
    grade those shapes at all.
    """
    cols = sorted(df_pandas.columns)
    rows = [
        "|".join(_norm_value(v) for v in rec)
        for rec in df_pandas[cols].itertuples(index=False, name=None)
    ]
    rows.sort()
    h = hashlib.sha256("\n".join(rows).encode()).hexdigest()
    return len(rows), h


def compare_query(spark, name: str, sf_dir: str):
    """Return (ok, detail) for one registered query vs its oracle."""
    from vulnerablecode_spark.plans import ORACLES, QUERIES

    sdf = QUERIES[name](spark, sf_dir).toPandas()
    if name not in ORACLES:
        # rows-only contract: the driver records a count, not a hash —
        # array columns are fine here.
        return True, f"rows-only: {len(sdf)} rows"
    con = duckdb_conn(sf_dir)
    odf = con.execute(ORACLES[name]).df()
    if sorted(sdf.columns) != sorted(odf.columns):
        return False, (f"column mismatch: spark={sorted(sdf.columns)} "
                       f"oracle={sorted(odf.columns)}")
    divides = dtype_divides(sdf, odf)
    if divides:
        return False, f"int/float dtype divide: {divides}"
    try:
        s_count, s_hash = frame_fingerprint(sdf)
        o_count, o_hash = frame_fingerprint(odf)
    except GradedSurfaceError as exc:
        return False, f"ungradeable surface: {exc}"
    if s_count != o_count:
        return False, f"row count mismatch: spark={s_count} oracle={o_count}"
    if s_hash != o_hash:
        # locate first differing row for debuggability
        cols = sorted(sdf.columns)
        srows = sorted("|".join(_norm_value(v) for v in r)
                       for r in sdf[cols].itertuples(index=False, name=None))
        orows = sorted("|".join(_norm_value(v) for v in r)
                       for r in odf[cols].itertuples(index=False, name=None))
        diff = next((f"spark={a!r} oracle={b!r}" for a, b in zip(srows, orows) if a != b),
                    "hash differs")
        return False, f"value mismatch ({s_count} rows, cols={cols}): {diff}"
    return True, f"match: {s_count} rows"
