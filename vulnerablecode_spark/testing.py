"""Local replica of the driver's correctness gate.

Runs a registered Spark query and its DuckDB oracle over the same parquet
directory and compares row count + order-insensitive value hash with columns
sorted by name — the same contract the driver applies at sf=0.01.
"""

from __future__ import annotations

import datetime as _dt
import hashlib
import math

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


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
    # numpy scalars/arrays (what toPandas()/duckdb .df() actually hand
    # back) normalize through their Python equivalents: np.ndarray would
    # otherwise fall to str(), whose >1000-element '...' truncation is a
    # FALSE-PASS channel (two different long arrays stringify equal)
    if hasattr(v, "tolist") and not isinstance(v, (bytes, str)):
        v = v.tolist()
        if isinstance(v, list):
            return "[" + ",".join(_norm_value(x) for x in v) + "]"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if math.isinf(v):  # before int(v): OverflowError otherwise
            return "Inf" if v > 0 else "-Inf"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(round(v, 9))
    if isinstance(v, bool):
        return str(bool(v)).lower()
    if isinstance(v, _dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_value(x) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def frame_fingerprint(df_pandas):
    """(row_count, value_hash) with columns sorted by name, rows sorted."""
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
    s_count, s_hash = frame_fingerprint(sdf)
    if name not in ORACLES:
        return True, f"rows-only: {s_count} rows"
    con = duckdb_conn(sf_dir)
    odf = con.execute(ORACLES[name]).df()
    o_count, o_hash = frame_fingerprint(odf)
    if sorted(sdf.columns) != sorted(odf.columns):
        return False, f"column mismatch: spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}"
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
