"""Registry of named queries and their DuckDB oracle SQL.

A query is ``Callable[[SparkSession, str], DataFrame]`` where the second
argument is the directory containing the parquet tables. The oracle is ANSI
SQL over the same tables (pre-registered as views by the driver).

Contract notes (driver compares row-count + schema + order-insensitive
value hash):
- every computed/aggregate column is aliased identically on both sides;
- every floating-point result is ``round(x, N)`` on both sides so the two
  engines produce bit-identical doubles;
- DuckDB ``sum(BIGINT)`` returns HUGEINT — oracles cast to BIGINT/DOUBLE
  explicitly to match Spark's types.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import TYPE_CHECKING

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, "Callable[[SparkSession, str], DataFrame]"] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    """Register a named query, optionally with its DuckDB oracle SQL."""

    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# Table-handle cache: spark.read.parquet re-lists files and re-reads the
# footer schema on every call — catalog metadata any engine caches for the
# life of a session. Keyed by (applicationId, sf_dir, table); entries from
# stopped applications are evicted on first miss, mirroring the bounded
# artifact registry in plans/llm.py.
_TABLES: dict[tuple[str, str, str], object] = {}


def _load_one(spark, sf_dir: str, name: str):
    app = spark.sparkContext.applicationId
    key = (app, sf_dir, name)
    df = _TABLES.get(key)
    if df is not None:
        return df
    for stale in [k for k in _TABLES if k[0] != app]:
        del _TABLES[stale]
    # cap distinct sf_dirs (a session grading many corpora — the fuzz
    # harness — would otherwise grow the handle cache without bound)
    dirs = []
    for k in _TABLES:
        if k[1] not in dirs and k[1] != sf_dir:
            dirs.append(k[1])
    while len(dirs) >= 8:
        victim = dirs.pop(0)
        for k in [k for k in _TABLES if k[1] == victim]:
            del _TABLES[k]
    _TABLES[key] = df = _load_one_uncached(spark, sf_dir, name)
    return df


def _load_one_uncached(spark, sf_dir: str, name: str):
    if name != "events":
        return spark.read.parquet(f"{sf_dir}/{name}.parquet")
    # events.parquet stores TIMESTAMP(NANOS) which Spark's parquet reader
    # rejects by default; read nanos as long and truncate to microseconds
    # (integer division — a double round-trip would lose precision at 2^53),
    # matching DuckDB's ns→us truncation.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    if isinstance(df.schema["ts"].dataType, LongType):
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def _load(spark, sf_dir: str, *names: str):
    dfs = [_load_one(spark, sf_dir, n) for n in names]
    return dfs[0] if len(dfs) == 1 else dfs
