"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All queries live in ``vulnerablecode_spark/plans/`` — each one maps an
operator family from SURVEY.md §2 (reference: aboutcode-org/vulnerablecode)
onto the driver's synthetic tables.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import vulnerablecode_spark.plans.coverage  # noqa: F401,E402 — registers queries
import vulnerablecode_spark.plans.llm  # noqa: F401,E402
import vulnerablecode_spark.plans.relational  # noqa: F401,E402
from vulnerablecode_spark.plans import ORACLES, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (pricing-summary full-corpus aggregation — the
    reference's risk-pipeline sweep shape) on /root/testdata/sf0.001."""
    return QUERIES["q01_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL per query; omissions are rows-only ops."""
    return dict(ORACLES)
