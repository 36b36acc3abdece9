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
import vulnerablecode_spark.plans.curate  # noqa: F401,E402
import vulnerablecode_spark.plans.domain  # noqa: F401,E402
import vulnerablecode_spark.plans.entity  # noqa: F401,E402
import vulnerablecode_spark.plans.llm  # noqa: F401,E402
import vulnerablecode_spark.plans.relational  # noqa: F401,E402
import vulnerablecode_spark.plans.select  # noqa: F401,E402
from vulnerablecode_spark.plans import ORACLES, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (pricing-summary full-corpus aggregation — the
    reference's risk-pipeline sweep shape) on /root/testdata/sf0.001."""
    return QUERIES["q01_pricing_summary"](spark, "/root/testdata/sf0.001")


# The driver grades the first ~50 registry entries per round. Round-7
# rotation (VERDICT r6 directive #4): re-certify the stalest block — the
# relational/LLM queries whose last driver-issued row was round 5
# (q04–q07, q09–q20, q22–q44) rotate back into the window, so every
# query's most recent driver row stays ≤2 rounds old. q66–q95 all got
# driver rows in r6 and cede their slots; tests/test_oracle_parity.py
# still hash-checks ALL queries every run regardless of the window.
# Order: (0) queries new this round (q96, the materialized serving view),
# (1) the five relational sentinels — one per §2 family — (2) the
# r5-graded-only stale block by number, (3) everything else by number.
_NEW_THIS_ROUND = [
    "q96_serving_view_read",  # materialized serving view (r6 directive #1)
    "q97_ivf_incremental",    # assign-only IVF maintenance (r6 directive #8)
]
_SENTINELS = [  # one per relational family: scan-agg, SCD2, range join,
    "q01_pricing_summary",   # full-scan aggregation
    "q08_latest_per_key",    # SCD2 / is_latest window
    "q21_bucketed_range_join",  # version-in-range unfurl join
    "q38_content_hash_dedup",   # content-id ingest dedup
    "q45_api_bulk_response",    # serving-path nested payload (q96's twin)
]
# last driver-issued row was round 5 (two rounds ago): q04–q07, q09–q20,
# q22–q44 minus the q38 sentinel — 38 queries, re-certified this round
_R5_STALE_NUMS = (
    set(range(4, 8)) | set(range(9, 21)) | set(range(22, 45))) - {38}


def _grade_order(name: str) -> tuple[int, int, str]:
    num = int(name[1:3]) if name[1:3].isdigit() else 99
    if name in _NEW_THIS_ROUND:
        return (0, _NEW_THIS_ROUND.index(name), name)
    if name in _SENTINELS:
        return (1, _SENTINELS.index(name), name)
    if num in _R5_STALE_NUMS:
        return (2, num, name)
    return (3, num, name)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {k: QUERIES[k] for k in sorted(QUERIES, key=_grade_order)}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL per query; omissions are rows-only ops."""
    return {k: ORACLES[k] for k in sorted(ORACLES, key=_grade_order)}
