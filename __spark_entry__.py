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
# rotation (VERDICT r6 directive #4): re-certify the stalest block so
# every query's most recent driver row stays ≤2 rounds old. The staleness
# map is computed from the CORRECTNESS_r{4,5,6} artifacts themselves:
# q49/q50 last got driver rows in r4 (three rounds by now — they grade
# FIRST after the sentinels), and the r5-only block is q04–q07, q09–q20,
# q22–q44 plus q56/q62–q65 (43 queries). q66–q95 all got rows in r6 and
# cede their slots; tests/test_oracle_parity.py still hash-checks ALL
# queries every run regardless of the window. Order: (0) queries new this
# round, (1) the five relational sentinels — one per §2 family — (2) the
# r4-stale pair, (3) the r5-stale block by number, (4) everything else by
# number. If the window is exactly 50, the overflow (the last r5-stale
# entries) stays ≤2 rounds old and rotates next round.
_NEW_THIS_ROUND = [
    "q96_serving_view_read",  # materialized serving view (r6 directive #1)
    "q97_ivf_incremental",    # assign-only IVF maintenance (r6 directive #8)
    "q98_federated_paths",    # FederatedCode purl-hash layout (r6 directive #2)
]
_SENTINELS = [  # one per relational family: scan-agg, SCD2, range join,
    "q01_pricing_summary",   # full-scan aggregation
    "q08_latest_per_key",    # SCD2 / is_latest window
    "q21_bucketed_range_join",  # version-in-range unfurl join
    "q38_content_hash_dedup",   # content-id ingest dedup
    "q45_api_bulk_response",    # serving-path nested payload (q96's twin)
]
_R4_STALE = ["q49_conflicting_packages", "q50_per_advisory_issues"]
_R5_STALE_NUMS = ((set(range(4, 8)) | set(range(9, 21)) | set(range(22, 45))
                   | {56, 62, 63, 64, 65}) - {38})


def _grade_order(name: str) -> tuple[int, int, str]:
    num = int(name[1:3]) if name[1:3].isdigit() else 99
    if name in _NEW_THIS_ROUND:
        return (0, _NEW_THIS_ROUND.index(name), name)
    if name in _SENTINELS:
        return (1, _SENTINELS.index(name), name)
    if name in _R4_STALE:
        return (2, _R4_STALE.index(name), name)
    if num in _R5_STALE_NUMS:
        return (3, num, name)
    return (4, num, name)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {k: QUERIES[k] for k in sorted(QUERIES, key=_grade_order)}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL per query; omissions are rows-only ops."""
    return {k: ORACLES[k] for k in sorted(ORACLES, key=_grade_order)}
