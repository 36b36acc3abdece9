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


# The driver grades the first ~50 registry entries per round. Round-6
# rotation (VERDICT r5 directive #1): q01–q45 now have three consecutive
# driver-green rounds and remain gated every run by
# tests/test_oracle_parity.py (which hash-checks ALL queries regardless of
# the window), so the full relational block no longer needs the window.
# Order: (0) queries new this round, (1) a sentinel of the relational core
# — one per §2 family — (2) the 15 round-5 curation/selection queries that
# have never had a driver-issued row (q66–q80), (3) the r4-graded-only LLM
# tail (last driver row two rounds ago), (4) everything else by number —
# the head of which refills the remaining ~16 window slots with more
# relational coverage.
_NEW_THIS_ROUND = [
    "q81_advisory_pipeline",  # composed domain pipeline (VERDICT directive #2)
    # §2.10/§2.3 rows previously fixture-tested only, now oracle-graded:
    "q82_alias_resolution",
    "q83_exploit_enrichment",
    "q84_vulntotal_agreement",
    "q85_relation_dedup",
    "q86_summary_backfill",
    "q87_archive_urls",
    "q88_exact_purl_inferences",
    "q89_fix_commits",
    "q90_vcs_normalize",
    "q91_github_poc",
    "q92_purl_search",
    "q93_todo_excluded",
    "q94_ssvc_decision",
    "q95_package_types",
]
_SENTINELS = [  # one per relational family: scan-agg, SCD2, range join,
    "q01_pricing_summary",   # full-scan aggregation
    "q08_latest_per_key",    # SCD2 / is_latest window
    "q21_bucketed_range_join",  # version-in-range unfurl join
    "q38_content_hash_dedup",   # content-id ingest dedup
    "q45_api_bulk_response",    # serving-path nested payload
]
_R4_TAIL = [  # last driver-issued row was round 4; regrade after q66–q80
    "q46_ann_topk_ivf", "q47_embedding_near_dup",
    "q48_winnowing_fingerprints", "q51_png_roundtrip", "q52_wav_roundtrip",
    "q53_gif_roundtrip", "q54_jpeg_roundtrip", "q55_repetition_signals",
    "q57_decontamination", "q58_char_trigram_diversity",
    "q59_feature_hashing", "q60_near_dup_dedup", "q61_shared_spans",
]


def _grade_order(name: str) -> tuple[int, int, str]:
    num = int(name[1:3]) if name[1:3].isdigit() else 99
    if name in _NEW_THIS_ROUND:
        return (0, _NEW_THIS_ROUND.index(name), name)
    if name in _SENTINELS:
        return (1, _SENTINELS.index(name), name)
    if 66 <= num <= 80:  # never driver-graded (added round 5)
        return (2, num, name)
    if name in _R4_TAIL:
        return (3, _R4_TAIL.index(name), name)
    return (4, num, name)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {k: QUERIES[k] for k in sorted(QUERIES, key=_grade_order)}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL per query; omissions are rows-only ops."""
    return {k: ORACLES[k] for k in sorted(ORACLES, key=_grade_order)}
