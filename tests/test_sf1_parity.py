"""Oracle parity at the sf1 scale point (the floor-free bench scale).

testdata/sf1 is generated — not driver-shipped — so this module SKIPS
cleanly when the directory is absent; regenerate it with
``python scripts/gen_sf.py`` (deterministic, ~1 min). When present, the
round-5+ query families are hash-verified at 10× the driver's largest
grading scale, the evidence behind SCALE.md's "hash-verified at the sf1
scale point" claims.

The sweep is the HEAVY tail only (near-dup compositions, selection,
pipeline audit): the full 79-query sweep at sf1 belongs to bench/verify
sessions, not the default pytest gate.
"""

from __future__ import annotations

import os

import pytest

import vulnerablecode_spark.plans.coverage  # noqa: F401 — registers queries
import vulnerablecode_spark.plans.curate  # noqa: F401
import vulnerablecode_spark.plans.domain  # noqa: F401
import vulnerablecode_spark.plans.entity  # noqa: F401
import vulnerablecode_spark.plans.llm  # noqa: F401
import vulnerablecode_spark.plans.relational  # noqa: F401
import vulnerablecode_spark.plans.select  # noqa: F401
from vulnerablecode_spark.testing import compare_query

SF1_DIR = os.environ.get(
    "SPARK_GRAFT_SF1_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "testdata", "sf1"))

SF1_QUERIES = [
    "q81_advisory_pipeline",
    # round-6 entity family: q82's VCID digest parity is the one worth
    # 10x-ing (24 hex-pair extractions per row on both engines); q85
    # exercises the window dedup over the full 6M-row lineitem
    "q82_alias_resolution",
    "q85_relation_dedup",
    "q60_near_dup_dedup",
    "q63_incremental_near_dup",
    "q72_exact_substrings",
    "q75_dsir_importance",
    "q76_surprisal_partition",
    "q77_packing_efficiency",
    "q78_curation_pipeline",
    "q79_cluster_size_histogram",
    # round-10 incremental family: retro re-clean and incremental
    # decontamination are the two operators whose exactness argument
    # (additive counts / delta-bounded work lists) is worth 10x-ing;
    # q113's window range-count exercises the integer-µs frame over a
    # 1M-row events table
    "q110_line_dedup_reclean",
    "q112_decontam_incremental",
    "q113_range_count_window",
    # round-10 additions: the BM25 index-vs-rebuild equivalence and the
    # corpus-trained bigram LM are the two whose statistics change
    # materially with corpus size; q119 stresses the verified-pair path
    # through the 10x near-dup graph
    "q116_bm25_incremental",
    "q119_source_dup_matrix",
    "q120_bigram_lm_score",
    # round-10 session 2: the offset-recomposition global rank is the
    # one operator whose correctness argument is about partitioning
    # consistency — 10x the rows and 32 real buckets is where a
    # branch-divergent formulation would break; q138's quantized
    # whitening sums and q139's micro-unit event sums verify the
    # order-free integer discipline over 10x the addends
    "q135_serpentine_shards",
    "q138_whitening_summary",
    "q139_windowed_counts",
    # the as-of attribution window over 10x events (100k touches /
    # conversions per user stream) is the union-window shape whose
    # payoff is exactly the dense-touch regime
    "q143_conversion_attribution",
]


@pytest.mark.skipif(not os.path.isdir(SF1_DIR),
                    reason="testdata/sf1 not generated (scripts/gen_sf.py)")
@pytest.mark.parametrize("name", SF1_QUERIES)
def test_sf1_query_matches_oracle(spark, name):
    ok, detail = compare_query(spark, name, SF1_DIR)
    assert ok, f"{name} @ sf1: {detail}"
