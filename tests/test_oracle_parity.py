"""Every registered query must hash-match its DuckDB oracle at sf0.01 —
a local replica of the driver's correctness gate."""

from __future__ import annotations

import pytest

import vulnerablecode_spark.plans.relational  # noqa: F401 — registers queries
from vulnerablecode_spark.plans import ORACLES, QUERIES
from vulnerablecode_spark.testing import compare_query

from tests.conftest import SF_CORRECT


def _all_query_names():
    import vulnerablecode_spark.plans.coverage  # noqa: F401
    import vulnerablecode_spark.plans.curate  # noqa: F401
    import vulnerablecode_spark.plans.domain  # noqa: F401
    import vulnerablecode_spark.plans.entity  # noqa: F401
    import vulnerablecode_spark.plans.llm  # noqa: F401
    import vulnerablecode_spark.plans.select  # noqa: F401

    return sorted(QUERIES)


@pytest.mark.parametrize("name", _all_query_names())
def test_query_matches_oracle(spark, name):
    ok, detail = compare_query(spark, name, SF_CORRECT)
    assert ok, f"{name}: {detail}"


def _numeric_family_names():
    """Queries whose graded surfaces carry computed numeric formulas
    (sketch algebra, micro-nat quantization, DECIMAL(38,0) cross terms,
    regression fits) — boundary bugs in these are DATA-DEPENDENT and can
    hide at one SF (the r10 lesson), so they get a SECOND parity sweep
    at sf0.001 on top of the registry-wide sf0.01 gate."""
    names = _all_query_names()
    return [n for n in names
            if n.split("_")[0] in {f"q{i}" for i in range(160, 185)}
            or n in ("q129_byte_histogram", "q131_ngram_novelty",
                     "q136_shard_balance", "q143_session_gaps",
                     "q149_rate_anomalies")]


@pytest.mark.parametrize("name", _numeric_family_names())
def test_numeric_query_matches_oracle_at_second_sf(spark, name):
    from tests.conftest import SF_SMOKE

    ok, detail = compare_query(spark, name, SF_SMOKE)
    assert ok, f"{name} at sf0.001: {detail}"


def test_every_query_has_oracle_or_is_flagged():
    # non-SQL-expressible ops are allowed to omit the oracle; list them
    # explicitly so the gap is a decision, not an accident.
    allowed_rows_only = set()
    missing = set(QUERIES) - set(ORACLES) - allowed_rows_only
    assert not missing, f"queries without oracle: {sorted(missing)}"
