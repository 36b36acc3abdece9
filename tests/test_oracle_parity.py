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


def test_every_query_has_oracle_or_is_flagged():
    # non-SQL-expressible ops are allowed to omit the oracle; list them
    # explicitly so the gap is a decision, not an accident.
    allowed_rows_only = set()
    missing = set(QUERIES) - set(ORACLES) - allowed_rows_only
    assert not missing, f"queries without oracle: {sorted(missing)}"
