"""Query plans: the engine's operator inventory expressed as named queries.

Each query maps one operator family from SURVEY.md §2 (reference:
aboutcode-org/vulnerablecode) onto the driver's synthetic tables, together
with an ANSI-SQL oracle that DuckDB runs for hash-verification.
"""

from vulnerablecode_spark.plans.registry import ORACLES, QUERIES, query  # noqa: F401
