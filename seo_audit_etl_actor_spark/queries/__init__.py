"""Named query catalog — the driver contract surface.

Each entry pairs a Spark DataFrame query (spark, sf_dir) -> DataFrame with
the equivalent ANSI SQL for the DuckDB oracle. Aliases match exactly on both
sides (the driver sorts columns by name before value-hashing).

Determinism policy for oracle-checked queries:
- money/metric sums & averages go through DECIMAL(18,2) so the aggregate is
  exact and order-independent, then cast to double on both sides;
- every window/top-k has a total-order tiebreaker;
- coerced strings use TRY_CAST semantics on both sides.
"""

from seo_audit_etl_actor_spark.queries.catalog import (
    QUERIES,
    QuerySpec,
    oracle_sql,
    queries,
)

__all__ = ["QUERIES", "QuerySpec", "queries", "oracle_sql"]
