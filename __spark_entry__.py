"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` runs the flagship query (threshold-bucket aggregation, the
reference's core computation — /root/reference/src/etl.js:136-138) on
sf0.001. `queries()` / `oracle_sql()` expose the full catalog from
seo_audit_etl_actor_spark.queries (each operator from SURVEY.md §2 as a
named Spark query with matching DuckDB oracle SQL).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from seo_audit_etl_actor_spark.queries import catalog  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return catalog.queries()["keyword_position_buckets"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return catalog.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL matching each queries() entry (omitted for
    non-SQL-expressible ops → driver's rows-only check)."""
    return catalog.oracle_sql()
