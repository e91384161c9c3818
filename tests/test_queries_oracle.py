"""Oracle-differential tests: every catalog query vs its DuckDB SQL
(SURVEY §5.2 strategy #1 — local mirror of the driver's t2 gate)."""

from __future__ import annotations

import pytest

from seo_audit_etl_actor_spark.queries import QUERIES
from tests.oracle_diff import compare

ORACLE_SPECS = [q for q in QUERIES if q.sql is not None]
ROWS_ONLY_SPECS = [q for q in QUERIES if q.sql is None]


@pytest.mark.parametrize("spec", ORACLE_SPECS, ids=[q.name for q in ORACLE_SPECS])
def test_query_matches_oracle(spark, duck, sf_dir, spec):
    sdf = spec.fn(spark, sf_dir)
    rel = duck.execute(spec.sql)
    problems = compare(sdf, rel)
    assert not problems, f"{spec.name}: " + "; ".join(problems)


@pytest.mark.parametrize("spec", ROWS_ONLY_SPECS, ids=[q.name for q in ROWS_ONLY_SPECS])
def test_rows_only_queries_run(spark, sf_dir, spec):
    df = spec.fn(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
