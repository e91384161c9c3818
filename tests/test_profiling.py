"""One-pass table profiler (operators/profiling.py): stats verified
against direct per-column queries; single-job contract."""

from __future__ import annotations

from pyspark.sql import functions as F

from seo_audit_etl_actor_spark.operators.profiling import profile_table
from seo_audit_etl_actor_spark.session import load_table


def test_profile_matches_direct_stats(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    prof = {r["column"]: r for r in profile_table(orders).collect()}
    n = orders.count()
    assert set(prof) == set(orders.columns)
    for c in orders.columns:
        assert prof[c]["n_rows"] == n
        assert prof[c]["n_nulls"] == orders.where(F.col(c).isNull()).count()
    ok = prof["o_orderkey"]
    exact = orders.select("o_orderkey").distinct().count()
    assert abs(ok["approx_distinct"] - exact) <= max(2, 0.15 * exact)  # HLL rsd=0.05 is typical, not a bound
    assert float(ok["min_repr"]) == orders.agg(F.min("o_orderkey")).first()[0]
    assert float(ok["max_repr"]) == orders.agg(F.max("o_orderkey")).first()[0]
    st = prof["o_orderstatus"]
    assert st["approx_distinct"] in (2, 3, 4)  # 3 statuses, HLL slack
    assert st["avg_len"] == 1.0


def test_profile_handles_arrays_and_nulls(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    prof = {r["column"]: r for r in profile_table(emb).collect()}
    assert prof["embedding"]["n_nulls"] == 0
    assert prof["embedding"]["min_repr"] is not None  # arrays are orderable
    df = spark.createDataFrame([(1, None), (2, "x")], "id long, s string")
    p = {r["column"]: r for r in profile_table(df).collect()}
    assert p["s"]["n_nulls"] == 1 and p["s"]["null_pct"] == 50.0


def test_profile_empty_table_degrades_gracefully(spark):
    """ADVICE r4: an empty feed must profile, not crash on schema
    inference (every stat is None at n=0)."""
    df = spark.createDataFrame([], "id long, s string, m map<string,string>")
    p = {r["column"]: r for r in profile_table(df).collect()}
    assert set(p) == {"id", "s", "m"}
    for c in p.values():
        assert c["n_rows"] == 0
        assert c["null_pct"] is None and c["min_repr"] is None
