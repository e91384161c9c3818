"""Skew operators: the salted forms must be EXACTLY equal to their naive
equivalents (salting is a physical rewrite, never a semantic one), including
on an artificially hot key."""

from __future__ import annotations

from pyspark.sql import functions as F

from seo_audit_etl_actor_spark.operators import skew
from seo_audit_etl_actor_spark.session import load_table


def test_salted_count_distinct_exact(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    naive = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type").agg(F.countDistinct("user_id").alias("n")).collect()
    }
    salted = {
        r["event_type"]: r["n_distinct"]
        for r in skew.salted_count_distinct(ev, ["event_type"], "user_id").collect()
    }
    assert salted == naive


def test_salted_count_distinct_on_hot_key(spark):
    # one key owns 90% of rows with many distinct values
    rows = [("hot", i % 997) for i in range(9000)] + [("cold", i % 13) for i in range(1000)]
    df = spark.createDataFrame(rows, "k string, v int")
    got = {r["k"]: r["n_distinct"] for r in skew.salted_count_distinct(df, ["k"], "v").collect()}
    assert got == {"hot": 997, "cold": 13}


def test_salted_join_equals_plain_join(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    plain = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("o_orderkey").alias("s"))
    )
    salted = (
        skew.salted_join(
            orders.withColumnRenamed("o_custkey", "c_custkey"),
            cust,
            on=["c_custkey"],
            probe_unique_col="o_orderkey",
            n_salts=4,
        )
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("o_orderkey").alias("s"))
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_skew_stats_orders_by_weight(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    rows = skew.skew_stats(ev, ["event_type"], top_n=3).collect()
    assert len(rows) == 3
    assert rows[0]["n_rows"] >= rows[1]["n_rows"] >= rows[2]["n_rows"]
    assert all(0 < r["share"] <= 1 for r in rows)
