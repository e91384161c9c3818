"""Property and plan tests for the round-3 scale-pattern operators
(heavy hitters, quantile bound, partial-aggregate merge, integer PageRank)
and the event-analytics family — beyond the DuckDB differential in
test_queries_oracle.py, these pin the properties the oracle can't see:
partitioning invariance, mass conservation, funnel monotonicity, and the
plan shapes the 100 TB design depends on."""

from __future__ import annotations

from pyspark.sql import functions as F

from seo_audit_etl_actor_spark.operators.heavyhitters import (
    _java_tokens,
    exact_heavy_hitters,
)
from seo_audit_etl_actor_spark.operators.text import tokens
from seo_audit_etl_actor_spark.plans import audit
from seo_audit_etl_actor_spark.queries import QUERIES
from seo_audit_etl_actor_spark.queries.scale_ext import PR_ITERS, PR_Q
from seo_audit_etl_actor_spark.session import load_table

SPECS = {q.name: q for q in QUERIES}


# ------------------------------------------------------------- heavy hitters
def _hh_rows(spark, df, k):
    out = exact_heavy_hitters(df, F.explode(tokens(F.col("text"))), "text", k)
    return sorted((r["token"], r["n_occurrences"]) for r in out.collect())


def test_heavy_hitters_equal_full_groupby(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    k = 64
    ex = docs.select(F.explode(tokens(F.col("text"))).alias("token"))
    n = ex.count()
    expected = sorted(
        (r["token"], r["cnt"])
        for r in ex.groupBy("token").agg(F.count(F.lit(1)).alias("cnt")).collect()
        if r["cnt"] * k > n
    )
    assert _hh_rows(spark, docs, k) == expected
    assert expected, "test corpus must actually contain heavy hitters"


def test_heavy_hitters_partitioning_invariant(spark, sf_dir):
    """The MG candidate set depends on partitioning; the exact-recount
    output must not."""
    docs = load_table(spark, sf_dir, "documents")
    a = _hh_rows(spark, docs.repartition(1), 64)
    b = _hh_rows(spark, docs.repartition(13, "source"), 64)
    c = _hh_rows(spark, docs.repartition(32, "doc_id"), 64)
    assert a == b == c


def test_java_tokens_matches_spark_tokens(spark):
    """The Python candidate tokenizer must mirror operators/text.tokens()
    (Java \\s semantics, space-only trim) on awkward whitespace."""
    cases = [
        "plain words here",
        "  leading and trailing  ",
        "tab\tseparated\ntokens\x0bhere",
        "nbsp joined stays-one-token",
        "\ttab-lead keeps empty",
        "",
        "   ",
    ]
    df = spark.createDataFrame([(c,) for c in cases], "text string")
    spark_side = [r["t"] for r in df.select(tokens(F.col("text")).alias("t")).collect()]
    python_side = [_java_tokens(c) for c in cases]
    assert spark_side == python_side


# ------------------------------------------------------------ integer PageRank
def test_pagerank_conserves_mass_and_covers_nodes(spark, sf_dir):
    rows = SPECS["nation_pagerank"].fn(spark, sf_dir).collect()
    assert len(rows) == 25
    total = sum(r["rank_q"] for r in rows)
    # floor division leaks at most 1 quantum per edge per division site per
    # iteration; with ≤625 edges + 25 teleports × 3 iterations the loss is
    # bounded far below 0.1% of total mass
    assert 0.999 * PR_Q <= total <= PR_Q
    assert all(r["rank_q"] > 0 for r in rows)
    # weighted graph must produce non-uniform ranks
    assert len({r["rank_q"] for r in rows}) > 1


def test_pagerank_plan_reuses_edges_and_iterates(spark, sf_dir):
    plan = audit.optimized_plan_string(SPECS["nation_pagerank"].fn(spark, sf_dir))
    assert plan.count("Join") >= PR_ITERS  # one ranks⨝edges per iteration


# ------------------------------------------------------------- event family
def test_funnel_steps_monotonic(spark, sf_dir):
    row = SPECS["conversion_funnel"].fn(spark, sf_dir).collect()[0]
    assert row["n_users"] >= row["step_view"] >= row["step_click"] >= row["step_purchase"]
    assert row["step_purchase"] > 0  # synthetic stream is dense enough


def test_funnel_single_exchange_for_windows(spark, sf_dir):
    """All three step windows and the per-user rollup share one
    hashpartitioning(user_id) exchange."""
    plan = audit.plan_string(SPECS["conversion_funnel"].fn(spark, sf_dir))
    assert plan.count("Exchange hashpartitioning") <= 1, plan


def test_retention_offsets_start_at_zero(spark, sf_dir):
    rows = SPECS["weekly_retention_cohorts"].fn(spark, sf_dir).collect()
    assert rows
    assert all(r["week_offset"] >= 0 for r in rows)
    by_cohort = {}
    for r in rows:
        by_cohort.setdefault(r["cohort_week"], []).append(r)
    for cohort, cells in by_cohort.items():
        offsets = {r["week_offset"] for r in cells}
        assert 0 in offsets, f"cohort {cohort} missing its own week"


def test_json_props_extraction_stays_native(spark, sf_dir):
    df = SPECS["json_props_stats"].fn(spark, sf_dir)
    assert not audit.uses_python_udf(df)


def test_median_bound_within(spark, sf_dir):
    row = SPECS["median_bound_check"].fn(spark, sf_dir).collect()[0]
    assert row["within_bound"] is True
    assert row["exact_median"] is not None and row["n_rows"] > 0
