"""Approximate-aggregate error bounds (the approx family's compensating
checks, like the HLL ≤2% test): percentile_approx must land within the
documented rank-error window of the exact percentile."""

from __future__ import annotations

from pyspark.sql import functions as F

from seo_audit_etl_actor_spark.session import load_table


def test_percentile_approx_within_rank_error(spark, sf_dir):
    """KLL/GK-style sketch guarantee: with accuracy=a the result's RANK is
    within n/a of the target rank. Check p50/p90 over l_extendedprice."""
    li = load_table(spark, sf_dir, "lineitem").select("l_extendedprice")
    n = li.count()
    accuracy = 1000
    row = li.agg(
        F.percentile_approx("l_extendedprice", [0.5, 0.9], accuracy).alias("approx"),
        F.expr("percentile(l_extendedprice, array(0.5, 0.9))").alias("exact"),
    ).first()
    for q, (ap, _ex) in zip((0.5, 0.9), zip(row["approx"], row["exact"])):
        rank = li.where(F.col("l_extendedprice") <= ap).count()
        assert abs(rank - q * n) <= n / accuracy + 1, (q, ap, rank, n)


def test_hll_sketch_shard_merge_estimates_distinct(spark, sf_dir):
    """Mergeable-sketch discipline (the 100 TB approx-distinct pattern the
    scalar approx_count_distinct can't offer): per-shard HLL sketches built
    independently, merged with hll_union_agg, estimate within the standard
    HLL error of the exact distinct — sketch merge is associative, so
    shard-then-merge ≡ one global sketch regardless of partitioning."""
    from pyspark.sql import functions as F

    from seo_audit_etl_actor_spark.session import load_table

    ev = load_table(spark, sf_dir, "events")
    exact = ev.select("user_id").distinct().count()
    merged_est = (
        ev.groupBy((F.col("user_id") % 8).alias("shard"))
        .agg(F.hll_sketch_agg("user_id").alias("sk"))
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
        .first()["est"]
    )
    global_est = ev.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("est")
    ).first()["est"]
    assert merged_est == global_est  # merge associativity, exact equality
    assert abs(merged_est - exact) <= max(2, 0.05 * exact)
