"""Count-Min Sketch operator properties (operators/cms.py): the
unconditional overcount guarantee for EVERY token (not just the audit's
top-20), exactness in the collision-free regime, and mergeability (the
sketch of a union == the cell-wise sum of the parts' sketches — the
monoid property that makes CMS a shard-and-merge structure)."""

from __future__ import annotations

from pyspark.sql import functions as F

from seo_audit_etl_actor_spark.operators.cms import build_cms, cms_estimate
from seo_audit_etl_actor_spark.operators.text import tokens
from seo_audit_etl_actor_spark.session import load_table


def _toks(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(F.explode(tokens(F.col("text"))).alias("token"))


def test_cms_never_undercounts_any_token(spark, sf_dir):
    toks = _toks(spark, sf_dir)
    exact = toks.groupBy("token").agg(F.count(F.lit(1)).alias("n"))
    est = cms_estimate(build_cms(toks), exact.select("token"))
    bad = exact.join(est, "token").where(F.col("cms_estimate") < F.col("n"))
    assert bad.count() == 0


def test_cms_exact_when_collision_free(spark, sf_dir):
    """width ≫ vocabulary → no collisions → estimate == exact for all."""
    toks = _toks(spark, sf_dir)
    exact = toks.groupBy("token").agg(F.count(F.lit(1)).alias("n"))
    cms = build_cms(toks, width=65536)
    est = cms_estimate(cms, exact.select("token"), width=65536)
    diff = exact.join(est, "token").where(F.col("cms_estimate") != F.col("n"))
    assert diff.count() == 0


def test_cms_merge_equals_whole(spark, sf_dir):
    """Sketch(the whole) == cell-wise sum of Sketch(each shard)."""
    toks = _toks(spark, sf_dir).withColumn(
        "shard", F.pmod(F.xxhash64("token"), F.lit(3))
    )
    whole = build_cms(toks)
    merged = None
    for s in range(3):
        part = build_cms(toks.where(F.col("shard") == s))
        merged = part if merged is None else merged.unionByName(part)
    merged = merged.groupBy("row", "col").agg(F.sum("cnt").alias("cnt"))
    a = sorted(map(tuple, whole.collect()))
    b = sorted(map(tuple, merged.collect()))
    assert a == b
