"""Runtime Bloom-filter join pushdown for corpus-vs-corpus decontamination
(operators/contamination.py gram-index path).

Two assertions carry the 100 TB claim:
1. plan: Catalyst injects bloom_filter_agg + might_contain into the
   index-vs-index join (thresholds lowered so the injection triggers at
   test scale — at real scale the application-side default of 10 GB is
   what gates it);
2. semantics: the pruned join returns exactly the broadcast baseline's
   contaminated doc_ids (a Bloom filter may pass false positives into the
   shuffle, but the join itself stays exact).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from seo_audit_etl_actor_spark.operators.contamination import (
    build_gram_index,
    contaminated_doc_ids,
    contaminated_doc_ids_from_index,
)
from seo_audit_etl_actor_spark.plans import audit
from seo_audit_etl_actor_spark.session import load_table

MODULUS = 97

BLOOM_CONFS = {
    # force a shuffle join (a broadcast join would be skipped by the rule)
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    # the test index is far below the 10 GB application-side gate
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
}


@pytest.fixture(scope="module")
def gram_index_dir(spark, sf_dir, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("gram_index") / "grams.parquet")
    build_gram_index(load_table(spark, sf_dir, "documents"), path)
    return path


@pytest.fixture()
def bloom_confs(spark):
    old = {}
    for k, v in BLOOM_CONFS.items():
        try:
            old[k] = spark.conf.get(k)
        except Exception:
            old[k] = None
        spark.conf.set(k, v)
    yield
    for k, v in old.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def test_bloom_filter_injected_into_index_join(spark, gram_index_dir, bloom_confs):
    idx = spark.read.parquet(gram_index_dir)
    df = contaminated_doc_ids_from_index(idx, MODULUS)
    assert audit.has_runtime_bloom_filter(df), audit.optimized_plan_string(df)[:2000]


def test_index_join_matches_broadcast_baseline(spark, sf_dir, gram_index_dir, bloom_confs):
    docs = load_table(spark, sf_dir, "documents")
    bench = docs.where(F.col("doc_id") % MODULUS == 0)
    corpus = docs.where(F.col("doc_id") % MODULUS != 0)
    want = sorted(r["doc_id"] for r in contaminated_doc_ids(corpus, bench).collect())

    idx = spark.read.parquet(gram_index_dir)
    got = sorted(
        r["doc_id"] for r in contaminated_doc_ids_from_index(idx, MODULUS).collect()
    )
    assert got == want and len(got) > 0


def test_explode_blocks_injection_documenting_why_index_exists(spark, sf_dir, bloom_confs):
    """Negative control: the self-contained (explode-at-query-time) shape
    CANNOT receive the runtime filter — InjectRuntimeFilter requires the
    creation side to be a selective filter directly over a scan, and the
    Generate node breaks that pattern. This is the documented reason the
    materialized gram index exists; if a future Spark version learns to
    inject through Generate, this test flips and the index becomes an
    optimization rather than a requirement."""
    from seo_audit_etl_actor_spark.operators.dedup import hashed_shingle_set

    docs = load_table(spark, sf_dir, "documents")
    grams = hashed_shingle_set(F.col("text"))
    bench = docs.where(F.col("doc_id") % MODULUS == 0).select(
        F.explode(grams).alias("__bgram")
    )
    corpus = docs.where(F.col("doc_id") % MODULUS != 0).select(
        "doc_id", F.explode(grams).alias("gram")
    )
    df = (
        corpus.join(bench, corpus["gram"] == bench["__bgram"])
        .select("doc_id")
        .distinct()
    )
    assert not audit.has_runtime_bloom_filter(df)
