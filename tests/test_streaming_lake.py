"""Streaming lake-upsert sink (streaming/lake.py): the curation verdict
stream MERGEd into a keyed parquet lake, with the three contracts that
matter across failures:

1. drain == batch: after one availableNow drain, the lake holds exactly
   one row per doc_id with the batch funnel's verdicts;
2. restart no-op: restarting the query on the same checkpoint with no new
   files leaves the lake byte-identical (checkpoint prevents re-feeding);
3. epoch replay idempotence: re-applying the SAME micro-batch through the
   sink (the crash-between-merge-and-commit case foreachBatch documents)
   leaves the lake unchanged — MERGE keyed by (doc_id, version=epoch) is
   idempotent.
"""

from __future__ import annotations

import shutil
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from seo_audit_etl_actor_spark.session import load_table
from seo_audit_etl_actor_spark.streaming import lake as sl


@pytest.fixture(scope="module")
def doc_dir(spark, sf_dir, tmp_path_factory):
    out = tmp_path_factory.mktemp("lake_docs")
    docs = load_table(spark, sf_dir, "documents")
    docs.coalesce(2).write.mode("overwrite").parquet(str(out / "stream"))
    return str(out / "stream")


def _lake_rows(spark, lake_dir):
    spark.catalog.refreshByPath(lake_dir)
    return sorted(
        tuple(r)
        for r in spark.read.parquet(lake_dir)
        .select("doc_id", "source", "n_tokens", "stage")
        .collect()
    )


def test_lake_upsert_drain_restart_and_replay(spark, sf_dir, doc_dir, tmp_path):
    lake = str(tmp_path / "lake")
    ck = str(tmp_path / "ck")

    q = sl.curated_lake_query(spark, doc_dir, lake, ck)
    q.awaitTermination()
    got = _lake_rows(spark, lake)

    # 1. one row per doc, verdicts match the batch curation funnel's doc set
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert len(got) == n_docs
    ids = [r[0] for r in got]
    assert len(set(ids)) == n_docs
    stages = {r[3] for r in got}
    assert stages <= {"duplicate", "lang_filter", "too_short", "low_quality", "kept"}
    assert "kept" in stages

    # 2. restart on the same checkpoint, no new files → lake unchanged
    q2 = sl.curated_lake_query(spark, doc_dir, lake, ck)
    q2.awaitTermination()
    assert _lake_rows(spark, lake) == got

    # 3. epoch replay: push the CURRENT lake content back through the sink
    #    with a fixed epoch — applying the same batch twice must be a no-op
    sink = sl.lake_upsert_sink(spark, lake, keys=["doc_id"])
    # materialize the replay batch up front: a real foreachBatch replay
    # hands the sink a fresh micro-batch, not a view over the lake files
    # the sink itself is about to swap out
    src = spark.read.parquet(lake).select("doc_id", "source", "n_tokens", "stage")
    replay = spark.createDataFrame(src.collect(), src.schema)
    sink(replay, 7)
    after_once = _lake_rows(spark, lake)
    sink(replay, 7)
    assert _lake_rows(spark, lake) == after_once == got


def test_lake_upsert_new_data_updates_rows(spark, doc_dir, tmp_path):
    """A second drain with re-sent files must flip re-sent docs to
    `duplicate` (latest verdict wins — MERGE update path), not duplicate
    lake rows."""
    lake = str(tmp_path / "lake2")
    ck = str(tmp_path / "ck2")
    live = tmp_path / "live"
    live.mkdir()
    parts = sorted(Path(doc_dir).glob("part-*.parquet"))
    shutil.copy(parts[0], live / parts[0].name)

    q = sl.curated_lake_query(spark, str(live), lake, ck)
    q.awaitTermination()
    spark.catalog.refreshByPath(lake)
    first = spark.read.parquet(lake)
    n_first = first.count()
    assert n_first > 0

    # re-send the same file under a new name: state dedup marks every doc
    # duplicate; the merge must UPDATE in place (row count stable)
    shutil.copy(parts[0], live / f"resend-{parts[0].name}")
    q2 = sl.curated_lake_query(spark, str(live), lake, ck)
    q2.awaitTermination()
    spark.catalog.refreshByPath(lake)
    after = spark.read.parquet(lake)
    assert after.count() == n_first
    assert after.where(F.col("stage") != "duplicate").count() == 0
