"""Streaming lake upsert: a `foreachBatch` sink that MERGEs each
micro-batch into a keyed parquet lake table via operators/upsert.py —
the streaming composition of the batch MERGE primitive (engine extension
surface; the reference overwrites whole KV values, src/main.js:30-38).

Why foreachBatch: Structured Streaming has no native MERGE sink on plain
parquet; `foreachBatch` hands each micro-batch over as a regular
DataFrame, so the BATCH merge operator runs unchanged — the same
batch/stream plan-sharing discipline as streaming/curation.py.

Exactly-once story (the part a restart must not break):
- the checkpoint guarantees each input file feeds exactly one epoch;
- an epoch can still be REPLAYED after a crash between merge and
  checkpoint commit, so the sink must be idempotent per batch: MERGE
  with (key, version=epoch) IS idempotent — replaying the same batch
  produces byte-identical lake state (dedupe_updates resolves the
  key+version tie deterministically), asserted by
  tests/test_streaming_lake.py;
- the lake swap is atomic (write to a staging dir, then rename), so a
  reader never sees a half-written table and a crash mid-write leaves
  the previous lake intact.

Scale: the merge itself is one shuffle on the (uniform) key per batch —
copy-on-write. At 100 TB you'd swap the full-table rewrite for
partition-pruned rewrites of touched partitions only (see
operators/upsert.py docstring); the sink contract (idempotent MERGE per
epoch, atomic publish) is unchanged.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from seo_audit_etl_actor_spark.operators.upsert import merge_upsert


def lake_upsert_sink(
    spark: SparkSession,
    lake_dir: str,
    keys: list[str],
    version_col: str = "__version",
):
    """Build a foreachBatch sink merging each micro-batch into the parquet
    lake at `lake_dir`, keyed by `keys`.

    The batch DataFrame must NOT already contain `version_col`: the sink
    stamps it from the epoch id, which is what makes epoch replay
    idempotent (same epoch → same version → same merge outcome).
    """

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        updates = batch_df.withColumn(version_col, F.lit(int(epoch_id)).cast("long"))
        # the previous epoch's swap invalidated any cached file listing for
        # this path; refresh or the read resolves deleted part files
        spark.catalog.refreshByPath(lake_dir)
        if os.path.isdir(lake_dir):
            base = spark.read.parquet(lake_dir)
            merged = merge_upsert(base, updates, keys, version_col)
        else:
            merged = merge_upsert(
                updates.limit(0), updates, keys, version_col
            )
        staging = f"{lake_dir}.staging-{epoch_id}-{os.getpid()}"
        old = f"{lake_dir}.old-{epoch_id}-{os.getpid()}"
        # merged reads the CURRENT lake, so materialize to staging first,
        # then publish with two renames (never overwrite the path being read)
        merged.write.mode("overwrite").parquet(staging)
        if os.path.isdir(lake_dir):
            os.rename(lake_dir, old)
        os.rename(staging, lake_dir)
        shutil.rmtree(old, ignore_errors=True)
        spark.catalog.refreshByPath(lake_dir)

    return sink


def curated_lake_query(
    spark: SparkSession, source_dir: str, lake_dir: str, checkpoint_dir: str
):
    """Wire the curation verdict stream (streaming/curation.py) into the
    lake: one row per doc_id with its latest funnel verdict — the
    streaming materialization of the curation funnel's per-doc output.
    Returns the started StreamingQuery (availableNow drain)."""
    from seo_audit_etl_actor_spark.streaming.curation import (
        curate_document_stream,
        read_document_stream,
    )

    verdicts = curate_document_stream(read_document_stream(spark, source_dir))
    sink = lake_upsert_sink(spark, lake_dir, keys=["doc_id"])
    return (
        verdicts.writeStream.foreachBatch(sink)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
