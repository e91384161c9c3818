"""Driver-visible oracle for the Structured Streaming surface (VERDICT r5
task 8): run the streaming rate-anomaly monitor over a BOUNDED file feed
cut from the events table and emit a one-row stream≡batch differential
summary the DuckDB oracle predicts from the batch SQL alone.

The streaming form (streaming/anomaly.py, applyInPandasWithState) closes
an hour when a strictly later hour appears for that type, so draining an
hour-aligned feed reproduces the batch `event_rate_anomalies` rows for
every hour except each type's final (never-closed) one — the same
differential the local test asserts (tests/test_streaming_anomaly.py),
here condensed to oracle-checkable BIGINTs: closed-row count, anomaly
count, an event-count checksum, and the equality flag itself.

Scale: the monitor's state is O(trailing window) longs per event_type
(low cardinality); each micro-batch pre-aggregates to one row per
(type, hour) before the stateful stage. The feed build is two passes over
events (hour bounds + partitioned write); everything the stream emits is
hours × types, inherently tiny at any corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from seo_audit_etl_actor_spark.queries.events_ext import (
    SQL_EVENT_RATE_ANOMALIES,
    q_event_rate_anomalies,
)
from seo_audit_etl_actor_spark.session import load_table


def _write_hour_cut_feed(spark: SparkSession, sf_dir: str, out_dir: str) -> None:
    """Write events as 3 hour-aligned parquet files (ascending hour ranges)
    so micro-batch arrival order matches event-time order — zero late data,
    the configuration under which stream closure ≡ batch semantics."""
    import glob
    import shutil

    ev = load_table(spark, sf_dir, "events").withColumn(
        "hour_id", F.floor(F.unix_micros("ts") / F.lit(3_600_000_000)).cast("long")
    )
    lo, hi = ev.agg(F.min("hour_id"), F.max("hour_id")).first()
    cut1 = lo + (hi - lo) // 3
    cut2 = lo + 2 * (hi - lo) // 3
    preds = [
        F.col("hour_id") <= cut1,
        (F.col("hour_id") > cut1) & (F.col("hour_id") <= cut2),
        F.col("hour_id") > cut2,
    ]
    for i, pred in enumerate(preds):
        tmp = f"{out_dir}.part{i}"
        ev.where(pred).drop("hour_id").coalesce(1).write.mode("overwrite").parquet(tmp)
        for j, p in enumerate(sorted(glob.glob(f"{tmp}/*.parquet"))):
            shutil.copy(p, f"{out_dir}/part-{i:02d}{j:02d}.parquet")
        shutil.rmtree(tmp, ignore_errors=True)


def q_streaming_anomaly_differential(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row summary of the stream-vs-batch differential. Computed
    eagerly (the stream must drain and its output is hours × types rows)
    so the temp feed + checkpoint can be removed before returning."""
    import os
    import shutil
    import tempfile

    from seo_audit_etl_actor_spark.streaming import anomaly as sa

    work = tempfile.mkdtemp(prefix="spark_graft_stream_audit_")
    feed = os.path.join(work, "feed")
    os.makedirs(feed)
    try:
        _write_hour_cut_feed(spark, sf_dir, feed)
        collected: list[tuple] = []

        def sink(batch_df: DataFrame, _epoch: int) -> None:
            collected.extend(tuple(r) for r in batch_df.collect())

        q = (
            sa.monitor_event_rates(sa.read_event_stream(spark, feed))
            .writeStream.foreachBatch(sink)
            .outputMode("append")
            .option("checkpointLocation", os.path.join(work, "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

        hour_id = F.floor(F.unix_micros("ts") / F.lit(3_600_000_000)).cast("long")
        last_hours = {
            r["event_type"]: r["mx"]
            for r in load_table(spark, sf_dir, "events")
            .groupBy("event_type")
            .agg(F.max(hour_id).alias("mx"))
            .collect()
        }
        expected = sorted(
            tuple(r)
            for r in q_event_rate_anomalies(spark, sf_dir).collect()
            if r["hour_id"] < last_hours[r["event_type"]]
        )
        got = sorted(collected)
        # column order: event_type, hour_id, n_events, baseline_mean,
        # z_score, is_anomaly (both sides share the batch query's schema)
        n_anom = sum(1 for r in got if r[5])
        row = (
            len(got),
            n_anom,
            int(sum(r[2] for r in got)),
            1 if got == expected else 0,
        )
        return spark.createDataFrame(
            [row],
            "n_closed_rows long, n_anomalies long, sum_events long, "
            "stream_equals_batch long",
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


SQL_STREAMING_ANOMALY_DIFFERENTIAL = f"""
WITH batch AS ({SQL_EVENT_RATE_ANOMALIES}),
last_h AS (
  SELECT event_type,
         MAX(CAST(floor(epoch_us(ts) / 3600000000) AS BIGINT)) AS mx
  FROM events GROUP BY event_type
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_closed_rows,
       CAST(COALESCE(SUM(CASE WHEN is_anomaly THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_anomalies,
       CAST(COALESCE(SUM(n_events), 0) AS BIGINT) AS sum_events,
       CAST(1 AS BIGINT) AS stream_equals_batch
FROM batch JOIN last_h USING (event_type)
WHERE batch.hour_id < last_h.mx
"""
