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

from seo_audit_etl_actor_spark import fixture_cache as fc
from seo_audit_etl_actor_spark.queries.events_ext import (
    SQL_EVENT_RATE_ANOMALIES,
    q_event_rate_anomalies,
)
from seo_audit_etl_actor_spark.session import load_table


import contextlib


@contextlib.contextmanager
def _drain_partitions(spark: SparkSession, n: int = 8):
    """Size streaming STATE partitioning to the bounded audit feed for the
    duration of a drain. `spark.sql.shuffle.partitions` at first-checkpoint
    time fixes the number of state-store instances for the query's life;
    the differentials' feeds are a few MB, so the session default (32)
    buys nothing but 32 per-operator checkpoint directories' worth of
    fsync per micro-batch — the dominant cost of a warm drain. At
    production scale the knob goes UP with load instead; each audit owns a
    fresh checkpoint, so the setting is per-drain, restored in finally."""
    conf = spark.conf
    old = conf.get("spark.sql.shuffle.partitions")
    conf.set("spark.sql.shuffle.partitions", str(n))
    try:
        yield
    finally:
        conf.set("spark.sql.shuffle.partitions", old)


def _write_hour_cut_feed(
    spark: SparkSession, sf_dir: str, out_dir: str, user_mod: int | None = None
) -> None:
    """Write events as 3 hour-aligned parquet files (ascending hour ranges)
    so micro-batch arrival order matches event-time order — zero late data,
    the configuration under which stream closure ≡ batch semantics.

    user_mod: keep only user_id % user_mod == 0 — a deterministic user
    sample for differentials whose semantics are PER-USER (sessionization):
    every kept user's event history is complete, so the operator sees
    identical semantics at a fraction of the state/feed cost."""
    import glob
    import shutil

    ev = load_table(spark, sf_dir, "events")
    if user_mod is not None:
        ev = ev.where(F.col("user_id") % user_mod == 0)
    ev = ev.withColumn(
        "hour_id", F.floor(F.unix_micros("ts") / F.lit(3_600_000_000)).cast("long")
    )
    lo, hi = ev.agg(F.min("hour_id"), F.max("hour_id")).first()
    if lo is None:
        # empty sample (tiny SF × user_mod): emit ONE empty parquet file so
        # the file-source stream still sees a schema'd feed and the drain
        # yields zero rows instead of crashing on None hour bounds
        tmp = f"{out_dir}.part0"
        ev.drop("hour_id").limit(0).coalesce(1).write.mode("overwrite").parquet(tmp)
        for p in sorted(glob.glob(f"{tmp}/*.parquet")):
            shutil.copy(p, f"{out_dir}/part-0000.parquet")
        shutil.rmtree(tmp, ignore_errors=True)
        return
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
    _stamp_feed_order(out_dir)


def _stamp_feed_order(out_dir: str) -> None:
    """Pin the feed's micro-batch arrival order: the file source orders by
    modification time at MILLISECOND granularity, so files written
    back-to-back tie and the order becomes arbitrary — a late cut leading
    would advance the watermark and late-drop earlier cuts wholesale.
    Distinct whole-second stamps in filename (= cut) order make arrival
    match event-time order deterministically."""
    import glob
    import os
    import time

    parts = sorted(glob.glob(os.path.join(out_dir, "part-*.parquet")))
    base = time.time() - 3600
    for k, p in enumerate(parts):
        os.utime(p, (base + k, base + k))


def _hour_cut_feed_cached(
    spark: SparkSession, sf_dir: str, user_mod: int | None = None
) -> str:
    """Session-cached hour-cut events feed (VERDICT r9 task 2): the six
    events differentials previously each wrote an IDENTICAL feed per
    invocation — one shared build per (events fingerprint, user_mod) per
    session now serves them all. Read-only for consumers; checkpoints
    stay per-drain."""
    key = ("hour_cut_feed", fc.table_fingerprint(sf_dir, "events"), user_mod)
    return fc.cached_dir(
        key, lambda d: _write_hour_cut_feed(spark, sf_dir, d, user_mod=user_mod)
    )


def _doc_cut_feed_cached(
    spark: SparkSession, sf_dir: str, docs: DataFrame | None = None
) -> str:
    """Session-cached doc_id-cut documents feed (curation + heavy-hitters
    differentials share one build). `docs` is only consulted on a cache
    miss — pass the persisted frame so the build shares its scan."""
    key = ("doc_cut_feed", fc.table_fingerprint(sf_dir, "documents"))
    return fc.cached_dir(
        key, lambda d: _write_doc_cut_feed(spark, sf_dir, d, docs=docs)
    )


def q_streaming_anomaly_differential(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row summary of the stream-vs-batch differential. Computed
    eagerly (the stream must drain and its output is hours × types rows)
    so the checkpoint can be removed before returning; the feed is the
    session-cached shared fixture."""
    import os
    import shutil
    import tempfile

    from seo_audit_etl_actor_spark.streaming import anomaly as sa

    work = tempfile.mkdtemp(prefix="spark_graft_stream_audit_")
    try:
        feed = _hour_cut_feed_cached(spark, sf_dir)
        collected: list[tuple] = []

        def sink(batch_df: DataFrame, _epoch: int) -> None:
            collected.extend(tuple(r) for r in batch_df.collect())

        with _drain_partitions(spark):
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


# ------------------------------------------- curation differential (r7)

def _write_doc_cut_feed(
    spark: SparkSession, sf_dir: str, out_dir: str, docs: DataFrame | None = None
) -> None:
    """Write documents as 3 doc_id-range parquet files (ascending ranges,
    ascending file names) so first-arrival keep-first dedup coincides with
    the batch funnel's min-doc_id keep-first — the configuration under
    which stream ≡ batch is exact (tests/test_streaming_curation.py).

    `docs`: optionally a pre-loaded (ideally persisted) documents frame —
    the r9 trim lets the curation differential share ONE cached scan
    across the bounds agg, the three cut writes, and its batch twin."""
    import glob
    import shutil

    if docs is None:
        docs = load_table(spark, sf_dir, "documents")
    lo, hi = docs.agg(F.min("doc_id"), F.max("doc_id")).first()
    cut1 = lo + (hi - lo) // 3
    cut2 = lo + 2 * (hi - lo) // 3
    preds = [
        F.col("doc_id") <= cut1,
        (F.col("doc_id") > cut1) & (F.col("doc_id") <= cut2),
        F.col("doc_id") > cut2,
    ]
    for i, pred in enumerate(preds):
        tmp = f"{out_dir}.part{i}"
        docs.where(pred).coalesce(1).write.mode("overwrite").parquet(tmp)
        for j, p in enumerate(sorted(glob.glob(f"{tmp}/*.parquet"))):
            shutil.copy(p, f"{out_dir}/part-{i:02d}{j:02d}.parquet")
        shutil.rmtree(tmp, ignore_errors=True)
    _stamp_feed_order(out_dir)


def q_streaming_curation_differential(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-visible oracle for the streaming curation funnel (VERDICT
    r6 task 6): drain `streaming/curation.py` over a doc_id-cut file feed
    of the documents table, accumulate per-(source, stage) funnel stats
    sink-side, and emit a one-row summary — total docs, per-stage counts,
    kept-token total, and a flag that the drained stream reproduced the
    batch funnel (`operators/curation.py`) EXACTLY, including every
    duplicate verdict across micro-batch boundaries. The oracle states
    the numbers from the batch funnel SQL alone; the flag is pinned 1.

    Scale: the stateful stage holds one 16-byte first-seen flag per
    distinct fingerprint (evictable via state timeout at 100 TB); all
    stateless gates are the batch funnel's own codegen'd expressions."""
    import os
    import shutil
    import tempfile

    from seo_audit_etl_actor_spark.operators.curation import curation_funnel
    from seo_audit_etl_actor_spark.streaming import curation as sc

    work = tempfile.mkdtemp(prefix="spark_graft_stream_curation_")
    # one cached scan serves the (cache-miss) feed build and the batch
    # twin (r8 verdict task 4 — previously the twin re-scanned the
    # table). The stream side still reads the FEED files, as it must.
    docs = load_table(spark, sf_dir, "documents").persist()
    try:
        feed = _doc_cut_feed_cached(spark, sf_dir, docs=docs)
        verdicts = sc.curate_document_stream(sc.read_document_stream(spark, feed))
        sink, totals = sc.funnel_stats_sink(spark)
        with _drain_partitions(spark):
            q = (
                verdicts.writeStream.foreachBatch(sink)
                .outputMode("append")
                .option("checkpointLocation", os.path.join(work, "ck"))
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()

        batch = {
            (r["source"], r["stage"]): (int(r["n_docs"]), int(r["total_tokens"]))
            for r in curation_funnel(docs).collect()
        }
        got = {k: (v[0], v[1]) for k, v in totals.items()}
        stage_n = {}
        for (_, stage), (n, _t) in got.items():
            stage_n[stage] = stage_n.get(stage, 0) + n
        row = (
            sum(v[0] for v in got.values()),
            stage_n.get("kept", 0),
            stage_n.get("duplicate", 0),
            stage_n.get("lang_filter", 0),
            stage_n.get("too_short", 0),
            stage_n.get("low_quality", 0),
            sum(v[1] for k, v in got.items() if k[1] == "kept"),
            1 if got == batch else 0,
        )
        return spark.createDataFrame(
            [row],
            "n_docs long, n_kept long, n_duplicate long, n_lang_filter long, "
            "n_too_short long, n_low_quality long, kept_tokens long, "
            "stream_equals_batch long",
        )
    finally:
        docs.unpersist()
        shutil.rmtree(work, ignore_errors=True)


def _sql_streaming_curation_differential() -> str:
    from seo_audit_etl_actor_spark.queries.llm_ext import SQL_CURATION_FUNNEL

    return f"""
WITH funnel AS ({SQL_CURATION_FUNNEL})
SELECT CAST(SUM(n_docs) AS BIGINT) AS n_docs,
       CAST(COALESCE(SUM(CASE WHEN stage = 'kept' THEN n_docs END), 0) AS BIGINT) AS n_kept,
       CAST(COALESCE(SUM(CASE WHEN stage = 'duplicate' THEN n_docs END), 0) AS BIGINT) AS n_duplicate,
       CAST(COALESCE(SUM(CASE WHEN stage = 'lang_filter' THEN n_docs END), 0) AS BIGINT) AS n_lang_filter,
       CAST(COALESCE(SUM(CASE WHEN stage = 'too_short' THEN n_docs END), 0) AS BIGINT) AS n_too_short,
       CAST(COALESCE(SUM(CASE WHEN stage = 'low_quality' THEN n_docs END), 0) AS BIGINT) AS n_low_quality,
       CAST(COALESCE(SUM(CASE WHEN stage = 'kept' THEN total_tokens END), 0) AS BIGINT) AS kept_tokens,
       CAST(1 AS BIGINT) AS stream_equals_batch
FROM funnel
"""


SQL_STREAMING_CURATION_DIFFERENTIAL = _sql_streaming_curation_differential()


# ---------------------------------------- heavy-hitters differential (r7)

def q_streaming_heavyhitters_differential(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-visible oracle for the streaming Misra-Gries heavy hitters
    (VERDICT r6 task 6): drain `streaming/heavyhitters.py` over the same
    doc_id-cut feed, then verify the MG guarantee differentially against
    the exact batch token counts IN SPARK (the final summaries are
    O(buckets × k) rows — they join to the exact counts, nothing
    unbounded crosses to the driver):

      - containment: every token with true_count * k > N appears in the
        drained summary (`heavy_covered` = 1);
      - bounds: every summarized token satisfies
        lower ≤ true_count ≤ lower + decrements(bucket) (`bounds_ok` = 1).

    The oracle predicts N, the true-heavy count, and their occurrence sum
    from the batch tokenizer SQL; the two flags are pinned 1. The summary
    CONTENT beyond the guarantee is arrival-order-defined, so it stays out
    of the hashed row — the guarantee, not the sketch, is the contract
    (the approx_distinct_users discipline).

    Scale: state is O(k) longs per bucket forever; buckets give the
    stateful stage its parallelism — the bounded-state discipline an exact
    streaming groupBy(token) cannot offer at 100 TB."""
    import os
    import shutil
    import tempfile

    from seo_audit_etl_actor_spark.operators.text import tokens
    from seo_audit_etl_actor_spark.queries.scale_ext import HH_K
    from seo_audit_etl_actor_spark.streaming import heavyhitters as hh

    work = tempfile.mkdtemp(prefix="spark_graft_stream_hh_")
    # same one-cached-scan trim as the curation differential: the
    # (cache-miss) feed build and the exact-count twin read the persisted
    # frame
    docs = load_table(spark, sf_dir, "documents").persist()
    try:
        feed = _doc_cut_feed_cached(spark, sf_dir, docs=docs)
        summaries = hh.stream_heavy_hitters(
            hh.read_document_stream(spark, feed), HH_K
        )
        sink, latest = hh.summary_sink()
        with _drain_partitions(spark):
            q = (
                summaries.writeStream.foreachBatch(sink)
                .outputMode("append")
                .option("checkpointLocation", os.path.join(work, "ck"))
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()

        summary_rows = [
            (b, tok, int(lower), int(dec))
            for b, toks_ in latest.items()
            for tok, lower, dec in toks_
        ]
        sdf = spark.createDataFrame(
            summary_rows, "bucket int, token string, lower long, decrements long"
        )
        # O(vocab) rows, consumed by four downstream actions (total agg,
        # heavy agg, containment anti-join, bounds join) — persist so the
        # explode+groupBy pass over the corpus runs once
        exact = (
            docs
            .select(F.explode(tokens(F.col("text"))).alias("token"))
            .groupBy("token")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .persist()
        )
        n_total = exact.agg(F.sum("cnt")).first()[0]
        heavy = exact.where(F.col("cnt") * HH_K > F.lit(n_total))
        h = heavy.agg(
            F.count(F.lit(1)).alias("n"), F.sum("cnt").alias("s")
        ).first()
        n_missing = heavy.join(sdf, "token", "left_anti").count()
        n_bound_viol = (
            sdf.join(exact, "token", "left")
            .where(
                F.col("cnt").isNull()
                | (F.col("cnt") < F.col("lower"))
                | (F.col("cnt") > F.col("lower") + F.col("decrements"))
            )
            .count()
        )
        row = (
            int(n_total),
            int(h["n"]),
            int(h["s"] or 0),
            1 if n_missing == 0 else 0,
            1 if n_bound_viol == 0 else 0,
        )
        return spark.createDataFrame(
            [row],
            "total_occurrences long, n_true_heavy long, "
            "sum_heavy_occurrences long, heavy_covered long, bounds_ok long",
        )
    finally:
        docs.unpersist()
        shutil.rmtree(work, ignore_errors=True)


def _sql_streaming_heavyhitters_differential() -> str:
    from seo_audit_etl_actor_spark.queries.llm_ext import _TOKS
    from seo_audit_etl_actor_spark.queries.scale_ext import HH_K

    return f"""
WITH ex AS (SELECT unnest({_TOKS.format(c='text')}) AS token FROM documents),
cf AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt FROM ex GROUP BY token),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM ex)
SELECT (SELECT n FROM tot) AS total_occurrences,
       CAST(COUNT(*) AS BIGINT) AS n_true_heavy,
       CAST(COALESCE(SUM(cnt), 0) AS BIGINT) AS sum_heavy_occurrences,
       CAST(1 AS BIGINT) AS heavy_covered,
       CAST(1 AS BIGINT) AS bounds_ok
FROM cf, tot
WHERE cnt * {HH_K} > n
"""


SQL_STREAMING_HEAVYHITTERS_DIFFERENTIAL = _sql_streaming_heavyhitters_differential()


# ------------------------------------------- native session_window (r9)

SESSIONS_MOD = 4  # deterministic user sample: user_id % 4 == 0


def q_streaming_sessions_differential(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream≡batch differential for the NATIVE session_window operator
    (streaming/events.py::user_sessions) — the one stateful streaming
    surface that had no driver-visible row. The events table is cut into
    an hour-ordered bounded feed (same helper as the anomaly
    differential: ascending event-time micro-batches, zero late data),
    sessionized with `session_window(ts, 30 minutes)` under a 0-second
    watermark in append mode, and drained with availableNow.

    Closure semantics (probed, then pinned here and in the oracle): with
    delay 0 the final watermark is the corpus max(ts), and append mode
    emits exactly the sessions whose window end — last event + gap —
    is <= that watermark. So the expected set is the BATCH sessionize
    (queries/reshape.py, the `sessionize_events` catalog query) filtered
    to session_end + gap <= max(ts): every session but each user's
    never-closed last one near the corpus end. Boundary note: the native
    operator splits on gap >= G ([t, t+G) ranges don't overlap at
    exactly G) while the batch lag-rule splits on gap > G; microsecond
    timestamps make exact-G gaps measure-zero, verified zero at all
    driver SFs.

    stream_equals_batch compares full row tuples (user, start, end,
    n_events, cents-quantized value) — the sums alone could mask
    compensating errors.

    The feed keeps a deterministic user sample (user_id % SESSIONS_MOD
    == 0, same predicate in the oracle): sessionization is per-user, so
    every kept user's history is complete and the operator semantics are
    identical, at a quarter of the state/feed/compare cost — the audit
    is about closure semantics, not corpus coverage. The closure
    predicate's max(ts) is the SAMPLED corpus max, because that is what
    the stream's watermark tracks.

    Scale: session_window state is one open session per active user,
    evicted at watermark; the feed build is two passes over events; the
    collect is the session list (bounded by sampled users × sessions —
    the streaming plan itself is the production shape).
    """
    import datetime
    import os
    import shutil
    import tempfile

    from seo_audit_etl_actor_spark.queries.reshape import SESSION_GAP_MIN, sessionize
    from seo_audit_etl_actor_spark.streaming import events as se

    work = tempfile.mkdtemp(prefix="spark_graft_stream_sessions_")
    try:
        feed = _hour_cut_feed_cached(spark, sf_dir, user_mod=SESSIONS_MOD)
        out: list = []
        with _drain_partitions(spark):
            se.run_to_completion(
                se.user_sessions(
                    se.read_event_stream(spark, feed),
                    gap=f"{SESSION_GAP_MIN} minutes",
                    watermark="0 seconds",
                ),
                out,
                os.path.join(work, "ck"),
                output_mode="append",
            )

        ev = (
            load_table(spark, sf_dir, "events")
            .where(F.col("user_id") % SESSIONS_MOD == 0)
            .select("user_id", "ts", "event_id", "value")
        )
        mx = ev.agg(F.max("ts")).first()[0]
        gap = datetime.timedelta(minutes=SESSION_GAP_MIN)
        closed = [
            r for r in sessionize(ev).collect() if r["session_end"] + gap <= mx
        ]

        def key(user, start, end, n, value):
            return (user, start, end, n, int(round(value * 100)))

        got = sorted(
            key(r["user_id"], r["session_start"], r["session_end"],
                r["n_events"], r["session_value"])
            for r in out
        )
        want = sorted(
            key(r["user_id"], r["session_start"], r["session_end"] + gap,
                r["n_events"], r["session_value"])
            for r in closed
        )
        row = (
            len(got),
            sum(1 for r in got if r[3] > 1),
            int(sum(r[3] for r in got)),
            int(sum(r[4] for r in got)),
            1 if got == want else 0,
        )
        return spark.createDataFrame(
            [row],
            "n_closed_sessions long, n_multi_event_sessions long, "
            "sum_events long, value_cents long, stream_equals_batch long",
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


def _sql_streaming_sessions_differential() -> str:
    from seo_audit_etl_actor_spark.queries.reshape import (
        SESSION_GAP_MIN,
        SQL_SESSIONIZE_EVENTS,
    )

    batch_sampled = SQL_SESSIONIZE_EVENTS.replace(
        "FROM events", f"FROM events WHERE user_id % {SESSIONS_MOD} = 0"
    )
    return f"""
WITH batch AS ({batch_sampled}),
mx AS (SELECT MAX(ts) AS mts FROM events WHERE user_id % {SESSIONS_MOD} = 0),
closed AS (
  SELECT b.* FROM batch b, mx
  WHERE epoch_us(b.session_end) + {SESSION_GAP_MIN} * 60 * 1000000 <= epoch_us(mx.mts)
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_closed_sessions,
       CAST(SUM(CASE WHEN n_events > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_multi_event_sessions,
       CAST(SUM(n_events) AS BIGINT) AS sum_events,
       CAST(SUM(CAST(ROUND(session_value * 100) AS BIGINT)) AS BIGINT) AS value_cents,
       CAST(1 AS BIGINT) AS stream_equals_batch
FROM closed
"""


SQL_STREAMING_SESSIONS_DIFFERENTIAL = _sql_streaming_sessions_differential()


# --------------------------------------- stream-stream interval join (r9)

ATTR_LOOKBACK_MIN = 60


def q_streaming_attribution_differential(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream≡batch differential for the stream-STREAM interval join
    (streaming/events.py::purchase_view_attribution) — §2.9's
    two-unbounded-sides case, previously driver-invisible: each purchase
    inner-joined to the same user's view events in the trailing hour,
    both sides watermarked so buffered state evicts.

    Inner-join emission needs no watermark closure — a pair emits in the
    micro-batch where both sides are present — and the 2-hour watermark
    delay exceeds the 1-hour lookback, so on the hour-ordered feed no
    view is evicted before its last possible purchase arrives. The
    bounded drain therefore emits EXACTLY the batch interval join, with
    no never-closed tail (probed at sf0.01: 40 = 40 pairs; asserted per
    run by stream_equals_batch over full pair tuples).

    The feed keeps the same deterministic user sample as the sessions
    differential (user_id % SESSIONS_MOD == 0, mirrored in the oracle):
    the join key is user_id, so per-user join semantics are complete.

    Scale: state is O(events per lookback window per side) — watermark
    eviction keeps both buffers bounded regardless of corpus size; the
    feed build is two passes; the collect is the attributed-pair list
    (purchases × views within an hour — sparse by construction).
    """
    import os
    import shutil
    import tempfile

    from seo_audit_etl_actor_spark.streaming import events as se

    work = tempfile.mkdtemp(prefix="spark_graft_stream_attr_")
    try:
        feed = _hour_cut_feed_cached(spark, sf_dir, user_mod=SESSIONS_MOD)
        out: list = []
        with _drain_partitions(spark):
            se.run_to_completion(
                se.purchase_view_attribution(
                    se.read_event_stream(spark, feed),
                    watermark="2 hours",
                    lookback=f"{ATTR_LOOKBACK_MIN} minutes",
                ),
                out,
                os.path.join(work, "ck"),
                output_mode="append",
            )

        ev = load_table(spark, sf_dir, "events").where(
            F.col("user_id") % SESSIONS_MOD == 0
        )
        p = ev.where(F.col("event_type") == "purchase").select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("ts").alias("purchase_ts"),
            F.col("value").alias("purchase_value"),
        )
        v = ev.where(F.col("event_type") == "view").select(
            F.col("event_id").alias("view_id"),
            F.col("user_id").alias("vu"),
            F.col("ts").alias("view_ts"),
        )
        batch = (
            p.join(
                v,
                (F.col("user_id") == F.col("vu"))
                & (F.col("view_ts") <= F.col("purchase_ts"))
                & (
                    F.col("view_ts")
                    >= F.col("purchase_ts") - F.expr(f"INTERVAL {ATTR_LOOKBACK_MIN} MINUTES")
                ),
                "inner",
            )
            .drop("vu")
            .collect()
        )

        def key(r):
            return (
                r["purchase_id"],
                r["view_id"],
                r["user_id"],
                r["purchase_ts"],
                r["view_ts"],
                int(round((r["purchase_value"] or 0.0) * 100)),
            )

        got = sorted(key(r) for r in out)
        want = sorted(key(r) for r in batch)
        row = (
            len(got),
            len({r[0] for r in got}),
            len({r[1] for r in got}),
            int(sum(r[5] for r in got)),
            1 if got == want else 0,
        )
        return spark.createDataFrame(
            [row],
            "n_pairs long, n_attributed_purchases long, n_touching_views long, "
            "pair_value_cents long, stream_equals_batch long",
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


def _sql_streaming_attribution_differential() -> str:
    return f"""
WITH ev AS (SELECT * FROM events WHERE user_id % {SESSIONS_MOD} = 0),
p AS (SELECT event_id AS purchase_id, user_id, ts AS purchase_ts, value AS purchase_value
      FROM ev WHERE event_type = 'purchase'),
v AS (SELECT event_id AS view_id, user_id, ts AS view_ts
      FROM ev WHERE event_type = 'view'),
pairs AS (
  SELECT p.purchase_id, v.view_id, p.purchase_value
  FROM p JOIN v ON p.user_id = v.user_id
   AND v.view_ts <= p.purchase_ts
   AND v.view_ts >= p.purchase_ts - INTERVAL {ATTR_LOOKBACK_MIN} MINUTES
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(COUNT(DISTINCT purchase_id) AS BIGINT) AS n_attributed_purchases,
       CAST(COUNT(DISTINCT view_id) AS BIGINT) AS n_touching_views,
       CAST(COALESCE(SUM(CAST(ROUND(purchase_value * 100) AS BIGINT)), 0) AS BIGINT) AS pair_value_cents,
       CAST(1 AS BIGINT) AS stream_equals_batch
FROM pairs
"""


SQL_STREAMING_ATTRIBUTION_DIFFERENTIAL = _sql_streaming_attribution_differential()


# ------------------------- native tumbling windows + streaming dedup (r9)


def q_streaming_hourly_windows_differential(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream≡batch differential for the NATIVE tumbling-window streaming
    aggregation (streaming/events.py::hourly_event_windows — watermarked
    `window(ts, '1 hour')` groupBy, the canonical streaming agg). Same
    harness as the sessions differential: hour-ordered bounded feed,
    0-second watermark, append drain; a tumbling window emits when the
    final watermark (= corpus max ts) passes its END, so the expected set
    is every (hour, event_type) group except those in the corpus's last
    hour. The batch twin is computed with the same expression tree over
    the sampled events; full row tuples are compared (hour, type, count,
    cents-quantized value sum).

    Scale: state is one row per open (hour, type) window, evicted at
    watermark — bounded by cardinality(event_type) regardless of corpus
    size. The feed reuses the user_id % SESSIONS_MOD sample purely to
    share the cheap feed shape (window semantics are row-local; any
    deterministic subset is equally valid, and the oracle applies the
    same predicate).
    """
    import datetime
    import os
    import shutil
    import tempfile

    from seo_audit_etl_actor_spark.streaming import events as se

    work = tempfile.mkdtemp(prefix="spark_graft_stream_hourly_")
    try:
        feed = _hour_cut_feed_cached(spark, sf_dir, user_mod=SESSIONS_MOD)
        out: list = []
        with _drain_partitions(spark):
            se.run_to_completion(
                se.hourly_event_windows(
                    se.read_event_stream(spark, feed), watermark="0 seconds"
                ),
                out,
                os.path.join(work, "ck"),
                output_mode="append",
            )

        ev = load_table(spark, sf_dir, "events").where(
            F.col("user_id") % SESSIONS_MOD == 0
        )
        mx = ev.agg(F.max("ts")).first()[0]
        batch = (
            ev.groupBy(
                F.window(F.col("ts"), "1 hour")["start"].alias("hour"),
                F.col("event_type"),
            )
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.sum(F.col("value").cast("decimal(18,2)"))
                .cast("double")
                .alias("total_value"),
            )
            .collect()
        )
        closed = [
            r for r in batch if r["hour"] + datetime.timedelta(hours=1) <= mx
        ]

        def key(r):
            return (
                r["hour"],
                r["event_type"],
                r["n_events"],
                int(round(r["total_value"] * 100)),
            )

        got = sorted(key(r) for r in out)
        want = sorted(key(r) for r in closed)
        row = (
            len(got),
            len({r[0] for r in got}),
            int(sum(r[2] for r in got)),
            int(sum(r[3] for r in got)),
            1 if got == want else 0,
        )
        return spark.createDataFrame(
            [row],
            "n_closed_windows long, n_hours long, sum_events long, "
            "value_cents long, stream_equals_batch long",
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


def _sql_streaming_hourly_windows_differential() -> str:
    return f"""
WITH ev AS (SELECT * FROM events WHERE user_id % {SESSIONS_MOD} = 0),
mx AS (SELECT MAX(ts) AS mts FROM ev),
win AS (
  SELECT time_bucket(INTERVAL 1 HOUR, ts) AS hour, event_type,
         CAST(COUNT(*) AS BIGINT) AS n_events,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
  FROM ev GROUP BY 1, 2
),
closed AS (
  SELECT w.* FROM win w, mx
  WHERE epoch_us(w.hour) + 3600000000 <= epoch_us(mx.mts)
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_closed_windows,
       CAST(COUNT(DISTINCT hour) AS BIGINT) AS n_hours,
       CAST(SUM(n_events) AS BIGINT) AS sum_events,
       CAST(SUM(CAST(ROUND(total_value * 100) AS BIGINT)) AS BIGINT) AS value_cents,
       CAST(1 AS BIGINT) AS stream_equals_batch
FROM closed
"""


SQL_STREAMING_HOURLY_WINDOWS_DIFFERENTIAL = _sql_streaming_hourly_windows_differential()


def q_streaming_dedup_differential(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream≡batch differential for streaming exact dedup
    (streaming/events.py::dedup_event_stream —
    dropDuplicatesWithinWatermark on event_id, the bounded-state streaming
    twin of the batch exact-dedup family). The corpus has unique
    event_ids, so the feed PLANTS duplicates: every sampled event is
    written twice — once in its hour-cut file and once more in the NEXT
    micro-batch's file (the corpus-last cut duplicates into its own
    file). All replays land well inside the 2-hour watermark of an
    hour-ordered feed, so the stream must emit each event_id exactly
    once; the summary checksums the survivors against the original
    (un-duplicated) sample, which is what the oracle computes from
    parquet.

    Scale: dropDuplicatesWithinWatermark state is the seen-key set per
    watermark window — O(events per 2h), evicted, never O(corpus).
    """
    import glob as _glob
    import os
    import shutil
    import tempfile

    from seo_audit_etl_actor_spark.streaming import events as se

    work = tempfile.mkdtemp(prefix="spark_graft_stream_dedup_")
    feed = os.path.join(work, "feed")
    os.makedirs(feed)
    try:
        # the only differential that MUTATES its feed (planted duplicate
        # files), so it copies the shared cached feed into its own dir —
        # a handful of small-file copies, not a Spark rebuild
        src = _hour_cut_feed_cached(spark, sf_dir, user_mod=SESSIONS_MOD)
        for p in sorted(_glob.glob(os.path.join(src, "part-*.parquet"))):
            shutil.copy(p, os.path.join(feed, os.path.basename(p)))
        # plant one duplicate file per cut and pin arrival order with
        # EXPLICIT mtime stamps (distinct whole seconds): the file source
        # orders by modification time at MILLISECOND granularity, and
        # back-to-back copies all land in the same millisecond — the tie
        # then breaks arbitrarily, a late cut can lead, and the advanced
        # watermark late-drops entire earlier cuts (measured: 858 rows
        # lost). Stamped order is orig0, dup0, orig1, dup1, orig2, dup2,
        # so with maxFilesPerTrigger=1 each duplicate arrives in the
        # micro-batch AFTER its original: rows in the original's 2-hour
        # watermark tail are deduplicated BY STATE, older rows are
        # late-dropped — both exactly-once paths exercised, and every
        # original emits exactly once.
        parts = sorted(_glob.glob(os.path.join(feed, "part-*.parquet")))
        base = os.path.getmtime(parts[0]) - 3600
        for i, p in enumerate(parts):
            dup = os.path.join(feed, f"part-{i:02d}50-dup{i}.parquet")
            shutil.copy(p, dup)
            os.utime(p, (base + 2 * i, base + 2 * i))
            os.utime(dup, (base + 2 * i + 1, base + 2 * i + 1))

        out: list = []
        with _drain_partitions(spark):
            se.run_to_completion(
                se.dedup_event_stream(
                    se.read_event_stream(spark, feed, max_files_per_trigger=1)
                ),
                out,
                os.path.join(work, "ck"),
                output_mode="append",
            )

        ids = [r["event_id"] for r in out]
        # decimal-exact value sum (the engine-portable idiom used by every
        # value checksum here): per-event double rounding would diverge
        # between Python banker's and SQL half-away rounding. Explicit
        # schema: inference would crash on an empty drain (tiny-SF sample)
        val = (
            spark.createDataFrame(out, schema=se.EVENTS_SCHEMA)
            .agg(F.sum(F.col("value").cast("decimal(18,2)")).cast("double"))
            .first()[0]
            or 0.0
        )
        row = (
            len(ids),
            len(set(ids)),
            int(sum(ids)),
            int(round(val * 100)),
        )
        return spark.createDataFrame(
            [row],
            "n_survivors long, n_distinct_ids long, id_checksum long, "
            "value_cents long",
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


def _sql_streaming_dedup_differential() -> str:
    return f"""
SELECT CAST(COUNT(*) AS BIGINT) AS n_survivors,
       CAST(COUNT(DISTINCT event_id) AS BIGINT) AS n_distinct_ids,
       CAST(SUM(event_id) AS BIGINT) AS id_checksum,
       CAST(ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) * 100) AS BIGINT) AS value_cents
FROM events WHERE user_id % {SESSIONS_MOD} = 0
"""


SQL_STREAMING_DEDUP_DIFFERENTIAL = _sql_streaming_dedup_differential()


# ---------------- custom stateful totals + stream-static enrichment (r9)


def q_streaming_running_totals_differential(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream≡batch differential for the CUSTOM stateful operator
    (streaming/events.py::running_user_totals, applyInPandasWithState in
    update mode — cumulative per-user count/value, state that never
    closes). Update mode re-emits a user's running total every
    micro-batch it appears in; after a bounded drain, each user's LAST
    emission is the cumulative total, which must equal the batch groupBy
    over the same sampled events. Counts compare exactly; the value side
    is cents-quantized per user (the operator accumulates Python/pandas
    float64, whose low bits lawfully differ from the batch decimal sum —
    per-user magnitudes here keep float error orders below a cent, and
    the oracle computes the same decimal-exact cents).

    Scale: state is two scalars per user forever (the documented
    trade-off of the never-closing operator); emission is one row per
    (user, micro-batch) — bounded by the drain's batch count.
    """
    import os
    import shutil
    import tempfile

    from seo_audit_etl_actor_spark.streaming import events as se

    work = tempfile.mkdtemp(prefix="spark_graft_stream_running_")
    try:
        feed = _hour_cut_feed_cached(spark, sf_dir, user_mod=SESSIONS_MOD)
        out: list = []
        with _drain_partitions(spark):
            se.run_to_completion(
                se.running_user_totals(se.read_event_stream(spark, feed)),
                out,
                os.path.join(work, "ck"),
                output_mode="update",
            )
        # last emission per user wins: foreachBatch appends in epoch order,
        # so a plain dict overwrite keeps the final cumulative row
        final: dict = {}
        for r in out:
            final[r["user_id"]] = (r["n_events"], r["total_value"])

        ev = load_table(spark, sf_dir, "events").where(
            F.col("user_id") % SESSIONS_MOD == 0
        )
        batch = {
            r["user_id"]: (r["n"], r["v"])
            for r in ev.groupBy("user_id")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("v"),
            )
            .collect()
        }
        same = set(final) == set(batch) and all(
            final[u][0] == batch[u][0]
            and int(round(final[u][1] * 100)) == int(round(batch[u][1] * 100))
            for u in batch
        )
        row = (
            len(final),
            int(sum(n for n, _ in final.values())),
            int(sum(int(round(v * 100)) for _, v in final.values())),
            1 if same else 0,
        )
        return spark.createDataFrame(
            [row],
            "n_users long, sum_events long, value_cents long, "
            "stream_equals_batch long",
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


def _sql_streaming_running_totals_differential() -> str:
    return f"""
WITH per_user AS (
  SELECT user_id, COUNT(*) AS n,
         CAST(ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) * 100) AS BIGINT) AS cents
  FROM events WHERE user_id % {SESSIONS_MOD} = 0 GROUP BY user_id
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(SUM(n) AS BIGINT) AS sum_events,
       CAST(SUM(cents) AS BIGINT) AS value_cents,
       CAST(1 AS BIGINT) AS stream_equals_batch
FROM per_user
"""


SQL_STREAMING_RUNNING_TOTALS_DIFFERENTIAL = _sql_streaming_running_totals_differential()


def q_streaming_enrichment_differential(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream≡batch differential for the stream-STATIC broadcast join
    (streaming/events.py::enrich_with_dimension): each micro-batch of the
    sampled events feed left-joins the customer dimension on user_id =
    c_custkey. Stream-static joins are STATELESS — every batch plans a
    fresh broadcast of the dimension — so the drained union must equal
    the batch left join row-for-row; the summary checksums match counts
    and the joined dimension columns (nation keys, cents-quantized
    balances), which the oracle recomputes relationally.

    Scale: the dimension broadcast is per-trigger and the stream side
    never buffers — the production shape for slowly-changing enrichment;
    a 1000-executor stream pays one small broadcast per trigger.
    """
    import os
    import shutil
    import tempfile

    from seo_audit_etl_actor_spark.streaming import events as se

    work = tempfile.mkdtemp(prefix="spark_graft_stream_enrich_")
    try:
        feed = _hour_cut_feed_cached(spark, sf_dir, user_mod=SESSIONS_MOD)
        dim = load_table(spark, sf_dir, "customer").select(
            F.col("c_custkey").alias("user_id"),
            F.col("c_nationkey").alias("nation"),
            F.col("c_acctbal").alias("acctbal"),
        )
        out: list = []
        with _drain_partitions(spark):
            se.run_to_completion(
                se.enrich_with_dimension(
                    se.read_event_stream(spark, feed), dim
                ).select("event_id", "user_id", "nation", "acctbal"),
                out,
                os.path.join(work, "ck"),
                output_mode="append",
            )
        row = (
            len(out),
            sum(1 for r in out if r["nation"] is not None),
            int(sum(r["nation"] for r in out if r["nation"] is not None)),
            int(
                sum(
                    int(round(r["acctbal"] * 100))
                    for r in out
                    if r["acctbal"] is not None
                )
            ),
        )
        return spark.createDataFrame(
            [row],
            "n_rows long, n_matched long, nation_checksum long, "
            "balance_cents long",
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


def _sql_streaming_enrichment_differential() -> str:
    return f"""
WITH ev AS (SELECT * FROM events WHERE user_id % {SESSIONS_MOD} = 0),
j AS (
  SELECT e.event_id, c.c_nationkey, c.c_acctbal
  FROM ev e LEFT JOIN customer c ON e.user_id = c.c_custkey
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CASE WHEN c_nationkey IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_matched,
       CAST(COALESCE(SUM(c_nationkey), 0) AS BIGINT) AS nation_checksum,
       CAST(COALESCE(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)), 0) AS BIGINT) AS balance_cents
FROM j
"""


SQL_STREAMING_ENRICHMENT_DIFFERENTIAL = _sql_streaming_enrichment_differential()
