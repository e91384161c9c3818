"""Event-analytics queries, round 3: ordered conversion funnel, weekly
retention cohorts, event-transition matrix, and semi-structured JSON
property extraction. Extension surface beyond the reference (whose only
event handling is flat scalar stanzas, src/etl.js:93-454) — the product
analytics a clickstream warehouse runs on the `events` table.

Determinism discipline: outputs are integer counts, data values, or a
fixed sequence of IEEE double ops over exact integers — every query
hash-matches its DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from seo_audit_etl_actor_spark.session import load_table

# ------------------------------------------------------------ conversion funnel
FUNNEL_STEPS = ("view", "click", "purchase")


def q_conversion_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel: a user reaches step k only with an event
    of step k's type STRICTLY AFTER their step-(k-1) timestamp — the
    sequenced funnel (view → click-after-view → purchase-after-click), not
    the unordered "did all three" intersection.

    Scale: all three step timestamps are unbounded MIN windows over the
    SAME user_id partitioning, so Catalyst plans ONE exchange and chains
    the window stages on it; the per-user rollup reuses that partitioning
    (groupBy user_id on hashpartitioning(user_id) adds no exchange), and
    the final global aggregate is a single partial-agg row per task."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    w = Window.partitionBy("user_id")
    t1 = F.min(F.when(F.col("event_type") == FUNNEL_STEPS[0], F.col("ts"))).over(w)
    d1 = ev.withColumn("t1", t1)
    t2 = F.min(
        F.when(
            (F.col("event_type") == FUNNEL_STEPS[1]) & (F.col("ts") > F.col("t1")),
            F.col("ts"),
        )
    ).over(w)
    d2 = d1.withColumn("t2", t2)
    t3 = F.min(
        F.when(
            (F.col("event_type") == FUNNEL_STEPS[2]) & (F.col("ts") > F.col("t2")),
            F.col("ts"),
        )
    ).over(w)
    per_user = (
        d2.withColumn("t3", t3)
        .groupBy("user_id")
        .agg(F.max("t1").alias("t1"), F.max("t2").alias("t2"), F.max("t3").alias("t3"))
    )
    return per_user.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum(F.when(F.col("t1").isNotNull(), 1).otherwise(0)).cast("long").alias("step_view"),
        F.sum(F.when(F.col("t2").isNotNull(), 1).otherwise(0)).cast("long").alias("step_click"),
        F.sum(F.when(F.col("t3").isNotNull(), 1).otherwise(0)).cast("long").alias("step_purchase"),
        F.round(
            F.try_divide(
                F.sum(F.when(F.col("t3").isNotNull(), 1).otherwise(0)),
                F.sum(F.when(F.col("t1").isNotNull(), 1).otherwise(0)),
            ),
            6,
        ).alias("view_to_purchase_rate"),
    )


SQL_CONVERSION_FUNNEL = """
WITH s1 AS (
  SELECT user_id, event_type, ts,
         MIN(CASE WHEN event_type = 'view' THEN ts END)
             OVER (PARTITION BY user_id) AS t1
  FROM events
),
s2 AS (
  SELECT *, MIN(CASE WHEN event_type = 'click' AND ts > t1 THEN ts END)
            OVER (PARTITION BY user_id) AS t2
  FROM s1
),
s3 AS (
  SELECT *, MIN(CASE WHEN event_type = 'purchase' AND ts > t2 THEN ts END)
            OVER (PARTITION BY user_id) AS t3
  FROM s2
),
pu AS (
  SELECT user_id, MAX(t1) AS t1, MAX(t2) AS t2, MAX(t3) AS t3
  FROM s3 GROUP BY user_id
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(SUM(CASE WHEN t1 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS step_view,
       CAST(SUM(CASE WHEN t2 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS step_click,
       CAST(SUM(CASE WHEN t3 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS step_purchase,
       ROUND(SUM(CASE WHEN t3 IS NOT NULL THEN 1 ELSE 0 END)
             / SUM(CASE WHEN t1 IS NOT NULL THEN 1 ELSE 0 END), 6)
           AS view_to_purchase_rate
FROM pu
"""


# -------------------------------------------------------- retention cohorts
def q_weekly_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention triangle: users are cohorted by their first active
    epoch-week (days-since-1970 // 7 — engine-portable, no week-start
    convention), and each (cohort_week, week_offset) cell counts users from
    that cohort active offset weeks later.

    Scale: distinct (user, week) first — that collapses the event volume to
    at most users×weeks rows before any window; the cohort MIN rides a
    user_id window, and the final cell aggregate shuffles tiny rows. All
    keys uniform."""
    ev = load_table(spark, sf_dir, "events")
    week = F.floor(
        F.datediff(F.col("ts").cast("date"), F.to_date(F.lit("1970-01-01"))) / 7
    ).cast("long")
    pw = ev.select("user_id", week.alias("week")).distinct()
    cohort = F.min("week").over(Window.partitionBy("user_id"))
    return (
        pw.withColumn("cohort_week", cohort)
        .groupBy("cohort_week", (F.col("week") - F.col("cohort_week")).alias("week_offset"))
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("cohort_week", "week_offset")
    )


SQL_WEEKLY_RETENTION_COHORTS = """
WITH pw AS (
  SELECT DISTINCT user_id,
         CAST(floor(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) / 7)
              AS BIGINT) AS week
  FROM events
),
c AS (
  SELECT user_id, week, MIN(week) OVER (PARTITION BY user_id) AS cohort_week
  FROM pw
)
SELECT cohort_week, week - cohort_week AS week_offset,
       CAST(COUNT(*) AS BIGINT) AS n_users
FROM c
GROUP BY cohort_week, week_offset
ORDER BY cohort_week, week_offset
"""


# ------------------------------------------------------ transition matrix
def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event-type transition matrix (Markov bigram counts): for
    each user's (ts, event_id)-ordered stream, count type→next_type pairs.
    The session-path-mining primitive.

    Scale: one shuffle on user_id for the LEAD window; the pair aggregate
    is over ≤ |types|² keys, fully map-side-combined."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = F.lead("event_type").over(w)
    return (
        ev.select(F.col("event_type").alias("from_type"), nxt.alias("to_type"))
        .where(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("n_transitions"))
        .orderBy(F.col("n_transitions").desc(), "from_type", "to_type")
    )


SQL_EVENT_TRANSITIONS = """
WITH seq AS (
  SELECT event_type AS from_type,
         LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
             AS to_type
  FROM events
)
SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n_transitions
FROM seq
WHERE to_type IS NOT NULL
GROUP BY from_type, to_type
ORDER BY n_transitions DESC, from_type, to_type
"""


# ------------------------------------------------------ JSON props extraction
JSON_K_THRESHOLD = 50


def q_json_props_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-on-read over the semi-structured `props` JSON column:
    extract `$.k`, roll up per event_type. The engine's answer to
    "my payload is a JSON string" — extraction stays a native expression
    (`get_json_object`, codegen'd JSON path over UTF-8), never a Python
    UDF, so the 100 TB scan cost is the scan.

    Scale: pure map-side extract + one tiny-key aggregate."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.when(F.col("k").isNotNull(), 1).otherwise(0)).cast("long").alias("n_with_k"),
            F.sum("k").cast("long").alias("sum_k"),
            F.max("k").alias("max_k"),
            F.sum(F.when(F.col("k") > JSON_K_THRESHOLD, 1).otherwise(0))
            .cast("long")
            .alias(f"n_k_over_{JSON_K_THRESHOLD}"),
            F.round(
                F.try_divide(
                    F.sum("k"), F.sum(F.when(F.col("k").isNotNull(), 1).otherwise(0))
                ),
                6,
            ).alias("avg_k"),
        )
        .orderBy("event_type")
    )


SQL_JSON_PROPS_STATS = f"""
WITH x AS (
  SELECT event_type, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
  FROM events
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CASE WHEN k IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_with_k,
       CAST(SUM(k) AS BIGINT) AS sum_k,
       MAX(k) AS max_k,
       CAST(SUM(CASE WHEN k > {JSON_K_THRESHOLD} THEN 1 ELSE 0 END) AS BIGINT)
           AS n_k_over_{JSON_K_THRESHOLD},
       ROUND(SUM(k) / SUM(CASE WHEN k IS NOT NULL THEN 1 ELSE 0 END), 6) AS avg_k
FROM x
GROUP BY event_type
ORDER BY event_type
"""


# ------------------------------------------------------- rate anomaly scan
ANOM_TRAIL = 24  # trailing hours in the baseline window
ANOM_MIN_BASELINE = 12  # minimum trailing rows before scoring
ANOM_Z = 3.0


def q_event_rate_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monitoring primitive: per-type hourly event counts z-scored against
    the TRAILING 24 observed hours (rows-frame, so gaps don't stall the
    baseline), flagging |z| > 3. The streaming twin would maintain the
    same two running sums in state.

    Determinism: the baseline moments are integer sums over integer hourly
    counts (order-independent); z is one closed-form double expression,
    rounded. Hours with a short (<12-row) or zero-variance baseline are
    excluded rather than emitted as NULLs.

    Scale: one shuffle for the hourly aggregate, one for the per-type
    window — and event_type is low-cardinality, so at 100 TB the window
    input is already tiny (types × hours rows)."""
    ev = load_table(spark, sf_dir, "events")
    hour_id = F.floor(F.unix_micros("ts") / F.lit(3_600_000_000)).cast("long")
    hourly = ev.groupBy("event_type", hour_id.alias("hour_id")).agg(
        F.count(F.lit(1)).alias("n_events")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour_id")
        .rowsBetween(-ANOM_TRAIL, -1)
    )
    scored = hourly.select(
        "event_type",
        "hour_id",
        "n_events",
        F.count(F.lit(1)).over(w).alias("c"),
        F.sum("n_events").over(w).alias("s1"),
        F.sum(F.col("n_events") * F.col("n_events")).over(w).alias("s2"),
    )
    c, s1, s2 = "CAST(c AS DOUBLE)", "CAST(s1 AS DOUBLE)", "CAST(s2 AS DOUBLE)"
    var = f"(({c} * {s2} - {s1} * {s1}) / ({c} * ({c} - 1)))"
    z = f"(CAST(n_events AS DOUBLE) - {s1} / {c}) / sqrt({var})"
    return (
        scored.where(
            (F.col("c") >= ANOM_MIN_BASELINE)
            & (F.expr(f"{c} * {s2} - {s1} * {s1}") > 0)
        )
        .select(
            "event_type",
            "hour_id",
            "n_events",
            F.expr(f"ROUND({s1} / {c}, 6)").alias("baseline_mean"),
            F.expr(f"ROUND({z}, 6)").alias("z_score"),
            F.expr(f"ABS({z}) > {ANOM_Z}").alias("is_anomaly"),
        )
        .orderBy("event_type", "hour_id")
    )


_AC, _AS1, _AS2 = "CAST(c AS DOUBLE)", "CAST(s1 AS DOUBLE)", "CAST(s2 AS DOUBLE)"
_AVAR = f"(({_AC} * {_AS2} - {_AS1} * {_AS1}) / ({_AC} * ({_AC} - 1)))"
_AZ = f"(CAST(n_events AS DOUBLE) - {_AS1} / {_AC}) / sqrt({_AVAR})"

SQL_EVENT_RATE_ANOMALIES = f"""
WITH hourly AS (
  SELECT event_type,
         CAST(floor(epoch_us(ts) / 3600000000) AS BIGINT) AS hour_id,
         CAST(COUNT(*) AS BIGINT) AS n_events
  FROM events
  GROUP BY event_type, hour_id
),
scored AS (
  SELECT event_type, hour_id, n_events,
         COUNT(*) OVER w AS c,
         SUM(n_events) OVER w AS s1,
         SUM(n_events * n_events) OVER w AS s2
  FROM hourly
  WINDOW w AS (PARTITION BY event_type ORDER BY hour_id
               ROWS BETWEEN {ANOM_TRAIL} PRECEDING AND 1 PRECEDING)
)
SELECT event_type, hour_id, n_events,
       ROUND({_AS1} / {_AC}, 6) AS baseline_mean,
       ROUND({_AZ}, 6) AS z_score,
       ABS({_AZ}) > {ANOM_Z} AS is_anomaly
FROM scored
WHERE c >= {ANOM_MIN_BASELINE} AND {_AC} * {_AS2} - {_AS1} * {_AS1} > 0
ORDER BY event_type, hour_id
"""


# ----------------------------------------------------------- hourly gap fill
def q_gap_fill_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resampling with carry-forward interpolation (the
    hypertable `time_bucket_gapfill` + `locf` shape): per event type, a
    complete hour spine from the type's first to last observed hour, the
    observed hourly count left-joined on, and gaps filled with the last
    observed value (LAST_VALUE ... IGNORE NULLS over an expanding frame).

    Scale: the spine is generated from a 1-row-per-type aggregate
    (sequence+explode — rows materialize AFTER the aggregate, so the
    expensive input is never widened); the spine⨝hourly join and the fill
    window share the same keys; everything shuffled is (type, hour, count).
    """
    ev = load_table(spark, sf_dir, "events")
    hour_id = F.floor(F.unix_micros("ts") / F.lit(3_600_000_000)).cast("long")
    hourly = ev.groupBy("event_type", hour_id.alias("hour_id")).agg(
        F.count(F.lit(1)).alias("n_observed")
    )
    spine = (
        hourly.groupBy("event_type")
        .agg(F.min("hour_id").alias("lo"), F.max("hour_id").alias("hi"))
        .select(
            "event_type",
            F.explode(F.sequence(F.col("lo"), F.col("hi"))).alias("hour_id"),
        )
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        spine.join(hourly, ["event_type", "hour_id"], "left")
        .select(
            "event_type",
            "hour_id",
            "n_observed",
            F.last("n_observed", ignorenulls=True).over(w).alias("n_filled"),
            F.col("n_observed").isNull().alias("is_gap"),
        )
        .orderBy("event_type", "hour_id")
    )


SQL_GAP_FILL_HOURLY = """
WITH hourly AS (
  SELECT event_type,
         CAST(floor(epoch_us(ts) / 3600000000) AS BIGINT) AS hour_id,
         CAST(COUNT(*) AS BIGINT) AS n_observed
  FROM events
  GROUP BY event_type, hour_id
),
spine AS (
  SELECT event_type, unnest(generate_series(lo, hi)) AS hour_id
  FROM (SELECT event_type, MIN(hour_id) AS lo, MAX(hour_id) AS hi
        FROM hourly GROUP BY event_type)
)
SELECT s.event_type, s.hour_id, h.n_observed,
       LAST_VALUE(h.n_observed IGNORE NULLS)
           OVER (PARTITION BY s.event_type ORDER BY s.hour_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_filled,
       h.n_observed IS NULL AS is_gap
FROM spine s LEFT JOIN hourly h USING (event_type, hour_id)
ORDER BY event_type, hour_id
"""


# ------------------------------------------------------ time-bounded dedup
DEDUP_WINDOW_S = 300


def q_dedup_within_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-bounded duplicate detection: an event is a duplicate if the
    SAME (user, type) occurred within the preceding 300 s — the batch twin
    of the streaming dedup-within-watermark operator
    (streaming/events.py), giving that semantics a hash-matched oracle.

    Scale: one LAG window on the (user, type) partitioning, then a
    tiny-key rollup; duplicate state never exceeds one timestamp per
    partition row."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    gap_us = F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)
    return (
        ev.select(
            "event_type",
            (gap_us <= DEDUP_WINDOW_S * 1_000_000).alias("is_dup"),
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.when(F.col("is_dup"), 1).otherwise(0)).cast("long").alias("n_dups"),
            F.round(
                F.sum(F.when(F.col("is_dup"), 1).otherwise(0)) / F.count(F.lit(1)), 6
            ).alias("dup_ratio"),
        )
        .orderBy("event_type")
    )


SQL_DEDUP_WITHIN_WINDOW = f"""
WITH flagged AS (
  SELECT event_type,
         epoch_us(ts) - LAG(epoch_us(ts))
             OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id)
             <= {DEDUP_WINDOW_S * 1_000_000} AS is_dup
  FROM events
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CASE WHEN is_dup THEN 1 ELSE 0 END) AS BIGINT) AS n_dups,
       ROUND(SUM(CASE WHEN is_dup THEN 1 ELSE 0 END) / COUNT(*), 6) AS dup_ratio
FROM flagged
GROUP BY event_type
ORDER BY event_type
"""


# ------------------------------------------ grouped-map EWMA (r9)

EWMA_ALPHA = 0.3
_EWMA_Q = 10_000  # quantum chosen so recurrence-vs-closed-form float noise
# (~1e-10 abs on these magnitudes) cannot straddle a rounding boundary


def q_user_ewma_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver row for the batch grouped-map recurrence path
    (operators/grouped.py::ewma_per_user, applyInPandas — SURVEY §2.10's
    "genuinely recursive per-group semantics" case, previously validated
    only by tests/test_grouped.py): per-user FINAL EWMA of event values
    ordered by (ts, event_id), plus the series length.

    Oracle parity: the operator computes the recurrence
    s_i = α·x_i + (1−α)·s_{i−1} (s_1 = x_1); the oracle evaluates the
    closed form (1−α)^(n−1)·x_1 + Σ_{i≥2} α(1−α)^(n−i)·x_i, which is the
    same value through a DIFFERENT float evaluation order — so the
    comparison quantizes to 1e-4 (noise is ~1e-10 on these magnitudes;
    the quantum keeps ten-thousandths meaningful while making a boundary
    straddle impossible). The closed form is O(n²)-as-SQL and underflows
    for long series — exactly why the engine runs the recurrence — but
    it is a fine ORACLE at driver scale.

    Scale: one shuffle on user_id; one Arrow batch per user; the final
    row per user falls out of max_by without a second window pass.
    """
    from seo_audit_etl_actor_spark.operators.grouped import ewma_per_user

    # NULL values are excluded IDENTICALLY on both sides (see WHERE in the
    # oracle): the operator intentionally poisons a user's series to NaN
    # after a null (operators/grouped.py), while SQL SUM would silently
    # skip the null term — without this filter the two sides would only
    # agree on a null-free corpus by luck
    ev = load_table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    ew = ewma_per_user(ev, alpha=EWMA_ALPHA)
    return (
        ew.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(
                F.max_by("ewma", F.struct("ts", "event_id")) * _EWMA_Q, 0
            )
            .cast("long")
            .alias("ewma_q"),
        )
        .orderBy("user_id")
    )


SQL_USER_EWMA_PROFILE = f"""
WITH ordered AS (
  SELECT user_id, value,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
         COUNT(*) OVER (PARTITION BY user_id) AS n
  FROM events
  WHERE value IS NOT NULL
)
SELECT user_id,
       CAST(MAX(n) AS BIGINT) AS n_events,
       CAST(ROUND(SUM(value * CASE WHEN rn = 1 THEN POWER({1 - EWMA_ALPHA}, n - 1)
                                   ELSE {EWMA_ALPHA} * POWER({1 - EWMA_ALPHA}, n - rn)
                              END) * {_EWMA_Q}) AS BIGINT) AS ewma_q
FROM ordered
GROUP BY user_id
ORDER BY user_id
"""
