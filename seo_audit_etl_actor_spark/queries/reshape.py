"""Reshape / sessionization / binning queries (SURVEY §2.11 engine surface
beyond the reference — absent from /root/reference, which has no joins,
windows, or pivots; see SURVEY §2.5-§2.8 absence citations).

Determinism discipline for oracle parity: double sums go through
DECIMAL(18,2) so fold order can't perturb low bits; ties in event time are
broken by event_id in BOTH engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from seo_audit_etl_actor_spark.session import load_table

SESSION_GAP_MIN = 30


# ------------------------------------------------------------ sessionization
def q_sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based batch sessionization: a new session starts when a user is
    idle longer than SESSION_GAP_MIN. The batch twin of
    streaming/events.py::user_sessions (native session_window) — same
    semantics, expressed as lag → flag → running-sum session id → groupBy.

    Scale: one shuffle on user_id serves both window passes and the final
    aggregate (Catalyst reuses the hash partitioning); state per row is one
    lag value, so a 100 TB event log sessionizes in a single pass per
    partition — no pairwise expansion.
    """
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id", "value")
    return sessionize(ev)


def sessionize(ev: DataFrame, gap_min: int = SESSION_GAP_MIN) -> DataFrame:
    """Core sessionization over (user_id, ts, event_id, value) rows —
    shared by the catalog query and the property tests."""
    order = [F.col("ts").asc(), F.col("event_id").asc()]
    w = Window.partitionBy("user_id").orderBy(*order)
    prev_ts = F.lag("ts").over(w)
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(prev_ts)
    new_session = F.when(
        prev_ts.isNull() | (gap_us > gap_min * 60 * 1_000_000), 1
    ).otherwise(0)
    run = Window.partitionBy("user_id").orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        ev.withColumn("__sid", F.sum(new_session).over(run))
        .groupBy("user_id", "__sid")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("session_value"),
        )
        .drop("__sid")
        .orderBy("user_id", "session_start")
    )


SQL_SESSIONIZE_EVENTS = f"""
WITH flagged AS (
  SELECT user_id, ts, event_id, value,
         CASE WHEN LAG(ts) OVER w IS NULL
                OR epoch_us(ts) - epoch_us(LAG(ts) OVER w) > {SESSION_GAP_MIN} * 60 * 1000000
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sids AS (
  -- ORDER BY (ts, event_id) mirrors the Spark window's total order; with
  -- ts alone, tied timestamps straddling a session boundary would leave the
  -- running sum's row order unspecified and the hash comparison could flake.
  SELECT user_id, ts, value,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS sid
  FROM flagged
)
SELECT user_id,
       MIN(ts) AS session_start,
       MAX(ts) AS session_end,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS session_value
FROM sids
GROUP BY user_id, sid
ORDER BY user_id, session_start
"""


# ------------------------------------------------------------------- pivot
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
_PRIORITY_ALIAS = {
    "1-URGENT": "n_urgent",
    "2-HIGH": "n_high",
    "3-MEDIUM": "n_medium",
    "4-NOT SPECIFIED": "n_notspec",
    "5-LOW": "n_low",
}


def q_pivot_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: order counts as a status × priority matrix. Explicit pivot
    values keep the output schema static (no extra distinct-values job, and
    the plan is a single-pass conditional aggregate — same shape Catalyst
    emits for hand-written sum(when(...)), so 100 TB cost is one shuffle of
    5 longs per status)."""
    orders = load_table(spark, sf_dir, "orders")
    piv = (
        orders.groupBy("o_orderstatus")
        .pivot("o_orderpriority", PRIORITIES)
        .agg(F.count(F.lit(1)))
    )
    return piv.select(
        "o_orderstatus",
        *[
            F.coalesce(F.col(f"`{p}`"), F.lit(0)).alias(_PRIORITY_ALIAS[p])
            for p in PRIORITIES
        ],
    ).orderBy("o_orderstatus")


SQL_PIVOT_STATUS_PRIORITY = """
SELECT o_orderstatus,
       CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS n_urgent,
       CAST(SUM(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 ELSE 0 END) AS BIGINT) AS n_high,
       CAST(SUM(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 ELSE 0 END) AS BIGINT) AS n_medium,
       CAST(SUM(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 1 ELSE 0 END) AS BIGINT) AS n_notspec,
       CAST(SUM(CASE WHEN o_orderpriority = '5-LOW' THEN 1 ELSE 0 END) AS BIGINT) AS n_low
FROM orders
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


# ----------------------------------------------------------------- unpivot
_MELT_METRICS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


def q_unpivot_lineitem_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (wide → long) then per-metric profile — the melt operator of
    a feature-stats pipeline. Spark's native `unpivot` expands rows
    map-side (no shuffle until the 4-group aggregate); the decimal-summed
    mean is fold-order-proof."""
    li = load_table(spark, sf_dir, "lineitem")
    long = li.unpivot(
        ids=[], values=_MELT_METRICS, variableColumnName="metric", valueColumnName="val"
    )
    dec_sum = F.sum(F.col("val").cast("decimal(18,2)"))
    return (
        long.groupBy("metric")
        .agg(
            F.count("val").alias("n"),
            F.min("val").alias("min_val"),
            F.max("val").alias("max_val"),
            (dec_sum.cast("double") / F.count("val")).alias("mean_val"),
        )
        .withColumn("mean_val", F.round("mean_val", 4))
        .orderBy("metric")
    )


SQL_UNPIVOT_LINEITEM_METRICS = """
WITH long AS (
  SELECT 'l_quantity' AS metric, l_quantity AS val FROM lineitem
  UNION ALL SELECT 'l_extendedprice', l_extendedprice FROM lineitem
  UNION ALL SELECT 'l_discount', l_discount FROM lineitem
  UNION ALL SELECT 'l_tax', l_tax FROM lineitem
)
SELECT metric,
       CAST(COUNT(val) AS BIGINT) AS n,
       MIN(val) AS min_val,
       MAX(val) AS max_val,
       ROUND(CAST(SUM(CAST(val AS DECIMAL(18,2))) AS DOUBLE) / COUNT(val), 4) AS mean_val
FROM long
GROUP BY metric
ORDER BY metric
"""


# --------------------------------------------------------------- histogram
BUCKET_WIDTH = 5000.0


def q_price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram over l_extendedprice: bucket = floor(x / w).
    Pure map-side arithmetic + one aggregate — the distributed histogram
    primitive (at 100 TB: one shuffle of n_buckets rows; never a sort)."""
    li = load_table(spark, sf_dir, "lineitem")
    bucket = F.floor(F.col("l_extendedprice") / F.lit(BUCKET_WIDTH)).cast("long")
    return (
        li.where(F.col("l_extendedprice").isNotNull())
        .groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(
                F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double"), 2
            ).alias("total_price"),
        )
        .withColumn("bucket_lo", (F.col("bucket") * BUCKET_WIDTH))
        .select("bucket", "bucket_lo", "n_items", "total_price")
        .orderBy("bucket")
    )


SQL_PRICE_HISTOGRAM = f"""
SELECT CAST(FLOOR(l_extendedprice / {BUCKET_WIDTH}) AS BIGINT) AS bucket,
       CAST(CAST(FLOOR(l_extendedprice / {BUCKET_WIDTH}) AS BIGINT) * {BUCKET_WIDTH} AS DOUBLE) AS bucket_lo,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS total_price
FROM lineitem
WHERE l_extendedprice IS NOT NULL
GROUP BY 1
ORDER BY bucket
"""


# ------------------------------------------- decorrelated scalar subquery
def q_above_nation_avg_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers above their own nation's average balance — the classic
    correlated scalar subquery, decorrelated by hand into aggregate +
    broadcast join (exactly Catalyst's rewrite; the per-nation aggregate is
    25 rows, so the fact side never shuffles at any scale).

    The per-nation mean is decimal-summed (fold-order-proof) so the `>`
    comparison is bit-identical across engines.
    """
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    nav = cust.groupBy("c_nationkey").agg(
        (
            F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double")
            / F.count(F.lit(1))
        ).alias("nation_avg")
    )
    return (
        cust.join(F.broadcast(nav), "c_nationkey")
        .where(F.col("c_acctbal") > F.col("nation_avg"))
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_above"),
            # no ROUND here: Spark rounds the double's shortest-string form
            # (HALF_UP on "4472.355") while DuckDB rounds the binary value —
            # they disagree exactly at 2dp halfway points. The raw doubles
            # are bit-identical across engines (same IEEE ops), so emit raw.
            F.max(F.col("c_acctbal") - F.col("nation_avg")).alias("max_excess"),
        )
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("n_name", "n_above", "max_excess")
        .orderBy("n_name")
    )


SQL_ABOVE_NATION_AVG_BALANCE = """
WITH nav AS (
  SELECT c_nationkey,
         CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS nation_avg
  FROM customer GROUP BY c_nationkey
)
SELECT n.n_name,
       CAST(COUNT(*) AS BIGINT) AS n_above,
       MAX(c.c_acctbal - nav.nation_avg) AS max_excess
FROM customer c
JOIN nav ON c.c_nationkey = nav.c_nationkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE c.c_acctbal > nav.nation_avg
GROUP BY n.n_name
ORDER BY n.n_name
"""


# ------------------------------------------------------------- range join
# Ten fixed 3-day promo windows over the events month (Jan 2024) — a
# dimension-sized interval table, declared identically in both engines.
PROMO_WINDOWS = [
    (i, f"2024-01-{3 * i + 1:02d} 00:00:00", f"2024-01-{3 * i + 4:02d} 00:00:00")
    for i in range(10)
]


def q_event_promo_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-interval range join (operators/rangejoin.py): events
    assigned to overlapping promo windows via the bin-bucketed equi-join
    (day bins ≈ interval span / 3), then per-window totals. The DuckDB
    oracle uses the naive BETWEEN join — same pairs, different plan."""
    from seo_audit_etl_actor_spark.operators.rangejoin import range_join_binned

    ev = load_table(spark, sf_dir, "events").select("event_id", "ts", "value")
    # literal timestamps: one createDataFrame with string casts keeps the
    # driver-side table tiny and the values byte-identical to the oracle's
    intervals = spark.createDataFrame(
        PROMO_WINDOWS, ["window_id", "w_start", "w_end"]
    ).select(
        "window_id",
        F.col("w_start").cast("timestamp").alias("w_start"),
        F.col("w_end").cast("timestamp").alias("w_end"),
    )
    joined = range_join_binned(ev, intervals, "ts", "w_start", "w_end")
    return (
        joined.groupBy("window_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
        .orderBy("window_id")
    )


SQL_EVENT_PROMO_WINDOWS = (
    "WITH windows(window_id, w_start, w_end) AS (VALUES "
    + ", ".join(
        f"({w}, TIMESTAMP '{s}', TIMESTAMP '{e}')" for w, s, e in PROMO_WINDOWS
    )
    + """)
SELECT window_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events e
JOIN windows w ON e.ts >= w.w_start AND e.ts < w.w_end
GROUP BY window_id
ORDER BY window_id
"""
)
