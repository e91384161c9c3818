"""Engine-surface relational queries beyond the reference (SURVEY §2.11):
joins, windows, top-k, rollup, set ops, date/time — the reference has none
of these (SURVEY §2.5-§2.8) but the engine exposes them as first-class.

Scale notes inline: dimension joins are explicitly broadcast; every window
has a total-order tiebreaker; money aggregates run decimal-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from seo_audit_etl_actor_spark.session import load_table

DEC = "decimal(18,2)"


def q_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-way star join with broadcast dimensions (SURVEY §2.5).

    lineitem ⋈ orders shuffles on orderkey (the only big-big join);
    customer/nation/region are broadcast so the probe side never reshuffles
    — at 100 TB the fact scan streams through map-side hash joins.
    Revenue is decimal-exact: price × (1-disc) in DECIMAL, summed, then
    cast double.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")

    rev = (F.col("l_extendedprice").cast(DEC) * (F.lit(1.0).cast(DEC) - F.col("l_discount").cast(DEC))).alias("rev")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.sum(rev).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy("r_name", "n_name")
    )


SQL_REVENUE_BY_NATION = """
SELECT r_name, n_name,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1.0 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
ORDER BY r_name, n_name
"""


def q_topk_parts_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 parts per brand by retail price (SURVEY §2.6/§2.7).

    row_number with (price DESC, partkey ASC) — the partkey tiebreaker makes
    the cut deterministic. Spark plans a single shuffle on p_brand with
    partial top-k pushed down via WindowGroupLimit.
    """
    part = load_table(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(
        F.col("p_retailprice").desc(), F.col("p_partkey").asc()
    )
    return (
        part.withColumn("rank_in_brand", F.row_number().over(w))
        .where(F.col("rank_in_brand") <= 3)
        .select("p_brand", "p_partkey", "p_name", "p_retailprice", "rank_in_brand")
        .orderBy("p_brand", "rank_in_brand")
    )


SQL_TOPK_PARTS_PER_BRAND = """
SELECT p_brand, p_partkey, p_name, p_retailprice, rank_in_brand
FROM (
  SELECT p_brand, p_partkey, p_name, p_retailprice,
         CAST(ROW_NUMBER() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey ASC) AS INT) AS rank_in_brand
  FROM part
)
WHERE rank_in_brand <= 3
ORDER BY p_brand, rank_in_brand
"""


def q_rollup_region_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouping-sets rollup over (region, nation) with customer counts and
    decimal-exact balance sums (SURVEY §2.11 grouping sets)."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    joined = cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey).join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    )
    return (
        joined.rollup("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(F.col("c_acctbal").cast(DEC)).cast("double").alias("total_balance"),
        )
        .orderBy(F.col("r_name").asc_nulls_first(), F.col("n_name").asc_nulls_first())
    )


SQL_ROLLUP_REGION_NATION = """
SELECT r_name, n_name,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_balance
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST
"""


def q_running_order_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer running totals + lag (SURVEY §2.6 window surface).

    One shuffle on o_custkey serves both window functions; (o_orderdate,
    o_orderkey) is a total order so the frame is deterministic.
    """
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast(DEC)).over(run).cast("double").alias("running_total"),
        F.lag("o_totalprice", 1).over(w).alias("prev_price"),
        F.row_number().over(w).alias("order_seq"),
    ).orderBy("o_custkey", "order_seq")


SQL_RUNNING_ORDER_TOTALS = """
SELECT o_custkey, o_orderkey,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
            PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total,
       LAG(o_totalprice, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_price,
       CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS INT) AS order_seq
FROM orders
ORDER BY o_custkey, order_seq
"""


def q_set_ops_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operations over key sets (SURVEY §2.8): customers with finished
    ('F') orders INTERSECT / EXCEPT those with open ('O') orders.

    Spark's intersect/exceptAll are hash-based distinct set ops — one
    shuffle each on the key; counts are combined via cheap single-row
    cross joins.
    """
    orders = load_table(spark, sf_dir, "orders")
    f_cust = orders.where(F.col("o_orderstatus") == "F").select("o_custkey")
    o_cust = orders.where(F.col("o_orderstatus") == "O").select("o_custkey")
    both = f_cust.intersect(o_cust).agg(F.count(F.lit(1)).alias("n_both"))
    only_f = f_cust.distinct().exceptAll(o_cust.distinct()).agg(
        F.count(F.lit(1)).alias("n_only_finished")
    )
    union_all = f_cust.union(o_cust).distinct().agg(F.count(F.lit(1)).alias("n_either"))
    return both.crossJoin(only_f).crossJoin(union_all)


SQL_SET_OPS_CUSTOMERS = """
SELECT
  (SELECT CAST(COUNT(*) AS BIGINT) FROM
     (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
      INTERSECT
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')) AS n_both,
  (SELECT CAST(COUNT(*) AS BIGINT) FROM
     (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F'
      EXCEPT
      SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'O')) AS n_only_finished,
  (SELECT CAST(COUNT(*) AS BIGINT) FROM
     (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus IN ('F','O'))) AS n_either
"""


def q_monthly_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar aggregation (SURVEY §2.11 date/time surface): month-truncated
    order counts and decimal-exact revenue. The reference treats dates as
    opaque strings (.actor/actor.json:27-32); the engine gives them types."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy(F.date_trunc("month", F.col("o_orderdate")).alias("month"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast(DEC)).cast("double").alias("revenue"),
        )
        .orderBy("month")
    )


SQL_MONTHLY_ORDER_STATS = """
SELECT CAST(DATE_TRUNC('month', o_orderdate) AS TIMESTAMP) AS month,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM orders
GROUP BY 1
ORDER BY month
"""


def q_hourly_event_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour windows over the event stream, run as batch
    (SURVEY §2.9 — same expressions a readStream would use; the streaming
    variant lives in streaming/events.py)."""
    ev = load_table(spark, sf_dir, "events")
    win = F.window(F.col("ts"), "1 hour")
    return (
        ev.groupBy(win["start"].alias("hour"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("total_value"),
        )
        .orderBy("hour", "event_type")
    )


SQL_HOURLY_EVENT_WINDOWS = """
SELECT CAST(DATE_TRUNC('hour', ts) AS TIMESTAMP) AS hour, event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events
GROUP BY 1, 2
ORDER BY hour, event_type
"""


def q_semi_anti_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi / left-anti joins (SURVEY §2.5 engine surface): customers
    with vs. without finished orders, counted per market segment. Both
    joins shuffle once on the key; the build side deduplicates in the hash
    table — no row multiplication, unlike an inner join."""
    cust = load_table(spark, sf_dir, "customer")
    f_orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderstatus") == "F"
    ).select("o_custkey")
    with_f = (
        cust.join(f_orders, cust.c_custkey == f_orders.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_with_finished"))
    )
    without_f = (
        cust.join(f_orders, cust.c_custkey == f_orders.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_without_finished"))
    )
    return with_f.join(without_f, "c_mktsegment", "full").orderBy("c_mktsegment")


SQL_SEMI_ANTI_CUSTOMERS = """
WITH w AS (
  SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_with_finished
  FROM customer
  WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
  GROUP BY c_mktsegment
),
wo AS (
  SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_without_finished
  FROM customer
  WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
  GROUP BY c_mktsegment
)
SELECT COALESCE(w.c_mktsegment, wo.c_mktsegment) AS c_mktsegment,
       n_with_finished, n_without_finished
FROM w FULL JOIN wo ON w.c_mktsegment = wo.c_mktsegment
ORDER BY c_mktsegment
"""


def q_cube_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (status, priority) (SURVEY §2.11 grouping sets): all four
    grouping-set combinations in one shuffle via the expand operator."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast(DEC)).cast("double").alias("revenue"),
        )
        .orderBy(
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


SQL_CUBE_ORDER_STATS = """
SELECT o_orderstatus, o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST
"""


def q_user_event_deltas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead + inter-event gaps per user (SURVEY §2.6): one shuffle on
    user_id serves all three window functions; (ts, event_id) total order."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.select(
            "user_id",
            "event_id",
            F.col("value"),
            F.lag("value", 1).over(w).alias("prev_value"),
            F.lead("value", 1).over(w).alias("next_value"),
            # integer micros, not float epoch: exact in both engines
            (F.unix_micros("ts") - F.lag(F.unix_micros("ts"), 1).over(w)).alias(
                "micros_since_prev"
            ),
        )
        .where(F.col("user_id") % 10 == 0)
        .orderBy("user_id", "event_id")
    )


SQL_USER_EVENT_DELTAS = """
SELECT user_id, event_id, value, prev_value, next_value, micros_since_prev
FROM (
  SELECT user_id, event_id, value,
         LAG(value, 1)  OVER w AS prev_value,
         LEAD(value, 1) OVER w AS next_value,
         epoch_us(ts) - LAG(epoch_us(ts), 1) OVER w AS micros_since_prev
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
WHERE user_id % 10 = 0
ORDER BY user_id, event_id
"""


def q_price_band_theta_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range/theta join (SURVEY §2.5): parts matched to literal price bands
    on lo <= price < hi. The band side is a broadcast nested-loop — the
    right plan for a non-equi condition with a tiny build side."""
    part = load_table(spark, sf_dir, "part")
    bands = spark.createDataFrame(
        [("budget", 0.0, 910.0), ("mid", 910.0, 1500.0), ("premium", 1500.0, 1e9)],
        "band string, lo double, hi double",
    )
    return (
        part.join(
            F.broadcast(bands),
            (part.p_retailprice >= bands.lo) & (part.p_retailprice < bands.hi),
        )
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            # exact-sum without the decimal adder: retail prices are 2dp, so
            # sum integer cents in a plain BIGINT (long adder, codegen-fast)
            # and divide once — measured 2x faster than the DECIMAL(18,2)
            # accumulate at sf0.1 (r3 regression, diagnosed r4), identical
            # values. Cent sums stay far below 2^63 even at 100 TB.
            F.round(
                F.sum(F.round(F.col("p_retailprice") * 100).cast("bigint"))
                / 100.0
                / F.count(F.lit(1)),
                2,
            ).alias("avg_price"),
        )
        .orderBy("band")
    )


SQL_PRICE_BAND_THETA_JOIN = """
SELECT band, CAST(COUNT(*) AS BIGINT) AS n_parts,
       ROUND(SUM(CAST(ROUND(p_retailprice * 100) AS BIGINT)) / 100.0 / COUNT(*), 2) AS avg_price
FROM part
JOIN (VALUES ('budget', 0.0, 910.0), ('mid', 910.0, 1500.0), ('premium', 1500.0, 1e9))
     AS bands(band, lo, hi)
  ON p_retailprice >= lo AND p_retailprice < hi
GROUP BY band
ORDER BY band
"""


def q_grouping_sets_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (SURVEY §2.11) — the general form rollup/cube
    specialize: per-nation, per-(nation, acctbal-sign), and grand total in
    one expand + one shuffle."""
    sup = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    j = sup.join(F.broadcast(nation), sup.s_nationkey == nation.n_nationkey)
    j.createOrReplaceTempView("__sup_nation")
    return spark.sql(
        """
        SELECT n_name,
               CASE WHEN s_acctbal >= 0 THEN 'pos' ELSE 'neg' END AS bal_sign,
               CAST(COUNT(*) AS BIGINT) AS n_suppliers,
               CAST(SUM(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
        FROM __sup_nation
        GROUP BY GROUPING SETS ((n_name), (n_name, CASE WHEN s_acctbal >= 0 THEN 'pos' ELSE 'neg' END), ())
        ORDER BY n_name ASC NULLS FIRST, bal_sign ASC NULLS FIRST
        """
    )


SQL_GROUPING_SETS_SUPPLIER = """
SELECT n_name,
       CASE WHEN s_acctbal >= 0 THEN 'pos' ELSE 'neg' END AS bal_sign,
       CAST(COUNT(*) AS BIGINT) AS n_suppliers,
       CAST(SUM(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
FROM supplier JOIN nation ON s_nationkey = n_nationkey
GROUP BY GROUPING SETS ((n_name), (n_name, CASE WHEN s_acctbal >= 0 THEN 'pos' ELSE 'neg' END), ())
ORDER BY n_name ASC NULLS FIRST, bal_sign ASC NULLS FIRST
"""


def q_price_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated percentile family per order priority (the engine ALSO
    exposes the reference's nearest-rank form — p75_nearest_rank; this is
    the standard linear-interpolation surface, identical definition in
    Spark `percentile` and DuckDB `quantile_cont`). Rounded to 4dp so both
    engines' float arithmetic hashes identically."""
    orders = load_table(spark, sf_dir, "orders")
    pcts = [0.25, 0.5, 0.75, 0.95]
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            *[
                F.round(F.expr(f"percentile(o_totalprice, {q})"), 4).alias(
                    f"p{int(q * 100)}"
                )
                for q in pcts
            ]
        )
        .orderBy("o_orderpriority")
    )


SQL_PRICE_PERCENTILES = """
SELECT o_orderpriority,
       ROUND(quantile_cont(o_totalprice, 0.25), 4) AS p25,
       ROUND(quantile_cont(o_totalprice, 0.50), 4) AS p50,
       ROUND(quantile_cont(o_totalprice, 0.75), 4) AS p75,
       ROUND(quantile_cont(o_totalprice, 0.95), 4) AS p95
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def q_asof_join_enrichment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (SURVEY §2.5 engine surface): each 'purchase' event
    enriched with the value of the same user's most recent prior-or-equal
    'view' event.

    Union-window technique — tag both streams, union, then
    last(value, ignorenulls) over (user_id ORDER BY ts, is_right) with an
    unbounded-preceding frame. One shuffle on user_id, no range join
    explosion; scales to arbitrarily many right-side rows per key (state is
    one value per row, vs. a range-join's quadratic candidate pairs).
    DuckDB oracle uses its native ASOF LEFT JOIN.
    """
    ev = load_table(spark, sf_dir, "events")
    views = ev.where(F.col("event_type") == "view").select(
        "user_id",
        "ts",
        F.col("value").alias("view_value"),
        F.lit(0).alias("is_left"),
        F.col("event_id").alias("__ord"),
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.lit(None).cast("double").alias("view_value"),
        F.lit(1).alias("is_left"),
        F.col("event_id").alias("__ord"),
        F.col("event_id"),
        F.col("value"),
    )
    merged = views.withColumn("event_id", F.lit(None).cast("long")).withColumn(
        "value", F.lit(None).cast("double")
    ).unionByName(purchases)
    # At equal ts the right-side (view) row sorts first (is_left 0 < 1), so a
    # purchase sees a view with ts <= its own ts — ASOF `>=` semantics.
    # __ord (source event_id) pins a total order among views tied on ts, so
    # last() deterministically picks the max-event_id view — mirrored in the
    # oracle by a pre-dedup CTE keeping that same row per (user_id, ts).
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("is_left").asc(), F.col("__ord").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        merged.withColumn("last_view_value", F.last("view_value", ignorenulls=True).over(w))
        .where(F.col("is_left") == 1)
        .select("event_id", "user_id", "ts", "value", "last_view_value")
        .orderBy("event_id")
    )


SQL_ASOF_JOIN_ENRICHMENT = """
WITH v_dedup AS (
  -- one view per (user_id, ts): keep the max-event_id row, matching the
  -- Spark window's (ts, is_left, event_id) total order among tied views
  SELECT user_id, ts, value
  FROM (SELECT user_id, ts, value,
               ROW_NUMBER() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
        FROM events WHERE event_type = 'view')
  WHERE rn = 1
)
SELECT p.event_id, p.user_id, CAST(p.ts AS TIMESTAMP) AS ts, p.value, v.value AS last_view_value
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN v_dedup v
  ON p.user_id = v.user_id AND p.ts >= v.ts
ORDER BY p.event_id
"""


def q_customer_rank_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window-function breadth (SURVEY §2.6 surface): ntile, percent_rank
    and cume_dist over account balance within each market segment. Ordering
    includes c_custkey so ties are totally ordered — rank families are only
    engine-portable under a total order. One shuffle (hashpartitioning on
    mktsegment); all four windows share it."""
    cust = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").asc(), F.col("c_custkey").asc()
    )
    return (
        cust.select(
            "c_custkey",
            "c_mktsegment",
            "c_acctbal",
            F.ntile(4).over(w).alias("bal_quartile"),
            F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
            F.round(F.cume_dist().over(w), 6).alias("cume"),
        )
        .where(F.col("c_custkey") % 50 == 0)
        .orderBy("c_custkey")
    )


SQL_CUSTOMER_RANK_STATS = """
SELECT c_custkey, c_mktsegment, c_acctbal,
       CAST(ntile(4) OVER w AS INT) AS bal_quartile,
       ROUND(percent_rank() OVER w, 6) AS pct_rank,
       ROUND(cume_dist() OVER w, 6) AS cume
FROM customer
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal ASC, c_custkey ASC)
QUALIFY c_custkey % 50 = 0
ORDER BY c_custkey
"""


def q_trailing_hour_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-TIME range frame (not row frame): per event, the sum/count of
    the same user's events in the trailing hour — RANGE BETWEEN 3600e6
    PRECEDING over INTEGER MICROSECONDS (unix_micros / epoch_us), so both
    engines bound the frame on the exact same integer key; ordering by
    floored whole seconds while the oracle used fractional seconds would
    silently disagree on sub-second neighbors. Ties on the micros key are
    included wholesale by RANGE semantics in both engines — no tiebreak
    needed. Decimal-summed to kill float fold-order drift. One shuffle on
    user_id."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3_600_000_000, Window.currentRow)
    )
    return (
        ev.select(
            "event_id",
            "user_id",
            "ts",
            F.sum(F.col("value").cast("decimal(18,2)")).over(w).cast("double").alias("hour_sum"),
            F.count(F.lit(1)).over(w).alias("hour_n"),
        )
        .where(F.col("event_id") % 20 == 0)
        .orderBy("event_id")
    )


SQL_TRAILING_HOUR_VALUE = """
SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS hour_sum,
       CAST(COUNT(*) OVER w AS BIGINT) AS hour_n
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(CAST(ts AS TIMESTAMP))
             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
QUALIFY event_id % 20 = 0
ORDER BY event_id
"""


def q_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: distribution of customers by order count, INCLUDING
    zero-order customers (left outer join + count of non-null keys — the
    classic outer-join-into-histogram double aggregate). Both aggregations
    shuffle shrinking data: rows → (custkey, cnt) → (cnt, n_customers)."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    per_cust = (
        cust.join(orders, cust["c_custkey"] == orders["o_custkey"], "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return (
        per_cust.groupBy("n_orders")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy(F.col("n_orders").asc())
    )


SQL_ORDER_COUNT_DISTRIBUTION = """
SELECT n_orders, CAST(COUNT(*) AS BIGINT) AS n_customers
FROM (
  SELECT c.c_custkey, CAST(COUNT(o.o_orderkey) AS BIGINT) AS n_orders
  FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
  GROUP BY c.c_custkey
)
GROUP BY n_orders
ORDER BY n_orders ASC
"""


def q_part_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket pair mining: top-20 part pairs co-occurring in the
    same order. Self-join on l_orderkey with p1 < p2 — the candidate space
    is Σ(order_size²), bounded by per-order line counts (~7 max in TPC-H),
    NOT corpus size, so the join explodes per-key only and shuffles on the
    uniform orderkey. distinct-per-order first so duplicate part lines
    can't double-count a pair. Final top-k is TakeOrderedAndProject."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    a, b = li.alias("a"), li.alias("b")
    pairs = a.join(
        b,
        (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("a.l_partkey") < F.col("b.l_partkey")),
    ).select(
        F.col("a.l_partkey").alias("part_a"), F.col("b.l_partkey").alias("part_b")
    )
    return (
        pairs.groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy(F.col("n_orders").desc(), F.col("part_a").asc(), F.col("part_b").asc())
        .limit(20)
    )


SQL_PART_COOCCURRENCE = """
SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
       CAST(COUNT(*) AS BIGINT) AS n_orders
FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) a
JOIN (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) b
  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
GROUP BY part_a, part_b
ORDER BY n_orders DESC, part_a ASC, part_b ASC
LIMIT 20
"""


def q_segment_user_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join (completing the join-type surface): a deterministic
    customer segment (c_custkey % 3 == 0) reconciled against active event
    users — keys in the segment only, active only, or both, rolled up to
    presence-class counts. Both sides pre-aggregate to one row per key
    BEFORE the join (shrink-then-join), and on this corpus all three outer
    branches are non-empty (users ⊂ custkeys; segment ∩ users partial)."""
    seg = (
        load_table(spark, sf_dir, "customer")
        .where(F.col("c_custkey") % 3 == 0)
        .select(F.col("c_custkey").alias("k"))
        .withColumn("in_segment", F.lit(1))
    )
    active = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.col("user_id").alias("k"))
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    j = seg.join(active, "k", "full_outer")
    presence = (
        F.when(F.col("in_segment").isNull(), "active_only")
        .when(F.col("n_events").isNull(), "segment_only")
        .otherwise("both")
    )
    return (
        j.select(presence.alias("presence"), F.coalesce("n_events", F.lit(0)).alias("ne"))
        .groupBy("presence")
        .agg(
            F.count(F.lit(1)).alias("n_keys"),
            F.sum("ne").alias("total_events"),
        )
        .orderBy("presence")
    )


SQL_SEGMENT_USER_RECONCILIATION = """
WITH seg AS (
  SELECT c_custkey AS k, 1 AS in_segment FROM customer WHERE c_custkey % 3 = 0
),
active AS (
  SELECT user_id AS k, CAST(COUNT(*) AS BIGINT) AS n_events FROM events GROUP BY user_id
)
SELECT CASE WHEN in_segment IS NULL THEN 'active_only'
            WHEN n_events IS NULL THEN 'segment_only'
            ELSE 'both' END AS presence,
       CAST(COUNT(*) AS BIGINT) AS n_keys,
       CAST(SUM(COALESCE(n_events, 0)) AS BIGINT) AS total_events
FROM seg FULL OUTER JOIN active USING (k)
GROUP BY presence
ORDER BY presence
"""


def q_tpch_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 (pricing summary report) on the synthetic lineitem: the
    canonical scan-heavy single-pass aggregate — 8 aggregates over 2 group
    keys, everything computed in one map-side-combined pass.

    Determinism: money math in DECIMAL so sums are exact (order-independent
    regardless of partitioning); the derived products stay within
    (22,6) — no precision-loss rounding in either engine — and only the
    final per-group values are cast to double. The date literal is a
    timestamp bound because the synthetic l_shipdate is TIMESTAMP.

    Scale: THE whole-stage-codegen showcase — filter pushed to the parquet
    scan, 2-key hash aggregate with partial aggregation, shuffle carries
    one row per (task, flag, status)."""
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp")
    )
    disc_price = (
        "CAST(l_extendedprice AS DECIMAL(12,2))"
        " * (CAST(1.00 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))"
    )
    charge = f"{disc_price} * (CAST(1.00 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(4,2)))"
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.expr("CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)").alias("sum_qty"),
            F.expr("CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)").alias("sum_base_price"),
            F.expr(f"CAST(SUM({disc_price}) AS DOUBLE)").alias("sum_disc_price"),
            F.expr(f"CAST(SUM({charge}) AS DOUBLE)").alias("sum_charge"),
            F.expr("ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*), 6)").alias("avg_qty"),
            F.expr("ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*), 6)").alias("avg_price"),
            F.expr("ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / COUNT(*), 6)").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


_Q1_DISC_PRICE = (
    "CAST(l_extendedprice AS DECIMAL(12,2))"
    " * (CAST(1.00 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))"
)
_Q1_CHARGE = f"{_Q1_DISC_PRICE} * (CAST(1.00 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(4,2)))"

SQL_TPCH_Q1_PRICING_SUMMARY = f"""
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
       CAST(SUM({_Q1_DISC_PRICE}) AS DOUBLE) AS sum_disc_price,
       CAST(SUM({_Q1_CHARGE}) AS DOUBLE) AS sum_charge,
       ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*), 6) AS avg_qty,
       ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*), 6) AS avg_price,
       ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / COUNT(*), 6) AS avg_disc,
       CAST(COUNT(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def q_tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 (shipping priority) shape: 3-way join with per-side date
    filters, revenue aggregate per order, top 10. The synthetic orders
    table has no o_shippriority, so the projection is (orderkey, revenue,
    orderdate).

    Scale: customer is the small side (broadcast after its segment
    filter); orders⨝lineitem shuffles on the uniform orderkey; the top-10
    is TakeOrderedAndProject (no global sort materialization). Both date
    filters push to the scans."""
    cutoff = F.lit("1998-03-15 00:00:00").cast("timestamp")
    cust = load_table(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").where(F.col("o_orderdate") < cutoff)
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_shipdate") > cutoff)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("l_orderkey", F.col("o_orderdate").cast("date").alias("o_orderdate"))
        .agg(F.expr(f"CAST(SUM({_Q1_DISC_PRICE}) AS DOUBLE)").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


SQL_TPCH_Q3_SHIPPING_PRIORITY = f"""
SELECT l_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate,
       CAST(SUM({_Q1_DISC_PRICE}) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""


def q_tpch_q18_large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 (large-volume customer) shape: find orders whose total
    quantity exceeds a threshold, then attach customer/order attributes.

    The textbook formulation scans lineitem TWICE (HAVING subquery + outer
    re-aggregate). This plan reuses the HAVING aggregate as the output sum
    — one lineitem scan, one shuffle on the uniform l_orderkey, and the
    surviving big orders (<1% of orders after the threshold) broadcast to
    the orders/customer probe, so neither orders nor customer reshuffles.
    At 100 TB the threshold filter runs map-side after partial aggregation
    and AQE's skew-join split covers pathological single-order hot keys.
    Synthetic schema: no o_shippriority/o_clerk; threshold 300 matches the
    data's qty-sum tail (p99 ~265, max ~475).
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast(DEC)).alias("qty_dec"))
        .where(F.col("qty_dec") > 300)
        .select("l_orderkey", F.col("qty_dec").cast("double").alias("total_qty"))
    )
    return (
        orders.join(F.broadcast(big), orders.o_orderkey == big.l_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("o_orderdate"),
            F.col("o_totalprice").cast(DEC).cast("double").alias("o_totalprice"),
            "total_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
        .limit(100)
    )


SQL_TPCH_Q18_LARGE_VOLUME_CUSTOMER = """
SELECT c_name, c_custkey, o_orderkey,
       CAST(o_orderdate AS DATE) AS o_orderdate,
       CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS o_totalprice,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (
  SELECT l_orderkey FROM lineitem
  GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 300
)
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
ORDER BY o_totalprice DESC, o_orderdate ASC, o_orderkey ASC
LIMIT 100
"""


def q_tpch_q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 (suppliers who kept orders waiting) shape: the
    multi-semi-join chain — for each LATE line of a finished order, EXISTS
    another supplier on the same order (semi) and NOT EXISTS another LATE
    supplier on the same order (anti), i.e. the supplier was the sole
    bottleneck. Adapted to the synthetic schema: no
    l_receiptdate/l_commitdate, so "late" = shipped more than 90 days
    after the order date; region filter (nations of region 0) stands in
    for Q21's single-nation filter at this supplier cardinality.

    Scale: SINGLE lineitem scan (r4 rewrite; the textbook semi+anti chain
    re-scanned lineitem 3x — flagged by tools/audit_catalog.py). The
    EXISTS/NOT-EXISTS pair is equivalent to per-order supplier stats: a
    late line is a "sole bottleneck" iff its order has >= 2 distinct
    suppliers (EXISTS another supplier) and exactly 1 distinct LATE
    supplier (NOT EXISTS another late one). Both stats come from
    collect_set windows over the one orderkey shuffle — per-order line
    counts are bounded (<= 7 in TPC-H), so the window sets are O(1).
    supplier⨝nation is a broadcast; final count shuffles ~100 rows.
    """
    orders = load_table(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation").where(F.col("n_regionkey") == 0)

    lines = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        "l_orderkey",
        "l_suppkey",
        (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")).alias("is_late"),
    )
    w = Window.partitionBy("l_orderkey")
    sole_late = (
        lines.withColumn("n_supp", F.size(F.collect_set("l_suppkey").over(w)))
        .withColumn(
            "n_late_supp",
            F.size(
                F.collect_set(
                    F.when(F.col("is_late"), F.col("l_suppkey"))
                ).over(w)
            ),
        )
        .where(F.col("is_late") & (F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1))
        .alias("l1")
    )
    return (
        sole_late.join(
            F.broadcast(sup.join(F.broadcast(nation), sup.s_nationkey == nation.n_nationkey)),
            F.col("l1.l_suppkey") == F.col("s_suppkey"),
        )
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name").asc())
        .limit(100)
    )


SQL_TPCH_Q21_WAITING_SUPPLIER = """
SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM lineitem l1
JOIN orders   ON l1.l_orderkey = o_orderkey
JOIN supplier ON l1.l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE o_orderstatus = 'F'
  AND n_regionkey = 0
  AND l1.l_shipdate > o_orderdate + INTERVAL 90 DAY
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    JOIN orders o2 ON l2.l_orderkey = o2.o_orderkey
    WHERE l2.l_orderkey = l1.l_orderkey
      AND l2.l_suppkey <> l1.l_suppkey
      AND o2.o_orderstatus = 'F'
  )
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    JOIN orders o3 ON l3.l_orderkey = o3.o_orderkey
    WHERE l3.l_orderkey = l1.l_orderkey
      AND l3.l_suppkey <> l1.l_suppkey
      AND o3.o_orderstatus = 'F'
      AND l3.l_shipdate > o3.o_orderdate + INTERVAL 90 DAY
  )
GROUP BY s_name
ORDER BY numwait DESC, s_name ASC
LIMIT 100
"""
