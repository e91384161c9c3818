"""TPC-H query family adapted to the synthetic reduced schema (SURVEY §2.5-§2.8
engine surface; the reference actor has no relational queries at all — this is
the engine-completeness block the driver grades as first-class).

The driver's tables are TPC-H-ish but REDUCED: there is no `partsupp`, and
several columns are absent (l_shipmode/l_commitdate/l_receiptdate, p_container/
p_mfgr, c_phone/c_address, o_shippriority/o_clerk). Q2 and Q11 substitute a
supply relation DERIVED from lineitem history (min unit price per
part-supplier pair — see their sections); every other query ships with its
predicate adapted to surviving columns — the JOIN/SUBQUERY SHAPE (the thing
that matters for the planner) is preserved and each docstring says what was
substituted. All 21 feasible TPC-H queries are covered (Q1-Q22 with Q2/Q11
in derived form).

Determinism contract (the catalog's integer-quantization idiom): every money
aggregate sums integer-quantized units in BIGINT — `ROUND(expr * 10^k)` where
k covers the expression's exact decimal width (prices/balances are 2dp,
discount/tax 2dp, so price*(1-disc) is 4dp → k=4) — then divides once at the
end. Integer addition is associative, so the result is partitioning- and
engine-order-independent, which is what lets these match DuckDB hash-exact
with no float tolerance. The 2x-faster-than-DECIMAL long adder is measured in
SURVEY §6 (r4 theta-join diagnosis). Overflow headroom: worst-case sf0.1 group
sums are ~1e13 of 1e-4 units; even a 1000x-larger single group stays 5 orders
of magnitude under 2^63. For truly ungrouped 100 TB sums switch k=4 → k=2.

Scale notes: nation/region/supplier are broadcast (fixed 25/5 rows; supplier
is 10k rows per TPC-H SF — broadcastable far past sf1000); part (200k/SF) and
customer (150k/SF) shuffle; lineitem⋈orders shuffles on orderkey, the join AQE
re-plans under skew. EXISTS/IN/NOT-EXISTS forms run through spark.sql so
Catalyst's subquery decorrelation (RewritePredicateSubquery → semi/anti join)
is exercised, not hand-lowered.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from seo_audit_etl_actor_spark.session import load_table

# shared arithmetic fragments — IDENTICAL TEXT runs in Spark SQL and DuckDB so
# the math path (IEEE product → round → integer sum) cannot diverge.
REV4 = "CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)"
DISC_REV4 = "CAST(ROUND(l_extendedprice * l_discount * 10000) AS BIGINT)"
PRICE2 = "CAST(ROUND(l_extendedprice * 100) AS BIGINT)"
AMT4 = (
    "CAST(ROUND((l_extendedprice * (1 - l_discount)"
    " - 0.5 * p_retailprice * l_quantity) * 10000) AS BIGINT)"
)
BAL2 = "CAST(ROUND(c_acctbal * 100) AS BIGINT)"
QTY = "CAST(l_quantity AS BIGINT)"


def _register_tpch_views(spark: SparkSession, sf_dir: str, tables: list[str]) -> None:
    for t in tables:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)


# --------------------------------------------------------------------------
# Q4 — order priority checking. Adapted: the reference lateness predicate
# l_commitdate < l_receiptdate (columns absent) becomes "shipped more than 30
# days after order date". Shape preserved: date-windowed scan + correlated
# EXISTS, which Catalyst decorrelates to a left-semi hash join on orderkey.
# --------------------------------------------------------------------------
def q_tpch_q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4: count orders per priority that had at least one late line.

    100 TB shape: both sides shuffle on orderkey for the semi join; the
    3-month o_orderdate window is pushed to the orders scan, so the probe
    side is ~4% of the table before the exchange."""
    _register_tpch_views(spark, sf_dir, ["orders", "lineitem"])
    return spark.sql(SQL_TPCH_Q4_ORDER_PRIORITY)


SQL_TPCH_Q4_ORDER_PRIORITY = """
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1996-04-01'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey
      AND l_shipdate > o_orderdate + INTERVAL 30 DAY
  )
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


# --------------------------------------------------------------------------
# Q5 — local supplier volume: revenue where the item's supplier and the
# ordering customer share a nation. No adaptation needed.
# --------------------------------------------------------------------------
def q_tpch_q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5: six-table join, revenue by nation within ASIA for one year.

    100 TB shape: lineitem⋈orders is the only big-big shuffle (orderkey);
    supplier (10k/SF) + nation + region are broadcast so the c_nationkey =
    s_nationkey co-nation constraint is applied map-side; customer shuffles
    on custkey. Revenue is exact integer 1e-4 units."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg((F.sum(F.expr(REV4)) / 10000.0).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("n_name"))
    )


SQL_TPCH_Q5_LOCAL_SUPPLIER_VOLUME = f"""
SELECT n_name, CAST(SUM({REV4}) AS BIGINT) / 10000.0 AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""


# --------------------------------------------------------------------------
# Q6 — forecast revenue change: pure scan-filter-sum. No adaptation needed.
# --------------------------------------------------------------------------
def q_tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: the predicate-pushdown showcase — all three filters reach
    the parquet scan (PushedFilters), one ungrouped partial-agg sum, shuffle
    carries one row per task. Revenue = sum(price*discount), exact 1e-4
    units (price 2dp x discount 2dp)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg((F.sum(F.expr(DISC_REV4)) / 10000.0).alias("revenue"))
    )


SQL_TPCH_Q6_FORECAST_REVENUE = f"""
SELECT CAST(SUM({DISC_REV4}) AS BIGINT) / 10000.0 AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
"""


# --------------------------------------------------------------------------
# Q7 — volume shipping between two nations. No adaptation needed.
# --------------------------------------------------------------------------
def q_tpch_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: nation-pair trade volume by ship year. The nation dimension
    joins TWICE (supplier side and customer side) under different aliases —
    both broadcast, so the double-dimension join adds zero exchanges. The
    symmetric pair filter ((A,B) or (B,A)) rides the broadcast hash join.

    100 TB shape: lineitem⋈orders (orderkey) and ⋈customer (custkey) are
    the two big shuffles; supplier + both nation copies are map-side."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("cn_key"))
        .where(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.expr("CAST(YEAR(l_shipdate) AS BIGINT)").alias("l_year"),
        )
        .agg((F.sum(F.expr(REV4)) / 10000.0).alias("volume"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


SQL_TPCH_Q7_VOLUME_SHIPPING = f"""
SELECT supp_nation, cust_nation, l_year,
       CAST(SUM(rev4) AS BIGINT) / 10000.0 AS volume
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(YEAR(l_shipdate) AS BIGINT) AS l_year, {REV4} AS rev4
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1998-01-01'
    AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
)
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""


# --------------------------------------------------------------------------
# Q8 — national market share. Adapted: p_type = 'ECONOMY' stands in for the
# reference's long p_type strings (synthetic types are single words).
# --------------------------------------------------------------------------
def q_tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: NATION_1's share of AMERICA-region ECONOMY revenue by order
    year — conditional-sum ratio over one grouped pass (no second scan for
    the denominator). Both sums are exact integer units, so the final
    division is one deterministic double op.

    100 TB shape: part filter prunes the build side before its shuffle
    join with lineitem; customer-side region restriction rides broadcast
    nation/region; supplier nation lookup is broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").where(F.col("p_type") == "ECONOMY")
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    n_cust = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region")
    )
    n_supp = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    region = load_table(spark, sf_dir, "region").where(F.col("r_name") == "AMERICA")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n_cust), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(region), F.col("cn_region") == F.col("r_regionkey"))
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n_supp), F.col("s_nationkey") == F.col("sn_key"))
        .groupBy(F.expr("CAST(YEAR(o_orderdate) AS BIGINT)").alias("o_year"))
        .agg(
            (
                F.sum(F.expr(f"CASE WHEN supp_nation = 'NATION_1' THEN {REV4} ELSE 0 END"))
                / F.sum(F.expr(REV4))
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


SQL_TPCH_Q8_MARKET_SHARE = f"""
SELECT o_year,
       CAST(SUM(CASE WHEN supp_nation = 'NATION_1' THEN rev4 ELSE 0 END) AS BIGINT)
       / CAST(SUM(rev4) AS BIGINT) AS mkt_share
FROM (
  SELECT CAST(YEAR(o_orderdate) AS BIGINT) AS o_year, {REV4} AS rev4,
         n2.n_name AS supp_nation
  FROM lineitem
  JOIN part     ON l_partkey = p_partkey
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region   ON n1.n_regionkey = r_regionkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
    AND o_orderdate >= TIMESTAMP '1996-01-01'
    AND o_orderdate < TIMESTAMP '1998-01-01'
)
GROUP BY o_year
ORDER BY o_year
"""


# --------------------------------------------------------------------------
# Q9 — product type profit. Adapted: no partsupp, so the cost term
# ps_supplycost*l_quantity becomes 0.5*p_retailprice*l_quantity (a fixed
# cost ratio); the p_name LIKE '%green%' filter becomes p_type = 'ECONOMY'.
# --------------------------------------------------------------------------
def q_tpch_q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9: profit by supplier nation and order year. Profit units are
    exact 1e-4 (price*(1-disc) is 4dp; 0.5*retail*qty is 3dp).

    100 TB shape: filtered part shuffles against lineitem on partkey,
    orders on orderkey; supplier/nation broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").where(F.col("p_type") == "ECONOMY")
    orders = load_table(spark, sf_dir, "orders")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.expr("CAST(YEAR(o_orderdate) AS BIGINT)").alias("o_year"),
        )
        .agg((F.sum(F.expr(AMT4)) / 10000.0).alias("sum_profit"))
        .orderBy(F.col("nation"), F.col("o_year").desc())
    )


SQL_TPCH_Q9_PRODUCT_TYPE_PROFIT = f"""
SELECT n_name AS nation, CAST(YEAR(o_orderdate) AS BIGINT) AS o_year,
       CAST(SUM({AMT4}) AS BIGINT) / 10000.0 AS sum_profit
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE p_type = 'ECONOMY'
GROUP BY n_name, CAST(YEAR(o_orderdate) AS BIGINT)
ORDER BY nation, o_year DESC
"""


# --------------------------------------------------------------------------
# Q10 — returned item reporting. Adapted: c_address/c_phone/c_comment absent
# from the projection (columns don't exist).
# --------------------------------------------------------------------------
def q_tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: top-20 customers by revenue lost to returns in one quarter.

    100 TB shape: returnflag + date filters push to both scans; the grouped
    per-customer revenue is exact-integer, so the top-20 cut (global
    TakeOrderedAndProject after partial per-partition top-k) is
    deterministic with the custkey tiebreaker."""
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-10-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg((F.sum(F.expr(REV4)) / 10000.0).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


SQL_TPCH_Q10_RETURNED_ITEMS = f"""
SELECT c_custkey, c_name, c_acctbal, n_name,
       CAST(SUM({REV4}) AS BIGINT) / 10000.0 AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-10-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


# --------------------------------------------------------------------------
# Q12 — shipping modes / priority. Adapted: l_shipmode doesn't exist, so the
# two "modes" become ship-delay classes (>60 days late = 'slow'); the
# commit/receipt lateness filter is likewise absent.
# --------------------------------------------------------------------------
def q_tpch_q12_ship_priority_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12: per ship-class counts of high- vs low-priority orders.
    One orderkey shuffle join, then a two-key conditional-count aggregate."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    orders = load_table(spark, sf_dir, "orders")
    j = li.join(orders, li.l_orderkey == orders.o_orderkey)
    ship_class = F.expr(
        "CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY THEN 'slow' ELSE 'fast' END"
    )
    high = "o_orderpriority IN ('1-URGENT', '2-HIGH')"
    return (
        j.groupBy(ship_class.alias("ship_class"))
        .agg(
            F.sum(F.expr(f"CASE WHEN {high} THEN 1 ELSE 0 END")).alias("high_line_count"),
            F.sum(F.expr(f"CASE WHEN {high} THEN 0 ELSE 1 END")).alias("low_line_count"),
        )
        .orderBy("ship_class")
    )


SQL_TPCH_Q12_SHIP_PRIORITY_CLASSES = """
SELECT CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY THEN 'slow' ELSE 'fast' END AS ship_class,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
GROUP BY 1
ORDER BY ship_class
"""


# --------------------------------------------------------------------------
# Q13 — customer order-count distribution. Adapted: the o_comment NOT LIKE
# filter becomes "exclude 1-URGENT orders" (comment column absent).
# --------------------------------------------------------------------------
def q_tpch_q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: histogram of per-customer order counts INCLUDING
    zero-order customers — the left outer join is the point (an inner join
    would silently drop the c_count=0 bucket).

    100 TB shape: custkey shuffle for the outer join + first agg; the
    second agg's keyspace is tiny (max orders per customer)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


SQL_TPCH_Q13_CUSTOMER_DISTRIBUTION = """
SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
FROM (
  SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
  FROM customer
  LEFT JOIN (SELECT * FROM orders WHERE o_orderpriority <> '1-URGENT') o
    ON c_custkey = o.o_custkey
  GROUP BY c_custkey
)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


# --------------------------------------------------------------------------
# Q14 — promotion effect. Adapted: p_type LIKE 'PROMO%' → p_type = 'PROMO'
# (synthetic types are single words).
# --------------------------------------------------------------------------
def q_tpch_q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: percent of one month's revenue from PROMO parts — a
    conditional-sum ratio in a single grouped pass. part⋈lineitem shuffles
    on partkey (part is 200k rows/SF: broadcastable at small SF, AQE
    decides; at 100 TB it shuffles)."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    part = load_table(spark, sf_dir, "part")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .agg(
            (
                100.0
                * F.sum(F.expr(f"CASE WHEN p_type = 'PROMO' THEN {REV4} ELSE 0 END"))
                / F.sum(F.expr(REV4))
            ).alias("promo_revenue_pct")
        )
    )


SQL_TPCH_Q14_PROMO_EFFECT = f"""
SELECT 100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO' THEN {REV4} ELSE 0 END) AS BIGINT)
       / CAST(SUM({REV4}) AS BIGINT) AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-09-01'
  AND l_shipdate < TIMESTAMP '1996-10-01'
"""


# --------------------------------------------------------------------------
# Q15 — top supplier. No adaptation needed (revenue view + scalar-subquery
# max). The max comparison runs on the EXACT integer sums, so "ties" are
# honest ties, not float artifacts.
# --------------------------------------------------------------------------
def q_tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: supplier(s) with max quarterly revenue. Catalyst plans
    the scalar subquery as a 1-row broadcast against the 10k/SF revenue
    aggregate — the lineitem scan happens twice in the classic SQL form;
    here the aggregated view is tiny so the re-use cost is the agg, not
    the scan (at 100 TB, cache the revenue CTE or compute max via a window
    over the grouped frame)."""
    _register_tpch_views(spark, sf_dir, ["lineitem", "supplier"])
    return spark.sql(SQL_TPCH_Q15_TOP_SUPPLIER)


SQL_TPCH_Q15_TOP_SUPPLIER = f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no, CAST(SUM({REV4}) AS BIGINT) AS total_rev4
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, CAST(total_rev4 AS DOUBLE) / 10000.0 AS total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_rev4 = (SELECT MAX(total_rev4) FROM revenue)
ORDER BY s_suppkey
"""


# --------------------------------------------------------------------------
# Q16 — parts/supplier relationship. Adapted: no partsupp → supplier-part
# pairs come from lineitem history; the "complaints" comment filter becomes
# s_acctbal < 0.
# --------------------------------------------------------------------------
def q_tpch_q16_parts_supplier_relationship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16: distinct supplier counts per (brand, type, size) for a
    size whitelist, excluding flagged suppliers via NOT IN (lowered to a
    broadcast anti join — the flagged set is tiny by construction).

    100 TB shape: part filter prunes before the partkey shuffle;
    COUNT(DISTINCT) shuffles once on the 3-part group key with the suppkey
    riding along (Expand-based distinct agg)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#5")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45)
    )
    flagged = load_table(spark, sf_dir, "supplier").where(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(F.broadcast(flagged), li.l_suppkey == flagged.s_suppkey, "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


SQL_TPCH_Q16_PARTS_SUPPLIER_RELATIONSHIP = """
SELECT p_brand, p_type, p_size, CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#5' AND p_type <> 'PROMO'
  AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


# --------------------------------------------------------------------------
# Q17 — small-quantity-order revenue. Adapted: the p_container filter is
# dropped (column absent); brand filter retained. The correlated scalar
# subquery (per-part average quantity) is the shape under test.
# --------------------------------------------------------------------------
def q_tpch_q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: average yearly revenue lost if small-quantity orders were
    dropped. Catalyst decorrelates the per-part AVG subquery into an
    aggregate + self-join on partkey; the threshold (0.2*avg of
    integer-valued quantities) is an exact-rational double, identical in
    both engines. Revenue units are exact cents (raw 2dp price)."""
    _register_tpch_views(spark, sf_dir, ["lineitem", "part"])
    return spark.sql(SQL_TPCH_Q17_SMALL_QUANTITY_REVENUE)


SQL_TPCH_Q17_SMALL_QUANTITY_REVENUE = f"""
SELECT CAST(SUM({PRICE2}) AS DOUBLE) / 100.0 / 7.0 AS avg_yearly
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#23'
  AND l_quantity < (
    SELECT 0.2 * AVG(l_quantity) FROM lineitem l2 WHERE l2.l_partkey = p_partkey
  )
"""


# --------------------------------------------------------------------------
# Q19 — discounted revenue for quantity/size bands: the OR-of-ANDs join
# predicate. Adapted: p_container membership tests → p_size ranges.
# --------------------------------------------------------------------------
def q_tpch_q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: disjunctive band predicate. The partkey equality is still
    extracted as the join key (the OR only covers residual conditions), so
    this stays a hash join with a post-join filter — NOT a cartesian; the
    per-band residuals reference both sides and evaluate map-side."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    band = (
        "(p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5  AND l_quantity BETWEEN 1 AND 11)"
        " OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)"
        " OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)"
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .where(F.expr(band))
        .agg((F.sum(F.expr(REV4)) / 10000.0).alias("revenue"))
    )


SQL_TPCH_Q19_DISCOUNTED_REVENUE = f"""
SELECT CAST(SUM({REV4}) AS BIGINT) / 10000.0 AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5  AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)
"""


# --------------------------------------------------------------------------
# Q20 — potential part promotion. Adapted: the partsupp half-stock test
# becomes "suppliers whose 1997 shipped PROMO volume exceeds 1.2x the
# average supplier's" — scale-free (no absolute row-count threshold), same
# IN + GROUP BY + HAVING + scalar-subquery shape.
# --------------------------------------------------------------------------
def q_tpch_q20_potential_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20: IN-subquery over a grouped HAVING with a nested scalar
    average. Quantity sums are exact BIGINTs; the 1.2x threshold is one
    deterministic double product. Catalyst lowers the IN to a semi join
    against the 10k/SF grouped frame."""
    _register_tpch_views(spark, sf_dir, ["lineitem", "part", "supplier"])
    return spark.sql(SQL_TPCH_Q20_POTENTIAL_PROMOTION)


SQL_TPCH_Q20_POTENTIAL_PROMOTION = f"""
WITH promo_vol AS (
  SELECT l_suppkey, CAST(SUM({QTY}) AS BIGINT) AS vol
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_type = 'PROMO'
    AND l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate < TIMESTAMP '1998-01-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name
FROM supplier
WHERE s_suppkey IN (
  SELECT l_suppkey FROM promo_vol
  WHERE vol > 1.2 * (SELECT AVG(vol) FROM promo_vol)
)
ORDER BY s_suppkey
"""


# --------------------------------------------------------------------------
# Q22 — global sales opportunity. Adapted: c_phone country codes don't
# exist → cntrycode = c_custkey % 7; "no orders at all" is vacuous on this
# dense corpus → "no recent URGENT order". Balance stats run on exact
# integer cents so the above-average cut cannot float-flip.
# --------------------------------------------------------------------------
def q_tpch_q22_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22: idle high-balance customers per synthetic country code —
    ungrouped scalar average + NOT EXISTS anti join in one statement.
    100 TB shape: the avg is a 1-row broadcast; the anti join shuffles on
    custkey; both customer scans prune to 2 columns."""
    _register_tpch_views(spark, sf_dir, ["customer", "orders"])
    return spark.sql(SQL_TPCH_Q22_SALES_OPPORTUNITY)


SQL_TPCH_Q22_SALES_OPPORTUNITY = f"""
SELECT CAST(c_custkey % 7 AS BIGINT) AS cntrycode,
       CAST(COUNT(*) AS BIGINT) AS numcust,
       CAST(SUM({BAL2}) AS DOUBLE) / 100.0 AS totacctbal
FROM customer
WHERE {BAL2} > (
    SELECT AVG({BAL2}) FROM customer WHERE c_acctbal > 0.0
  )
  AND NOT EXISTS (
    SELECT 1 FROM orders
    WHERE o_custkey = c_custkey
      AND o_orderpriority = '1-URGENT'
      AND o_orderdate >= TIMESTAMP '2000-08-01'
  )
GROUP BY cntrycode
ORDER BY cntrycode
"""


# --------------------------------------------------------------------------
# Q2 — minimum-cost supplier. The real Q2 needs partsupp; the synthetic
# schema has none, so the supply relation is DERIVED from lineitem history:
# supply_cents(part, supplier) = MIN over their lineitems of the unit price
# ROUND(100 * l_extendedprice / l_quantity) — an exact BIGINT, so the
# correlated "= (SELECT MIN ...)" comparison is integer-exact. The shape
# under test (correlated scalar MIN subquery over the supply relation,
# region-filtered dimension chain, acctbal-ranked top-100) is Q2's.
# --------------------------------------------------------------------------
def q_tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 (adapted): cheapest EUROPE supplier per size-15 part.

    100 TB shape: the supply relation aggregates lineitem once (partkey,
    suppkey — uniform keys); Catalyst decorrelates the per-part MIN into
    an aggregate + self-join on partkey; supplier/nation/region broadcast."""
    _register_tpch_views(spark, sf_dir, ["lineitem", "part", "supplier", "nation", "region"])
    return spark.sql(SQL_TPCH_Q2_MIN_COST_SUPPLIER)


SQL_TPCH_Q2_MIN_COST_SUPPLIER = """
WITH supply AS (
  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
         CAST(MIN(CAST(ROUND(100 * l_extendedprice / l_quantity) AS BIGINT)) AS BIGINT) AS ps_cents
  FROM lineitem
  GROUP BY l_partkey, l_suppkey
)
SELECT s_acctbal, s_name, n_name, p_partkey, p_name, CAST(ps_cents AS DOUBLE) / 100.0 AS supplycost
FROM part
JOIN supply   ON p_partkey = ps_partkey
JOIN supplier ON s_suppkey = ps_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE p_size = 15 AND r_name = 'EUROPE'
  AND ps_cents = (
    SELECT MIN(ps_cents) FROM supply s2
    JOIN supplier sp ON s2.ps_suppkey = sp.s_suppkey
    JOIN nation n2   ON sp.s_nationkey = n2.n_nationkey
    JOIN region r2   ON n2.n_regionkey = r2.r_regionkey
    WHERE s2.ps_partkey = p_partkey AND r2.r_name = 'EUROPE'
  )
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
"""


# --------------------------------------------------------------------------
# Q11 — important stock. Adapted the same way: "stock value" of a part for
# region-0 suppliers = exact cents sum of their lineitem extended prices;
# HAVING value > 0.1% of the global region-0 value (ungrouped scalar
# subquery over the same grouped relation — Q11's signature shape).
# --------------------------------------------------------------------------
def q_tpch_q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 (adapted): parts whose region-0 supply value exceeds
    0.1% of the total. Exact BIGINT cent sums; the fraction-of-total cut is
    one deterministic double comparison.

    100 TB shape: lineitem aggregates once on partkey after a broadcast
    supplier/nation filter; the global total is a 1-row broadcast."""
    _register_tpch_views(spark, sf_dir, ["lineitem", "supplier", "nation"])
    return spark.sql(SQL_TPCH_Q11_IMPORTANT_STOCK)


SQL_TPCH_Q11_IMPORTANT_STOCK = f"""
WITH r0 AS (
  SELECT l_partkey, {PRICE2} AS cents
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  WHERE n_regionkey = 0
),
by_part AS (
  SELECT l_partkey AS ps_partkey, CAST(SUM(cents) AS BIGINT) AS value_cents
  FROM r0 GROUP BY l_partkey
)
SELECT ps_partkey, CAST(value_cents AS DOUBLE) / 100.0 AS part_value
FROM by_part
WHERE CAST(value_cents AS DOUBLE) > 0.001 * (SELECT CAST(SUM(value_cents) AS DOUBLE) FROM by_part)
ORDER BY part_value DESC, ps_partkey
"""
