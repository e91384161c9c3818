"""Reference-parity operator queries (SURVEY §2.2-§2.4) over the driver
tables, per the FIXTURES.md §A operator→table mapping.

Each query re-expresses one reference computation (cited file:line into
/root/reference) as a native Spark plan, with matching DuckDB oracle SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from seo_audit_etl_actor_spark.functions import to_num
from seo_audit_etl_actor_spark.operators.aggregates import (
    bucket_counts,
    collect_sorted,
    conditional_count,
    coverage_weighted_score,
    first_by,
    percentile_nearest_rank,
    ratio,
)
from seo_audit_etl_actor_spark.session import load_table


# ---------------------------------------------------------------- A3/P3/P6
def q_keyword_position_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Threshold buckets in one aggregate pass (reference src/etl.js:131-138:
    top3/top10/top100 over positive finite positions).

    l_quantity stands in for SERP position (FIXTURES.md §A). One `agg` with
    three conditional sums = one shuffle with map-side partials; the filter
    is pushed to the parquet scan by Catalyst.
    """
    li = load_table(spark, sf_dir, "lineitem")
    pos = F.col("l_quantity")
    return li.where(pos.isNotNull() & (pos > 0)).agg(
        *bucket_counts(pos, {"top3": 3, "top10": 10, "top100": 100}),
        F.count(F.lit(1)).alias("tracked"),
    )


SQL_KEYWORD_POSITION_BUCKETS = """
SELECT
  CAST(SUM(CASE WHEN l_quantity <= 3 THEN 1 ELSE 0 END) AS BIGINT) AS top3,
  CAST(SUM(CASE WHEN l_quantity <= 10 THEN 1 ELSE 0 END) AS BIGINT) AS top10,
  CAST(SUM(CASE WHEN l_quantity <= 100 THEN 1 ELSE 0 END) AS BIGINT) AS top100,
  CAST(COUNT(*) AS BIGINT) AS tracked
FROM lineitem
WHERE l_quantity IS NOT NULL AND l_quantity > 0
"""


# ---------------------------------------------------------------- P2/F3/A5
def q_numeric_coercion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tolerant numeric coercion of string cells (reference src/etl.js:75-79
    `toNum`) + maxNum (src/etl.js:88-91), over JSON-extracted strings.

    props is a JSON string column; `get_json_object` extracts `$.k` as a
    string which `to_num` strips and casts — the reference's
    strip-non-numeric → Number() chain as pure Catalyst expressions.
    """
    ev = load_table(spark, sf_dir, "events")
    # Materialize the coerced value BEFORE the agg: referencing the inline
    # expression from all three aggregates would re-run the JSON extract +
    # regexp per aggregate (3x per row); a projected column runs it once.
    ev = ev.select("event_type", to_num(F.get_json_object(F.col("props"), "$.k")).alias("k"))
    k = F.col("k")
    return (
        ev.groupBy("event_type")
        .agg(
            F.sum(k).cast("double").alias("sum_k"),
            F.max(k).alias("max_k"),
            F.count(k).cast("long").alias("cnt_k"),
        )
        .orderBy("event_type")
    )


SQL_NUMERIC_COERCION = """
SELECT
  event_type,
  CAST(SUM(k) AS DOUBLE) AS sum_k,
  MAX(k) AS max_k,
  CAST(COUNT(k) AS BIGINT) AS cnt_k
FROM (
  SELECT event_type,
         TRY_CAST(NULLIF(REGEXP_REPLACE(json_extract_string(props, '$.k'),
                                        '[^0-9.\\-]', '', 'g'), '') AS DOUBLE) AS k
  FROM events
)
GROUP BY event_type
ORDER BY event_type
"""


# ---------------------------------------------------------------- P5/A3/A11
def q_status_code_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range-predicate conditional counts (reference src/etl.js:224-226:
    4xx = 400≤sc<500, 5xx = sc≥500) over o_totalprice bands."""
    orders = load_table(spark, sf_dir, "orders")
    sc = F.col("o_totalprice")
    return orders.agg(
        conditional_count((sc >= 100000) & (sc < 200000)).alias("band_4xx"),
        conditional_count(sc >= 200000).alias("band_5xx"),
        F.count(F.lit(1)).alias("pages_total"),
    )


SQL_STATUS_CODE_BANDS = """
SELECT
  CAST(SUM(CASE WHEN o_totalprice >= 100000 AND o_totalprice < 200000 THEN 1 ELSE 0 END) AS BIGINT) AS band_4xx,
  CAST(SUM(CASE WHEN o_totalprice >= 200000 THEN 1 ELSE 0 END) AS BIGINT) AS band_5xx,
  CAST(COUNT(*) AS BIGINT) AS pages_total
FROM orders
"""


# ---------------------------------------------------------------- A2/A12
def q_pages_total_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct count + source-priority coalesce (reference src/etl.js:159-161:
    `pages_total = ?? distinct URLs ?? row count`, :228 fallback).

    Two scalar aggregates cross-joined (both single-row → trivially cheap),
    then `coalesce` in priority order. countDistinct is the exact form the
    reference uses; `approx_distinct_users` below is the 100 TB variant.
    """
    ev = load_table(spark, sf_dir, "events")
    distinct_views = (
        ev.where(F.col("event_type") == "view")
        .agg(F.countDistinct("user_id").cast("long").alias("distinct_view_users"))
    )
    total = ev.agg(F.count(F.lit(1)).alias("total_events"))
    return distinct_views.crossJoin(total).select(
        F.coalesce(
            F.nullif(F.col("distinct_view_users"), F.lit(0)), F.col("total_events")
        ).alias("pages_total"),
        "distinct_view_users",
        "total_events",
    )


SQL_PAGES_TOTAL_COALESCE = """
SELECT
  COALESCE(NULLIF(d.distinct_view_users, 0), t.total_events) AS pages_total,
  d.distinct_view_users,
  t.total_events
FROM (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS distinct_view_users
      FROM events WHERE event_type = 'view') d
CROSS JOIN (SELECT CAST(COUNT(*) AS BIGINT) AS total_events FROM events) t
"""


# ---------------------------------------------------------------- A4/F4
def q_avg_domain_rating(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean over coercible values + round-to-0.1 (reference src/etl.js:176
    avg DR; :320 `Math.round(avg*10)/10`).

    Sum runs in DECIMAL(18,2) (exact, order-independent) then divides in
    double — bit-identical on Spark and DuckDB regardless of partial-agg
    order; a raw double SUM would not be.
    """
    sup = load_table(spark, sf_dir, "supplier")
    exact_sum = F.sum(F.col("s_acctbal").cast("decimal(18,2)")).cast("double")
    cnt = F.count("s_acctbal")
    return sup.agg(
        F.round(exact_sum / cnt, 1).alias("avg_dr"),
        cnt.cast("long").alias("n_domains"),
    )


SQL_AVG_DOMAIN_RATING = """
SELECT
  ROUND(CAST(SUM(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(s_acctbal), 1) AS avg_dr,
  CAST(COUNT(s_acctbal) AS BIGINT) AS n_domains
FROM supplier
"""


# ---------------------------------------------------------------- A7/P7
def q_ratio_high_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-of-counts per group (reference src/etl.js:321 `pct_top3`,
    :359-360 `consistency = good/total`).

    avg(when(pred,1.0) else 0.0) — numerator/denominator in one aggregate,
    integer-valued doubles so the division is deterministic.
    """
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            ratio(F.col("value") > 100).alias("pct_high"),
            F.count(F.lit(1)).alias("total"),
        )
        .orderBy("event_type")
    )


SQL_RATIO_HIGH_VALUE = """
SELECT
  event_type,
  AVG(CASE WHEN value > 100 THEN 1.0 ELSE 0.0 END) AS pct_high,
  CAST(COUNT(*) AS BIGINT) AS total
FROM events
GROUP BY event_type
ORDER BY event_type
"""


# ---------------------------------------------------------------- A8
def q_p75_nearest_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lower-nearest-rank p75: sorted[floor(0.75*(n-1))] (reference
    src/etl.js:284-289) — NOT the interpolating SQL `percentile`.

    Window row_number + per-group count (SURVEY §2.3 A8 explicit form,
    scale-safe: no per-group array materialization).
    """
    li = load_table(spark, sf_dir, "lineitem")
    return percentile_nearest_rank(
        li, "l_extendedprice", group_cols=("l_returnflag",), q=0.75, out_col="p75_price"
    ).orderBy("l_returnflag")


SQL_P75_NEAREST_RANK = """
SELECT l_returnflag,
       list_sort(list(l_extendedprice))[CAST(FLOOR(0.75 * (COUNT(*) - 1)) AS BIGINT) + 1] AS p75_price
FROM lineitem
WHERE l_extendedprice IS NOT NULL
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


# ---------------------------------------------------------------- A9/A10
def q_first_and_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic first + ordered collect per group (reference
    src/etl.js:404-409: first primary category, secondary list in file
    order). Ingest order ≍ n_nationkey (SURVEY §7.2 H2 discipline).

    The collected list is joined to a string so the oracle hash is
    byte-comparable across engines.
    """
    nation = load_table(spark, sf_dir, "nation")
    return (
        nation.groupBy("n_regionkey")
        .agg(
            first_by(F.col("n_name"), F.col("n_nationkey")).alias("first_nation"),
            F.array_join(
                collect_sorted(F.col("n_name"), F.col("n_nationkey")), ","
            ).alias("all_nations"),
        )
        .orderBy("n_regionkey")
    )


SQL_FIRST_AND_COLLECT = """
SELECT n_regionkey,
       ARG_MIN(n_name, n_nationkey) AS first_nation,
       STRING_AGG(n_name, ',' ORDER BY n_nationkey) AS all_nations
FROM nation
GROUP BY n_regionkey
ORDER BY n_regionkey
"""


# ---------------------------------------------------------------- A11
def q_accumulate_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-source count accumulation (reference src/etl.js:197-205 +
    :225-226: `errors[key] += count` from site-audit AND Screaming Frog).

    unionByName of per-source (key, cnt) frames → one re-aggregation; the
    Spark-explicit form of the reference's shared-accumulator `+=`.
    """
    li = load_table(spark, sf_dir, "lineitem")
    src_a = (
        li.where(F.col("l_linestatus") == "F")
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    src_b = (
        li.where(F.col("l_linestatus") == "O")
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        src_a.unionByName(src_b)
        .groupBy("l_returnflag")
        .agg(F.sum("cnt").cast("long").alias("total_cnt"))
        .orderBy("l_returnflag")
    )


SQL_ACCUMULATE_UNION = """
SELECT l_returnflag, CAST(SUM(cnt) AS BIGINT) AS total_cnt
FROM (
  SELECT l_returnflag, COUNT(*) AS cnt FROM lineitem WHERE l_linestatus = 'F' GROUP BY l_returnflag
  UNION ALL
  SELECT l_returnflag, COUNT(*) AS cnt FROM lineitem WHERE l_linestatus = 'O' GROUP BY l_returnflag
)
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


# ---------------------------------------------------------------- P9/F1/F2
def q_liveness_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compound substring-containment liveness predicate (reference
    src/etl.js:345-358: status/general-status contains live|present|ok OR
    non-empty link), mapped onto documents."""
    docs = load_table(spark, sf_dir, "documents")
    text = F.lower(F.col("text"))
    looks_live = (
        text.rlike("join|merge|scan")
        | F.lower(F.col("lang")).rlike("en|es")
        | (F.length(F.trim(F.col("source"))) > 0)
    )
    counted = (F.col("text").isNotNull() & (F.length("text") > 0)) | (
        F.length(F.trim(F.col("source"))) > 0
    )
    return (
        docs.groupBy("lang")
        .agg(
            conditional_count(counted & looks_live).alias("good"),
            conditional_count(counted).alias("total"),
        )
        .withColumn(
            "consistency",
            F.when(
                F.col("total") > 0, F.col("good") / F.col("total")
            ).otherwise(F.lit(None).cast("double")),
        )
        .orderBy("lang")
    )


SQL_LIVENESS_RATIO = """
SELECT lang, good, total,
       CASE WHEN total > 0 THEN good / total ELSE NULL END AS consistency
FROM (
  SELECT lang,
    CAST(SUM(CASE WHEN ((text IS NOT NULL AND LENGTH(text) > 0) OR LENGTH(TRIM(source)) > 0)
                   AND (REGEXP_MATCHES(LOWER(text), 'join|merge|scan')
                        OR REGEXP_MATCHES(LOWER(lang), 'en|es')
                        OR LENGTH(TRIM(source)) > 0)
             THEN 1 ELSE 0 END) AS BIGINT) AS good,
    CAST(SUM(CASE WHEN (text IS NOT NULL AND LENGTH(text) > 0) OR LENGTH(TRIM(source)) > 0
             THEN 1 ELSE 0 END) AS BIGINT) AS total
  FROM documents
  GROUP BY lang
)
ORDER BY lang
"""


# ---------------------------------------------------------------- P11
def q_cwv_pass_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-gated multi-metric pass rate (reference src/etl.js:296-303:
    rows with any null metric excluded from numerator AND denominator).

    lcp≍l_extendedprice, cls≍l_discount, inp≍l_tax (FIXTURES.md §A).
    """
    li = load_table(spark, sf_dir, "lineitem")
    lcp, cls, inp = F.col("l_extendedprice"), F.col("l_discount"), F.col("l_tax")
    gated = F.when(
        lcp.isNotNull() & cls.isNotNull() & inp.isNotNull(),
        F.when((lcp <= 30000) & (cls <= 0.05) & (inp <= 0.04), 1.0).otherwise(0.0),
    )
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.avg(gated).alias("pass_rate"),
            F.count(gated).cast("long").alias("measured"),
        )
        .orderBy("l_returnflag")
    )


SQL_CWV_PASS_RATE = """
SELECT l_returnflag,
       AVG(g) AS pass_rate,
       CAST(COUNT(g) AS BIGINT) AS measured
FROM (
  SELECT l_returnflag,
         CASE WHEN l_extendedprice IS NOT NULL AND l_discount IS NOT NULL AND l_tax IS NOT NULL
              THEN (CASE WHEN l_extendedprice <= 30000 AND l_discount <= 0.05 AND l_tax <= 0.04
                         THEN 1.0 ELSE 0.0 END)
              ELSE NULL END AS g
  FROM lineitem
)
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


# ---------------------------------------------------------------- A13/F5-F9
def q_coverage_weighted_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Coverage-weighted composite score (reference src/scoring.js:38-46)
    over a long-format component frame fed by real per-table aggregates.

    Components mirror the OSS weight vector (src/scoring.js:3): two
    unavailable components exercise the availability gate; the kw_top10 raw
    uses the zero-swallowing `||` coalesce (src/scoring.js:18-19) and the
    site-health raw uses the clamped errors-per-page curve
    (src/scoring.js:26-33).
    """
    li = load_table(spark, sf_dir, "lineitem")
    ev = load_table(spark, sf_dir, "events")
    orders = load_table(spark, sf_dir, "orders")

    buckets = li.where(F.col("l_quantity") > 0).agg(
        conditional_count(F.col("l_quantity") <= 10).alias("top10"),
        conditional_count(F.col("l_quantity") <= 100).alias("top100"),
    )
    kw = buckets.select(
        F.least(
            F.col("top10")
            / F.greatest(F.coalesce(F.nullif(F.col("top100"), F.lit(0)), F.lit(1)), F.lit(1)),
            F.lit(1.0),
        ).alias("raw")
    ).select(F.lit("kw_top10").alias("component"), F.lit(20.0).alias("weight"), "raw", F.lit(True).alias("avail"))

    errs = li.where(F.col("l_returnflag") == "R").agg(F.count(F.lit(1)).alias("nerr"))
    pages = orders.agg(F.count(F.lit(1)).alias("npages"))
    health = (
        errs.crossJoin(pages)
        .select(
            F.least(
                F.greatest(
                    F.lit(1.0)
                    - (F.col("nerr") / F.coalesce(F.nullif(F.col("npages"), F.lit(0)), F.lit(100)))
                    / F.lit(0.5),
                    F.lit(0.0),
                ),
                F.lit(1.0),
            ).alias("raw")
        )
        .select(F.lit("site_health").alias("component"), F.lit(20.0).alias("weight"), "raw", F.lit(True).alias("avail"))
    )

    cwv = ev.agg(ratio(F.col("value") <= 200).alias("raw")).select(
        F.lit("cwv_pass").alias("component"), F.lit(15.0).alias("weight"), "raw", F.lit(True).alias("avail")
    )

    # Literal rows built JVM-side on a 1-partition range — avoids the
    # 32-partition Python→JVM createDataFrame round-trip for 2 rows.
    absent = (
        spark.range(1)
        .select(
            F.explode(
                F.array(
                    F.struct(
                        F.lit("gsc_clicks").alias("component"),
                        F.lit(30.0).alias("weight"),
                        F.lit(None).cast("double").alias("raw"),
                        F.lit(False).alias("avail"),
                    ),
                    F.struct(
                        F.lit("indexed_valid").alias("component"),
                        F.lit(15.0).alias("weight"),
                        F.lit(None).cast("double").alias("raw"),
                        F.lit(False).alias("avail"),
                    ),
                )
            ).alias("c")
        )
        .select("c.component", "c.weight", "c.raw", "c.avail")
    )

    long_frame = kw.unionByName(health).unionByName(cwv).unionByName(absent)
    return coverage_weighted_score(long_frame)


SQL_COVERAGE_WEIGHTED_SCORE = """
WITH buckets AS (
  SELECT CAST(SUM(CASE WHEN l_quantity <= 10 THEN 1 ELSE 0 END) AS BIGINT) AS top10,
         CAST(SUM(CASE WHEN l_quantity <= 100 THEN 1 ELSE 0 END) AS BIGINT) AS top100
  FROM lineitem WHERE l_quantity > 0
),
comp AS (
  SELECT 'kw_top10' AS component, 20.0 AS weight,
         LEAST(top10 / GREATEST(COALESCE(NULLIF(top100, 0), 1), 1), 1.0) AS raw,
         TRUE AS avail
  FROM buckets
  UNION ALL
  SELECT 'site_health', 20.0,
         LEAST(GREATEST(1.0 - ((SELECT COUNT(*) FROM lineitem WHERE l_returnflag = 'R')
                / COALESCE(NULLIF((SELECT COUNT(*) FROM orders), 0), 100)) / 0.5, 0.0), 1.0),
         TRUE
  UNION ALL
  SELECT 'cwv_pass', 15.0,
         (SELECT AVG(CASE WHEN value <= 200 THEN 1.0 ELSE 0.0 END) FROM events),
         TRUE
  UNION ALL SELECT 'gsc_clicks', 30.0, NULL, FALSE
  UNION ALL SELECT 'indexed_valid', 15.0, NULL, FALSE
)
SELECT
  COALESCE(ROUND(SUM(CASE WHEN avail AND raw IS NOT NULL THEN weight * raw ELSE 0.0 END)
        / NULLIF(SUM(CASE WHEN avail AND raw IS NOT NULL THEN weight ELSE 0.0 END), 0.0) * 1000, 0) / 10, 0.0) AS score,
  ROUND(SUM(CASE WHEN avail AND raw IS NOT NULL THEN weight ELSE 0.0 END) / SUM(weight), 2) AS coverage,
  CAST(SUM(CASE WHEN avail AND raw IS NOT NULL THEN weight ELSE 0.0 END) AS DOUBLE) AS weight_used,
  CAST(SUM(weight) AS DOUBLE) AS weight_total
FROM comp
"""
