"""Data-quality / profiling queries, round 3: dbt-style quality checks,
exact-arithmetic correlation & regression, and blocked fuzzy matching
(entity resolution). Extension surface beyond the reference (whose only
quality logic is per-row liveness/placeholder predicates,
src/etl.js:183-222) — the operational profiling layer a warehouse runs on
every load.

Determinism discipline: the statistical moments are EXACT DECIMAL sums
(order-independent under any partitioning); only the final closed-form
expression touches doubles — both engines evaluate the identical
expression over identical exact sums, so corr/slope/intercept hash-match.
Edit distances are integers; check results are counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from seo_audit_etl_actor_spark.session import load_table

# --------------------------------------------------------- quality checks
QUALITY_PRICE_MAX = 600_000.0


def q_data_quality_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass-per-table quality suite in long format (check, target,
    value): primary-key duplication, foreign-key orphans, null rate,
    range violations, and freshness — the dbt-test set, computed as native
    aggregates so a 100 TB audit costs a few pruned scans.

    Scale: the three row-level checks (null, range, freshness) FUSE into
    one pruned scan + one aggregate, then unpivot via `stack` — a 100 TB
    audit should not pay one pass per check. The PK check is a groupBy on
    the key; the FK check is an anti-join shuffled on the uniform
    orderkey. The union of 1-row branches is plan-trivial."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")

    def row(check: str, target: str, value) -> DataFrame:
        return value.select(
            F.lit(check).alias("check_name"),
            F.lit(target).alias("target"),
            F.col("v").cast("long").alias("value"),
        )

    pk_dups = orders.groupBy("o_orderkey").agg(F.count(F.lit(1)).alias("c")).where(
        F.col("c") > 1
    ).agg(F.coalesce(F.sum("c"), F.lit(0)).alias("v"))
    fk_orphans = (
        li.select("l_orderkey")
        .join(orders.select("o_orderkey"), li.l_orderkey == orders.o_orderkey, "left_anti")
        .agg(F.count(F.lit(1)).alias("v"))
    )
    fused = orders.agg(
        F.sum(F.when(F.col("o_totalprice").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("nulls"),
        F.sum(
            F.when(
                (F.col("o_totalprice") <= 0) | (F.col("o_totalprice") > QUALITY_PRICE_MAX), 1
            ).otherwise(0)
        )
        .cast("long")
        .alias("range_viol"),
        F.datediff(
            F.max(F.col("o_orderdate")).cast("date"), F.to_date(F.lit("1970-01-01"))
        )
        .cast("long")
        .alias("fresh"),
    )
    row_checks = fused.select(
        F.expr(
            "stack(3,"
            " 'null_rows', 'orders.o_totalprice', nulls,"
            " 'range_violations', 'orders.o_totalprice', range_viol,"
            " 'freshness_epoch_days', 'orders.o_orderdate', fresh)"
            " AS (check_name, target, value)"
        )
    )
    return (
        row("pk_duplicate_rows", "orders.o_orderkey", pk_dups)
        .unionAll(row("fk_orphan_rows", "lineitem.l_orderkey", fk_orphans))
        .unionAll(row_checks)
        .orderBy("check_name")
    )


SQL_DATA_QUALITY_CHECKS = f"""
SELECT 'pk_duplicate_rows' AS check_name, 'orders.o_orderkey' AS target,
       CAST(COALESCE((SELECT SUM(c) FROM (
           SELECT COUNT(*) AS c FROM orders GROUP BY o_orderkey HAVING COUNT(*) > 1
       )), 0) AS BIGINT) AS value
UNION ALL
SELECT 'fk_orphan_rows', 'lineitem.l_orderkey',
       CAST((SELECT COUNT(*) FROM lineitem l
             WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
            AS BIGINT)
UNION ALL
SELECT 'null_rows', 'orders.o_totalprice',
       CAST((SELECT SUM(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) FROM orders)
            AS BIGINT)
UNION ALL
SELECT 'range_violations', 'orders.o_totalprice',
       CAST((SELECT SUM(CASE WHEN o_totalprice <= 0 OR o_totalprice > {QUALITY_PRICE_MAX}
                             THEN 1 ELSE 0 END) FROM orders) AS BIGINT)
UNION ALL
SELECT 'freshness_epoch_days', 'orders.o_orderdate',
       CAST((SELECT date_diff('day', DATE '1970-01-01', CAST(MAX(o_orderdate) AS DATE))
             FROM orders) AS BIGINT)
ORDER BY check_name
"""


# ----------------------------------------------- exact-moment regression
def q_quantity_price_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-returnflag Pearson correlation + OLS slope/intercept of
    l_extendedprice on l_quantity — computed from EXACT DECIMAL moment
    sums (n, Σx, Σy, Σx², Σy², Σxy), then one closed-form double
    expression. Spark's corr/regr_* aggregates merge float co-moments in
    partition order (not reproducible bit-for-bit); the exact-moment form
    is order-independent AND cheaper — one pass, map-side combined.

    Scale: identical shape to any single-pass aggregate; moments fit in
    (38,4) DECIMAL for 10^12-row groups."""
    li = load_table(spark, sf_dir, "lineitem")
    x = 'CAST(l_quantity AS DECIMAL(12,2))'
    y = 'CAST(l_extendedprice AS DECIMAL(12,2))'
    mom = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.expr(f"SUM({x})").alias("sx"),
        F.expr(f"SUM({y})").alias("sy"),
        F.expr(f"SUM({x} * {x})").alias("sxx"),
        F.expr(f"SUM({y} * {y})").alias("syy"),
        F.expr(f"SUM({x} * {y})").alias("sxy"),
    )
    n, sx, sy = "CAST(n AS DOUBLE)", "CAST(sx AS DOUBLE)", "CAST(sy AS DOUBLE)"
    sxx, syy, sxy = "CAST(sxx AS DOUBLE)", "CAST(syy AS DOUBLE)", "CAST(sxy AS DOUBLE)"
    cov_n = f"({n} * {sxy} - {sx} * {sy})"
    var_x = f"({n} * {sxx} - {sx} * {sx})"
    var_y = f"({n} * {syy} - {sy} * {sy})"
    # NULLIF on the variance denominators: a zero-variance group must yield
    # NULL (DuckDB's x/0) rather than IEEE Infinity
    return mom.select(
        "l_returnflag",
        F.col("n").cast("long").alias("n"),
        F.expr(
            f"ROUND({cov_n} / NULLIF(sqrt({var_x} * {var_y}), 0.0D), 6)"
        ).alias("corr_qty_price"),
        F.expr(f"ROUND({cov_n} / NULLIF({var_x}, 0.0D), 6)").alias("slope"),
        F.expr(
            f"ROUND(({sy} - ({cov_n} / NULLIF({var_x}, 0.0D)) * {sx}) / {n}, 6)"
        ).alias("intercept"),
    ).orderBy("l_returnflag")


_RX = "CAST(l_quantity AS DECIMAL(12,2))"
_RY = "CAST(l_extendedprice AS DECIMAL(12,2))"

SQL_QUANTITY_PRICE_REGRESSION = f"""
WITH mom AS (
  SELECT l_returnflag,
         COUNT(*) AS n,
         SUM({_RX}) AS sx, SUM({_RY}) AS sy,
         SUM({_RX} * {_RX}) AS sxx, SUM({_RY} * {_RY}) AS syy,
         SUM({_RX} * {_RY}) AS sxy
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, CAST(n AS BIGINT) AS n,
       ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
           AS corr_qty_price,
       ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6)
           AS slope,
       ROUND((CAST(sy AS DOUBLE)
              - ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
                * CAST(sx AS DOUBLE))
             / CAST(n AS DOUBLE), 6) AS intercept
FROM mom
ORDER BY l_returnflag
"""


# ------------------------------------------------------- blocked fuzzy match
FUZZY_MAX_DIST = 4


def q_fuzzy_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity-resolution candidate pairs over part names: DISTINCT names
    blocked on their last word (the head noun), paired within blocks, and
    gated on Levenshtein ≤ 4. Classic blocking: the quadratic edit-distance
    predicate runs only inside blocks, so candidates scale with
    Σ|block|² instead of |names|².

    Scale: the distinct-name collapse happens first (names ≪ rows); the
    self-join shuffles on the block key; a degenerate hot block is the
    same failure mode as dedup's hot buckets (guarded there by overflow to
    sort-merge — here block cardinality is naturally bounded by the name
    grammar). Levenshtein is unit-cost in both engines → integer-exact."""
    names = (
        load_table(spark, sf_dir, "part")
        .select(F.col("p_name").alias("name"))
        .distinct()
        .withColumn("block", F.element_at(F.split(F.col("name"), " "), -1))
    )
    a, b = names.alias("a"), names.alias("b")
    return (
        a.join(
            b,
            (F.col("a.block") == F.col("b.block"))
            & (F.col("a.name") < F.col("b.name")),
        )
        .select(
            F.col("a.block").alias("block"),
            F.col("a.name").alias("name_a"),
            F.col("b.name").alias("name_b"),
            F.levenshtein(F.col("a.name"), F.col("b.name")).alias("edit_dist"),
        )
        .where(F.col("edit_dist") <= FUZZY_MAX_DIST)
        .orderBy("block", "name_a", "name_b")
    )


SQL_FUZZY_NAME_PAIRS = f"""
WITH names AS (
  SELECT DISTINCT p_name AS name,
         list_extract(string_split(p_name, ' '), -1) AS block
  FROM part
)
SELECT a.block AS block, a.name AS name_a, b.name AS name_b,
       CAST(levenshtein(a.name, b.name) AS INTEGER) AS edit_dist
FROM names a
JOIN names b ON a.block = b.block AND a.name < b.name
WHERE levenshtein(a.name, b.name) <= {FUZZY_MAX_DIST}
ORDER BY block, name_a, name_b
"""


# ------------------------------------------------------------ IQR outliers
def q_balance_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey-fence outlier detection per nation: Q1/Q3 of customer account
    balance via the engine's lower-nearest-rank percentile (A8 semantics —
    actual data values, no interpolation, so the fences are exact
    cross-engine), outliers beyond 1.5×IQR counted per nation.

    Scale: BOTH quartiles come from ONE rank window over the per-nation
    partitioning (two conditional picks on the same pass, not two sorts);
    the fence check is a broadcast join of 25 quartile rows back onto the
    customer scan."""
    cust = load_table(spark, sf_dir, "customer").where(F.col("c_acctbal").isNotNull())
    w_order = Window.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").asc())
    w_all = Window.partitionBy("c_nationkey")
    cnt = F.count(F.lit(1)).over(w_all)
    ranked = cust.select(
        "c_nationkey",
        "c_acctbal",
        F.row_number().over(w_order).alias("rn"),
        (F.floor(0.25 * (cnt - 1)) + 1).alias("t25"),
        (F.floor(0.75 * (cnt - 1)) + 1).alias("t75"),
    )
    quart = ranked.groupBy("c_nationkey").agg(
        F.max(F.when(F.col("rn") == F.col("t25"), F.col("c_acctbal"))).alias("q1"),
        F.max(F.when(F.col("rn") == F.col("t75"), F.col("c_acctbal"))).alias("q3"),
    )
    fenced = cust.join(F.broadcast(quart), "c_nationkey").select(
        "c_nationkey",
        "q1",
        "q3",
        (
            (F.col("c_acctbal") < F.col("q1") - 1.5 * (F.col("q3") - F.col("q1")))
            | (F.col("c_acctbal") > F.col("q3") + 1.5 * (F.col("q3") - F.col("q1")))
        ).alias("is_outlier"),
    )
    return (
        fenced.groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.max("q1").alias("q1"),
            F.max("q3").alias("q3"),
            F.sum(F.when(F.col("is_outlier"), 1).otherwise(0))
            .cast("long")
            .alias("n_outliers"),
        )
        .orderBy("c_nationkey")
    )


SQL_BALANCE_OUTLIERS = """
WITH ranked AS (
  SELECT c_nationkey, c_acctbal,
         ROW_NUMBER() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal ASC) AS rn,
         CAST(floor(0.25 * (COUNT(*) OVER (PARTITION BY c_nationkey) - 1)) AS BIGINT) + 1 AS t25,
         CAST(floor(0.75 * (COUNT(*) OVER (PARTITION BY c_nationkey) - 1)) AS BIGINT) + 1 AS t75
  FROM customer WHERE c_acctbal IS NOT NULL
),
quart AS (
  SELECT c_nationkey,
         MAX(CASE WHEN rn = t25 THEN c_acctbal END) AS q1,
         MAX(CASE WHEN rn = t75 THEN c_acctbal END) AS q3
  FROM ranked GROUP BY c_nationkey
)
SELECT c.c_nationkey,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       MAX(q.q1) AS q1,
       MAX(q.q3) AS q3,
       CAST(SUM(CASE WHEN c.c_acctbal < q.q1 - 1.5 * (q.q3 - q.q1)
                       OR c.c_acctbal > q.q3 + 1.5 * (q.q3 - q.q1)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
FROM customer c JOIN quart q ON c.c_nationkey = q.c_nationkey
WHERE c.c_acctbal IS NOT NULL
GROUP BY c.c_nationkey
ORDER BY c.c_nationkey
"""


# ----------------------------------------------------------- PII exposure
def _plant_pii(doc_id, text):  # Spark Columns in, Column out
    """Deterministic PII derived from doc_id, appended to text. The
    driver's synthetic corpus contains no PII-shaped strings (verified in
    operators/pii.py's module note), so a stats query over raw text would
    be vacuously all-zero; planting from doc_id makes the oracle exercise
    every pattern, the sequential-stage counting, and the redaction
    arithmetic. Every doc gets an email; docs with doc_id%3==0 get an
    IPv4; doc_id%5==0 get a phone — so sources differ in exposure mix."""
    did = doc_id.cast("string")
    email = F.concat(F.lit(" reach me at user"), did, F.lit("@example.com"))
    ip = F.when(
        doc_id % 3 == 0,
        F.concat(
            F.lit(" host 10."),
            (doc_id % 200).cast("string"),
            F.lit("."),
            (F.expr("doc_id DIV 200") % 200).cast("string"),
            F.lit(".7"),
        ),
    ).otherwise(F.lit(""))
    phone = F.when(
        doc_id % 5 == 0,
        F.concat(
            F.lit(" call +1 (415) 555-0"),
            F.lpad((doc_id % 900 + 100).cast("string"), 3, "0"),
        ),
    ).otherwise(F.lit(""))
    return F.concat(text, email, ip, phone)


def q_pii_redaction_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source PII exposure report over a deterministically PII-planted
    corpus — the driver-visible twin of operators/pii.py (whose raw-corpus
    stats would be vacuous; see tests/test_pii.py for the synthetic-corpus
    property tests). Counts are taken at each SEQUENTIAL redaction stage
    (email on raw text, ip after email-redaction, phone after both), so
    every count is exactly what redact_pii masks at that stage.

    Scale: pure map-side regexp expressions inside whole-stage codegen —
    the only shuffle is the one-row-per-source rollup. At 100 TB this is
    a single pruned scan; the regexes are the Java∩RE2 intersection
    (operators/pii.py:22-25) so the DuckDB oracle hash-matches exactly.
    """
    from seo_audit_etl_actor_spark.operators.pii import (
        EMAIL_RE,
        IPV4_RE,
        MASKS,
        PHONE_RE,
        redact_pii,
    )

    docs = load_table(spark, sf_dir, "documents")
    t = _plant_pii(F.col("doc_id"), F.col("text"))
    after_email = F.regexp_replace(t, EMAIL_RE, MASKS["email"])
    after_ip = F.regexp_replace(after_email, IPV4_RE, MASKS["ip"])
    counts = {
        "email": F.regexp_count(t, F.lit(EMAIL_RE)),
        "ip": F.regexp_count(after_email, F.lit(IPV4_RE)),
        "phone": F.regexp_count(after_ip, F.lit(PHONE_RE)),
    }
    scored = docs.select(
        "source",
        *[c.alias(f"n_{k}") for k, c in counts.items()],
        (F.length(t) - F.length(redact_pii(t))).alias("chars_delta"),
    )
    aggs = [F.count(F.lit(1)).alias("n_docs")]
    for k in ("email", "ip", "phone"):
        aggs.append(F.sum((F.col(f"n_{k}") > 0).cast("long")).alias(f"docs_with_{k}"))
        aggs.append(F.sum(f"n_{k}").alias(f"total_{k}"))
    aggs.append(F.sum("chars_delta").alias("chars_redacted"))
    return scored.groupBy("source").agg(*aggs).orderBy("source")


def _sql_pii_redaction_audit() -> str:
    from seo_audit_etl_actor_spark.operators.pii import (
        EMAIL_RE,
        IPV4_RE,
        MASKS,
        PHONE_RE,
    )

    planted = (
        "text || ' reach me at user' || CAST(doc_id AS VARCHAR) || '@example.com'"
        " || CASE WHEN doc_id % 3 = 0 THEN ' host 10.' || CAST(doc_id % 200 AS VARCHAR)"
        " || '.' || CAST((doc_id // 200) % 200 AS VARCHAR) || '.7' ELSE '' END"
        " || CASE WHEN doc_id % 5 = 0 THEN ' call +1 (415) 555-0'"
        " || lpad(CAST(doc_id % 900 + 100 AS VARCHAR), 3, '0') ELSE '' END"
    )
    after_email = f"regexp_replace(t, '{EMAIL_RE}', '{MASKS['email']}', 'g')"
    after_ip = f"regexp_replace({after_email}, '{IPV4_RE}', '{MASKS['ip']}', 'g')"
    after_all = f"regexp_replace({after_ip}, '{PHONE_RE}', '{MASKS['phone']}', 'g')"
    return f"""
WITH planted AS (SELECT source, {planted} AS t FROM documents),
scored AS (
  SELECT source,
         len(regexp_extract_all(t, '{EMAIL_RE}')) AS n_email,
         len(regexp_extract_all({after_email}, '{IPV4_RE}')) AS n_ip,
         len(regexp_extract_all({after_ip}, '{PHONE_RE}')) AS n_phone,
         length(t) - length({after_all}) AS chars_delta
  FROM planted
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN n_email > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_with_email,
       CAST(SUM(n_email) AS BIGINT) AS total_email,
       CAST(SUM(CASE WHEN n_ip > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_with_ip,
       CAST(SUM(n_ip) AS BIGINT) AS total_ip,
       CAST(SUM(CASE WHEN n_phone > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_with_phone,
       CAST(SUM(n_phone) AS BIGINT) AS total_phone,
       CAST(SUM(chars_delta) AS BIGINT) AS chars_redacted
FROM scored
GROUP BY source
ORDER BY source
"""


SQL_PII_REDACTION_AUDIT = _sql_pii_redaction_audit()
