"""Scale-pattern queries, round 3: Misra-Gries heavy hitters, an
approx-quantile bound contract, algebraic partial-aggregate merge
(incremental materialized-view maintenance), and fixed-iteration integer
PageRank. Extension surface beyond the reference (src/etl.js has no
frequency/sketch/graph analytics) — each query is the small-SF correctness
anchor for a pattern whose reason to exist is 100 TB.

Determinism discipline: integer arithmetic end-to-end (PageRank runs on
quantized BIGINT mass with floor division so neighbor-sum order can't
change a bit), raw data values (quantile outputs are order statistics, not
interpolations), and bound-contract booleans where the estimate itself is
implementation-defined (the approx_distinct_users pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from seo_audit_etl_actor_spark.operators.heavyhitters import exact_heavy_hitters
from seo_audit_etl_actor_spark.operators.text import token_count, tokens
from seo_audit_etl_actor_spark.queries.llm_ext import _TOKS
from seo_audit_etl_actor_spark.session import ensure_parallelism, load_table

# ------------------------------------------------------------- heavy hitters
HH_K = 64  # threshold = N/64 ≈ 1.6% of the token stream; MG capacity 63


def q_heavy_hitter_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokens whose global frequency exceeds N/64, found WITHOUT a
    full-vocabulary shuffle: per-partition Misra-Gries candidate summaries
    (map-only, O(64) state per task), then an exact recount of the
    candidate set behind a broadcast semi-join. Output equals the plain
    `GROUP BY token HAVING cf*64 > N` — the superset guarantee plus exact
    recount make the two-phase plan partitioning-invariant (see
    operators/heavyhitters.py).

    On the synthetic corpus the vocabulary is tiny, so the candidate set
    is nearly the vocabulary; the design targets the real shape — billions
    of distinct tokens, dozens of heavy ones."""
    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    return exact_heavy_hitters(
        docs, F.explode(tokens(F.col("text"))), "text", HH_K
    ).orderBy(F.col("n_occurrences").desc(), "token")


SQL_HEAVY_HITTER_TOKENS = f"""
WITH ex AS (SELECT unnest({_TOKS.format(c='text')}) AS token FROM documents),
cf AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS n_occurrences FROM ex GROUP BY token),
tot AS (SELECT COUNT(*) AS n FROM ex)
SELECT token, n_occurrences
FROM cf, tot
WHERE n_occurrences * {HH_K} > n
ORDER BY n_occurrences DESC, token
"""


# ------------------------------------------------------ approx-quantile bound
QAPPROX_ACCURACY = 10000  # rank error ≤ N/accuracy
QAPPROX_TOL = 0.001  # bound window ±0.1% of ranks — 10× the guarantee


def q_median_bound_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percentile_approx under a bound contract: the sketch estimate is
    implementation-defined (not hashable cross-engine), so — like
    `approx_distinct_users` — the query emits the EXACT nearest-rank median
    plus a boolean asserting the estimate lies between the order statistics
    at ranks (0.5±0.001)·N; the oracle emits TRUE. percentile_approx's
    rank-error guarantee is N/10000, 10× tighter than the window.

    Scale: percentile_approx (KLL-style mergeable sketch, one map-side pass
    + tiny merge) IS the 100 TB path; the exact order statistics exist only
    to police it, via one global sort — the same A8 nearest-rank machinery
    as `p75_nearest_rank`."""
    o = load_table(spark, sf_dir, "orders").select("o_totalprice").where(
        F.col("o_totalprice").isNotNull()
    )
    n = F.count(F.lit(1)).over(Window.partitionBy())
    ranked = o.select(
        "o_totalprice",
        F.row_number().over(Window.orderBy("o_totalprice")).alias("rn"),
        n.alias("n"),
    )
    lo_r = F.greatest(F.lit(1), F.floor((0.5 - QAPPROX_TOL) * F.col("n")).cast("int"))
    mid_r = (F.floor(0.5 * (F.col("n") - 1)) + 1).cast("int")
    hi_r = F.ceil((0.5 + QAPPROX_TOL) * F.col("n")).cast("int")
    stats = ranked.agg(
        F.max("n").alias("n_rows"),
        F.max(F.when(F.col("rn") == lo_r, F.col("o_totalprice"))).alias("__lo"),
        F.max(F.when(F.col("rn") == mid_r, F.col("o_totalprice"))).alias("exact_median"),
        F.max(F.when(F.col("rn") == hi_r, F.col("o_totalprice"))).alias("__hi"),
    )
    approx = o.agg(
        F.percentile_approx("o_totalprice", 0.5, QAPPROX_ACCURACY).alias("__est")
    )
    return stats.crossJoin(F.broadcast(approx)).select(
        "n_rows",
        "exact_median",
        (
            (F.col("__est") >= F.col("__lo")) & (F.col("__est") <= F.col("__hi"))
        ).alias("within_bound"),
    )


SQL_MEDIAN_BOUND_CHECK = """
WITH ranked AS (
  SELECT o_totalprice,
         ROW_NUMBER() OVER (ORDER BY o_totalprice) AS rn,
         COUNT(*) OVER () AS n
  FROM orders WHERE o_totalprice IS NOT NULL
)
SELECT CAST(MAX(n) AS BIGINT) AS n_rows,
       MAX(CASE WHEN rn = CAST(floor(0.5 * (n - 1)) AS BIGINT) + 1
                THEN o_totalprice END) AS exact_median,
       TRUE AS within_bound
FROM ranked
"""


# ---------------------------------------------------- partial-aggregate merge
def q_incremental_agg_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view maintenance: per-(shard, source)
    partial summaries — (count, sum, min, max) are all algebraic — merged
    into the full per-source rollup WITHOUT rescanning rows. The merged
    result provably equals the direct aggregate (the oracle computes the
    direct form), which is the property that lets a 100 TB pipeline fold a
    daily delta summary into a corpus summary in O(|summary|).

    Scale: the expensive pass is the shard-level aggregate (map-side
    combined); the merge shuffles only summary rows."""
    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    shard = (F.col("doc_id") % 2).alias("shard")
    partial = (
        docs.select(shard, "source", token_count(F.col("text")).alias("nt"))
        .groupBy("shard", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("nt").cast("long").alias("sum_tokens"),
            F.min("nt").alias("min_tokens"),
            F.max("nt").alias("max_tokens"),
        )
    )
    return (
        partial.groupBy("source")
        .agg(
            F.sum("n_docs").cast("long").alias("n_docs"),
            F.sum("sum_tokens").cast("long").alias("sum_tokens"),
            F.min("min_tokens").alias("min_tokens"),
            F.max("max_tokens").alias("max_tokens"),
            F.round(F.sum("sum_tokens") / F.sum("n_docs"), 6).alias("avg_tokens"),
        )
        .orderBy("source")
    )


SQL_INCREMENTAL_AGG_MERGE = f"""
WITH sized AS (
  SELECT source, CAST(len({_TOKS.format(c='text')}) AS BIGINT) AS nt FROM documents
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(nt) AS BIGINT) AS sum_tokens,
       MIN(nt) AS min_tokens,
       MAX(nt) AS max_tokens,
       ROUND(SUM(nt) / COUNT(*), 6) AS avg_tokens
FROM sized
GROUP BY source
ORDER BY source
"""


# ------------------------------------------------------------ integer PageRank
PR_ITERS = 3
PR_Q = 10**12  # total mass quantum
PR_SHARE_SCALE = 10**6  # per-edge weight share quantum
PR_DAMP_NUM, PR_DAMP_DEN = 85, 100


def q_nation_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted PageRank over the customer-nation → supplier-nation trade
    graph (edge weight = lineitem count), run for exactly 3 iterations in
    QUANTIZED INTEGER arithmetic: mass is BIGINT (quantum 1e-12 of total),
    edge shares are BIGINT (quantum 1e-6), every division is floor
    division — so neighbor-sum ordering cannot change a bit and the result
    hash-matches an engine that evaluates in any order. The fixed-iteration
    iterative-join pattern (same class as connected components), with the
    per-iteration plan: ranks ⨝ edges on src → groupBy dst → join nodes.

    Scale: the graph here is 25 nodes, but the plan is the one that runs on
    a billion-edge graph — each iteration is one shuffle on the edge key,
    O(E) rows of 24 bytes, and the edge list (with precomputed shares) is
    built once and reused across iterations."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    edges_w = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(F.col("c_nationkey").alias("src"), F.col("s_nationkey").alias("dst"))
        .agg(F.count(F.lit(1)).alias("w"))
    )
    out_w = edges_w.groupBy("src").agg(F.sum("w").alias("w_out"))
    # per-edge integer share of the source's outgoing mass, built once —
    # and MATERIALIZED once: every iteration (and the node/count derivations)
    # references this subtree, and without lineage truncation Catalyst
    # re-derives the full lineitem join per reference (22 scans observed).
    # localCheckpoint pins the tiny edge list (|E| rows), exactly the
    # components.py iterative pattern; at 100 TB this is the persisted edge
    # list every graph engine builds before iterating.
    edges = (
        edges_w.join(out_w, "src")
        .select(
            "src",
            "dst",
            F.expr(f"CAST((w * {PR_SHARE_SCALE}) DIV w_out AS BIGINT)").alias("share"),
        )
        .localCheckpoint(eager=True)
    )
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_nodes = nodes.agg(F.count(F.lit(1)).alias("__n"))
    ranks = nodes.crossJoin(F.broadcast(n_nodes)).select(
        "node", F.expr(f"CAST({PR_Q} DIV __n AS BIGINT)").alias("rank_q")
    )
    teleport = F.expr(
        f"CAST(({PR_DAMP_DEN - PR_DAMP_NUM} * {PR_Q} DIV {PR_DAMP_DEN}) DIV __n AS BIGINT)"
    )
    for _ in range(PR_ITERS):
        inflow = (
            ranks.join(edges, ranks.node == edges.src)
            .select(
                F.col("dst").alias("node"),
                F.expr(f"CAST((rank_q * share) DIV {PR_SHARE_SCALE} AS BIGINT)").alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").cast("long").alias("inflow"))
        )
        ranks = (
            nodes.join(inflow, "node", "left")
            .crossJoin(F.broadcast(n_nodes))
            .select(
                "node",
                (
                    teleport
                    + F.expr(
                        f"CAST(({PR_DAMP_NUM} * coalesce(inflow, 0)) DIV {PR_DAMP_DEN} AS BIGINT)"
                    )
                ).alias("rank_q"),
            )
        )
    return ranks.select(F.col("node").alias("nationkey"), "rank_q").orderBy(
        F.col("rank_q").desc(), "nationkey"
    )


def _sql_nation_pagerank() -> str:
    teleport = (
        f"(({PR_DAMP_DEN - PR_DAMP_NUM} * {PR_Q}) // {PR_DAMP_DEN})"
        " // (SELECT n FROM n_nodes)"
    )
    ctes = [
        """edges_w AS (
  SELECT c_nationkey AS src, s_nationkey AS dst, CAST(COUNT(*) AS BIGINT) AS w
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN supplier ON l_suppkey = s_suppkey
  GROUP BY src, dst
)""",
        f"""edges AS (
  SELECT src, dst,
         CAST((w * {PR_SHARE_SCALE}) // SUM(w) OVER (PARTITION BY src) AS BIGINT)
             AS share
  FROM edges_w
)""",
        "nodes AS (SELECT DISTINCT src AS node FROM edges_w"
        " UNION SELECT DISTINCT dst FROM edges_w)",
        "n_nodes AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nodes)",
        f"r0 AS (SELECT node, CAST({PR_Q} // (SELECT n FROM n_nodes) AS BIGINT)"
        " AS rank_q FROM nodes)",
    ]
    for i in range(PR_ITERS):
        ctes.append(f"""r{i + 1} AS (
  SELECT nodes.node,
         CAST({teleport}
              + ({PR_DAMP_NUM} * coalesce(inf.inflow, 0)) // {PR_DAMP_DEN}
              AS BIGINT) AS rank_q
  FROM nodes LEFT JOIN (
    SELECT dst AS node,
           CAST(SUM((rank_q * share) // {PR_SHARE_SCALE}) AS BIGINT) AS inflow
    FROM r{i} JOIN edges ON r{i}.node = edges.src
    GROUP BY dst
  ) inf ON nodes.node = inf.node
)""")
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT node AS nationkey, rank_q FROM r{PR_ITERS}"
        " ORDER BY rank_q DESC, nationkey"
    )


SQL_NATION_PAGERANK = _sql_nation_pagerank()
