"""Driver-visible audit queries for the operator-only surface (round 5):
the chunker's text extraction, the table profiler, and the FFD packer's
invariants — upgrading operators that previously had only local pytest
evidence (operators/chunking.py, operators/profiling.py,
operators/packing.py) to externally-oracled catalog rows.

Engine extension surface beyond the reference (whose only profiling is
per-row predicates, src/etl.js:183-222). Each query keeps the repo's
exact-arithmetic discipline so DuckDB hash-matches bit-for-bit: chunk
text compares by md5, profiler lengths are integer SUMs (not float
averages), packer invariants are integer flags provable without
re-running FFD oracle-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from seo_audit_etl_actor_spark.operators.chunking import chunk_documents
from seo_audit_etl_actor_spark.operators.packing import pack_sequences
from seo_audit_etl_actor_spark.operators.text import token_count
from seo_audit_etl_actor_spark.queries.llm_ext import (
    CHUNK_OVERLAP,
    CHUNK_TOKENS,
    _TOKS,
)
from seo_audit_etl_actor_spark.session import ensure_parallelism, load_table

# ------------------------------------------------------ chunk extraction


def q_chunk_text_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The chunker's actual output text, hashed: (doc_id, chunk_idx,
    n_chunk_tokens, chunk_hash). Geometry is shared with `chunk_stats`
    (same CHUNK_TOKENS/CHUNK_OVERLAP); hashing the text keeps the driver
    payload small while still pinning every produced byte.

    Scale: chunk_documents is map-only (explode + slice + concat_ws in
    whole-stage codegen, zero shuffles); md5 is a native expression. The
    only exchange is the final presentation sort."""
    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    chunks = chunk_documents(docs, CHUNK_TOKENS, CHUNK_OVERLAP)
    return chunks.select(
        "doc_id",
        "chunk_idx",
        "n_chunk_tokens",
        F.md5(F.col("chunk_text")).alias("chunk_hash"),
    ).orderBy("doc_id", "chunk_idx")


def _sql_chunk_text_extraction() -> str:
    stride = CHUNK_TOKENS - CHUNK_OVERLAP
    toks = _TOKS.format(c="text")
    return f"""
WITH sized AS (
  SELECT doc_id, {toks} AS toks, len({toks}) AS n
  FROM documents
  WHERE len({toks}) > 0
),
chunked AS (
  SELECT doc_id,
         chunk_idx,
         LEAST({CHUNK_TOKENS}, n - chunk_idx * {stride}) AS n_chunk_tokens,
         array_to_string(
           list_slice(toks,
                      chunk_idx * {stride} + 1,
                      chunk_idx * {stride} + LEAST({CHUNK_TOKENS}, n - chunk_idx * {stride})),
           ' ') AS chunk_text
  FROM sized,
       UNNEST(range(0, CAST(1 + CEIL(GREATEST(n - {CHUNK_TOKENS}, 0)
                                     / {stride}.0) AS BIGINT))) AS t(chunk_idx)
)
SELECT doc_id,
       CAST(chunk_idx AS BIGINT) AS chunk_idx,
       CAST(n_chunk_tokens AS BIGINT) AS n_chunk_tokens,
       md5(chunk_text) AS chunk_hash
FROM chunked
ORDER BY doc_id, chunk_idx
"""


SQL_CHUNK_TEXT_EXTRACTION = _sql_chunk_text_extraction()

# ------------------------------------------------------- table profiler

_PROFILE_COLS: list[tuple[str, str]] = [
    # (column, string-representation SQL over a documents row) — identical
    # text in Spark and DuckDB, so reprs agree byte-for-byte.
    ("doc_id", "CAST(doc_id AS STRING)"),
    ("lang", "lang"),
    ("n_chars", "CAST(n_chars AS STRING)"),
    ("source", "source"),
    ("text", "text"),
]


def q_table_profile_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-stats audit twin of `operators/profiling.profile_table`
    (the audit/prod split of approx_distinct_users): per column of
    `documents` — row count, null count, EXACT distinct count, min/max
    string representation, and total representation length.

    One scan: the table unpivots via `stack` (map-side, no Expand), then
    a single groupBy on the column name computes every stat. Exact
    distinct here costs a per-(column,value) partial dedup — acceptable
    for an audit; the production profiler keeps the one-row HLL pass."""
    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    n = len(_PROFILE_COLS)
    stack_args = ", ".join(f"'{name}', {repr_sql}" for name, repr_sql in _PROFILE_COLS)
    stacked = docs.select(
        F.expr(f"stack({n}, {stack_args}) AS (col_name, value)")
    )
    return (
        stacked.groupBy("col_name")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.when(F.col("value").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_nulls"),
            F.countDistinct("value").alias("n_distinct"),
            F.min("value").alias("min_repr"),
            F.max("value").alias("max_repr"),
            F.coalesce(F.sum(F.length("value")), F.lit(0))
            .cast("long")
            .alias("sum_len"),
        )
        .orderBy("col_name")
    )


def _sql_table_profile_audit() -> str:
    legs = []
    for name, repr_sql in _PROFILE_COLS:
        rep = repr_sql.replace("AS STRING", "AS VARCHAR")
        legs.append(
            f"""
SELECT '{name}' AS col_name,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(*) - COUNT({rep}) AS BIGINT) AS n_nulls,
       CAST(COUNT(DISTINCT {rep}) AS BIGINT) AS n_distinct,
       MIN({rep}) AS min_repr,
       MAX({rep}) AS max_repr,
       CAST(COALESCE(SUM(length({rep})), 0) AS BIGINT) AS sum_len
FROM documents"""
        )
    return " UNION ALL ".join(legs) + " ORDER BY col_name"


SQL_TABLE_PROFILE_AUDIT = _sql_table_profile_audit()

# ------------------------------------------------------- packer invariants

PACK_MAX_TOKENS = 512


def q_ffd_packing_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-checkable invariants of `pack_sequences` over the documents
    corpus, as a one-row summary the oracle can predict WITHOUT running
    FFD: the assignment itself is not SQL-expressible, but its contract
    is — every doc packed exactly once, no multi-doc sequence over
    capacity, reported seq_fill consistent with the actual per-sequence
    sum, and the sequence count inside its provable bounds
    (ceil(sum(min(n_tok, max))/max) <= n_seqs <= n_docs; the capped
    numerator keeps the pigeonhole bound valid for single-doc overflow
    sequences).

    Scale: pack_sequences is hash-bucketed applyInPandas with per-bucket
    bounded state (operators/packing.py); the audit adds one seq_id
    shuffle and a scalar aggregate."""
    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    sized = docs.select(
        "doc_id", token_count(F.col("text")).alias("n_tokens")
    ).where(F.col("n_tokens") > 0)
    packed = pack_sequences(sized, PACK_MAX_TOKENS)
    per_seq = packed.groupBy("seq_id").agg(
        F.sum("n_tokens").alias("fill"),
        F.count(F.lit(1)).alias("n_in_seq"),
        F.countDistinct("doc_id").alias("n_distinct_docs"),
        F.min("seq_fill").alias("rep_min"),
        F.max("seq_fill").alias("rep_max"),
    )
    m = F.lit(PACK_MAX_TOKENS)
    summary = per_seq.agg(
        F.sum("n_in_seq").cast("long").alias("n_docs"),
        F.sum("fill").cast("long").alias("total_tokens"),
        # duplicates would make n_in_seq > n_distinct_docs somewhere, and a
        # doc packed into two sequences would make n_docs exceed the
        # oracle's corpus count (caught by the n_docs value itself).
        F.min(
            (F.col("n_in_seq") == F.col("n_distinct_docs")).cast("long")
        ).alias("exact_once"),
        F.min(
            ((F.col("fill") <= m) | (F.col("n_in_seq") == 1)).cast("long")
        ).alias("capacity_ok"),
        F.min(
            ((F.col("rep_min") == F.col("fill")) & (F.col("rep_max") == F.col("fill"))).cast("long")
        ).alias("fill_reported_ok"),
        F.count(F.lit(1)).alias("__n_seqs"),
        F.sum(F.least(F.col("fill"), m)).alias("__capped"),
    )
    return summary.select(
        "n_docs",
        "total_tokens",
        "exact_once",
        "capacity_ok",
        "fill_reported_ok",
        (F.col("__n_seqs") >= F.ceil(F.col("__capped") / m))
        .cast("long")
        .alias("seqs_lower_ok"),
        (F.col("__n_seqs") <= F.col("n_docs")).cast("long").alias("seqs_upper_ok"),
    )


def _sql_ffd_packing_audit() -> str:
    toks = _TOKS.format(c="text")
    return f"""
WITH sized AS (
  SELECT doc_id, len({toks}) AS n_tokens
  FROM documents
  WHERE len({toks}) > 0
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       CAST(1 AS BIGINT) AS exact_once,
       CAST(1 AS BIGINT) AS capacity_ok,
       CAST(1 AS BIGINT) AS fill_reported_ok,
       CAST(1 AS BIGINT) AS seqs_lower_ok,
       CAST(1 AS BIGINT) AS seqs_upper_ok
FROM sized
"""


SQL_FFD_PACKING_AUDIT = _sql_ffd_packing_audit()

# ------------------------------------------------- lake / MV merge audit

# Exact-integer measures (merge ≡ recompute holds bit-for-bit; see
# operators/mv.py). The CASE/literal measure deliberately exercises the
# r5 _prefix_expr fix ('F' must stay an unqualified string literal).
MV_MEASURES = {
    "sum_cust": "CAST(o_custkey AS BIGINT)",
    "n_f_status": "CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END",
}
_MV_ADD_OFFSET = 100_000_000  # synthetic keys far above any real o_orderkey


def q_mv_merge_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-visible oracle for the versioned-lake + incremental-MV
    surface (VERDICT r5 task 3): publish orders as lake v1, publish a
    DETERMINISTIC mutation as v2 (keys %7==0 removed, %7==1 moved to a
    synthetic priority group, %7==3 cloned under offset keys), read the
    CDC diff between the versions, apply it to the v1 grouped view with
    `apply_cdc_to_view`, and emit a one-row summary: the CDC class
    counts, the MERGED view's own aggregates, and a merge≡recompute
    equality flag. The oracle predicts every value from the mutation
    rules alone — if snapshot publish, time travel, the diff classifier,
    or the delta merge drifted, some BIGINT here moves.

    The result is computed eagerly (three small collects: class counts, a
    mismatch count, one summary row) so the temp lake can be removed
    before returning — the returned frame is a one-row local relation
    with no disk dependency.

    Scale: publish is two parquet writes; the diff is ONE full-outer
    shuffle on the key; the view delta touches only changed rows
    (operators/mv.py) — the 100 TB shape, exercised here end-to-end."""
    import shutil
    import tempfile

    from seo_audit_etl_actor_spark.operators import lake_maintenance as lm
    from seo_audit_etl_actor_spark.operators.mv import apply_cdc_to_view, grouped_sum_view

    orders = load_table(spark, sf_dir, "orders")
    lake_dir = tempfile.mkdtemp(prefix="spark_graft_mv_audit_")
    try:
        lm.publish_version(orders, lake_dir)
        key7 = F.col("o_orderkey") % 7
        v2 = (
            orders.where(key7 != 0)
            .withColumn(
                "o_orderpriority",
                F.when(key7 == 1, F.lit("9-SYNTH")).otherwise(F.col("o_orderpriority")),
            )
            .unionByName(
                orders.where(key7 == 3).withColumn(
                    "o_orderkey", F.col("o_orderkey") + F.lit(_MV_ADD_OFFSET)
                )
            )
        )
        lm.publish_version(v2, lake_dir)
        cdc = lm.diff_versions(
            spark, lake_dir, 1, 2, keys=["o_orderkey"], include_values=True
        )
        view_v1 = grouped_sum_view(
            lm.read_lake(spark, lake_dir, 1), "o_orderpriority", MV_MEASURES
        )
        merged = apply_cdc_to_view(view_v1, cdc, "o_orderpriority", MV_MEASURES)
        recomputed = grouped_sum_view(
            lm.read_lake(spark, lake_dir, 2), "o_orderpriority", MV_MEASURES
        )
        changes = {
            r["change"]: r["n"]
            for r in cdc.groupBy("change").agg(F.count(F.lit(1)).alias("n")).collect()
        }
        cols = ["n_rows", *MV_MEASURES]
        eq = merged.alias("m").join(recomputed.alias("r"), "o_orderpriority", "full_outer")
        same = F.lit(True)
        for c in cols:
            same = same & F.col(f"m.{c}").eqNullSafe(F.col(f"r.{c}"))
        n_mismatch = eq.where(~same).count()
        summary = merged.agg(
            F.count(F.lit(1)).alias("g"),
            F.sum("n_rows").alias("vr"),
            F.sum("sum_cust").alias("sc"),
            F.sum("n_f_status").alias("nf"),
        ).collect()[0]
        row = (
            int(changes.get("added", 0)),
            int(changes.get("removed", 0)),
            int(changes.get("changed", 0)),
            int(changes.get("unchanged", 0)),
            int(summary["g"]),
            int(summary["vr"]),
            int(summary["sc"]),
            int(summary["nf"]),
            1 if n_mismatch == 0 else 0,
        )
        return spark.createDataFrame(
            [row],
            "n_added long, n_removed long, n_changed long, n_unchanged long, "
            "n_groups long, view_rows long, view_sum_cust long, "
            "view_n_f_status long, merge_equals_recompute long",
        )
    finally:
        shutil.rmtree(lake_dir, ignore_errors=True)


SQL_MV_MERGE_AUDIT = f"""
WITH v2 AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 7 = 1 THEN '9-SYNTH' ELSE o_orderpriority END AS o_orderpriority,
         o_custkey, o_orderstatus
  FROM orders WHERE o_orderkey % 7 <> 0
  UNION ALL
  SELECT o_orderkey + {_MV_ADD_OFFSET}, o_orderpriority, o_custkey, o_orderstatus
  FROM orders WHERE o_orderkey % 7 = 3
)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM orders WHERE o_orderkey % 7 = 3) AS n_added,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM orders WHERE o_orderkey % 7 = 0) AS n_removed,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM orders WHERE o_orderkey % 7 = 1) AS n_changed,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM orders WHERE o_orderkey % 7 NOT IN (0, 1)) AS n_unchanged,
       (SELECT CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT) FROM v2) AS n_groups,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM v2) AS view_rows,
       (SELECT CAST(SUM(o_custkey) AS BIGINT) FROM v2) AS view_sum_cust,
       (SELECT CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) FROM v2) AS view_n_f_status,
       CAST(1 AS BIGINT) AS merge_equals_recompute
"""
