"""Document chunking — the TEXT-producing operator behind `chunk_stats`'
token accounting (engine extension surface): split each document into
fixed-token windows with overlap, emitting the actual chunk text.

Pure native expressions end-to-end (tokens → slice → concat_ws inside an
explode of sequence()): no Python in the path, so chunk extraction rides
whole-stage codegen and is a map-only operator — zero shuffles, output
rows stream straight to the next stage (embedding, dedup, packing).

Chunk geometry matches `queries/llm_ext.q_chunk_stats` exactly:
stride = chunk_tokens - overlap; n_chunks = 1 + ceil(max(0, n - chunk) /
stride); the last chunk is short (n - start tokens). The equivalence test
cross-checks chunk token counts against the stats query's arithmetic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from seo_audit_etl_actor_spark.operators.text import tokens


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int,
    overlap: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """One row per chunk: (doc_id, chunk_idx, n_chunk_tokens, chunk_text).
    Whitespace-token windows; token boundaries are the same `tokens()`
    expression every text operator uses, so a chunk's text re-tokenizes to
    exactly its reported n_chunk_tokens (round-trip-tested)."""
    if not (0 <= overlap < chunk_tokens):
        raise ValueError("need 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap
    toks: Column = tokens(F.col(text_col))
    base = docs.select(F.col(id_col), toks.alias("__toks")).where(
        F.size("__toks") > 0
    )
    n = F.size("__toks")
    n_chunks = (
        1 + F.ceil(F.greatest(n - chunk_tokens, F.lit(0)) / F.lit(stride))
    ).cast("int")
    start = F.col("chunk_idx") * stride  # 0-based token offset
    length = F.least(F.lit(chunk_tokens), n - start)
    return (
        base.withColumn("chunk_idx", F.explode(F.sequence(F.lit(0), n_chunks - 1)))
        .select(
            id_col,
            F.col("chunk_idx").cast("long").alias("chunk_idx"),
            length.cast("long").alias("n_chunk_tokens"),
            # slice() is 1-based
            F.concat_ws(" ", F.slice(F.col("__toks"), start + 1, length)).alias(
                "chunk_text"
            ),
        )
    )
