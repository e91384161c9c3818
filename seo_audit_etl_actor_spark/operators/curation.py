"""Corpus-curation pipeline: the composed training-data funnel
(dedup → language gate → length gate → quality gate) as one single-scan
operator — the end-to-end shape a 100 TB pretraining-data pipeline runs,
built entirely from the engine's text operators (operators/text.py).

Scale design:
- ONE pass over the corpus: fingerprint + window-dedup + per-doc features
  share a single scan; the only shuffle is hashpartitioning on the md5
  fingerprint (uniform — skew-free), which the duplicate-rank window rides.
- Drop reasons are assigned by a priority CASE; Spark evaluates CASE
  branches lazily per row, so the (more expensive) quality score is only
  computed for rows that survive the earlier gates.
- Every feature is an integer or md5-derived value → the funnel aggregate
  is exact under any partitioning (no float drift).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from seo_audit_etl_actor_spark.operators.text import (
    fingerprint,
    lang_id,
    quality_score_q4,
    token_count,
)

KEEP_LANGS: tuple[str, ...] = ("en", "es", "fr")
MIN_TOKENS = 12
MIN_QUALITY_Q4 = 5000

# priority order is part of the contract: a duplicate low-quality doc
# counts as 'duplicate', not 'low_quality'
STAGES = ("duplicate", "lang_filter", "too_short", "low_quality", "kept")


def curate_documents(
    docs: DataFrame,
    keep_langs: tuple[str, ...] = KEEP_LANGS,
    min_tokens: int = MIN_TOKENS,
    min_quality_q4: int = MIN_QUALITY_Q4,
) -> DataFrame:
    """Per-document curation verdict: adds fp, pred_lang, n_tokens, q4 and
    a priority `stage` column ('kept' or the first failing gate).

    Keep-first dedup semantics: within a fingerprint group the lowest
    doc_id is canonical (deterministic total order, SURVEY H2 discipline).
    """
    text = F.col("text")
    base = docs.withColumn("fp", fingerprint(text))
    rn = F.row_number().over(Window.partitionBy("fp").orderBy("doc_id"))
    enriched = (
        base.withColumn("rn", rn)
        .withColumn("pred_lang", lang_id(text))
        .withColumn("n_tokens", token_count(text))
    )
    stage = (
        F.when(F.col("rn") > 1, "duplicate")
        .when(~F.col("pred_lang").isin(*keep_langs), "lang_filter")
        .when(F.col("n_tokens") < min_tokens, "too_short")
        .when(quality_score_q4(text) < min_quality_q4, "low_quality")
        .otherwise("kept")
    )
    return enriched.withColumn("stage", stage).drop("rn")


def curation_funnel(docs: DataFrame) -> DataFrame:
    """Funnel stats per (source, stage): doc and token counts — the
    monitoring aggregate of the curation pipeline."""
    return (
        curate_documents(docs)
        .groupBy("source", "stage")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
        )
        .orderBy("source", "stage")
    )


def kept_corpus(docs: DataFrame) -> DataFrame:
    """The curated output corpus (what downstream tokenization would
    consume): canonical, language-gated, length- and quality-gated docs."""
    return curate_documents(docs).where(F.col("stage") == "kept").drop("stage")
