"""Benchmark decontamination: flag corpus documents sharing any k-gram with
a benchmark/eval set — the contamination scrub every serious pretraining
pipeline runs (GPT-3 App. C / The Pile style n-gram overlap), expressed
Spark-first (engine extension surface; absent from the reference).

Scale design (100 TB corpus vs ~MB-scale benchmarks):
- the benchmark side collapses to a DISTINCT set of 32-bit gram hashes
  (operators/dedup.hashed_shingle_set — md5-derived, oracle-portable);
  benchmarks are small, so this set broadcasts (~4 bytes/gram);
- the corpus side is map-only: explode grams → BROADCAST semi-join →
  distinct contaminated doc_ids. The full corpus text is scanned once and
  never shuffled; the only shuffles move doc_id-sized rows (the distinct
  and the final per-source rollup);
- gram hashing means collision-flagging a clean doc at ~n_grams/2^32
  probability — the conservative direction for decontamination (never
  misses a true overlap; may scrub a few extra docs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from seo_audit_etl_actor_spark.operators.dedup import SHINGLE_K, hashed_shingle_set


def contaminated_doc_ids(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = SHINGLE_K,
) -> DataFrame:
    """doc_ids of corpus documents sharing ≥1 hashed k-gram with any
    benchmark document. Broadcast semi-join — corpus is never shuffled."""
    grams = hashed_shingle_set(F.col(text_col), k)
    bench_grams = (
        benchmark.select(F.explode(grams).alias("gram")).distinct()
    )
    corpus_grams = corpus.select(F.col(id_col), F.explode(grams).alias("gram"))
    return (
        corpus_grams.join(F.broadcast(bench_grams), "gram", "left_semi")
        .select(id_col)
        .distinct()
    )


def contamination_by_source(
    docs: DataFrame,
    benchmark_modulus: int = 97,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
    k: int = SHINGLE_K,
) -> DataFrame:
    """Self-contained harness form: a deterministic id-slice
    (doc_id % benchmark_modulus == 0) plays the benchmark; the rest is the
    corpus. Per-source contamination counts + rate (rounded for
    engine-portable hashing)."""
    bench = docs.where(F.col(id_col) % benchmark_modulus == 0)
    corpus = docs.where(F.col(id_col) % benchmark_modulus != 0)
    hits = contaminated_doc_ids(corpus, bench, text_col, id_col, k)
    flagged = corpus.join(hits.withColumn("__hit", F.lit(1)), id_col, "left")
    return (
        flagged.groupBy(source_col)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count("__hit").alias("n_contaminated"),
            F.round(F.count("__hit") / F.count(F.lit(1)), 6).alias("contamination_rate"),
        )
        .orderBy(source_col)
    )
