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


def build_gram_index(
    docs: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = SHINGLE_K,
) -> None:
    """Materialize the (doc_id, gram) shingle index as a parquet lake
    table — the write-once half of scrubbing one corpus-scale split
    against another (where the reference side exceeds broadcast size and
    `contaminated_doc_ids`'s broadcast semi-join no longer applies).

    Materializing is not just caching: Catalyst's runtime Bloom-filter
    injection (InjectRuntimeFilter) only fires when the filter-creation
    side is a selective predicate directly over a SCAN — it cannot see
    through the Generate(explode) that gram extraction needs. Persisting
    the exploded grams turns the decontamination join into exactly the
    shape the rule matches, and the index is reused by every subsequent
    scrub (new benchmark, new split) without re-shingling 100 TB of text.
    """
    grams = hashed_shingle_set(F.col(text_col), k)
    (
        docs.select(F.col(id_col), F.explode(grams).alias("gram"))
        .write.mode("overwrite")
        .parquet(path)
    )


def contaminated_doc_ids_from_index(
    index: DataFrame,
    benchmark_modulus: int = 97,
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus-vs-corpus decontamination over a persisted gram index: docs
    whose id ≡ 0 (mod benchmark_modulus) play the benchmark split, and a
    corpus doc is contaminated if it shares any gram with that split.

    Both join inputs are selective filters over the SAME index scan, and
    neither side is broadcast — this is the shape where Spark's runtime
    Bloom-filter join pushdown carries the 100 TB cost: Catalyst builds a
    Bloom filter over the benchmark-side grams and pushes a
    `might_contain` predicate into the corpus-side scan, dropping the
    overwhelmingly-clean grams BEFORE the shuffle (terabytes → gigabytes
    of exchange). Asserted on the optimized plan in tests/test_bloom.py
    (size thresholds lowered so injection triggers at test scale; at real
    scale the defaults — creation side <10 MB won't hold for a corpus
    split, so raise spark.sql.optimizer.runtime.bloomFilter.
    creationSideThreshold alongside expectedNumItems).

    Inner join + id-distinct rather than semi-join: for LEFT SEMI the
    rule can only inject INTO the right side, which is backwards here;
    inner keeps both directions eligible and the trailing distinct
    restores semi semantics.
    """
    bench = index.where(F.col(id_col) % benchmark_modulus == 0).select(
        F.col("gram").alias("__bgram")
    )
    corpus = index.where(F.col(id_col) % benchmark_modulus != 0)
    return (
        corpus.join(bench, corpus["gram"] == bench["__bgram"])
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
