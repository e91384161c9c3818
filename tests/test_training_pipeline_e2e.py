"""End-to-end training-data pipeline composition: the r4 operators chained
the way a real corpus build runs them —

    documents → chunk (overlapping windows) → exact-dedup chunks
    (keep-first) → FFD-pack into sequences → write sequence-bucketed
    parquet shards → read back

and verify global invariants across the whole chain: every surviving chunk
appears exactly once in exactly one sequence, no sequence splits across
shard files, capacity holds, and dedup removed exactly the duplicate
chunk texts the corpus contains."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from seo_audit_etl_actor_spark.operators.chunking import chunk_documents
from seo_audit_etl_actor_spark.operators.dedup import exact_dedup_keep_first
from seo_audit_etl_actor_spark.operators.packing import pack_sequences
from seo_audit_etl_actor_spark.session import load_table

CHUNK, OVERLAP, MAX_TOKENS = 32, 8, 128


@pytest.fixture(scope="module")
def pipeline(spark, sf_dir, tmp_path_factory):
    docs = load_table(spark, sf_dir, "documents")
    chunks = chunk_documents(docs, CHUNK, OVERLAP).withColumn(
        # a stable chunk identity for dedup/packing: doc_id * 2^20 + idx
        "chunk_id",
        (F.col("doc_id") * (1 << 20) + F.col("chunk_idx")).cast("long"),
    )
    kept = exact_dedup_keep_first(
        chunks, text_col="chunk_text", id_col="chunk_id"
    ).cache()
    packed = pack_sequences(
        kept.select("chunk_id", F.col("n_chunk_tokens").alias("n_tokens")),
        MAX_TOKENS,
        id_col="chunk_id",
    ).withColumnRenamed("doc_id", "chunk_id")  # packer's output id column is fixed
    shards = str(tmp_path_factory.mktemp("shards") / "train")
    out = packed.join(kept.select("chunk_id", "chunk_text"), "chunk_id").withColumn(
        "shard", F.pmod(F.col("seq_id"), F.lit(8))
    )
    out.write.partitionBy("shard").mode("overwrite").parquet(shards)
    return chunks.cache(), kept, spark.read.parquet(shards).cache()


def test_dedup_removed_exactly_duplicate_texts(pipeline):
    chunks, kept, _ = pipeline
    n_distinct = chunks.select("chunk_text").distinct().count()
    assert kept.count() == n_distinct
    assert kept.select("chunk_text").distinct().count() == n_distinct


def test_every_kept_chunk_packed_exactly_once(pipeline):
    _, kept, shards = pipeline
    assert shards.count() == kept.count()
    assert shards.select("chunk_id").distinct().count() == kept.count()
    # each chunk sits in exactly one sequence
    assert (
        shards.groupBy("chunk_id")
        .agg(F.countDistinct("seq_id").alias("n"))
        .where(F.col("n") != 1)
        .count()
        == 0
    )


def test_sequences_do_not_split_across_shards(pipeline):
    _, _, shards = pipeline
    assert (
        shards.groupBy("seq_id")
        .agg(F.countDistinct("shard").alias("n"))
        .where(F.col("n") != 1)
        .count()
        == 0
    )


def test_capacity_and_fill_after_roundtrip(pipeline):
    _, _, shards = pipeline
    seqs = shards.groupBy("seq_id").agg(
        F.sum("n_tokens").alias("tot"), F.count(F.lit(1)).alias("n_chunks")
    )
    # multi-chunk sequences never exceed capacity (chunks are <= CHUNK <
    # MAX_TOKENS so no overflow sequences exist at all here)
    assert seqs.where(F.col("tot") > MAX_TOKENS).count() == 0
    # round-tripped text still tokenizes to its recorded length
    from seo_audit_etl_actor_spark.operators.text import token_count

    bad = shards.where(token_count(F.col("chunk_text")) != F.col("n_tokens")).count()
    assert bad == 0
