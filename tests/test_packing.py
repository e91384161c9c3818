"""Sequence packer (operators/packing.py): exact-once assignment, capacity
respected, partitioning invariance, FFD quality vs the naive baseline, and
equality with the pure-Python model per bucket."""

from __future__ import annotations

from pyspark.sql import functions as F

from seo_audit_etl_actor_spark.operators.packing import ffd_pack, pack_sequences
from seo_audit_etl_actor_spark.operators.text import token_count
from seo_audit_etl_actor_spark.session import load_table

MAX_TOKENS = 128


def _sized_docs(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", token_count(F.col("text")).alias("n_tokens")
    ).where(F.col("n_tokens") > 0)


def test_pack_exact_once_and_capacity(spark, sf_dir):
    sized = _sized_docs(spark, sf_dir)
    packed = pack_sequences(sized, MAX_TOKENS).cache()
    n_docs = sized.count()
    assert packed.count() == n_docs
    assert packed.select("doc_id").distinct().count() == n_docs

    seqs = packed.groupBy("seq_id").agg(
        F.sum("n_tokens").alias("tot"),
        F.count(F.lit(1)).alias("n_docs"),
        F.first("seq_fill").alias("fill"),
    )
    # seq_fill column is consistent with the actual per-sequence sum
    assert seqs.where(F.col("tot") != F.col("fill")).count() == 0
    # capacity: only single-doc overflow sequences may exceed max
    over = seqs.where(F.col("tot") > MAX_TOKENS)
    assert over.where(F.col("n_docs") > 1).count() == 0


def test_pack_partitioning_invariance(spark, sf_dir):
    sized = _sized_docs(spark, sf_dir)
    a = pack_sequences(sized.repartition(1), MAX_TOKENS)
    b = pack_sequences(sized.repartition(13), MAX_TOKENS)
    ra = sorted(tuple(r) for r in a.collect())
    rb = sorted(tuple(r) for r in b.collect())
    assert ra == rb


def test_pack_beats_naive_fill(spark, sf_dir):
    """Mean fill of packed sequences must beat one-doc-per-sequence by a
    wide margin (FFD ≤ 11/9·OPT+1 per bucket)."""
    sized = _sized_docs(spark, sf_dir)
    packed = pack_sequences(sized, MAX_TOKENS)
    seqs = packed.groupBy("seq_id").agg(F.sum("n_tokens").alias("tot"))
    n_seqs = seqs.count()
    total = sized.agg(F.sum("n_tokens")).first()[0]
    n_docs = sized.count()
    packed_fill = total / (n_seqs * MAX_TOKENS)
    naive_fill = total / (n_docs * MAX_TOKENS)
    assert packed_fill >= 0.8
    assert packed_fill > 1.5 * naive_fill


def test_pack_matches_python_model_per_bucket(spark, sf_dir):
    sized = _sized_docs(spark, sf_dir)
    packed = pack_sequences(sized, MAX_TOKENS, n_buckets=4)
    got = {(r["doc_id"]): (r["seq_id"]) for r in packed.collect()}
    # rebuild each bucket's expected assignment with the shared pure fn
    rows = [
        (r["doc_id"], r["n_tokens"], r["b"])
        for r in sized.withColumn(
            "b", F.pmod(F.xxhash64(F.col("doc_id")), F.lit(4))
        ).collect()
    ]
    from collections import defaultdict

    buckets = defaultdict(list)
    for d, n, b in rows:
        buckets[int(b)].append((int(d), int(n)))
    want = {}
    for b, items in buckets.items():
        assign = ffd_pack(items, MAX_TOKENS)
        for d, _ in items:
            want[d] = (b << 40) + assign[d]
    assert got == want


def test_ffd_properties_hypothesis():
    """Pure-FFD invariants on adversarial size lists: exact-once
    assignment, capacity respected except single-item overflow, and the
    classic FFD bound bins <= ceil(11/9 * OPT_lower) + 1."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=200, deadline=None)
    @given(
        st.lists(
            st.tuples(st.integers(0, 10**6), st.integers(1, 200)),
            min_size=0,
            max_size=60,
            unique_by=lambda t: t[0],
        )
    )
    def check(items):
        cap = 128
        assign = ffd_pack(items, cap)
        assert set(assign) == {d for d, _ in items}
        fills = {}
        sizes = dict(items)
        for d, s in assign.items():
            fills.setdefault(s, []).append(d)
        for s, members in fills.items():
            tot = sum(sizes[d] for d in members)
            if tot > cap:
                assert len(members) == 1 and sizes[members[0]] >= cap
        packable = [n for _, n in items if n < cap]
        overflow = len(items) - len(packable)
        if packable:
            opt_lower = -(-sum(packable) // cap)
            used = len(fills) - overflow
            assert used <= -(-11 * opt_lower // 9) + 1
        # deterministic under permutation
        assert ffd_pack(list(reversed(items)), cap) == assign

    check()
