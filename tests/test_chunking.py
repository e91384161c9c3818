"""Text chunker (operators/chunking.py): geometry matches chunk_stats'
arithmetic, chunk text round-trips to its token count, overlap stitching
reconstructs the document, and a Python model agrees."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from seo_audit_etl_actor_spark.operators.chunking import chunk_documents
from seo_audit_etl_actor_spark.operators.text import token_count
from seo_audit_etl_actor_spark.session import load_table

CHUNK, OVERLAP = 32, 8
STRIDE = CHUNK - OVERLAP


@pytest.fixture(scope="module")
def chunked(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return chunk_documents(docs, CHUNK, OVERLAP).cache()


def _model(text: str):
    toks = text.split()
    if not toks:
        return []
    n = len(toks)
    n_chunks = 1 + max(0, -(-(max(0, n - CHUNK)) // STRIDE))
    out = []
    for i in range(n_chunks):
        start = i * STRIDE
        piece = toks[start : start + CHUNK]
        out.append((i, len(piece), " ".join(piece)))
    return out


def test_matches_python_model(spark, sf_dir, chunked):
    docs = {r["doc_id"]: r["text"] for r in load_table(spark, sf_dir, "documents").collect()}
    got = {}
    for r in chunked.collect():
        got.setdefault(r["doc_id"], []).append(
            (r["chunk_idx"], r["n_chunk_tokens"], r["chunk_text"])
        )
    for doc_id, text in docs.items():
        want = _model(text)
        have = sorted(got.get(doc_id, []))
        assert have == want, doc_id


def test_chunk_text_round_trips_token_count(spark, chunked):
    bad = chunked.where(
        token_count(F.col("chunk_text")) != F.col("n_chunk_tokens")
    ).count()
    assert bad == 0


def test_overlap_stitching_reconstructs_document(spark, sf_dir, chunked):
    """Dropping each non-first chunk's first OVERLAP tokens and
    concatenating in order must reproduce the original token stream."""
    docs = {r["doc_id"]: r["text"].split() for r in load_table(spark, sf_dir, "documents").collect()}
    parts = {}
    for r in sorted(chunked.collect(), key=lambda r: (r["doc_id"], r["chunk_idx"])):
        toks = r["chunk_text"].split()
        if r["chunk_idx"] > 0:
            toks = toks[OVERLAP:]
        parts.setdefault(r["doc_id"], []).extend(toks)
    for doc_id, toks in docs.items():
        assert parts[doc_id] == toks, doc_id


def test_rejects_bad_overlap(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    with pytest.raises(ValueError):
        chunk_documents(docs, 32, 32)
