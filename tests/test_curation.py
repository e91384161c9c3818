"""Curation-pipeline unit tests: the synthetic corpus has no exact
duplicates, so the 'duplicate' stage and the gate PRIORITY contract are
exercised here with constructed docs (the oracle-differential test covers
the real-data funnel)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from seo_audit_etl_actor_spark.operators.curation import (
    MIN_QUALITY_Q4,
    curate_documents,
    curation_funnel,
    kept_corpus,
)

GOOD = (
    "the cat and the dog walked to a house of friends and the day was good "
    "and the road was long and the sun was warm over the quiet field of grass"
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        # two byte-identical docs: lower doc_id is canonical, higher → duplicate
        (1, GOOD, "src_a"),
        (2, GOOD, "src_a"),
        # whitespace/case variants normalize to the same fingerprint
        (3, "  " + GOOD.upper() + "  ", "src_a"),
        # no marker words of any language → lang_filter
        (4, "zzz qqq vvv kkk www yyy xxx mmm nnn ppp rrr sss ttt", "src_b"),
        # English but below the token floor → too_short
        (5, "the and of to a", "src_b"),
        # English, long enough, but symbol soup → low_quality
        (6, "the " + "#$%^&* 123 " * 20 + "and of to a end stop here now ok", "src_b"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text", "source"])


def test_stage_assignment_and_priority(docs):
    got = {r["doc_id"]: r["stage"] for r in curate_documents(docs).collect()}
    assert got[1] == "kept"
    assert got[2] == "duplicate"  # identical text, higher doc_id
    assert got[3] == "duplicate"  # case/whitespace variant, same fingerprint
    assert got[4] == "lang_filter"
    assert got[5] == "too_short"
    assert got[6] == "low_quality"


def test_duplicate_wins_over_later_gates(spark):
    """A doc failing EVERY gate reports the highest-priority reason."""
    bad = "zzz qqq"  # und language AND too short AND low quality
    df = spark.createDataFrame(
        [(1, bad, "s"), (2, bad, "s")], ["doc_id", "text", "source"]
    )
    got = {r["doc_id"]: r["stage"] for r in curate_documents(df).collect()}
    assert got[1] == "lang_filter"  # canonical copy: next gate in priority
    assert got[2] == "duplicate"  # dup beats lang/length/quality


def test_kept_corpus_only_canonical_good_docs(docs):
    kept = kept_corpus(docs)
    assert [r["doc_id"] for r in kept.collect()] == [1]
    # features ride along for downstream stages
    assert {"fp", "pred_lang", "n_tokens"} <= set(kept.columns)


def test_funnel_counts_partition_docs(docs):
    funnel = curation_funnel(docs)
    total = funnel.agg(F.sum("n_docs")).first()[0]
    assert total == docs.count()  # every doc lands in exactly one stage


def test_quality_gate_boundary(spark):
    """Docs at exactly the threshold are kept (strict less-than drops)."""
    df = spark.createDataFrame([(1, GOOD, "s")], ["doc_id", "text", "source"])
    q4 = curate_documents(df).first()
    assert q4["stage"] == "kept"
    from seo_audit_etl_actor_spark.operators.text import quality_score_q4

    score = df.select(quality_score_q4(F.col("text")).alias("q")).first()["q"]
    assert score >= MIN_QUALITY_Q4
