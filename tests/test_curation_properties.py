"""Property tests for the round-4 curation rules: gopher_rule_funnel and
dup_span_histogram vs INDEPENDENT Python models on hypothesis-generated
corpora (the cross-implementation strategy, SURVEY §5.2 — the fixed driver
corpus can't exercise boundary docs like single-token texts, all-duplicate
corpora, or exact rule-threshold hits)."""

from __future__ import annotations

import hashlib
import re
from collections import Counter

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

from seo_audit_etl_actor_spark.operators.text import STOPWORDS
from seo_audit_etl_actor_spark.queries.curation_ext import (
    dup_span_histogram,
    gopher_rule_funnel,
)

DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("text", T.StringType(), False),
    ]
)

# word pool: stopwords + filler words of varied length; docs drawn short so
# rule boundaries (n == 30, mean length == 4.0, 5*maxcnt == n) get hit
WORDS = list(STOPWORDS) + ["aa", "bbbb", "cccccccc", "dd", "longestword"]

docs_strategy = st.lists(
    st.lists(st.sampled_from(WORDS), min_size=1, max_size=40).map(" ".join),
    min_size=1,
    max_size=12,
)

_WS = re.compile(r"[ \t\n\x0b\f\r]+")


def _toks(text: str) -> list[str]:
    s = text.strip(" ")
    return _WS.split(s) if s.strip() else []


def _gopher_model(texts: list[str]) -> dict[str, tuple[int, int]]:
    out = {
        r: [0, 0]
        for r in (
            "all_rules",
            "mean_word_len",
            "stopwords",
            "top_token_frac",
            "unique_frac",
            "word_count",
        )
    }
    for text in texts:
        toks = _toks(text)
        n = len(toks)
        chars = sum(len(t) for t in toks)
        cnt = Counter(toks)
        d = len(cnt)
        maxcnt = max(cnt.values()) if cnt else 0
        # DISTINCT stopword types, not occurrences — the rule is "at least
        # 2 distinct EN stopwords present" (engine counts one vote per
        # (doc, token) group; hypothesis caught the multiplicity version
        # diverging on texts like 'the the')
        stop_hits = sum(1 for t in cnt if t in STOPWORDS)
        rules = {
            "word_count": 30 <= n <= 100000,
            "mean_word_len": 4 * n <= chars <= 10 * n,
            "unique_frac": 10 * d >= 4 * n,
            "top_token_frac": 5 * maxcnt <= n,
            "stopwords": stop_hits >= 2,
        }
        rules["all_rules"] = all(rules.values())
        for r, ok in rules.items():
            out[r][0 if ok else 1] += 1
    return {r: (p, f) for r, (p, f) in out.items()}


@settings(max_examples=8, deadline=None)
@given(docs_strategy)
def test_gopher_rules_match_python_model(spark, texts):
    df = spark.createDataFrame(list(enumerate(texts)), DOC_SCHEMA)
    got = {
        r["rule"]: (r["n_pass"], r["n_fail"])
        for r in gopher_rule_funnel(df).collect()
    }
    assert got == _gopher_model(texts)


def _hash_gram(gram: str) -> int:
    return int(hashlib.md5(gram.encode()).hexdigest()[:15], 16) & 0xFFFFFFFF


def _span_model(texts: list[str], k: int) -> dict[int, tuple[int, int, int]]:
    per_doc_sets = []
    for text in texts:
        toks = _toks(text)
        grams = {
            _hash_gram(" ".join(toks[i : i + k])) for i in range(len(toks) - k + 1)
        }
        per_doc_sets.append(grams)
    df_count = Counter(g for s in per_doc_sets for g in s)
    buckets: dict[int, list[int]] = {}
    for grams in per_doc_sets:
        if not grams:
            continue  # docs shorter than k emit no shingle rows
        total = len(grams)
        dup = sum(1 for g in grams if df_count[g] >= 2)
        # mirror the query's FLOOR(10.0 * dup / total): same IEEE division
        b = int((10.0 * dup / total) // 1)
        acc = buckets.setdefault(b, [0, 0, 0])
        acc[0] += 1
        acc[1] += dup
        acc[2] += total
    return {b: tuple(v) for b, v in buckets.items()}


@settings(max_examples=8, deadline=None)
@given(docs_strategy)
def test_dup_span_histogram_matches_python_model(spark, texts):
    k = 3  # short grams so generated docs actually produce shingles
    df = spark.createDataFrame(list(enumerate(texts)), DOC_SCHEMA)
    got = {
        r["dup_decile"]: (r["n_docs"], r["sum_dup_grams"], r["sum_total_grams"])
        for r in dup_span_histogram(df, k=k).collect()
    }
    assert got == _span_model(texts, k)
