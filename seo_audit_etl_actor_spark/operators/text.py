"""Text-analysis operators for LLM-data pipelines (engine extension surface;
BASELINE.json north star — not present in the reference, which has no text
analytics beyond substring predicates, src/etl.js:345-352).

Everything is native Column expressions (regex, arrays, higher-order
functions) — no Python UDFs, so the hot path stays in whole-stage codegen
and scales linearly with executors at 100 TB.

Cross-engine determinism: hashes derive from md5 (identical in Spark and
DuckDB); per-doc scores are quantized to integers before any cross-row
aggregation so sums are order-independent.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language marker-word sets for the n-gram/stopword language-ID
# heuristic. Deliberately small and deterministic — language ID at scale is
# a scored argmax over marker hits, which is exactly this shape.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a"),
    "es": ("el", "la", "de", "que", "los"),
    "fr": ("le", "la", "et", "les", "des"),
}

STOPWORDS = LANG_MARKERS["en"]


def normalize_text(c: Column) -> Column:
    """Lowercase, NBSP→space, collapse whitespace, trim — the reference's
    header-normalization recipe (src/etl.js:45-52) applied to documents."""
    c = F.regexp_replace(c, "\u00a0", " ")
    c = F.regexp_replace(c, r"\s+", " ")
    return F.lower(F.trim(c))


def tokens(c: Column) -> Column:
    """Whitespace tokenization; empty/blank text → empty array (Spark and
    DuckDB both split '' into [''], so the guard is applied on both sides)."""
    return F.when(F.length(F.trim(c)) == 0, F.array().cast("array<string>")).otherwise(
        F.split(F.trim(c), r"\s+")
    )


def token_count(c: Column) -> Column:
    return F.size(tokens(c)).cast("long")


def md5_long(c: Column, salt: str = "") -> Column:
    """Deterministic 60-bit positive hash from the md5 hex prefix.

    Portable across engines: Spark `conv(substring(md5(x),1,15),16,10)` ==
    DuckDB `CAST('0x'||substring(md5(x),1,15) AS BIGINT)`. 15 hex chars
    < 2^60 so the BIGINT never goes negative.
    """
    salted = F.concat(c, F.lit(salt)) if salt else c
    return F.conv(F.substring(F.md5(salted), 1, 15), 16, 10).cast("long")


def fingerprint(c: Column) -> Column:
    """Document fingerprint: md5 of normalized text (exact-dedup key)."""
    return F.md5(normalize_text(c))


def marker_hits(toks: Column, markers: tuple[str, ...]) -> Column:
    """Count of tokens that are in the marker set (with multiplicity —
    weighting by term frequency, the standard language-ID scoring)."""
    arr = F.array(*[F.lit(m) for m in markers])
    return F.size(F.filter(toks, lambda t: F.array_contains(arr, t))).cast("long")


def lang_id(text: Column) -> Column:
    """Argmax language over marker-hit scores; ties and zero-hit docs →
    'und' (undetermined). Deterministic: languages are compared in fixed
    order with strict-greater, so the first max wins."""
    toks = tokens(text)
    scores = {lang: marker_hits(toks, m) for lang, m in LANG_MARKERS.items()}
    best_score = F.greatest(*scores.values())
    pred = F.lit("und")
    # reversed() so earlier languages win ties via later (outer) whens
    for lang in reversed(list(scores)):
        pred = F.when(scores[lang] == best_score, F.lit(lang)).otherwise(pred)
    return F.when(best_score > 0, pred).otherwise(F.lit("und"))


# GPT2-style pre-tokenizer pattern, constrained to syntax both Java regex
# (Spark) and RE2 (DuckDB) support: no lookarounds; leftmost-first
# alternation ties the engines together. Contractions, letter runs, digit
# runs, punctuation runs, whitespace runs.
BPE_PATTERN = r"'s|'t|'re|'ve|'m|'ll|'d| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+"


def bpe_token_count(text: Column) -> Column:
    """BPE-precursor token count: matches of the GPT2-ish pre-tokenizer
    regex, minus pure-whitespace runs (they delimit, they aren't tokens)."""
    pieces = F.regexp_extract_all(text, F.lit(BPE_PATTERN), 0)
    non_ws = F.filter(pieces, lambda p: ~p.rlike(r"^\s+$"))
    return F.size(non_ws).cast("long")


ROLL_BASE = 131
ROLL_MOD = 2147483647  # 2^31 - 1: acc*B + x stays < 2^39, no 64-bit overflow


def rolling_hash_fingerprint(text: Column) -> Column:
    """Order-sensitive document fingerprint: polynomial rolling hash over
    the token-hash sequence, h = fold(acc·B + tᵢ mod M).

    Unlike the md5-of-whole-text fingerprint this is computable over any
    tokenized representation and composable per-chunk (hash of a
    concatenation derives from chunk hashes + lengths), which is what makes
    it usable for streaming/shard-parallel fingerprinting at 100 TB. A
    left-to-right fold (not commutative) — both engines run the identical
    sequential reduction.
    """
    toks = tokens(text)
    hashes = F.transform(toks, lambda t: md5_long(t) % F.lit(ROLL_MOD))
    return F.aggregate(
        hashes,
        F.lit(0).cast("long"),
        lambda acc, h: (acc * ROLL_BASE + h) % ROLL_MOD,
    )


def quality_score_q4(text: Column) -> Column:
    """Document quality score quantized to 1e-4 (integer 0..10000).

    Components (equal-weighted thirds, each clamped to [0,1]):
      length score    — chars/500 capped at 1 (too-short penalty)
      alpha ratio     — share of chars that are [a-z ] after normalization
      stopword ratio  — stopword tokens / tokens, rescaled ×5 capped at 1

    Quantized to an integer so downstream averages are exact-integer sums —
    order-independent across partitions (no float-associativity drift).
    """
    norm = normalize_text(text)
    n_chars = F.length(norm)
    length_score = F.least(n_chars / F.lit(500.0), F.lit(1.0))
    alpha = F.length(F.regexp_replace(norm, "[^a-z ]", ""))
    alpha_ratio = F.when(n_chars > 0, alpha / n_chars).otherwise(F.lit(0.0))
    toks = tokens(norm)
    stop_ratio = F.when(
        F.size(toks) > 0, marker_hits(toks, STOPWORDS) / F.size(toks)
    ).otherwise(F.lit(0.0))
    stop_score = F.least(stop_ratio * 5.0, F.lit(1.0))
    q = (length_score + alpha_ratio + stop_score) / 3.0
    return F.floor(q * 10000).cast("long")
