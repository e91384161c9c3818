"""Deduplication operators for LLM-data pipelines: exact, MinHash+LSH,
SimHash, n-gram Jaccard (engine extension surface; BASELINE.json north
star — absent from the reference).

Design for 100 TB:
- exact dedup is a hash-groupBy on the md5 fingerprint — one shuffle on a
  uniformly distributed key, no skew;
- MinHash/LSH replaces the O(n²) all-pairs comparison with a band-bucket
  self-join: candidate generation touches only same-bucket docs, and the
  bucket key (band index + band hash) is uniform, so the join shuffles
  evenly; signatures are O(n_docs × n_hashes), never materializing the
  shingle sets driver-side;
- SimHash reduces each doc to one 48-bit integer; near-dup candidates come
  from band equality on the fingerprint — again a uniform-key join;
- all hashing is md5-derived so every step is reproducible in the DuckDB
  oracle (no engine-private hash functions in the data path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from seo_audit_etl_actor_spark.operators.text import fingerprint, md5_long, tokens

N_HASHES = 16
N_BANDS = 8  # rows-per-band r = 2 → LSH s-curve threshold ≈ (1/b)^(1/r) ≈ 0.35
SHINGLE_K = 3
SIMHASH_BITS = 48  # 48 bits keeps the fingerprint a positive BIGINT in every engine


def exact_dedup_stats(docs: DataFrame, text_col: str = "text", group_col: str = "source") -> DataFrame:
    """Exact dedup summary per group: rows, distinct fingerprints, dup rows.

    The fingerprint (md5 of normalized text) makes the groupBy key uniform —
    no hot keys at scale regardless of content skew.
    """
    fp = docs.select(F.col(group_col), fingerprint(F.col(text_col)).alias("fp"))
    return (
        fp.groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct("fp").alias("n_unique"),
            (F.count(F.lit(1)) - F.countDistinct("fp")).alias("n_dup_rows"),
        )
        .orderBy(group_col)
    )


def exact_dedup_keep_first(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact dedup keeping the lowest-id row per fingerprint (deterministic
    canonical choice — SURVEY §7.2 H2 discipline). One shuffle on fp."""
    w = Window.partitionBy(fingerprint(F.col(text_col))).orderBy(F.col(id_col).asc())
    return docs.withColumn("__rn", F.row_number().over(w)).where(F.col("__rn") == 1).drop("__rn")


def shingle_set(text_col, k: int = SHINGLE_K):
    """Distinct k-word shingles as an array of strings.

    Higher-order functions only (sequence/transform/slice) — the shingle
    array never leaves the JVM row, no explode until the caller needs one.
    """
    toks = tokens(text_col)
    n = F.size(toks)
    return F.when(n < k, F.array().cast("array<string>")).otherwise(
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), n - (k - 1)),
                lambda i: F.concat_ws(" ", F.slice(toks, i, k)),
            )
        )
    )


def minhash_signatures(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = N_HASHES,
) -> DataFrame:
    """Per-doc MinHash signature: sig[i] = min over shingles of
    md5_long(shingle || '#' || i).

    Computed as n_hashes array-min HOFs over the shingle array — one narrow
    projection, zero shuffles; docs with no shingles are dropped (they can't
    be near-duplicates of anything).
    """
    sh = shingle_set(F.col(text_col))
    out = docs.select(F.col(id_col), sh.alias("shingles")).where(F.size("shingles") > 0)
    sig_cols = [
        F.array_min(
            F.transform(F.col("shingles"), lambda s: md5_long(s, salt=f"#{i}"))
        ).alias(f"mh{i}")
        for i in range(n_hashes)
    ]
    return out.select(id_col, "shingles", *sig_cols)


def lsh_candidate_pairs(
    sigs: DataFrame, id_col: str = "doc_id", n_bands: int = N_BANDS, n_hashes: int = N_HASHES
) -> DataFrame:
    """LSH banding: docs sharing any (band_idx, band_key) bucket become a
    candidate pair (id_a < id_b).

    Explode to one row per band → self-join on the bucket key → distinct.
    The bucket key is md5-uniform so the shuffle is skew-free; at 100 TB the
    join is shuffle-hash on a key space of n_bands × 2^60.
    """
    r = n_hashes // n_bands
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_idx"),
                F.concat_ws("|", *[F.col(f"mh{b * r + j}") for j in range(r)]).alias("band_key"),
            )
            for b in range(n_bands)
        ]
    )
    exploded = sigs.select(F.col(id_col), F.explode(bands).alias("band")).select(
        id_col, "band.band_idx", "band.band_key"
    )
    a = exploded.alias("a")
    b = exploded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .distinct()
    )


def minhash_near_dup_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
) -> DataFrame:
    """Full MinHash-LSH near-dup pipeline: signatures → band buckets →
    candidate pairs → exact Jaccard verification (array_intersect/union on
    the distinct shingle sets) → pairs with jaccard ≥ threshold.

    Jaccard is a ratio of integer set sizes — exact, engine-portable.
    """
    sigs = minhash_signatures(docs, text_col, id_col)
    cands = lsh_candidate_pairs(sigs, id_col)
    sh = sigs.select(F.col(id_col), F.col("shingles"))
    pairs = (
        cands.join(sh.withColumnRenamed(id_col, "id_a").withColumnRenamed("shingles", "sh_a"), "id_a")
        .join(sh.withColumnRenamed(id_col, "id_b").withColumnRenamed("shingles", "sh_b"), "id_b")
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    jac = inter / union
    return (
        pairs.select("id_a", "id_b", jac.alias("jaccard"))
        .where(F.col("jaccard") >= threshold)
        .orderBy("id_a", "id_b")
    )


def simhash_fingerprints(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = SIMHASH_BITS
) -> DataFrame:
    """Per-doc SimHash fingerprint: tokens hashed to 60-bit ints; each of
    `bits` positions votes ±1 per token occurrence (tf-weighted); bit set
    iff the vote is positive.

    Entirely HOF-based: the per-doc vote vector is an `aggregate` over the
    token-hash array — no explode, no shuffle; the doc's O(1)-size
    fingerprint is the only thing that leaves the row.
    """
    toks = tokens(F.col(text_col))
    hashes = F.transform(toks, lambda t: md5_long(t))
    # bit positions are compile-time constants: unroll them in Python so the
    # shift amounts are literals (shiftright requires int, not Column)
    votes = F.aggregate(
        hashes,
        F.array_repeat(F.lit(0).cast("long"), bits),
        lambda acc, h: F.zip_with(
            acc,
            F.array(*[F.shiftright(h, i).bitwiseAND(F.lit(1)) * 2 - 1 for i in range(bits)]),
            lambda a, v: a + v,
        ),
    )
    staged = docs.select(
        F.col(id_col), F.size(toks).alias("n_tokens"), votes.alias("__votes")
    ).where(F.col("n_tokens") > 0)
    fp = F.lit(0).cast("long")
    for i in range(bits):
        fp = fp + F.when(
            F.element_at(F.col("__votes"), i + 1) > 0, F.lit(1 << i).cast("long")
        ).otherwise(F.lit(0).cast("long"))
    return staged.select(F.col(id_col), fp.alias("simhash"))


def simhash_near_dup_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    bits: int = SIMHASH_BITS,
    n_bands: int = 4,
) -> DataFrame:
    """SimHash near-dup candidates via fingerprint banding (pigeonhole: any
    pair within `max_hamming` ≤ n_bands-1 bit flips shares ≥1 exact band),
    verified by popcount of XOR ≤ max_hamming."""
    fps = simhash_fingerprints(docs, text_col, id_col, bits)
    width = bits // n_bands
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_idx"),
                F.shiftright(F.col("simhash"), b * width)
                .bitwiseAND(F.lit((1 << width) - 1))
                .alias("band_key"),
            )
            for b in range(n_bands)
        ]
    )
    exploded = fps.select(F.col(id_col), F.col("simhash"), F.explode(bands).alias("band")).select(
        id_col, "simhash", "band.band_idx", "band.band_key"
    )
    a, b = exploded.alias("a"), exploded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.simhash").alias("fp_a"),
            F.col("b.simhash").alias("fp_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b")))
    return (
        cand.select("id_a", "id_b", hamming.cast("int").alias("hamming"))
        .where(F.col("hamming") <= max_hamming)
        .orderBy("id_a", "id_b")
    )


def ngram_jaccard_sample_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    modulus: int = 25,
    min_jaccard: float = 0.05,
) -> DataFrame:
    """Exact all-pairs n-gram Jaccard over a deterministic id-sampled subset
    (id % modulus == 0) — the verification baseline for the LSH pipelines.
    Quadratic by design; the sample bound keeps it tractable at any SF."""
    sample = docs.where(F.col(id_col) % modulus == 0).select(
        F.col(id_col), shingle_set(F.col(text_col)).alias("sh")
    ).where(F.size("sh") > 0)
    a, b = sample.alias("a"), sample.alias("b")
    jac = F.size(F.array_intersect("a.sh", "b.sh")) / F.size(F.array_union("a.sh", "b.sh"))
    return (
        a.join(b, F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            jac.alias("jaccard"),
        )
        .where(F.col("jaccard") >= min_jaccard)
        .orderBy("id_a", "id_b")
    )
