"""Training-data pipeline queries, round 3: span-level dedup, incremental
corpus admission, source mixing, BPE merge mining, batch packing, token
rarity. Extension surface beyond the reference (which has no text
analytics, src/etl.js:345-352) — the operational queries a 100 TB
pretraining-data pipeline runs between ingestion and tokenization.

Exactness discipline (same as queries/llm_ext.py): md5-derived keys,
integer counts, integer floor-division quantization before any cross-row
averaging, and at most ONE float division (deterministic in IEEE) per
emitted value — every query here hash-matches its DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from seo_audit_etl_actor_spark.operators.text import (
    BPE_PATTERN,
    fingerprint,
    token_count,
    tokens,
)
from seo_audit_etl_actor_spark.queries.llm_ext import _TOKS, _NORM
from seo_audit_etl_actor_spark.session import ensure_parallelism, load_table

# ---------------------------------------------------------- passage dedup
PASSAGE_TOKENS = 16


def q_passage_dedup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-level exact dedup (the sub-document half of the dedup family,
    after Lee et al.'s "Deduplicating Training Data Makes Language Models
    Better"): documents are cut into non-overlapping 16-token passages,
    each md5-fingerprinted, and a passage is duplicated if its fingerprint
    occurs more than once in the WHOLE corpus. Per-source passage counts +
    duplication ratio.

    Scale: explode is map-side; the passage frequency is a COUNT window
    over hashpartitioning(pfp) (uniform md5 key — skew-free), so the whole
    query is ONE explode and one passage-fingerprint shuffle (+ the tiny
    per-source rollup) — the window form halves the join form's cost,
    which would scan and explode the corpus twice with no exchange
    reuse."""
    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    toks = tokens(F.col("text"))
    n = F.size(toks)
    n_win = (F.floor((n - 1) / PASSAGE_TOKENS) + 1).cast("int")
    passages = F.when(n > 0, F.transform(
        F.sequence(F.lit(0), n_win - 1),
        lambda i: F.md5(
            F.array_join(F.slice(toks, i * PASSAGE_TOKENS + 1, PASSAGE_TOKENS), " ")
        ),
    )).otherwise(F.array().cast("array<string>"))
    ex = docs.select("source", F.explode(passages).alias("pfp"))
    with_count = ex.withColumn(
        "pf_count", F.count(F.lit(1)).over(Window.partitionBy("pfp"))
    )
    return (
        with_count.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_passages"),
            F.sum(F.when(F.col("pf_count") > 1, 1).otherwise(0))
            .cast("long")
            .alias("n_dup_passages"),
            F.round(
                F.sum(F.when(F.col("pf_count") > 1, 1).otherwise(0))
                / F.count(F.lit(1)),
                6,
            ).alias("dup_ratio"),
        )
        .orderBy("source")
    )


def _sql_passage_dedup_stats(w: int = PASSAGE_TOKENS) -> str:
    toks = _TOKS.format(c="text")
    return f"""
WITH ex AS (
  SELECT source,
         unnest(CASE WHEN len(t) = 0 THEN CAST([] AS VARCHAR[])
                ELSE list_transform(range(0, CAST(floor((len(t)-1)/{w}) AS BIGINT) + 1),
                     i -> md5(array_to_string(list_slice(t, i*{w}+1, i*{w}+{w}), ' ')))
                END) AS pfp
  FROM (SELECT source, {toks} AS t FROM documents)
),
counts AS (SELECT pfp, COUNT(*) AS pf_count FROM ex GROUP BY pfp)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_passages,
       CAST(SUM(CASE WHEN pf_count > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_passages,
       ROUND(SUM(CASE WHEN pf_count > 1 THEN 1 ELSE 0 END) / COUNT(*), 6) AS dup_ratio
FROM ex JOIN counts USING (pfp)
GROUP BY source
ORDER BY source
"""


SQL_PASSAGE_DEDUP_STATS = _sql_passage_dedup_stats()


# ----------------------------------------------------- incremental admission
INC_MODULUS = 7


def q_incremental_admission(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental corpus ingestion: an incoming batch (doc_id ≡ 0 mod 7
    plays the new crawl) is admitted against the existing corpus — a doc
    is rejected if its fingerprint already exists in the corpus
    (`dup_of_corpus` — priority, matching the batch funnel's
    duplicate-first contract) or if an earlier incoming doc claimed the
    fingerprint (`dup_within_batch`, keep-first by doc_id). Per
    (source, status) counts.

    Scale: one shuffle on the uniform md5 fingerprint serves both the
    existing-set semi-probe and the within-batch window; at 100 TB the
    existing fingerprint set is the persisted dedup index (the same
    write-once artifact as operators/contamination.build_gram_index), not
    a re-scan of the corpus."""
    docs = load_table(spark, sf_dir, "documents")
    fp = fingerprint(F.col("text"))
    existing = (
        docs.where(F.col("doc_id") % INC_MODULUS != 0)
        .select(fp.alias("fp"))
        .distinct()
        .withColumn("__in_corpus", F.lit(1))
    )
    incoming = docs.where(F.col("doc_id") % INC_MODULUS == 0).select(
        "doc_id", "source", fp.alias("fp")
    )
    rn = F.row_number().over(Window.partitionBy("fp").orderBy("doc_id"))
    status = (
        F.when(F.col("__in_corpus").isNotNull(), "dup_of_corpus")
        .when(F.col("rn") > 1, "dup_within_batch")
        .otherwise("admitted")
    )
    return (
        incoming.withColumn("rn", rn)
        .join(existing, "fp", "left")
        .select("source", status.alias("status"))
        .groupBy("source", "status")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("source", "status")
    )


def _sql_incremental_admission(m: int = INC_MODULUS) -> str:
    norm = _NORM.format(c="text")
    return f"""
WITH existing AS (
  SELECT DISTINCT md5({norm}) AS fp FROM documents WHERE doc_id % {m} != 0
),
incoming AS (
  SELECT doc_id, source, md5({norm}) AS fp,
         ROW_NUMBER() OVER (PARTITION BY md5({norm}) ORDER BY doc_id) AS rn
  FROM documents WHERE doc_id % {m} = 0
)
SELECT source,
       CASE WHEN e.fp IS NOT NULL THEN 'dup_of_corpus'
            WHEN rn > 1 THEN 'dup_within_batch'
            ELSE 'admitted' END AS status,
       CAST(COUNT(*) AS BIGINT) AS n_docs
FROM incoming i LEFT JOIN existing e ON i.fp = e.fp
GROUP BY source, status
ORDER BY source, status
"""


SQL_INCREMENTAL_ADMISSION = _sql_incremental_admission()


# ------------------------------------------------------ source mixing weights
def q_source_mixing_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-mixture balancing: per-source token shares vs a uniform target
    mixture, and the sampling weight (target_share / actual_share) a
    weighted-sampling stage would apply to hit the target. The standard
    knob for re-balancing over/under-represented sources before training.

    Scale: one scan → per-source aggregate; the grand total is a broadcast
    of the 1-row re-aggregate (the skew_stats single-scan pattern). Both
    emitted ratios are a fixed sequence of IEEE double ops over exact
    integers, so they hash-match the oracle."""
    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    per = docs.groupBy("source").agg(
        F.sum(token_count(F.col("text"))).cast("long").alias("total_tokens")
    )
    tot = per.agg(
        F.sum("total_tokens").cast("long").alias("__g"),
        F.count(F.lit(1)).alias("__n_sources"),
    )
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "total_tokens",
            F.round(F.try_divide(F.col("total_tokens"), F.col("__g")), 6).alias("token_share"),
            F.round(
                F.try_divide(F.col("__g") / F.col("__n_sources"), F.col("total_tokens")), 6
            ).alias("mix_weight"),
        )
        .orderBy("source")
    )


SQL_SOURCE_MIXING_WEIGHTS = f"""
WITH per AS (
  SELECT source, CAST(SUM(len({_TOKS.format(c='text')})) AS BIGINT) AS total_tokens
  FROM documents GROUP BY source
),
tot AS (SELECT CAST(SUM(total_tokens) AS BIGINT) AS g, COUNT(*) AS n_sources FROM per)
SELECT source, total_tokens,
       ROUND(total_tokens / g, 6) AS token_share,
       ROUND((g / n_sources) / total_tokens, 6) AS mix_weight
FROM per, tot
ORDER BY source
"""


# ------------------------------------------------- token budget apportionment
# Global training-token budget to split across (source, lang) cells.
# Deliberately larger than the small-SF corpora: a quota above the cell's
# own token count just means the sampler runs that cell for >1 epoch.
APPORTION_BUDGET = 1_000_000


def q_token_budget_apportionment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT integer apportionment of a global token budget across
    (source, lang) cells by the largest-remainder (Hamilton) method — the
    deterministic counterpart of `source_mixing_weights`: that query emits
    float sampling weights; this one emits the integer per-cell quotas a
    batch scheduler actually consumes, with sum(quota) == budget exactly.

    base_c = floor(B * n_c / N) leaves L = B - sum(base_c) < #cells slots;
    the L cells with the largest remainders (B*n_c mod N, ties broken by
    (source, lang)) get one extra. All arithmetic is DECIMAL(38,0)/HUGEINT
    integer math — no float ever appears, so the result hash-matches the
    oracle bit-for-bit. Division-rounding trap avoided by construction:
    Spark decimal division rounds at scale 6, so base is computed as
    (prod - prod % N) / N — an exactly-integral quotient that no rounding
    can perturb — rather than floor(prod / N).

    Scale: one corpus scan → map-side-partial (source, lang) aggregate;
    the apportionment itself (cross joins, rank window) runs on the tiny
    cell frame (|sources| x |langs| rows, ~dozens), so the unpartitioned
    window is a non-issue. DECIMAL(38,0) holds B*n_c up to 10^38 — at a
    10^13-token corpus with a 10^12-token budget the product is 10^25,
    thirteen orders of magnitude of headroom.
    """
    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    cells = docs.groupBy("source", "lang").agg(
        F.sum(token_count(F.col("text"))).cast("long").alias("cell_tokens")
    )
    return apportion_budget(cells, APPORTION_BUDGET).orderBy("source", "lang")


def apportion_budget(cells: DataFrame, budget: int) -> DataFrame:
    """Largest-remainder core over a (source, lang, cell_tokens) frame —
    factored out of the catalog query so property tests can drive it on
    arbitrary synthetic cell frames. See q_token_budget_apportionment for
    semantics and the decimal-rounding note."""
    tot = cells.agg(F.sum("cell_tokens").cast("decimal(38,0)").alias("__N"))
    prod = F.col("cell_tokens").cast("decimal(38,0)") * F.lit(budget)
    based = (
        cells.crossJoin(F.broadcast(tot))
        .withColumn("__rem", prod % F.col("__N"))
        .withColumn(
            "__base",
            ((prod - F.col("__rem")) / F.col("__N")).cast("long"),
        )
    )
    leftover = based.agg(
        (F.lit(budget) - F.sum("__base")).cast("long").alias("__L")
    )
    rn = F.row_number().over(
        Window.orderBy(F.col("__rem").desc(), F.col("source"), F.col("lang"))
    )
    return (
        based.crossJoin(F.broadcast(leftover))
        .withColumn("__rn", rn)
        .select(
            "source",
            "lang",
            "cell_tokens",
            (
                F.col("__base")
                + F.when(F.col("__rn") <= F.col("__L"), F.lit(1)).otherwise(F.lit(0))
            )
            .cast("long")
            .alias("quota"),
        )
    )


SQL_TOKEN_BUDGET_APPORTIONMENT = f"""
WITH cells AS (
  SELECT source, lang,
         CAST(SUM(len({_TOKS.format(c='text')})) AS BIGINT) AS cell_tokens
  FROM documents GROUP BY source, lang
),
tot AS (SELECT CAST(SUM(cell_tokens) AS HUGEINT) AS n FROM cells),
based AS (
  SELECT source, lang, cell_tokens,
         (CAST(cell_tokens AS HUGEINT) * {APPORTION_BUDGET}) // n AS base,
         (CAST(cell_tokens AS HUGEINT) * {APPORTION_BUDGET}) % n AS rem
  FROM cells, tot
),
lo AS (SELECT {APPORTION_BUDGET} - CAST(SUM(base) AS BIGINT) AS leftover FROM based)
SELECT source, lang, cell_tokens,
       CAST(base + CASE WHEN ROW_NUMBER()
                             OVER (ORDER BY rem DESC, source, lang) <= leftover
                        THEN 1 ELSE 0 END AS BIGINT) AS quota
FROM based, lo
ORDER BY source, lang
"""


# ----------------------------------------------------------- BPE pair mining
# control char joins the two tokens of a pair: never produced by the
# pre-tokenizer (\x01 is non-whitespace, so a whitespace-run token can't
# contain it, and the other token classes are printable); SQL side: chr(1)
PAIR_SEP = "\u0001"


def q_bpe_pair_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One iteration of BPE-merge candidate mining: frequencies of ADJACENT
    token pairs under the GPT2-ish pre-tokenizer — the aggregate the BPE
    training loop computes each round to pick its next merge. Top 20 by
    (count desc, pair asc).

    Scale: pair explosion is map-side (adjacent-slice zip over the token
    array, no self-join); the only shuffle is the pair-count aggregate with
    map-side partial aggregation, and top-k is TakeOrderedAndProject.

    Pairing rides slice + arrays_zip + a post-explode codegen concat (r13):
    the previous `F.transform(sequence(...), concat(element_at...))` is a
    higher-order function — CodegenFallback, one interpreted lambda eval
    per PAIR (~1M per sf0.1 pass) — where slice/arrays_zip/explode/concat
    all stay inside whole-stage codegen. Identical pair list by
    construction (zip of the array against its own 1-shifted self IS the
    adjacency walk); measured 1.4-2.0 -> 1.0-1.3 s warm at sf0.1. The
    non-whitespace filter stays a HOF: one cheap lambda per piece, and the
    array-local form adds no shuffle (an explode-first + rlike-codegen
    variant needs a per-doc window shuffle to rebuild adjacency)."""
    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    pieces = F.regexp_extract_all(F.col("text"), F.lit(BPE_PATTERN), 0)
    non_ws = F.filter(pieces, lambda p: ~p.rlike(r"^\s+$"))
    n = F.size(non_ws)
    zipped = F.when(n >= 2, F.arrays_zip(
        F.slice(non_ws, 1, n - 1).alias("x"),
        F.slice(non_ws, 2, n - 1).alias("y"),
    )).otherwise(F.array().cast("array<struct<x:string,y:string>>"))
    return (
        docs.select(F.explode(zipped).alias("z"))
        .select(F.concat(F.col("z.x"), F.lit(PAIR_SEP), F.col("z.y")).alias("pair"))
        .groupBy("pair")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .orderBy(F.col("n_occurrences").desc(), F.col("pair").asc())
        .limit(20)
    )


_BPE_SQL_PATTERN = BPE_PATTERN.replace("'", "''")

SQL_BPE_PAIR_STATS = rf"""
WITH toks AS (
  SELECT list_filter(regexp_extract_all(text, '{_BPE_SQL_PATTERN}'),
                     t -> NOT regexp_matches(t, '^\s+$')) AS l
  FROM documents
),
pairs AS (
  SELECT unnest(CASE WHEN len(l) >= 2
                THEN list_transform(range(1, len(l)), i -> l[i] || chr(1) || l[i+1])
                ELSE CAST([] AS VARCHAR[]) END) AS pair
  FROM toks
)
SELECT pair, CAST(COUNT(*) AS BIGINT) AS n_occurrences
FROM pairs
GROUP BY pair
ORDER BY n_occurrences DESC, pair ASC
LIMIT 20
"""


# ------------------------------------------------------- length-bucket packing
N_LENGTH_BUCKETS = 8


def q_length_bucket_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-bucketed batching efficiency: docs are NTILE'd into 8 buckets
    by token length (total order pinned by (n_tokens, doc_id)), and each
    bucket reports the padding a pad-to-bucket-max batching strategy
    wastes — the measurement that justifies length bucketing over global
    pad-to-max in a training dataloader.

    Scale: one scan, one window shuffle; NTILE's state is a row counter."""
    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    nt = token_count(F.col("text"))
    w = Window.orderBy(F.col("n_tokens").asc(), F.col("doc_id").asc())
    return (
        docs.select(F.col("doc_id"), nt.alias("n_tokens"))
        .withColumn("bucket", F.ntile(N_LENGTH_BUCKETS).over(w))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("n_tokens").alias("min_tokens"),
            F.max("n_tokens").alias("max_tokens"),
            F.sum("n_tokens").cast("long").alias("sum_tokens"),
            F.round(
                F.try_divide(
                    F.max("n_tokens") * F.count(F.lit(1)) - F.sum("n_tokens"),
                    F.max("n_tokens") * F.count(F.lit(1)),
                ),
                6,
            ).alias("padding_frac"),
        )
        .orderBy("bucket")
    )


SQL_LENGTH_BUCKET_PACKING = f"""
WITH sized AS (
  SELECT doc_id, CAST(len({_TOKS.format(c='text')}) AS BIGINT) AS n_tokens
  FROM documents
),
bucketed AS (
  SELECT n_tokens,
         NTILE({N_LENGTH_BUCKETS}) OVER (ORDER BY n_tokens ASC, doc_id ASC) AS bucket
  FROM sized
)
SELECT bucket,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       MIN(n_tokens) AS min_tokens,
       MAX(n_tokens) AS max_tokens,
       CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
       ROUND((MAX(n_tokens) * COUNT(*) - SUM(n_tokens))
             / (MAX(n_tokens) * COUNT(*)), 6) AS padding_frac
FROM bucketed
GROUP BY bucket
ORDER BY bucket
"""


# ----------------------------------------------------------- token rarity
def q_token_rarity_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-proxy rarity scoring without transcendentals: each doc's
    rarity is the mean corpus frequency of its tokens (low mean = rare
    vocabulary), quantized by integer floor-division BEFORE the per-source
    average so every aggregation is order-independent. The rational stand-in
    for KenLM-style logprob filtering (log() would not hash across engines).

    Scale: token frequencies are Zipf-skewed, so the tokens→frequency join
    shuffles on a skewed key — AQE skew-join splitting handles the head at
    this shape's scale, and the standard refinement is broadcasting the
    top-K hot tokens' frequencies (two-tier join) once the head no longer
    fits a single task. Per-doc and per-source rollups shuffle on uniform
    keys."""
    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    ex = docs.select(
        "doc_id", "source", F.explode(tokens(F.col("text"))).alias("token")
    )
    cf = ex.groupBy("token").agg(F.count(F.lit(1)).alias("cf"))
    doc_rarity = (
        ex.join(cf, "token")
        .groupBy("doc_id", "source")
        .agg(
            F.expr("CAST((sum(cf) * 1000) DIV count(*) AS BIGINT)").alias("rarity_q3")
        )
    )
    return (
        doc_rarity.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.sum("rarity_q3") / F.count(F.lit(1)), 3).alias("avg_rarity_q3"),
        )
        .orderBy("source")
    )


SQL_TOKEN_RARITY_STATS = f"""
WITH ex AS (
  SELECT doc_id, source, unnest({_TOKS.format(c='text')}) AS token FROM documents
),
cf AS (SELECT token, COUNT(*) AS cf FROM ex GROUP BY token),
doc_rarity AS (
  SELECT doc_id, source, CAST((SUM(cf) * 1000) // COUNT(*) AS BIGINT) AS rarity_q3
  FROM ex JOIN cf USING (token)
  GROUP BY doc_id, source
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       ROUND(SUM(rarity_q3) / COUNT(*), 3) AS avg_rarity_q3
FROM doc_rarity
GROUP BY source
ORDER BY source
"""


# ---------------------------------------------------------- bigram LM scoring
def q_bigram_lm_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram language-model document scoring — the rational stand-in for
    CCNet/KenLM perplexity filtering (the standard LLM-pipeline quality
    gate; extension surface, the reference has no text analytics). Each
    doc's score is the mean add-one-smoothed bigram probability
    P(w2|w1) = (c(w1,w2)+1)/(c(w1·)+V), integer-quantized to 1e-6 BEFORE
    the per-doc mean so every aggregate is order-independent and the
    DuckDB oracle hash-matches (no transcendental logprob — same
    discipline as token_rarity_stats). Low score = surprising/unnatural
    text; output is the 20 most surprising docs.

    Scale: documents is scanned exactly twice (the exploded bigram frame
    feeds both the count build and the scoring join); prefix counts c1 and
    the vocabulary size derive from the SMALL bigram-counts table (GROUP BY
    on split_part), never from a corpus rescan. The two corpus shuffles
    key on Zipf-skewed bigram/prefix strings — AQE skew splitting covers
    the head, and the standard 100 TB refinement is broadcasting the top-K
    hot keys' counts as a two-tier join. The per-doc rollup shuffles on
    uniform doc_id; V is a 1-row broadcast."""
    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    base = docs.select(
        "doc_id", "source", tokens(F.col("text")).alias("t")
    ).where(F.size("t") >= 2)
    ex = base.select(
        "doc_id",
        "source",
        F.explode(
            F.expr(
                "transform(sequence(1, size(t)-1),"
                " i -> struct(element_at(t, i) AS w1,"
                " concat(element_at(t, i), chr(31), element_at(t, i+1)) AS bg))"
            )
        ).alias("p"),
    ).select("doc_id", "source", "p.w1", "p.bg")
    c2 = ex.groupBy("bg").agg(F.count(F.lit(1)).alias("c2"))
    c1 = (
        c2.withColumn("w1", F.expr("split_part(bg, chr(31), 1)"))
        .groupBy("w1")
        .agg(F.sum("c2").alias("c1"))
    )
    vocab = c1.agg(F.count(F.lit(1)).alias("v"))
    return (
        ex.join(c2, "bg")
        .join(c1, "w1")
        .crossJoin(F.broadcast(vocab))
        .groupBy("doc_id", "source")
        .agg(
            F.expr(
                "CAST(sum(((c2 + 1) * 1000000) DIV (c1 + v)) DIV count(*) AS BIGINT)"
            ).alias("lm_q6"),
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
        )
        .orderBy(F.col("lm_q6").asc(), F.col("doc_id").asc())
        .limit(20)
        .select("doc_id", "source", "n_bigrams", "lm_q6")
    )


_BIGRAM_TOKS = _TOKS.format(c="text")

SQL_BIGRAM_LM_SCORES = f"""
WITH base AS (
  SELECT doc_id, source, {_BIGRAM_TOKS} AS t FROM documents
),
ex AS (
  SELECT doc_id, source,
         unnest(list_transform(range(1, len(t)), i -> t[i])) AS w1,
         unnest(list_transform(range(1, len(t)), i -> t[i] || chr(31) || t[i+1])) AS bg
  FROM base WHERE len(t) >= 2
),
c2 AS (SELECT bg, COUNT(*) AS c2 FROM ex GROUP BY bg),
c1 AS (SELECT split_part(bg, chr(31), 1) AS w1, SUM(c2) AS c1 FROM c2 GROUP BY 1),
vocab AS (SELECT COUNT(*) AS v FROM c1),
scored AS (
  SELECT doc_id, source,
         CAST(SUM(((c2 + 1) * 1000000) // (c1 + v)) // COUNT(*) AS BIGINT) AS lm_q6,
         CAST(COUNT(*) AS BIGINT) AS n_bigrams
  FROM ex JOIN c2 USING (bg) JOIN c1 USING (w1) CROSS JOIN vocab
  GROUP BY doc_id, source
)
SELECT doc_id, source, n_bigrams, lm_q6
FROM scored
ORDER BY lm_q6 ASC, doc_id ASC
LIMIT 20
"""
