"""Corpus-curation rule queries (LLM-pipeline extension surface): Gopher-style
quality-rule funnels, cross-document duplicated-span measurement, and
embedding quantization QA. The reference has no text analytics (its quality
notion is the coverage-weighted score, src/scoring.js:1-77); these are the
document-curation counterparts a 100 TB training pipeline runs before/after
that kind of scoring.

Determinism discipline (same as the rest of the catalog): every per-doc
metric that feeds a cross-row aggregate is either an exact integer or an
integer-quantized rational, and every RANGE test on a rational mean is done
by integer cross-multiplication (chars >= 4*n instead of chars/n >= 4) so no
float boundary can flip between engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from seo_audit_etl_actor_spark.operators.text import STOPWORDS, tokens
from seo_audit_etl_actor_spark.queries.llm_ext import _TOKS, _sql_md5_long
from seo_audit_etl_actor_spark.session import ensure_parallelism, load_table

# ------------------------------------------------- Gopher-style rule funnel
#
# Rules (Gopher / RedPajama-style repetition+shape gates, thresholds tuned to
# the synthetic corpus so every rule is non-vacuous — see probe numbers in
# the docstring):
#   word_count     30 <= n_tokens <= 100000
#   mean_word_len  4 <= total_chars/n_tokens <= 10   (as 4n <= chars <= 10n)
#   unique_frac    distinct/n >= 0.4                 (as 10d >= 4n)
#   top_token_frac max token count <= 0.2*n          (as 5*maxcnt <= n)
#   stopwords      >= 2 distinct EN stopwords present

_RULES = ["mean_word_len", "stopwords", "top_token_frac", "unique_frac", "word_count"]


def q_gopher_quality_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-rule pass/fail funnel over the documents table (plus the all-rules
    conjunction), the shape of a Gopher quality gate at corpus scale.

    Scale: ONE token explode -> (doc, token) partial-agg counts -> per-doc
    stats -> 5 boolean rules -> a tiny unpivoted funnel. Two shuffles (the
    (doc_id, tok) agg and the doc_id rollup); the rule evaluation itself is
    pure integer expression work on one row per doc. Corpus-probe at
    sf0.01: token count 10-99 (median 56), unique-frac 0.28-1.0, mean word
    length 3.7-5.3, top-token-frac 0.05-0.30 — every rule splits the
    corpus."""
    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    return gopher_rule_funnel(docs)


def gopher_rule_funnel(docs: DataFrame) -> DataFrame:
    """Frame-level form over any (doc_id, text) frame — property-tested
    against an independent Python model (tests/test_curation_properties)."""
    tok = docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("t"))
    per_tok = tok.groupBy("doc_id", "t").agg(F.count(F.lit(1)).alias("cnt"))
    stop_arr = "array(" + ", ".join(f"'{s}'" for s in STOPWORDS) + ")"
    per_doc = per_tok.groupBy("doc_id").agg(
        F.sum("cnt").alias("n"),
        F.sum(F.expr("cnt * length(t)")).alias("chars"),
        F.count(F.lit(1)).alias("d"),
        F.max("cnt").alias("maxcnt"),
        F.sum(F.expr(f"CASE WHEN array_contains({stop_arr}, t) THEN 1 ELSE 0 END")).alias(
            "stop_hits"
        ),
    )
    rules = per_doc.select(
        F.expr("n >= 30 AND n <= 100000").alias("word_count"),
        F.expr("chars >= 4 * n AND chars <= 10 * n").alias("mean_word_len"),
        F.expr("10 * d >= 4 * n").alias("unique_frac"),
        F.expr("5 * maxcnt <= n").alias("top_token_frac"),
        F.expr("stop_hits >= 2").alias("stopwords"),
    ).withColumn(
        "all_rules",
        F.expr(" AND ".join(_RULES)),
    )
    stacked = rules.select(
        F.expr(
            "stack(6, "
            + ", ".join(f"'{r}', {r}" for r in _RULES + ["all_rules"])
            + ") AS (rule, pass)"
        )
    )
    return (
        stacked.groupBy("rule")
        .agg(
            F.sum(F.expr("CASE WHEN pass THEN 1 ELSE 0 END")).alias("n_pass"),
            F.sum(F.expr("CASE WHEN pass THEN 0 ELSE 1 END")).alias("n_fail"),
        )
        .orderBy("rule")
    )


def _sql_gopher_quality_rules() -> str:
    toks = _TOKS.format(c="text")
    stop_list = "[" + ", ".join(f"'{s}'" for s in STOPWORDS) + "]"
    rule_exprs = {
        "word_count": "n >= 30 AND n <= 100000",
        "mean_word_len": "chars >= 4 * n AND chars <= 10 * n",
        "unique_frac": "10 * d >= 4 * n",
        "top_token_frac": "5 * maxcnt <= n",
        "stopwords": "stop_hits >= 2",
    }
    all_expr = " AND ".join(f"({e})" for e in rule_exprs.values())
    legs = "\nUNION ALL\n".join(
        f"SELECT '{name}' AS rule, {expr} AS pass FROM per_doc"
        for name, expr in rule_exprs.items()
    ) + f"\nUNION ALL\nSELECT 'all_rules' AS rule, {all_expr} AS pass FROM per_doc"
    return f"""
WITH tok AS (
  SELECT doc_id, unnest({toks}) AS t FROM documents
),
per_tok AS (
  SELECT doc_id, t, CAST(COUNT(*) AS BIGINT) AS cnt FROM tok GROUP BY doc_id, t
),
per_doc AS (
  SELECT doc_id,
         CAST(SUM(cnt) AS BIGINT) AS n,
         CAST(SUM(cnt * len(t)) AS BIGINT) AS chars,
         CAST(COUNT(*) AS BIGINT) AS d,
         CAST(MAX(cnt) AS BIGINT) AS maxcnt,
         CAST(SUM(CASE WHEN list_contains({stop_list}, t) THEN 1 ELSE 0 END) AS BIGINT) AS stop_hits
  FROM per_tok GROUP BY doc_id
),
stacked AS (
{legs}
)
SELECT rule,
       CAST(SUM(CASE WHEN pass THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
       CAST(SUM(CASE WHEN pass THEN 0 ELSE 1 END) AS BIGINT) AS n_fail
FROM stacked
GROUP BY rule
ORDER BY rule
"""


SQL_GOPHER_QUALITY_RULES = _sql_gopher_quality_rules()


# --------------------------------------- cross-doc duplicated-span coverage
#
# The Lee-et-al / RefinedWeb measurement behind substring-level dedup: what
# fraction of each document's k-gram shingles also appears in ANOTHER
# document. Bucketed into deciles -> a corpus "duplication pressure"
# histogram that tells you whether passage-level dedup is worth running.

_SPAN_K = 8


def q_dup_ngram_span_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram of per-doc duplicated 8-gram coverage.

    Scale: one scan -> distinct hashed shingles per doc (32-bit ints, the
    strings never shuffle) -> explode -> ONE shuffle on the shingle hash to
    count distinct docs per gram (uniform key space, no hot keys) -> doc
    rollup -> 10-bucket histogram. Per-bucket dup fraction is a ratio of
    exact BIGINT shingle counts, so the oracle hash-matches."""
    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    return dup_span_histogram(docs)


def dup_span_histogram(docs: DataFrame, k: int = _SPAN_K) -> DataFrame:
    """Frame-level form over any (doc_id, text) frame — property-tested
    against an independent Python model (tests/test_curation_properties)."""
    from seo_audit_etl_actor_spark.operators.dedup import hashed_shingle_set

    sh = docs.select(
        "doc_id", F.explode(hashed_shingle_set(F.col("text"), k=k)).alias("g")
    )
    per_gram = sh.groupBy("g").agg(F.countDistinct("doc_id").alias("nd"))
    per_doc = (
        sh.join(per_gram, "g")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("total_grams"),
            F.sum(F.expr("CASE WHEN nd >= 2 THEN 1 ELSE 0 END")).alias("dup_grams"),
        )
    )
    return (
        per_doc.groupBy(
            F.expr("CAST(FLOOR(10.0 * dup_grams / total_grams) AS BIGINT)").alias(
                "dup_decile"
            )
        )
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("dup_grams").alias("sum_dup_grams"),
            F.sum("total_grams").alias("sum_total_grams"),
            (F.sum("dup_grams") / F.sum("total_grams")).alias("dup_frac"),
        )
        .orderBy("dup_decile")
    )


def _sql_dup_ngram_span_ratio(k: int = _SPAN_K) -> str:
    from seo_audit_etl_actor_spark.operators.dedup import MASK32

    toks = _TOKS.format(c="text")
    grams = " || ' ' || ".join(f"t[i+{j}]" for j in range(k))
    return f"""
WITH toks AS (
  SELECT doc_id, {toks} AS t FROM documents
),
sh AS (
  SELECT doc_id,
         unnest(list_distinct(list_transform(range(1, len(t) - {k - 2}),
                i -> {_sql_md5_long(f'({grams})')} & {MASK32}))) AS g
  FROM toks WHERE len(t) >= {k}
),
per_gram AS (
  SELECT g, COUNT(DISTINCT doc_id) AS nd FROM sh GROUP BY g
),
per_doc AS (
  SELECT doc_id,
         CAST(COUNT(*) AS BIGINT) AS total_grams,
         CAST(SUM(CASE WHEN nd >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS dup_grams
  FROM sh JOIN per_gram USING (g)
  GROUP BY doc_id
)
SELECT CAST(FLOOR(10.0 * dup_grams / total_grams) AS BIGINT) AS dup_decile,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(dup_grams) AS BIGINT) AS sum_dup_grams,
       CAST(SUM(total_grams) AS BIGINT) AS sum_total_grams,
       CAST(SUM(dup_grams) AS BIGINT) / CAST(SUM(total_grams) AS BIGINT) AS dup_frac
FROM per_doc
GROUP BY dup_decile
ORDER BY dup_decile
"""


SQL_DUP_NGRAM_SPAN_RATIO = _sql_dup_ngram_span_ratio()


# ------------------------------------------------ embedding quantization QA
#
# Symmetric int8 quantization (scale = max|x| / 127 per vector) with
# reconstruction-error stats per label — the QA step before shipping
# quantized vectors to an ANN index.
#
# Float discipline: a cross-engine float FOLD (list sum) is NOT safe — the
# engines may sum in different orders/pairings, and a last-ulp difference
# can flip a downstream ROUND. So every per-ELEMENT error is an identical
# scalar expression in both engines, quantized to an integer PER ELEMENT
# (squared error at 1e-12, max-abs at 1e-9), and only integers are ever
# summed. max() is order-independent, so the max-abs error may stay a
# double until its own quantization.

_EMB_DIM = 64


def q_embedding_quantization_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label int8-quantization reconstruction error (avg max-abs error
    and avg MSE, integer-quantized per element).

    Scale (r12 rep-collapse): the per-vector math depends only on the
    element values, so it runs once per DISTINCT (embedding, label) group
    and label aggregates weight by the group's copy count — exact
    integers either way, so the output is bit-identical to the unchanged
    per-copy oracle (same BIGINT sums, same division operand order). One
    map-side-combining groupBy over the raw scan is the only full-corpus
    shuffle; the unrolled per-rep lambda work (the HOF form interpreted
    one lambda per element — ~20 s/pass on the 2M-vector bench corpus)
    shrinks 1000× on the replica-heavy corpus and is bounded by distinct
    vectors on any corpus. 100 TB: embarrassingly parallel."""
    emb = load_table(spark, sf_dir, "embeddings")
    g = emb.groupBy("embedding", "label").agg(F.count(F.lit(1)).alias("nc"))
    x = [f"CAST(element_at(embedding, {j}) AS DOUBLE)" for j in range(1, _EMB_DIM + 1)]
    s_df = g.select(
        "label",
        "nc",
        "embedding",
        F.expr(f"GREATEST({', '.join(f'abs({xj})' for xj in x)}) / 127.0").alias("s"),
    )
    e_df = s_df.select(
        "label",
        "nc",
        "s",
        *[
            F.expr(f"({xj} - ROUND({xj} / s) * s)").alias(f"e{j}")
            for j, xj in enumerate(x, start=1)
        ],
    )
    abs_terms = ", ".join(f"abs(e{j})" for j in range(1, _EMB_DIM + 1))
    sse_terms = " + ".join(
        f"CAST(ROUND(e{j} * e{j} * 1e12) AS BIGINT)" for j in range(1, _EMB_DIM + 1)
    )
    per_rep = e_df.select(
        "label",
        "nc",
        F.expr(
            "CASE WHEN s = 0.0 THEN CAST(0 AS BIGINT) "
            f"ELSE CAST(ROUND(GREATEST({abs_terms}) * 1e9) AS BIGINT) END"
        ).alias("maxerr9"),
        F.expr(
            f"CASE WHEN s = 0.0 THEN CAST(0 AS BIGINT) ELSE ({sse_terms}) END"
        ).alias("sse12"),
    )
    return (
        per_rep.groupBy("label")
        .agg(
            F.sum("nc").alias("n_vecs"),
            (F.sum(F.col("nc") * F.col("maxerr9")) / F.sum("nc") / 1e9).alias(
                "avg_max_err"
            ),
            (F.sum(F.col("nc") * F.col("sse12")) / F.sum("nc") / 1e12).alias("avg_sse"),
        )
        .orderBy("label")
    )


# ------------------------------------------- label-centroid outlier scan
#
# The D4/SemDeDup-style curation prefilter: vectors far from their own
# label's centroid are mislabeled/noisy candidates. Centroid numerators are
# per-element 1e-6-quantized BIGINT sums (exact, order-independent); each
# vector's squared distance is a per-dim 1e-12-quantized BIGINT sum; the
# outlier cut compares the integer distance against 1.05x the label mean
# (mean = exact-int sum / count, one deterministic double op per label).
# Why 1.05x: in 64 dimensions distances CONCENTRATE — the sf0.01 corpus'
# per-label max/mean ratio is only 1.05-1.12, so the low-dimensional "2x
# mean" intuition flags nothing; the tail cut must sit inside the
# concentration band.

def q_embedding_centroid_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid-distance stats + >1.05x-mean outlier counts.

    Scale (r12 rep-collapse rewrite): the old shape posexploded ×64 rows
    (128M rows on the 2M-vector bench corpus) through two wide shuffles
    and a label window. Every per-vector quantity here depends only on
    (embedding, label), so the work collapses to one row per distinct
    pair (copy-count-weighted): centroid sums become Σ nc·q6 BIGINT lanes
    (exact integers, order-free — identical to the per-copy sums), the
    distance chain runs once per rep against the broadcast centroid row,
    and the mean/outlier pass weights by nc. One map-side-combining
    groupBy over the raw scan is the only full-corpus shuffle; no window
    (a label window shuffles the whole corpus onto n_labels reducers —
    the skew trap at 100 TB). Bit-identical to the unchanged oracle:
    every double op (centroid division, mean division, 1.05× compare)
    keeps the original operand order over the same exact-integer sums."""
    emb = load_table(spark, sf_dir, "embeddings")
    g = (
        emb.groupBy("embedding", "label")
        .agg(F.count(F.lit(1)).alias("nc"))
        .localCheckpoint(eager=True)
    )
    x = [f"CAST(element_at(embedding, {j}) AS DOUBLE)" for j in range(1, _EMB_DIM + 1)]
    cent = (
        g.groupBy("label")
        .agg(
            F.sum("nc").alias("n"),
            *[
                F.sum(F.col("nc") * F.expr(f"CAST(ROUND({xj} * 1e6) AS BIGINT)")).alias(
                    f"s{j}"
                )
                for j, xj in enumerate(x, start=1)
            ],
        )
        .select(
            "label",
            *[
                F.expr(f"s{j} / n / 1e6").alias(f"c{j}")
                for j in range(1, _EMB_DIM + 1)
            ],
        )
    )
    dist_terms = " + ".join(
        f"CAST(ROUND(({xj} - c{j}) * ({xj} - c{j}) * 1e12) AS BIGINT)"
        for j, xj in enumerate(x, start=1)
    )
    per_rep = g.join(F.broadcast(cent), "label").select(
        "label", "nc", F.expr(f"({dist_terms})").alias("dist2q")
    )
    lab = per_rep.groupBy("label").agg(
        F.sum(F.col("nc") * F.col("dist2q")).alias("sumd"),
        F.sum("nc").alias("cnt"),
    )
    flagged = per_rep.join(F.broadcast(lab), "label").select(
        "label",
        "nc",
        "dist2q",
        (
            F.col("dist2q").cast("double")
            > 1.05 * (F.col("sumd") / F.col("cnt"))
        ).alias("is_outlier"),
    )
    return (
        flagged.groupBy("label")
        .agg(
            F.sum("nc").alias("n_vecs"),
            (F.sum(F.col("nc") * F.col("dist2q")) / F.sum("nc") / 1e12).alias(
                "avg_dist2"
            ),
            F.sum(F.expr("CASE WHEN is_outlier THEN nc ELSE 0 END")).alias(
                "n_outliers"
            ),
        )
        .orderBy("label")
    )


SQL_EMBEDDING_CENTROID_OUTLIERS = """
WITH ex AS (
  SELECT vec_id, label, u.i AS i, u.x AS x FROM (
    SELECT vec_id, label,
           unnest(list_transform(range(1, len(embedding) + 1),
                  i -> {'i': i, 'x': CAST(embedding[i] AS DOUBLE)})) AS u
    FROM embeddings
  )
),
cent AS (
  SELECT label, i,
         CAST(SUM(CAST(ROUND(x * 1e6) AS BIGINT)) AS BIGINT) / COUNT(*) / 1e6 AS c
  FROM ex GROUP BY label, i
),
per_vec AS (
  SELECT vec_id, ex.label AS label,
         CAST(SUM(CAST(ROUND((x - c) * (x - c) * 1e12) AS BIGINT)) AS BIGINT) AS dist2q
  FROM ex JOIN cent ON ex.label = cent.label AND ex.i = cent.i
  GROUP BY vec_id, ex.label
),
flagged AS (
  SELECT label, dist2q,
         CAST(dist2q AS DOUBLE)
           > 1.05 * (SUM(dist2q) OVER (PARTITION BY label)
                    / COUNT(*) OVER (PARTITION BY label)) AS is_outlier
  FROM per_vec
)
SELECT label,
       CAST(COUNT(*) AS BIGINT) AS n_vecs,
       CAST(SUM(dist2q) AS BIGINT) / COUNT(*) / 1e12 AS avg_dist2,
       CAST(SUM(CASE WHEN is_outlier THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
FROM flagged
GROUP BY label
ORDER BY label
"""


_SQL_XS = "list_transform(embedding, x -> CAST(x AS DOUBLE))"
_SQL_AMAX = "list_aggregate(list_transform(xs, x -> abs(x)), 'max')"

SQL_EMBEDDING_QUANTIZATION_ERROR = f"""
WITH xs AS (
  SELECT label, {_SQL_XS} AS xs FROM embeddings
),
scaled AS (
  SELECT label, xs, {_SQL_AMAX} / 127.0 AS s FROM xs
),
errs AS (
  SELECT label,
         CASE WHEN s = 0.0 THEN CAST([] AS DOUBLE[])
              ELSE list_transform(xs, x -> x - round(x / s) * s) END AS e
  FROM scaled
),
per_vec AS (
  SELECT label,
         CAST(ROUND(COALESCE(list_aggregate(list_transform(e, x -> abs(x)), 'max'), 0.0) * 1e9) AS BIGINT) AS maxerr9,
         CAST(COALESCE(list_aggregate(list_transform(e, x -> CAST(ROUND(x * x * 1e12) AS BIGINT)), 'sum'), 0) AS BIGINT) AS sse12
  FROM errs
)
SELECT label,
       CAST(COUNT(*) AS BIGINT) AS n_vecs,
       CAST(SUM(maxerr9) AS BIGINT) / COUNT(*) / 1e9 AS avg_max_err,
       CAST(SUM(sse12) AS BIGINT) / COUNT(*) / 1e12 AS avg_sse
FROM per_vec
GROUP BY label
ORDER BY label
"""


# ------------------------------------------------ DSIR importance weights
#
# Data Selection via Importance Resampling (Xie et al. 2023), rational form:
# treat two sources as the TARGET domain, score every document by the mean
# per-token importance ratio
#   r(w) = p_target(w) / p_raw(w)
#        = (c_t(w)+1)(N_r+V) / ((c_r(w)+1)(N_t+V))   (add-one smoothing)
# and report per-source selection stats (a doc "resamples in" when its mean
# ratio > 1). Same rational discipline as bigram_lm_scores: the ratio is
# integer-quantized to 1e-6 PER TOKEN before the per-doc mean, and the
# select cut is an integer cross-multiplication — no float boundary.

_DSIR_TARGET = ("src0", "src1")


def q_dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source DSIR selection stats: mean importance weight and the
    count of docs whose mean ratio exceeds 1 (the resampling keep set).

    Scale: one token explode -> ONE (token) shuffle computing raw+target
    counts in the same pass (conditional sums — no second scan for the
    target distribution) -> broadcast of the vocab-sized stats frame back
    onto the token stream (bounded vocab; open-vocab corpora flip this to
    a shuffle join) -> doc rollup -> source rollup."""
    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    tok = docs.select(
        "doc_id", "source", F.explode(tokens(F.col("text"))).alias("t")
    )
    in_target = "source IN ({})".format(
        ", ".join(f"'{s}'" for s in _DSIR_TARGET)
    )
    stats = tok.groupBy("t").agg(
        F.count(F.lit(1)).alias("c_r"),
        F.sum(F.expr(f"CASE WHEN {in_target} THEN 1 ELSE 0 END")).alias("c_t"),
    )
    totals = stats.agg(
        F.sum("c_r").alias("n_r"),
        F.sum("c_t").alias("n_t"),
        F.count(F.lit(1)).alias("v"),
    )
    rq = (
        "CAST(ROUND(1e6 * ((c_t + 1) * (n_r + v)) / ((c_r + 1) * (n_t + v))) AS BIGINT)"
    )
    per_doc = (
        tok.join(F.broadcast(stats), "t")
        .crossJoin(F.broadcast(totals))
        .groupBy("doc_id", "source")
        .agg(F.sum(F.expr(rq)).alias("sum_rq"), F.count(F.lit(1)).alias("n_tok"))
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            (F.sum("sum_rq") / F.sum("n_tok") / 1e6).alias("mean_importance"),
            F.sum(F.expr("CASE WHEN sum_rq > 1000000 * n_tok THEN 1 ELSE 0 END")).alias(
                "n_selected"
            ),
        )
        .orderBy("source")
    )


def _sql_dsir_importance_weights() -> str:
    toks = _TOKS.format(c="text")
    in_target = "source IN ({})".format(", ".join(f"'{s}'" for s in _DSIR_TARGET))
    return f"""
WITH tok AS (
  SELECT doc_id, source, unnest({toks}) AS t FROM documents
),
stats AS (
  SELECT t, CAST(COUNT(*) AS BIGINT) AS c_r,
         CAST(SUM(CASE WHEN {in_target} THEN 1 ELSE 0 END) AS BIGINT) AS c_t
  FROM tok GROUP BY t
),
totals AS (
  SELECT CAST(SUM(c_r) AS BIGINT) AS n_r, CAST(SUM(c_t) AS BIGINT) AS n_t,
         CAST(COUNT(*) AS BIGINT) AS v
  FROM stats
),
per_doc AS (
  SELECT doc_id, source,
         CAST(SUM(CAST(ROUND(1e6 * ((c_t + 1) * (n_r + v)) / ((c_r + 1) * (n_t + v))) AS BIGINT)) AS BIGINT) AS sum_rq,
         CAST(COUNT(*) AS BIGINT) AS n_tok
  FROM tok JOIN stats USING (t) CROSS JOIN totals
  GROUP BY doc_id, source
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(sum_rq) AS BIGINT) / CAST(SUM(n_tok) AS BIGINT) / 1e6 AS mean_importance,
       CAST(SUM(CASE WHEN sum_rq > 1000000 * n_tok THEN 1 ELSE 0 END) AS BIGINT) AS n_selected
FROM per_doc
GROUP BY source
ORDER BY source
"""


SQL_DSIR_IMPORTANCE_WEIGHTS = _sql_dsir_importance_weights()


# ----------------------------------------------- sparse retrieval (IDF set)
#
# Inverted-index sparse retrieval — the BM25-shaped RAG primitive, in the
# catalog's rational form: the indexing unit is the distinct word BIGRAM
# (single tokens are degenerate on this corpus: 30 of 31 tokens appear in
# >70% of docs), a posting list is pruned when its df exceeds N/2 (the
# classic stop-posting cut that bounds the index join's fan-out at scale),
# and each query-doc score is the integer sum of quantized IDF weights
#   w(t) = ROUND(1e6 * (N - df + 0.5) / (df + 0.5))
# over SHARED distinct bigrams. No tf saturation term -> every score is an
# exact BIGINT and the top-k cut is deterministic with the doc_id tiebreak.

_RETRIEVAL_N_QUERIES = 5  # docs 0..4 double as the query set
_RETRIEVAL_TOPK = 3


def q_sparse_retrieval_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 corpus docs per query doc by shared-bigram IDF weight.

    Scale: the posting frame is built from ONE gram explode — per-doc grams
    are already DISTINCT, so df is a plain COUNT(*) window over the gram
    key (O(1) window state; no groupBy+re-join, which would re-scan the
    corpus — the first draft did and the plan audit flagged documents x3).
    N comes in as a 1-row broadcast (no driver-side count action). The
    query side is a filter of the same posting frame (exchange-reused, not
    re-scanned), broadcast onto the postings; candidate scoring shuffles on
    (query, doc). Self-matches excluded; window top-k, (score desc,
    doc_id) total order."""
    from seo_audit_etl_actor_spark.operators.dedup import hashed_shingle_set
    from pyspark.sql import Window

    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    grams = docs.select(
        "doc_id", F.explode(hashed_shingle_set(F.col("text"), k=2)).alias("g")
    )
    n_frame = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    wdf = Window.partitionBy("g")
    postings = (
        grams.withColumn("df", F.count(F.lit(1)).over(wdf))
        .crossJoin(F.broadcast(n_frame))
        .where(F.expr("2 * df <= n_docs"))
        .withColumn(
            "w",
            F.expr("CAST(ROUND(1e6 * (n_docs - df + 0.5) / (df + 0.5)) AS BIGINT)"),
        )
        .select("doc_id", "g", "w")
    )
    queries = postings.where(F.col("doc_id") < _RETRIEVAL_N_QUERIES).select(
        F.col("doc_id").alias("query_id"), "g"
    )
    scored = (
        postings.join(F.broadcast(queries), "g")
        .where(F.col("doc_id") != F.col("query_id"))
        .groupBy("query_id", "doc_id")
        .agg(F.sum("w").alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= _RETRIEVAL_TOPK)
        .select("query_id", "rank", "doc_id", "score")
        .orderBy("query_id", "rank")
    )


def _sql_sparse_retrieval_topk() -> str:
    from seo_audit_etl_actor_spark.operators.dedup import MASK32

    toks = _TOKS.format(c="text")
    gram = "t[i] || ' ' || t[i+1]"
    return f"""
WITH toks AS (
  SELECT doc_id, {toks} AS t FROM documents
),
grams AS (
  SELECT doc_id,
         unnest(list_distinct(list_transform(range(1, len(t)),
                i -> {_sql_md5_long(f'({gram})')} & {MASK32}))) AS g
  FROM toks WHERE len(t) >= 2
),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
dfc AS (SELECT g, COUNT(DISTINCT doc_id) AS df FROM grams GROUP BY g),
postings AS (
  SELECT doc_id, g,
         CAST(ROUND(1e6 * (n_docs - df + 0.5) / (df + 0.5)) AS BIGINT) AS w
  FROM grams JOIN dfc USING (g) CROSS JOIN n
  WHERE 2 * df <= n_docs
),
queries AS (
  SELECT doc_id AS query_id, g FROM postings WHERE doc_id < {_RETRIEVAL_N_QUERIES}
),
scored AS (
  SELECT query_id, p.doc_id AS doc_id, CAST(SUM(w) AS BIGINT) AS score
  FROM postings p JOIN queries q USING (g)
  WHERE p.doc_id <> q.query_id
  GROUP BY query_id, p.doc_id
)
SELECT query_id, rank, doc_id, score FROM (
  SELECT query_id, doc_id, score,
         CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id) AS BIGINT) AS rank
  FROM scored
)
WHERE rank <= {_RETRIEVAL_TOPK}
ORDER BY query_id, rank
"""


SQL_SPARSE_RETRIEVAL_TOPK = _sql_sparse_retrieval_topk()
