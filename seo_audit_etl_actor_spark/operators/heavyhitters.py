"""Heavy-hitter detection via per-partition Misra-Gries summaries + exact
candidate recount (engine extension surface — the reference has no
frequency analytics, src/etl.js:345-352).

Why not a plain groupBy? At 100 TB the token stream has billions of
distinct keys, so `explode → groupBy(token)` shuffles EVERY token
occurrence. The two-phase scheme shuffles almost nothing:

  phase 1 (map-only): each partition runs Misra-Gries with k counters over
    its local token stream and emits at most k candidate tokens. The MG
    guarantee — any item with local frequency > n_p/k survives the local
    summary — lifts to the union: if a token's GLOBAL frequency exceeds
    N/k, then (pigeonhole over the partition sums) some partition saw it
    more than n_p/k times, so it appears in that partition's candidate
    set. The union of candidates is therefore a SUPERSET of every token
    above the N/k threshold.
  phase 2: exact occurrence counts for the candidate set only — a
    broadcast semi-join keeps candidate rows (tiny fraction of the
    stream) before the shuffle, then a threshold filter on the exact
    counts. Because the final counts are exact and the candidate set is a
    superset, the OUTPUT is exactly {token : count(token)·k > N} no matter
    how the input was partitioned — deterministic, partitioning-invariant,
    and equal to what the full groupBy would have produced.

Phase 1 is an Arrow-batched mapInPandas (per-partition imperative state is
the one thing DataFrame expressions can't hold); phase 2 is pure native
expressions.
"""

from __future__ import annotations

import re
from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from seo_audit_etl_actor_spark.session import ensure_package_on_executors

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd

# Mirror of operators/text.tokens(): Spark's F.trim strips ASCII space
# only, and Java's \s is the ASCII class [ \t\n\x0B\f\r] — Python's
# str.split()/str.strip() are Unicode-aware and would tokenize NBSP-joined
# words differently, silently changing the candidate stream.
_JAVA_WS = re.compile(r"[ \t\n\x0b\f\r]+")


def _java_tokens(text: str) -> list[str]:
    stripped = text.strip(" ")
    if not stripped.strip():
        return []
    toks = _JAVA_WS.split(stripped)
    # Java String.split drops trailing empty fields but keeps leading ones.
    while toks and toks[-1] == "":
        toks.pop()
    return toks


def misra_gries_candidates(df: DataFrame, text_col: str, k: int) -> DataFrame:
    """Map-only candidate generation: one Misra-Gries summary of capacity
    k-1 per partition, emitting ≤ k-1 candidate tokens each. Output schema
    `token string`; callers dedupe. State is O(k) per task regardless of
    partition size — the property that makes this survive 100 TB."""
    ensure_package_on_executors(df.sparkSession)

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        counters: dict[str, int] = {}
        cap = k - 1
        for pdf in batches:
            for text in pdf[text_col]:
                if text is None:
                    continue
                for tok in _java_tokens(text):
                    if tok in counters:
                        counters[tok] += 1
                    elif len(counters) < cap:
                        counters[tok] = 1
                    else:
                        dead = []
                        for t in counters:
                            counters[t] -= 1
                            if counters[t] == 0:
                                dead.append(t)
                        for t in dead:
                            del counters[t]
        yield pd.DataFrame({"token": list(counters.keys())})

    return df.select(F.col(text_col)).mapInPandas(gen, "token string")


def exact_heavy_hitters(
    df: DataFrame, token_expr: Column, text_col: str, k: int
) -> DataFrame:
    """Exact tokens with global frequency·k > N, computed without a
    full-vocabulary shuffle. `token_expr` is the exploded native token
    column (the declarative mirror of `_java_tokens`); `k` sets the
    frequency threshold at N/k and the MG capacity."""
    candidates = misra_gries_candidates(df, text_col, k).distinct()
    ex = df.select(token_expr.alias("token"))
    # N without a per-token explode: sum of array sizes, map-side only
    from seo_audit_etl_actor_spark.operators.text import token_count

    total = df.agg(F.coalesce(F.sum(token_count(F.col(text_col))), F.lit(0)).alias("__n"))
    counts = (
        ex.join(F.broadcast(candidates), "token", "leftsemi")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
    )
    return (
        counts.crossJoin(F.broadcast(total))
        .where(F.col("n_occurrences") * k > F.col("__n"))
        .select("token", "n_occurrences")
    )
