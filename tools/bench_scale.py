"""Scaling study beyond sf0.1 (round-4 verdict task 3): run the heaviest
catalog queries at m x sf0.1 (dirs produced by tools/gen_scale.py), fit
the per-query scaling exponent b in time ~ n^b over the measured ladder,
and print one JSON document. Warm numbers (second run per size) are the
signal; exponents are a least-squares fit of log(time) on log(m).

Interpretation guard: exponents here include a fixed per-query overhead
(plan/codegen/driver, ~0.3-1 s) that DEFLATES b at small sizes, and host
noisy-neighbor throttling that can inflate a single point — pathological
fits deserve a re-run before belief (warm slower than cold in a pair is
the throttling signature; report best-of).

Usage: python tools/bench_scale.py /tmp/scale_m1 /tmp/scale_m3.162 /tmp/scale_m10

Run with SPARK_GRAFT_DRIVER_MEM=24g for ladders that include the 100x+
rungs: each heavy query fits the default 8g alone (verified standalone),
but ~36 sequential giant query-runs in ONE driver accumulate
localCheckpoint blocks faster than ContextCleaner's async py4j-GC-driven
reclamation frees them — clearCache() between rungs drops persisted
frames but not checkpoint blocks. A real cluster never runs this shape;
the extra heap is harness headroom, not a query requirement.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HEAVY = [
    "near_dup_clusters",
    "minhash_near_dup",
    "simhash_fingerprints",
    "simhash_near_dup",
    "bpe_pair_stats",
    "curation_funnel",
    "part_cooccurrence",
    "heavy_hitter_tokens",
    "tfidf_top_terms",
    # round-4 additions: span-dedup + rule funnel + LM scoring (documents),
    # the heaviest TPC-H joins (orders now replicated alongside lineitem),
    # and the embedding-explode family (embeddings now replicated).
    "dup_ngram_span_ratio",
    "gopher_quality_rules",
    "bigram_lm_scores",
    "passage_dedup_stats",
    "tpch_q5_local_supplier_volume",
    "tpch_q9_product_type_profit",
    "tpch_q21_waiting_supplier",
    "embedding_centroid_outliers",
    "embedding_quantization_error",
    # round-5 additions: the ANN retrieval family — never laddered before.
    # bruteforce is the linear baseline; lsh/ivf/rerank are the pruned
    # paths whose SCAN fraction should stay constant; near_dup_ivf is the
    # within-cell quadratic whose cell count must grow with the corpus.
    "cosine_topk_bruteforce",
    "cosine_topk_lsh",
    "cosine_topk_ivf",
    "cosine_topk_rerank",
    "embedding_near_dup_ivf",
]


def main() -> None:
    dirs = sys.argv[1:]
    assert len(dirs) >= 2, "need >=2 scale dirs"
    ms = [float(d.rsplit("_m", 1)[1]) for d in dirs]

    only = os.environ.get("SPARK_GRAFT_SCALE_QUERIES")
    heavy = [q for q in HEAVY if q in only.split(",")] if only else HEAVY

    from seo_audit_etl_actor_spark.queries.catalog import QUERIES
    from seo_audit_etl_actor_spark.session import get_spark

    spark = get_spark("bench-scale")
    spark.sparkContext.setLogLevel("ERROR")
    specs = {q.name: q for q in QUERIES}

    results: dict[str, dict] = {}
    for name in heavy:
        fn = specs[name].fn
        warm: list[float] = []
        for d in dirs:
            runs = []
            for _ in range(2):
                t0 = time.time()
                fn(spark, d).write.format("noop").mode("overwrite").save()
                runs.append(time.time() - t0)
            warm.append(runs[-1])
            print(f"{name} @ {d}: runs={[round(r, 2) for r in runs]}", file=sys.stderr)
            # measurement isolation: drop caches a query pinned (persisted
            # operator frames survive their query otherwise) so rung N+1's
            # memory budget matches a fresh session's — 10 rungs of leaked
            # minhash shingle caches heap-OOM'd the r5 ladder before this
            from seo_audit_etl_actor_spark.operators import pin_registry

            pin_registry.drain()
            spark.catalog.clearCache()
        lx = [math.log(m) for m in ms]
        ly = [math.log(t) for t in warm]
        n = len(lx)
        mx, my = sum(lx) / n, sum(ly) / n
        b = sum((x - mx) * (y - my) for x, y in zip(lx, ly)) / sum(
            (x - mx) ** 2 for x in lx
        )
        results[name] = {
            "warm_sec": [round(t, 3) for t in warm],
            "multipliers": ms,
            "exponent": round(b, 3),
        }
    print(json.dumps({"scale_study": results}))


if __name__ == "__main__":
    main()
