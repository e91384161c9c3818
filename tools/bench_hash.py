"""xxhash64 production-hash ladder probe (round-6 verdict task 6): time the
minhash and simhash near-dup pipelines end-to-end at the big rungs under
both hash families. The r5 probe measured the HASH PASS alone at ~5x
(43.7 s md5 vs 9.0 s xxhash64 for 85.6M tokens at 316x); this measures
what that buys at the PIPELINE level, where banding shuffles and
verification joins dilute it.

Usage: python tools/bench_hash.py /tmp/scale_m316 [/tmp/scale_m1000 ...]
Prints one JSON line {"hash_study": {dir: {query: {md5: s, xxhash64: s}}}}.
Warm numbers (second run) are the signal; memory discipline matches
tools/bench_scale.py (clearCache + pin drain between runs).

CAUTION (measured r7): at the m1000 rung the shared session accumulates
checkpoint/shuffle state across the 8 configs faster than drain +
clearCache reclaims it and the JVM dies mid-ladder even at 24g — use
tools/bench_hash_one.py (one config per JVM) for m1000+.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    dirs = sys.argv[1:]
    assert dirs, "need >=1 scale dirs"

    from seo_audit_etl_actor_spark.operators import dedup, pin_registry
    from seo_audit_etl_actor_spark.session import ensure_parallelism, get_spark, load_table

    spark = get_spark("bench-hash")
    spark.sparkContext.setLogLevel("ERROR")

    def run_minhash(d: str, hash_fn: str) -> None:
        docs = ensure_parallelism(load_table(spark, d, "documents"))
        dedup.minhash_near_dup_pairs(docs, threshold=0.5, hash_fn=hash_fn).write.format(
            "noop"
        ).mode("overwrite").save()

    def run_simhash(d: str, hash_fn: str) -> None:
        docs = ensure_parallelism(load_table(spark, d, "documents"))
        dedup.simhash_near_dup_pairs(docs, hash_fn=hash_fn).write.format("noop").mode(
            "overwrite"
        ).save()

    results: dict[str, dict] = {}
    for d in dirs:
        results[d] = {}
        for qname, fn in (("minhash_near_dup", run_minhash), ("simhash_near_dup", run_simhash)):
            results[d][qname] = {}
            for hash_fn in ("md5", "xxhash64"):
                runs = []
                for _ in range(2):
                    t0 = time.time()
                    fn(d, hash_fn)
                    runs.append(time.time() - t0)
                    pin_registry.drain()
                    spark.catalog.clearCache()
                results[d][qname][hash_fn] = round(runs[-1], 2)
                print(f"{qname} {hash_fn} @ {d}: runs={[round(r,2) for r in runs]}", file=sys.stderr)
    print(json.dumps({"hash_study": results}))


if __name__ == "__main__":
    main()
