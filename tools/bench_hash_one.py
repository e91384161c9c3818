"""Single-config hash probe: ONE (dir, query, hash_fn) in a fresh JVM —
the one-query-per-JVM discipline the shared-session form of
tools/bench_hash.py violates at the m1000 rung (cross-config
localCheckpoint/cache accumulation exhausts even a 24g driver there;
measured r7). Drive the ladder with a shell loop over this script.

Usage: python tools/bench_hash_one.py DIR {minhash|simhash} {md5|xxhash64} [N_RUNS]
Prints one JSON line {"dir":..., "query":..., "hash_fn":..., "runs_sec":[...]}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    d, query, hash_fn = sys.argv[1:4]
    n_runs = int(sys.argv[4]) if len(sys.argv) > 4 else 2

    from seo_audit_etl_actor_spark.operators import dedup, pin_registry
    from seo_audit_etl_actor_spark.session import ensure_parallelism, get_spark, load_table

    spark = get_spark("bench-hash-one")
    spark.sparkContext.setLogLevel("ERROR")

    def run() -> None:
        docs = ensure_parallelism(load_table(spark, d, "documents"))
        if query == "minhash":
            out = dedup.minhash_near_dup_pairs(docs, threshold=0.5, hash_fn=hash_fn)
        else:
            out = dedup.simhash_near_dup_pairs(docs, hash_fn=hash_fn)
        out.write.format("noop").mode("overwrite").save()

    runs = []
    for _ in range(n_runs):
        t0 = time.time()
        run()
        runs.append(round(time.time() - t0, 2))
        pin_registry.drain()
        spark.catalog.clearCache()
    print(json.dumps({"dir": d, "query": query, "hash_fn": hash_fn, "runs_sec": runs}))


if __name__ == "__main__":
    main()
