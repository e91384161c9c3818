"""Core-scaling probe (r13, VERDICT r12 task 6): run a list of catalog
queries at ONE scale dir in ONE session, N runs each (warm = last), and
print a JSON dict {query: [runs_sec...]}. Run once per SPARK_GRAFT_CPUS
setting and compare — the sf0.1 bench is fixed-overhead-bound (8-core ==
32-core totals), so parallelism claims need a gen_scale rung where the
per-query compute actually dominates.

Usage: SPARK_GRAFT_CPUS=8 python tools/bench_cores.py SF_DIR OUT.json Q1 Q2 ...
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir, out_path, names = sys.argv[1], sys.argv[2], sys.argv[3:]
    n_runs = int(os.environ.get("SPARK_GRAFT_CORES_RUNS", "2"))

    from seo_audit_etl_actor_spark.queries import QUERIES
    from seo_audit_etl_actor_spark.session import get_spark

    by_name = {q.name: q for q in QUERIES}
    spark = get_spark("bench-cores")
    spark.sparkContext.setLogLevel("ERROR")
    results: dict[str, list[float]] = {}
    for name in names:
        spec = by_name[name]
        spark.sparkContext.setJobDescription(f"bench_cores: {name}")
        runs = []
        for _ in range(n_runs):
            t0 = time.perf_counter()
            spec.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(round(time.perf_counter() - t0, 3))
        results[name] = runs
        print(f"# {name}: {runs}", file=sys.stderr, flush=True)
        spark.catalog.clearCache()
    meta = {
        "sf_dir": sf_dir,
        "cpus": os.environ.get("SPARK_GRAFT_CPUS", "*"),
        "n_runs": n_runs,
    }
    with open(out_path, "w") as f:
        json.dump({"meta": meta, "runs": results}, f, indent=1)
    print(json.dumps({"meta": meta, "runs": results}))


if __name__ == "__main__":
    main()
