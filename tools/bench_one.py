"""Isolate ONE catalog query in a fresh JVM (guide §1): build time,
N noop-sink executions, and optionally the formatted plan to a file.

Usage: python tools/bench_one.py QUERY [N_RUNS] [--plan OUT.txt] [--sf DIR]
Prints one JSON line {"query":..., "build_sec":..., "runs_sec":[...]}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    name = args[0]
    n_runs = int(args[1]) if len(args) > 1 else 3
    plan_out = None
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    argv = sys.argv[1:]
    for i, a in enumerate(argv):
        if a == "--plan":
            plan_out = argv[i + 1]
        if a == "--sf":
            sf_dir = argv[i + 1]

    from seo_audit_etl_actor_spark.plans.audit import plan_string
    from seo_audit_etl_actor_spark.queries import QUERIES
    from seo_audit_etl_actor_spark.session import get_spark

    spec = next(q for q in QUERIES if q.name == name)
    spark = get_spark("bench-one")
    spark.sparkContext.setLogLevel("ERROR")
    spark.sparkContext.setJobDescription(f"bench_one: {name}")

    runs = []
    builds = []
    for _ in range(n_runs):
        t0 = time.perf_counter()
        df = spec.fn(spark, sf_dir)
        t1 = time.perf_counter()
        builds.append(round(t1 - t0, 3))
        df.write.format("noop").mode("overwrite").save()
        runs.append(round(time.perf_counter() - t1, 3))
    build = builds[0]
    if plan_out:
        os.makedirs(os.path.dirname(plan_out) or ".", exist_ok=True)
        with open(plan_out, "w") as f:
            f.write(plan_string(spec.fn(spark, sf_dir)))
    print(
        json.dumps(
            {
                "query": name,
                "sf_dir": sf_dir,
                "build_sec": round(build, 3),
                "builds_sec": builds,
                "runs_sec": runs,
            }
        )
    )


if __name__ == "__main__":
    main()
