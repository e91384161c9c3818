"""Isolate ONE catalog query in a fresh JVM (guide §1): build time,
N noop-sink executions, and optionally the formatted plan to a file.

Usage: python tools/bench_one.py QUERY [N_RUNS] [--plan OUT.txt] [--sf DIR]
Prints one JSON line {"query":..., "build_sec":..., "runs_sec":[...]}.
"""

from __future__ import annotations

import argparse
import difflib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("query", help="catalog query name")
    ap.add_argument("n_runs", nargs="?", type=int, default=3)
    ap.add_argument("--plan", dest="plan_out", default=None,
                    help="write .explain('formatted') output to this file")
    ap.add_argument("--sf", dest="sf_dir",
                    default=os.environ.get("SPARK_GRAFT_SF_DIR",
                                           "/root/testdata/sf0.1"))
    ns = ap.parse_args()

    from seo_audit_etl_actor_spark.plans.audit import plan_string
    from seo_audit_etl_actor_spark.queries import QUERIES
    from seo_audit_etl_actor_spark.session import get_spark

    spec = next((q for q in QUERIES if q.name == ns.query), None)
    if spec is None:
        close = difflib.get_close_matches(ns.query, [q.name for q in QUERIES], 5)
        sys.exit(f"unknown query {ns.query!r}"
                 + (f"; did you mean: {', '.join(close)}" if close else ""))
    spark = get_spark("bench-one")
    spark.sparkContext.setLogLevel("ERROR")
    spark.sparkContext.setJobDescription(f"bench_one: {ns.query}")

    runs = []
    builds = []
    for _ in range(ns.n_runs):
        t0 = time.perf_counter()
        df = spec.fn(spark, ns.sf_dir)
        t1 = time.perf_counter()
        builds.append(round(t1 - t0, 3))
        df.write.format("noop").mode("overwrite").save()
        runs.append(round(time.perf_counter() - t1, 3))
    build = builds[0]
    if ns.plan_out:
        os.makedirs(os.path.dirname(ns.plan_out) or ".", exist_ok=True)
        with open(ns.plan_out, "w") as f:
            f.write(plan_string(spec.fn(spark, ns.sf_dir)))
    print(
        json.dumps(
            {
                "query": ns.query,
                "sf_dir": ns.sf_dir,
                "build_sec": round(build, 3),
                "builds_sec": builds,
                "runs_sec": runs,
            }
        )
    )


if __name__ == "__main__":
    main()
