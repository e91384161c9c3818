"""Benchmark runner: executes every catalog query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Queries are materialized with the noop sink (full execution, no driver
collect) so the timing measures the engine, not result transfer.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from seo_audit_etl_actor_spark.queries import QUERIES  # noqa: E402
from seo_audit_etl_actor_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("seo-audit-etl-actor-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    def run_suite() -> tuple[float, dict[str, float]]:
        timings: dict[str, float] = {}
        t0 = time.perf_counter()
        for spec in QUERIES:
            qt = time.perf_counter()
            spec.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            timings[spec.name] = round(time.perf_counter() - qt, 3)
        return round(time.perf_counter() - t0, 3), timings

    # Pass 1 warms JVM/codegen/schema caches (fixed cost, amortized away at
    # cluster scale); pass 2 is the reported steady-state number.
    cold_total, _ = run_suite()
    total, timings = run_suite()

    print(
        json.dumps(
            {
                "metric": "catalog_suite_wall_clock",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "cold_total_sec": cold_total,
                "n_queries": len(QUERIES),
            }
        )
    )


if __name__ == "__main__":
    main()
