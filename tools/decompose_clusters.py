"""Phase decomposition of near_dup_clusters at the big rungs (round-6
verdict task 2): the r6 ladder showed overall b_warm≈0.71 over three
decades but a local last-decade exponent ≈1.18 (throttle-confounded).
This attributes each rung's wall-clock to a NAMED term:

  - t_pairs_sec: MinHash LSH pair generation (shingle -> minhash ->
    banding -> verification), materialized to an eager localCheckpoint
    so nothing downstream re-derives it;
  - t_cc_sec: the iterative min-label loop over the checkpointed pairs,
    with per-iteration timings and changed-label counts (a tool-side
    copy of operators/components.connected_components instrumented per
    round — the operator itself stays unchanged);
  - n_pairs / n_vertices / n_iters: the volume terms that decide whether
    a superlinear decade is candidate-volume growth (pair term), graph
    diameter growth (iteration term), or neither (host throttle).

Usage: python tools/decompose_clusters.py /tmp/scale_m316 /tmp/scale_m1000
Prints one JSON line {"clusters_decomposition": {dir: {...}}}.
Run with SPARK_GRAFT_DRIVER_MEM=24g for the 316x+ rungs (same harness
headroom note as tools/bench_scale.py). Each rung runs the full
decomposition twice; both passes are reported (warm-slower-than-cold in
a pair = host throttling — report best-of, per the repo's measurement
discipline).
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def decompose_once(spark, d: str) -> dict:
    from pyspark.sql import functions as F

    from seo_audit_etl_actor_spark.operators import dedup, pin_registry
    from seo_audit_etl_actor_spark.session import ensure_parallelism, load_table

    docs = ensure_parallelism(load_table(spark, d, "documents"))
    n_docs = docs.count()

    t0 = time.time()
    pairs = dedup.minhash_near_dup_pairs(docs, threshold=0.5)
    edges = pairs.select("id_a", "id_b").localCheckpoint(eager=True)
    n_pairs = edges.count()
    t_pairs = time.time() - t0
    # the banding pipeline pinned its shingle frame; the checkpoint above
    # means it can never be re-read — release it (components.py does the
    # same through the _spark_graft_release attribute)
    release = getattr(pairs, "_spark_graft_release", None)
    if release is not None:
        release()
    pin_registry.drain()

    # instrumented copy of operators/components.connected_components —
    # identical plan per round, plus per-iteration wall-clock + changed
    # counts so the iteration term is visible
    t0 = time.time()
    sym = edges.select(F.col("id_a").alias("s"), F.col("id_b").alias("t")).unionByName(
        edges.select(F.col("id_b").alias("s"), F.col("id_a").alias("t"))
    )
    sym = sym.localCheckpoint(eager=True)
    labels = (
        sym.select(F.col("s").alias("v"))
        .distinct()
        .withColumn("label", F.col("v"))
        .localCheckpoint(eager=True)
    )
    n_vertices = labels.count()
    t_setup = time.time() - t0

    iter_times: list[float] = []
    changed_counts: list[int] = []
    for _ in range(50):
        ti = time.time()
        prop = sym.join(labels, sym["s"] == labels["v"]).select(
            F.col("t").alias("v"), F.col("label")
        )
        new_labels = (
            labels.unionByName(prop)
            .groupBy("v")
            .agg(F.min("label").alias("label"))
            .localCheckpoint(eager=True)
        )
        changed = (
            labels.alias("o")
            .join(new_labels.alias("n"), "v")
            .where(F.col("o.label") != F.col("n.label"))
            .count()
        )
        labels = new_labels
        del prop, new_labels
        gc.collect()
        iter_times.append(round(time.time() - ti, 2))
        changed_counts.append(int(changed))
        if changed == 0:
            break
    t_cc = t_setup + sum(iter_times)
    spark.catalog.clearCache()
    return {
        "n_docs": int(n_docs),
        "n_pairs": int(n_pairs),
        "n_vertices": int(n_vertices),
        "n_iters": len(iter_times),
        "t_pairs_sec": round(t_pairs, 2),
        "t_cc_setup_sec": round(t_setup, 2),
        "t_cc_sec": round(t_cc, 2),
        "t_total_sec": round(t_pairs + t_cc, 2),
        "iter_times_sec": iter_times,
        "changed_counts": changed_counts,
    }


def main() -> None:
    dirs = sys.argv[1:]
    assert dirs, "need >=1 scale dirs"
    from seo_audit_etl_actor_spark.session import get_spark

    spark = get_spark("decompose-clusters")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict[str, list[dict]] = {}
    for d in dirs:
        out[d] = []
        for run in range(2):
            r = decompose_once(spark, d)
            out[d].append(r)
            print(
                f"{d} run{run}: pairs={r['t_pairs_sec']}s cc={r['t_cc_sec']}s "
                f"({r['n_iters']} iters) n_pairs={r['n_pairs']}",
                file=sys.stderr,
            )
    print(json.dumps({"clusters_decomposition": out}))


if __name__ == "__main__":
    main()
