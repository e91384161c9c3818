"""Phase attribution + order A/B for simhash_near_dup at the scale-ladder
rungs (r10 verdict task 3): attribute the family-worst 0.727 exponent,
then measure the shipped trim (early hamming verification pushed below
the cross-band distinct — operators/dedup.py `pair_filter`) against the
r9 order on the same corpus.

Phases:
  fp        fingerprints alone (token explode + 60 vote sums + groupBy)
  band      band explode + persist + bucket-size aggregate — also yields
            the ANALYTIC candidate volume sum(m*(m-1)/2) and hot-bucket
            count from the sizes frame (no pair materialization: a first
            draft of this tool collect_list'ed hot buckets uncapped and
            OOM'd the JVM at m316 — the exact failure MAX_BUCKET_MEMBERS
            exists to prevent)
  full_r9   the operator with early_verify=False (r9 order: distinct over
            ALL candidates, hamming after)
  full_r10  the operator as shipped (hamming before distinct)
  verified  output pair count (same for both orders: a row-wise filter
            commutes with distinct; the driver oracle pins the set at
            driver SFs)

Warm = best of `runs` timings per phase, clearCache + pin-drain between.

Usage: python tools/decompose_simhash.py /tmp/scale_m316 [/tmp/scale_m1000]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark import StorageLevel
from pyspark.sql import functions as F

from seo_audit_etl_actor_spark.operators import dedup, pin_registry
from seo_audit_etl_actor_spark.session import get_spark, load_table

BITS = dedup.SIMHASH_BITS
N_BANDS = 4
WIDTH = BITS // N_BANDS


def _exploded(fps):
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_idx"),
                F.shiftright(F.col("simhash"), b * WIDTH)
                .bitwiseAND(F.lit((1 << WIDTH) - 1))
                .alias("band_key"),
            )
            for b in range(N_BANDS)
        ]
    )
    member = F.struct(F.col("doc_id").alias("id"), F.col("simhash").alias("fp"))
    return fps.select(member.alias("m"), F.explode(bands).alias("band")).select(
        "m", "band.band_idx", "band.band_key"
    )


def run_rung(spark, sf_dir: str, runs: int = 2) -> dict:
    docs = load_table(spark, sf_dir, "documents")
    out: dict = {"sf_dir": sf_dir, "phases": {}}

    def timed(name, fn):
        best, info = None, None
        for r in range(runs):
            spark.catalog.clearCache()
            pin_registry.drain()
            t0 = time.time()
            info = fn()
            dt = time.time() - t0
            best = dt if best is None or dt < best else best
            print(f"  {name} run{r}: {dt:.2f}s {info}", flush=True)
        out["phases"][name] = {"warm_sec": round(best, 3), "info": info}

    fps = dedup.simhash_fingerprints(docs)
    timed("fp", lambda: {"n_docs": fps.count()})

    def band():
        ex = _exploded(fps).persist(StorageLevel.MEMORY_AND_DISK)
        sizes = ex.groupBy("band_idx", "band_key").agg(F.count(F.lit(1)).alias("n"))
        stats = sizes.agg(
            F.count(F.lit(1)).alias("n_buckets"),
            F.max("n").alias("max_bucket"),
            F.sum(F.col("n") * (F.col("n") - 1) / 2).alias("n_cand_analytic"),
            F.sum(
                F.when(F.col("n") > dedup.MAX_BUCKET_MEMBERS, 1).otherwise(0)
            ).alias("n_hot"),
        ).first()
        ex.unpersist()
        return {
            k: int(stats[k])
            for k in ("n_buckets", "max_bucket", "n_cand_analytic", "n_hot")
        }

    timed("band", band)

    def full(early: bool):
        df = dedup.simhash_near_dup_pairs(docs, early_verify=early)
        df.write.format("noop").mode("overwrite").save()
        rel = getattr(df, "_spark_graft_release", None)
        if rel:
            rel()
        return {}

    timed("full_r9", lambda: full(False))
    timed("full_r10", lambda: full(True))

    def verified():
        df = dedup.simhash_near_dup_pairs(docs)
        n = df.count()
        rel = getattr(df, "_spark_graft_release", None)
        if rel:
            rel()
        return {"n_verified_pairs": int(n)}

    timed("verified", verified)
    return out


def main() -> None:
    spark = get_spark("decompose-simhash")
    spark.sparkContext.setLogLevel("ERROR")
    results = [run_rung(spark, d) for d in sys.argv[1:]]
    print(json.dumps({"simhash_decomposition": results}, indent=2))


if __name__ == "__main__":
    main()
