"""Phase-level decomposition of simhash_near_dup at the scale-ladder rungs
(r10 verdict task 3): attribute the family-worst 0.727 exponent to its
stages before trimming anything — the tools/decompose_clusters.py
discipline applied to simhash.

Stages mirrored from operators/dedup.py::simhash_near_dup_pairs:
  fp        fingerprints alone (token explode + 60 vote sums + groupBy)
  band      band explode + persist + bucket-size agg (the _bucket_pairs
            entry cost; includes recomputing fp into the persist)
  cand      in-bucket pair generation (collect_list + HOF pair explode),
            counting candidates AND hamming<=max survivors in ONE pass —
            no distinct, so this isolates raw candidate volume
  dis_pre   candidates -> distinct -> hamming filter (the operator's
            CURRENT order: the cross-band dedup shuffle carries every
            false candidate)
  dis_post  hamming filter -> distinct (the hypothesized trim: the dedup
            shuffle carries only verified pairs x band multiplicity)
  full      the shipped operator end-to-end (incl. the output orderBy)

Each stage is timed twice in one JVM (clearCache between runs; warm =
min of run 2..) — the bench_scale convention. Counts are printed so the
attribution can be sanity-checked against the volume model
(candidates ~ sum m^2 over buckets; verified = true hamming<=3 pairs).

Usage: python tools/decompose_simhash.py /tmp/scale_m316 [/tmp/scale_m1000 ...]
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
MAX_HAMMING = 3
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


def _pairs_from(buckets_src):
    buckets = (
        buckets_src.groupBy("band_idx", "band_key")
        .agg(F.array_sort(F.collect_list("m")).alias("members"))
        .where(F.size("members") > 1)
    )
    m = F.col("members")
    pairs = F.flatten(
        F.transform(
            m,
            lambda x, i: F.transform(
                F.slice(m, i + F.lit(2), F.size(m) - i - 1),
                lambda y: F.struct(x.alias("a"), y.alias("b")),
            ),
        )
    )
    return buckets.select(F.explode(pairs).alias("p")).select("p.a", "p.b")


def run_rung(spark, sf_dir: str, runs: int = 2) -> dict:
    docs = load_table(spark, sf_dir, "documents")
    hamming = F.bit_count(F.col("a.fp").bitwiseXOR(F.col("b.fp")))
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
            F.sum(F.col("n") * F.col("n")).alias("sum_m2"),
            F.sum(F.when(F.col("n") > dedup.MAX_BUCKET_MEMBERS, 1).otherwise(0)).alias(
                "n_hot"
            ),
        ).first()
        ex.unpersist()
        return {k: int(stats[k]) for k in ("n_buckets", "max_bucket", "sum_m2", "n_hot")}

    timed("band", band)

    def cand():
        ex = _exploded(fps).persist(StorageLevel.MEMORY_AND_DISK)
        ex.count()
        p = _pairs_from(ex)
        r = p.agg(
            F.count(F.lit(1)).alias("n_cand"),
            F.sum((hamming <= MAX_HAMMING).cast("long")).alias("n_verified_dup"),
        ).first()
        ex.unpersist()
        return {"n_cand": int(r["n_cand"]), "n_verified_withdups": int(r["n_verified_dup"])}

    timed("cand", cand)

    def dis(pre: bool):
        ex = _exploded(fps).persist(StorageLevel.MEMORY_AND_DISK)
        ex.count()
        p = _pairs_from(ex)
        if pre:  # operator's current order: distinct over ALL candidates
            n = int(p.distinct().where(hamming <= MAX_HAMMING).count())
        else:  # hypothesized order: verify first, then dedup across bands
            n = int(p.where(hamming <= MAX_HAMMING).distinct().count())
        ex.unpersist()
        return {"n_verified_distinct": n}

    timed("dis_pre", lambda: dis(True))
    timed("dis_post", lambda: dis(False))

    def full():
        df = dedup.simhash_near_dup_pairs(docs)
        df.write.format("noop").mode("overwrite").save()
        rel = getattr(df, "_spark_graft_release", None)
        if rel:
            rel()
        return {}

    timed("full", full)
    return out


def main() -> None:
    spark = get_spark("decompose-simhash")
    spark.sparkContext.setLogLevel("ERROR")
    results = [run_rung(spark, d) for d in sys.argv[1:]]
    print(json.dumps({"simhash_decomposition": results}, indent=2))


if __name__ == "__main__":
    main()
