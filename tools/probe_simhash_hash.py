"""Diagnose the simhash md5-vs-xxhash64 pipeline gap (measured r7:
xxhash64 ~1.5x SLOWER at m316 in fresh JVMs, while minhash shows ~1.0x).
The two hash families produce different fingerprints, hence different
band-bucket shapes, hence different hot-bucket/refinement work — this
probe quantifies each stage's volume under both hashes:

  - n_docs, n_fp (fingerprinted docs)
  - per-band bucket stats: n_buckets, max bucket size, members in
    over-cap buckets (the pigeonhole-refinement path)
  - candidate pairs BEFORE Hamming verification, verified pairs

Usage: python tools/probe_simhash_hash.py DIR
Prints one JSON line per hash family.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    d = sys.argv[1]
    from pyspark.sql import functions as F

    from seo_audit_etl_actor_spark.operators import dedup
    from seo_audit_etl_actor_spark.session import ensure_parallelism, get_spark, load_table

    spark = get_spark("probe-simhash-hash")
    spark.sparkContext.setLogLevel("ERROR")
    bits = dedup.SIMHASH_BITS
    n_bands = 4
    w = bits // n_bands
    for hash_fn in ("md5", "xxhash64"):
        docs = ensure_parallelism(load_table(spark, d, "documents"))
        fps = dedup.simhash_fingerprints(docs, hash_fn=hash_fn).persist()
        n_fp = fps.count()
        ex = fps.select(
            "doc_id",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(i).alias("band_idx"),
                            F.shiftright("simhash", i * w)
                            .bitwiseAND(F.lit((1 << w) - 1))
                            .alias("band_key"),
                        )
                        for i in range(n_bands)
                    ]
                )
            ).alias("b"),
        ).select("doc_id", "b.band_idx", "b.band_key")
        sizes = ex.groupBy("band_idx", "band_key").agg(F.count(F.lit(1)).alias("n"))
        stats = sizes.agg(
            F.count(F.lit(1)).alias("n_buckets"),
            F.max("n").alias("max_bucket"),
            F.sum(F.when(F.col("n") > dedup.MAX_BUCKET_MEMBERS, F.col("n")).otherwise(0)).alias(
                "members_over_cap"
            ),
            F.sum((F.col("n") * (F.col("n") - 1) / 2).cast("long")).alias("raw_pair_volume"),
        ).first()
        pairs = dedup.simhash_near_dup_pairs(docs, hash_fn=hash_fn)
        n_pairs = pairs.count()
        fps.unpersist()
        spark.catalog.clearCache()
        from seo_audit_etl_actor_spark.operators import pin_registry

        pin_registry.drain()
        print(
            json.dumps(
                {
                    "hash_fn": hash_fn,
                    "n_fp": int(n_fp),
                    "n_buckets": int(stats["n_buckets"]),
                    "max_bucket": int(stats["max_bucket"]),
                    "members_over_cap": int(stats["members_over_cap"]),
                    "raw_pair_volume": int(stats["raw_pair_volume"]),
                    "verified_pairs": int(n_pairs),
                }
            )
        )


if __name__ == "__main__":
    main()
