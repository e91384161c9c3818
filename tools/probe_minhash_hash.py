"""Diagnose the minhash md5-vs-xxhash64 blowup at the m1000 rung
(measured r7: the xxhash64 pipeline fills >60 GB of shuffle spill and
dies where md5 completes in ~440 s; at m316 the two are within noise).
Computes the band-bucket size distribution and raw pair volume under
both hash families WITHOUT materializing pairs — if xxhash64's shingle
hashes induce band-key collisions md5's don't, it shows here.

Usage: python tools/probe_minhash_hash.py DIR
Prints one JSON line per hash family.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    d = sys.argv[1]
    families = sys.argv[2:] or ["md5", "xxhash64"]
    from pyspark.sql import functions as F

    from seo_audit_etl_actor_spark.operators import dedup, pin_registry
    from seo_audit_etl_actor_spark.session import ensure_parallelism, get_spark, load_table

    spark = get_spark("probe-minhash-hash")
    spark.sparkContext.setLogLevel("ERROR")
    for hash_fn in families:
        docs = ensure_parallelism(load_table(spark, d, "documents"))
        base = dedup.shingle_projection(docs, hash_fn=hash_fn)
        n_docs = base.count()
        n_hashes, n_bands = dedup.choose_banding(n_docs)
        r = n_hashes // n_bands
        sigs = dedup._signatures_from_shingles(base, n_hashes=n_hashes)
        exploded = sigs.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(b).alias("band_idx"),
                            F.concat_ws(
                                "|", *[F.col(f"mh{b * r + j}") for j in range(r)]
                            ).alias("band_key"),
                        )
                        for b in range(n_bands)
                    ]
                )
            ).alias("band")
        ).select("band.band_idx", "band.band_key")
        sizes = exploded.groupBy("band_idx", "band_key").agg(
            F.count(F.lit(1)).alias("n")
        )
        stats = sizes.agg(
            F.count(F.lit(1)).alias("n_buckets"),
            F.max("n").alias("max_bucket"),
            F.sum(
                F.when(F.col("n") > dedup.MAX_BUCKET_MEMBERS, F.col("n")).otherwise(0)
            ).alias("members_over_cap"),
            F.sum(F.when(F.col("n") > dedup.MAX_BUCKET_MEMBERS, 1).otherwise(0)).alias(
                "n_over_cap"
            ),
            F.sum((F.col("n") * (F.col("n") - 1) / 2).cast("long")).alias(
                "raw_pair_volume"
            ),
        ).first()
        pin_registry.drain()
        spark.catalog.clearCache()
        print(
            json.dumps(
                {
                    "hash_fn": hash_fn,
                    "n_docs": int(n_docs),
                    "banding": [n_hashes, n_bands, r],
                    "n_buckets": int(stats["n_buckets"]),
                    "max_bucket": int(stats["max_bucket"]),
                    "n_over_cap": int(stats["n_over_cap"]),
                    "members_over_cap": int(stats["members_over_cap"]),
                    "raw_pair_volume": int(stats["raw_pair_volume"]),
                }
            )
        )


if __name__ == "__main__":
    main()
