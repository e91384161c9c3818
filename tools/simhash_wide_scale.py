"""Wide-vs-narrow SimHash at the scale-ladder rungs (r11 verdict task 2).

The r10 decomposition attributed simhash_near_dup's family-worst exponent
to the 60-bit fingerprint: 15-bit band keys saturate (~77k of 131k
possible buckets occupied at 5M docs) and 60-bit CHANCE collisions make
the verified hamming<=3 output grow ~n^2 (16.21M -> 160.64M pairs,
m316 -> m1000). This measures the r11 fix (simhash_wide_near_dup_pairs,
120-bit fingerprints / 30-bit band keys) on the SAME corpora:

  - verified pair count + warm wall time per rung, wide vs narrow
    (narrow re-measured at m316 as a same-session baseline and a
    cross-round reproducibility check against SCALE_STUDY_r10; the m1000
    narrow numbers are cited from r10 rather than re-run — the corpus
    generator and operator are unchanged, so the count carries);
  - band-bucket occupancy vs keyspace (the saturation measurement);
  - the growth exponent log(pairs_m1000/pairs_m316)/log(1000/316).

Usage: python tools/simhash_wide_scale.py /tmp/scale_m316 [/tmp/scale_m1000]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from seo_audit_etl_actor_spark.operators import dedup, pin_registry
from seo_audit_etl_actor_spark.session import get_spark, load_table


def _drain(spark) -> None:
    pin_registry.drain()
    spark.catalog.clearCache()


def _count_pairs(spark, docs, wide: bool) -> tuple[int, float]:
    t0 = time.time()
    fn = dedup.simhash_wide_near_dup_pairs if wide else dedup.simhash_near_dup_pairs
    out = fn(docs)
    n = out.count()
    dt = time.time() - t0
    release = getattr(out, "_spark_graft_release", None)
    if release is not None:
        release()
    _drain(spark)
    return n, dt


def _band_occupancy(spark, docs, wide: bool) -> dict:
    """Occupied (band_idx, band_key) buckets and analytic candidate volume
    sum(m*(m-1)/2) — no pair materialization."""
    if wide:
        fps = dedup.simhash_fingerprints_wide(docs)
        width = dedup.SIMHASH_WIDE_BITS // 4
        bpw = 60 // width
        bands = F.array(
            *[
                F.struct(
                    F.lit(b).alias("band_idx"),
                    F.shiftright(F.col(f"fp_w{b // bpw}"), (b % bpw) * width)
                    .bitwiseAND(F.lit((1 << width) - 1))
                    .alias("band_key"),
                )
                for b in range(4)
            ]
        )
        keyspace_per_band = 1 << width
    else:
        fps = dedup.simhash_fingerprints(docs)
        width = dedup.SIMHASH_BITS // 4
        bands = F.array(
            *[
                F.struct(
                    F.lit(b).alias("band_idx"),
                    F.shiftright(F.col("simhash"), b * width)
                    .bitwiseAND(F.lit((1 << width) - 1))
                    .alias("band_key"),
                )
                for b in range(4)
            ]
        )
        keyspace_per_band = 1 << width
    sizes = (
        fps.select(F.explode(bands).alias("band"))
        .groupBy("band.band_idx", "band.band_key")
        .agg(F.count(F.lit(1)).alias("m"))
    )
    row = sizes.agg(
        F.count(F.lit(1)).alias("occupied"),
        F.sum(F.expr("m * (m - 1) / 2")).alias("cand"),
        F.max("m").alias("max_bucket"),
    ).first()
    _drain(spark)
    return {
        "occupied_buckets": int(row["occupied"]),
        "keyspace_total": 4 * keyspace_per_band,
        "occupancy_frac": round(row["occupied"] / (4 * keyspace_per_band), 6),
        "analytic_candidates": int(row["cand"]),
        "max_bucket": int(row["max_bucket"]),
    }


def run_rung(spark, sf_dir: str, measure_narrow: bool) -> dict:
    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()
    out: dict = {"sf_dir": sf_dir, "n_docs": n_docs}
    # cold then warm; warm is the recorded number
    for label, wide in (("wide", True),) + ((("narrow", False),) if measure_narrow else ()):
        n1, t_cold = _count_pairs(spark, docs, wide)
        n2, t_warm = _count_pairs(spark, docs, wide)
        assert n1 == n2
        out[label] = {"verified_pairs": n1, "t_cold_s": round(t_cold, 1), "t_warm_s": round(t_warm, 1)}
        print(f"  {sf_dir} {label}: pairs={n1} cold={t_cold:.1f}s warm={t_warm:.1f}s", flush=True)
    out["wide_occupancy"] = _band_occupancy(spark, docs, wide=True)
    out["narrow_occupancy"] = _band_occupancy(spark, docs, wide=False)
    print(f"  {sf_dir} occupancy: {out['wide_occupancy']} / {out['narrow_occupancy']}", flush=True)
    return out


def main() -> None:
    spark = get_spark("simhash-wide-scale")
    spark.sparkContext.setLogLevel("ERROR")
    args = [a for a in sys.argv[1:] if a != "--wide-only"]
    # --wide-only: skip the narrow near-dup baseline entirely — at the
    # m3160 rung the narrow operator's verified output extrapolates to
    # ~1.6 B pairs (the n^2 term), a count job this host should not pay
    # for a baseline r10 already pinned at the lower rungs.
    wide_only = "--wide-only" in sys.argv[1:]
    results = []
    for i, d in enumerate(args):
        results.append(run_rung(spark, d, measure_narrow=(i == 0 and not wide_only)))
    summary: dict = {"rungs": results}
    if len(results) == 2:
        import math

        p0, p1 = results[0]["wide"]["verified_pairs"], results[1]["wide"]["verified_pairs"]
        n0, n1 = results[0]["n_docs"], results[1]["n_docs"]
        if p0 > 0 and p1 > 0:
            summary["wide_pair_growth_exponent"] = round(
                math.log(p1 / p0) / math.log(n1 / n0), 3
            )
        # SCALE_STUDY_r10.json simhash_decomposition verified-pair counts
        summary["narrow_pair_growth_exponent_r10"] = round(
            math.log(160_596_422 / 16_123_316) / math.log(5_000_000 / 1_580_000), 3
        )
    print(json.dumps({"simhash_wide_scale": summary}, indent=2))


if __name__ == "__main__":
    main()
