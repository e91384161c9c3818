"""Recall-at-scale for the ANN family (r10 verdict task 4): on the
regenerated m10/m100 rungs — whose embeddings are exact-replica planted
near-dups (gen_scale replicates the base table with vec_id shifts) —
record recall@10 of cosine_topk_lsh and cosine_topk_ivf against the
brute-force exact top-k (operators/similarity.py:61), plus the probe
counts that explain the number. The dedup family's planted-ground-truth
discipline applied to ANN.

Two recalls per (rung, query):
  recall_raw    top-10 id overlap as-is. The planted replicas of the
                query dominate the truth set (cos = 1.0) and share the
                query's exact bucket/cell by construction, so this
                validates the exact-duplicate path (expected ~1.0).
  recall_nodup  top-10 overlap EXCLUDING near-exact hits (rounded
                cos >= 1 - 1e-6): the honest near-neighbor recall on the
                corpus's organic similarity structure. Computed from a
                deep (k + replicas + slack) retrieval on both sides so
                the exclusion cannot exhaust either list.

Probe accounting: LSH scans the hamming<=2 ball of the query's 8-plane
bucket (37/256 bucket ids); IVF scans nprobe=4 of 16 cells — the
candidate-row counts are measured, not assumed.

Usage: python tools/ann_recall.py m10=/tmp/scale_m10 m100=/tmp/scale_m100
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from seo_audit_etl_actor_spark.operators import similarity
from seo_audit_etl_actor_spark.queries.llm_ext import EMB_DIM
from seo_audit_etl_actor_spark.session import get_spark, load_table

K = 10
QUERY_IDS = [7, 123, 411, 777, 1203, 1577, 1801, 1999]
NEAR_EXACT = 1.0 - 1e-6


def _ids(rows) -> list[int]:
    return [int(r["vec_id"]) for r in rows]


def _nodup_ids(rows, k: int) -> list[int]:
    out = [int(r["vec_id"]) for r in rows if r["cosine_sim"] < NEAR_EXACT]
    return out[:k]


def run_rung(spark, label: str, sf_dir: str) -> dict:
    emb = load_table(spark, sf_dir, "embeddings").persist()
    n_vecs = emb.count()
    # deep enough that dropping every replica leaves >= K organic rows:
    # replica count per vector = rung multiplier
    n_replicas = n_vecs // 2000  # base sf0.1 corpus is ~2000 vectors
    deep = K + n_replicas + 50

    per_q = []
    for qid in QUERY_IDS:
        t0 = time.time()
        brute = similarity.cosine_topk(emb, qid, k=deep).collect()
        t_brute = time.time() - t0
        t0 = time.time()
        lsh = similarity.cosine_topk_lsh(emb, qid, k=deep, dim=EMB_DIM).collect()
        t_lsh = time.time() - t0
        t0 = time.time()
        ivf = similarity.cosine_topk_ivf(emb, qid, k=deep).collect()
        t_ivf = time.time() - t0

        truth_raw = set(_ids(brute)[:K])
        truth_nd = set(_nodup_ids(brute, K))
        row = {
            "qid": qid,
            "lsh_recall_raw": len(truth_raw & set(_ids(lsh)[:K])) / K,
            "ivf_recall_raw": len(truth_raw & set(_ids(ivf)[:K])) / K,
            "lsh_recall_nodup": (
                len(truth_nd & set(_nodup_ids(lsh, K))) / len(truth_nd)
                if truth_nd
                else None
            ),
            "ivf_recall_nodup": (
                len(truth_nd & set(_nodup_ids(ivf, K))) / len(truth_nd)
                if truth_nd
                else None
            ),
            "t_brute": round(t_brute, 2),
            "t_lsh": round(t_lsh, 2),
            "t_ivf": round(t_ivf, 2),
        }
        per_q.append(row)
        print(f"  {label} qid={qid}: {row}", flush=True)

    # probe accounting (independent of qid loop, one representative query)
    qid = QUERY_IDS[0]
    wb = emb.withColumn("__b", similarity.lsh_bucket("embedding", EMB_DIM, 8))
    qb = wb.where(F.col("vec_id") == qid).select("__b").first()[0]
    ball = similarity.hamming_ball(int(qb), 8, 2)
    lsh_cand = wb.where(F.col("__b").isin(ball)).count()
    assigned = similarity.assign_ivf_cells(emb, 16)
    cell_sizes = {
        int(r["__cell"]): int(r["n"])
        for r in assigned.groupBy("__cell").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    emb.unpersist()

    def avg(key):
        vals = [r[key] for r in per_q if r[key] is not None]
        return round(sum(vals) / len(vals), 4) if vals else None

    return {
        "rung": label,
        "sf_dir": sf_dir,
        "n_vecs": n_vecs,
        "replicas_per_vec": n_replicas,
        "avg": {
            k: avg(k)
            for k in (
                "lsh_recall_raw",
                "ivf_recall_raw",
                "lsh_recall_nodup",
                "ivf_recall_nodup",
                "t_brute",
                "t_lsh",
                "t_ivf",
            )
        },
        "lsh_ball_buckets": f"{len(ball)}/256",
        "lsh_candidate_rows": lsh_cand,
        "lsh_scan_frac": round(lsh_cand / n_vecs, 4),
        "ivf_nprobe": "4/16",
        "ivf_cell_sizes": cell_sizes,
        "per_query": per_q,
    }


def main() -> None:
    spark = get_spark("ann-recall")
    spark.sparkContext.setLogLevel("ERROR")
    rungs = [a.split("=", 1) for a in sys.argv[1:]]
    results = [run_rung(spark, lbl, d) for lbl, d in rungs]
    print(json.dumps({"ann_recall": results}, indent=2))


if __name__ == "__main__":
    main()
