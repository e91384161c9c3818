"""Benchmark runner: executes every catalog query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Queries are materialized with the noop sink (full execution, no driver
collect) so the timing measures the engine, not result transfer.

Repeatability: this host has noisy-neighbor throttling windows that swing
identical runs 3-4x, so a single measurement cannot power a
regressed-vs-last-round comparison. One cold pass warms JVM/codegen/schema
caches, then $SPARK_GRAFT_BENCH_RUNS (default 3) warm passes are measured;
`value` and per-query `queries` are MEDIANS across the warm passes.

Calibration gate (r10 — the r9 verdict's prescription after BENCH_r09
landed inside a throttle window): a fixed CPU-bound probe (sum of
xxhash64 over a 200M-row range, pure JVM, no disk) brackets every warm
pass. A pass whose bracketing calibrations exceed 1.3x the session's
best calibration ran (at least partly) inside a throttle window and is
DISCARDED and re-run, up to SPARK_GRAFT_BENCH_MAX_ATTEMPTS (default
4x the requested runs). If the budget runs out before n clean passes,
whatever clean passes exist are used and `calibration_dirty` marks the
artifact — a number the round report must then treat as contaminated.

Output capture contract (BENCH_r02 lost its JSON head to a bounded tail
capture): stdout carries a sentinel line `BENCH_JSON_BELOW` followed by ONE
compact JSON line as the FINAL line — nothing is printed after it. The
stdout line keeps only the TOP-25 most expensive queries (the full dict
blew the driver's ~4 KiB tail budget in r04); the complete per-query
medians + spreads go to bench_detail.json (committed).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from seo_audit_etl_actor_spark.queries import QUERIES  # noqa: E402
from seo_audit_etl_actor_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("seo-audit-etl-actor-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    def run_suite() -> tuple[float, dict[str, float]]:
        timings: dict[str, float] = {}
        t0 = time.perf_counter()
        for spec in QUERIES:
            qt = time.perf_counter()
            spec.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            timings[spec.name] = time.perf_counter() - qt
        return time.perf_counter() - t0, timings

    from pyspark.sql import functions as F

    def calibration() -> float:
        # Sized so one GC pause cannot trip the 1.3x gate: the first cut
        # of this probe (200M rows, ~0.1 s) read post-suite JVM/GC state
        # as "throttle" — after a 150-query pass a single collection
        # inflated the probe 3x and EVERY pass was discarded. ~2B rows
        # (~1 s) amortizes pause noise, and best-of-2 per side measures
        # CPU throughput, not heap state. shiftright(,32) keeps each term
        # within +/-2^31 so the sum stays far from long overflow (ANSI
        # mode throws on overflow).
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            spark.range(0, 2_000_000_000, 1, 32).select(
                F.sum(F.shiftright(F.xxhash64("id"), 32))
            ).collect()
            best = min(best, time.perf_counter() - t0)
        return best

    # Cold pass warms JVM/codegen/schema caches (fixed cost, amortized away
    # at cluster scale); the measured passes are steady-state numbers.
    cal_record = calibration()
    cold_total, _ = run_suite()

    max_attempts = int(
        os.environ.get("SPARK_GRAFT_BENCH_MAX_ATTEMPTS", str(4 * max(1, n_runs)))
    )
    # Suite-level spread gate (r11 — VERDICT r10 task 7): the per-pass
    # calibration gate brackets CPU throughput but not SUSTAINED variance
    # (the driver's r10 run passed it while warm totals swung 27%). The
    # committed number must be self-certifying: from the calibration-clean
    # passes, accept the TIGHTEST window of n_runs whose max/min <= 1.15;
    # if no such window exists yet, keep sampling inside the same attempts
    # budget, and if the budget ends without one, publish the tightest
    # window found with spread_dirty=true.
    spread_cap = float(os.environ.get("SPARK_GRAFT_BENCH_SPREAD_CAP", "1.15"))
    clean: list[tuple[float, dict[str, float], list[float]]] = []
    n_discarded = 0
    attempts = 0
    n_need = max(1, n_runs)

    def best_window() -> tuple[list[int], float]:
        """Indices of the tightest n_need-subset of clean passes (by total)
        and its max/min ratio."""
        order = sorted(range(len(clean)), key=lambda i: clean[i][0])
        k = min(n_need, len(order))
        best_idx = order[:k]
        best_ratio = clean[best_idx[-1]][0] / clean[best_idx[0]][0]
        for s in range(1, len(order) - k + 1):
            win = order[s : s + k]
            ratio = clean[win[-1]][0] / clean[win[0]][0]
            if ratio < best_ratio:
                best_idx, best_ratio = win, ratio
        return best_idx, best_ratio

    while attempts < max_attempts:
        if len(clean) >= n_need and best_window()[1] <= spread_cap:
            break
        attempts += 1
        c_pre = calibration()
        total, timings = run_suite()
        c_post = calibration()
        cal_record = min(cal_record, c_pre, c_post)
        if max(c_pre, c_post) > 1.3 * cal_record:
            n_discarded += 1
            print(
                f"# discarding throttled pass (cal {c_pre:.2f}/{c_post:.2f} "
                f"vs record {cal_record:.2f})",
                file=sys.stderr,
            )
            continue
        clean.append((total, timings, [round(c_pre, 3), round(c_post, 3)]))
    calibration_dirty = len(clean) < n_need
    if not clean:  # budget exhausted entirely throttled: keep last
        clean.append((total, timings, [round(c_pre, 3), round(c_post, 3)]))

    win_idx, spread_ratio = best_window()
    accepted = [clean[i] for i in win_idx]
    spread_dirty = len(accepted) < n_need or spread_ratio > spread_cap
    warm_totals = [round(t, 3) for t, _, _ in accepted]
    cals = [c for _, _, c in accepted]
    per_query: dict[str, list[float]] = {q.name: [] for q in QUERIES}
    for _, timings, _ in accepted:
        for name, t in timings.items():
            per_query[name].append(t)

    med_q = {n: round(statistics.median(ts), 3) for n, ts in per_query.items()}
    spread_q = {n: [round(min(ts), 3), round(max(ts), 3)] for n, ts in per_query.items()}

    summary = {
        "metric": "catalog_suite_wall_clock",
        "value": round(statistics.median(warm_totals), 3),
        "unit": "sec",
        "queries": med_q,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "cold_total_sec": round(cold_total, 3),
        "warm_totals": warm_totals,
        "n_warm_runs": max(1, n_runs),
        "n_queries": len(QUERIES),
        "calibration_record_sec": round(cal_record, 3),
        "calibration_per_run": cals,
        "n_discarded_throttled": n_discarded,
        "calibration_dirty": calibration_dirty,
        "warm_totals_all_clean": [round(t, 3) for t, _, _ in clean],
        "warm_spread_ratio": round(spread_ratio, 4),
        "warm_spread_cap": spread_cap,
        "spread_dirty": spread_dirty,
    }
    detail_path = Path(__file__).resolve().parent / "bench_detail.json"
    detail_path.write_text(
        json.dumps({**summary, "queries_spread": spread_q}, indent=1) + "\n"
    )
    # The driver's tail capture holds ~4 KiB; a 120-query dict blew past it
    # in r04 ("parsed": null). The stdout line carries totals + only the
    # TOP_N most expensive queries; the complete per-query medians live in
    # bench_detail.json (committed per-round as the full record).
    top_n = 25
    top = dict(sorted(med_q.items(), key=lambda kv: -kv[1])[:top_n])
    stdout_summary = {
        **summary,
        "queries": top,
        "queries_truncated_to_top": top_n,
        "full_detail": "bench_detail.json",
    }
    sys.stdout.flush()
    print("BENCH_JSON_BELOW", flush=True)
    print(json.dumps(stdout_summary, separators=(",", ":")), flush=True)


if __name__ == "__main__":
    main()
