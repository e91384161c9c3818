"""Grouped-map (applyInPandas) operators — the batch twin of the streaming
applyInPandasWithState path (SURVEY §2.10): for per-group sequence
semantics that are genuinely RECURSIVE, where no window frame expresses the
computation. Engine policy: JVM expressions first; this module exists only
for the recurrence cases.

EWMA is the canonical example: s_i = α·x_i + (1-α)·s_{i-1} depends on the
entire prefix through the previous STATE, not through any fixed frame — the
closed form Σ α(1-α)^(n-i)·x_i underflows for long series and costs O(n²)
as window expressions. One Arrow batch per USER-HASH BUCKET (r9 — not per
user: a corpus of many small users pays one Python call + Arrow transfer
per group, ~10× the kernel cost at 10k users; bucketing amortizes it while
pandas' grouped Cython ewm kernel keeps the per-user recurrence exact),
NumPy/pandas recurrence inside.

Scale notes:
- applyInPandas shuffles once on the bucket key; each bucket must fit an
  Arrow batch (buckets scale out with n_buckets; for pathological
  mega-USERS switch to applyInPandasWithState's incremental state,
  streaming/events.py);
- output schema is declared, so downstream stays JVM-side;
- ordering inside the group is pinned by (ts, event_id) — the H2 total
  order — since shuffle delivery order is not deterministic;
- pandas ewm(adjust=False) evaluates ((1-α)·s + α·x)/((1-α)+α): addition
  is IEEE-commutative with the hand loop's α·x + (1-α)·s and the weight
  sum rounds to exactly 1.0, so the kernel matches the explicit
  recurrence to float precision (tests assert 1e-12 vs a Python model);
- a NaN value poisons the rest of its user's series (matching the naive
  recurrence, where s stays NaN forever) — applied as an explicit
  group-cummax mask because pandas' ewm would otherwise SKIP NaNs.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from seo_audit_etl_actor_spark.session import ensure_package_on_executors

EWMA_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_id", T.LongType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("ewma", T.DoubleType(), True),
    ]
)


def ewma_per_user(
    events: DataFrame, alpha: float = 0.3, n_buckets: int = 64
) -> DataFrame:
    """Per-user exponentially weighted moving average of `value`, ordered
    by (ts, event_id). applyInPandas: one shuffle on the user-hash bucket,
    grouped Cython ewm kernel per bucket — per-user semantics identical to
    a per-user recurrence (bucketing is an Arrow-batching choice, asserted
    partitioning-invariant in tests)."""
    ensure_package_on_executors(events.sparkSession)

    def compute(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        grouped = pdf.groupby("user_id", sort=False)
        ew = grouped["value"].ewm(alpha=alpha, adjust=False).mean()
        # grouped.ewm returns (user_id, original-index) MultiIndex in group
        # appearance order == pdf row order (sort=False on a user-sorted
        # frame), so positional assignment is aligned
        pdf = pdf.assign(ewma=ew.to_numpy(), __na=pdf["value"].isna())
        poisoned = pdf.groupby("user_id", sort=False)["__na"].cummax()
        pdf.loc[poisoned, "ewma"] = float("nan")
        return pdf[["user_id", "event_id", "ts", "value", "ewma"]]

    return (
        events.select("user_id", "event_id", "ts", "value")
        # xxhash64 before the modulo: plain user_id % n would skew Arrow
        # batches badly on strided or clustered id spaces (ids all ≡ r
        # mod n land in ONE bucket); hashing first makes bucket sizes
        # uniform for any id distribution
        .groupBy(F.pmod(F.xxhash64("user_id"), F.lit(n_buckets)))
        .applyInPandas(compute, EWMA_SCHEMA)
    )
