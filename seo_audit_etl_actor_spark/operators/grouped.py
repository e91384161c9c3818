"""Grouped-map (applyInPandas) operators — the batch twin of the streaming
applyInPandasWithState path (SURVEY §2.10): for per-group sequence
semantics that are genuinely RECURSIVE, where no window frame expresses the
computation. Engine policy: JVM expressions first; this module exists only
for the recurrence cases.

EWMA is the canonical example: s_i = α·x_i + (1-α)·s_{i-1} depends on the
entire prefix through the previous STATE, not through any fixed frame — the
closed form Σ α(1-α)^(n-i)·x_i underflows for long series and costs O(n²)
as window expressions. One Arrow batch per group, NumPy recurrence inside.

Scale notes:
- applyInPandas shuffles once on the group key; each group must fit an
  Arrow batch (fine for per-user event series; for pathological mega-groups
  switch to applyInPandasWithState's incremental state, streaming/events.py);
- output schema is declared, so downstream stays JVM-side;
- ordering inside the group is pinned by (ts, event_id) — the H2 total
  order — since shuffle delivery order is not deterministic.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
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


def ewma_per_user(events: DataFrame, alpha: float = 0.3) -> DataFrame:
    """Per-user exponentially weighted moving average of `value`, ordered
    by (ts, event_id). applyInPandas: one shuffle on user_id, NumPy
    recurrence per group."""
    ensure_package_on_executors(events.sparkSession)

    def compute(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"], kind="mergesort")
        s = None
        out = []
        for x in pdf["value"]:
            s = x if s is None else alpha * x + (1.0 - alpha) * s
            out.append(s)
        pdf = pdf.assign(ewma=out)
        return pdf[["user_id", "event_id", "ts", "value", "ewma"]]

    return (
        events.select("user_id", "event_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandas(compute, EWMA_SCHEMA)
    )
