"""Streaming rate-anomaly monitor — the streaming twin of
`queries/events_ext.q_event_rate_anomalies` (the docstring there promises
exactly this: "the streaming twin would maintain the same two running sums
in state").

Design (mirrors streaming/curation.py's stateful pattern):
- the stream is keyed by event_type; `applyInPandasWithState` holds, per
  type, the OPEN per-hour counts plus the trailing history of closed
  hourly counts (capped at the batch query's 24-row baseline);
- an hour CLOSES when a strictly later hour appears for that type — the
  hand-rolled equivalent of a watermark on hour boundaries (late rows for
  an already-closed hour are dropped, exactly what a watermark would do);
- each closed hour is scored against the trailing history with the SAME
  integer moment sums and closed-form z expression as the batch query, so
  draining an hour-aligned stream reproduces the batch output rows
  bit-for-bit (test_streaming_anomaly differential).

At scale: state per key is O(24 + open hours) longs; event_type is
low-cardinality so the stateful stage is trivially partitioned — the heavy
lifting (per-hour pre-aggregation) happens in the micro-batch before the
state op sees one row per (type, hour).
"""

from __future__ import annotations

import json
import math
from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from seo_audit_etl_actor_spark.queries.events_ext import (
    ANOM_MIN_BASELINE,
    ANOM_TRAIL,
    ANOM_Z,
)
from seo_audit_etl_actor_spark.session import ensure_package_on_executors

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)

_OUT_SCHEMA = T.StructType(
    [
        T.StructField("event_type", T.StringType(), True),
        T.StructField("hour_id", T.LongType(), True),
        T.StructField("n_events", T.LongType(), True),
        T.StructField("baseline_mean", T.DoubleType(), True),
        T.StructField("z_score", T.DoubleType(), True),
        T.StructField("is_anomaly", T.BooleanType(), True),
    ]
)

_STATE_SCHEMA = T.StructType([T.StructField("state_json", T.StringType(), True)])


def read_event_stream(spark: SparkSession, source_dir: str) -> DataFrame:
    return spark.readStream.schema(EVENTS_SCHEMA).parquet(source_dir)


def score_hour(n: int, hist: list[int]) -> tuple[float, float, bool] | None:
    """The batch query's z expression over the trailing closed-hour counts;
    None where the batch query filters the row out (short or flat
    baseline). Kept in one place so stream and test share the formula."""
    window = hist[-ANOM_TRAIL:]
    c = len(window)
    if c < ANOM_MIN_BASELINE:
        return None
    s1 = sum(window)
    s2 = sum(v * v for v in window)
    if c * s2 - s1 * s1 <= 0:
        return None
    mean = s1 / c
    var = (c * s2 - s1 * s1) / (c * (c - 1))
    z = (float(n) - mean) / math.sqrt(var)
    return (round(mean, 6), round(z, 6), abs(z) > ANOM_Z)


def monitor_event_rates(stream: DataFrame) -> DataFrame:
    """Append-mode stream of scored closed hours."""
    ensure_package_on_executors(stream.sparkSession)
    hour_id = F.floor(F.unix_micros("ts") / F.lit(3_600_000_000)).cast("long")
    typed = stream.select("event_type", hour_id.alias("hour_id"))

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def score(key, pdfs: Iterator["pd.DataFrame"], state: GroupState):
        import pandas as pd

        st = (
            json.loads(state.get[0])
            if state.exists
            else {"open": {}, "hist": []}  # hist: [[hour_id, n], ...] ascending
        )
        open_hours = {int(k): int(v) for k, v in st["open"].items()}
        hist = [(int(h), int(n)) for h, n in st["hist"]]
        closed_floor = hist[-1][0] if hist else -1
        for pdf in pdfs:
            for h, n in pdf.groupby("hour_id").size().items():
                h = int(h)
                if h <= closed_floor:
                    continue  # late beyond the closure horizon: dropped
                open_hours[h] = open_hours.get(h, 0) + int(n)
        out = []
        if open_hours:
            horizon = max(open_hours)  # hours strictly before this close now
            for h in sorted(k for k in open_hours if k < horizon):
                n = open_hours.pop(h)
                scored = score_hour(n, [v for _, v in hist])
                if scored is not None:
                    out.append((key[0], h, n, *scored))
                hist.append((h, n))
                hist = hist[-ANOM_TRAIL:]
                closed_floor = h
        state.update(
            (
                json.dumps(
                    {
                        "open": {str(k): v for k, v in open_hours.items()},
                        "hist": [[h, n] for h, n in hist],
                    }
                ),
            )
        )
        yield pd.DataFrame(
            out,
            columns=[
                "event_type",
                "hour_id",
                "n_events",
                "baseline_mean",
                "z_score",
                "is_anomaly",
            ],
        )

    return typed.groupBy("event_type").applyInPandasWithState(
        score,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
