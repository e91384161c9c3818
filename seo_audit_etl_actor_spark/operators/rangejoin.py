"""Point-in-interval range join via bin bucketing (SURVEY §2.5 engine
surface — the reference has no joins at all; this is the classic
range-join decomposition Spark lacks natively).

A naive `points JOIN intervals ON p BETWEEN s AND e` has no equi key, so
Spark plans BroadcastNestedLoopJoin — O(|points| × |intervals|) compares,
fine only while the interval side broadcasts. The binned form:

  1. explode each interval to one row per fixed-width bin it overlaps
     (`sequence(floor(s/w), floor(e/w))`)
  2. tag each point with its bin (`floor(p/w)`)
  3. equi-join on the bin, then re-apply the exact BETWEEN as a residual

turns it into a shuffled/broadcast HASH join: each point meets only the
intervals sharing its bin. Cost is O(points + intervals × span/w + pairs).
Pick `bin_width` near the median interval span so each interval explodes
to ~1-2 rows; correctness never depends on the width (the residual
predicate is exact).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def bin_of(ts: Column, bin_width_s: int) -> Column:
    """Bin index of a timestamp: floor(epoch_us / width). Integer math in
    microseconds — no float drift, identical in any engine."""
    return F.floor(F.unix_micros(ts) / F.lit(bin_width_s * 1_000_000)).cast("long")


def range_join_binned(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_col: str,
    end_col: str,
    bin_width_s: int = 86400,
    broadcast_intervals: bool = True,
) -> DataFrame:
    """Join each point row to every interval row with
    start <= point < end (half-open, the streaming-window convention).

    `broadcast_intervals=True` for dimension-sized interval tables (the
    exploded side stays tiny); set False to shuffle both sides on the bin
    key when the interval table is itself large.
    """
    w = bin_width_s * 1_000_000
    lo = F.floor(F.unix_micros(F.col(start_col)) / F.lit(w)).cast("long")
    hi = F.floor(
        # end is exclusive: an interval ending exactly on a bin edge does
        # not overlap that bin
        (F.unix_micros(F.col(end_col)) - F.lit(1)) / F.lit(w)
    ).cast("long")
    exploded = intervals.withColumn("__bin", F.explode(F.sequence(lo, hi)))
    if broadcast_intervals:
        exploded = F.broadcast(exploded)
    tagged = points.withColumn("__bin", bin_of(F.col(point_ts), bin_width_s))
    residual = (F.col(point_ts) >= F.col(start_col)) & (
        F.col(point_ts) < F.col(end_col)
    )
    return tagged.join(exploded, on="__bin", how="inner").where(residual).drop("__bin")
