"""Count-Min Sketch as a DataFrame (Cormode & Muthukrishnan 2005) — the
point-frequency member of the sketch family (Misra-Gries heavy hitters,
HLL distinct, Bloom membership, MinHash/SimHash similarity all exist
elsewhere in this engine). Engine surface beyond the reference (which has
no aggregation beyond per-run counters, src/etl.js).

The sketch IS a DataFrame of non-empty cells: (row, col, cnt) with
col = xxhash64(token, row) mod width — no custom partitioner, no UDF.
Building it is ONE shuffle of depth rows per token with full map-side
partial aggregation (the per-partition state is at most depth × width
counters, the textbook CMS memory bound, regardless of corpus size), and
merging shards is the same groupBy-sum — the sketch is a commutative
monoid, which is what makes it a 100 TB structure.

Point queries join probe hash cells against the sketch and take the
min over rows: estimate ≥ true always (counters only ever overcount),
and ≤ true + e·N/width with probability 1 − e^(−depth) over the hash
draw — for a FIXED hash family and corpus both sides are deterministic,
which is what lets a driver row pin the bound flags (the approx_distinct
bound-contract discipline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CMS_DEPTH = 4
CMS_WIDTH = 16  # deliberately LOSSY for the audit corpus (~31-token
# vocabulary): with width ≫ vocab the sketch degenerates to an exact
# table and the min-over-rows is never exercised; 16 forces real
# collisions so est > exact occurs and the bound check is load-bearing


def _hash_cells(token_col: str, depth: int, width: int):
    return F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(j).alias("row"),
                    F.pmod(
                        F.xxhash64(F.col(token_col), F.lit(j)), F.lit(width)
                    ).alias("col"),
                )
                for j in range(depth)
            ]
        )
    )


def build_cms(
    tokens_df: DataFrame,
    token_col: str = "token",
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """One shuffle: explode depth (row, col) cells per token, groupBy-count.
    Partial aggregation caps per-partition state at depth × width longs."""
    cells = tokens_df.select(_hash_cells(token_col, depth, width).alias("rc"))
    return (
        cells.select("rc.row", "rc.col")
        .groupBy("row", "col")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(
    cms: DataFrame,
    probes: DataFrame,
    token_col: str = "token",
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Point-query estimates for each probe token: min over rows of the
    probed cells. A missing cell is 0 (the token never hashed there).
    The sketch is ≤ depth × width rows — broadcast by size."""
    cells = probes.select(
        F.col(token_col), _hash_cells(token_col, depth, width).alias("rc")
    ).select(token_col, "rc.row", "rc.col")
    joined = cells.join(F.broadcast(cms), ["row", "col"], "left").na.fill(
        0, subset=["cnt"]
    )
    return joined.groupBy(token_col).agg(F.min("cnt").alias("cms_estimate"))
