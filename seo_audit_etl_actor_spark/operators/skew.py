"""Skew-mitigation operators (SURVEY §4.2; north-star 100 TB requirement).

AQE's skew-join splitting covers sort-merge joins at runtime; these helpers
cover the cases AQE does not:

- `salted_count_distinct`: COUNT(DISTINCT v) per key builds a per-key hash
  set — a hot key concentrates its whole value universe in one task. The
  salted form partitions the VALUE space (salt = hash(value) % n), counts
  distinct per (key, salt) — disjoint value sets, so the per-key SUM of the
  partials is EXACT — and spreads a hot key over n tasks.
- `salted_join`: broadcast is the first choice for small dims; when the
  build side is too big to broadcast and one probe key is hot, replicate
  the build side n× (one copy per salt) and scatter the probe side by a
  deterministic row-level salt, turning one hot partition into n.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_count_distinct(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    n_salts: int = 16,
    out_col: str = "n_distinct",
) -> DataFrame:
    """Exact distinct count per key, skew-safe.

    Stage 1 groups by (key, hash(value) % n_salts): each salt bucket owns a
    disjoint slice of the value space, so its distinct count is independent.
    Stage 2 sums the partials per key. Both stages are algebraic — map-side
    partial aggregation applies — and the hot key's state is 1/n per task.
    """
    salt = F.pmod(F.xxhash64(F.col(value_col)), F.lit(n_salts)).alias("__salt")
    partial = (
        df.select(*key_cols, F.col(value_col), salt)
        .groupBy(*key_cols, "__salt")
        .agg(F.countDistinct(value_col).alias("__partial"))
    )
    return partial.groupBy(*key_cols).agg(F.sum("__partial").cast("long").alias(out_col))


def with_salt(df: DataFrame, unique_col: str, n_salts: int) -> DataFrame:
    """Deterministic row-level salt from an existing unique column (H2: no
    rand() — reruns and retries must agree)."""
    return df.withColumn("__salt", F.pmod(F.xxhash64(F.col(unique_col)), F.lit(n_salts)))


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    on: list[str],
    probe_unique_col: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the probe side scattered across n_salts sub-keys and
    the build side replicated once per salt — a hot join key becomes n
    evenly-sized partitions instead of one straggler.

    Cost model: build-side shuffle volume × n_salts; use only when the hot
    key is real (AQE metrics show it) and the build side is too big to
    broadcast outright.
    """
    salted_probe = with_salt(probe, probe_unique_col, n_salts)
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias("__salt")
    replicated_build = build.select("*", salts)
    joined = salted_probe.join(replicated_build, [*on, "__salt"], how)
    return joined.drop("__salt")


def skew_stats(df: DataFrame, key_cols: list[str], top_n: int = 10) -> DataFrame:
    """Key-frequency diagnostic: the top-N heaviest keys and their share —
    the measurement that justifies (or rules out) salting.

    Single scan: the total re-aggregates the per-key counts and re-enters
    as a broadcast cross join — one pass over the data (both consumers sit
    on the per-key aggregate's exchange → ReusedExchange), and no
    empty-partition window funneling millions of distinct keys through a
    single task."""
    per_key = df.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("n_rows"))
    total = per_key.agg(F.sum("n_rows").alias("__total"))
    return (
        per_key.crossJoin(F.broadcast(total))
        .withColumn("share", F.col("n_rows") / F.col("__total").cast("double"))
        .drop("__total")
        .orderBy(F.col("n_rows").desc(), *key_cols)
        .limit(top_n)
    )
