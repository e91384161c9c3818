"""Key-based lake upsert (MERGE INTO semantics on plain parquet): apply a
batch of updates/inserts to a keyed table — the incremental-maintenance
primitive every lake pipeline needs (engine extension surface; the
reference overwrites whole KV values, src/main.js:30-38).

Semantics (deterministic):
- rows whose key appears in `updates` take the update's values
  (last-writer-wins WITHIN a batch is resolved by highest `version_col`,
  tiebroken deterministically by the full row ordering);
- base rows with no update survive unchanged;
- update rows with no base row are inserts.

Scale design: one shuffle on the (uniform) key for the anti-join + union —
classic copy-on-write merge. At lake scale you'd partition the base table
and rewrite ONLY partitions containing touched keys (partition pruning on
the update key set); the row-level semantics below are unchanged by that
optimization, which is why the operator takes DataFrames, not paths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dedupe_updates(updates: DataFrame, keys: list[str], version_col: str) -> DataFrame:
    """Collapse an update batch to one row per key: highest version wins;
    exact version ties go to the lexicographically-greatest remaining row
    (total order — H2 determinism discipline)."""
    others = [c for c in updates.columns if c not in keys and c != version_col]
    w = Window.partitionBy(*keys).orderBy(
        F.col(version_col).desc(), *[F.col(c).desc_nulls_last() for c in others]
    )
    return (
        updates.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def merge_upsert(
    base: DataFrame, updates: DataFrame, keys: list[str], version_col: str
) -> DataFrame:
    """MERGE: base rows not touched by updates + the deduped update batch
    (which covers both matched-update and not-matched-insert cases in one
    union — the update row IS the new full row)."""
    latest = dedupe_updates(updates, keys, version_col)
    untouched = base.join(latest.select(*keys), keys, "left_anti")
    return untouched.unionByName(latest)
