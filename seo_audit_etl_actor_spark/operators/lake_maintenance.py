"""Lake maintenance: versioned snapshots (time travel) and small-file
compaction on plain parquet — the operational primitives a 100 TB lake
needs around the MERGE writer (operators/upsert.py, streaming/lake.py).
Engine extension surface; the reference's only persistence is whole-value
KV overwrite (src/main.js:30-38).

Layout (lakehouse-lite, the Iceberg/Delta snapshot idea without a
manifest format):

    lake_dir/
      v00000001/  v00000002/  ...   immutable snapshot directories
      _LATEST                       pointer file: the committed version

Commit protocol: write the snapshot dir fully, then publish by atomically
replacing `_LATEST` (os.replace of a tmp pointer). Readers resolve the
pointer FIRST and then read an immutable directory, so:
- a crash mid-write leaves a garbage un-pointed dir, never a torn table;
- concurrent readers of version N are unaffected by the commit of N+1
  (snapshot isolation);
- time travel = read any retained version explicitly.

`vacuum` deletes versions older than the last `keep` — the retention
boundary is the time-travel horizon, exactly like Delta's VACUUM.

Compaction: an immutable-snapshot REWRITE (new version, same rows) that
coalesces many small files into ~`target_rows` files. Small files are the
top operational tax at scale (every query pays a file-open + footer read
per file; 10k tiny files can cost more than the scan itself). Compaction
preserves row content exactly — asserted by the round-trip test — and
publishes through the same pointer protocol, so readers never see a
half-compacted table.
"""

from __future__ import annotations

import fcntl
import os
import shutil

from pyspark.sql import DataFrame, SparkSession

_POINTER = "_LATEST"


def _version_dir(lake_dir: str, version: int) -> str:
    return os.path.join(lake_dir, f"v{version:08d}")


def latest_version(lake_dir: str) -> int | None:
    """Committed version per the pointer file; None for an empty lake."""
    p = os.path.join(lake_dir, _POINTER)
    if not os.path.exists(p):
        return None
    with open(p) as fh:
        return int(fh.read().strip())


def list_versions(lake_dir: str) -> list[int]:
    if not os.path.isdir(lake_dir):
        return []
    return sorted(
        int(d[1:])
        for d in os.listdir(lake_dir)
        if d.startswith("v") and d[1:].isdigit()
    )


def publish_version(df: DataFrame, lake_dir: str) -> int:
    """Write `df` as the next immutable snapshot and commit it by pointer
    replace. Returns the new version number.

    Multi-writer safety: the snapshot is first written to a unique staging
    directory (pid + uuid) and then claimed via os.rename into the version
    slot — rename onto an EXISTING directory fails on POSIX, so two
    concurrent publishers can never both own vN: the loser gets
    FileExistsError/ENOTEMPTY and retries with the next number. A version
    directory is therefore immutable from the instant it appears, and the
    pointer only ever advances (a stale racer never moves it backwards).
    This is optimistic concurrency a la Delta's commit protocol, on plain
    directories."""
    import uuid

    os.makedirs(lake_dir, exist_ok=True)
    staging = os.path.join(lake_dir, f"_staging.{os.getpid()}.{uuid.uuid4().hex}")
    df.write.mode("overwrite").parquet(staging)
    version = (latest_version(lake_dir) or 0) + 1
    while True:
        try:
            os.rename(staging, _version_dir(lake_dir, version))
            break
        except OSError:
            if not os.path.isdir(_version_dir(lake_dir, version)):
                shutil.rmtree(staging, ignore_errors=True)
                raise
            version += 1  # lost the race for this slot; claim the next
    # Advance the pointer monotonically: never overwrite a higher committed
    # version (a slower racer must not roll the lake back). The
    # read-compare-replace must be serialized — without the lock, a racer
    # that committed a higher version can replace the pointer between our
    # latest_version() read and our os.replace, and we'd roll it backwards.
    tmp = os.path.join(lake_dir, f"{_POINTER}.{os.getpid()}.{uuid.uuid4().hex}.tmp")
    with open(tmp, "w") as fh:
        fh.write(str(version))
    with open(os.path.join(lake_dir, _POINTER + ".lock"), "w") as lock_fh:
        fcntl.flock(lock_fh, fcntl.LOCK_EX)
        try:
            committed = latest_version(lake_dir)
            if committed is None or committed < version:
                os.replace(tmp, os.path.join(lake_dir, _POINTER))
            else:
                os.remove(tmp)
        finally:
            fcntl.flock(lock_fh, fcntl.LOCK_UN)
    return version


def read_lake(spark: SparkSession, lake_dir: str, version: int | None = None) -> DataFrame:
    """Read the committed snapshot (or `version` for time travel)."""
    v = latest_version(lake_dir) if version is None else version
    if v is None:
        raise FileNotFoundError(f"empty lake: {lake_dir}")
    path = _version_dir(lake_dir, v)
    if not os.path.isdir(path):
        raise FileNotFoundError(f"version {v} not retained in {lake_dir}")
    return spark.read.parquet(path)


def vacuum(lake_dir: str, keep: int = 2) -> list[int]:
    """Drop all but the newest `keep` versions (never the committed one).
    Returns the versions removed."""
    committed = latest_version(lake_dir)
    versions = list_versions(lake_dir)
    keep_set = set(versions[-keep:]) | ({committed} if committed is not None else set())
    removed = []
    for v in versions:
        if v not in keep_set:
            shutil.rmtree(_version_dir(lake_dir, v), ignore_errors=True)
            removed.append(v)
    return removed


def compact(spark: SparkSession, lake_dir: str, target_rows: int = 1_000_000) -> int:
    """Rewrite the committed snapshot into ceil(rows/target_rows) files and
    publish as a NEW version (content unchanged). Uses repartition, not
    coalesce: coalesce(1) would also collapse the WRITE parallelism of the
    upstream scan; repartition keeps the read parallel and only narrows at
    the exchange. Returns the new version."""
    df = read_lake(spark, lake_dir)
    n = df.count()
    n_files = max(1, -(-n // target_rows))
    return publish_version(df.repartition(n_files), lake_dir)


def diff_versions(
    spark: SparkSession,
    lake_dir: str,
    v_old: int,
    v_new: int,
    keys: list[str],
    include_values: bool = False,
) -> "DataFrame":
    """Row-level change feed between two retained snapshots (the CDC read a
    downstream incremental consumer wants from a versioned lake): one row
    per key present in either version, classified added / removed /
    changed / unchanged. Non-key columns are compared as a null-safe
    struct, so NULL-vs-NULL is 'unchanged' and NULL-vs-value is 'changed'.
    With `include_values` the old/new row structs ride along (what an
    incremental view maintainer consumes — operators/mv.py).

    Scale: ONE full-outer shuffle on the key — the same single-exchange
    shape as the MERGE writer; no driver-side row handling."""
    from pyspark.sql import functions as F

    old = read_lake(spark, lake_dir, v_old)
    new = read_lake(spark, lake_dir, v_new)
    non_keys = [c for c in new.columns if c not in keys]
    o = old.select(*keys, F.struct(*non_keys).alias("__o"))
    n = new.select(*keys, F.struct(*non_keys).alias("__n"))
    j = o.join(n, keys, "full_outer")
    change = (
        F.when(F.col("__o").isNull(), "added")
        .when(F.col("__n").isNull(), "removed")
        .when(~F.col("__o").eqNullSafe(F.col("__n")), "changed")
        .otherwise("unchanged")
    )
    cols = [*keys, change.alias("change")]
    if include_values:
        cols += [F.col("__o").alias("old"), F.col("__n").alias("new")]
    return j.select(*cols)
