"""ensure_parallelism must measure ACHIEVABLE parallelism, not planned splits.

Regression for the round-5 ladder's m316 cliff: a 175 MB single parquet file
(pyarrow default 1M-row groups → 2 row groups) plans defaultParallelism
splits — so the old `planned < target` guard skipped the repartition — but
the vectorized reader assigns each row group to ONE split, leaving every
other split empty: the whole shingle pass ran on 2 of 32 cores (measured
10×: 560 s → 47 s once spread). The guard now bounds planned splits by the
row-group total (`_parquet_work_units`).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from seo_audit_etl_actor_spark.session import _parquet_work_units, ensure_parallelism


def _write_big_single_rowgroup(path: str, mb: int = 22) -> None:
    # incompressible payload (random bytes as hex) so on-disk size stays
    # big enough for the split planner to aim target-many splits at it
    rng = np.random.default_rng(7)
    n = mb * 64  # 16 KiB of hex per row
    blobs = [rng.bytes(8192).hex() for _ in range(n)]
    t = pa.table({"doc_id": pa.array(range(n), pa.int64()), "text": pa.array(blobs)})
    pq.write_table(t, path, row_group_size=10_000_000, compression="none")


def test_single_rowgroup_big_file_gets_repartitioned(spark, tmp_path):
    """Planned splits >= target but ONE row group → must still repartition."""
    p = str(tmp_path / "big.parquet")
    _write_big_single_rowgroup(p)
    df = spark.read.parquet(p)
    target = spark.sparkContext.defaultParallelism
    planned = df.rdd.getNumPartitions()
    assert planned >= target, (
        f"fixture too small to reproduce: planned={planned} < target={target}"
    )
    assert _parquet_work_units(df, target) == 1
    out = ensure_parallelism(df)
    assert out.rdd.getNumPartitions() == target
    # and the spread is real: no empty partitions after the fix
    sizes = out.rdd.glom().map(len).collect()
    assert min(sizes) > 0


def test_multi_rowgroup_counted(spark, tmp_path):
    p = str(tmp_path / "rg3.parquet")
    t = pa.table({"x": pa.array(range(300), pa.int64())})
    pq.write_table(t, p, row_group_size=100)
    df = spark.read.parquet(p)
    assert _parquet_work_units(df, target=64) == 3


def test_many_files_short_circuit(spark, tmp_path):
    """>= target files → answer is file count, footers never read."""
    for i in range(4):
        pq.write_table(pa.table({"x": pa.array([i], pa.int64())}), str(tmp_path / f"f{i}.parquet"))
    df = spark.read.parquet(str(tmp_path))
    assert _parquet_work_units(df, target=4) == 4


def test_rowgroup_cache_invalidated_on_rewrite(spark, tmp_path):
    """In-place rewrite with a different row-group layout must MISS the
    cache (keyed by size+mtime, not just path) — a stale hit makes
    ensure_parallelism skip a needed repartition on the rewritten table."""
    import os
    import time

    p = str(tmp_path / "rw.parquet")
    t = pa.table({"x": pa.array(range(300), pa.int64())})
    pq.write_table(t, p, row_group_size=300)
    assert _parquet_work_units(spark.read.parquet(p), target=64) == 1
    time.sleep(0.01)  # ensure mtime_ns moves even on coarse filesystems
    pq.write_table(t, p, row_group_size=100)
    os.utime(p)
    assert _parquet_work_units(spark.read.parquet(p), target=64) == 3


def test_rowgroup_cache_bounded(spark, tmp_path):
    from seo_audit_etl_actor_spark import session as S

    S._ROW_GROUP_CACHE.clear()
    for i in range(5):
        p = str(tmp_path / f"b{i}.parquet")
        pq.write_table(pa.table({"x": pa.array([i], pa.int64())}), p)
        _parquet_work_units(spark.read.parquet(p), target=64)
    assert 0 < len(S._ROW_GROUP_CACHE) <= S._ROW_GROUP_CACHE_MAX


def test_non_file_frame_falls_back(spark):
    df = spark.range(10)
    assert _parquet_work_units(df, target=4) is None
    # and ensure_parallelism still behaves (falls back to split count)
    out = ensure_parallelism(df, min_partitions=2)
    assert out.rdd.getNumPartitions() >= 2
