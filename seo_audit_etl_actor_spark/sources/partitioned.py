"""Partitioned-parquet lake layout: the write-side contract that makes
100 TB reads cheap (partition pruning turns a full-corpus scan into a
few-directory scan; SURVEY §4.2 partitioning story, write side).

Two layouts:
- by a low-cardinality column (event_type, lang, source): one directory
  per value; equality/IN filters prune to the matching directories at
  PLAN time (no file listing outside them).
- by derived event-time date (year/month/day from a timestamp): the
  standard time-partitioned event lake; range filters on the derived
  columns prune to the touched days.

Both are plan-asserted in tests via PartitionFilters on the scan node.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], mode: str = "overwrite"
) -> None:
    """Hive-style layout: path/col=value/part-*.parquet. Keep partition
    columns low-cardinality (each value is a directory; a high-cardinality
    key would produce millions of tiny files — use bucketing for that,
    operators/bucketing.py)."""
    df.write.partitionBy(*partition_cols).mode(mode).parquet(path)


def write_time_partitioned(
    df: DataFrame, path: str, ts_col: str = "ts", mode: str = "overwrite"
) -> None:
    """Event-time date partitioning (year/month/day derived from `ts_col`).
    The derived columns are data-dependent but deterministic, so a rewrite
    of the same input lands in the same directories (idempotent backfill)."""
    (
        df.withColumn("y", F.year(ts_col))
        .withColumn("m", F.month(ts_col))
        .withColumn("d", F.dayofmonth(ts_col))
        .write.partitionBy("y", "m", "d")
        .mode(mode)
        .parquet(path)
    )


def compact(
    spark: SparkSession,
    path: str,
    out_path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Small-file compaction: rewrite a parquet directory into
    ceil(total_bytes / target) files. Streaming sinks and incremental
    backfills accrete thousands of KB-sized files; every downstream scan
    then pays per-file open/footer costs — compaction restores
    target-sized splits. Sizes come from the Hadoop FileSystem API, so the
    same code runs on local disk, HDFS, or object stores. Returns the
    output file count."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    total = fs.getContentSummary(hpath).getLength()
    n_files = max(1, -(-int(total) // target_file_bytes))
    spark.read.parquet(path).repartition(n_files).write.mode("overwrite").parquet(out_path)
    return n_files


def read_lake(spark: SparkSession, path: str) -> DataFrame:
    """Read a partitioned layout back; partition columns come back as real
    columns and filters on them become PartitionFilters (plan-time
    directory pruning, asserted in tests/test_partitioned_lake.py)."""
    return spark.read.parquet(path)
