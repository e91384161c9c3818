"""Bucketed-table layout for co-located, shuffle-free joins (SURVEY §4.2;
the 100 TB join strategy the task sheet calls out explicitly).

Writing both sides of a recurring big-big join bucketed (and sorted) by the
join key trades one write-time shuffle for ZERO shuffles on every
subsequent join: Spark's scan exposes the bucket hash-partitioning as the
output distribution, so sort-merge join needs no Exchange (verified by
plan assertion in tests/test_bucketing.py). This is the amortized answer
where broadcast (small side) and AQE shuffle joins (one-shot) don't fit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 8,
    path: str | None = None,
) -> None:
    """Persist as a bucketed+sorted parquet table (native Spark bucketing —
    no Hive metastore needed; the in-memory catalog tracks bucket specs).

    n_buckets at real scale: target ~128-512 MB per bucket file per
    partition; both join sides MUST agree on (bucket_col, n_buckets).
    """
    writer = (
        df.write.bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .mode("overwrite")
        .format("parquet")
    )
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str, how: str = "inner"
) -> DataFrame:
    """Join two same-spec bucketed tables — planner sees matching hash
    distributions and elides both Exchanges."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
