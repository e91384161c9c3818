"""Columnar / semi-structured format round-trips beyond parquet
(engine-surface completeness; the reference reads only ZIP/CSV/JSON,
src/etl.js:93-454):

- ORC read/write (Spark-native columnar alternative; same pushdown and
  pruning machinery as parquet — asserted in tests);
- schema-on-read JSON-lines with PERMISSIVE corrupt-record capture: bad
  lines land in a `_corrupt` column instead of failing the job, the
  per-row degradation contract every large crawl ingest needs (the
  distributed analog of the reference's per-file try/catch degradation,
  src/etl.js:128-134).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt"


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)


def read_jsonl_tolerant(
    spark: SparkSession, path: str, schema: T.StructType
) -> DataFrame:
    """JSON-lines scan that degrades per-ROW: parseable lines fill the
    declared schema, unparseable lines surface raw in `_corrupt` with all
    data fields null. Callers split on `_corrupt IS NULL` for the
    clean/quarantine fork. Map-only at any scale."""
    full = T.StructType(
        list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType(), True)]
    )
    return (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )
