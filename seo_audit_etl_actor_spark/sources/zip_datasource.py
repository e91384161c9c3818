"""Spark 4 Python DataSource for ZIP archives: the fully-native form of the
reference's ZIP scan (SURVEY §2.1 S3/S4) —

    register_zip_datasource(spark)
    spark.read.format("zipentries").option("expand_nested", "true").load(dir)

One input partition PER ARCHIVE (each task opens only its own file), one
output row per entry, with the exact same row semantics — nested-ZIP
expansion, `!`-joined inner names, per-file/per-entry degrade statuses — as
`zip_distributed.explode_zip_entries` (the shared `_entries_of` walker is
the single source of truth; the equivalence test asserts byte-identical
output).

Why a DataSource when binaryFile+mapInPandas already works: the DataSource
form gives the archive scan a first-class reader — `spark.read.format(...)`
composability, per-archive partition planning owned by the source (not by
binaryFile's byte-size splitter, which can lump many small archives into
one task), and no intermediate whole-archive binary column in the plan.
Paths are read with local `open()` — on a real cluster the archives live on
a shared/posix-mounted store, or swap the open for an fsspec/hadoop-fs call
at the marked line.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from seo_audit_etl_actor_spark.sources.zip_distributed import (
    ZIP_ENTRY_SCHEMA,
    _entries_of,
)

_COLS = [f.name for f in ZIP_ENTRY_SCHEMA.fields]


class _ZipPartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class ZipEntriesDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "zipentries"

    def schema(self):
        return ZIP_ENTRY_SCHEMA

    def reader(self, schema) -> "ZipEntriesReader":
        return ZipEntriesReader(self.options)


class ZipEntriesReader(DataSourceReader):
    def __init__(self, options):
        self._path = options.get("path")
        self._glob = options.get("glob", "*.zip")
        self._expand_nested = str(options.get("expand_nested", "true")).lower() == "true"
        if not self._path:
            raise ValueError("zipentries: .load(path) is required")

    def partitions(self):
        import glob as globmod
        import os

        p = self._path
        if os.path.isfile(p):
            paths = [p]
        else:
            paths = sorted(globmod.glob(os.path.join(p, self._glob)))
        # one archive per task: entry expansion cost is per-archive, and an
        # unreadable archive poisons only its own partition
        return [_ZipPartition(x) for x in paths]

    def read(self, partition: _ZipPartition):
        # local/posix read; swap for fsspec/hadoop-fs on object stores
        with open(partition.path, "rb") as fh:
            blob = fh.read()
        for row in _entries_of(partition.path, blob, self._expand_nested):
            yield tuple(row[c] for c in _COLS)


def register_zip_datasource(spark: SparkSession) -> None:
    """Ship the package to executors (the reader unpickles there) and
    register the format name."""
    from seo_audit_etl_actor_spark.session import ensure_package_on_executors

    ensure_package_on_executors(spark)
    spark.dataSource.register(ZipEntriesDataSource)
