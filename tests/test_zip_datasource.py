"""Python DataSource form of the ZIP scan vs the binaryFile+mapInPandas
route: same fixture archives, byte-identical rows (both paths share
`_entries_of`, so this checks the DataSource plumbing — partition planning,
pickling, schema — not a second parser)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from seo_audit_etl_actor_spark.sources import zip_distributed as zd
from seo_audit_etl_actor_spark.sources.zip_datasource import register_zip_datasource
from tests.fixtures_seo import build_fixture_zip


@pytest.fixture(scope="module")
def zip_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("ds_zips")
    (d / "audit_fixture.zip").write_bytes(build_fixture_zip())
    (d / "corrupt_inner.zip").write_bytes(build_fixture_zip(corrupt_site_audit=True))
    (d / "not_a_zip.zip").write_bytes(b"HTML error page, definitely not PK")
    return str(d)


def _norm(df):
    return sorted(
        (
            r["zip_path"].rsplit("/", 1)[-1],
            r["entry_name"],
            r["is_nested"],
            r["entry_size"],
            bytes(r["content"]) if r["content"] is not None else None,
            r["status"],
        )
        for r in df.collect()
    )


def test_datasource_matches_mapinpandas_route(spark, zip_dir):
    register_zip_datasource(spark)
    via_ds = spark.read.format("zipentries").load(zip_dir)
    via_mp = zd.explode_zip_entries(spark.read.format("binaryFile").load(zip_dir))
    assert _norm(via_ds) == _norm(via_mp)
    # non-vacuous: ok entries, nested entries, and degrade rows all present
    stats = {r["status"] for r in via_ds.collect()}
    assert zd.STATUS_OK in stats and zd.STATUS_NOT_A_ZIP in stats
    assert via_ds.where(F.col("is_nested")).count() > 0


def test_datasource_partitions_per_archive(spark, zip_dir):
    register_zip_datasource(spark)
    df = spark.read.format("zipentries").load(zip_dir)
    # 3 archives -> 3 input partitions (one task per archive)
    assert df.rdd.getNumPartitions() == 3


def test_datasource_no_nested_expansion_option(spark, zip_dir):
    register_zip_datasource(spark)
    df = (
        spark.read.format("zipentries")
        .option("expand_nested", "false")
        .load(zip_dir)
    )
    rows = df.collect()
    assert all(not r["is_nested"] for r in rows)
    # the inner archive stays one opaque .zip entry
    assert any(r["entry_name"] and r["entry_name"].lower().endswith(".zip") for r in rows)
