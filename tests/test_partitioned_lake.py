"""Partitioned-lake layout tests: writes must produce the Hive directory
structure and reads must prune partitions at PLAN time (PartitionFilters
on the scan — the property that makes a 100 TB lake queryable)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from seo_audit_etl_actor_spark.plans import audit
from seo_audit_etl_actor_spark.session import load_table
from seo_audit_etl_actor_spark.sources import partitioned as pl


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    return load_table(spark, sf_dir, "events")


@pytest.fixture(scope="module")
def type_lake(spark, events, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("lake") / "by_type")
    pl.write_partitioned(events, path, ["event_type"])
    return path


def test_layout_is_hive_style(type_lake, events):
    dirs = {d for d in os.listdir(type_lake) if d.startswith("event_type=")}
    types = {r["event_type"] for r in events.select("event_type").distinct().collect()}
    assert dirs == {f"event_type={t}" for t in types}


def test_roundtrip_preserves_rows(spark, type_lake, events):
    back = pl.read_lake(spark, type_lake)
    assert back.count() == events.count()
    # partition column survives as a real column
    assert "event_type" in back.columns


def test_equality_filter_becomes_partition_filter(spark, type_lake):
    df = pl.read_lake(spark, type_lake).where(F.col("event_type") == "view")
    pf = audit.partition_filters(df)
    assert any("event_type" in f for f in pf), audit.plan_string(df)
    # and it is NOT a post-scan data filter: non-partition filters empty
    assert not audit.pushed_filters(df)


def test_pruned_read_scans_only_matching_rows(spark, type_lake, events):
    want = events.where(F.col("event_type") == "view").count()
    got = pl.read_lake(spark, type_lake).where(F.col("event_type") == "view").count()
    assert got == want


def test_time_partitioned_range_pruning(spark, events, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("lake") / "by_day")
    pl.write_time_partitioned(events, path)
    back = pl.read_lake(spark, path)
    day = back.where((F.col("y") == 2024) & (F.col("m") == 1) & (F.col("d") <= 3))
    pf = audit.partition_filters(day)
    assert any("d" in f for f in pf), audit.plan_string(day)
    want = events.where(F.dayofmonth("ts") <= 3).count()
    assert day.count() == want


def test_time_partition_rewrite_is_idempotent(spark, events, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("lake") / "idem")
    pl.write_time_partitioned(events, path)
    first = sorted(os.listdir(path))
    pl.write_time_partitioned(events, path)
    assert sorted(os.listdir(path)) == first


def test_compaction_reduces_file_count(spark, events, tmp_path_factory):
    base = tmp_path_factory.mktemp("lake")
    frag, out = str(base / "fragmented"), str(base / "compacted")
    events.repartition(32).write.parquet(frag)  # simulate streaming accretion
    n_small = len([f for f in os.listdir(frag) if f.endswith(".parquet")])
    assert n_small == 32
    pl.compact(spark, frag, out)
    n_big = len([f for f in os.listdir(out) if f.endswith(".parquet")])
    assert n_big < n_small
    back = pl.read_lake(spark, out)
    assert back.count() == events.count()
    # content preserved, not just counts
    assert back.agg(F.sum("event_id")).first()[0] == events.agg(F.sum("event_id")).first()[0]
