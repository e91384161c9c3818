"""Versioned-lake maintenance: snapshot isolation, time travel, vacuum
retention, and content-preserving compaction (operators/lake_maintenance)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from seo_audit_etl_actor_spark.operators import lake_maintenance as lm
from seo_audit_etl_actor_spark.operators.upsert import merge_upsert
from seo_audit_etl_actor_spark.session import load_table


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture()
def lake(spark, sf_dir, tmp_path):
    lake_dir = str(tmp_path / "lake")
    nation = load_table(spark, sf_dir, "nation")
    v1 = lm.publish_version(nation, lake_dir)
    assert v1 == 1
    return lake_dir, nation


def test_time_travel_reads_old_snapshot(spark, sf_dir, lake):
    lake_dir, nation = lake
    updates = nation.limit(5).withColumn("n_name", F.lit("RENAMED")).withColumn(
        "__version", F.lit(1).cast("long")
    )
    base = lm.read_lake(spark, lake_dir).withColumn(
        "__version", F.lit(0).cast("long")
    )
    merged = merge_upsert(base, updates, ["n_nationkey"], "__version")
    v2 = lm.publish_version(merged.drop("__version"), lake_dir)
    assert v2 == 2
    assert lm.latest_version(lake_dir) == 2

    latest = lm.read_lake(spark, lake_dir)
    assert latest.where(F.col("n_name") == "RENAMED").count() == 5
    # time travel: version 1 is untouched
    assert _rows(lm.read_lake(spark, lake_dir, version=1)) == _rows(nation)


def test_publish_race_claims_next_slot(spark, lake):
    """ADVICE r4: two concurrent publishers must never both own a version
    slot. Simulate the loser by pre-occupying v2 with a rival snapshot
    (what the winner of the race would have renamed into place): the
    publisher must claim v3, leave v2 untouched, and advance the pointer."""
    lake_dir, nation = lake
    rival = os.path.join(lake_dir, "v00000002")
    os.makedirs(rival)
    with open(os.path.join(rival, "_SUCCESS"), "w") as fh:
        fh.write("")
    v = lm.publish_version(nation, lake_dir)
    assert v == 3
    assert sorted(os.listdir(rival)) == ["_SUCCESS"]  # rival dir untouched
    assert lm.latest_version(lake_dir) == 3
    assert _rows(lm.read_lake(spark, lake_dir, version=3)) == _rows(nation)
    # no staging residue
    assert not [d for d in os.listdir(lake_dir) if d.startswith("_staging")]


def test_pointer_never_rolls_back_under_concurrency(spark, lake):
    """ADVICE r5: the pointer advance is read-compare-replace and must be
    serialized — without the flock a stale racer could replace _LATEST
    with a LOWER version after a faster racer committed a higher one.
    Hammer the lock path with concurrent publishers and assert the pointer
    ends at the max committed version with every slot distinct."""
    import threading

    lake_dir, nation = lake
    small = nation.limit(3)
    results: list[int] = []
    lock = threading.Lock()

    def _publish():
        v = lm.publish_version(small, lake_dir)
        with lock:
            results.append(v)

    threads = [threading.Thread(target=_publish) for _ in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert len(results) == 6 and len(set(results)) == 6  # distinct slots
    assert lm.latest_version(lake_dir) == max(results)
    assert lm.latest_version(lake_dir) == max(lm.list_versions(lake_dir))


def test_vacuum_retains_horizon(spark, lake):
    lake_dir, nation = lake
    for _ in range(3):
        lm.publish_version(nation, lake_dir)
    assert lm.list_versions(lake_dir) == [1, 2, 3, 4]
    removed = lm.vacuum(lake_dir, keep=2)
    assert removed == [1, 2]
    assert lm.list_versions(lake_dir) == [3, 4]
    with pytest.raises(FileNotFoundError):
        lm.read_lake(spark, lake_dir, version=1)
    assert _rows(lm.read_lake(spark, lake_dir)) == _rows(nation)


def test_compact_preserves_content_and_reduces_files(spark, sf_dir, tmp_path):
    lake_dir = str(tmp_path / "lake2")
    orders = load_table(spark, sf_dir, "orders").repartition(16)
    lm.publish_version(orders, lake_dir)
    v1_dir = os.path.join(lake_dir, "v00000001")
    n_before = len([f for f in os.listdir(v1_dir) if f.endswith(".parquet")])
    assert n_before == 16

    v2 = lm.compact(spark, lake_dir, target_rows=10**9)
    v2_dir = os.path.join(lake_dir, f"v{v2:08d}")
    n_after = len([f for f in os.listdir(v2_dir) if f.endswith(".parquet")])
    assert n_after == 1
    assert _rows(lm.read_lake(spark, lake_dir)) == _rows(orders)


def test_empty_lake_raises(spark, tmp_path):
    with pytest.raises(FileNotFoundError):
        lm.read_lake(spark, str(tmp_path / "nope"))


def test_diff_versions_classifies_changes(spark, sf_dir, tmp_path):
    lake_dir = str(tmp_path / "lake3")
    nation = load_table(spark, sf_dir, "nation")
    lm.publish_version(nation, lake_dir)
    # v2: rename nation 0, drop nation 1, add key 99
    v2 = (
        nation.where(F.col("n_nationkey") != 1)
        .withColumn(
            "n_name",
            F.when(F.col("n_nationkey") == 0, F.lit("RENAMED")).otherwise(
                F.col("n_name")
            ),
        )
        .unionByName(
            spark.createDataFrame(
                [(99, "NEWLAND", 0)], "n_nationkey long, n_name string, n_regionkey long"
            )
        )
    )
    lm.publish_version(v2, lake_dir)
    diff = {
        r["n_nationkey"]: r["change"]
        for r in lm.diff_versions(spark, lake_dir, 1, 2, ["n_nationkey"]).collect()
    }
    assert diff[0] == "changed"
    assert diff[1] == "removed"
    assert diff[99] == "added"
    assert diff[5] == "unchanged"
    assert len(diff) == 26  # 25 original keys + the added one
