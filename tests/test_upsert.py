"""Lake upsert (operators/upsert.py): merge semantics checked against a
DuckDB window-SQL twin and a hand-built expected state, including
in-batch duplicate keys and version ties."""

from __future__ import annotations

import duckdb

from seo_audit_etl_actor_spark.operators.upsert import merge_upsert

BASE = [(1, "a", 10.0, 0), (2, "b", 20.0, 0), (3, "c", 30.0, 0)]
UPDATES = [
    (2, "b2", 21.0, 5),      # update key 2
    (2, "b3", 22.0, 7),      # later version wins within batch
    (4, "d", 40.0, 1),       # insert
    (5, "e", 50.0, 2),       # insert
    (5, "e-tie", 51.0, 2),   # version tie → greatest remaining row wins
]
SCHEMA = "k: long, name: string, val: double, version: long"


def test_merge_matches_duckdb_twin(spark):
    base = spark.createDataFrame(BASE, SCHEMA)
    ups = spark.createDataFrame(UPDATES, SCHEMA)
    got = sorted(tuple(r) for r in merge_upsert(base, ups, ["k"], "version").collect())

    con = duckdb.connect()
    con.execute("CREATE TABLE base(k BIGINT, name VARCHAR, val DOUBLE, version BIGINT)")
    con.execute("CREATE TABLE ups(k BIGINT, name VARCHAR, val DOUBLE, version BIGINT)")
    con.executemany("INSERT INTO base VALUES (?,?,?,?)", BASE)
    con.executemany("INSERT INTO ups VALUES (?,?,?,?)", UPDATES)
    want = sorted(
        tuple(r)
        for r in con.execute(
            """
        WITH latest AS (
          SELECT k, name, val, version FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY k
                      ORDER BY version DESC, name DESC NULLS LAST, val DESC NULLS LAST) AS rn
            FROM ups) WHERE rn = 1
        )
        SELECT * FROM base WHERE k NOT IN (SELECT k FROM latest)
        UNION ALL SELECT * FROM latest
        """
        ).fetchall()
    )
    assert got == want
    # spot-check the semantics directly
    state = {r[0]: r for r in got}
    assert state[2][1] == "b3" and state[2][3] == 7
    assert state[5][1] == "e-tie"
    assert set(state) == {1, 2, 3, 4, 5}


def test_merge_idempotent_reapply(spark):
    """Re-applying the same batch must not change the state (copy-on-write
    merge is idempotent for deterministic dedup)."""
    base = spark.createDataFrame(BASE, SCHEMA)
    ups = spark.createDataFrame(UPDATES, SCHEMA)
    once = merge_upsert(base, ups, ["k"], "version")
    twice = merge_upsert(once, ups, ["k"], "version")
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))
