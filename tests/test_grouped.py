"""applyInPandas grouped-map operators vs a driver-side Python model (the
property-test strategy used for sessionize): results must match the model
exactly for every user, independent of partitioning."""

from __future__ import annotations

from pyspark.sql import functions as F

from seo_audit_etl_actor_spark.operators.grouped import ewma_per_user
from seo_audit_etl_actor_spark.session import load_table

ALPHA = 0.3


def _model(rows):
    by_user = {}
    for r in sorted(rows, key=lambda r: (r["user_id"], r["ts"], r["event_id"])):
        s = by_user.get(r["user_id"])
        s = r["value"] if s is None else ALPHA * r["value"] + (1.0 - ALPHA) * s
        by_user[r["user_id"]] = s
        yield (r["user_id"], r["event_id"], s)


def test_ewma_matches_python_model(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").where(F.col("user_id") % 17 == 0)
    rows = ev.select("user_id", "event_id", "ts", "value").collect()
    want = {(u, e): s for u, e, s in _model(rows)}
    got = {
        (r["user_id"], r["event_id"]): r["ewma"]
        for r in ewma_per_user(ev, ALPHA).collect()
    }
    assert set(got) == set(want)
    assert all(abs(got[k] - want[k]) < 1e-12 for k in want)


def test_ewma_partitioning_invariant(spark, sf_dir):
    """Same result under adversarial repartitioning (the shuffle must not
    change per-group order semantics)."""
    ev = load_table(spark, sf_dir, "events").where(F.col("user_id") % 29 == 0)
    a = sorted(map(tuple, ewma_per_user(ev).collect()))
    b = sorted(map(tuple, ewma_per_user(ev.repartition(13)).collect()))
    assert a == b
