"""Property tests for the round-3 analytics family: each query is checked
against an INDEPENDENT Python model on hypothesis-generated inputs — the
cross-implementation strategy (SURVEY §5.2) applied beyond the fixed
driver corpus, to catch semantics bugs a single dataset can't (funnel
strictly-after ordering, moment-formula regressions)."""

from __future__ import annotations

import math
from datetime import datetime, timezone

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

from seo_audit_etl_actor_spark.queries.events_ext import FUNNEL_STEPS

EV_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("event_type", T.StringType(), False),
        T.StructField("ts", T.TimestampType(), False),
    ]
)

events_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),  # user
        st.sampled_from(["view", "click", "purchase", "error"]),
        st.integers(min_value=0, max_value=50),  # seconds offset; dups likely
    ),
    min_size=0,
    max_size=60,
)


def _funnel_model(rows):
    """Brute-force strictly-after funnel, one user at a time."""
    users = {}
    for u, ty, sec in rows:
        users.setdefault(u, []).append((sec, ty))
    n = len(users)
    s1 = s2 = s3 = 0
    for evs in users.values():
        t1 = min((s for s, t in evs if t == FUNNEL_STEPS[0]), default=None)
        if t1 is None:
            continue
        s1 += 1
        t2 = min((s for s, t in evs if t == FUNNEL_STEPS[1] and s > t1), default=None)
        if t2 is None:
            continue
        s2 += 1
        t3 = min((s for s, t in evs if t == FUNNEL_STEPS[2] and s > t2), default=None)
        if t3 is not None:
            s3 += 1
    return n, s1, s2, s3


@settings(max_examples=12, deadline=None)
@given(events_strategy)
def test_funnel_matches_bruteforce_model(spark, rows):
    if not rows:
        return
    from seo_audit_etl_actor_spark.queries import events_ext

    df = spark.createDataFrame(
        [
            (u, ty, datetime.fromtimestamp(1_700_000_000 + sec, tz=timezone.utc))
            for u, ty, sec in rows
        ],
        EV_SCHEMA,
    )
    # drive the same expression pipeline as the catalog query, bypassing
    # the parquet loader
    import seo_audit_etl_actor_spark.queries.events_ext as m

    orig = m.load_table
    try:
        m.load_table = lambda _s, _d, _n: df
        out = events_ext.q_conversion_funnel(spark, "unused").collect()[0]
    finally:
        m.load_table = orig
    n, s1, s2, s3 = _funnel_model(rows)
    assert (out["n_users"], out["step_view"], out["step_click"], out["step_purchase"]) == (
        n,
        s1,
        s2,
        s3,
    )


@settings(max_examples=12, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["A", "B"]),
            st.integers(min_value=0, max_value=100),
            st.integers(min_value=0, max_value=100000),
        ),
        min_size=3,
        max_size=40,
    )
)
def test_regression_moments_match_python_model(spark, rows):
    """The exact-moment corr/slope/intercept equals the direct Python
    formula over the same integers (to 1e-9 — both are the same closed
    form over exact sums)."""
    from seo_audit_etl_actor_spark.queries import quality_ext as m

    df = spark.createDataFrame(
        [(g, float(x), float(y)) for g, x, y in rows],
        "l_returnflag string, l_quantity double, l_extendedprice double",
    )
    orig = m.load_table
    try:
        m.load_table = lambda _s, _d, _n: df
        got = {
            r["l_returnflag"]: r
            for r in m.q_quantity_price_regression(spark, "unused").collect()
        }
    finally:
        m.load_table = orig
    by_g = {}
    for g, x, y in rows:
        by_g.setdefault(g, []).append((x, y))
    for g, pts in by_g.items():
        n = len(pts)
        sx = sum(x for x, _ in pts)
        sy = sum(y for _, y in pts)
        sxx = sum(x * x for x, _ in pts)
        syy = sum(y * y for _, y in pts)
        sxy = sum(x * y for x, y in pts)
        var_x = n * sxx - sx * sx
        var_y = n * syy - sy * sy
        row = got[g]
        assert row["n"] == n
        if var_x > 0 and var_y > 0:
            corr = (n * sxy - sx * sy) / math.sqrt(var_x * var_y)
            slope = (n * sxy - sx * sy) / var_x
            intercept = (sy - slope * sx) / n
            assert row["corr_qty_price"] is not None
            assert abs(row["corr_qty_price"] - round(corr, 6)) <= 1e-9
            assert abs(row["slope"] - round(slope, 6)) <= 1e-9
            assert abs(row["intercept"] - round(intercept, 6)) <= 1e-9
