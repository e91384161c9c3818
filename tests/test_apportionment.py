"""Property tests for largest-remainder token-budget apportionment
(queries/pipeline_ext.py apportion_budget) vs an INDEPENDENT pure-Python
Hamilton-method model on hypothesis-generated cell frames — the fixed
driver corpus only exercises one (source, lang) distribution; these hit
single-cell frames, uniform ties, and budgets smaller than the cell
count (quota 0/1 boundary)."""

from __future__ import annotations

from fractions import Fraction

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

from seo_audit_etl_actor_spark.queries.pipeline_ext import apportion_budget

CELL_SCHEMA = T.StructType(
    [
        T.StructField("source", T.StringType(), False),
        T.StructField("lang", T.StringType(), False),
        T.StructField("cell_tokens", T.LongType(), False),
    ]
)


def _hamilton_model(cells: list[tuple[str, str, int]], budget: int) -> dict:
    """Exact-rational independent model: base = floor(B*n/N); leftovers to
    the largest remainders, ties by (source, lang)."""
    n_total = sum(n for _, _, n in cells)
    base = {(s, l): budget * n // n_total for s, l, n in cells}
    rem = {(s, l): budget * n % n_total for s, l, n in cells}
    leftover = budget - sum(base.values())
    order = sorted(rem, key=lambda k: (-rem[k], k))
    quota = dict(base)
    for k in order[:leftover]:
        quota[k] += 1
    return quota


cells_strategy = st.lists(
    st.tuples(
        st.sampled_from(["web", "books", "code", "wiki"]),
        st.sampled_from(["en", "es", "zh"]),
        st.integers(min_value=1, max_value=10**12),
    ),
    min_size=1,
    max_size=8,
    unique_by=lambda c: (c[0], c[1]),
)


@settings(max_examples=15, deadline=None)
@given(cells=cells_strategy, budget=st.integers(min_value=1, max_value=10**9))
def test_apportionment_matches_model(spark, cells, budget):
    df = spark.createDataFrame(cells, CELL_SCHEMA)
    got = {
        (r["source"], r["lang"]): r["quota"]
        for r in apportion_budget(df, budget).collect()
    }
    assert got == _hamilton_model(cells, budget)


def test_apportionment_invariants(spark):
    cells = [("web", "en", 7), ("books", "en", 5), ("code", "zh", 3)]
    budget = 100
    df = spark.createDataFrame(cells, CELL_SCHEMA)
    rows = apportion_budget(df, budget).collect()
    quotas = {(r["source"], r["lang"]): r["quota"] for r in rows}
    n_total = sum(n for _, _, n in cells)
    # exact exhaustion
    assert sum(quotas.values()) == budget
    # each quota within 1 of the exact rational share (Hamilton stays in
    # [floor(share), floor(share)+1])
    for s, l, n in cells:
        share = Fraction(budget * n, n_total)
        assert share.__floor__() <= quotas[(s, l)] <= share.__floor__() + 1
    # monotone: a strictly larger cell never gets a smaller quota
    by_n = sorted(cells, key=lambda c: c[2])
    for (s1, l1, n1), (s2, l2, n2) in zip(by_n, by_n[1:]):
        if n1 < n2:
            assert quotas[(s1, l1)] <= quotas[(s2, l2)]
