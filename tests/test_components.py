"""Connected components (operators/components.py): min-label propagation
must match a driver-side union-find on adversarial shapes — long paths
(worst-case diameter), cliques, singleton-free edge lists — and the
cluster-assignment wrapper must produce canonical min-id labels."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from seo_audit_etl_actor_spark.operators.components import (
    connected_components,
    connected_components_star,
    near_dup_cluster_assignments,
)


def _uf_components(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {v: find(v) for v in parent}


@pytest.mark.parametrize(
    "edges",
    [
        # long path: diameter 19 forces multiple propagation rounds
        [(i, i + 1) for i in range(20)],
        # two cliques + a bridge + an isolated pair
        [(a, b) for a in range(5) for b in range(a + 1, 5)]
        + [(a, b) for a in range(10, 14) for b in range(a + 1, 14)]
        + [(4, 10), (100, 101)],
        # star with high-degree hub
        [(0, i) for i in range(1, 30)],
        # reversed-id path (canonical label must still be the min)
        [(i + 1, i) for i in range(30, 50)],
    ],
)
def test_matches_union_find(spark, edges):
    df = spark.createDataFrame(edges, "id_a: long, id_b: long")
    got = {r["vertex"]: r["component"] for r in connected_components(df).collect()}
    assert got == _uf_components(edges)


@pytest.mark.parametrize(
    "edges",
    [
        [(i, i + 1) for i in range(20)],
        [(a, b) for a in range(5) for b in range(a + 1, 5)]
        + [(a, b) for a in range(10, 14) for b in range(a + 1, 14)]
        + [(4, 10), (100, 101)],
        [(0, i) for i in range(1, 30)],
        [(i + 1, i) for i in range(30, 50)],
    ],
)
def test_star_matches_union_find(spark, edges):
    df = spark.createDataFrame(edges, "id_a: long, id_b: long")
    got = {r["vertex"]: r["component"] for r in connected_components_star(df).collect()}
    assert got == _uf_components(edges)


def test_star_converges_in_log_rounds_on_path(spark):
    """The SOCC'14 refinement's reason to exist: a 1000-vertex path has
    diameter 999 (min-label would need 999 rounds), but alternating
    large-star/small-star squares label jumps per round — it must close
    in ≤ ceil(log2(n)) + 4 rounds (the function raises at max_iter, so
    passing max_iter=14 IS the round-count assertion)."""
    n = 1000
    edges = [(i, i + 1) for i in range(n - 1)]
    df = spark.createDataFrame(edges, "id_a: long, id_b: long")
    got = {
        r["vertex"]: r["component"]
        for r in connected_components_star(df, max_iter=14).collect()
    }
    assert got == {v: 0 for v in range(n)}


def test_cluster_assignments_shape(spark):
    edges = [(1, 2), (2, 3), (10, 11)]
    out = near_dup_cluster_assignments(spark.createDataFrame(edges, "id_a: long, id_b: long"))
    rows = [(r["doc_id"], r["cluster_id"], r["cluster_size"]) for r in out.collect()]
    assert rows == [(1, 1, 3), (2, 1, 3), (3, 1, 3), (10, 10, 2), (11, 10, 2)]


def test_empty_edge_set_converges_immediately(spark):
    """r13: convergence is a label-sum comparison (monotone non-increasing
    labels), and the fused first round detects the empty graph via a NULL
    sum — the loop must return an empty labeling in ONE round instead of
    raising or spinning."""
    df = spark.createDataFrame([], "id_a: long, id_b: long")
    assert connected_components(df, max_iter=1).collect() == []


def test_single_edge_converges_with_two_rounds_budget(spark):
    """A 1-edge graph is a fixpoint after round 1; the sum check detects
    it in round 2 — max_iter=2 IS the round-count assertion (the function
    raises at max_iter)."""
    df = spark.createDataFrame([(7, 3)], "id_a: long, id_b: long")
    got = {r["vertex"]: r["component"] for r in connected_components(df, max_iter=2).collect()}
    assert got == {3: 3, 7: 3}
