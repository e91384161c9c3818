"""Connected components over a near-duplicate pair graph — the cluster step
of real LLM-corpus dedup: LSH emits pairwise matches, but "keep one doc per
duplicate CLUSTER" needs the transitive closure (A~B, B~C → one canonical
for {A,B,C}), then one survivor per component.

Engine extension surface (the reference has no graph ops; BASELINE.json
north star). Algorithm: iterative min-label propagation —
label(v) := min(label(v), min over neighbors' labels) to fixpoint. Each
iteration is one shuffle join + one aggregate, and the iteration count is
the graph DIAMETER, not the vertex count; near-dup graphs are clique-ish
(LSH verification connects most of each cluster directly), so 2-4
iterations close real corpora. For adversarially long path graphs the
known refinement is alternating large-star/small-star (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SOCC'14), which squares
the label-jump per round; the API contract here doesn't change.

Scale notes:
- `localCheckpoint` after every iteration truncates lineage — without it
  the plan doubles per round and planning time explodes by iteration 10;
- labels are (long, long) rows — the shuffle moves 16 bytes per vertex
  per round regardless of document size;
- convergence check is one count() per round on the changed subset, the
  standard driver-side fixpoint test for iterative DataFrame algorithms.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 50,
) -> DataFrame:
    """(src, dst) undirected edge list → (vertex, component) where
    component = min vertex id in the connected component (deterministic
    canonical label). Raises if not converged within max_iter (real
    near-dup graphs converge in a handful of rounds)."""
    sym = edges.select(F.col(src).alias("s"), F.col(dst).alias("t")).unionByName(
        edges.select(F.col(dst).alias("s"), F.col(src).alias("t"))
    )
    sym = sym.localCheckpoint(eager=True)
    labels = (
        sym.select(F.col("s").alias("v"))
        .distinct()
        .withColumn("label", F.col("v"))
        .localCheckpoint(eager=True)
    )
    import gc

    for _ in range(max_iter):
        prop = (
            sym.join(labels, sym["s"] == labels["v"])
            .select(F.col("t").alias("v"), F.col("label"))
        )
        new_labels = (
            labels.unionByName(prop)
            .groupBy("v")
            .agg(F.min("label").alias("label"))
            .localCheckpoint(eager=True)
        )
        changed = (
            labels.alias("o")
            .join(new_labels.alias("n"), "v")
            .where(F.col("o.label") != F.col("n.label"))
            .count()
        )
        # drop the superseded generation's references and collect so
        # Spark's ContextCleaner can free its localCheckpoint blocks —
        # otherwise a long-diameter graph pins every iteration's
        # (vertex, label) snapshot in executor storage until session end
        labels = new_labels
        del prop, new_labels
        gc.collect()
        if changed == 0:
            return labels.select(F.col("v").alias("vertex"), F.col("label").alias("component"))
    raise RuntimeError(f"connected_components did not converge in {max_iter} iterations")


def near_dup_cluster_assignments(
    pairs: DataFrame, id_a: str = "id_a", id_b: str = "id_b"
) -> DataFrame:
    """Near-dup pairs → (doc_id, cluster_id, cluster_size): every paired doc
    labeled with its component's min doc_id (the canonical survivor) and
    the component size. Keep-one-per-cluster is then a filter
    (doc_id == cluster_id); dedup ratio reporting comes from cluster_size.
    """
    from pyspark.sql import Window

    comp = connected_components(pairs, id_a, id_b)
    return (
        comp.select(
            F.col("vertex").alias("doc_id"),
            F.col("component").alias("cluster_id"),
        )
        .withColumn("cluster_size", F.count(F.lit(1)).over(Window.partitionBy("cluster_id")))
        .orderBy("doc_id")
    )
