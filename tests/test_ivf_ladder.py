"""Scale-aware IVF codebook sizing (operators/similarity.py round 5): the
ladder keeps tier 0 pinned at 16 cells for the driver correctness SFs (so
the static DuckDB oracle stays exact) and grows the cell count with the
corpus above that, keeping the within-cell quadratic linear overall — the
fix for the r5 ANN ladder's b=1.69 cliff on embedding_near_dup_ivf."""

from __future__ import annotations

from pyspark.sql import functions as F

from seo_audit_etl_actor_spark.operators import similarity


def test_choose_ivf_cells_tiers():
    # tier 0: pinned at 16 so driver SFs (200 / 2,000 vectors) match the
    # static 16-cell oracle SQL
    assert similarity.choose_ivf_cells(0) == 16
    assert similarity.choose_ivf_cells(200) == 16
    assert similarity.choose_ivf_cells(2_000) == 16
    assert similarity.choose_ivf_cells(20_000) == 16
    # above tier 0: next power of two of n / IVF_TARGET_CELL_SIZE
    assert similarity.choose_ivf_cells(20_001) == 32
    assert similarity.choose_ivf_cells(63_240) == 128  # the m31.6 rung
    assert similarity.choose_ivf_cells(632_400) == 1024  # the m316 rung
    # capped: the average cell grows again past cells * target vectors
    assert similarity.choose_ivf_cells(10**12) == similarity.IVF_MAX_CELLS


def test_average_cell_membership_stays_bounded():
    # the linearity argument is avg cell ~ target: Σ|cell|² ≈ target·n —
    # holds up to the cell cap (IVF_MAX_CELLS × target ≈ 42M vectors);
    # past the cap the average grows linearly again by design (the cap
    # bounds codebook collect/matmul cost; shard the corpus beyond it)
    for n in (30_000, 10**5, 10**6, 10**7, 4 * 10**7):
        cells = similarity.choose_ivf_cells(n)
        avg = n / cells
        assert avg <= similarity.IVF_TARGET_CELL_SIZE, (n, cells)
        assert avg > similarity.IVF_TARGET_CELL_SIZE / 4, (n, cells)
    assert similarity.choose_ivf_cells(10**8) == similarity.IVF_MAX_CELLS


def _dup_corpus(spark, n_distinct: int, dim: int = 4):
    """2·n_distinct vectors: ids i and i + n_distinct carry IDENTICAL
    deterministic dim-4 direction vectors — every vector has exactly one
    exact duplicate, so the true near-dup pair set is known a priori."""
    return spark.range(2 * n_distinct).select(
        F.col("id").alias("vec_id"),
        F.array(
            *[
                F.cos(
                    (F.col("id") % n_distinct).cast("double") * F.lit(0.37 * (j + 1))
                    + F.lit(float(j))
                ).cast("float")
                for j in range(dim)
            ]
        ).alias("embedding"),
    )


def test_ladder_tier_finds_all_exact_duplicates(spark):
    """Above tier 0 the codebook grows (>16 cells actually used) and exact
    duplicates — identical vectors, which always share a cell under ANY
    codebook — are all found. 22k vectors → choose_ivf_cells picks 64."""
    n_distinct = 11_000
    emb = _dup_corpus(spark, n_distinct)
    assert similarity.choose_ivf_cells(2 * n_distinct) == 64
    pairs = similarity.embedding_near_dup_ivf_pairs(emb, threshold=0.999999)
    # r12 rep-level output: an exact-duplicate pair (i, i+n_distinct)
    # surfaces as the rep's SELF row (id_a = id_b = min copy id = i) with
    # n_pairs = C(2,2) = 1
    got = {
        (r["id_a"], r["id_b"]): r["n_pairs"]
        for r in pairs.where(F.col("id_a") == F.col("id_b")).collect()
    }
    truth = {(i, i) for i in range(n_distinct)}
    assert truth <= set(got), f"missed {len(truth - set(got))} exact-duplicate reps"
    assert all(got[t] == 1 for t in truth)
    # the codebook actually engaged beyond tier 0
    n_cells_used = (
        similarity.assign_ivf_cells(emb, similarity.choose_ivf_cells(2 * n_distinct))
        .select("__cell")
        .distinct()
        .count()
    )
    assert n_cells_used > 16


def test_pinned_n_cells_overrides_probe(spark):
    """Callers (and the tier-0 oracle) can pin the codebook; the pinned
    form skips the count probe and matches itself deterministically."""
    emb = _dup_corpus(spark, 50)
    a = similarity.embedding_near_dup_ivf_pairs(emb, threshold=0.999999, n_cells=16)
    b = similarity.embedding_near_dup_ivf_pairs(emb, threshold=0.999999, n_cells=16)
    assert [tuple(r) for r in a.collect()] == [tuple(r) for r in b.collect()]
