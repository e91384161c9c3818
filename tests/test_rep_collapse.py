"""Rep-collapse exactness on replica corpora (r12).

The sf0.1 bench corpus became 2M rows = ~2k distinct vectors × ~1000 exact
replicas, and the embedding family collapsed copies to representatives
(similarity.rep_collapse). These tests prove the collapse against the
copy-level ground truth on a corpus where duplicates actually exist —
the all-distinct oracle corpora (sf0.001/sf0.01) never exercise the
self-row / min-copy legs.

Copy-level truth is computed here in plain Python over a collected
~200-row corpus with the same left-assoc double arithmetic as the Spark
fold (Python floats ARE IEEE doubles), using the UNCHANGED
assign_ivf_cells for the cell key, so the reference is the original rule
verbatim: b dropped ⟺ ∃a, same cell, a.id < b.id, cos(a,b) ≥ T.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from seo_audit_etl_actor_spark.operators import similarity

T = 0.35
N_CELLS = 16


def _replica_corpus(spark, n_base: int = 60, dim: int = 8):
    """n_base deterministic distinct vectors; vector i gets (i % 4) extra
    exact copies at ids i + r·2³² (the bench corpus' replica id formula),
    so group sizes 1..4 and min-copy ids all sit in the base range."""
    base = spark.range(n_base).select(
        F.col("id").alias("vec_id"),
        F.array(
            *[
                F.cos(
                    F.col("id").cast("double") * F.lit(0.43 * (j + 1)) + F.lit(0.1 * j)
                ).cast("float")
                for j in range(dim)
            ]
        ).alias("embedding"),
        (F.col("id") % 5).cast("int").alias("label"),
    )
    copies = [base]
    for r in (1, 2, 3):
        copies.append(
            base.where(F.col("vec_id") % 4 >= r).select(
                (F.col("vec_id") + F.lit(r * (1 << 32))).alias("vec_id"),
                "embedding",
                "label",
            )
        )
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    return out


def _copy_level_truth(spark, emb):
    """The original copy-level rule, evaluated in Python over the collected
    corpus: returns ({dropped vec_ids}, {(id_a, id_b): cosine} pair map)."""
    assigned = similarity.assign_ivf_cells(emb, N_CELLS)
    rows = assigned.select("vec_id", "embedding", "__cell").collect()
    vecs = {int(r["vec_id"]): [float(x) for x in r["embedding"]] for r in rows}
    cell = {int(r["vec_id"]): int(r["__cell"]) for r in rows}

    def cos(a, b):
        num = 0.0
        for x, y in zip(a, b):
            num = num + x * y
        na = 0.0
        for x in a:
            na = na + x * x
        nb = 0.0
        for y in b:
            nb = nb + y * y
        return num / ((na**0.5) * (nb**0.5))

    ids = sorted(vecs)
    pairs = {}
    dropped = set()
    for i, ida in enumerate(ids):
        for idb in ids[i + 1 :]:
            if cell[ida] != cell[idb]:
                continue
            c = cos(vecs[ida], vecs[idb])
            if c >= T:
                pairs[(ida, idb)] = c
                dropped.add(idb)
    return dropped, pairs


def test_semantic_dedup_flags_matches_copy_level_rule(spark):
    emb = _replica_corpus(spark)
    truth_dropped, _ = _copy_level_truth(spark, emb)
    flagged = similarity.semantic_dedup_flags(emb, threshold=T, n_cells=N_CELLS)
    got = {
        int(r["vec_id"])
        for r in flagged.where(F.col("is_dropped") == 1).select("vec_id").collect()
    }
    assert got == truth_dropped


def test_ivf_pairs_rep_rows_expand_to_copy_pairs(spark):
    emb = _replica_corpus(spark)
    _, truth_pairs = _copy_level_truth(spark, emb)
    rep_rows = similarity.embedding_near_dup_ivf_pairs(
        emb, threshold=T, n_cells=N_CELLS
    ).collect()
    # multiplicity: Σ n_pairs over rep rows == |copy-level pair set|
    assert sum(int(r["n_pairs"]) for r in rep_rows) == len(truth_pairs)
    # every rep row's cosine appears in the copy-level map under its rep ids
    # (self rows: any copy pair of that rep; cross rows: the min-copy pair)
    by_min = {}
    for (ida, idb), c in truth_pairs.items():
        by_min.setdefault((ida % (1 << 32), idb % (1 << 32)), set()).add(c)
    for r in rep_rows:
        ka, kb = int(r["id_a"]) % (1 << 32), int(r["id_b"]) % (1 << 32)
        key = (ka, kb) if (ka, kb) in by_min else (kb, ka)
        assert float(r["cosine_sim"]) in by_min[key], (r["id_a"], r["id_b"])


def test_near_dup_pairs_rep_sample_self_rows(spark):
    emb = _replica_corpus(spark)
    rows = similarity.embedding_near_dup_pairs(emb, threshold=T, modulus=5).collect()
    reps = {
        int(r["rep_id"]): int(r["n_copies"])
        for r in similarity.rep_collapse(emb).collect()
    }
    # every sampled rep with >1 copies must emit a self row with C(n,2)
    want_self = {
        rid: n * (n - 1) // 2 for rid, n in reps.items() if rid % 5 == 0 and n > 1
    }
    got_self = {
        int(r["id_a"]): int(r["n_pairs"]) for r in rows if r["id_a"] == r["id_b"]
    }
    assert got_self == want_self
    # cross rows carry n_a × n_b
    for r in rows:
        if r["id_a"] != r["id_b"]:
            assert int(r["n_pairs"]) == reps[int(r["id_a"])] * reps[int(r["id_b"])]


def _write_replica_table(spark, tmp_path, n_base: int = 40):
    # dim 64: the rewritten queries unroll element_at chains at EMB_DIM
    emb = _replica_corpus(spark, n_base=n_base, dim=64)
    out = str(tmp_path / "emb")
    emb.coalesce(1).write.mode("overwrite").parquet(out)
    import os
    import shutil

    part = [f for f in os.listdir(out) if f.endswith(".parquet")][0]
    shutil.move(f"{out}/{part}", str(tmp_path / "embeddings.parquet"))
    return str(tmp_path)


def test_quantization_error_rep_collapse_matches_copy_level(spark, tmp_path):
    """The rewritten per-label quantization stats vs the original per-COPY
    pipeline (HOF transform/aggregate + plain count), row-for-row exact."""
    from pyspark.sql import functions as F

    from seo_audit_etl_actor_spark.queries.curation_ext import (
        q_embedding_quantization_error,
    )
    from seo_audit_etl_actor_spark.session import load_table

    sf_dir = _write_replica_table(spark, tmp_path)
    got = sorted(tuple(r) for r in q_embedding_quantization_error(spark, sf_dir).collect())
    emb = load_table(spark, sf_dir, "embeddings")
    xs = emb.select(
        "label", F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("xs")
    )
    scaled = xs.select(
        "label", "xs", F.expr("array_max(transform(xs, x -> abs(x))) / 127.0").alias("s")
    )
    errs = scaled.select(
        "label",
        F.expr(
            "CASE WHEN s = 0.0 THEN CAST(array() AS array<double>) "
            "ELSE transform(xs, x -> x - round(x / s) * s) END"
        ).alias("e"),
    )
    per_vec = errs.select(
        "label",
        F.expr(
            "CAST(ROUND(COALESCE(array_max(transform(e, x -> abs(x))), 0.0) * 1e9) AS BIGINT)"
        ).alias("maxerr9"),
        F.expr(
            "aggregate(e, CAST(0 AS BIGINT), (acc, x) -> acc + CAST(ROUND(x * x * 1e12) AS BIGINT))"
        ).alias("sse12"),
    )
    want = sorted(
        tuple(r)
        for r in per_vec.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            (F.sum("maxerr9") / F.count(F.lit(1)) / 1e9).alias("avg_max_err"),
            (F.sum("sse12") / F.count(F.lit(1)) / 1e12).alias("avg_sse"),
        )
        .collect()
    )
    assert got == want


def test_centroid_outliers_rep_collapse_matches_copy_level(spark, tmp_path):
    """The rewritten centroid-outlier stats vs the original per-COPY
    posexplode + label-window pipeline, row-for-row exact."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from seo_audit_etl_actor_spark.queries.curation_ext import (
        q_embedding_centroid_outliers,
    )
    from seo_audit_etl_actor_spark.session import load_table

    sf_dir = _write_replica_table(spark, tmp_path)
    got = sorted(tuple(r) for r in q_embedding_centroid_outliers(spark, sf_dir).collect())
    emb = load_table(spark, sf_dir, "embeddings")
    ex = emb.select(
        "vec_id",
        "label",
        F.posexplode(F.expr("transform(embedding, x -> CAST(x AS DOUBLE))")).alias(
            "pos", "x"
        ),
    ).select("vec_id", "label", (F.col("pos") + 1).alias("i"), "x")
    cent = (
        ex.groupBy("label", "i")
        .agg(
            F.sum(F.expr("CAST(ROUND(x * 1e6) AS BIGINT)")).alias("sumq6"),
            F.count(F.lit(1)).alias("n"),
        )
        .select("label", "i", F.expr("sumq6 / n / 1e6").alias("c"))
    )
    per_vec = (
        ex.join(F.broadcast(cent), ["label", "i"])
        .groupBy("vec_id", "label")
        .agg(
            F.sum(F.expr("CAST(ROUND((x - c) * (x - c) * 1e12) AS BIGINT)")).alias(
                "dist2q"
            )
        )
    )
    w = Window.partitionBy("label")
    flagged = per_vec.select(
        "label",
        "dist2q",
        (
            F.col("dist2q").cast("double")
            > 1.05 * (F.sum("dist2q").over(w) / F.count(F.lit(1)).over(w))
        ).alias("is_outlier"),
    )
    want = sorted(
        tuple(r)
        for r in flagged.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            (F.sum("dist2q") / F.count(F.lit(1)) / 1e12).alias("avg_dist2"),
            F.sum(F.expr("CASE WHEN is_outlier THEN 1 ELSE 0 END")).alias("n_outliers"),
        )
        .collect()
    )
    assert got == want


def test_choose_sample_modulus_tiers():
    # tier 0 pins the static-oracle modulus at driver SFs
    assert similarity.choose_sample_modulus(500) == 5
    assert similarity.choose_sample_modulus(20_000) == 5
    # above: doubles until the sampled-rep count is bounded (≤ target)
    assert similarity.choose_sample_modulus(50_000) == 20
    m = similarity.choose_sample_modulus(2_000_000)
    assert 2_000_000 / m <= similarity.EMB_SAMPLE_TARGET
    assert m % 5 == 0 and (m // 5) & (m // 5 - 1) == 0  # 5 × power of two


def test_semantic_dedup_flags_fanback_tiers_equal(spark):
    """r13 broadcast gate (VERDICT r12 task 2): the per-copy fan-back join
    must produce identical flags whether the rep frame is broadcast
    (below the rep-count tier) or shuffled (above it — forced here with
    max_broadcast_reps=0)."""
    emb = _replica_corpus(spark)

    def flags(**kw):
        return {
            (int(r["vec_id"]), int(r["is_dropped"]))
            for r in similarity.semantic_dedup_flags(
                emb, threshold=T, n_cells=N_CELLS, **kw
            ).collect()
        }

    assert flags() == flags(max_broadcast_reps=0)
