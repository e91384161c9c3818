"""The Arrow/pandas_udf cosine path must agree with the JVM HOF expression
path to float tolerance (different summation orders — NumPy pairwise vs
sequential fold — so approx, not exact)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from seo_audit_etl_actor_spark.operators import similarity
from seo_audit_etl_actor_spark.plans import audit
from seo_audit_etl_actor_spark.session import load_table


def test_pandas_cosine_matches_hof(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    qvec = [float(x) for x in emb.where(F.col("vec_id") == 0).first()["embedding"]]

    hof = {
        r["vec_id"]: r["cosine_sim"]
        for r in emb.select(
            "vec_id",
            similarity.cosine(
                F.col("embedding"), F.array(*[F.lit(x) for x in qvec])
            ).alias("cosine_sim"),
        ).collect()
    }
    arrow = {
        r["vec_id"]: r["cosine_sim"]
        for r in similarity.cosine_scores_pandas(emb, qvec).collect()
    }
    assert set(hof) == set(arrow)
    for k in hof:
        assert arrow[k] == pytest.approx(hof[k], abs=1e-9)


def test_pandas_path_is_visible_in_plan(spark, sf_dir):
    """The Arrow eval node should appear — proving this is the one place
    Python intentionally enters a plan."""
    emb = load_table(spark, sf_dir, "embeddings")
    qvec = [1.0] * 64
    df = similarity.cosine_scores_pandas(emb, qvec)
    assert audit.uses_python_udf(df)
