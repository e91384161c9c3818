"""ANN quality gates: the approximate top-k paths (hyperplane LSH, IVF)
must keep useful recall against the exact brute-force baseline — the
correctness notion for operators that are approximate BY DESIGN (their
catalog entries are rows-only; this is their real check)."""

from __future__ import annotations

import pytest

from seo_audit_etl_actor_spark.operators import similarity
from seo_audit_etl_actor_spark.session import load_table

QUERY_IDS = (0, 7, 21)


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings")


def _ids(df):
    return [r["vec_id"] for r in df.collect()]


def test_lsh_mean_recall_at_10(emb):
    """Recall is a distributional property — gate the mean over queries
    (individual queries on a 500-vector corpus can legitimately dip)."""
    recalls = []
    for qid in QUERY_IDS:
        bf = set(_ids(similarity.cosine_topk(emb, qid, k=10)))
        lsh = set(_ids(similarity.cosine_topk_lsh(emb, qid, k=10, dim=64)))
        recalls.append(len(bf & lsh) / 10)
    assert sum(recalls) / len(recalls) >= 0.4, recalls
    assert all(r >= 0.1 for r in recalls), recalls


@pytest.mark.parametrize("qid", QUERY_IDS)
def test_ivf_recall_at_10(emb, qid):
    bf = set(_ids(similarity.cosine_topk(emb, qid, k=10)))
    ivf = set(_ids(similarity.cosine_topk_ivf(emb, qid, k=10)))
    assert len(bf & ivf) / 10 >= 0.7, (qid, sorted(bf), sorted(ivf))


def test_brute_force_is_exact_on_itself(emb):
    """Sanity: the baseline's own top-1 neighbor of a duplicated vector is
    deterministic (ties broken by vec_id)."""
    top = _ids(similarity.cosine_topk(emb, 0, k=10))
    assert len(top) == len(set(top)) == 10
