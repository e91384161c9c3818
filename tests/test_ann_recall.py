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


# --- recall-targeting probe policy (r11) -----------------------------------


def test_choose_probes_model_is_exact_binomial():
    """The policy's expected recall/scan are the exact binomial CDFs of the
    hyperplane separation model — spot-check against hand computation."""
    from math import comb

    pol = similarity.choose_probes(2000, target_recall=0.9, neighbor_cosine=0.8)
    assert (pol["n_planes"], pol["max_hamming"]) == (8, 3)
    p = similarity.lsh_separation_prob(0.8)
    by_hand = sum(comb(8, i) * p**i * (1 - p) ** (8 - i) for i in range(4))
    assert abs(pol["lsh_expected_recall"] - by_hand) < 1e-12
    # scan fraction at p=1/2 is a dyadic rational: (C(8,0..3))/256 = 93/256
    assert pol["lsh_expected_scan_frac"] == 93 / 256
    assert pol["lsh_expected_scan_frac_x1e6"] == 363281


def test_choose_probes_meets_target_at_min_hamming():
    """max_hamming is the SMALLEST h meeting the target (h-1 misses it)."""
    for n in (200, 20_000, 200_000, 2_000_000):
        for c in (0.9, 0.8, 0.7):
            pol = similarity.choose_probes(n, 0.9, c)
            assert pol["lsh_expected_recall"] >= 0.9
            if pol["max_hamming"] > 0:
                below = similarity._binom_cdf(
                    pol["max_hamming"] - 1,
                    pol["n_planes"],
                    similarity.lsh_separation_prob(c),
                )
                assert below < 0.9


def test_choose_probes_scan_fraction_is_sublinear():
    """The policy's whole point: at a fixed recall target the modeled scan
    FRACTION falls as the corpus grows (planes scale with log n), so
    scanned rows grow sub-linearly."""
    fracs = [
        similarity.choose_probes(n, 0.9, 0.9)["lsh_expected_scan_frac"]
        for n in (2_000, 200_000, 20_000_000)
    ]
    assert fracs[0] > fracs[1] > fracs[2], fracs
    assert fracs[2] < 0.05


def test_choose_probes_driver_sf_pin():
    """Every driver correctness SF floors to the same static knobs the
    ann_probe_policy_audit oracle hard-codes."""
    for n in (20, 200, 500, 2000):
        pol = similarity.choose_probes(n, 0.9, 0.8)
        assert pol["n_planes"] == 8
        assert pol["max_hamming"] == 3
        assert pol["n_cells"] == 16
        assert pol["nprobe"] == 11
        assert pol["lsh_expected_recall_x1e6"] == 939177


def test_multiprobe_lsh_beats_default_recall(emb):
    """Policy-chosen hamming widens recall vs the single-probe default on
    the real table (the r10 study's 0.375 gap, closed by the policy)."""
    pol = similarity.choose_probes(500, 0.9, 0.8)
    got_default, got_policy = [], []
    for qid in QUERY_IDS:
        bf = set(_ids(similarity.cosine_topk(emb, qid, k=10)))
        d = set(_ids(similarity.cosine_topk_lsh(emb, qid, k=10, dim=64)))
        w = set(
            _ids(
                similarity.cosine_topk_lsh(
                    emb, qid, k=10, dim=64,
                    n_planes=pol["n_planes"], max_hamming=pol["max_hamming"],
                )
            )
        )
        got_default.append(len(bf & d) / 10)
        got_policy.append(len(bf & w) / 10)
    assert sum(got_policy) >= sum(got_default)
    assert sum(got_policy) / len(got_policy) >= 0.6, (got_default, got_policy)
