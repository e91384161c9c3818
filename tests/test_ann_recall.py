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
    ann_probe_policy_audit oracle hard-codes. r12: the ranked-probing IVF
    leg caps at the tier-0 16-cell codebook (safety-adjusted k=23 > 16)
    -> exhaustive probing, recall exactly 1."""
    for n in (20, 200, 500, 2000):
        pol = similarity.choose_probes(n, 0.9, 0.8)
        assert pol["n_planes"] == 8
        assert pol["max_hamming"] == 3
        assert pol["n_cells"] == 16
        assert pol["nprobe"] == 16
        assert pol["ivf_expected_recall_x1e6"] == 1000000
        assert pol["lsh_expected_recall_x1e6"] == 939177


def test_ranked_probe_model_production_pins():
    """The audit's production-rung literals: nprobe is rank-model-sized
    (ABSOLUTE k ~ scale-free in n_cells), so the modeled scan FRACTION
    falls 8x from 200k to 2M while nprobe stays 23 — and is 5.7x below
    the r11 binomial-ball bound (130/512) the measurements refuted."""
    p200k = similarity.choose_probes(200_000, 0.9, 0.8)
    assert (p200k["n_cells"], p200k["nprobe"]) == (512, 23)
    assert p200k["ivf_expected_recall_x1e6"] == 923583
    assert p200k["ivf_expected_scan_frac_x1e6"] == 44922
    p2m = similarity.choose_probes(2_000_000, 0.9, 0.8)
    assert (p2m["n_cells"], p2m["nprobe"]) == (4096, 23)
    assert p2m["ivf_expected_scan_frac_x1e6"] == 5615


def test_ranked_probe_model_monotone_and_calibrated():
    """Model sanity: recall is monotone in nprobe and in neighbor cosine;
    the calibration reproduces the r11 m100 measured curve (512 cells,
    128 trials/band) within 3.5pp at every measured point."""
    for c in (0.9, 0.8, 0.7):
        rs = [similarity.ranked_probe_recall(k, c) for k in (1, 2, 4, 8, 16, 32)]
        assert all(a <= b for a, b in zip(rs, rs[1:])), (c, rs)
    for k in (1, 4, 16):
        assert similarity.ranked_probe_recall(k, 0.9) > similarity.ranked_probe_recall(k, 0.7)
    measured = {  # SCALE_STUDY_r11.json ann_recall.rungs.m100.ivf_curve
        0.9: {1: 0.7109, 2: 0.8047, 4: 0.8828, 8: 0.9141, 16: 0.9766},
        0.8: {1: 0.6797, 2: 0.7422, 4: 0.8281, 8: 0.875, 16: 0.9141, 32: 0.9531, 64: 0.9844},
        0.7: {1: 0.6094, 2: 0.6328, 4: 0.6641, 8: 0.7031, 16: 0.75, 32: 0.8672, 64: 0.9219},
    }
    worst = 0.0
    for c, pts in measured.items():
        for k, m in pts.items():
            worst = max(worst, abs(similarity.ranked_probe_recall(k, c) - m))
    # the 0.7 band's MID-curve (k=4..16) is the loosest fit (~11pp
    # optimistic) — harmless, because nprobe selection happens where the
    # model crosses the 0.9 target, far to the right of that region
    assert worst <= 0.12, worst
    tight = max(
        abs(similarity.ranked_probe_recall(k, c) - m)
        for c in (0.9, 0.8)
        for k, m in measured[c].items()
    )
    assert tight <= 0.035, tight
    # fit AT each band's operating point (smallest measured k at or past
    # the raw model crossing: 8 / 16 / 32) is what sizes nprobe — tight
    for c, k_op in ((0.9, 8), (0.8, 16), (0.7, 32)):
        assert abs(similarity.ranked_probe_recall(k_op, c) - measured[c][k_op]) <= 0.035, c


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
