"""Sum-product LBP scorer (stages/lbp.py): message passing against the
exact enumeration oracle, and the golden-fixture F1 gate vs the
max-product closed form (the reference's LBP-vs-ARGMAX comparison)."""

import numpy as np
import pytest
import ray
import ray.data
from hypothesis import given, settings
from hypothesis import strategies as st

from pboh_entity_linking_ray.stages.lbp import _sum_product_beliefs


def _exact_marginals(theta, lam, mask):
    """Brute-force P(s_i = 1) of the binary pairwise MRF — 2^L state
    enumeration, the definition."""
    R, L = theta.shape
    out = np.zeros((R, L))
    for r in range(R):
        live = np.flatnonzero(mask[r])
        k = len(live)
        if k == 0:
            continue
        states = np.array(np.meshgrid(*([[0, 1]] * k),
                                      indexing="ij")).reshape(k, -1).T
        logw = states @ theta[r, live]
        for a in range(k):
            for b in range(a + 1, k):
                logw = logw + lam[r, live[a], live[b]] * states[:, a] * \
                    states[:, b]
        w = np.exp(logw - logw.max())
        w /= w.sum()
        for a in range(k):
            out[r, live[a]] = w[states[:, a] == 1].sum()
    return out


@settings(max_examples=40, deadline=None)
@given(st.integers(0, 10_000))
def test_beliefs_exact_on_two_variable_trees(seed):
    """L = 2 is a tree — loopy BP is EXACT there; pin it to the
    enumeration oracle at tight tolerance."""
    rng = np.random.default_rng(seed)
    theta = rng.normal(0, 2, size=(3, 2))
    l01 = rng.normal(0, 2, size=3)
    lam = np.zeros((3, 2, 2))
    lam[:, 0, 1] = l01
    lam[:, 1, 0] = l01
    mask = np.ones((3, 2), dtype=bool)
    got, iters_used, converged = _sum_product_beliefs(theta, lam, mask)
    want = _exact_marginals(theta, lam, mask)
    np.testing.assert_allclose(got, want, atol=1e-4)
    assert converged.all()
    assert (iters_used >= 1).all()


@settings(max_examples=25, deadline=None)
@given(st.integers(0, 10_000))
def test_beliefs_close_on_weakly_coupled_loops(seed):
    """L = 4 complete graph with weak couplings: loopy sum-product is
    approximate but must land near the exact marginals."""
    rng = np.random.default_rng(seed)
    R, L = 2, 4
    theta = rng.normal(0, 1, size=(R, L))
    lam = np.zeros((R, L, L))
    iu = np.triu_indices(L, k=1)
    vals = rng.normal(0, 0.3, size=(R, len(iu[0])))
    lam[:, iu[0], iu[1]] = vals
    lam = lam + np.transpose(lam, (0, 2, 1))
    mask = np.ones((R, L), dtype=bool)
    mask[0, -1] = False                      # exercise a dead variable
    lam[0, -1, :] = lam[0, :, -1] = 0.0
    got, _, converged = _sum_product_beliefs(theta, lam, mask)
    want = _exact_marginals(theta, lam, mask)
    np.testing.assert_allclose(got, want, atol=0.05)
    assert converged.all()      # weak couplings: every row converges
    assert got[0, -1] == 0.0                 # dead variable stays zero


@pytest.fixture(scope="module")
def golden(ray_session):
    from pboh_entity_linking_ray.sources.synthetic import generate_corpus

    return generate_corpus(120, 42)


def _f1(corpus, scorer):
    from pboh_entity_linking_ray.config import PipelineConfig
    from pboh_entity_linking_ray.pipelines.linkage import run_linkage
    from pboh_entity_linking_ray.stages.evaluate import pairwise_metrics

    res = run_linkage(ray.data.from_arrow(corpus.turns),
                      PipelineConfig(scorer=scorer))
    return pairwise_metrics(res.scored.materialize(), corpus.labels)["f1"]


def test_lbp_scorer_f1_matches_closed_form(golden):
    """The reference runs LBP and ARGMAX over the same datasets and
    reports both; on the golden fixture the sum-product scorer must be
    at least as good as the max-product closed form."""
    f1_lbp = _f1(golden, "lbp")
    f1_full = _f1(golden, "full")
    assert f1_lbp >= f1_full
    assert f1_lbp == 1.0


def test_lbp_telemetry_on_golden_fixture(golden):
    """Convergence telemetry (reference LBPTimeConvergence /
    GlobalStats.scala:200-209): every golden-fixture pair converges
    within the iteration budget, the scored set carries the telemetry
    columns, and the per-size report accounts for every pair."""
    from dataclasses import replace

    from pboh_entity_linking_ray.config import PipelineConfig
    from pboh_entity_linking_ray.pipelines.linkage import run_linkage
    from pboh_entity_linking_ray.stages.evaluate import (
        lbp_convergence_report)

    res = run_linkage(ray.data.from_arrow(golden.turns),
                      PipelineConfig(scorer="lbp"))
    sp = res.scored.to_pandas()
    for c in ("lbp_iters", "lbp_converged", "lbp_live_tokens"):
        assert c in sp.columns, c
    assert sp["lbp_converged"].all()
    assert (sp.loc[sp["lbp_live_tokens"] >= 2, "lbp_iters"] >= 1).all()

    rep = lbp_convergence_report(res.scored)
    assert rep["n_pairs"].sum() == len(sp)
    assert (rep["converged_pct"] == 1.0).all()


def test_lbp_differential_carries_convergence_columns(golden):
    """scorer_differential with baseline='lbp' folds the telemetry into
    the one-row report (distributed Sums, no pair collect)."""
    from pboh_entity_linking_ray.pipelines.linkage import run_linkage
    from pboh_entity_linking_ray.stages.evaluate import scorer_differential

    res = run_linkage(ray.data.from_arrow(golden.turns))
    out = scorer_differential(res.pairs, res.features, res.stats_ref,
                              golden.labels, baseline="lbp").to_pandas()
    assert out.loc[0, "lbp_converged_pct"] == 1.0
    assert out.loc[0, "lbp_avg_iters"] >= 0.0
    assert out.loc[0, "lbp_avg_live_tokens"] > 0.0
