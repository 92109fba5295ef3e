"""rho / lambda math vs straight-line numpy oracles (SURVEY.md §5.2)."""

import math

import numpy as np
import pytest

from pboh_entity_linking_ray.config import ScorerWeights
from pboh_entity_linking_ray.functions.logodds import (
    lambda_pairwise,
    rho_idf,
    sorted_lookup,
)


def test_rho_idf_oracle():
    df = np.array([0, 1, 10, 100])
    out = rho_idf(df, 100)
    assert out[0] == 0.0  # unseen mention → 0 (RhoCache analog)
    assert out[1] == pytest.approx(math.log(100))
    assert out[3] == pytest.approx(0.0)


def test_lambda_oracle_straight_line():
    w = ScorerWeights()
    n = 1000
    c, d1, d2 = 5.0, 10.0, 20.0
    expect = (
        math.log(max(0.0, c - w.delta_cocit) / n
                 + w.cocit_e_e_param * (d1 / n) * (d2 / n))
        - w.h * math.log(d1 / n) - w.h * math.log(d2 / n)
    )
    got = lambda_pairwise(np.array([c]), np.array([d1]), np.array([d2]), n, w)
    assert got[0] == pytest.approx(expect)


def test_lambda_floor_when_no_cocit():
    w = ScorerWeights()
    got = lambda_pairwise(np.array([0.0]), np.array([5.0]), np.array([5.0]), 100, w)
    assert got[0] == w.lambda_floor  # the reference's -1000 branch analog


def test_lambda_monotone_in_cocit():
    w = ScorerWeights()
    c = np.array([1.0, 5.0, 50.0])
    d = np.full(3, 20.0)
    out = lambda_pairwise(c, d, d, 1000, w)
    assert out[0] < out[1] < out[2]


def test_sorted_lookup():
    keys = np.array([-5, 3, 900], dtype=np.int64)
    sk = np.array([-5, 0, 3, 10], dtype=np.int64)
    sv = np.array([50, 60, 70, 80], dtype=np.int64)
    out = sorted_lookup(keys, sk, sv, default=-1)
    assert out.tolist() == [50, 70, -1]
    assert sorted_lookup(np.array([], dtype=np.int64), sk, sv).tolist() == []


def test_npmi_scale_invariance():
    """NPMI of a perfectly-correlated token pair must not drift with N —
    the property that keeps one match threshold valid from 2k to 10^12
    conversations (lambda_pairwise, by contrast, grows ~log N)."""
    from pboh_entity_linking_ray.functions.logodds import npmi_pairwise

    w = ScorerWeights()
    vals = []
    for n in (2_000, 100_000, 10_000_000):
        k = 3.0  # cluster of 3: df=3, cocit=3 at any corpus size
        vals.append(npmi_pairwise(np.array([k]), np.array([k]),
                                  np.array([k]), n, w)[0])
    assert max(vals) - min(vals) < 0.05
    assert all(v > 0.85 for v in vals)


def test_npmi_independent_and_floor():
    from pboh_entity_linking_ray.functions.logodds import npmi_pairwise

    w = ScorerWeights()
    n = 100_000
    # independent: cocit ≈ p1*p2*N
    p = 30_000.0
    c = p * p / n
    out = npmi_pairwise(np.array([c]), np.array([p]), np.array([p]), n, w)
    assert abs(out[0]) < 0.1
    # never co-occurring → hard floor -1 (reference -1000 branch analog)
    out = npmi_pairwise(np.array([0.0]), np.array([p]), np.array([p]), n, w)
    assert out[0] == -1.0
