"""Distinct-count operators: the HLL sketch must track the
oracle-checked exact count, and its primitives must be exact."""

import numpy as np

from pboh_entity_linking_ray.pipelines.cardinality import _clz64, _estimate


def test_clz64_exact():
    xs = np.array([0, 1, 2, 3, 2**63, 2**63 + 1, 2**64 - 1, 2**32],
                  dtype=np.uint64)
    exp = [63, 63, 62, 62, 0, 0, 0, 31]
    assert _clz64(xs).tolist() == exp


def test_hll_estimator_linear_range():
    # 100 distinct "hashes" spread over registers: linear counting regime
    regs = np.zeros(4096, dtype=np.int64)
    regs[np.arange(0, 4000, 40)] = 1
    est = _estimate(regs)
    m, zeros = 4096, 4096 - 100
    assert est == int(round(m * np.log(m / zeros)))


def test_hll_tracks_exact(ray_session):
    from pboh_entity_linking_ray.pipelines.cardinality import (
        hll_distinct_users,
        q31_distinct_users,
    )

    sf = "/root/testdata/sf0.001"
    exact = (q31_distinct_users(sf).to_pandas()
             .set_index("event_type")["n_users"])
    est = (hll_distinct_users(sf).to_pandas()
           .set_index("event_type")["n_users_est"])
    assert set(exact.index) == set(est.index)
    for ty in exact.index:
        rel = abs(est[ty] - exact[ty]) / max(1, exact[ty])
        assert rel <= 0.05, (ty, int(est[ty]), int(exact[ty]))
