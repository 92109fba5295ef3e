import numpy as np

from pboh_entity_linking_ray.functions.minhash import (
    MinHasher,
    bottom_k_jaccard,
)


def _rand_sets(rng, n_common, n_a, n_b):
    common = rng.integers(0, 2**63, size=n_common, dtype=np.uint64)
    a = np.unique(np.concatenate([common, rng.integers(0, 2**63, size=n_a, dtype=np.uint64)]))
    b = np.unique(np.concatenate([common, rng.integers(0, 2**63, size=n_b, dtype=np.uint64)]))
    return a, b


def test_minhash_deterministic():
    mh1, mh2 = MinHasher(64, seed=42), MinHasher(64, seed=42)
    h = [np.array([1, 2, 3], dtype=np.uint64)]
    assert (mh1.signatures(h) == mh2.signatures(h)).all()
    assert (MinHasher(64, seed=1).signatures(h) != mh1.signatures(h)).any()


def test_minhash_jaccard_estimate():
    rng = np.random.default_rng(5)
    mh = MinHasher(256, seed=42)
    a, b = _rand_sets(rng, 300, 100, 100)
    true_j = len(np.intersect1d(a, b)) / len(np.union1d(a, b))
    sa, sb = mh.signatures([a, b])
    est = float(np.mean(sa == sb))
    assert abs(est - true_j) < 0.12


def test_identical_sets_identical_signature():
    mh = MinHasher(64, seed=42)
    a = np.unique(np.random.default_rng(1).integers(0, 2**63, 50, dtype=np.uint64))
    sa, sb = mh.signatures([a, a.copy()])
    assert (sa == sb).all()


def test_empty_doc_signature_defined():
    mh = MinHasher(64, seed=42)
    sigs = mh.signatures([np.empty(0, dtype=np.uint64)])
    assert sigs.shape == (1, 64)


def test_band_keys_shape_and_collision():
    mh = MinHasher(64, seed=42)
    a = np.unique(np.random.default_rng(2).integers(0, 2**63, 80, dtype=np.uint64))
    sigs = mh.signatures([a, a.copy()])
    bk = mh.band_keys(sigs, 16)
    assert bk.shape == (2, 16)
    assert (bk[0] == bk[1]).all()


def test_bottom_k_jaccard_exact_when_untruncated():
    rng = np.random.default_rng(3)
    a, b = _rand_sets(rng, 40, 20, 20)
    true_j = len(np.intersect1d(a, b)) / len(np.union1d(a, b))
    assert abs(bottom_k_jaccard(np.sort(a), np.sort(b), 10**6) - true_j) < 1e-12


def test_bottom_k_jaccard_estimate_truncated():
    rng = np.random.default_rng(4)
    a, b = _rand_sets(rng, 500, 250, 250)
    true_j = len(np.intersect1d(a, b)) / len(np.union1d(a, b))
    k = 128
    est = bottom_k_jaccard(np.sort(a)[:k], np.sort(b)[:k], k)
    assert abs(est - true_j) < 0.15
