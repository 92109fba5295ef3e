"""Bloom-filter pre-filtered semi/anti join — the scale path for
filtering joins whose probe side is huge.

``hash_join(how="semi"/"anti")`` already ships only the build side's key
column through the exchange, but every PROBE row still crosses it.  At
100 TB probe scale that is the whole cost.  A Bloom filter of the build
keys (~1.2 bytes/key at 1% fpr vs 8+ for an exact set) is built in one
streaming pass, broadcast once via ``ray.put``, and a vectorized
membership test splits the probe side BEFORE the exchange:

- semi: definite-non-members (no false negatives) are dropped in the
  map; only possible members shuffle, and the in-bucket exact join
  removes the Bloom's false positives → result EXACTLY equals the
  plain semi join.
- anti: definite-non-members are emitted directly (they provably have
  no match); only possible members shuffle for the exact anti verify.

Both paths are exact — the filter only moves work, never answers.
Hashing uses polars' seeded hash (stable across processes; the same
primitive the hash exchange partitions by), double-hashed into k probe
positions.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

BLOOM_K = 4                     # probe positions per key


def _bloom_positions(col: pa.ChunkedArray, m_bits: int) -> np.ndarray:
    """(n, k) bit positions for each key via double hashing."""
    import polars as pl

    s = pl.from_arrow(col.combine_chunks())
    h1 = s.hash(seed=101).to_numpy().astype(np.uint64)
    h2 = s.hash(seed=202).to_numpy().astype(np.uint64) | np.uint64(1)
    i = np.arange(BLOOM_K, dtype=np.uint64)
    return ((h1[:, None] + i[None, :] * h2[:, None])
            % np.uint64(m_bits)).astype(np.int64)


def build_bloom(ds: ray.data.Dataset, key_col: str,
                m_bits: int = 1 << 23) -> np.ndarray:
    """One streaming pass over the build side → uint64 bitmap words.
    Each batch emits its DISTINCT set-bit indices (skinny int64 rows,
    ≤ k × distinct-keys per batch); the driver only ever ORs bit
    indices, never sees keys.  Size ``m_bits`` ≈ 10× expected distinct
    keys for ~1% false-positive rate."""

    def set_bits(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"bit": pa.array([], type=pa.int64())})
        pos = _bloom_positions(t[key_col], m_bits)
        return pa.table({"bit": pa.array(np.unique(pos))})

    words = np.zeros(m_bits // 64 + 1, dtype=np.uint64)
    for batch in ds.map_batches(set_bits, batch_format="pyarrow") \
                   .iter_batches(batch_format="pyarrow"):
        bits = np.asarray(batch["bit"], dtype=np.int64)
        np.bitwise_or.at(words, bits // 64,
                         np.uint64(1) << (bits % 64).astype(np.uint64))
    return words


def _member_mask(col: pa.ChunkedArray, words: np.ndarray,
                 m_bits: int) -> np.ndarray:
    pos = _bloom_positions(col, m_bits)
    hit = (words[pos // 64] >> (pos % 64).astype(np.uint64)) & np.uint64(1)
    return hit.all(axis=1)


def bloom_filter_join(left: ray.data.Dataset, right: ray.data.Dataset,
                      on: str, how: str = "semi",
                      m_bits: int = 1 << 23,
                      num_buckets: int = 64) -> ray.data.Dataset:
    """Exact semi/anti join with a Bloom pre-filter on the probe (left)
    side: result identical to ``hash_join(left, right, on, how=how)``,
    but only Bloom-possible rows enter the exchange."""
    from .grouping import hash_join

    if how not in ("semi", "anti"):
        raise ValueError("bloom_filter_join supports how='semi'/'anti'")
    bloom_ref = ray.put(build_bloom(right, on, m_bits))

    def possible(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        return t.filter(pa.array(_member_mask(t[on], ray.get(bloom_ref),
                                              m_bits)))

    candidates = left.map_batches(possible, batch_format="pyarrow")
    verified = hash_join(candidates, right, on, num_buckets, how=how)
    if how == "semi":
        return verified

    def definite_non(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        return t.filter(pa.array(~_member_mask(t[on], ray.get(bloom_ref),
                                               m_bits)))

    direct = left.map_batches(definite_non, batch_format="pyarrow")
    return direct.union(verified)
