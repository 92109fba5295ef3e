"""Vectorized MinHash signatures over uint64 shingle hashes.

MinHash/LSH is the new engine's blocking device (SURVEY.md §7.1 step 3) —
the approximation that replaces the reference's exhaustive per-document
candidate cross-products (reference: loopybeliefpropagation/
CocitationMap.scala:19-73 computes O(l²·c²) pairs per doc; we only ever
pair conversations that share an LSH band or signature key).

Permutation family: h_j(x) = (a_j * x + b_j) mod 2^64 with odd a_j —
uint64 wraparound multiplication, fully vectorized with
``np.minimum.reduceat`` over row segments (no Python loop per row).
"""

from __future__ import annotations

import numpy as np

from .hashing import stable_u64

_EMPTY_HASH = np.uint64(stable_u64("__empty_doc__"))


class MinHasher:
    def __init__(self, num_perm: int = 64, seed: int = 42):
        rng = np.random.Generator(np.random.PCG64(seed))
        self.num_perm = num_perm
        self.a = (rng.integers(1, 1 << 63, size=num_perm, dtype=np.uint64) << np.uint64(1)) | np.uint64(1)
        self.b = rng.integers(0, 1 << 63, size=num_perm, dtype=np.uint64)

    def signatures(self, hash_lists: list[np.ndarray]) -> np.ndarray:
        """Per-row shingle-hash arrays → (n_rows, num_perm) uint64 matrix."""
        n = len(hash_lists)
        if n == 0:
            return np.empty((0, self.num_perm), dtype=np.uint64)
        lengths = np.array([len(h) for h in hash_lists], dtype=np.int64)
        flat = (np.concatenate([h for h in hash_lists if len(h)])
                .astype(np.uint64) if lengths.sum() else
                np.empty(0, dtype=np.uint64))
        return self.signatures_flat(flat, lengths)

    def signatures_flat(self, flat: np.ndarray, lengths: np.ndarray) -> np.ndarray:
        """Flat shingle hashes + per-row lengths → (n, num_perm) uint64.
        Rows with length 0 get the deterministic empty-doc signature."""
        n = len(lengths)
        if n == 0:
            return np.empty((0, self.num_perm), dtype=np.uint64)
        empty = lengths == 0
        if empty.any():
            # splice one sentinel hash into each empty row
            total = int(lengths.sum()) + int(empty.sum())
            out_flat = np.empty(total, dtype=np.uint64)
            new_lengths = np.where(empty, 1, lengths)
            ends = np.cumsum(new_lengths)
            starts = ends - new_lengths
            src_ends = np.cumsum(lengths)
            src_starts = src_ends - lengths
            for i in range(n):   # boundary splice only; empty rows are rare
                if empty[i]:
                    out_flat[starts[i]] = _EMPTY_HASH
                else:
                    out_flat[starts[i]:ends[i]] = flat[src_starts[i]:src_ends[i]]
            flat, lengths = out_flat, new_lengths
        starts = np.zeros(n, dtype=np.int64)
        np.cumsum(lengths[:-1], out=starts[1:])
        flat = flat.astype(np.uint64, copy=False)
        # permute + segment-min in column chunks: a one-shot (n_flat, P)
        # intermediate is P×8 bytes per shingle (200 MB at 400k shingles,
        # P=64) and the allocation+traffic dominated the kernel (measured
        # 1.9 s/batch); 8-column chunks keep the working set cache-sized
        out = np.empty((n, self.num_perm), dtype=np.uint64)
        step = 8
        for c0 in range(0, self.num_perm, step):
            c1 = min(c0 + step, self.num_perm)
            vals = flat[:, None] * self.a[None, c0:c1] + self.b[None, c0:c1]
            out[:, c0:c1] = np.minimum.reduceat(vals, starts, axis=0)
        return out

    def band_keys(self, sigs: np.ndarray, num_bands: int,
                  rows_per_band: int | None = None) -> np.ndarray:
        """(n, P) signatures → (n, num_bands) uint64 band-bucket hashes.

        The first num_bands*rows_per_band signature columns are used; each
        band's r values are folded with a wraparound polynomial hash.
        rows_per_band tunes the S-curve: r=1 collides on ANY shared minimum
        (high recall — right when non-duplicates share ~no shingles, as
        measured on the transcript corpus), r=4 demands 4 agreeing minima
        (high precision for dirtier shingle distributions).
        """
        n, p = sigs.shape
        r = rows_per_band if rows_per_band is not None else p // num_bands
        assert r * num_bands <= p, "need num_bands*rows_per_band <= num_perm"
        mult = np.uint64(0x9E3779B97F4A7C15)
        out = np.empty((n, num_bands), dtype=np.uint64)
        for band in range(num_bands):
            seg = sigs[:, band * r : (band + 1) * r]
            acc = np.full(n, np.uint64(band + 1), dtype=np.uint64)
            for c in range(r):
                acc = (acc * mult) ^ seg[:, c]
            out[:, band] = acc
        return out


def bottom_k_jaccard(a: np.ndarray, b: np.ndarray, k: int) -> float:
    """Bottom-k sketch Jaccard estimate of two *sorted unique* uint64 arrays
    that were each truncated to their k smallest hashes (min-wise sampling).

    Standard estimator: take the k smallest of the union; the fraction of
    those present in both sketches estimates J(A, B).
    """
    if len(a) == 0 or len(b) == 0:
        return 0.0
    union = np.union1d(a, b)[:k]
    inter = np.intersect1d(a, b, assume_unique=True)
    hits = np.searchsorted(union, inter, side="left")
    common = int(np.sum((hits < len(union)) & (union[np.clip(hits, 0, len(union) - 1)] == inter)))
    return common / len(union)
