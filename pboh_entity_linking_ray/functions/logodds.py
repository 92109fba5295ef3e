"""PBoH-style unary (rho) and pairwise (lambda) potentials, vectorized.

Recast of the reference's scorer math over token statistics instead of
entity statistics:

- ``rho`` (unary, salience): the reference's rho(m,e) combines the mention
  prior log p̂(e|m) with a context-word salience sum
  (reference: src/main/scala/loopybeliefpropagation/ScorerFull.scala:15-104).
  Our unary analog is the idf salience of the tokens two conversations
  share: rho(t) = log(N / df(t)).

- ``lambda`` (pairwise, PMI-style log-odds): mirrors the reference's
  lambda(e1,e2) shape — absolute-discounted co-occurrence plus smoothing
  mass under independence, minus a popularity discount, with a hard floor
  when the pair was never seen together
  (reference: ScorerFull.scala:207-227; -1000 floor at :222-226):

      lam = log( max(0, c - delta_cocit)/N + s * p1 * p2 ) - h*log p1 - h*log p2
      lam = lambda_floor                      when c == 0

  where p_i = df_i / N.
"""

from __future__ import annotations

import numpy as np

from ..config import ScorerWeights


def rho_idf(df: np.ndarray, n_docs: int) -> np.ndarray:
    """Salience rho(t) = log(N / df) for df>0; 0 for df==0 (unseen mention —
    the reference's RhoCache returns 0 for zero-frequency priors,
    ScorerFull.scala RhoCache.rho:24-28)."""
    df = np.asarray(df, dtype=np.float64)
    out = np.zeros_like(df)
    seen = df > 0
    out[seen] = np.log(n_docs / df[seen])
    return out


def lambda_pairwise(
    cocit: np.ndarray,
    df1: np.ndarray,
    df2: np.ndarray,
    n_docs: int,
    w: ScorerWeights,
) -> np.ndarray:
    cocit = np.asarray(cocit, dtype=np.float64)
    p1 = np.maximum(np.asarray(df1, dtype=np.float64), 1.0) / n_docs
    p2 = np.maximum(np.asarray(df2, dtype=np.float64), 1.0) / n_docs
    inner = np.maximum(0.0, cocit - w.delta_cocit) / n_docs \
        + w.cocit_e_e_param * p1 * p2
    lam = np.log(inner) - w.h * np.log(p1) - w.h * np.log(p2)
    lam = np.where(cocit <= 0, w.lambda_floor, lam)
    return np.maximum(lam, w.lambda_floor)


def npmi_pairwise(
    cocit: np.ndarray,
    df1: np.ndarray,
    df2: np.ndarray,
    n_docs: int,
    w: ScorerWeights,
) -> np.ndarray:
    """Normalized PMI with the reference's discount/floor flavors.

    ``lambda_pairwise`` reproduces the reference potential shape, but its
    magnitude grows with corpus size (PMI of correlated rare events ~
    log N), which would make a fixed match threshold scale-dependent.
    The scorer therefore uses NPMI = pmi / (-log p12) ∈ [-1, 1]:
    1 for perfectly correlated tokens, 0 for independent, -1 floor for
    never-co-occurring (the reference's -1000 branch analog,
    ScorerFull.scala:222-226) — invariant to N.
    """
    cocit = np.asarray(cocit, dtype=np.float64)
    p1 = np.maximum(np.asarray(df1, dtype=np.float64), 1.0) / n_docs
    p2 = np.maximum(np.asarray(df2, dtype=np.float64), 1.0) / n_docs
    p12 = np.maximum(0.0, cocit - w.delta_cocit) / n_docs \
        + w.cocit_e_e_param * p1 * p2
    pmi = np.log(p12 / (p1 * p2))
    den = -np.log(np.minimum(p12, 1 - 1e-12))
    npmi = np.where(den > 0, pmi / np.maximum(den, 1e-12), 1.0)
    return np.where(cocit <= 0, -1.0, np.clip(npmi, -1.0, 1.0))


def sorted_lookup(keys: np.ndarray, sorted_keys: np.ndarray,
                  values: np.ndarray, default=0) -> np.ndarray:
    """Vectorized lookup of ``keys`` in (sorted_keys → values); misses get
    ``default``.  This is the engine's broadcast-side hash-join primitive
    (binary search over a sorted Arrow/numpy column — replaces the
    reference's Trove hash maps and its merge-intersect cocitation lookup,
    EntityCooccurrenceIndex.scala:184-218)."""
    if len(sorted_keys) == 0 or len(keys) == 0:
        return np.full(len(keys), default, dtype=values.dtype if len(values) else np.int64)
    idx = np.searchsorted(sorted_keys, keys)
    idx_c = np.clip(idx, 0, len(sorted_keys) - 1)
    hit = sorted_keys[idx_c] == keys
    out = np.full(len(keys), default, dtype=values.dtype)
    out[hit] = values[idx_c[hit]]
    return out


class HashLookup:
    """keys → values map with a vectorized C hash probe
    (pandas ``Index.get_indexer``); misses get the call's ``default``.

    Drop-in faster sibling of ``sorted_lookup`` for the scorer's hot
    broadcast tables: measured 11× over ``np.searchsorted`` at 1M probes
    into a 3.2M-key table (the binary search's random cache misses
    dominate it).  The hash table builds lazily on the FIRST probe in
    each worker process and is reused for every batch — same lifecycle
    as the reference's Trove maps inside AllIndexesBox
    (reference: src/main/scala/index/EntityCooccurrenceIndex.scala:108-170).
    """

    def __init__(self, keys: np.ndarray, values: np.ndarray):
        import pandas as pd

        self._idx = pd.Index(np.ascontiguousarray(keys))
        self._vals = np.asarray(values)

    def __len__(self) -> int:
        return len(self._vals)

    def get(self, keys: np.ndarray, default=0) -> np.ndarray:
        if len(self._vals) == 0 or len(keys) == 0:
            return np.full(len(keys), default,
                           dtype=self._vals.dtype if len(self._vals)
                           else np.int64)
        pos = self._idx.get_indexer(keys)
        hit = pos >= 0
        out = np.full(len(keys), default, dtype=self._vals.dtype)
        out[hit] = self._vals[pos[hit]]
        return out
