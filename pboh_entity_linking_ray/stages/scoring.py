"""Pair scoring: candidate pair rows → scored matches.

THE canonical stateful actor-pool stage (SURVEY.md §2.4 A1): each actor
loads the broadcast statistics tables once in ``__init__`` — the direct
descendant of the reference's singleton-per-JVM ``AllIndexesBox`` pattern
(reference: src/main/scala/index/AllIndexesBox.scala:5-76; rationale
comment eval/cweb/RunLoopyAgainstAllGoogleClweb.scala:31-42) — and scores
Arrow batches of pairs with vectorized kernels.

Score = convex mix of
  * Jaro-Winkler on capped canonical text (batched numpy kernel),
  * token Jaccard over the bottom-k token hash sketches,
  * a squashed PBoH term  f·rho_norm + g·(2/(l-1))·Σ lambda  — the
    loopy-BP-free max-product closed form of the reference's message score
    (reference: loopybeliefpropagation/ScorerFull.scala:231-261, incl. the
    2/(l-1) pairwise normalization at :246), with l = number of shared
    salient tokens.

The whole batch is scored with flat-array segment arithmetic — padded
sort-merge intersection, bincount segment reductions — NO Python loop over
pairs (measured 0.9 ms → ~0.05 ms per pair).  Stats enter via ``ray.put``
object refs resolved once per actor — broadcast once per node, never
re-shipped per batch.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from ..config import PipelineConfig, ScorerWeights
from ..functions.logodds import npmi_pairwise, rho_idf, sorted_lookup
from ..functions.hashing import pack_pairs_np
from ..functions.similarity import jaro_winkler_batch

_SENTINEL = np.uint64(0xFFFFFFFFFFFFFFFF)

_TRIU_CACHE: dict[int, tuple[np.ndarray, np.ndarray]] = {}


def _triu(n: int) -> tuple[np.ndarray, np.ndarray]:
    t = _TRIU_CACHE.get(n)
    if t is None:
        t = np.triu_indices(n, k=1)
        _TRIU_CACHE[n] = t
    return t


class BroadcastStats:
    """Sorted-array views of the stats tables (vocab df + cooc counts).

    Key columns arrive bit-cast int64 (Ray groupby-key constraint, see
    stages/stats.py); they are stored sorted as int64 and every lookup key
    is bit-cast the same way, so searchsorted semantics stay consistent.
    """

    def __init__(self, vocab_hash: np.ndarray, vocab_df: np.ndarray,
                 cooc_key: np.ndarray, cooc_count: np.ndarray, n_docs: int):
        vocab_hash = np.ascontiguousarray(vocab_hash).view(np.int64) \
            if vocab_hash.dtype == np.uint64 else vocab_hash.astype(np.int64)
        cooc_key = np.ascontiguousarray(cooc_key).view(np.int64) \
            if cooc_key.dtype == np.uint64 else cooc_key.astype(np.int64)
        o = np.argsort(vocab_hash)
        self.vocab_hash = vocab_hash[o]
        self.vocab_df = vocab_df[o].astype(np.int64)
        o = np.argsort(cooc_key)
        self.cooc_key = cooc_key[o]
        self.cooc_count = cooc_count[o].astype(np.int64)
        self.n_docs = int(n_docs)

    @staticmethod
    def from_tables(vocab: pa.Table, cooc: pa.Table, n_docs: int) -> "BroadcastStats":
        return BroadcastStats(
            np.asarray(vocab["token_hash"]), np.asarray(vocab["df"]),
            np.asarray(cooc["pair"]), np.asarray(cooc["count"]), n_docs,
        )


def _padded(list_arr) -> tuple[np.ndarray, np.ndarray]:
    """Arrow list<uint64> → (sentinel-padded (B, L) uint64 matrix, lengths)."""
    if isinstance(list_arr, pa.ChunkedArray):
        list_arr = list_arr.combine_chunks()
    offsets = np.asarray(list_arr.offsets)
    lens = np.diff(offsets).astype(np.int64)
    values = np.asarray(list_arr.flatten()).astype(np.uint64, copy=False)
    n = len(lens)
    width = max(1, int(lens.max(initial=1)))
    mat = np.full((n, width), _SENTINEL, dtype=np.uint64)
    rows = np.repeat(np.arange(n), lens)
    cols = np.arange(len(rows)) - np.repeat(np.cumsum(np.r_[0, lens[:-1]]), lens)
    mat[rows, cols] = values
    return mat, lens


class PairScorer:
    def __init__(self, stats_ref, cfg: PipelineConfig | None = None):
        self.cfg = cfg or PipelineConfig()
        self.w: ScorerWeights = self.cfg.weights
        self.stats: BroadcastStats = (
            ray.get(stats_ref) if isinstance(stats_ref, ray.ObjectRef) else stats_ref
        )

    def _pboh_and_jac(self, toks_a, toks_b) -> tuple[np.ndarray, np.ndarray]:
        w, st, cfg = self.w, self.stats, self.cfg
        A, la = _padded(toks_a)
        B, lb = _padded(toks_b)
        n = len(la)
        log_n = np.log(max(2, st.n_docs))

        S = np.sort(np.concatenate([A, B], axis=1), axis=1)
        dup = (S[:, 1:] == S[:, :-1]) & (S[:, 1:] != _SENTINEL)
        n_shared = dup.sum(axis=1)
        denom = la + lb - n_shared
        jac = np.where(denom > 0, n_shared / np.maximum(denom, 1), 0.0)

        rows = np.nonzero(dup)[0]
        sv = S[:, 1:][dup]                       # shared tokens, row-major
        if len(sv) == 0:
            return np.zeros(n), jac
        # token ids are 32-bit values → plain astype matches the int64
        # vocab keys (the packed cooc keys below stay bit-cast instead)
        df = sorted_lookup(sv.astype(np.int64), st.vocab_hash, st.vocab_df,
                           default=1)
        idf = rho_idf(df, st.n_docs)

        # top-k most-salient shared tokens per row (stable: -idf, token asc)
        order = np.lexsort((sv, -idf, rows))
        srows = rows[order]
        newseg = np.r_[True, srows[1:] != srows[:-1]]
        seg_first = np.maximum.accumulate(
            np.where(newseg, np.arange(len(srows)), 0))
        rank = np.arange(len(srows)) - seg_first
        keep = rank < cfg.top_shared_tokens
        tv = sv[order][keep]
        tdf = df[order][keep]
        tidf = idf[order][keep]
        trow = srows[keep]

        counts = np.bincount(trow, minlength=n)          # l per row
        rho_norm = np.zeros(n)
        nz = counts > 0
        rho_norm[nz] = (np.bincount(trow, weights=tidf, minlength=n)[nz]
                        / counts[nz]) / log_n

        # pairwise NPMI over each row's top tokens: flat segment triu.
        # the reference's 2/(l-1) max-product normalization times 1/l over
        # the l(l-1)/2 pair terms is exactly the pair MEAN — keeping the
        # aggregate in [-1, 1] independent of l and of corpus size
        lam_sum = np.zeros(n)
        seg_starts = np.cumsum(np.r_[0, counts[:-1]])
        for l in np.unique(counts):
            if l < 2:
                continue
            ia, ib = _triu(int(l))
            rsel = np.flatnonzero(counts == l)
            base = seg_starts[rsel]
            pi = (base[:, None] + ia[None, :]).ravel()
            pj = (base[:, None] + ib[None, :]).ravel()
            keys = pack_pairs_np(tv[pi], tv[pj]).view(np.int64)
            cocit = sorted_lookup(keys, st.cooc_key, st.cooc_count, default=0)
            lam = npmi_pairwise(cocit, tdf[pi], tdf[pj], st.n_docs, w)
            per_row = lam.reshape(len(rsel), -1).sum(axis=1)
            lam_sum[rsel] = per_row * (2.0 / (l - 1)) / l

        lam_norm = np.clip(lam_sum, 0.0, 1.0)
        lam_norm[counts < 2] = 0.0
        pboh = np.clip(w.f * rho_norm + w.g * lam_norm, 0.0, 1.0)
        pboh[counts == 0] = 0.0
        return pboh, jac

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            out = batch
            for c in ("jw", "jaccard", "pboh", "score"):
                out = out.append_column(c, pa.array([], type=pa.float64()))
            return out.append_column("is_match", pa.array([], type=pa.bool_()))

        w = self.w
        jw = jaro_winkler_batch(batch["jw_a"].to_pylist(),
                                batch["jw_b"].to_pylist())
        pboh, jac = self._pboh_and_jac(batch["tokens_a"], batch["tokens_b"])

        score = (w.w_jw * jw + w.w_jac * jac + pboh) / (w.w_jw + w.w_jac + 1.0)
        out = batch
        out = out.append_column("jw", pa.array(jw, type=pa.float64()))
        out = out.append_column("jaccard", pa.array(jac, type=pa.float64()))
        out = out.append_column("pboh", pa.array(pboh, type=pa.float64()))
        out = out.append_column("score", pa.array(score, type=pa.float64()))
        out = out.append_column(
            "is_match", pa.array(score >= w.match_threshold, type=pa.bool_())
        )
        return out


def score_pairs(pairs: ray.data.Dataset, stats: BroadcastStats,
                cfg: PipelineConfig | None = None) -> ray.data.Dataset:
    cfg = cfg or PipelineConfig()
    stats_ref = ray.put(stats)
    return pairs.map_batches(
        PairScorer,
        fn_constructor_kwargs={"stats_ref": stats_ref, "cfg": cfg},
        batch_format="pyarrow",
        batch_size=cfg.scorer_batch_size,
        # elastic pool: min 1 so the stage can never starve the rest of the
        # pipeline on a small machine; scales to scorer_concurrency actors
        concurrency=(1, cfg.scorer_concurrency),
        num_cpus=1,
    )
