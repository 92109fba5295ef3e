"""Pair scoring: candidate pair rows → scored matches.

Features are re-attached to the SKINNY pair rows by two bucketed
co-group joins on the conversation id (``attach_features``) — the
100 TB-safe exchange: the blocking shuffle never moves token sketches or
text, and the per-pair feature payload streams through a hash-partitioned
join instead of a driver-built O(corpus) broadcast store.

Scoring itself is THE canonical stateful stage (SURVEY.md §2.4 A1): each
worker resolves the broadcast statistics tables once — the direct
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
pairs.  Stats enter via ``ray.put`` object refs resolved once per worker
process — broadcast once per node, never re-shipped per batch.
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

    @staticmethod
    def _sorted_i64(keys: np.ndarray, vals: np.ndarray):
        keys = np.ascontiguousarray(keys).view(np.int64) \
            if keys.dtype == np.uint64 else keys.astype(np.int64)
        o = np.argsort(keys)
        return keys[o], vals[o].astype(np.int64)

    def __init__(self, vocab_hash: np.ndarray, vocab_df: np.ndarray,
                 cooc_key: np.ndarray, cooc_count: np.ndarray, n_docs: int,
                 wfreq_hash: np.ndarray | None = None,
                 wfreq_occ: np.ndarray | None = None,
                 wcooc_key: np.ndarray | None = None,
                 wcooc_count: np.ndarray | None = None,
                 prior_entity: np.ndarray | None = None,
                 prior_conc_e4: np.ndarray | None = None):
        e = np.empty(0, dtype=np.int64)
        self.vocab_hash, self.vocab_df = self._sorted_i64(vocab_hash, vocab_df)
        self.cooc_key, self.cooc_count = self._sorted_i64(cooc_key, cooc_count)
        self.wfreq_hash, self.wfreq_occ = self._sorted_i64(
            wfreq_hash if wfreq_hash is not None else e,
            wfreq_occ if wfreq_occ is not None else e)
        self.wcooc_key, self.wcooc_count = self._sorted_i64(
            wcooc_key if wcooc_key is not None else e,
            wcooc_count if wcooc_count is not None else e)
        self.prior_entity, self.prior_conc_e4 = self._sorted_i64(
            prior_entity if prior_entity is not None else e,
            prior_conc_e4 if prior_conc_e4 is not None else e)
        self.total_occ = int(self.wfreq_occ.sum()) if len(self.wfreq_occ) else 0
        self.n_docs = int(n_docs)

    @staticmethod
    def from_tables(vocab: pa.Table, cooc: pa.Table, n_docs: int,
                    wfreq: pa.Table | None = None,
                    wcooc: pa.Table | None = None,
                    prior: pa.Table | None = None) -> "BroadcastStats":
        def _has(t, col):        # empty to_pandas round-trips drop schema
            return t is not None and col in t.column_names

        wfreq = wfreq if _has(wfreq, "token_hash") else None
        wcooc = wcooc if _has(wcooc, "pair") else None
        prior = prior if _has(prior, "entity") else None
        return BroadcastStats(
            np.asarray(vocab["token_hash"]), np.asarray(vocab["df"]),
            np.asarray(cooc["pair"]), np.asarray(cooc["count"]), n_docs,
            np.asarray(wfreq["token_hash"]) if wfreq is not None else None,
            np.asarray(wfreq["occ"]) if wfreq is not None else None,
            np.asarray(wcooc["pair"]) if wcooc is not None else None,
            np.asarray(wcooc["count"]) if wcooc is not None else None,
            np.asarray(prior["entity"]) if prior is not None else None,
            np.asarray(prior["conc_e4"]) if prior is not None else None,
        )


def _padded_tokens(col) -> tuple[np.ndarray, np.ndarray]:
    """Arrow list<uint32> column → sentinel-padded (B, W) uint64 matrix +
    per-row lengths (vectorized flat gather; no Python loop)."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    offsets = np.asarray(arr.offsets).astype(np.int64)
    offsets = offsets - offsets[0]      # sliced arrays may not start at 0
    flat = np.asarray(arr.flatten()).astype(np.uint64, copy=False)
    lens = np.diff(offsets)
    n = len(lens)
    width = max(1, int(lens.max(initial=1)))
    mat = np.full((n, width), _SENTINEL, dtype=np.uint64)
    total = int(lens.sum())
    rows = np.repeat(np.arange(n), lens)
    pos = np.cumsum(np.r_[0, lens[:-1]])
    cols = np.arange(total) - np.repeat(pos, lens)
    mat[rows, cols] = flat
    return mat, lens


def attach_features(pairs: ray.data.Dataset, features: ray.data.Dataset,
                    num_buckets: int = 64) -> ray.data.Dataset:
    """Skinny pair rows ⋈ per-conv features, twice (side a, side b), via
    bucketed co-group hash joins on the conv id.  A conv id absent from
    the features table drops its pairs (inner join) instead of silently
    scoring against a neighbor's features."""
    from ..functions.grouping import hash_join

    feats = features.select_columns(["conv_id", "jw_text", "tokens"])
    fa = feats.rename_columns({"conv_id": "conv_a", "jw_text": "jw_a",
                               "tokens": "tokens_a"})
    fb = feats.rename_columns({"conv_id": "conv_b", "jw_text": "jw_b",
                               "tokens": "tokens_b"})
    # pair_key is derivable from (conv_a, conv_b): drop it before the two
    # exchanges and let the scorer re-emit it (~35 B/row × 2 sorts saved)
    skinny = pairs.select_columns(
        [c for c in pairs.schema().names if c != "pair_key"])
    with_a = hash_join(skinny, fa, "conv_a", num_buckets)
    return hash_join(with_a, fb, "conv_b", num_buckets)


_FEATURE_COLS = ("jw_a", "jw_b", "tokens_a", "tokens_b")


class PairScorer:
    def __init__(self, stats_ref, cfg: PipelineConfig | None = None):
        self.cfg = cfg or PipelineConfig()
        self.w: ScorerWeights = self.cfg.weights
        self.stats: BroadcastStats = (
            ray.get(stats_ref) if isinstance(stats_ref, ray.ObjectRef) else stats_ref
        )

    def _pboh_and_jac(self, A, la, B, lb) -> tuple[np.ndarray, np.ndarray]:
        w, st, cfg = self.w, self.stats, self.cfg
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

        # mention-prior concentration blend (north_star's p(e|m) term):
        # an entity reached by one dominant surface form carries full
        # salience; one smeared over many variants is discounted toward
        # prior_kappa (reference rho's log p̂(e|m), ScorerFull.scala:189-193)
        if len(st.prior_entity):
            conc = sorted_lookup(tv.astype(np.int64), st.prior_entity,
                                 st.prior_conc_e4, default=10000) / 10000.0
            tidf = tidf * (w.prior_kappa + (1.0 - w.prior_kappa) * conc)

        counts = np.bincount(trow, minlength=n)          # l per row
        rho_norm = np.zeros(n)
        nz = counts > 0
        rho_norm[nz] = (np.bincount(trow, weights=tidf, minlength=n)[nz]
                        / counts[nz]) / log_n

        # window-context occurrence stats (reference rho's p(w|e) sum,
        # ScorerFull.scala:189-193 over EntityWordsProbs windows)
        has_ctx = st.total_occ > 0
        if has_ctx:
            tocc = sorted_lookup(tv.astype(np.int64), st.wfreq_hash,
                                 st.wfreq_occ, default=1).astype(np.float64)
            log_occ = np.log(max(2, st.total_occ))

        # pairwise NPMI over each row's top tokens: flat segment triu.
        # the reference's 2/(l-1) max-product normalization times 1/l over
        # the l(l-1)/2 pair terms is exactly the pair MEAN — keeping the
        # aggregate in [-1, 1] independent of l and of corpus size
        lam_sum = np.zeros(n)
        ctx_sum = np.zeros(n)
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
            npair = len(ia)
            lam_sum[rsel] = per_row * (2.0 / (l - 1)) / l
            if has_ctx:
                # symmetrized log(δ·p̂(w|e)/p̂(w) + ξ): p̂(w|e) from the
                # windowed co-counts, p̂(w) from stream occurrences
                wc = sorted_lookup(keys, st.wcooc_key, st.wcooc_count,
                                   default=0).astype(np.float64)
                oi = np.maximum(tocc[pi], 1.0)
                oj = np.maximum(tocc[pj], 1.0)
                pw_i = tocc[pi] / st.total_occ
                pw_j = tocc[pj] / st.total_occ
                ctx = 0.5 * (
                    np.log(w.delta_w_e * (wc / oi) / np.maximum(pw_j, 1e-12)
                           + w.xi)
                    + np.log(w.delta_w_e * (wc / oj) / np.maximum(pw_i, 1e-12)
                             + w.xi))
                ctx_sum[rsel] = (ctx.reshape(len(rsel), -1).sum(axis=1)
                                 / npair) / log_occ

        lam_norm = np.clip(lam_sum, 0.0, 1.0)
        lam_norm[counts < 2] = 0.0
        ctx_norm = np.clip(ctx_sum, 0.0, 1.0)
        ctx_norm[counts < 2] = 0.0
        pboh = np.clip(w.f * rho_norm + w.g * lam_norm + w.b * ctx_norm,
                       0.0, 1.0)
        pboh[counts == 0] = 0.0
        return pboh, jac

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        n = batch.num_rows
        if n == 0:
            out = batch.drop_columns(list(_FEATURE_COLS))
            out = out.append_column("pair_key",
                                    pa.array([], type=pa.string()))
            for c in ("jw", "jaccard", "pboh", "score"):
                out = out.append_column(c, pa.array([], type=pa.float64()))
            return out.append_column("is_match", pa.array([], type=pa.bool_()))

        w = self.w
        jw = jaro_winkler_batch(batch["jw_a"].to_pylist(),
                                batch["jw_b"].to_pylist())
        A, la = _padded_tokens(batch["tokens_a"])
        B, lb = _padded_tokens(batch["tokens_b"])
        pboh, jac = self._pboh_and_jac(A, la, B, lb)

        score = (w.w_jw * jw + w.w_jac * jac + pboh) / (w.w_jw + w.w_jac + 1.0)
        out = batch.drop_columns(list(_FEATURE_COLS))
        # recompute the pair key dropped before the attach exchanges
        out = out.append_column(
            "pair_key",
            pc.binary_join_element_wise(
                pc.cast(batch["conv_a"], pa.string()),
                pc.cast(batch["conv_b"], pa.string()), "\x1f"))
        out = out.append_column("jw", pa.array(jw, type=pa.float64()))
        out = out.append_column("jaccard", pa.array(jac, type=pa.float64()))
        out = out.append_column("pboh", pa.array(pboh, type=pa.float64()))
        out = out.append_column("score", pa.array(score, type=pa.float64()))
        out = out.append_column(
            "is_match", pa.array(score >= w.match_threshold, type=pa.bool_())
        )
        return out


_SCORER_CACHE: dict[str, PairScorer] = {}


def _scorer_for(stats_ref, cfg: PipelineConfig) -> PairScorer:
    """Once-per-worker-process scorer — the exact analog of the
    reference's singleton-per-JVM index objects
    (RunLoopyAgainstAllGoogleClweb.scala:31-42): the broadcast stats are
    ray.get()'d once per process (zero-copy numpy views into the shared
    object store) and reused by every task that lands on the worker."""
    key = (stats_ref.hex() if isinstance(stats_ref, ray.ObjectRef)
           else str(id(stats_ref)))
    sc = _SCORER_CACHE.get(key)
    if sc is None:
        sc = PairScorer(stats_ref, cfg)
        _SCORER_CACHE.clear()   # one stats table per pipeline run
        _SCORER_CACHE[key] = sc
    return sc


def score_pairs(pairs_with_features: ray.data.Dataset, stats: BroadcastStats,
                cfg: PipelineConfig | None = None) -> ray.data.Dataset:
    """Scoring runs as an elastic task pool (plain function): Ray's actor
    pool autoscaler ramps too slowly for a stage this short, while tasks
    scale to every free CPU instantly; per-process scorer state (broadcast
    stats) is preserved via the _scorer_for singleton.  Input must carry
    the ``attach_features`` columns (jw_a/jw_b/tokens_a/tokens_b)."""
    cfg = cfg or PipelineConfig()
    stats_ref = stats if isinstance(stats, ray.ObjectRef) else ray.put(stats)

    def score_batch(batch: pa.Table) -> pa.Table:
        return _scorer_for(stats_ref, cfg)(batch)

    return pairs_with_features.map_batches(
        score_batch,
        batch_format="pyarrow",
        batch_size=cfg.scorer_batch_size,
    )
