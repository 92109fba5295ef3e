"""Pair scoring: candidate pair rows → scored matches.

THE canonical stateful actor-pool stage (SURVEY.md §2.4 A1): each actor
loads the broadcast statistics tables once in ``__init__`` — the direct
descendant of the reference's singleton-per-JVM ``AllIndexesBox`` pattern
(reference: src/main/scala/index/AllIndexesBox.scala:5-76; rationale
comment eval/cweb/RunLoopyAgainstAllGoogleClweb.scala:31-42) — and scores
Arrow batches of pairs with vectorized kernels.

Score = convex mix of
  * Jaro-Winkler on capped canonical text,
  * bottom-k token Jaccard,
  * a squashed PBoH term  f·rho_norm + g·(2/(l-1))·Σ lambda  — the
    loopy-BP-free max-product closed form of the reference's message score
    (reference: loopybeliefpropagation/ScorerFull.scala:231-261, incl. the
    2/(l-1) pairwise normalization at :246), with l = number of shared
    salient tokens.
Stats enter via ``ray.put`` object refs resolved once per actor — broadcast
once per node, never re-shipped per batch.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from ..config import PipelineConfig, ScorerWeights
from ..functions.logodds import lambda_pairwise, rho_idf, sorted_lookup
from ..functions.hashing import pack_pairs_np
from ..functions.similarity import jaro_winkler
from ..functions.minhash import bottom_k_jaccard


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


class PairScorer:
    def __init__(self, stats_ref, cfg: PipelineConfig | None = None):
        self.cfg = cfg or PipelineConfig()
        self.w: ScorerWeights = self.cfg.weights
        self.stats: BroadcastStats = (
            ray.get(stats_ref) if isinstance(stats_ref, ray.ObjectRef) else stats_ref
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            empty = pa.array([], type=pa.float64())
            out = batch
            for c in ("jw", "jaccard", "pboh", "score"):
                out = out.append_column(c, empty)
            return out.append_column("is_match", pa.array([], type=pa.bool_()))

        w, st, cfg = self.w, self.stats, self.cfg
        jw_a = batch["jw_a"].to_pylist()
        jw_b = batch["jw_b"].to_pylist()
        toks_a = batch["tokens_a"].to_pylist()
        toks_b = batch["tokens_b"].to_pylist()

        jw = np.array([jaro_winkler(a, b) for a, b in zip(jw_a, jw_b)])
        jac = np.empty(n)
        pboh = np.empty(n)
        log_n = np.log(max(2, st.n_docs))
        cap = cfg.max_tokens_per_conv
        for i in range(n):
            a = np.asarray(toks_a[i], dtype=np.uint64)
            b = np.asarray(toks_b[i], dtype=np.uint64)
            jac[i] = bottom_k_jaccard(a, b, cap)
            shared = np.intersect1d(a, b, assume_unique=True)
            if len(shared) == 0:
                pboh[i] = 0.0
                continue
            df = sorted_lookup(shared.view(np.int64), st.vocab_hash,
                               st.vocab_df, default=1)
            idf = rho_idf(df, st.n_docs)
            order = np.argsort(-idf)
            top = shared[order][: cfg.top_shared_tokens]
            top_df = df[order][: cfg.top_shared_tokens]
            rho_norm = float(np.mean(idf[order][: cfg.top_shared_tokens])) / log_n

            lam_norm = 0.0
            l = len(top)
            if l >= 2:
                ia, ib = np.triu_indices(l, k=1)
                keys = pack_pairs_np(top[ia], top[ib]).view(np.int64)
                cocit = sorted_lookup(keys, st.cooc_key, st.cooc_count, default=0)
                lam = lambda_pairwise(cocit, top_df[ia], top_df[ib], st.n_docs, w)
                # max-product closed form: pairwise sum normalized by 2/(l-1),
                # then per-token average and floor-normalized to [0, 1]
                lam_sum = float(np.sum(lam)) * (2.0 / (l - 1)) / l
                lam_norm = (lam_sum - w.lambda_floor) / (log_n - w.lambda_floor)
                lam_norm = float(np.clip(lam_norm, 0.0, 1.0))
            pboh[i] = float(np.clip(w.f * rho_norm + w.g * lam_norm, 0.0, 1.0))

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
