"""Sum-product loopy belief propagation as a pluggable scorer.

The reference ships BOTH inference modes over its per-document factor
graph — max-product (loopybeliefpropagation/LoopyBeliefPropagation.scala
:23-163) and sum-product (:166-270, the ``solveSumProd`` loop: log-space
messages with the logsumexp trick, per-message normalization, ≤15
iterations, EPS=1e-5 convergence on the score delta) — selected by the
CLI's ``max-product|sum-product`` argument (el/EL_LBP_Spark.scala:102-
127).  The recast's default scorer replaces LBP with the max-product
closed form (stages/scoring.py:PairScorer, per north_star); this module
restores the sum-product mode as a registered ``SCORERS['lbp']`` option
so the reference's LBP-vs-ARGMAX differential can run on the recast
(eval/EvalOnDatasets.scala:192-195 pattern; see
``link_scorer_lbp_differential``).

Recast factor graph (the pair is the "document"): variables are the
pair's top-k shared tokens (the recast's mention analog), binary state
(the token evidences the link / is noise); unary log-potential
``f·rho_t`` (salience), pairwise log-potential ``g'·lambda_tt'`` (NPMI
co-occurrence) on state (1,1).  Sum-product messages run vectorized
over every pair of the batch simultaneously — arrays of shape
(pairs, l, l, 2), the same ≤15-iteration / EPS=1e-5 / normalized
log-message schedule as the reference — and the resulting marginal
beliefs b_t soft-weight the rho and lambda aggregates: a token set
whose co-occurrence graph is incoherent down-weights itself, while a
coherent one reproduces the closed form's uniform means.  The graph is
complete over ≤ ``top_shared_tokens`` variables, so per-pair cost is
bounded exactly like the reference's per-document cost is bounded by
its candidate cap (MentEntsFreqIndexWrapper.scala:53-55).
"""

from __future__ import annotations

import numpy as np

from ..config import PipelineConfig
from ..functions.hashing import pack_pairs_np
from ..functions.logodds import npmi_pairwise, rho_idf
from .scoring import PairScorer, register_scorer

LBP_ITERS = 30       # sweep budget.  The reference runs ≤15 SEQUENTIAL
                     # message updates (VerifyEDLBPForListOfWords.scala:35
                     # passes 15); this recast updates every message in
                     # parallel (flooding schedule — the vectorizable
                     # form), which on frustrated graphs (mixed-sign
                     # NPMI couplings) oscillates unless damped.  Damped
                     # parallel sweeps propagate information ~half as
                     # fast as a sequential pass, so 30 damped parallel
                     # sweeps ≈ the reference's 15 sequential ones
                     # (measured on the golden fixture: avg ~14 sweeps
                     # to convergence, all pairs < 30).
LBP_EPS = 1e-5       # reference: EPS of computeDelta convergence
LBP_DAMP = 0.3       # message damping m ← damp·m_old + (1−damp)·m_new;
                     # 0 restores the undamped flooding schedule


def _sum_product_beliefs(theta: np.ndarray, lam: np.ndarray,
                         mask: np.ndarray,
                         iters: int = LBP_ITERS,
                         eps: float = LBP_EPS,
                         damp: float = LBP_DAMP):
    """Vectorized sum-product LBP on a batch of binary pairwise MRFs.

    theta: (R, L) unary log-potential of state 1 (state 0 = 0)
    lam:   (R, L, L) symmetric pairwise log-potential of state (1,1)
           (all other state combinations = 0)
    mask:  (R, L) True where the variable exists (rows may have fewer
           than L live tokens)

    Returns ``(beliefs, iters_used, converged)``: beliefs (R, L) —
    marginal probability of state 1 per variable; iters_used (R,) int64
    — the sweep at which each row's belief delta first dropped below
    eps (``iters`` if it never did); converged (R,) bool.  The per-row
    telemetry feeds the reference's convergence report
    (LBPTimeConvergence.scala:7, eval/GlobalStats.scala:200-209).
    Log-space messages, normalized per message (the reference
    normalizes each message's exponentials to sum 1), ≤iters sweeps.

    Convergence is PER ROW, like the reference's per-document loop:
    once a row's belief delta drops below eps its beliefs freeze and
    the row leaves the active set (compacted out of the message
    arrays), so the batch's sweep cost shrinks as the easy graphs
    finish — measured ~2× on the flagship pair mix, where most rows
    converge by sweep 8-10 and only a frustrated tail runs long."""
    R, L = theta.shape
    out = np.zeros((R, L))
    conv_at = np.full(R, -1, dtype=np.int64)   # sweep of first delta<eps
    dead_all = ~mask

    act = np.arange(R, dtype=np.int64)         # active row ids
    # messages m[r, i, j, s]: from variable i to variable j about state s
    m = np.zeros((R, L, L, 2))
    theta_a, lam_a, dead_a = theta, lam, dead_all
    prev_b = None
    eye = np.eye(L, dtype=bool)
    for _it in range(iters):
        if len(act) == 0 or L == 0:
            break
        # incoming sums per receiver i: Σ_k m[k, i, s] (k ≠ j excluded
        # below by subtracting the reverse message)
        inc = m.sum(axis=1)                       # (A, L, 2)
        # h[r, i, j, s] = theta_i·s + Σ_{k≠j} m[k→i](s)
        h = inc[:, :, None, :] - np.transpose(m, (0, 2, 1, 3))
        h = h + np.stack([np.zeros_like(theta_a), theta_a],
                         axis=-1)[:, :, None, :]
        # new message from i to j about state s_j:
        #   logsumexp over s_i of [ h(i, s_i) + lam_ij·(s_i & s_j) ]
        a0 = h[..., 0]                            # s_i = 0 contribution
        a1 = h[..., 1]
        new0 = np.logaddexp(a0, a1)               # s_j = 0: no coupling
        new1 = np.logaddexp(a0, a1 + lam_a)       # s_j = 1: (1,1) coupled
        new = np.stack([new0, new1], axis=-1)     # (A, L, L, 2)
        # per-message normalization (sum of exponentials = 1)
        new = new - np.logaddexp(new[..., 0], new[..., 1])[..., None]
        # dead senders and self-messages contribute nothing
        new[dead_a[:, :, None].repeat(L, axis=2)] = 0.0
        new[:, eye] = 0.0
        # damped parallel update (see LBP_DAMP) — dead/self entries are
        # zero on both sides so the blend preserves them
        m = damp * m + (1.0 - damp) * new
        # beliefs for convergence check
        inc = m.sum(axis=1)
        b1 = theta_a + inc[..., 1] - inc[..., 0]
        b = 1.0 / (1.0 + np.exp(-np.clip(b1, -50, 50)))
        if prev_b is not None:
            row_delta = np.max(np.abs(b - prev_b), axis=1)
            done = row_delta < eps
            if done.any():
                ids = act[done]
                conv_at[ids] = _it + 1
                out[ids] = b[done]                # freeze at convergence
                keep = ~done
                act = act[keep]
                m = m[keep]
                theta_a, lam_a = theta_a[keep], lam_a[keep]
                dead_a = dead_a[keep]
                b = b[keep]
        prev_b = b
    if len(act):                                   # budget exhausted
        out[act] = prev_b if prev_b is not None else 0.0
    out[dead_all] = 0.0
    converged = conv_at >= 0
    iters_used = np.where(converged, conv_at, iters).astype(np.int64)
    return out, iters_used, converged


class SumProductLBPScorer(PairScorer):
    """``SCORERS['lbp']``: PairScorer with the pairwise aggregate
    computed from sum-product beliefs instead of the closed-form
    uniform means (see module docstring)."""

    pboh_weight: float = 1.0
    _telem: tuple | None = None   # (iters, converged, live_tokens) per pair

    def _pboh_and_jac(self, A, la, B, lb):
        w, st, cfg = self.w, self.stats, self.cfg
        n = len(la)
        log_n = np.log(max(2, st.n_docs))

        S, dup, jac = self._shared_and_jac(A, la, B, lb)
        rows = np.nonzero(dup)[0]
        sv = S[:, 1:][dup]
        if len(sv) == 0:
            # no token graph anywhere in the batch: trivially converged
            self._telem = (np.zeros(n, dtype=np.int64),
                           np.ones(n, dtype=bool),
                           np.zeros(n, dtype=np.int64))
            return np.zeros(n), jac

        df = st.vocab.get(sv.astype(np.int64), default=1)
        idf = rho_idf(df, st.n_docs)
        # same top-k most-salient selection as the closed form
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
        if len(st.prior):
            conc = st.prior.get(tv.astype(np.int64), default=10000) / 10000.0
            tidf = tidf * (w.prior_kappa + (1.0 - w.prior_kappa) * conc)

        counts = np.bincount(trow, minlength=n)
        L = int(counts.max())
        live = np.flatnonzero(counts > 0)
        R = len(live)
        row_of = np.full(n, -1, dtype=np.int64)
        row_of[live] = np.arange(R)

        # dense (R, L) token grid: position within row via rank
        rr = row_of[trow]
        cc = rank[keep].astype(np.int64)
        mask = np.zeros((R, L), dtype=bool)
        mask[rr, cc] = True
        rho_grid = np.zeros((R, L))
        rho_grid[rr, cc] = tidf / log_n
        tok_grid = np.zeros((R, L), dtype=np.uint64)
        tok_grid[rr, cc] = tv
        df_grid = np.ones((R, L))
        df_grid[rr, cc] = tdf

        # pairwise NPMI grid (R, L, L), symmetric, zero on dead/self
        ii, jj = np.triu_indices(L, k=1)
        ti = tok_grid[:, ii].ravel()
        tj = tok_grid[:, jj].ravel()
        pvalid = (mask[:, ii] & mask[:, jj]).ravel()
        lam_flat = np.zeros(R * len(ii))
        if pvalid.any():
            keys = pack_pairs_np(ti[pvalid], tj[pvalid]).view(np.int64)
            cocit = st.cooc.get(keys, default=0)
            lam_flat[pvalid] = npmi_pairwise(
                cocit, df_grid[:, ii].ravel()[pvalid],
                df_grid[:, jj].ravel()[pvalid], st.n_docs, w)
        lam = np.zeros((R, L, L))
        lam[:, ii, jj] = lam_flat.reshape(R, len(ii))
        lam = lam + np.transpose(lam, (0, 2, 1))

        # sum-product marginals; couple with g-weighted lambda and
        # f-weighted rho as log-potentials
        beliefs, iters_used, converged = _sum_product_beliefs(
            w.f * rho_grid, w.g * lam, mask)
        # per-pair convergence telemetry (reference LBPTimeConvergence /
        # GlobalStats.scala:200-209): pairs without a live grid ran no
        # message passing — 0 sweeps, trivially converged
        t_it = np.zeros(n, dtype=np.int64)
        t_it[live] = iters_used
        t_cv = np.ones(n, dtype=bool)
        t_cv[live] = converged
        self._telem = (t_it, t_cv, counts.astype(np.int64))

        # belief-weighted aggregates (uniform beliefs ≡ the closed form)
        bsum = beliefs.sum(axis=1)
        rho_agg = np.zeros(R)
        nzb = bsum > 1e-12
        rho_agg[nzb] = (beliefs * rho_grid).sum(axis=1)[nzb] / bsum[nzb]
        wpair = beliefs[:, ii] * beliefs[:, jj] * \
            (mask[:, ii] & mask[:, jj])
        wsum = wpair.sum(axis=1)
        lam_agg = np.zeros(R)
        nzw = wsum > 1e-12
        lam_agg[nzw] = (wpair * lam[:, ii, jj]).sum(axis=1)[nzw] / wsum[nzw]

        rho_norm = np.zeros(n)
        rho_norm[live] = rho_agg
        lam_norm = np.zeros(n)
        lam_norm[live] = np.clip(lam_agg, 0.0, 1.0)
        lam_norm[counts < 2] = 0.0

        # window-context term: the closed form's mean formula, unchanged
        # (beliefs gate the token graph, not the context statistics)
        ctx_norm = np.zeros(n)
        if st.total_occ > 0 and pvalid.any():
            tocc = np.ones((R, L))
            tocc[rr, cc] = st.wfreq.get(tv.astype(np.int64),
                                        default=1).astype(np.float64)
            log_occ = np.log(max(2, st.total_occ))
            keys = pack_pairs_np(ti[pvalid], tj[pvalid]).view(np.int64)
            wc = st.wcooc.get(keys, default=0).astype(np.float64)
            oi = np.maximum(tocc[:, ii].ravel()[pvalid], 1.0)
            oj = np.maximum(tocc[:, jj].ravel()[pvalid], 1.0)
            pw_i = tocc[:, ii].ravel()[pvalid] / st.total_occ
            pw_j = tocc[:, jj].ravel()[pvalid] / st.total_occ
            ctx = 0.5 * (np.log(w.delta_w_e * (wc / oi)
                                / np.maximum(pw_j, 1e-12) + w.xi)
                         + np.log(w.delta_w_e * (wc / oj)
                                  / np.maximum(pw_i, 1e-12) + w.xi))
            ctx_flat = np.zeros(R * len(ii))
            ctx_flat[pvalid] = ctx
            npair = pvalid.reshape(R, len(ii)).sum(axis=1)
            ctx_row = ctx_flat.reshape(R, len(ii)).sum(axis=1)
            nzp = npair > 0
            ctx_agg = np.zeros(R)
            ctx_agg[nzp] = (ctx_row[nzp] / npair[nzp]) / log_occ
            ctx_norm[live] = np.clip(ctx_agg, 0.0, 1.0)
        ctx_norm[counts < 2] = 0.0

        pboh = np.clip(w.f * rho_norm + w.g * lam_norm + w.b * ctx_norm,
                       0.0, 1.0)
        pboh[counts == 0] = 0.0
        return pboh, jac


    def __call__(self, batch):
        import pyarrow as pa

        self._telem = None
        out = super().__call__(batch)
        n = out.num_rows
        it, cv, lt = self._telem if self._telem is not None else (
            np.zeros(n, dtype=np.int64), np.ones(n, dtype=bool),
            np.zeros(n, dtype=np.int64))
        out = out.append_column("lbp_iters", pa.array(it, type=pa.int64()))
        out = out.append_column("lbp_converged",
                                pa.array(cv, type=pa.bool_()))
        out = out.append_column("lbp_live_tokens",
                                pa.array(lt, type=pa.int64()))
        return out


register_scorer("lbp", SumProductLBPScorer)
