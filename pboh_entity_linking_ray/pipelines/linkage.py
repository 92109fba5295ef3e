"""The flagship end-to-end linkage pipeline.

read turns → canonicalize → featurize → stats (vocab, cooc) → block →
pair-gen (salted) → dedup → score (actor pool) → cluster → eval.

Every ``→`` is an optional Parquet checkpoint with a lineage manifest
(state/checkpoint.py); passing ``checkpoint_root=None`` keeps the whole
thing one lazy streaming plan.  Structural ancestor: the reference's
distributed ClueWeb path (read → key-by-doc → shuffle-group → stateful
scoring with broadcast indexes → metric reduce, reference:
src/main/scala/eval/cweb/RunLoopyAgainstAllGoogleClweb.scala:221-275).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import ray
import ray.data

from ..config import PipelineConfig
from ..stages.blocking import add_block_keys, dedup_pairs, make_pairs
from ..stages.canonicalize import canonicalize
from ..stages.clustering import cluster_matches
from ..stages.featurize import featurize
from ..stages.scoring import BroadcastStats, attach_and_score
from ..stages.stats import (
    build_entity_prior_from_docs,
    build_pair_stats,
    build_token_stats,
)
from ..state.checkpoint import StageRunner


def _concat_ds(ds: ray.data.Dataset) -> pa.Table:
    """Driver-side collect of a small Dataset as ONE Arrow table —
    straight block concat (combine_chunks for dense numpy views), no
    pandas round-trip (`to_pandas` on a 2M-row table measured 3-4x the
    cost of the concat it wraps)."""
    all_blocks = ray.get(ds.to_arrow_refs())
    blocks = [b for b in all_blocks if b.num_rows] or all_blocks[:1]
    return pa.concat_tables(blocks, promote_options="default").combine_chunks()


def score_histogram(scored: ray.data.Dataset, bins: int = 20) -> list[int]:
    """Histogram of pair scores (manifest metric; analog of the reference's
    candidate-rank histograms, eval/cweb/GlobalCountersCWEB.scala:102-134)."""
    from ray.data.aggregate import Sum

    edges = np.linspace(0.0, 1.0, bins + 1)

    def h(t: pa.Table) -> pa.Table:
        counts, _ = np.histogram(np.asarray(t["score"]), bins=edges)
        return pa.table({f"h{i}": pa.array([int(c)], type=pa.int64())
                         for i, c in enumerate(counts)})

    part = scored.map_batches(h, batch_format="pyarrow")
    agg = part.aggregate(*[Sum(f"h{i}", alias_name=f"h{i}") for i in range(bins)])
    return [int(agg.get(f"h{i}") or 0) for i in range(bins)]


class LinkageResult:
    def __init__(self, conv_docs, features, token_stats, pair_stats,
                 pairs, scored, matches, clusters, n_convs,
                 stats_ref=None):
        self.conv_docs = conv_docs
        self.features = features
        self.token_stats = token_stats
        self.pair_stats = pair_stats
        self.pairs = pairs
        self.scored = scored
        self.matches = matches
        self.clusters = clusters
        self.n_convs = n_convs
        self.stats_ref = stats_ref  # broadcast BroadcastStats object ref
                                    # (re-scoring / differential baselines)


def _phase_logger():
    """Optional stderr phase timing (BENCH_PHASE_LOG=1) — serial-section
    hunting for the scaling protocol; no-op otherwise."""
    if os.environ.get("BENCH_PHASE_LOG") != "1":
        return lambda _name: None
    import sys
    import time

    t0 = time.perf_counter()
    last = [t0]

    def mark(name: str) -> None:
        now = time.perf_counter()
        print(f"[phase] {name}: +{now - last[0]:.2f}s (t={now - t0:.2f}s)",
              file=sys.stderr, flush=True)
        last[0] = now

    return mark


def run_linkage(
    turns: ray.data.Dataset,
    cfg: PipelineConfig | None = None,
    checkpoint_root: str | None = None,
) -> LinkageResult:
    cfg = cfg or PipelineConfig()
    runner = StageRunner(checkpoint_root)
    mark = _phase_logger()

    conv_docs = runner.run("conv_docs", lambda: canonicalize(turns))
    if not runner.root:
        conv_docs = conv_docs.materialize()
    mark("canonicalize")
    # stem dictionary: distinct tokens stemmed once CLUSTER-WIDE and
    # broadcast (~20 B/token); without it every worker re-stems the
    # vocabulary through its own cache, which anti-scales with worker
    # count (featurize measured 2.3× instead of 4× from 4→16 CPUs)
    from ..stages.featurize import build_stem_map

    stem_map = runner.run("stem_map", lambda: build_stem_map(conv_docs, cfg))
    stem_ref = ray.put(_concat_ds(stem_map))
    mark("stem_map")
    features = runner.run("features",
                          lambda: featurize(conv_docs, cfg, stem_ref))
    if not runner.root:
        # several consumers (stats, blocking, count) share this lineage;
        # without Parquet checkpoints, pin the per-conv tables in the
        # object store so canonicalize/featurize run exactly once.
        # (With a checkpoint root the Parquet read-back serves this role —
        # that is the 100 TB path; materialize() is only for small runs.)
        features = features.materialize()
    mark("featurize")
    # size every exchange to the corpus: ~rows_per_bucket keyed rows per
    # bucket (one bucket must fit a worker), power of two — crossing 256
    # engages the hierarchical two-round exchange automatically, so the
    # same pipeline code holds from 20k convs to 100 TB
    from ..functions.grouping import buckets_for

    n_convs = features.count()
    nb = buckets_for(n_convs, cfg.rows_per_bucket)

    # fused stats builds: token-level (vocab df + stream occ) and
    # pair-level (conv cooc + window cooc) each cost ONE pass over
    # features and ONE exchange (stages/stats.py fused partials)
    token_stats = runner.run(
        "token_stats", lambda: build_token_stats(features, num_buckets=nb))
    # emit_min pushes the broadcast floor INTO the aggregating shuffle
    # task: global singleton pairs (~half the key space) are dropped
    # before any downstream pass or checkpoint write
    pair_stats = runner.run(
        "pair_stats",
        lambda: build_pair_stats(features, cfg, emit_min=cfg.cooc_min_count,
                                 num_buckets=nb))
    prior = runner.run(
        "entity_prior",
        lambda: build_entity_prior_from_docs(conv_docs,
                                             cfg.prior_sample_mod))

    # stats are the small side: PRUNE in the dataset, then collect the
    # residue driver-side and broadcast.  df==1 tokens can never be shared
    # by a pair (one conv holds them) and the scorer's missing-token
    # default IS df=1, so the vocab filter is exact; cooc pairs below the
    # count floor collapse to the scorer's missing-pair default of 0 —
    # at 100 TB these filters are what keep the broadcast bounded
    # (reference analog: the min-word-count-20 floor of
    # context/WordFreqPerCorpus.scala:38 and the freq>=3 load filter of
    # index/WordEntityProbsIndex.scala:104).
    _collect = _concat_ds

    def _collect_view(ds, val: str, floor: int, collect) -> pa.Table:
        """pair_stats residue ≥ floor → driver table (pair, count); the
        filter runs distributed so the driver only ever sees the bounded
        broadcast-budget residue."""
        t = collect(ds.filter(expr=f"{val} >= {floor}")
                    .select_columns(["pair", val]))
        return pa.table({"pair": t["pair"], "count": t[val]})

    blocked = add_block_keys(features, cfg)
    pairs_raw = make_pairs(blocked, cfg, num_buckets=nb)
    pairs_lazy = dedup_pairs(pairs_raw, num_buckets=nb)

    # Heavy distributed jobs run ONE AT A TIME with the whole cluster;
    # only the two SMALL stats collects (a few thousand rows each, mostly
    # fan-in latency) overlap the big pair-stats exchange.  Running the
    # pair-generation shuffle concurrently with pair-stats too (the
    # earlier 4-thread block) measured 67 s vs 39 s sequential for the
    # same work at 16 CPUs / 250k convs — four streaming executors
    # interfere (oversubscribed task launches + object-store pressure)
    # instead of parallelizing, and the interference grows with CPU
    # count, which is exactly what the N→4N scaling bar punishes.
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(2) as ex:
        f_tok = ex.submit(
            lambda: _collect(token_stats.filter(expr="df >= 2 or occ >= 2")))
        # conc_e4 == 10000 is the scorer's missing-entity default → drop
        f_prior = ex.submit(
            lambda: _collect(prior.filter(expr="conc_e4 < 10000")))
        # the pair-stats table stays DISTRIBUTED: only the ≥-floor
        # residues are ever collected (below); at bench scale the
        # unfloored table is 23M rows — a driver collect of it was the
        # r1 verdict's "unbounded stats pull" failure mode
        pair_ds = pair_stats if runner.root else pair_stats.materialize()
        tok_tbl = f_tok.result()
        prior_tbl = f_prior.result()
    pairs_mat = None if runner.root else pairs_lazy.materialize()
    mark("stats+pairs")

    def _view(tbl: pa.Table, key: str, val: str, out: str,
              floor: int) -> pa.Table:
        import pyarrow.compute as pc

        t = tbl.filter(pc.greater_equal(tbl[val], floor))
        return pa.table({key: t[key], out: t[val]})

    vocab_tbl = _view(tok_tbl, "token_hash", "df", "df", 2)
    wfreq_tbl = _view(tok_tbl, "token_hash", "occ", "occ", 2)

    # windowed cooc under a broadcast budget: raise the count floor until
    # the table fits (deterministic — whole tie levels kept).  The floor
    # search runs over a DISTRIBUTED histogram of count_win (nonzero bins
    # only — O(distinct counts) rows reach the driver, never O(pairs)).
    # ONE fused scan of the 23M-row pair-stats table yields BOTH the
    # histogram rows and the conv-cooc residue (its floor is known up
    # front); only the wcooc residue needs a second, filtered scan once
    # the floor search finishes — 2 passes total instead of 3.
    _HIST_CAP = 1 << 20
    _min_floor = cfg.cooc_min_count

    def _hist_and_cooc(t: pa.Table) -> pa.Table:
        wc = np.minimum(np.asarray(t["count_win"], dtype=np.int64), _HIST_CAP)
        h = np.bincount(wc)
        nz = np.flatnonzero(h)
        cc = np.asarray(t["count_conv"], dtype=np.int64)
        keep = cc >= _min_floor
        pk = np.asarray(t["pair"], dtype=np.int64)[keep]
        kind = np.concatenate([np.zeros(len(nz), dtype=np.int8),
                               np.ones(len(pk), dtype=np.int8)])
        ks = np.concatenate([nz.astype(np.int64), pk])
        vs = np.concatenate([h[nz].astype(np.int64), cc[keep]])
        return pa.table({"kind": pa.array(kind, type=pa.int8()),
                         "k": pa.array(ks), "v": pa.array(vs)})

    fused = _concat_ds(
        pair_ds.map_batches(_hist_and_cooc, batch_format="pyarrow"))
    kinds = np.asarray(fused["kind"])
    f_k = np.asarray(fused["k"])
    f_v = np.asarray(fused["v"])
    hist_bins, hist_cnts = f_k[kinds == 0], f_v[kinds == 0]
    hist = np.zeros(_HIST_CAP + 1, dtype=np.int64)
    np.add.at(hist, hist_bins, hist_cnts)
    floor = cfg.cooc_min_count
    if hist[floor:].sum() > cfg.wcooc_max_pairs:
        tail = np.cumsum(hist[::-1])[::-1]     # tail[c] = #pairs count>=c
        floor = int(np.searchsorted(-tail, -cfg.wcooc_max_pairs))
        floor = max(floor, cfg.cooc_min_count)
    if len(hist_bins) and int(hist_bins.max()) >= _HIST_CAP \
            and hist[_HIST_CAP] > 0:
        # packed-lane combiner bound (stats.py): counts near 2^31 would
        # carry between lanes — surface loudly rather than corrupt
        import warnings
        warnings.warn("count_win at histogram cap; verify packed-lane "
                      "bound (build_pair_stats) for this corpus")

    cooc_tbl = pa.table({"pair": pa.array(f_k[kinds == 1]),
                         "count": pa.array(f_v[kinds == 1])})
    wcooc_tbl = _collect_view(pair_ds, "count_win", floor, _collect)
    mark("broadcast_prep")
    stats = BroadcastStats.from_tables(vocab_tbl, cooc_tbl, n_convs,
                                       wfreq_tbl, wcooc_tbl, prior_tbl)

    # skinny pair rows: dedup is a cheap bucketed keep-first
    pairs = (pairs_mat if pairs_mat is not None
             else runner.run("pairs", lambda: pairs_lazy))
    if runner.root:
        # salting accounting (north_rule: no silent drops): exact count of
        # non-emitted pairs, summed from the raw first-row markers
        from ..stages.blocking import capped_total
        runner.add_metrics("pairs", {"capped_pairs_total": capped_total(pairs_raw)})
        # missing-evidence accounting (M15 analog — the reference DROPS
        # mentions absent from its index and counts them as recall loss,
        # eval/VerifyEDAbstract.scala:49-85): convs with zero content
        # tokens keep flowing here (sig blocking + Jaro-Winkler still
        # apply) but the count is surfaced the same way.
        n_empty = features.filter(expr="n_tokens <= 0").count()
        runner.add_metrics("features", {"empty_token_convs": n_empty})
    # features re-attach via bucketed co-group joins (no driver-side
    # store), fused with scoring: the second join's bucket task scores
    # its joined rows in place (attach_and_score)
    stats_ref = ray.put(stats)
    scored = runner.run(
        "scored", lambda: attach_and_score(pairs, features, stats_ref, cfg,
                                           num_buckets=nb))
    if runner.root:
        runner.add_metrics("scored", {"score_histogram": score_histogram(scored)})
    else:
        scored = scored.materialize()  # consumed by both matches and callers
    mark("score")

    matches = scored.filter(expr="is_match")
    # within-stage periodic round checkpoints (K4 analog): a crash during
    # the multi-round star contraction resumes from the newest frontier
    # under {root}/cc_rounds instead of round 0
    cc_root = (os.path.join(runner.root, "cc_rounds") if runner.root
               else None)
    clusters = runner.run(
        "clusters",
        lambda: cluster_matches(
            matches.select_columns(["conv_a", "conv_b"]),
            features.select_columns(["conv_id"]),
            iter_checkpoint_root=cc_root,
        ).sort("conv_id"),
    )
    mark("cluster_plan")
    return LinkageResult(conv_docs, features, token_stats, pair_stats,
                         pairs, scored, matches, clusters, n_convs,
                         stats_ref=stats_ref)
