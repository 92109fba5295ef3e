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

import numpy as np
import pyarrow as pa
import ray.data

from ..config import PipelineConfig
from ..stages.blocking import add_block_keys, dedup_pairs, make_pairs
from ..stages.canonicalize import canonicalize
from ..stages.clustering import cluster_matches
from ..stages.featurize import featurize
from ..stages.scoring import BroadcastStats, attach_features, score_pairs
from ..stages.stats import (
    build_cooc,
    build_entity_prior,
    build_mention_prior,
    build_vocab,
    build_wcooc,
    build_wfreq,
)
from ..state.checkpoint import StageRunner


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
    def __init__(self, conv_docs, features, vocab, cooc, pairs, scored,
                 matches, clusters, n_convs):
        self.conv_docs = conv_docs
        self.features = features
        self.vocab = vocab
        self.cooc = cooc
        self.pairs = pairs
        self.scored = scored
        self.matches = matches
        self.clusters = clusters
        self.n_convs = n_convs


def run_linkage(
    turns: ray.data.Dataset,
    cfg: PipelineConfig | None = None,
    checkpoint_root: str | None = None,
) -> LinkageResult:
    cfg = cfg or PipelineConfig()
    runner = StageRunner(checkpoint_root)

    conv_docs = runner.run("conv_docs", lambda: canonicalize(turns))
    features = runner.run("features", lambda: featurize(conv_docs, cfg))
    if not runner.root:
        # several consumers (vocab, cooc, blocking, count) share this
        # lineage; without Parquet checkpoints, pin the per-conv tables in
        # the object store so canonicalize/featurize run exactly once.
        # (With a checkpoint root the Parquet read-back serves this role —
        # that is the 100 TB path; materialize() is only for small runs.)
        conv_docs = conv_docs.materialize()
        features = features.materialize()

    vocab = runner.run("vocab", lambda: build_vocab(features))
    cooc = runner.run("cooc", lambda: build_cooc(features, cfg))
    wfreq = runner.run("wfreq", lambda: build_wfreq(features))
    wcooc = runner.run("wcooc", lambda: build_wcooc(features, cfg))
    prior = runner.run(
        "entity_prior",
        lambda: build_entity_prior(build_mention_prior(conv_docs)))

    # stats are the small side: PRUNE in the dataset, then collect the
    # residue driver-side and broadcast.  df==1 tokens can never be shared
    # by a pair (one conv holds them) and the scorer's missing-token
    # default IS df=1, so the vocab filter is exact; cooc pairs below the
    # count floor collapse to the scorer's missing-pair default of 0 —
    # at 100 TB these filters are what keep the broadcast bounded
    # (reference analog: the min-word-count-20 floor of
    # context/WordFreqPerCorpus.scala:38 and the freq>=3 load filter of
    # index/WordEntityProbsIndex.scala:104).
    def _collect(ds) -> pa.Table:
        return pa.Table.from_pandas(ds.to_pandas(), preserve_index=False)

    vocab_tbl = _collect(vocab.filter(expr="df >= 2"))
    cooc_tbl = _collect(cooc.filter(expr=f"count >= {cfg.cooc_min_count}"))
    wfreq_tbl = _collect(wfreq.filter(expr="occ >= 2"))
    wcooc_tbl = _collect(wcooc.filter(expr=f"count >= {cfg.cooc_min_count}"))
    # conc_e4 == 10000 is the scorer's missing-entity default → drop
    prior_tbl = _collect(prior.filter(expr="conc_e4 < 10000"))
    n_convs = features.count()
    stats = BroadcastStats.from_tables(vocab_tbl, cooc_tbl, n_convs,
                                       wfreq_tbl, wcooc_tbl, prior_tbl)

    blocked = add_block_keys(features, cfg)
    # skinny pair rows: dedup is a cheap bucketed keep-first
    pairs_raw = make_pairs(blocked, cfg)
    pairs = runner.run("pairs", lambda: dedup_pairs(pairs_raw))
    if runner.root:
        # salting accounting (north_rule: no silent drops): exact count of
        # non-emitted pairs, summed from the raw first-row markers
        from ..stages.blocking import capped_total
        runner.add_metrics("pairs", {"capped_pairs_total": capped_total(pairs_raw)})
    # features re-attach via bucketed co-group joins (no driver-side store)
    enriched = attach_features(pairs, features)
    scored = runner.run("scored", lambda: score_pairs(enriched, stats, cfg))
    if runner.root:
        runner.add_metrics("scored", {"score_histogram": score_histogram(scored)})
    else:
        scored = scored.materialize()  # consumed by both matches and callers

    matches = scored.filter(expr="is_match")
    clusters = runner.run(
        "clusters",
        lambda: cluster_matches(
            matches.select_columns(["conv_a", "conv_b"]),
            features.select_columns(["conv_id"]),
        ).sort("conv_id"),
    )
    return LinkageResult(conv_docs, features, vocab, cooc, pairs, scored,
                         matches, clusters, n_convs)
