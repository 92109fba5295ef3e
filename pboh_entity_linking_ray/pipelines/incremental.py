"""Incremental record linkage: attach a batch of NEW conversations to an
existing linkage run without rescoring the old corpus.

The production shape every deployed entity-resolution system needs (the
reference is batch-only — it re-runs inference over the full corpus per
dataset, ``eval/EvalOnDatasets.scala``): a nightly/streaming batch of new
transcripts must link against billions of already-clustered ones at a
cost proportional to the NEW data plus the blocks it touches, never the
base corpus's pair space.

Semantics (documented, deliberate):

- **Frozen statistics.** New pairs are scored with the BASE run's
  broadcast stats (token df, co-occurrence, priors) — corpus statistics
  drift slowly, and refreshing them is a base-run rerun by definition.
  Incremental output therefore tracks, not equals, a full rerun; the
  pytest gate pins pairwise agreement on the golden corpus.
- **Old×old pairs are never re-emitted or re-scored.**  New evidence is
  new×new and new×old pairs only.  Two base clusters CAN merge when a
  new conversation bridges them — connected components run over the
  base label edges ∪ new match edges, which is exactly CC on the union
  graph.
- **Deterministic.**  Same base result + same new batch → byte-identical
  clusters (hash blocking, deterministic salting stripes, min-label CC).

Scale shape: the new batch's block keys are collected (O(new × keys),
the small side by assumption) and broadcast; base blocked rows are
semi-probed per batch via ``searchsorted`` so only base rows in TOUCHED
blocks enter the pair exchange.  The base features scan is one streaming
column-pruned pass (at 100 TB, persist ``add_block_keys`` output as a
checkpoint stage and range-prune it instead — see state/clustered.py).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from ..config import PipelineConfig
from ..stages.blocking import add_block_keys, dedup_pairs, \
    make_pairs_incremental
from ..stages.canonicalize import canonicalize
from ..stages.clustering import cluster_matches
from ..stages.featurize import build_stem_map, featurize
from ..stages.scoring import attach_and_score
from .linkage import LinkageResult, _concat_ds


class IncrementalResult:
    def __init__(self, new_features, pairs, scored, matches, clusters,
                 n_new):
        self.new_features = new_features
        self.pairs = pairs
        self.scored = scored
        self.matches = matches
        self.clusters = clusters        # conv_id → cluster_id for ALL convs
        self.n_new = n_new


def _tag(ds: ray.data.Dataset, flag: int) -> ray.data.Dataset:
    def f(t: pa.Table) -> pa.Table:
        return t.append_column(
            "is_new", pa.array(np.full(t.num_rows, flag, dtype=np.int8)))

    return ds.map_batches(f, batch_format="pyarrow")


def run_incremental(base: LinkageResult, new_turns: ray.data.Dataset,
                    cfg: PipelineConfig | None = None,
                    num_buckets: int = 64,
                    checkpoint_root: str | None = None,
                    sort_output: bool = True) -> IncrementalResult:
    """Link ``new_turns`` against ``base`` (a completed ``run_linkage``
    result, in-memory or checkpoint-backed) and return clusters over the
    UNION of conversations.

    ``sort_output=False`` skips the final O(corpus) conv_id sort of the
    assignment table — the right call for consumers that only FILTER it
    (the one-shot ``link_one``); batch folds keep the sorted contract
    (deterministic checkpoint bytes).

    ``checkpoint_root`` extends the flagship resume contract to the
    incremental path: each stage (inc_conv_docs / inc_features /
    inc_pairs / inc_scored / inc_clusters) lands as atomic Parquet +
    lineage manifest via ``StageRunner``, so a killed batch resumes from
    its last completed stage (use a DIFFERENT root per batch)."""
    from ..state.checkpoint import StageRunner

    cfg = cfg or PipelineConfig()
    runner = StageRunner(checkpoint_root)

    new_docs = runner.run("inc_conv_docs", lambda: canonicalize(new_turns))
    if not runner.root:
        new_docs = new_docs.materialize()
    # the stem map is a deterministic per-token function — rebuilding it
    # over the new vocabulary yields identical stems for shared tokens,
    # so frozen-stats scoring stays consistent with the base run
    stem_ref = ray.put(_concat_ds(build_stem_map(new_docs, cfg)))
    new_features = runner.run("inc_features",
                              lambda: featurize(new_docs, cfg, stem_ref))
    if not runner.root:
        new_features = new_features.materialize()
    n_new = new_features.count()

    new_blocked = add_block_keys(new_features, cfg).materialize()
    # broadcast the new batch's key set (the small side by assumption):
    # base rows outside every touched block never enter the exchange
    touched = np.unique(np.asarray(
        _concat_ds(new_blocked.map_batches(
            lambda t: pa.table(
                {"own_key": pa.array(
                    np.unique(np.asarray(t["own_key"], dtype=np.int64)))}),
            batch_format="pyarrow"))["own_key"],
        dtype=np.int64))
    keys_ref = ray.put(touched)

    def probe(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "own_key" not in t.column_names:
            return t
        keys = ray.get(keys_ref)
        if len(keys) == 0:
            return t.slice(0, 0)
        ok = np.asarray(t["own_key"], dtype=np.int64)
        pos = np.searchsorted(keys, ok)
        pos[pos == len(keys)] = 0
        return t.filter(pa.array(keys[pos] == ok))

    old_blocked = add_block_keys(base.features, cfg) \
        .map_batches(probe, batch_format="pyarrow")

    blocked = _tag(old_blocked, 0).union(_tag(new_blocked, 1))
    pairs = runner.run(
        "inc_pairs",
        lambda: dedup_pairs(make_pairs_incremental(blocked, cfg,
                                                   num_buckets),
                            num_buckets))
    if not runner.root:
        # resolve once: the attach consumes pairs twice (skew-defense
        # detection pass + the join itself) and would re-run the whole
        # pair pipeline per consumer when lazy
        pairs = pairs.materialize()

    feats_all = base.features.union(new_features)
    scored = runner.run(
        "inc_scored",
        lambda: attach_and_score(pairs, feats_all, base.stats_ref, cfg,
                                 num_buckets=num_buckets))
    if not runner.root:
        scored = scored.materialize()
    matches = scored.filter(expr="is_match")

    # union graph = base assignments as label edges + new match edges,
    # but an UNTOUCHED base cluster (no member in any new match edge)
    # cannot change labels — its component is disjoint from every new
    # edge and its id is already the component min.  So CC runs over the
    # TOUCHED region only: new convs + members of clusters adjacent to a
    # match; everything else streams through unrelabeled.  Two filters
    # over base.clusters (no shuffle) replace the O(corpus) union CC —
    # this is what makes the one-shot `link_one` call O(touched) end to
    # end on a billion-conversation base.
    import pyarrow.compute as pc

    # distinct OLD endpoints of the match edges (small: O(matches))
    def endpoints(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "conv_a" not in t.column_names:
            return pa.table({"conv_id": pa.array([], type=pa.string())})
        vals = pa.concat_arrays([
            t["conv_a"].combine_chunks().cast(pa.string()),
            t["conv_b"].combine_chunks().cast(pa.string())])
        return pa.table({"conv_id": pc.unique(vals)})

    def _col_set(ds, col) -> set:
        # a fully-empty map output has ZERO columns (CLAUDE.md trap)
        t = _concat_ds(ds)
        return set(t[col].to_pylist()) if col in t.column_names else set()

    m_ends = _col_set(matches.map_batches(
        endpoints, batch_format="pyarrow"), "conv_id")
    new_ids = _col_set(new_features.select_columns(["conv_id"]), "conv_id")
    old_ends = pa.array(sorted(m_ends - new_ids), type=pa.string())

    # touched base cluster ids (≤ |old endpoints| rows reach the driver)
    touched_cl = pa.array(sorted(_col_set(base.clusters.map_batches(
        lambda t: (t.filter(pc.is_in(t["conv_id"], value_set=old_ends))
                   .select(["cluster_id"])
                   if t.num_rows and "conv_id" in t.column_names
                   else pa.table({"cluster_id": pa.array(
                       [], type=pa.string())})),
        batch_format="pyarrow"), "cluster_id")), type=pa.string())

    def split(keep_touched: bool):
        def f(t: pa.Table) -> pa.Table:
            if t.num_rows == 0 or "cluster_id" not in t.column_names:
                return pa.schema([("conv_id", pa.string()),
                                  ("cluster_id", pa.string())]) \
                    .empty_table()
            m = pc.is_in(t["cluster_id"], value_set=touched_cl)
            return t.filter(m if keep_touched else pc.invert(m)) \
                .select(["conv_id", "cluster_id"])

        return base.clusters.map_batches(f, batch_format="pyarrow")

    members = split(True).materialize()      # touched members, small
    member_edges = members.map_batches(
        lambda t: (pa.table({"conv_a": t["conv_id"],
                             "conv_b": t["cluster_id"]})
                   if "conv_id" in t.column_names else
                   pa.schema([("conv_a", pa.string()),
                              ("conv_b", pa.string())]).empty_table()),
        batch_format="pyarrow")
    universe_small = new_features.select_columns(["conv_id"]).union(
        members.select_columns(["conv_id"]))
    def _assemble():
        out = cluster_matches(
            matches.select_columns(["conv_a", "conv_b"])
            .union(member_edges), universe_small).union(split(False))
        return out.sort("conv_id") if sort_output else out

    clusters = runner.run("inc_clusters", _assemble)

    return IncrementalResult(new_features, pairs, scored, matches,
                             clusters, n_new)


def fold_incremental(base: LinkageResult,
                     inc: IncrementalResult) -> LinkageResult:
    """Fold an incremental step back into a base-shaped result so the
    NEXT batch can link against it — the micro-batch streaming loop:

        state = run_linkage(batch0)
        for batch in rest:
            state = fold_incremental(state, run_incremental(state, batch))

    Features become the union (the next batch blocks against everything
    seen), clusters the updated assignment; the broadcast statistics
    remain the ORIGINAL base run's (the frozen-stats contract — refresh
    them by re-running the base pipeline when drift warrants, exactly
    like rebuilding an index).  Stage outputs that only make sense for
    one full run (token/pair stats datasets, pair lists) carry over
    from the base unchanged and should not be re-consumed."""
    return LinkageResult(
        base.conv_docs, base.features.union(inc.new_features),
        base.token_stats, base.pair_stats,
        base.pairs, inc.scored, inc.matches,
        inc.clusters.materialize(),      # consumed per following batch
        base.n_convs + inc.n_new, stats_ref=base.stats_ref)
