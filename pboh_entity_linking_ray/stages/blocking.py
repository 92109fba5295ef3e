"""Blocking: per-conversation features → candidate pair rows.

Three sub-steps, each a named shuffle (SURVEY.md §7.3):

1. ``add_block_keys``  — flat-emit one row per (conversation × block key):
   ``lsh_bands`` MinHash band keys plus one tool/role signature key.
2. ``make_pairs``      — ``groupby(block_key).map_groups``: unordered pairs
   within each block, with **explicit salting of hot blocks**: a block
   larger than ``block_cap`` is sorted by its first MinHash value (similar
   conversations sort near each other) and split into chunks of
   ``block_cap``; pairs are emitted within each chunk and across
   ``adjacent_chunks`` neighboring chunks, and the number of *capped*
   (not-emitted) pairs is carried on every emitted row so the manifest can
   account for them.  The reference instead silently skips oversized
   documents (reference: src/main/scala/eval/EvalOnDatasets.scala:172,
   eval/cweb/RunLoopyAgainstAllGoogleClweb.scala:188) — the north_rule
   forbids silent drops.
3. ``dedup_pairs``     — ``groupby(pair_key)`` keep-first across blocks
   (analog of the reference's ``.distinct`` on packed int64 pair keys,
   reference: src/main/scala/index/EntityCooccurrenceIndex.scala:103).

Pair rows carry both sides' capped features (jw text, bottom-k token
hashes) so the scorer needs no further join — the width is bounded by
``max_tokens_per_conv`` and ``jw_text_cap`` (config.py).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from ..config import PipelineConfig
from ..functions.minhash import MinHasher

_PAIR_SCHEMA = pa.schema(
    [
        ("pair_key", pa.string()),
        ("block_key", pa.string()),
        ("conv_a", pa.string()),
        ("conv_b", pa.string()),
        ("jw_a", pa.string()),
        ("jw_b", pa.string()),
        ("tokens_a", pa.list_(pa.uint64())),
        ("tokens_b", pa.list_(pa.uint64())),
        ("n_tokens_a", pa.int32()),
        ("n_tokens_b", pa.int32()),
        ("capped_pairs", pa.int64()),
    ]
)


class BlockKeyEmitter:
    """features → one row per (conv, block_key); all feature cols duplicated."""

    def __init__(self, cfg: PipelineConfig | None = None):
        self.cfg = cfg or PipelineConfig()
        # reuse MinHasher only for band folding of the stored signature
        self.mh = MinHasher(self.cfg.num_perm, seed=self.cfg.seed)

    def __call__(self, batch: pa.Table) -> pa.Table:
        import polars as pl

        cfg = self.cfg
        n = batch.num_rows
        if n == 0:
            return batch.append_column("block_key", pa.array([], type=pa.string()))
        sigs = np.asarray(batch["minhash"].combine_chunks().flatten()).reshape(
            n, cfg.num_perm
        )
        band = self.mh.band_keys(sigs, cfg.lsh_bands, cfg.lsh_rows)  # (n, B)
        sig_hash = (
            pl.from_arrow(batch["sig"].combine_chunks())
            .hash(seed=13)
            .to_numpy()
            .astype(np.uint64)
        )
        n_keys = cfg.lsh_bands + 1
        # row i emits keys [b0..b{B-1}, sig]
        key_mat = np.empty((n, n_keys), dtype=np.uint64)
        key_mat[:, : cfg.lsh_bands] = band
        key_mat[:, cfg.lsh_bands] = sig_hash
        prefix = np.empty((n, n_keys), dtype=object)
        for b in range(cfg.lsh_bands):
            prefix[:, b] = f"b{b:02d}:"
        prefix[:, cfg.lsh_bands] = "s:"
        flat_keys = [
            p + str(v) for p, v in zip(prefix.ravel(), key_mat.ravel())
        ]
        # every emitted row also carries the conversation's full key set
        # (joined string — nested list columns sort slowly in Ray's shuffle):
        # pair generation emits a pair ONLY inside the minimum common block
        # (global pair uniqueness WITHOUT a wide dedup shuffle)
        key_rows = ["|".join(sorted(flat_keys[i * n_keys : (i + 1) * n_keys]))
                    for i in range(n)]
        idx = np.repeat(np.arange(n), n_keys)
        # shuffle-slim projection: minhash (512 B/row) reduced to the single
        # value used for salted-chunk ordering; sig/n_turns dropped
        out = pa.table({
            "conv_id": batch["conv_id"].take(pa.array(idx)),
            "jw_text": batch["jw_text"].take(pa.array(idx)),
            "n_tokens": batch["n_tokens"].take(pa.array(idx)),
            "tokens": batch["tokens"].take(pa.array(idx)),
            "mh0": pa.array(sigs[:, 0].view(np.int64)[idx]),
            "all_keys": pa.array(np.array(key_rows, dtype=object)[idx],
                                 type=pa.string()),
            "block_key": pa.array(flat_keys, type=pa.string()),
        })
        return out


def add_block_keys(features: ray.data.Dataset, cfg: PipelineConfig | None = None):
    cfg = cfg or PipelineConfig()
    return features.map_batches(
        BlockKeyEmitter,
        fn_constructor_kwargs={"cfg": cfg},
        batch_format="pyarrow",
        batch_size=2048,
        concurrency=(1, cfg.scorer_concurrency),
        num_cpus=1,
    )


def _emit_pairs(group: pa.Table, cfg: PipelineConfig) -> pa.Table:
    m = group.num_rows
    if m < 2:
        return _PAIR_SCHEMA.empty_table()

    conv = np.asarray(group["conv_id"], dtype=object)
    mh0 = np.asarray(group["mh0"]).view(np.uint64)
    # deterministic similarity-ish order: (minhash[0], conv_id) — similar
    # conversations sort near each other, so chunk-local pairing keeps most
    # true duplicate pairs even in heavily salted blocks
    order = np.lexsort((conv, mh0))

    if m <= cfg.block_cap:
        chunk_size = m
    else:
        # pair budget: chunks of size c emit ~ m*c/2 pairs total;
        # c = 2*budget/m keeps the block under max_pairs_per_block
        chunk_size = max(8, min(cfg.block_cap,
                                (2 * cfg.max_pairs_per_block) // m))
    chunks = [order[i : i + chunk_size] for i in range(0, m, chunk_size)]
    ii: list[np.ndarray] = []
    jj: list[np.ndarray] = []
    w = cfg.salt_boundary
    for ci, chunk in enumerate(chunks):
        a, b = np.triu_indices(len(chunk), k=1)
        ii.append(chunk[a])
        jj.append(chunk[b])
        if ci + 1 < len(chunks):
            # boundary window: sorted order puts cross-chunk near-dups at
            # the seam; full chunk×chunk would blow the pair budget
            left = chunk[-w:]
            right = chunks[ci + 1][:w]
            ga, gb = np.meshgrid(left, right, indexing="ij")
            ii.append(ga.ravel())
            jj.append(gb.ravel())
    i_idx = np.concatenate(ii)
    j_idx = np.concatenate(jj)
    total_pairs = m * (m - 1) // 2
    capped = total_pairs - len(i_idx)

    # min-common-block rule: emit (i, j) only when THIS block is the
    # lexicographic minimum of the two conversations' shared block keys —
    # each pair materializes exactly once across all blocks, so no global
    # dedup shuffle is needed.  (A pair whose min common block was salted
    # into different chunks can be lost — bounded by the salting recall
    # analysis above.)
    bk = group["block_key"][0].as_py()
    key_sets = [frozenset(ks.split("|")) for ks in group["all_keys"].to_pylist()]
    keep = np.fromiter(
        (min(key_sets[i] & key_sets[j]) == bk
         for i, j in zip(i_idx, j_idx)),
        dtype=bool, count=len(i_idx),
    )
    i_idx = i_idx[keep]
    j_idx = j_idx[keep]
    if len(i_idx) == 0:
        return _PAIR_SCHEMA.empty_table()

    # canonical order inside the pair: conv_a < conv_b
    ca = conv[i_idx]
    cb = conv[j_idx]
    swap = ca > cb
    ca2 = np.where(swap, cb, ca)
    cb2 = np.where(swap, ca, cb)
    ai = np.where(swap, j_idx, i_idx)
    bi = np.where(swap, i_idx, j_idx)

    jw = np.asarray(group["jw_text"], dtype=object)
    toks = np.asarray(group["tokens"].to_pylist(), dtype=object)
    ntok = np.asarray(group["n_tokens"])
    pair_key = [a + "\x1f" + b for a, b in zip(ca2, cb2)]

    return pa.table(
        {
            "pair_key": pa.array(pair_key, type=pa.string()),
            "block_key": pa.array([bk] * len(ai), type=pa.string()),
            "conv_a": pa.array(ca2, type=pa.string()),
            "conv_b": pa.array(cb2, type=pa.string()),
            "jw_a": pa.array(jw[ai], type=pa.string()),
            "jw_b": pa.array(jw[bi], type=pa.string()),
            "tokens_a": pa.array(list(toks[ai]), type=pa.list_(pa.uint64())),
            "tokens_b": pa.array(list(toks[bi]), type=pa.list_(pa.uint64())),
            "n_tokens_a": pa.array(ntok[ai], type=pa.int32()),
            "n_tokens_b": pa.array(ntok[bi], type=pa.int32()),
            "capped_pairs": pa.array([capped] * len(ai), type=pa.int64()),
        }
    )


def make_pairs(blocked: ray.data.Dataset, cfg: PipelineConfig | None = None,
               num_buckets: int = 64):
    """Bucketed pair generation: one Python call per hash bucket of
    block_key; inside the bucket each block is sliced out (sorted
    boundaries) and paired with numpy (functions/grouping.py rationale)."""
    cfg = cfg or PipelineConfig()

    def per_bucket(bucket: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        if bucket.num_rows == 0:
            return _PAIR_SCHEMA.empty_table()
        bucket = bucket.sort_by("block_key")
        keys = np.asarray(bucket["block_key"], dtype=object)
        bounds = np.flatnonzero(np.concatenate(([True], keys[1:] != keys[:-1])))
        bounds = np.append(bounds, len(keys))
        out = []
        for s, e in zip(bounds[:-1], bounds[1:]):
            if e - s >= 2:
                out.append(_emit_pairs(bucket.slice(s, e - s), cfg))
        if not out:
            return _PAIR_SCHEMA.empty_table()
        return pa.concat_tables(out)

    from ..functions.grouping import bucketed_groups

    return bucketed_groups(blocked, "block_key", per_bucket, num_buckets)


def dedup_pairs(pairs: ray.data.Dataset, num_buckets: int = 64):
    """Keep one row per pair_key (pair-uniqueness invariant, FIXTURES.md
    §5); deterministic first-by-(pair_key, block_key), vectorized per
    hash bucket — the analog of the reference's ``.distinct`` on packed
    pair keys (EntityCooccurrenceIndex.scala:103)."""
    from ..functions.grouping import dedup_keep_first

    return dedup_keep_first(pairs, "pair_key", ["block_key"], num_buckets)


def block_inventory(blocked: ray.data.Dataset):
    """block_key → member count (manifest input; analog of the reference's
    per-doc-size histograms, eval/cweb/GlobalCountersCWEB.scala:102-134)."""
    return blocked.groupby("block_key").count()
