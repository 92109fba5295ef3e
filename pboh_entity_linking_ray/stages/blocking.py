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
        band = self.mh.band_keys(sigs, cfg.lsh_bands)          # (n, B) uint64
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
            prefix[:, b] = f"b{b}:"
        prefix[:, cfg.lsh_bands] = "s:"
        flat_keys = [
            p + str(v) for p, v in zip(prefix.ravel(), key_mat.ravel())
        ]
        idx = np.repeat(np.arange(n), n_keys)
        out = batch.take(pa.array(idx))
        return out.append_column("block_key", pa.array(flat_keys, type=pa.string()))


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
    mh0 = np.asarray(
        [row[0] for row in group["minhash"].to_pylist()], dtype=np.uint64
    )
    # deterministic similarity-ish order: (minhash[0], conv_id)
    order = np.lexsort((conv, mh0))

    cap = cfg.block_cap
    chunks = [order[i : i + cap] for i in range(0, m, cap)]
    ii: list[np.ndarray] = []
    jj: list[np.ndarray] = []
    for ci, chunk in enumerate(chunks):
        a, b = np.triu_indices(len(chunk), k=1)
        ii.append(chunk[a])
        jj.append(chunk[b])
        for w in range(1, cfg.adjacent_chunks + 1):
            if ci + w < len(chunks):
                nxt = chunks[ci + w]
                ga, gb = np.meshgrid(chunk, nxt, indexing="ij")
                ii.append(ga.ravel())
                jj.append(gb.ravel())
    i_idx = np.concatenate(ii)
    j_idx = np.concatenate(jj)
    total_pairs = m * (m - 1) // 2
    capped = total_pairs - len(i_idx)

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
    bk = group["block_key"][0].as_py()
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


def make_pairs(blocked: ray.data.Dataset, cfg: PipelineConfig | None = None):
    cfg = cfg or PipelineConfig()
    return blocked.groupby("block_key").map_groups(
        lambda g: _emit_pairs(g, cfg), batch_format="pyarrow"
    )


def _first_row(group: pa.Table) -> pa.Table:
    return group.slice(0, 1)


def dedup_pairs(pairs: ray.data.Dataset):
    """Keep one row per pair_key (pair-uniqueness invariant, FIXTURES.md §5)."""
    return pairs.groupby("pair_key").map_groups(_first_row, batch_format="pyarrow")


def block_inventory(blocked: ray.data.Dataset):
    """block_key → member count (manifest input; analog of the reference's
    per-doc-size histograms, eval/cweb/GlobalCountersCWEB.scala:102-134)."""
    return blocked.groupby("block_key").count()
