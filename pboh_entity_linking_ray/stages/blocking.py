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
from ..functions.hashing import hash_strings_u64
from ..functions.minhash import MinHasher

_PAIR_SCHEMA = pa.schema(
    [
        ("pair_key", pa.string()),
        ("block_key", pa.string()),
        ("conv_a", pa.string()),
        ("conv_b", pa.string()),
        ("jw_a", pa.string()),
        ("jw_b", pa.string()),
        ("tokens_a", pa.list_(pa.uint32())),
        ("tokens_b", pa.list_(pa.uint32())),
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
        # every emitted row carries the conversation's full key set as
        # SORTED uint64 HASHES: pair generation emits a pair ONLY inside
        # the minimum-hash common block (global pair uniqueness WITHOUT a
        # wide dedup shuffle), and the hash total order lets that check be
        # fully vectorized (padded sort-merge in _emit_pairs)
        key_hash = hash_strings_u64(flat_keys, seed=23).reshape(n, n_keys)
        key_rows = np.sort(key_hash, axis=1)
        idx = np.repeat(np.arange(n), n_keys)
        # shuffle-slim projection: minhash (512 B/row) reduced to the single
        # value used for salted-chunk ordering; sig/n_turns dropped
        out = pa.table({
            "conv_id": batch["conv_id"].take(pa.array(idx)),
            "jw_text": batch["jw_text"].take(pa.array(idx)),
            "n_tokens": batch["n_tokens"].take(pa.array(idx)),
            "tokens": batch["tokens"].take(pa.array(idx)),
            "mh0": pa.array(sigs[:, 0].view(np.int64)[idx]),
            "all_keys": pa.array(list(key_rows[idx]), type=pa.list_(pa.uint64())),
            "own_key": pa.array(key_hash.ravel().view(np.int64)),
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


def _emit_pairs(group: pa.Table, cfg: PipelineConfig,
                salted_keys: np.ndarray | None = None) -> pa.Table:
    if salted_keys is None:
        salted_keys = np.empty(0, dtype=np.uint64)
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
    # seam window scales down with the chunk so boundary pairs never
    # dominate the pair budget on very hot blocks
    w = min(cfg.salt_boundary, max(1, chunk_size // 2))
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
    # canonical one — the hash-order minimum of the two conversations'
    # shared UNSALTED block keys (an unsalted block generates ALL its
    # pairs, so the canonical emission is guaranteed); when every common
    # key is salted, the overall min is canonical and the pair may be lost
    # if that block chunked the two apart (the documented salting
    # epsilon).  Each pair materializes at most once across all blocks —
    # no global dedup shuffle.  Vectorized: pad both sides' sorted
    # key-hash lists, sort-merge along the row, first duplicate = min.
    bk = group["block_key"][0].as_py()
    own = np.asarray(group["own_key"]).view(np.uint64)[i_idx]
    ak = group["all_keys"]
    if isinstance(ak, pa.ChunkedArray):
        ak = ak.combine_chunks()
    offsets = np.asarray(ak.offsets)
    lens = np.diff(offsets).astype(np.int64)
    width = int(lens.max(initial=1))
    vals = np.asarray(ak.flatten()).astype(np.uint64, copy=False)
    sentinel = np.uint64(0xFFFFFFFFFFFFFFFF)
    keymat = np.full((m, width), sentinel, dtype=np.uint64)
    rr = np.repeat(np.arange(m), lens)
    cc = np.arange(len(rr)) - np.repeat(np.cumsum(np.r_[0, lens[:-1]]), lens)
    keymat[rr, cc] = vals

    def _min_common(mat: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        merged = np.sort(np.concatenate([mat[i_idx], mat[j_idx]], axis=1),
                         axis=1)
        dupm = (merged[:, 1:] == merged[:, :-1]) & (merged[:, 1:] != sentinel)
        first = dupm.argmax(axis=1)
        has = dupm.any(axis=1)
        return merged[np.arange(len(i_idx)), first + 1], has

    if len(salted_keys):
        si = np.clip(np.searchsorted(salted_keys, keymat.ravel()), 0,
                     len(salted_keys) - 1)
        is_salted = (salted_keys[si] == keymat.ravel()).reshape(keymat.shape)
        small_mat = np.where(is_salted, sentinel, keymat)
        min_small, has_small = _min_common(small_mat)
        min_all, has_all = _min_common(keymat)
        canonical = np.where(has_small, min_small, min_all)
        keep = (has_small | has_all) & (canonical == own)
    else:
        min_all, has_all = _min_common(keymat)
        keep = has_all & (min_all == own)
    i_idx = i_idx[keep]
    j_idx = j_idx[keep]
    if len(i_idx) == 0:
        return _PAIR_SCHEMA.empty_table()

    # canonical order inside the pair: conv_a < conv_b
    ca = conv[i_idx]
    cb = conv[j_idx]
    swap = ca > cb
    ai = pa.array(np.where(swap, j_idx, i_idx))
    bi = pa.array(np.where(swap, i_idx, j_idx))

    # Arrow `take` keeps list/string payloads in Arrow end-to-end — no
    # Python materialization of 10^7-element token lists
    import pyarrow.compute as pc

    conv_arr = group["conv_id"].combine_chunks() \
        if isinstance(group["conv_id"], pa.ChunkedArray) else group["conv_id"]
    ca2 = conv_arr.take(ai)
    cb2 = conv_arr.take(bi)
    pair_key = pc.binary_join_element_wise(ca2, cb2, "\x1f")
    n_out = len(ai)

    return pa.table(
        {
            "pair_key": pair_key,
            "block_key": pa.array([bk] * n_out, type=pa.string()),
            "conv_a": ca2,
            "conv_b": cb2,
            "jw_a": group["jw_text"].take(ai),
            "jw_b": group["jw_text"].take(bi),
            "tokens_a": group["tokens"].take(ai),
            "tokens_b": group["tokens"].take(bi),
            "n_tokens_a": group["n_tokens"].take(ai),
            "n_tokens_b": group["n_tokens"].take(bi),
            "capped_pairs": pa.array([capped] * n_out, type=pa.int64()),
        }
    ).cast(_PAIR_SCHEMA)


def make_pairs(blocked: ray.data.Dataset, cfg: PipelineConfig | None = None,
               num_buckets: int = 64):
    """Bucketed pair generation: one Python call per hash bucket of
    block_key; inside the bucket each block is sliced out (sorted
    boundaries) and paired with numpy (functions/grouping.py rationale).

    Singleton-block pruning: most emitted (conv × band-key) rows land in
    blocks of size 1 (unique LSH minima) and can never pair.  A skinny
    pre-count on the 8-byte key hash finds the multi-member keys, which
    are broadcast (``ray.put`` of a sorted int64 array) and the WIDE
    feature-carrying rows are filtered before the expensive shuffle —
    observed ~8× shuffle reduction.  (At extreme scale the multi-member
    key set itself could outgrow a broadcast; the fallback is a bucketed
    semi-join on the same key hash.)"""
    cfg = cfg or PipelineConfig()

    import ray

    sizes = (
        blocked.select_columns(["own_key"])
        .groupby("own_key").count()
    )
    sz = sizes.to_pandas()
    hot_keys = np.sort(sz.loc[sz["count()"] >= 2, "own_key"].to_numpy()
                       .astype(np.int64))
    # oversized keys get salted (chunked) pair generation — they cannot
    # guarantee a pair is generated, so they are excluded from the
    # canonical min-common-block choice (see _emit_pairs)
    salted_keys = np.sort(
        sz.loc[sz["count()"] > cfg.block_cap, "own_key"].to_numpy()
        .astype(np.int64).view(np.uint64))
    hot_ref = ray.put(hot_keys)

    class KeepHot:
        def __init__(self, ref):
            self.hot = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref

        def __call__(self, t: pa.Table) -> pa.Table:
            if len(self.hot) == 0 or t.num_rows == 0:
                return t.slice(0, 0)
            keys = np.asarray(t["own_key"])
            idx = np.clip(np.searchsorted(self.hot, keys), 0, len(self.hot) - 1)
            return t.filter(pa.array(self.hot[idx] == keys))

    blocked = blocked.map_batches(
        KeepHot, fn_constructor_kwargs={"ref": hot_ref},
        batch_format="pyarrow", concurrency=(1, 4),
    )

    def per_bucket(bucket: pa.Table) -> pa.Table:
        if bucket.num_rows == 0:
            return _PAIR_SCHEMA.empty_table()
        bucket = bucket.sort_by("block_key")
        keys = np.asarray(bucket["block_key"], dtype=object)
        bounds = np.flatnonzero(np.concatenate(([True], keys[1:] != keys[:-1])))
        bounds = np.append(bounds, len(keys))
        out = []
        for s, e in zip(bounds[:-1], bounds[1:]):
            if e - s >= 2:
                out.append(_emit_pairs(bucket.slice(s, e - s), cfg, salted_keys))
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
