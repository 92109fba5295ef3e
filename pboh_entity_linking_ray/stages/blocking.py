"""Blocking: per-conversation features → candidate pair rows (SKINNY).

Sub-steps, each a named shuffle (SURVEY.md §7.3):

1. ``add_block_keys``  — flat-emit one SKINNY row per (conversation ×
   block key): ``lsh_bands`` MinHash band keys plus one tool/role
   signature key.  Only (conv_id, mh0, own_key, block_key) are shuffled —
   ~40 B/row; features are re-attached at scoring time from the broadcast
   FeatureStore (stages/scoring.py), so the blocking exchange never moves
   token sketches or text.
2. ``make_pairs``      — singleton-block pruning (skinny key count +
   broadcast filter), hash sub-chunk splitting of oversized (salted)
   blocks BEFORE the shuffle, then bucketed, size-batched vectorized pair
   emission.  **Explicit salting of hot blocks**: an oversized block's
   pair budget is ``max_pairs_per_block``; its chunk-local pairs plus
   seam windows are emitted and every non-emitted pair is accounted in
   ``capped_pairs`` — the reference instead silently skips oversized
   documents (reference: src/main/scala/eval/EvalOnDatasets.scala:172,
   eval/cweb/RunLoopyAgainstAllGoogleClweb.scala:188); the north_rule
   forbids silent drops.
3. ``dedup_pairs``     — bucketed keep-first on ``pair_key`` across
   blocks (analog of the reference's ``.distinct`` on packed int64 pair
   keys, reference: src/main/scala/index/EntityCooccurrenceIndex.scala:103);
   cheap because pair rows are ~90 B.
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
        ("capped_pairs", pa.int64()),
    ]
)


class BlockKeyEmitter:
    """features → one row per (conv, block_key); all feature cols duplicated."""

    def __init__(self, cfg: PipelineConfig | None = None):
        from .featurize import _mh_for

        self.cfg = cfg or PipelineConfig()
        # reuse MinHasher only for band folding of the stored signature
        self.mh = _mh_for(self.cfg)

    def __call__(self, batch: pa.Table) -> pa.Table:
        import polars as pl

        cfg = self.cfg
        n = batch.num_rows
        if n == 0:
            # same skinny 4-column schema as the non-empty path (an
            # input-shaped empty table would break the downstream union)
            return pa.table({
                "conv_id": pa.array([], type=pa.string()),
                "mh0": pa.array([], type=pa.int64()),
                "own_key": pa.array([], type=pa.int64()),
                "block_key": pa.array([], type=pa.string()),
            })
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
        key_hash = hash_strings_u64(flat_keys, seed=23)
        idx = np.repeat(np.arange(n), n_keys)
        # skinny projection: only identity + the mh0 used for salted-chunk
        # ordering cross the shuffle; features stay in the FeatureStore
        out = pa.table({
            "conv_id": batch["conv_id"].take(pa.array(idx)),
            "mh0": pa.array(sigs[:, 0].view(np.int64)[idx]),
            "own_key": pa.array(key_hash.view(np.int64)),
            "block_key": pa.array(flat_keys, type=pa.string()),
        })
        return out


def add_block_keys(features: ray.data.Dataset, cfg: PipelineConfig | None = None):
    cfg = cfg or PipelineConfig()

    def emit(batch: pa.Table) -> pa.Table:
        return BlockKeyEmitter(cfg)(batch)

    return features.map_batches(emit, batch_format="pyarrow", batch_size=1024)


_TRIU_CACHE: dict[int, tuple[np.ndarray, np.ndarray]] = {}


def _triu(n: int) -> tuple[np.ndarray, np.ndarray]:
    t = _TRIU_CACHE.get(n)
    if t is None:
        t = np.triu_indices(n, k=1)
        _TRIU_CACHE[n] = t
    return t


def _salted_pair_indices(order: np.ndarray, cfg: PipelineConfig
                         ) -> tuple[np.ndarray, np.ndarray, int]:
    """Chunked (salted) pair indices for one oversized group; ``order`` is
    the group's bucket-row indices in (mh0, conv_id)-sorted order.
    Returns (i, j, capped) — capped = pairs not generated."""
    m = len(order)
    chunk_size = max(8, min(cfg.block_cap,
                            (2 * cfg.max_pairs_per_block) // m))
    chunks = [order[i : i + chunk_size] for i in range(0, m, chunk_size)]
    ii, jj = [], []
    # seam window scales down with the chunk so boundary pairs never
    # dominate the pair budget on very hot blocks
    w = min(cfg.salt_boundary, max(1, chunk_size // 2))
    for ci, chunk in enumerate(chunks):
        a, b = _triu(len(chunk))
        ii.append(chunk[a])
        jj.append(chunk[b])
        if ci + 1 < len(chunks):
            ga, gb = np.meshgrid(chunk[-w:], chunks[ci + 1][:w], indexing="ij")
            ii.append(ga.ravel())
            jj.append(gb.ravel())
    i_idx = np.concatenate(ii)
    j_idx = np.concatenate(jj)
    return i_idx, j_idx, m * (m - 1) // 2 - len(i_idx)


def _group_share(parent_n: np.ndarray, n_chunks: np.ndarray,
                 sub_idx: np.ndarray, own_m: np.ndarray) -> np.ndarray:
    """Per-group pair budget: a pre-split sub-chunk owns its integer share
    of the PARENT block's C(n,2) (remainder to the lowest sub ids), an
    unsplit group owns its own C(m,2).  Σ(share − emitted) over all
    sub-chunks of a parent == the parent's true non-emitted pair count —
    the accounting the module docstring promises (exact up to sub-chunks
    that hash to <2 members and so emit no row to carry it)."""
    own_total = own_m * (own_m - 1) // 2
    p_total = parent_n * (parent_n - 1) // 2
    share = np.where(
        parent_n > 0,
        p_total // np.maximum(n_chunks, 1)
        + (sub_idx < p_total % np.maximum(n_chunks, 1)),
        own_total,
    )
    return share.astype(np.int64)


def _emit_pairs_bucket(bucket: pa.Table, cfg: PipelineConfig) -> pa.Table:
    """ALL groups of a bucket → skinny pair rows in one vectorized pass.

    Pair-index generation is batched BY GROUP SIZE (a group-at-a-time
    implementation measured ~1.2 ms of numpy overhead per emitted pair).
    Cross-block duplicates are removed afterwards by ``dedup_pairs`` —
    cheap, because these rows carry no features.

    ``capped_pairs`` accounting: the count of NON-emitted pairs chargeable
    to a group (its `_group_share` budget minus what it emitted) rides on
    the group's FIRST pair row, 0 elsewhere — so a plain Sum over the raw
    make_pairs output is the exact global capped total (consumed by the
    pairs-stage manifest).  Dedup may reassign a duplicate first-row to
    another block, so sum BEFORE dedup_pairs.
    """
    n = bucket.num_rows
    if n == 0:
        return _PAIR_SCHEMA.empty_table()
    gk = np.asarray(bucket["group_key"], dtype=object)
    starts = np.flatnonzero(np.concatenate(([True], gk[1:] != gk[:-1])))
    bounds = np.append(starts, n)
    sizes = np.diff(bounds)
    parent_all = np.asarray(bucket["parent_n"], dtype=np.int64)
    chunks_all = np.asarray(bucket["n_chunks"], dtype=np.int64)
    sub_all = np.asarray(bucket["sub_idx"], dtype=np.int64)

    ii_parts: list[np.ndarray] = []
    jj_parts: list[np.ndarray] = []
    cap_parts: list[np.ndarray] = []

    # vector path: full pairing for every group with 2 <= m <= block_cap,
    # batched by size
    small = (sizes >= 2) & (sizes <= cfg.block_cap)
    for msize in np.unique(sizes[small]):
        ia, ib = _triu(int(msize))
        sel = small & (sizes == msize)
        base = bounds[:-1][sel]
        ii_parts.append((base[:, None] + ia[None, :]).ravel())
        jj_parts.append((base[:, None] + ib[None, :]).ravel())
        npairs = len(ia)
        caps = np.zeros(len(base) * npairs, dtype=np.int64)
        share = _group_share(parent_all[base], chunks_all[base],
                             sub_all[base], sizes[sel])
        caps[np.arange(len(base)) * npairs] = share - npairs
        cap_parts.append(caps)

    # fallback: oversized groups (sub-chunk splitting keeps these rare)
    big = np.flatnonzero(sizes > cfg.block_cap)
    if len(big):
        conv_all = np.asarray(bucket["conv_id"], dtype=object)
        mh_all = np.asarray(bucket["mh0"]).view(np.uint64)
        for g in big:
            s, e = bounds[g], bounds[g + 1]
            local = np.arange(s, e)
            order = local[np.lexsort((conv_all[s:e], mh_all[s:e]))]
            gi, gj, _ = _salted_pair_indices(order, cfg)
            ii_parts.append(gi)
            jj_parts.append(gj)
            share = int(_group_share(parent_all[s:s + 1], chunks_all[s:s + 1],
                                     sub_all[s:s + 1],
                                     np.array([e - s]))[0])
            caps = np.zeros(len(gi), dtype=np.int64)
            if len(gi):
                caps[0] = share - len(gi)
            cap_parts.append(caps)

    if not ii_parts:
        return _PAIR_SCHEMA.empty_table()
    i_idx = np.concatenate(ii_parts)
    j_idx = np.concatenate(jj_parts)
    capped_col = np.concatenate(cap_parts)

    # canonical order inside the pair: conv_a < conv_b
    conv = np.asarray(bucket["conv_id"], dtype=object)
    swap = conv[i_idx] > conv[j_idx]
    ai = pa.array(np.where(swap, j_idx, i_idx))
    bi = pa.array(np.where(swap, i_idx, j_idx))

    import pyarrow.compute as pc

    conv_arr = bucket["conv_id"].combine_chunks() \
        if isinstance(bucket["conv_id"], pa.ChunkedArray) else bucket["conv_id"]
    ca2 = conv_arr.take(ai)
    cb2 = conv_arr.take(bi)
    pair_key = pc.binary_join_element_wise(ca2, cb2, "\x1f")

    return pa.table(
        {
            "pair_key": pair_key,
            "block_key": bucket["block_key"].take(ai),
            "conv_a": ca2,
            "conv_b": cb2,
            "capped_pairs": pa.array(capped_col, type=pa.int64()),
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

    from ..functions.grouping import bucketed_sum

    def count_partial(t: pa.Table) -> pa.Table:
        uniq, counts = np.unique(np.asarray(t["own_key"]), return_counts=True)
        return pa.table({"own_key": pa.array(uniq, type=pa.int64()),
                         "n_partial": pa.array(counts.astype(np.int64))})

    sizes = bucketed_sum(
        blocked.select_columns(["own_key"]).map_batches(
            count_partial, batch_format="pyarrow"),
        ["own_key"], "n_partial", "n",
    )
    # only multi-member keys ever pair: filter IN the dataset so the
    # driver pull is O(hot keys), not O(distinct keys) — at 250k convs the
    # unfiltered table is ~6M rows / 100 MB of which <2% can pair
    sz = sizes.filter(expr="n >= 2").to_pandas()
    hot_keys = np.sort(sz["own_key"].to_numpy().astype(np.int64))
    # oversized keys get salted (chunked) pair generation; their members
    # are split into hash sub-chunks here, BEFORE the shuffle: a hot
    # block processed as one group serializes on a single core (observed:
    # six signature blocks pinned the whole stage); sub-chunk groups
    # spread across every bucket instead.
    salted = sz.loc[sz["n"] > cfg.block_cap, ["own_key", "n"]]
    salted_keys_i64 = salted["own_key"].to_numpy().astype(np.int64)
    o = np.argsort(salted_keys_i64)
    salted_keys_i64 = salted_keys_i64[o]
    salted_n = salted["n"].to_numpy().astype(np.int64)[o]
    chunk_sz = np.maximum(
        8, np.minimum(cfg.block_cap,
                      (2 * cfg.max_pairs_per_block) // np.maximum(salted_n, 1)))
    salted_nchunks = np.maximum(1, salted_n // chunk_sz)
    hot_ref = ray.put((hot_keys, salted_keys_i64, salted_nchunks, salted_n))

    def keep_hot_and_split(t: pa.Table) -> pa.Table:
        hot, skeys, snchunks, sn = ray.get(hot_ref)
        out_schema = (t.schema
                      .append(pa.field("group_key", pa.string()))
                      .append(pa.field("parent_n", pa.int64()))
                      .append(pa.field("n_chunks", pa.int64()))
                      .append(pa.field("sub_idx", pa.int64())))
        if len(hot) == 0 or t.num_rows == 0:
            return out_schema.empty_table()
        keys = np.asarray(t["own_key"])
        idx = np.clip(np.searchsorted(hot, keys), 0, len(hot) - 1)
        t = t.filter(pa.array(hot[idx] == keys))
        if t.num_rows == 0:
            return out_schema.empty_table()
        keys = np.asarray(t["own_key"])
        bk = np.asarray(t["block_key"], dtype=object)
        group_key = bk.copy()
        parent_n = np.zeros(len(keys), dtype=np.int64)
        n_chunks = np.ones(len(keys), dtype=np.int64)
        sub_idx = np.zeros(len(keys), dtype=np.int64)
        if len(skeys):
            si = np.clip(np.searchsorted(skeys, keys), 0, len(skeys) - 1)
            is_salted = skeys[si] == keys
            if is_salted.any():
                mh = np.asarray(t["mh0"]).view(np.uint64)[is_salted]
                # splitmix-style remix: mh0 (a minimum) is not uniform
                z = (mh ^ (mh >> np.uint64(33))) * np.uint64(0xFF51AFD7ED558CCD)
                z ^= z >> np.uint64(29)
                sub = z % snchunks[si[is_salted]].astype(np.uint64)
                group_key[is_salted] = [
                    f"{b}#{s}" for b, s in zip(bk[is_salted], sub)
                ]
                parent_n[is_salted] = sn[si[is_salted]]
                n_chunks[is_salted] = snchunks[si[is_salted]]
                sub_idx[is_salted] = sub.astype(np.int64)
        t = t.append_column("group_key", pa.array(group_key, type=pa.string()))
        t = t.append_column("parent_n", pa.array(parent_n))
        t = t.append_column("n_chunks", pa.array(n_chunks))
        return t.append_column("sub_idx", pa.array(sub_idx))

    blocked = blocked.map_batches(keep_hot_and_split, batch_format="pyarrow")

    def per_bucket(bucket: pa.Table) -> pa.Table:
        if bucket.num_rows == 0:
            return _PAIR_SCHEMA.empty_table()
        return _emit_pairs_bucket(bucket.sort_by("group_key"), cfg)

    from ..functions.grouping import bucketed_groups

    return bucketed_groups(blocked, "group_key", per_bucket, num_buckets)


def dedup_pairs(pairs: ray.data.Dataset, num_buckets: int = 64):
    """Keep one row per pair_key (pair-uniqueness invariant, FIXTURES.md
    §5); deterministic first-by-(pair_key, block_key), vectorized per
    hash bucket — the analog of the reference's ``.distinct`` on packed
    pair keys (EntityCooccurrenceIndex.scala:103)."""
    from ..functions.grouping import dedup_keep_first

    return dedup_keep_first(pairs, "pair_key", ["block_key"], num_buckets)


def capped_total(pairs_raw: ray.data.Dataset) -> int:
    """Exact global count of pairs NOT emitted due to salting caps — Sum
    of the first-row markers (see _emit_pairs_bucket).  Must run on the
    RAW make_pairs output (before dedup_pairs)."""
    return int(pairs_raw.sum("capped_pairs") or 0)


def block_inventory(blocked: ray.data.Dataset):
    """block_key → member count (manifest input; analog of the reference's
    per-doc-size histograms, eval/cweb/GlobalCountersCWEB.scala:102-134)."""
    return blocked.groupby("block_key").count()
