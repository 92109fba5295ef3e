"""Bucketed group processing — the scalable alternative to per-key
``map_groups``.

Ray's ``groupby(key).map_groups(fn)`` invokes Python once per key; at
millions of tiny groups the interpreter overhead dwarfs the work (observed
~1 ms/group → 200 s for 200k pair keys).  The idiom here: hash the key
into ``num_buckets`` coarse partitions, ``groupby(bucket)`` (cheap — few
groups), and run a **vectorized** per-key computation (polars/numpy) over
each bucket.  Correctness relies only on all rows of one key landing in
one bucket — exactly the hash-partitioning contract a multi-node shuffle
gives.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

BUCKET_COL = "__bucket"


def with_bucket(ds: ray.data.Dataset, key_col: str,
                num_buckets: int = 64) -> ray.data.Dataset:
    def add(t: pa.Table) -> pa.Table:
        import polars as pl

        if t.num_rows == 0:
            return t.append_column(BUCKET_COL, pa.array([], type=pa.int64()))
        h = pl.from_arrow(t[key_col].combine_chunks()).hash(seed=17).to_numpy()
        b = (h % np.uint64(num_buckets)).astype(np.int64)
        return t.append_column(BUCKET_COL, pa.array(b))

    return ds.map_batches(add, batch_format="pyarrow")


def bucketed_groups(ds: ray.data.Dataset, key_col: str, fn,
                    num_buckets: int = 64,
                    repartition: bool = True,
                    engine: str = "sort") -> ray.data.Dataset:
    """Apply ``fn(bucket_table) -> pa.Table`` once per hash bucket of
    ``key_col``; ``fn`` sees every row of each key it receives and must do
    its own per-key vectorized logic.

    ``engine="exchange"`` routes through ``hash_exchange`` (direct
    two-stage MapReduce shuffle; measured ~10× the sort-based groupby on
    pure hash-partition workloads) — use it when the input is already
    materialized (or about to be) and all you need is co-location by key
    hash.  The default sort engine keeps streaming backpressure and is
    the safe choice mid-pipeline.

    ``repartition=True`` (sort engine only) splits into many blocks
    BEFORE the groupby — Ray's sort-based shuffle parallelizes per input
    block, and upstream operators often emit few blocks (observed:
    single-block inputs serialize the whole sort).  Pass False when the
    input is already well-partitioned (e.g. the pinned edge sets between
    clustering rounds) to save an exchange."""
    if engine == "exchange":
        return hash_exchange(ds, key_col, fn, num_buckets)

    def run(bucket: pa.Table) -> pa.Table:
        return fn(bucket.drop_columns([BUCKET_COL]))

    keyed = with_bucket(ds, key_col, num_buckets)
    if repartition:
        keyed = keyed.repartition(num_buckets)
    return keyed.groupby(BUCKET_COL).map_groups(run, batch_format="pyarrow")


@ray.remote
def _exchange_split(tbl: pa.Table, key_col: str, num_buckets: int):
    """Map side of the hash exchange: one block → ``num_buckets`` bucket
    slices (sort-by-bucket + zero-copy slice; O(n log n) local, no
    driver involvement)."""
    import polars as pl

    if tbl.num_rows == 0:
        return tuple(tbl for _ in range(num_buckets))
    h = pl.from_arrow(tbl[key_col].combine_chunks()).hash(seed=17).to_numpy()
    b = (h % np.uint64(num_buckets)).astype(np.int64)
    order = np.argsort(b, kind="stable")
    sorted_tbl = tbl.take(pa.array(order))
    counts = np.bincount(b, minlength=num_buckets)
    offs = np.concatenate(([0], np.cumsum(counts)))
    return tuple(sorted_tbl.slice(offs[i], counts[i])
                 for i in range(num_buckets))


@ray.remote
def _exchange_apply(fn, *parts: pa.Table) -> pa.Table:
    """Reduce side: concat one bucket's slices from every map task and
    run the vectorized per-bucket ``fn``."""
    live = [p for p in parts if p.num_rows]
    bucket = (pa.concat_tables(live, promote_options="default") if live
              else parts[0])
    return fn(bucket)


def hash_exchange(ds: ray.data.Dataset, key_col: str, fn,
                  num_buckets: int = 64) -> ray.data.Dataset:
    """``bucketed_groups`` semantics on a DIRECT MapReduce hash exchange
    (raw Ray tasks) instead of Ray Data's sort-based groupby.

    The sort shuffle is the wrong substrate for a pure hash partition: it
    samples key ranges, sorts every block, and merge-reduces — measured
    ~34 s per exchange for a 1.9M-row / 240 MB feature join at 16 CPUs,
    where the actual required work (hash, split, concat) is O(n) and
    takes ~2 s.  Here each input block is split into ``num_buckets``
    zero-copy slices (one Ray task per block, ``num_returns`` bucket
    objects), and each bucket concatenates its slices from every map task
    and runs ``fn`` (one Ray task per bucket) — the classic two-stage
    shuffle, expressed in ~20 lines because the object store IS the
    exchange fabric.  On a multi-node cluster the bucket tasks pull only
    their own slices (Ray locality-schedules against the largest input),
    exactly like a map-reduce shuffle fetch.

    Trade-offs vs the Dataset groupby (use ``bucketed_groups`` when they
    matter): the input is materialized through ``to_arrow_refs`` (no
    streaming backpressure into the exchange — same peak footprint as the
    sort shuffle's map side, but pinned at once), and per-bucket results
    return as one object each.  All rows of one key land in one bucket —
    the partitioning contract every consumer already assumes.

    Sizing at scale: one bucket (≈ input/num_buckets) must fit a
    worker's heap, and the intermediate object count is
    O(num_blocks × num_buckets) — both fine up to a few thousand each
    (100 TB across 256 nodes ⇒ num_buckets ≈ 2-8k, blocks ≈ several
    thousand ⇒ ~10M tiny refs, within Ray's object-store metadata
    budget but worth watching).  Beyond that, exchange in two rounds
    (bucket by high bits, then low bits) or fall back to the sort
    engine.
    """
    blocks = ds.to_arrow_refs()
    if not blocks:
        return ds
    split = _exchange_split.options(num_returns=num_buckets)
    cols = [[] for _ in range(num_buckets)]
    for ref in blocks:
        outs = split.remote(ref, key_col, num_buckets)
        if num_buckets == 1:
            outs = [outs]
        for i, r in enumerate(outs):
            cols[i].append(r)
    out_refs = [_exchange_apply.remote(fn, *cols[i])
                for i in range(num_buckets)]
    return ray.data.from_arrow_refs(out_refs)


def bucketed_sum(ds: ray.data.Dataset, key_cols: list[str], sum_col: str,
                 out_name: str, num_buckets: int = 64,
                 engine: str = "sort") -> ray.data.Dataset:
    """groupby(key).sum(sum_col) with vectorized per-bucket polars hash
    aggregation — Ray's native Aggregate builds result rows in Python per
    group (observed ~15 µs/group → 48 s for 3M co-occurrence keys)."""
    return bucketed_sum_multi(ds, key_cols, {sum_col: out_name}, num_buckets,
                              engine=engine)


def bucketed_sum_multi(ds: ray.data.Dataset, key_cols: list[str],
                       sum_cols: dict[str, str],
                       num_buckets: int = 64,
                       engine: str = "sort") -> ray.data.Dataset:
    """Several sums over the same keys in ONE shuffle (fused-stats
    pattern: a second stats table over the same key space should never
    pay a second exchange)."""

    def fn(t: pa.Table) -> pa.Table:
        import polars as pl

        out = (
            pl.from_arrow(t)
            .group_by(key_cols)
            .agg(*[pl.col(c).sum().alias(o) for c, o in sum_cols.items()])
        )
        return out.to_arrow()

    return bucketed_groups(ds, key_cols[0], fn, num_buckets, engine=engine)


SIDE_COL = "__side"


def hash_join(left: ray.data.Dataset, right: ray.data.Dataset, on: str,
              num_buckets: int = 64, how: str = "inner",
              post=None, engine: str = "exchange") -> ray.data.Dataset:
    """Distributed large×large hash join on a same-named key column.

    Both sides are hash-partitioned on ``on`` into the same buckets (one
    union + one shuffle), then each bucket is joined vectorized with
    polars — the bucketed co-group idiom (all rows of one key meet in one
    bucket), never a driver-side collect of either side.  Non-key column
    names must be disjoint; rename before joining.

    Reference analog: the doc-text ⋈ anchors groupByKey co-group
    (reference: src/main/scala/context/EntityWordsProbs.scala:198-202) —
    the reference's only join device beyond broadcast lookups.

    ``post`` (optional, ``fn(pa.Table) -> pa.Table``) runs on each
    bucket's join output INSIDE the bucket task — operator fusion for a
    consumer that immediately maps the joined rows (e.g. the pair scorer):
    the wide joined table never crosses an operator boundary through the
    object store.
    """
    lf = [(f.name, f.type) for f in left.schema().base_schema]
    rf = [(f.name, f.type) for f in right.schema().base_schema]
    l_names = [n for n, _ in lf]
    r_rest = [(n, t) for n, t in rf if n != on]
    overlap = set(l_names) & {n for n, _ in r_rest}
    if overlap:
        raise ValueError(f"hash_join column collision: {sorted(overlap)}")
    all_fields = lf + r_rest
    out_schema = pa.schema(all_fields)

    def align(side: int):
        def f(t: pa.Table) -> pa.Table:
            n = t.num_rows
            cols = {}
            for name, typ in all_fields:
                if name in t.column_names:
                    col = t[name]
                    cols[name] = (col.cast(typ)
                                  if col.type != typ else col)
                else:
                    cols[name] = pa.nulls(n, type=typ)
            cols[SIDE_COL] = pa.array(np.full(n, side, dtype=np.int8))
            return pa.table(cols)

        return f

    both = left.map_batches(align(0), batch_format="pyarrow").union(
        right.map_batches(align(1), batch_format="pyarrow"))

    l_cols = l_names
    r_cols = [on] + [n for n, _ in r_rest]

    def join_bucket(bucket: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.from_arrow(bucket)
        lhs = df.filter(pl.col(SIDE_COL) == 0).select(l_cols)
        rhs = df.filter(pl.col(SIDE_COL) == 1).select(r_cols)
        out = lhs.join(rhs, on=on, how=how)
        joined = out.select([n for n, _ in all_fields]).to_arrow().cast(out_schema)
        return post(joined) if post is not None else joined

    if engine == "exchange":
        # direct hash exchange (see hash_exchange): ~2 s where the sort
        # shuffle spends ~34 s at the feature-join scale
        return hash_exchange(both, on, join_bucket, num_buckets)
    return bucketed_groups(both, on, join_bucket, num_buckets,
                           repartition=False)


def dedup_keep_first(ds: ray.data.Dataset, key_col: str,
                     order_cols: list[str] | None = None,
                     num_buckets: int = 64,
                     engine: str = "sort") -> ray.data.Dataset:
    """Keep exactly one row per key, deterministically (sorted by
    key + order_cols, first wins).  Vectorized per bucket."""
    order = [key_col] + (order_cols or [])

    def fn(t: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.from_arrow(t)
        out = df.sort(order).unique(subset=[key_col], keep="first",
                                    maintain_order=True)
        return out.to_arrow().cast(t.schema)

    return bucketed_groups(ds, key_col, fn, num_buckets, engine=engine)
