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
                    repartition: bool = True) -> ray.data.Dataset:
    """Apply ``fn(bucket_table) -> pa.Table`` once per hash bucket of
    ``key_col``; ``fn`` sees every row of each key it receives and must do
    its own per-key vectorized logic.

    ``repartition=True`` splits into many blocks BEFORE the groupby —
    Ray's sort-based shuffle parallelizes per input block, and upstream
    operators often emit few blocks (observed: single-block inputs
    serialize the whole sort).  Pass False when the input is already
    well-partitioned (e.g. the pinned edge sets between clustering
    rounds) to save an exchange."""

    def run(bucket: pa.Table) -> pa.Table:
        return fn(bucket.drop_columns([BUCKET_COL]))

    keyed = with_bucket(ds, key_col, num_buckets)
    if repartition:
        keyed = keyed.repartition(num_buckets)
    return keyed.groupby(BUCKET_COL).map_groups(run, batch_format="pyarrow")


def bucketed_sum(ds: ray.data.Dataset, key_cols: list[str], sum_col: str,
                 out_name: str, num_buckets: int = 64) -> ray.data.Dataset:
    """groupby(key).sum(sum_col) with vectorized per-bucket polars hash
    aggregation — Ray's native Aggregate builds result rows in Python per
    group (observed ~15 µs/group → 48 s for 3M co-occurrence keys)."""

    def fn(t: pa.Table) -> pa.Table:
        import polars as pl

        out = (
            pl.from_arrow(t)
            .group_by(key_cols)
            .agg(pl.col(sum_col).sum().alias(out_name))
        )
        return out.to_arrow()

    return bucketed_groups(ds, key_cols[0], fn, num_buckets)


def dedup_keep_first(ds: ray.data.Dataset, key_col: str,
                     order_cols: list[str] | None = None,
                     num_buckets: int = 64) -> ray.data.Dataset:
    """Keep exactly one row per key, deterministically (sorted by
    key + order_cols, first wins).  Vectorized per bucket."""
    order = [key_col] + (order_cols or [])

    def fn(t: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.from_arrow(t)
        out = df.sort(order).unique(subset=[key_col], keep="first",
                                    maintain_order=True)
        return out.to_arrow().cast(t.schema)

    return bucketed_groups(ds, key_col, fn, num_buckets)
