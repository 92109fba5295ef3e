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


def _split_table(tbl: pa.Table, key_col: str, num_buckets: int,
                 inner: int = 1, stage: int = 0,
                 n_out: int | None = None) -> tuple:
    """One block → ``n_out`` slices by key hash (radix-stable argsort +
    zero-copy slice).  The fine bucket of a row is ``hash %
    num_buckets``; ``stage=0`` slices by its HIGH part (``fine //
    inner`` — the flat exchange is the ``inner=1`` case) and
    ``stage=1`` by its LOW part (``fine % inner``, the second round of
    the hierarchical exchange).  Shared by the exchange's map task and
    the fused rekey reduce."""
    import polars as pl

    if n_out is None:
        n_out = num_buckets
    if tbl.num_rows == 0:
        return tuple(tbl for _ in range(n_out))
    h = pl.from_arrow(tbl[key_col].combine_chunks()).hash(seed=17).to_numpy()
    f = (h % np.uint64(num_buckets)).astype(np.int64)
    s = (f // inner) if stage == 0 else (f % inner)
    order = np.argsort(s, kind="stable")
    sorted_tbl = tbl.take(pa.array(order))
    counts = np.bincount(s, minlength=n_out)
    offs = np.concatenate(([0], np.cumsum(counts)))
    return tuple(sorted_tbl.slice(offs[i], counts[i]) for i in range(n_out))


@ray.remote
def _exchange_split(tbl, key_col: str, num_buckets: int,
                    inner: int = 1, stage: int = 0, n_out: int | None = None):
    """Map side of the hash exchange (see ``_split_table``)."""
    if not isinstance(tbl, pa.Table):          # pandas block from upstream
        tbl = pa.Table.from_pandas(tbl, preserve_index=False)
    out = _split_table(tbl, key_col, num_buckets, inner, stage, n_out)
    return out if len(out) > 1 else out[0]


@ray.remote
def _exchange_concat(*parts: pa.Table) -> pa.Table:
    """Consolidation between the two rounds of the hierarchical
    exchange: merge one outer bucket's slices from one map-task group
    into a single block (restores ~input-sized blocks so round 2's
    ref count is blocks/√B × B instead of blocks × B)."""
    live = [p for p in parts if p.num_rows]
    return (pa.concat_tables(live, promote_options="default") if live
            else _widest(parts))


def _widest(parts) -> pa.Table:
    """Empty-bucket representative: the part with the most columns.
    Ray's map operators can emit zero-COLUMN empty blocks (an empty
    output bundle carries no schema); blindly taking ``parts[0]`` would
    then hand ``fn`` a schema-less table even though sibling map tasks'
    slices carry the real schema."""
    return max(parts, key=lambda p: p.num_columns)


@ray.remote
def _exchange_apply(fn, *parts: pa.Table) -> pa.Table:
    """Reduce side: concat one bucket's slices from every map task and
    run the vectorized per-bucket ``fn``.

    CONTRACT: ``fn`` may receive a fully-EMPTY table (sparse keys leave
    buckets with no rows — unlike the sort engine's map_groups, which
    never sees empty groups) and must return the same output schema for
    empty and non-empty input."""
    live = [p for p in parts if p.num_rows]
    bucket = (pa.concat_tables(live, promote_options="default") if live
              else _widest(parts))
    if bucket.num_columns == 0:
        # EVERY upstream block was a schema-less empty (a map over an
        # entirely-empty dataset emits 0-column blocks): there is no
        # schema to hand fn, so propagate the inert empty — consumers
        # treat 0-column 0-row blocks as no-ops
        return bucket
    return fn(bucket)


@ray.remote
def _rekey_apply(fn, key2: str, num_buckets2: int, *parts: pa.Table):
    """First-hop reduce of the fused ``rekey_exchange``: concat one
    key1-bucket's slices, run ``fn``, and split ``fn``'s OUTPUT by the
    key2 hash — the intermediate table goes straight from this task's
    heap into its consumers' fetches, never landing as standalone
    dataset blocks (saves a full write + read + re-split pass of the
    intermediate, which for wedge-sized intermediates is the dominant
    traffic)."""
    live = [p for p in parts if p.num_rows]
    bucket = (pa.concat_tables(live, promote_options="default") if live
              else _widest(parts))
    if bucket.num_columns == 0:
        # all-empty schema-less input: propagate inert empties
        return tuple(bucket for _ in range(num_buckets2))
    return _split_table(fn(bucket), key2, num_buckets2)


def rekey_exchange(ds: ray.data.Dataset, key1: str, fn1, key2: str, fn2,
                   num_buckets1: int = 32,
                   num_buckets2: int = 32) -> ray.data.Dataset:
    """Two chained hash exchanges with the intermediate FUSED:
    co-locate ``ds`` by ``key1``, run ``fn1`` per bucket, re-route
    ``fn1``'s output rows by ``key2``, run ``fn2`` per key2-bucket —
    the groupby-then-regroup shape (generate pairs per center then
    combine per pair; count per (a,b) then rank per a; ...).

    Composing two ``hash_exchange`` calls writes the full intermediate
    to the object store, reads it back, and splits it again; here the
    key1 reduce task splits its own output in-heap (``_rekey_apply``),
    so the intermediate crosses the store exactly once — for
    generation stages whose output is much larger than their input
    (wedge/pair emitters) that one saved pass is ~40% of the job's
    traffic.  Driver ref count is O(blocks + B1·B2); same fn contract
    as ``hash_exchange`` (empty tolerance, stable schema), and all
    rows of one key2 land in one output bucket."""
    refs = _stream_block_refs(ds)
    split = _exchange_split.options(num_returns=num_buckets1)
    cols: list[list] = [[] for _ in range(num_buckets1)]
    empty = True
    for ref in refs:
        empty = False
        outs = split.remote(ref, key1, num_buckets1)
        if num_buckets1 == 1:
            outs = [outs]
        for i, r in enumerate(outs):
            cols[i].append(r)
    if empty:
        sch = ds.schema(fetch_if_missing=False)
        if sch is None or len(sch.base_schema) == 0:
            return ds
        return ray.data.from_arrow(
            fn2(fn1(sch.base_schema.empty_table())))
    mid = [_rekey_apply.options(num_returns=num_buckets2)
           .remote(fn1, key2, num_buckets2, *cols[i])
           for i in range(num_buckets1)]
    if num_buckets2 == 1:
        mid = [[m] for m in mid]
    out_refs = [_exchange_apply.remote(fn2, *[mid[i][j]
                                              for i in range(num_buckets1)])
                for j in range(num_buckets2)]
    return ray.data.from_arrow_refs(out_refs)


# above this many buckets the flat exchange's O(blocks × buckets) ref
# count starts to dominate → switch to the two-round hierarchy
TWO_ROUND_THRESHOLD = 256


def buckets_for(n_rows: int, rows_per_bucket: int = 25_000,
                lo: int = 64) -> int:
    """Exchange bucket count sized to the input: ~``rows_per_bucket``
    keyed rows per bucket (one bucket must fit a worker's heap), rounded
    up to a power of two, floored at ``lo``.  Crossing
    TWO_ROUND_THRESHOLD automatically engages the hierarchical
    two-round exchange — this is how the flagship's shuffles keep
    working unchanged from 20k conversations to 100 TB."""
    import math

    need = max(1, int(n_rows) // max(1, rows_per_bucket))
    return max(lo, 1 << math.ceil(math.log2(need)))


def hash_exchange(ds: ray.data.Dataset, key_col: str, fn,
                  num_buckets: int = 64,
                  two_round: bool | None = None) -> ray.data.Dataset:
    """``bucketed_groups`` semantics on a DIRECT MapReduce hash exchange
    (raw Ray tasks) instead of Ray Data's sort-based groupby.

    The sort shuffle is the wrong substrate for a pure hash partition: it
    samples key ranges, sorts every block, and merge-reduces — measured
    ~34 s per exchange for a 1.9M-row / 240 MB feature join at 16 CPUs,
    where the actual required work (hash, split, concat) is O(n) and
    takes ~2 s.  Each input block is split into bucket slices (one Ray
    task per block, ``num_returns`` bucket objects), and each bucket
    concatenates its slices from every map task and runs ``fn`` (one Ray
    task per bucket) — the classic two-stage shuffle, expressed in ~30
    lines because the object store IS the exchange fabric.  On a
    multi-node cluster the bucket tasks pull only their own slices (Ray
    locality-schedules against the largest input), exactly like a
    map-reduce shuffle fetch.

    **Streaming intake**: input blocks are consumed through
    ``iter_internal_ref_bundles`` — split tasks launch as upstream
    operators emit blocks, overlapping the exchange's map side with
    upstream compute instead of materializing the whole input first.
    (The reduce side is still a barrier — that is what a shuffle is.)

    **Hierarchical two-round mode** (automatic above
    ``TWO_ROUND_THRESHOLD`` buckets, or forced with ``two_round=True``):
    the flat exchange creates O(blocks × buckets) intermediate refs —
    fine to a few thousand of each, but at 100 TB-scale bucket counts
    (≥ 2k) the object-store metadata bill explodes.  Instead, round 1
    exchanges by the HIGH part of the bucket id into ``outer ≈ √B``
    coarse groups, consolidating each group's slices per ``outer``-sized
    band of map tasks back into input-sized blocks; round 2 re-splits
    those consolidated blocks by the LOW part and applies ``fn`` per
    fine bucket.  Ref count drops from O(blocks × B) to
    O(blocks × √B)·2, and no task ever holds more than ~the larger of
    (input block × outer / outer) and one fine bucket.  Measured at
    4M rows / 64 blocks / 1024 buckets / 32 CPUs: 1.2 s two-round vs
    2.8 s flat — the flat mode's 65k tiny objects cost more than the
    extra consolidation pass long before the metadata ceiling bites.

    CONTRACT (both engines): ``fn`` must tolerate an EMPTY input table
    (sparse keys ⇒ empty buckets reach ``fn``, unlike the sort engine's
    map_groups) and must emit a stable schema regardless of input size.
    All rows of one key land in one fine bucket — the partitioning
    contract every consumer assumes.  Bucket results return in fine-
    bucket order in both modes.
    """
    def empty_result() -> ray.data.Dataset:
        # zero input blocks: honor the fn contract anyway — apply fn to
        # an empty table of the input schema so consumers see fn's
        # OUTPUT schema, not the raw input union schema (which for the
        # join wrappers contains the internal __side column)
        sch = ds.schema(fetch_if_missing=False)
        if sch is None or len(sch.base_schema) == 0:
            # unknown or zero-column schema (a map over an exchange
            # output loses it, see module caveat): nothing to hand fn
            return ds
        return ray.data.from_arrow(fn(sch.base_schema.empty_table()))

    refs = _stream_block_refs(ds)
    if two_round is None:
        two_round = num_buckets > TWO_ROUND_THRESHOLD

    if not two_round:
        split = _exchange_split.options(num_returns=num_buckets)
        cols: list[list] = [[] for _ in range(num_buckets)]
        empty = True
        for ref in refs:
            empty = False
            outs = split.remote(ref, key_col, num_buckets)
            if num_buckets == 1:
                outs = [outs]
            for i, r in enumerate(outs):
                cols[i].append(r)
        if empty:
            return empty_result()
        out_refs = [_exchange_apply.remote(fn, *cols[i])
                    for i in range(num_buckets)]
        return ray.data.from_arrow_refs(out_refs)

    outer = max(2, int(np.ceil(np.sqrt(num_buckets))))
    inner = int(np.ceil(num_buckets / outer))
    outer = int(np.ceil(num_buckets / inner))   # trim overshoot
    split1 = _exchange_split.options(num_returns=outer)

    # round 1: block → outer coarse slices, consolidated per band of
    # ``outer`` map tasks (band width = outer keeps consolidated blocks
    # at ~input block size)
    oc: list[list] = [[] for _ in range(outer)]
    empty = True
    for ref in refs:
        empty = False
        outs = split1.remote(ref, key_col, num_buckets, inner, 0, outer)
        if outer == 1:
            outs = [outs]
        for o, r in enumerate(outs):
            oc[o].append(r)
    if empty:
        return empty_result()
    cons: list[list] = [
        [_exchange_concat.remote(*oc[o][g:g + outer])
         for g in range(0, len(oc[o]), outer)]
        for o in range(outer)
    ]

    # round 2: consolidated block → inner fine slices, apply per bucket
    out_refs = []
    for o in range(outer):
        inner_o = min(inner, num_buckets - o * inner)
        split2 = _exchange_split.options(num_returns=inner_o)
        parts2: list[list] = [[] for _ in range(inner_o)]
        for cref in cons[o]:
            outs = split2.remote(cref, key_col, num_buckets, inner, 1,
                                 inner_o)
            if inner_o == 1:
                outs = [outs]
            for i, r in enumerate(outs):
                parts2[i].append(r)
        out_refs.extend(_exchange_apply.remote(fn, *parts2[i])
                        for i in range(inner_o))
    return ray.data.from_arrow_refs(out_refs)


def _stream_block_refs(ds: ray.data.Dataset):
    """Yield the dataset's block refs as the streaming executor produces
    them (no whole-input materialization before the exchange's map side
    starts)."""
    for bundle in ds.iter_internal_ref_bundles():
        yield from bundle.block_refs


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
SKEY_COL = "__skey"
SALT_COL = "__salt"


def _empty_side_fallback(left: ray.data.Dataset, right, how: str):
    """Join inputs may be schema-less: Ray loses the schema of a fully-
    EMPTY dataset (e.g. after repartition of 0 rows), so the output
    schema cannot be derived.  The ROW semantics are still well-defined
    — resolve them, omitting the unknowable missing side's columns
    (degraded schema on an empty or pass-through result; the inert-empty
    convention, see _exchange_apply).  Returns None when both sides
    carry schemas and the join should proceed normally."""
    if left.schema() is None:
        # no left rows: every how but "full" emits no rows; "full" keeps
        # the right side intact (left columns unknowable)
        if how == "full" and isinstance(right, ray.data.Dataset):
            return right
        return left
    if isinstance(right, ray.data.Dataset) and right.schema() is None:
        # empty right: inner/semi drop every left row; anti/left/full
        # keep them all (null right columns unknowable)
        return left.limit(0) if how in ("inner", "semi") else left
    return None


def hash_join(left: ray.data.Dataset, right: ray.data.Dataset,
              on: str | list[str],
              num_buckets: int = 64, how: str = "inner",
              post=None, engine: str = "exchange") -> ray.data.Dataset:
    """Distributed large×large hash join on same-named key column(s).

    ``on`` may be a LIST for a composite equality key: rows are then
    ROUTED by a packed row-hash of the key columns (hash collisions are
    harmless — they only co-locate extra rows; the in-bucket join
    matches on the real column list, so equality is exact) and the
    packed column never appears in the output.

    Both sides are hash-partitioned on ``on`` into the same buckets (one
    union + one shuffle), then each bucket is joined vectorized with
    polars — the bucketed co-group idiom (all rows of one key meet in one
    bucket), never a driver-side collect of either side.  Non-key column
    names must be disjoint; rename before joining.

    ``how`` ∈ {"inner", "left", "semi", "anti", "full"} (polars
    semantics); semi/anti return LEFT columns only and ship only the
    right side's key column through the exchange; "full" (full outer)
    coalesces the key so unmatched rows of EITHER side survive with one
    non-null key column.

    CAVEAT: output fields derive from each input's ``Dataset.schema()``.
    A lazy ``select_columns``/``rename_columns`` applied to an exchange
    output does NOT propagate into that schema (observed on Ray 2.49) —
    project with an explicit ``map_batches`` instead (see
    relational.q38's ``o_project``).

    Reference analog: the doc-text ⋈ anchors groupByKey co-group
    (reference: src/main/scala/context/EntityWordsProbs.scala:198-202) —
    the reference's only join device beyond broadcast lookups.

    ``post`` (optional, ``fn(pa.Table) -> pa.Table``) runs on each
    bucket's join output INSIDE the bucket task — operator fusion for a
    consumer that immediately maps the joined rows (e.g. the pair scorer):
    the wide joined table never crosses an operator boundary through the
    object store.
    """
    fb = _empty_side_fallback(left, right, how)
    if fb is not None:
        return fb
    on_cols = [on] if isinstance(on, str) else list(on)
    multi = len(on_cols) > 1
    lf = [(f.name, f.type) for f in left.schema().base_schema]
    rf = [(f.name, f.type) for f in right.schema().base_schema]
    l_names = [n for n, _ in lf]
    # semi/anti joins return left rows only — the right side contributes
    # nothing but key existence, so only its KEY column(s) ride the
    # exchange (the skinny-probe optimization; dedup upstream if the
    # right side is huge and key-repetitive)
    filtering = how in ("semi", "anti")
    r_rest = [] if filtering else [(n, t) for n, t in rf
                                   if n not in on_cols]
    overlap = set(l_names) & {n for n, _ in r_rest}
    if overlap:
        raise ValueError(f"hash_join column collision: {sorted(overlap)}")
    all_fields = lf + r_rest
    out_fields = lf if filtering else all_fields
    out_schema = pa.schema(out_fields)

    def align(side: int):
        def f(t: pa.Table) -> pa.Table:
            import polars as pl

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
            if multi:
                # routing key only: a packed row-hash of the key tuple
                # (over the CAST columns, so int32-vs-int64 sides hash
                # alike); the in-bucket join matches on the real columns
                h = (pl.from_arrow(pa.table({c: cols[c] for c in on_cols}))
                     .hash_rows(seed=23).to_numpy()
                     .astype(np.uint64, copy=False))
                cols[SKEY_COL] = pa.array(h.view(np.int64))
            return pa.table(cols)

        return f

    both = left.map_batches(align(0), batch_format="pyarrow").union(
        right.map_batches(align(1), batch_format="pyarrow"))

    l_cols = l_names
    r_cols = on_cols + [n for n, _ in r_rest]

    def join_bucket(bucket: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.from_arrow(bucket)
        lhs = df.filter(pl.col(SIDE_COL) == 0).select(l_cols)
        rhs = df.filter(pl.col(SIDE_COL) == 1).select(r_cols)
        # full outer: coalesce the two key columns into one, so
        # unmatched right rows carry their key in the shared column
        out = lhs.join(rhs, on=on_cols, how=how,
                       coalesce=True if how == "full" else None)
        joined = out.select([n for n, _ in out_fields]).to_arrow().cast(out_schema)
        return post(joined) if post is not None else joined

    key_col = SKEY_COL if multi else on_cols[0]
    if engine == "exchange":
        # direct hash exchange (see hash_exchange): ~2 s where the sort
        # shuffle spends ~34 s at the feature-join scale
        return hash_exchange(both, key_col, join_bucket, num_buckets)
    return bucketed_groups(both, key_col, join_bucket, num_buckets,
                           repartition=False)


def _sided_union(left: ray.data.Dataset, right: ray.data.Dataset, by: str,
                 suffix: str, op_name: str):
    """Shared plumbing of the two-sided join wrappers (asof/interval):
    derive the joint output schema (right non-key columns renamed with
    ``suffix``), reject collisions, align both sides onto it with a
    ``__side`` tag, and union them for the single hash exchange.
    Returns (both, l_cols, r_cols, all_fields, out_schema)."""
    lf = [(f.name, f.type) for f in left.schema().base_schema]
    rf = [(f.name, f.type) for f in right.schema().base_schema]
    l_names = [n for n, _ in lf]
    r_map = {n: (n if n == by else n + suffix) for n, _ in rf}
    r_fields = [(r_map[n], t) for n, t in rf if n != by]
    overlap = set(l_names) & {n for n, _ in r_fields}
    if overlap:
        raise ValueError(f"{op_name} column collision: {sorted(overlap)}")
    all_fields = lf + r_fields
    out_schema = pa.schema(all_fields)

    def align(side: int, names_in: dict[str, str]):
        def f(t: pa.Table) -> pa.Table:
            n = t.num_rows
            cols = {}
            for name, typ in all_fields:
                src = names_in.get(name)
                if src is not None and src in t.column_names:
                    col = t[src]
                    cols[name] = col.cast(typ) if col.type != typ else col
                else:
                    cols[name] = pa.nulls(n, type=typ)
            cols[SIDE_COL] = pa.array(np.full(n, side, dtype=np.int8))
            return pa.table(cols)

        return f

    both = left.map_batches(
        align(0, {n: n for n in l_names}), batch_format="pyarrow"
    ).union(right.map_batches(
        align(1, {r_map[n]: n for n, _ in rf}), batch_format="pyarrow"))
    r_cols = [by] + [n for n, _ in r_fields]
    return both, l_names, r_cols, all_fields, out_schema


def asof_join(left: ray.data.Dataset, right: ray.data.Dataset, by: str,
              on: str, num_buckets: int = 64,
              suffix: str = "_r") -> ray.data.Dataset:
    """Distributed as-of join (inequality join Ray Data has no native
    operator for): each left row picks the most recent right row with
    the same ``by`` key and ``right.on <= left.on`` (backward match,
    ties on the timestamp included); unmatched left rows keep nulls
    (left join).

    Partitioning contract: both sides hash-partition on the EQUALITY
    key ``by`` into the same buckets — ONE union + ONE hash exchange,
    the same co-group idiom as ``hash_join`` — so every (left, right)
    pair that could match meets in exactly one bucket; no global sort
    of either side.  Inside a bucket both sides sort by ``on`` and a
    single vectorized ``polars.join_asof`` merge resolves every left
    row (O(n log n) per bucket, merge itself linear).

    Right-side non-key columns are renamed with ``suffix``; the right
    match timestamp comes back as ``on + suffix``.  If several right
    rows share an exact (by, on) pair the one that wins is
    engine-ordering-dependent — project the right side to columns
    determined by (by, on) when exact tie determinism matters.
    """
    both, l_cols, r_cols, all_fields, out_schema = _sided_union(
        left, right, by, suffix, "asof_join")
    on_r = on + suffix

    def asof_bucket(bucket: pa.Table) -> pa.Table:
        import polars as pl

        tmp = "__asof_on"
        df = pl.from_arrow(bucket)
        lhs = df.filter(pl.col(SIDE_COL) == 0).select(l_cols).sort(on)
        # join on a DUPLICATE of the right-on column so the matched
        # row's timestamp always survives as the plain data column
        # ``on_r`` — polars versions differ on whether join_asof keeps
        # or drops its right_on key
        rhs = (df.filter(pl.col(SIDE_COL) == 1).select(r_cols).sort(on_r)
               .with_columns(pl.col(on_r).alias(tmp)))
        out = lhs.join_asof(rhs, left_on=on, right_on=tmp, by=by,
                            strategy="backward")
        return (out.select([n for n, _ in all_fields])
                .to_arrow().cast(out_schema))

    return hash_exchange(both, by, asof_bucket, num_buckets)


def interval_join(left: ray.data.Dataset, right: ray.data.Dataset, by: str,
                  on: str, start: str, end: str, num_buckets: int = 64,
                  suffix: str = "_r", post=None) -> ray.data.Dataset:
    """Distributed range (interval) join — the second inequality join Ray
    Data lacks natively: each left point row (``by``, ``on``) matches
    every right interval row (``by``, ``start``, ``end``) with the same
    key and ``start <= on < end`` (half-open, inner join).

    Same partitioning contract as ``asof_join``: ONE union + ONE hash
    exchange on the equality key co-locates every possibly-matching
    pair; inside a bucket a vectorized polars equality join on ``by``
    followed by the interval filter resolves the matches.  Per-key work
    is O(points × intervals) for that key — the join's true output bound
    when intervals overlap — so, as with any PARTITION BY engine, a key's
    full history must fit one bucket task; size ``num_buckets`` with
    ``buckets_for`` and keep hot keys' interval counts bounded upstream.

    ``post`` (``fn(pa.Table) -> pa.Table``) runs on each bucket's joined
    rows INSIDE the bucket task — the same fusion hook as ``hash_join``:
    a consumer that immediately aggregates per interval (intervals
    belong to one key, hence one bucket) collapses the join output
    before it ever crosses an operator boundary.

    Right-side non-key columns (including ``start``/``end``) come back
    renamed with ``suffix``.
    """
    both, l_cols, r_cols, all_fields, out_schema = _sided_union(
        left, right, by, suffix, "interval_join")
    start_r, end_r = start + suffix, end + suffix

    def interval_bucket(bucket: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.from_arrow(bucket)
        lhs = df.filter(pl.col(SIDE_COL) == 0).select(l_cols)
        rhs = df.filter(pl.col(SIDE_COL) == 1).select(r_cols)
        out = (lhs.join(rhs, on=by, how="inner")
               .filter((pl.col(on) >= pl.col(start_r))
                       & (pl.col(on) < pl.col(end_r))))
        joined = (out.select([n for n, _ in all_fields])
                  .to_arrow().cast(out_schema))
        return post(joined) if post is not None else joined

    return hash_exchange(both, by, interval_bucket, num_buckets)


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


def topk_per_group(ds: ray.data.Dataset, group_col: str, order_col: str,
                   k: int, *, descending: bool = True,
                   tie_cols: list[str] | None = None,
                   num_buckets: int = 64) -> ray.data.Dataset:
    """Deterministic top-k rows per group (ordered by ``order_col``,
    ties broken by ``tie_cols`` ascending).

    Two-level, combiner-first: a per-BATCH partial top-k runs inside
    ``map_batches`` — each map task forwards at most k rows per group it
    saw — so the exchange that follows moves O(k × groups) skinny rows,
    never the input; the per-bucket final pass resolves across batches.
    This is the grouped analog of the global partial-top-k pattern in
    ``stages/featurize.py`` / ann's per-batch top-k."""
    ties = tie_cols or []

    def cut(t: pa.Table) -> pa.Table:
        import polars as pl

        if t.num_rows == 0 or group_col not in t.column_names:
            return t       # zero-COLUMN empty map block: pass through
        df = pl.from_arrow(t)
        out = (df.sort([order_col, *ties],
                       descending=[descending] + [False] * len(ties))
               .group_by(group_col, maintain_order=True).head(k))
        return out.select(df.columns).to_arrow().cast(t.schema)

    partial = ds.map_batches(cut, batch_format="pyarrow")
    return bucketed_groups(partial, group_col, cut, num_buckets,
                           engine="exchange")


# per-WORKER-PROCESS cache of broadcast dimension frames, keyed by the
# object ref: the first batch a worker sees pays one zero-copy plasma
# read + polars frame build, every later batch (from any task) reuses it.
# Plain tasks + a process cache beat an actor pool here: the warm Ray
# worker pool serves immediately (no per-actor spin-up/import), and the
# stage composes/fuses like any other map.  Bounded: dims are small by
# contract; evict oldest beyond a handful.
_BCAST_CACHE: dict = {}
_BCAST_CACHE_MAX = 8


def _bcast_frame(ref):
    import polars as pl

    key = ref.hex()
    rhs = _BCAST_CACHE.get(key)
    if rhs is None:
        rhs = pl.from_arrow(ray.get(ref))
        if len(_BCAST_CACHE) >= _BCAST_CACHE_MAX:
            _BCAST_CACHE.pop(next(iter(_BCAST_CACHE)))
        _BCAST_CACHE[key] = rhs
    return rhs


def broadcast_join(large: ray.data.Dataset, small: "pa.Table", on: str,
                   how: str = "inner", post=None,
                   batch_size: int | None = None) -> ray.data.Dataset:
    """Map-side (broadcast) join: a streaming large side ⋈ a bounded
    driver-resident dimension table, with NO shuffle of the large side.

    The canonical small-dimension pattern the prompt calls out: ``small``
    is ``ray.put`` into the object store ONCE; each worker process reads
    it zero-copy and builds its polars frame ONCE (``_bcast_frame``
    process cache — never per batch, never re-shipped per task); every
    large-side batch then joins locally inside ``map_batches``.
    Contrast ``hash_join``, which exchanges BOTH sides — use that when
    neither side fits in a worker's heap.

    Contract: ``small`` must fit in one worker's heap (dimension tables,
    lookup maps — NOT a second fact table); deduplication on ``on``
    is NOT required — duplicate keys multiply rows exactly like SQL.

    ``how`` ∈ {"inner", "left", "semi", "anti"} (polars semantics;
    semi/anti keep only large-side columns).  ``post`` fuses a consumer
    (e.g. a partial aggregate) into the join task so wide joined rows
    never cross an operator boundary.

    Reference analog: the reference's index wrappers resolve mentions
    against broadcast in-memory maps on every worker
    (src/main/scala/index/AllIndexesBox.scala) — this is that pattern as
    a first-class relational operator.
    """
    if how not in ("inner", "left", "semi", "anti"):
        raise ValueError(f"broadcast_join: unsupported how={how!r}")
    if large.schema() is None:
        return large                     # schema-less empty large side
    keep_small = [] if how in ("semi", "anti") else \
        [n for n in small.column_names if n != on]
    lf = {f.name for f in large.schema().base_schema}
    overlap = lf & set(keep_small)
    if overlap:
        raise ValueError(f"broadcast_join column collision: {sorted(overlap)}")
    small_ref = ray.put(small.select([on] + keep_small))
    out_fields = [(f.name, f.type) for f in large.schema().base_schema] + \
        [(n, small.schema.field(n).type) for n in keep_small]
    empty_out = pa.schema(out_fields).empty_table()

    def join_batch(t: pa.Table) -> pa.Table:
        import polars as pl

        if t.num_rows == 0 or on not in t.column_names:
            # zero-COLUMN empty map block — emit the joined shape so
            # `post` and downstream consumers see a consistent schema
            return post(empty_out) if post is not None else empty_out
        out = (pl.from_arrow(t)
               .join(_bcast_frame(small_ref), on=on, how=how,
                     maintain_order="left").to_arrow())
        return post(out) if post is not None else out

    return large.map_batches(join_batch, batch_format="pyarrow",
                             batch_size=batch_size)


def salted_join(left: ray.data.Dataset, right: ray.data.Dataset, on: str,
                salt: int = 8, num_buckets: int = 64, how: str = "inner",
                post=None) -> ray.data.Dataset:
    """Skew-resilient variant of ``hash_join`` for HOT KEYS: a plain
    hash join puts ALL rows of one key in one bucket, so a key holding
    10% of a 100 TB fact table pins 10 TB on a single task.  Here each
    LEFT row is assigned one of ``salt`` sub-keys (round-robin per
    batch) and the RIGHT side is replicated once per sub-key, so a hot
    key's left rows spread across ``salt`` buckets while every bucket
    still holds the right rows it needs.  Each (left row, right row)
    match meets in exactly one bucket — output is identical to
    ``hash_join`` for every ``how`` (inner/left/semi/anti).

    COST: the right side ships ``salt``× through the exchange — use
    when the right side is the small(er) side but too big for
    ``broadcast_join``, and the left carries the skew.  Same per-bucket
    fusion hook (``post``) as hash_join.

    Reference analog: the explicit document-size salting of the
    flagship blocker (stages/blocking.py) generalised to a relational
    join operator.
    """
    if how == "full":
        # right rows are replicated once per sub-key: an UNMATCHED right
        # row would surface `salt` times instead of once — full outer
        # needs the unsalted exchange
        raise ValueError("salted_join does not support how='full'; "
                         "use hash_join")
    if salt < 2:
        return hash_join(left, right, on, num_buckets, how, post)
    fb = _empty_side_fallback(left, right, how)
    if fb is not None:
        return fb
    lf = [(f.name, f.type) for f in left.schema().base_schema]
    rf = [(f.name, f.type) for f in right.schema().base_schema]
    l_names = [n for n, _ in lf]
    filtering = how in ("semi", "anti")
    r_rest = [] if filtering else [(n, t) for n, t in rf if n != on]
    overlap = set(l_names) & {n for n, _ in r_rest}
    if overlap:
        raise ValueError(f"salted_join column collision: {sorted(overlap)}")
    all_fields = lf + r_rest
    out_fields = lf if filtering else all_fields
    out_schema = pa.schema(out_fields)
    # i-th sub-key offset, wrapped mod 2^64 in Python ints (numpy scalar
    # multiply would emit a RuntimeWarning on the intended overflow)
    GOLDEN = 0x9E3779B97F4A7C15
    salt_off = np.array([(i * GOLDEN) & 0xFFFFFFFFFFFFFFFF
                         for i in range(salt)], dtype=np.uint64)

    def _aligned(t: pa.Table, side: int) -> dict:
        n = t.num_rows
        cols = {}
        for name, typ in all_fields:
            if name in t.column_names:
                col = t[name]
                cols[name] = col.cast(typ) if col.type != typ else col
            else:
                cols[name] = pa.nulls(n, type=typ)
        cols[SIDE_COL] = pa.array(np.full(n, side, dtype=np.int8))
        return cols

    def _key_hash(t: pa.Table) -> np.ndarray:
        import polars as pl

        return (pl.from_arrow(t[on].combine_chunks())
                .hash(seed=23).to_numpy().astype(np.uint64, copy=False))

    # Ray map operators emit zero-COLUMN blocks when a task's input has
    # no rows — pass those through as an empty ALIGNED table so the
    # union schema stays identical to the live path
    empty_aligned = pa.schema(
        all_fields + [(SIDE_COL, pa.int8()), (SKEY_COL, pa.int64()),
                      (SALT_COL, pa.int64())]).empty_table()

    def align_left(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or on not in t.column_names:
            return empty_aligned
        cols = _aligned(t, 0)
        h = _key_hash(t)
        sub = (np.arange(t.num_rows) % salt)
        cols[SKEY_COL] = pa.array((h + salt_off[sub]).view(np.int64))
        cols[SALT_COL] = pa.array(sub.astype(np.int64))
        return pa.table(cols)

    def align_right(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or on not in t.column_names:
            return empty_aligned
        cols = _aligned(t, 1)
        h = _key_hash(t)
        copies = []
        for i in range(salt):
            c = dict(cols)
            c[SKEY_COL] = pa.array((h + salt_off[i]).view(np.int64))
            c[SALT_COL] = pa.array(np.full(t.num_rows, i, dtype=np.int64))
            copies.append(pa.table(c))
        return pa.concat_tables(copies)

    both = left.map_batches(align_left, batch_format="pyarrow").union(
        right.map_batches(align_right, batch_format="pyarrow"))
    r_cols = [on, SALT_COL] + [n for n, _ in r_rest]

    def join_bucket(bucket: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.from_arrow(bucket)
        lhs = df.filter(pl.col(SIDE_COL) == 0).select(l_names + [SALT_COL])
        rhs = df.filter(pl.col(SIDE_COL) == 1).select(r_cols)
        # join on (key, salt): a bucket can coincidentally hold right
        # COPIES belonging to another sub-key of the same key — matching
        # on the key alone would join a left row against every such copy
        out = lhs.join(rhs, on=[on, SALT_COL], how=how)
        joined = (out.select([n for n, _ in out_fields])
                  .to_arrow().cast(out_schema))
        return post(joined) if post is not None else joined

    return hash_exchange(both, SKEY_COL, join_bucket, num_buckets)


def skew_join(left: ray.data.Dataset, right: ray.data.Dataset, on: str,
              hot_keys: dict, num_buckets: int = 64, how: str = "inner",
              post=None) -> ray.data.Dataset:
    """``hash_join`` with a PER-KEY salt map — the surgical version of
    ``salted_join``: only the keys named in ``hot_keys`` (key → salt
    count ≥ 2) are spread across sub-buckets, and the right side
    replicates each hot key's rows exactly ``salt_k`` times while COLD
    keys ship once, exactly as in a plain hash join.  ``salted_join``
    by contrast ships the ENTIRE right side ``salt``× — the right tool
    when the whole left is skew-prone; this one is the right tool when
    a handful of keys hold a disproportionate share (the Zipf reality
    of web-scale keys: one key with 10% of a 100 TB fact table pins
    10 TB on one task under a plain exchange).

    Output is identical to ``hash_join`` for every supported ``how``
    (inner/left/semi/anti): each (left row, right row) match meets in
    exactly one (key, sub-key) bucket.  ``how='full'`` is rejected —
    an unmatched hot right row would surface once per replica.

    The salt map rides the object store ONCE (``ray.put`` + the
    ``_bcast_frame`` per-worker cache); per batch the salt count
    resolves via one vectorized polars left join against it.
    """
    if how == "full":
        raise ValueError("skew_join does not support how='full'; "
                         "use hash_join")
    hot = {k: int(s) for k, s in hot_keys.items() if int(s) >= 2}
    if not hot:
        return hash_join(left, right, on, num_buckets, how, post)
    fb = _empty_side_fallback(left, right, how)
    if fb is not None:
        return fb
    lf = [(f.name, f.type) for f in left.schema().base_schema]
    rf = [(f.name, f.type) for f in right.schema().base_schema]
    l_names = [n for n, _ in lf]
    filtering = how in ("semi", "anti")
    r_rest = [] if filtering else [(n, t) for n, t in rf if n != on]
    overlap = set(l_names) & {n for n, _ in r_rest}
    if overlap:
        raise ValueError(f"skew_join column collision: {sorted(overlap)}")
    all_fields = lf + r_rest
    out_fields = lf if filtering else all_fields
    out_schema = pa.schema(out_fields)
    max_salt = max(hot.values())
    GOLDEN = 0x9E3779B97F4A7C15
    salt_off = np.array([(i * GOLDEN) & 0xFFFFFFFFFFFFFFFF
                         for i in range(max_salt)], dtype=np.uint64)
    key_type = dict(lf)[on]
    NSALT = "__nsalt"
    map_ref = ray.put(pa.table({
        on: pa.array(list(hot.keys()), type=key_type),
        NSALT: pa.array(list(hot.values()), type=pa.int64()),
    }))

    def _nsalt_for(t: pa.Table) -> np.ndarray:
        import polars as pl

        keys = pl.from_arrow(t.select([on]).combine_chunks())
        j = keys.join(_bcast_frame(map_ref), on=on, how="left",
                      maintain_order="left")
        return j[NSALT].fill_null(1).to_numpy().astype(np.int64,
                                                       copy=False)

    def _aligned(t: pa.Table, side: int) -> dict:
        n = t.num_rows
        cols = {}
        for name, typ in all_fields:
            if name in t.column_names:
                col = t[name]
                cols[name] = col.cast(typ) if col.type != typ else col
            else:
                cols[name] = pa.nulls(n, type=typ)
        cols[SIDE_COL] = pa.array(np.full(n, side, dtype=np.int8))
        return cols

    def _key_hash(t: pa.Table) -> np.ndarray:
        import polars as pl

        return (pl.from_arrow(t[on].combine_chunks())
                .hash(seed=23).to_numpy().astype(np.uint64, copy=False))

    # zero-COLUMN empty blocks (Ray map ops on fully-filtered input)
    # pass through as an empty ALIGNED table, mirroring salted_join
    empty_aligned = pa.schema(
        all_fields + [(SIDE_COL, pa.int8()), (SKEY_COL, pa.int64()),
                      (SALT_COL, pa.int64())]).empty_table()

    def align_left(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or on not in t.column_names:
            return empty_aligned
        cols = _aligned(t, 0)
        h = _key_hash(t)
        ns = _nsalt_for(t)
        sub = np.arange(t.num_rows, dtype=np.int64) % ns  # round-robin
        cols[SKEY_COL] = pa.array((h + salt_off[sub]).view(np.int64))
        cols[SALT_COL] = pa.array(sub)
        return pa.table(cols)

    def align_right(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or on not in t.column_names:
            return empty_aligned
        ns = _nsalt_for(t)
        idx = np.repeat(np.arange(t.num_rows, dtype=np.int64), ns)
        rep = t.take(pa.array(idx))
        cols = _aligned(rep, 1)
        h = _key_hash(rep)
        # copy index within each source row: 0..ns_i-1
        starts = np.repeat(np.cumsum(ns) - ns, ns)
        sub = np.arange(len(idx), dtype=np.int64) - starts
        cols[SKEY_COL] = pa.array((h + salt_off[sub]).view(np.int64))
        cols[SALT_COL] = pa.array(sub)
        return pa.table(cols)

    both = left.map_batches(align_left, batch_format="pyarrow").union(
        right.map_batches(align_right, batch_format="pyarrow"))
    r_cols = [on, SALT_COL] + [n for n, _ in r_rest]

    def join_bucket(bucket: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.from_arrow(bucket)
        lhs = df.filter(pl.col(SIDE_COL) == 0).select(l_names + [SALT_COL])
        rhs = df.filter(pl.col(SIDE_COL) == 1).select(r_cols)
        out = lhs.join(rhs, on=[on, SALT_COL], how=how)
        joined = (out.select([n for n, _ in out_fields])
                  .to_arrow().cast(out_schema))
        return post(joined) if post is not None else joined

    return hash_exchange(both, SKEY_COL, join_bucket, num_buckets)


def detect_hot_keys(ds: ray.data.Dataset, on: str, *,
                    sample_frac: float = 0.05, hot_frac: float = 0.01,
                    num_buckets: int = 64, max_salt: int = 16,
                    per_batch_top: int = 16,
                    seed: int = 7) -> dict:
    """Estimate the hot-key set of ``ds[on]`` from one cheap sampled
    pass: per sampled batch, the ``per_batch_top`` most frequent keys
    (plus the batch row count) — O(top × batches) skinny rows reach the
    driver, never the data.  A key is HOT when its sampled share is
    ≥ ``hot_frac``; its salt is sized so its rows spread to roughly the
    per-bucket average (share × num_buckets, clamped to [2, max_salt]).

    The estimate only steers PERFORMANCE: ``skew_join`` output is
    identical whatever map this returns (a missed hot key just joins
    unsalted; a false positive pays a few duplicate right rows), so the
    sampling noise of ``random_sample`` is harmless by construction —
    the reason this can be a sample instead of an exact histogram.
    """
    if ds.schema() is None:
        return {}
    key_field = next(f for f in ds.schema().base_schema if f.name == on)
    empty = pa.table({on: pa.array([], type=key_field.type),
                      "cnt": pa.array([], type=pa.int64()),
                      "bid": pa.array([], type=pa.string()),
                      "batch_n": pa.array([], type=pa.int64())})

    def topc(t: pa.Table) -> pa.Table:
        import uuid

        import polars as pl

        if t.num_rows == 0 or on not in t.column_names:
            return empty
        vc = (pl.from_arrow(t.select([on]).combine_chunks())[on]
              .value_counts(sort=True).head(per_batch_top))
        return pa.table({
            on: vc[on].to_arrow().cast(key_field.type),
            "cnt": vc["count"].cast(pl.Int64).to_arrow(),
            "bid": pa.array([uuid.uuid4().hex] * len(vc)),
            "batch_n": pa.array(np.full(len(vc), t.num_rows,
                                        dtype=np.int64)),
        })

    sample = ds if sample_frac >= 1.0 else ds.random_sample(sample_frac,
                                                            seed=seed)
    parts = sample.map_batches(topc, batch_format="pyarrow").to_pandas()
    if len(parts) == 0:
        return {}
    total = int(parts.drop_duplicates("bid")["batch_n"].sum())
    if total == 0:
        return {}
    by_key = parts.groupby(on, sort=False)["cnt"].sum()
    hot = {}
    for k, c in by_key.items():
        share = c / total
        if share >= hot_frac:
            hot[k] = int(min(max_salt,
                             max(2, int(np.ceil(share * num_buckets)))))
    return hot


def adaptive_skew_join(left: ray.data.Dataset, right: ray.data.Dataset,
                       on: str, num_buckets: int = 64, how: str = "inner",
                       post=None, *, sample_frac: float = 0.05,
                       hot_frac: float = 0.01,
                       max_salt: int = 16) -> ray.data.Dataset:
    """``hash_join`` that defends itself against key skew: sample the
    LEFT side's key histogram (``detect_hot_keys``), then salt exactly
    the detected hot keys (``skew_join``) — or run the plain join when
    the histogram is flat.  The detection pass costs one sampled scan
    of the left key column; the join result is identical either way.

    ``how='full'`` always routes to the plain ``hash_join`` (which
    supports it) — ``skew_join`` rejects full outer, and whether the
    detector fires depends on sampling noise, so branching on it would
    make the error data-dependent.
    """
    if how == "full" or left.schema() is None or right.schema() is None:
        return hash_join(left, right, on, num_buckets, how, post)
    hot = detect_hot_keys(left, on, sample_frac=sample_frac,
                          hot_frac=hot_frac, num_buckets=num_buckets,
                          max_salt=max_salt)
    if not hot:
        return hash_join(left, right, on, num_buckets, how, post)
    return skew_join(left, right, on, hot, num_buckets, how, post)


# --- distributed prefix sum (scan) -------------------------------------------

RNG_COL = "__rng"


def range_prefix_sum(ds: ray.data.Dataset, order_col: str, value_col: str,
                     out_name: str = "cum_before", *,
                     group_col: str | None = None,
                     range_width: int = 4096,
                     num_buckets: int = 64) -> ray.data.Dataset:
    """EXCLUSIVE running sum of ``value_col`` in ``order_col`` order
    (optionally per ``group_col``) — the distributed scan primitive Ray
    Data lacks.  Unlike a window over one hash bucket per group (the
    ``q53`` shape), this has NO single-task ceiling: a stream of any
    size splits across range buckets.

    Two light passes, no global sort:
    1. per-batch subtotals per (group, range) where range =
       ``order_col // range_width``, merged on the driver into exclusive
       base offsets — O(#ranges) driver state; size ``range_width`` so
       #ranges stays millions at most (at 10^10 rows, width 2^20 →
       ~10^4 ranges);
    2. ONE hash exchange on the range id; per bucket a local in-range
       sort + cumulative sum plus the broadcast base (base table read
       via the ``_bcast_frame`` per-process cache, never re-shipped).

    ``order_col`` and ``value_col`` must be integer columns; ties in
    ``order_col`` are broken by input order within a range (make
    ``order_col`` unique for fully deterministic output).
    """
    import pyarrow.compute as _pc

    keys = ([group_col] if group_col else []) + [RNG_COL]

    def subtotal(t: pa.Table) -> pa.Table:
        import polars as pl

        if t.num_rows == 0 or order_col not in t.column_names:
            return pa.table({})      # zero-COLUMN empty map block (the
                                     # driver merge filters empties)
        df = pl.from_arrow(t.select(
            ([group_col] if group_col else []) + [order_col, value_col]))
        df = df.with_columns(
            (pl.col(order_col) // range_width).alias(RNG_COL))
        return (df.group_by(keys)
                .agg(pl.col(value_col).sum().alias("__tot"))
                .to_arrow())

    # driver merge: O(groups × ranges) tiny rows
    import polars as pl

    parts = [pl.from_arrow(b) for b in ds
             .map_batches(subtotal, batch_format="pyarrow")
             .iter_batches(batch_format="pyarrow") if b.num_rows]
    if parts:
        tot = (pl.concat(parts).group_by(keys)
               .agg(pl.col("__tot").sum()).sort(keys))
        base = tot.with_columns(
            (pl.col("__tot").cum_sum() - pl.col("__tot"))
            .over(group_col).alias("__base")
            if group_col else
            (pl.col("__tot").cum_sum() - pl.col("__tot")).alias("__base")
        ).select(keys + ["__base"])
    else:
        schema = {RNG_COL: pl.Int64, "__base": pl.Int64}
        if group_col:
            schema = {group_col: pl.String, **schema}
        base = pl.DataFrame(schema=schema)
    base_ref = ray.put(base.to_arrow())

    def add_rng(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or order_col not in t.column_names:
            return t                 # scan_bucket's inert-empty guard
        rng = _pc.divide(t[order_col], range_width)
        return t.append_column(RNG_COL, _pc.cast(rng, pa.int64()))

    def scan_bucket(t: pa.Table) -> pa.Table:
        import polars as pl

        if t.num_rows == 0 and RNG_COL not in t.schema.names:
            return t  # schema-less empty block: pass through inert
        df = pl.from_arrow(t).sort(keys + [order_col])
        pb = _bcast_frame(base_ref)
        out = (df.join(pb, on=keys, how="left")
               .with_columns(pl.col("__base").fill_null(0))
               .with_columns(
                   ((pl.col(value_col).cum_sum() - pl.col(value_col))
                    .over(keys) + pl.col("__base")).alias(out_name))
               .drop([RNG_COL, "__base"]))
        return out.to_arrow()

    keyed = ds.map_batches(add_rng, batch_format="pyarrow")
    return hash_exchange(keyed, RNG_COL, scan_bucket, num_buckets)
