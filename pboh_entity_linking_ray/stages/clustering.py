"""Transitive clustering: matched pairs → connected components.

Iterative hash-partitioned union-find with NO driver-side graph and NO
large-side join: the large-star / small-star edge-contraction algorithm
("Connected Components in MapReduce and Beyond", Kiveris et al., SoCC'14)
needs only ``groupby(node).map_groups`` over the edge set per round and
converges in O(log n) rounds.  The reference has no clustering analog —
its per-document solutions are independent (SURVEY.md §4.2 item 6) — so
this operator is new, designed Ray-Data-first.

Node ids are conversation-id strings; "min" is lexicographic, making the
final ``cluster_id`` the minimum conv_id of each component (golden-fixture
contract, FIXTURES.md §3) with no extra pass.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from ray.data.aggregate import Sum

_EDGE_SCHEMA = pa.schema([("u", pa.string()), ("v", pa.string())])


def _doubled(edges: ray.data.Dataset) -> ray.data.Dataset:
    both = edges.map_batches(
        lambda t: pa.table({
            "u": pa.concat_arrays([t["u"].combine_chunks(), t["v"].combine_chunks()]),
            "v": pa.concat_arrays([t["v"].combine_chunks(), t["u"].combine_chunks()]),
        }),
        batch_format="pyarrow",
    )
    return both


def _large_star_group(group: pa.Table) -> pa.Table:
    u = group["u"][0].as_py()
    nbrs = np.unique(np.asarray(group["v"], dtype=object))
    m = min(u, nbrs[0])
    out_v = nbrs[nbrs > u]
    if len(out_v) == 0:
        return _EDGE_SCHEMA.empty_table()
    return pa.table({"u": pa.array(out_v, type=pa.string()),
                     "v": pa.array([m] * len(out_v), type=pa.string())})


def _small_star_group(group: pa.Table) -> pa.Table:
    u = group["u"][0].as_py()
    nbrs = np.unique(np.asarray(group["v"], dtype=object))
    le = nbrs[nbrs < u]
    members = np.append(le, u)
    m = members.min()
    out = members[members != m]
    if len(out) == 0:
        return _EDGE_SCHEMA.empty_table()
    return pa.table({"u": pa.array(out, type=pa.string()),
                     "v": pa.array([m] * len(out), type=pa.string())})


def _dedup_edges(edges: ray.data.Dataset) -> ray.data.Dataset:
    def key(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        k = pc.binary_join_element_wise(t["u"], t["v"], "\x1f")
        return t.append_column("ek", k)

    keyed = edges.map_batches(key, batch_format="pyarrow")
    return keyed.groupby("ek").map_groups(
        lambda g: g.slice(0, 1), batch_format="pyarrow"
    ).select_columns(["u", "v"])


def _checksum(edges: ray.data.Dataset) -> tuple[int, int]:
    def h(t: pa.Table) -> pa.Table:
        import polars as pl
        if t.num_rows == 0:
            return pa.table({"h": pa.array([], type=pa.int64()),
                             "c": pa.array([], type=pa.int64())})
        s = (pl.from_arrow(t["u"].combine_chunks()) + "\x1f"
             + pl.from_arrow(t["v"].combine_chunks())).hash(seed=3)
        x = int(np.bitwise_xor.reduce(s.to_numpy().astype(np.uint64)))
        return pa.table({
            # mask into int-range: Sum aggregates must stay within int64
            "h": pa.array([x & 0x7FFFFFFF], type=pa.int64()),
            "c": pa.array([t.num_rows], type=pa.int64()),
        })

    part = edges.map_batches(h, batch_format="pyarrow")
    agg = part.aggregate(Sum("h", alias_name="hs"), Sum("c", alias_name="cs"))
    return int(agg.get("hs") or 0), int(agg.get("cs") or 0)


def connected_components(
    edges: ray.data.Dataset, max_rounds: int = 50
) -> ray.data.Dataset:
    """edges(u, v) → labels(conv_id, cluster_id); only nodes present in
    edges appear (callers union in singletons)."""
    cur = _dedup_edges(edges).materialize()
    prev_sum = None
    for _ in range(max_rounds):
        ls = _dedup_edges(
            _doubled(cur).groupby("u").map_groups(
                _large_star_group, batch_format="pyarrow"
            )
        )
        ss = _doubled(ls).groupby("u").map_groups(
            _small_star_group, batch_format="pyarrow"
        )
        cur = _dedup_edges(ss).materialize()
        cs = _checksum(cur)
        if cs == prev_sum:
            break
        prev_sum = cs

    # final labels: min over (self ∪ neighbors)
    def label_group(group: pa.Table) -> pa.Table:
        u = group["u"][0].as_py()
        m = min(u, min(group["v"].to_pylist()))
        return pa.table({"conv_id": pa.array([u], type=pa.string()),
                         "cluster_id": pa.array([m], type=pa.string())})

    return _doubled(cur).groupby("u").map_groups(
        label_group, batch_format="pyarrow"
    )


def cluster_matches(
    matches: ray.data.Dataset, all_convs: ray.data.Dataset
) -> ray.data.Dataset:
    """matches(conv_a, conv_b) + the full conv universe → one row per
    conversation (singletons become their own cluster)."""
    edges = matches.map_batches(
        lambda t: pa.table({"u": t["conv_a"].combine_chunks(),
                            "v": t["conv_b"].combine_chunks()}),
        batch_format="pyarrow",
    )
    labeled = connected_components(edges)
    self_rows = all_convs.map_batches(
        lambda t: pa.table({"conv_id": t["conv_id"].combine_chunks(),
                            "cluster_id": t["conv_id"].combine_chunks()}),
        batch_format="pyarrow",
    )

    def pick_min(group: pa.Table) -> pa.Table:
        return pa.table({
            "conv_id": pa.array([group["conv_id"][0].as_py()], type=pa.string()),
            "cluster_id": pa.array([min(group["cluster_id"].to_pylist())],
                                   type=pa.string()),
        })

    return labeled.union(self_rows).groupby("conv_id").map_groups(
        pick_min, batch_format="pyarrow"
    )
