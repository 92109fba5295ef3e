"""Distributed connected components vs the single-process union-find oracle
(FIXTURES.md §3 oracle pattern)."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from pboh_entity_linking_ray.stages.clustering import (
    cluster_matches,
    connected_components,
)
from pboh_entity_linking_ray.state.unionfind import cluster_edges


def _random_edges(rng, n_nodes, n_edges):
    nodes = [f"n{i:04d}" for i in range(n_nodes)]
    pairs = set()
    while len(pairs) < n_edges:
        i, j = rng.integers(0, n_nodes, size=2)
        if i != j:
            a, b = sorted((nodes[int(i)], nodes[int(j)]))
            pairs.add((a, b))
    return sorted(pairs)


def test_cc_matches_unionfind_oracle(ray_session):
    rng = np.random.default_rng(17)
    edges = _random_edges(rng, 120, 90)
    ds = rd.from_arrow(pa.table({
        "u": [a for a, _ in edges], "v": [b for _, b in edges],
    }))
    got = connected_components(ds).to_pandas()
    expect = cluster_edges(edges)
    got_map = dict(zip(got["conv_id"], got["cluster_id"]))
    assert got_map == {k: v for k, v in expect.items()}


def test_cc_long_chain(ray_session):
    # a path graph exercises the O(log n) contraction depth
    nodes = [f"c{i:03d}" for i in range(64)]
    ds = rd.from_arrow(pa.table({"u": nodes[:-1], "v": nodes[1:]}))
    got = connected_components(ds).to_pandas()
    assert set(got["cluster_id"]) == {nodes[0]}
    assert len(got) == 64


def test_cluster_matches_includes_singletons(ray_session):
    matches = rd.from_arrow(pa.table({
        "conv_a": ["a", "b"], "conv_b": ["b", "c"],
    }))
    universe = rd.from_arrow(pa.table({"conv_id": ["a", "b", "c", "d", "e"]}))
    out = cluster_matches(matches, universe).to_pandas().sort_values("conv_id")
    assert dict(zip(out["conv_id"], out["cluster_id"])) == {
        "a": "a", "b": "a", "c": "a", "d": "d", "e": "e",
    }


def test_cc_edge_order_invariance(ray_session):
    rng = np.random.default_rng(23)
    edges = _random_edges(rng, 60, 50)
    rev = list(reversed(edges))
    ds1 = rd.from_arrow(pa.table({"u": [a for a, _ in edges], "v": [b for _, b in edges]}))
    ds2 = rd.from_arrow(pa.table({"u": [a for a, _ in rev], "v": [b for _, b in rev]}))
    g1 = connected_components(ds1).to_pandas().sort_values("conv_id").reset_index(drop=True)
    g2 = connected_components(ds2).to_pandas().sort_values("conv_id").reset_index(drop=True)
    assert g1.equals(g2)
