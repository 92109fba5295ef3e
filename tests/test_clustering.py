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


def test_cc_distributed_rounds_match_local_finish(ray_session):
    """local_finish_rows=0 forces pure star-contraction rounds; the
    result must equal the hybrid (local-finish) path and the oracle."""
    rng = np.random.default_rng(31)
    edges = _random_edges(rng, 100, 80)
    ds = rd.from_arrow(pa.table({
        "u": [a for a, _ in edges], "v": [b for _, b in edges],
    }))
    got = connected_components(ds, local_finish_rows=0).to_pandas()
    expect = cluster_edges(edges)
    assert dict(zip(got["conv_id"], got["cluster_id"])) == dict(expect.items())


def test_cc_iter_checkpoint_resume(ray_session, tmp_path):
    """K4 analog (periodic weight dumps, utils/OptimizedRhosMap.scala:89-97):
    star-round frontiers checkpoint every round; a re-run against the same
    root resumes from the newest frontier — proven by feeding the resumed
    run EMPTY edges, which could only produce the full labeling if the
    checkpointed frontier (not the input) was used."""
    root = str(tmp_path / "cc_ckpt")
    nodes = [f"c{i:03d}" for i in range(48)]
    ds = rd.from_arrow(pa.table({"u": nodes[:-1], "v": nodes[1:]}))
    base = connected_components(ds, local_finish_rows=0)\
        .to_pandas().sort_values("conv_id").reset_index(drop=True)
    ckpt = connected_components(
        ds, local_finish_rows=0, iter_checkpoint_root=root,
        checkpoint_every=1,
    ).to_pandas().sort_values("conv_id").reset_index(drop=True)
    assert ckpt.equals(base)
    import os
    rounds = [d for d in os.listdir(root) if d.startswith("round=")]
    assert len(rounds) == 1          # older rounds pruned, newest kept

    empty = rd.from_arrow(pa.table({
        "u": pa.array([], type=pa.string()),
        "v": pa.array([], type=pa.string())}))
    resumed = connected_components(
        empty, local_finish_rows=0, iter_checkpoint_root=root,
        checkpoint_every=1,
    ).to_pandas().sort_values("conv_id").reset_index(drop=True)
    assert resumed.equals(base)


def test_cc_edge_order_invariance(ray_session):
    rng = np.random.default_rng(23)
    edges = _random_edges(rng, 60, 50)
    rev = list(reversed(edges))
    ds1 = rd.from_arrow(pa.table({"u": [a for a, _ in edges], "v": [b for _, b in edges]}))
    ds2 = rd.from_arrow(pa.table({"u": [a for a, _ in rev], "v": [b for _, b in rev]}))
    g1 = connected_components(ds1).to_pandas().sort_values("conv_id").reset_index(drop=True)
    g2 = connected_components(ds2).to_pandas().sort_values("conv_id").reset_index(drop=True)
    assert g1.equals(g2)
