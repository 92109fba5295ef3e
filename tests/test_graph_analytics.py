"""q84 triangle counting and q85 skyline invariants beyond the oracle
twins: the skyline kernel against a brute-force dominance check, and the
triangle counter against an exact numpy clique count on the real corpus.
"""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from pboh_entity_linking_ray.pipelines.analytics import _skyline_kernel


def _brute_skyline(s: np.ndarray, p: np.ndarray) -> np.ndarray:
    """O(n²) dominance filter — the definition, as the test oracle."""
    keep = np.ones(len(s), dtype=bool)
    for i in range(len(s)):
        dom = (s <= s[i]) & (p <= p[i]) & ((s < s[i]) | (p < p[i]))
        keep[i] = not dom.any()
    return keep


@settings(max_examples=60, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 8), st.integers(0, 8)),
                min_size=0, max_size=40))
def test_skyline_kernel_matches_bruteforce(points):
    s = np.array([a for a, _ in points], dtype=np.int64)
    p = np.array([b for _, b in points], dtype=np.int64)
    t = pa.table({"part_id": pa.array(np.arange(len(s), dtype=np.int64)),
                  "size": pa.array(s), "cents": pa.array(p)})
    got = _skyline_kernel(t)
    want = np.flatnonzero(_brute_skyline(s, p))
    assert got["part_id"].to_pylist() == want.tolist()


def test_skyline_keeps_duplicate_frontier_points():
    t = pa.table({"part_id": pa.array([1, 2, 3], type=pa.int64()),
                  "size": pa.array([5, 5, 9], type=pa.int64()),
                  "cents": pa.array([10, 10, 3], type=pa.int64())})
    out = _skyline_kernel(t)
    # the two identical (5, 10) points don't strictly dominate each
    # other; (9, 3) is incomparable — all three survive
    assert sorted(out["part_id"].to_pylist()) == [1, 2, 3]


def test_triangles_match_exact_count(ray_session):
    """End-to-end q84 vs an exact dense-adjacency triangle count of the
    same co-purchase graph (A³ diagonal / 2 per node) — independent of
    both the Ray plan and the SQL twin's join order."""
    import duckdb

    from pboh_entity_linking_ray.pipelines.analytics import q84_triangles

    sf = "/root/testdata/sf0.001"
    out = q84_triangles(sf).to_pandas().set_index("node_id")["tri"]

    edges = duckdb.sql(f"""
        SELECT DISTINCT l1.l_partkey AS a, l2.l_partkey AS b
        FROM '{sf}/lineitem.parquet' l1 JOIN '{sf}/lineitem.parquet' l2
          ON l1.l_orderkey = l2.l_orderkey AND l1.l_partkey < l2.l_partkey
    """).df()
    nodes = np.unique(np.r_[edges["a"].to_numpy(), edges["b"].to_numpy()])
    idx = {int(v): i for i, v in enumerate(nodes)}
    adj = np.zeros((len(nodes), len(nodes)), dtype=np.int64)
    ai = np.array([idx[int(v)] for v in edges["a"]])
    bi = np.array([idx[int(v)] for v in edges["b"]])
    adj[ai, bi] = 1
    adj[bi, ai] = 1
    per_node = np.diag(adj @ adj @ adj) // 2

    want = {int(nodes[i]): int(c) for i, c in enumerate(per_node) if c > 0}
    got = {int(k): int(v) for k, v in out.items()}
    assert got == want


def _sorted_df(ds, cols):
    df = ds.to_pandas()
    return df.sort_values(cols).reset_index(drop=True)


def test_q137_anti_join_path_matches_broadcast(ray_session, monkeypatch):
    """q137's scale fallback (edge set > TRI_BCAST_MAX → anti hash_join
    instead of the driver-collect + broadcast closure probe) must score
    the identical top edge set.  Forced by pinning the cap to 0."""
    from pboh_entity_linking_ray.pipelines import analytics

    sf = "/root/testdata/sf0.001"
    want = _sorted_df(analytics.q137_link_prediction(sf),
                      ["ra_e6", "a", "b"])
    monkeypatch.setattr(analytics, "TRI_BCAST_MAX", 0)
    got = _sorted_df(analytics.q137_link_prediction(sf),
                     ["ra_e6", "a", "b"])
    assert got.equals(want)


def test_q144_semi_join_path_matches_broadcast(ray_session, monkeypatch):
    """q144's scale fallback (match graph > TRI_BCAST_MAX → wedge
    stream ⋉ edge keys via SEMI hash_join + recount exchange) must
    produce the identical per-node closure table."""
    from pboh_entity_linking_ray.pipelines import analytics, er

    sf = "/root/testdata/sf0.001"
    want = _sorted_df(er.q144_transitivity_audit(sf), ["node"])
    monkeypatch.setattr(analytics, "TRI_BCAST_MAX", 0)
    got = _sorted_df(er.q144_transitivity_audit(sf), ["node"])
    assert got.equals(want)
