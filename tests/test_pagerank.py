"""q68 PageRank invariants beyond the oracle twin: mass conservation,
positivity, and degree monotonicity on the purchase graph."""

import numpy as np


def test_pagerank_mass_and_positivity(ray_session):
    from pboh_entity_linking_ray.pipelines.analytics import (
        PR_PART_OFF,
        q68_pagerank,
    )

    out = q68_pagerank("/root/testdata/sf0.001").to_pandas()
    assert len(out) > 0
    assert (out["pr_e9"] > 0).all()
    # symmetric graph, no dangling nodes → power iteration conserves mass
    assert abs(out["pr_e9"].sum() / 1e9 - 1.0) < 1e-3
    # both node namespaces present and disjoint
    cust = out[out["node_id"] < PR_PART_OFF]
    part = out[out["node_id"] >= PR_PART_OFF]
    assert len(cust) > 0 and len(part) > 0
    assert out["node_id"].is_unique


def test_pagerank_follows_degree(ray_session):
    """On a near-regular bipartite purchase graph PageRank correlates
    strongly with degree — the sanity anchor that the iteration actually
    propagates mass along edges."""
    import duckdb

    from pboh_entity_linking_ray.pipelines.analytics import (
        PR_PART_OFF,
        q68_pagerank,
    )

    sf = "/root/testdata/sf0.001"
    out = q68_pagerank(sf).to_pandas().set_index("node_id")
    deg = duckdb.sql(f"""
        WITH cp AS (SELECT DISTINCT o.o_custkey AS c,
                          {PR_PART_OFF} + l.l_partkey AS p
                    FROM '{sf}/orders.parquet' o
                    JOIN '{sf}/lineitem.parquet' l
                      ON l.l_orderkey = o.o_orderkey),
        e AS (SELECT c AS src FROM cp UNION ALL SELECT p FROM cp)
        SELECT src AS node_id, count(*) AS d FROM e GROUP BY src
    """).df().set_index("node_id")
    j = out.join(deg, how="inner")
    assert len(j) == len(out)
    corr = np.corrcoef(j["pr_e9"], j["d"])[0, 1]
    assert corr > 0.9
