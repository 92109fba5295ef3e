"""Every oracle-paired query must match its DuckDB twin at sf0.001
(the driver repeats this at sf0.01 → CORRECTNESS_r{N}.json)."""

import pytest

from pboh_entity_linking_ray.oracle import compare
from pboh_entity_linking_ray.pipelines.relational import QUERIES

SF_DIR = "/root/testdata/sf0.001"


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, ray_session):
    fn, sql = QUERIES[name]
    ok, msg = compare(fn(SF_DIR), sql, SF_DIR)
    assert ok, f"{name}: {msg}"
