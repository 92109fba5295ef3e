"""Every oracle-paired query must match its DuckDB twin at sf0.001
(the driver repeats this at sf0.01 → CORRECTNESS_r{N}.json)."""

import pytest

from pboh_entity_linking_ray.oracle import compare
from pboh_entity_linking_ray.pipelines import linkage_queries
from pboh_entity_linking_ray.registry import all_queries
from pboh_entity_linking_ray.sources.synthetic import corpus_dir, sf_to_n_convs

SF_DIR = "/root/testdata/sf0.001"

PAIRED = {name: (fn, sql) for name, (fn, sql) in all_queries().items()
          if sql is not None}


def _local_sql(sql: str) -> str:
    """linkage SQL twins embed the sf0.01 corpus path (the driver's compare
    scale); point them at the sf0.001 corpus for the local test."""
    local = corpus_dir(linkage_queries.CORPUS_CACHE, sf_to_n_convs(SF_DIR))
    sql = sql.replace(linkage_queries._SQL_TURNS,
                      f"{local}/turns.parquet/*.parquet")
    # other corpus-relative files (e.g. turn_lines.parquet) share the dir
    sql = sql.replace(corpus_dir(linkage_queries.CORPUS_CACHE, 2000), local)
    # q196's evolving shards are keyed by the sf basename
    return sql.replace("/tmp/pboh_ray_evolving/sf0.01",
                       "/tmp/pboh_ray_evolving/sf0.001")


@pytest.mark.parametrize("name", sorted(PAIRED))
def test_query_matches_oracle(name, ray_session):
    fn, sql = PAIRED[name]
    result = fn(SF_DIR)          # also materializes the corpus cache
    ok, msg = compare(result, _local_sql(sql), SF_DIR)
    assert ok, f"{name}: {msg}"


ROWS_ONLY = {
    name: fn for name, (fn, sql) in all_queries().items()
    if sql is None and name not in ("link_pairs_scored", "link_clusters",
                                    "link_eval_metrics")
}                                      # heavy full-pipeline ones are covered
                                       # by the golden tests


@pytest.mark.parametrize("name", sorted(ROWS_ONLY))
def test_rows_only_queries_run(name, ray_session):
    from pboh_entity_linking_ray.oracle import to_pandas

    out = to_pandas(ROWS_ONLY[name](SF_DIR))
    assert len(out) > 0
