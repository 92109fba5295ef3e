"""Keyword search: rank semantics beyond the oracle-parity row."""

from pboh_entity_linking_ray.pipelines import search

SF_DIR = "/root/testdata/sf0.001"


def test_keyword_search_rank_semantics(ray_session):
    got = (search.q55_keyword_search(SF_DIR).to_pandas()
           .sort_values(["query_id", "score", "doc_id"],
                        ascending=[True, False, True]))
    sizes = got.groupby("query_id").size()
    assert set(sizes.index) == set(search.SEARCH_QUERIES)
    assert (sizes <= search.SEARCH_TOP_K).all()
    assert (got["score"] > 0).all()
    # deterministic across runs (df pass + rank tie-breaks are stable)
    again = (search.q55_keyword_search(SF_DIR).to_pandas()
             .sort_values(["query_id", "score", "doc_id"],
                          ascending=[True, False, True]))
    assert got.reset_index(drop=True).equals(again.reset_index(drop=True))
