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


def test_nysiis_textbook_vectors_and_blocking(ray_session):
    from pboh_entity_linking_ray.pipelines.er import (_nysiis,
                                                      q188_nysiis_blocking)

    # textbook vectors (Taft 1970, untruncated modern variant)
    assert _nysiis("knuth") == "NAT"
    assert _nysiis("macintosh") == "MCANT"
    assert _nysiis("phillipson") == "FALAPSAN"
    # spelling variants collide; unrelated names do not
    assert _nysiis("knight") == _nysiis("night")
    assert _nysiis("bertha") == _nysiis("berta")
    assert _nysiis("robert") != _nysiis("lopez")
    assert _nysiis("") == "" and _nysiis("42") == ""

    out = q188_nysiis_blocking("/root/testdata/sf0.001").to_pandas()
    assert len(out) > 0
    assert (out["n_pairs"]
            == out["n_parts"] * (out["n_parts"] - 1) // 2).all()
    assert (out["n_words"] <= out["n_parts"]).all()
    # NYSIIS blocks are at least as fine as Soundex's on the same words
    from pboh_entity_linking_ray.pipelines.er import q128_soundex_blocking
    sx = q128_soundex_blocking("/root/testdata/sf0.001").to_pandas()
    assert len(out) >= len(sx)
