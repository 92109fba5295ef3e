"""link_rank_histogram (SURVEY §2 G10, reference GlobalCountersCWEB):
conservation and golden-corpus invariants."""

import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def hist(ray_session):
    from pboh_entity_linking_ray.registry import all_queries

    return all_queries()["link_rank_histogram"][0](SF)


def test_rank_histogram_conserves_labeled_positives(hist, ray_session):
    import pyarrow.compute as pc

    from pboh_entity_linking_ray.pipelines.linkage_queries import _labels

    labels = _labels(SF)
    n_pos = int(pc.sum(pc.cast(labels["is_match"], "int64")).as_py())
    # each labeled pair is ranked from BOTH endpoints
    assert hist["n"].sum() == 2 * n_pos


def test_rank_histogram_golden_invariants(hist):
    d = dict(zip(hist["bucket"], hist["n"]))
    # the golden corpus' blocking surfaces every labeled pair (PC = 1)
    assert d.get("not_in_candidates", 0) == 0
    # true partners dominate the top ranks on a clean fixture
    assert d.get("1", 0) > 0
    assert set(hist["bucket"]) <= {"1", "2", "3", "4-8", "9-16", "17-32",
                                   "33-64", ">64", "not_in_candidates"}
