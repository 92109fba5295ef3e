"""broadcast_join: map-side join against a ray.put dimension table."""

import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from pboh_entity_linking_ray.functions.grouping import broadcast_join

LARGE = pa.table({"k": [1, 2, 2, 3, 5], "lv": ["a", "b", "c", "d", "e"]})
DIM = pa.table({"k": [2, 3, 3, 4], "rv": [20, 30, 31, 40]})


def _run(how):
    ds = ray.data.from_arrow(LARGE).repartition(3)
    return (broadcast_join(ds, DIM, "k", how=how).to_pandas()
            .sort_values(["k", "lv"]).reset_index(drop=True))


def test_inner_matches_pandas(ray_session):
    got = _run("inner").sort_values(["k", "lv", "rv"]).reset_index(drop=True)
    want = (LARGE.to_pandas().merge(DIM.to_pandas(), on="k")
            .sort_values(["k", "lv", "rv"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got[want.columns.tolist()], want)


def test_left_keeps_unmatched(ray_session):
    got = _run("left")
    assert len(got) == 6                      # k=3 matches twice
    assert got[got.k == 1]["rv"].isna().all()


def test_semi_anti_keep_left_columns_only(ray_session):
    semi, anti = _run("semi"), _run("anti")
    assert list(semi.columns) == ["k", "lv"] == list(anti.columns)
    assert sorted(semi.k) == [2, 2, 3] and sorted(anti.k) == [1, 5]


def test_post_fuses_consumer(ray_session):
    ds = ray.data.from_arrow(LARGE).repartition(2)

    def post(t: pa.Table) -> pa.Table:
        import polars as pl

        return (pl.from_arrow(t).group_by("k")
                .agg(pl.len().cast(pl.Int64).alias("n")).to_arrow())

    got = broadcast_join(ds, DIM, "k", post=post).to_pandas()
    assert got.groupby("k")["n"].sum().to_dict() == {2: 2, 3: 2}


def test_collision_and_bad_how_rejected(ray_session):
    ds = ray.data.from_arrow(pa.table({"k": [1], "rv": [9]}))
    with pytest.raises(ValueError, match="collision"):
        broadcast_join(ds, DIM, "k")
    with pytest.raises(ValueError, match="how"):
        broadcast_join(ds, DIM, "k", how="outer")
