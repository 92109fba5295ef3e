"""Determinism + routing invariants of the T6-T8 split/sample/shuffle
operators (content-hash routing replaces the reference's Math.random
routing, SplitFileIntoDevValidationTest.scala:21-35)."""

import numpy as np
import pyarrow as pa
import ray.data

from pboh_entity_linking_ray.pipelines.sampling import (
    SPLIT_EDGES,
    split_routes,
)


def _toy(n=500):
    return ray.data.from_arrow(pa.table({"doc_id": list(range(n))}))


def test_split_deterministic_and_total(ray_session):
    a = split_routes(_toy(), "doc_id").to_pandas().sort_values("doc_id")
    b = split_routes(_toy(), "doc_id").to_pandas().sort_values("doc_id")
    assert (a["split"].to_numpy() == b["split"].to_numpy()).all()
    names = {name for _, name in SPLIT_EDGES}
    assert set(a["split"]) <= names
    assert len(a) == 500                      # total routing: no row dropped


def test_split_row_order_invariant(ray_session):
    """Routing is a pure function of the key — shuffling input rows
    changes nothing (the property the reference's Math.random lacks)."""
    fwd = split_routes(_toy(), "doc_id").to_pandas()
    rev = split_routes(
        ray.data.from_arrow(pa.table({"doc_id": list(range(499, -1, -1))})),
        "doc_id",
    ).to_pandas()
    m = fwd.merge(rev, on="doc_id", suffixes=("_f", "_r"))
    assert (m["split_f"] == m["split_r"]).all()


def test_split_md5_and_fast_agree_on_shape(ray_session):
    """Both hashers produce a full partition into the same split names
    with plausible proportions (not identical routes — different hash)."""
    md5 = split_routes(_toy(2000), "doc_id", hasher="md5").to_pandas()
    fast = split_routes(_toy(2000), "doc_id", hasher="fast").to_pandas()
    for df in (md5, fast):
        counts = df["split"].value_counts()
        assert counts.get("index", 0) > counts.get("val", 0)
        assert len(df) == 2000


def test_stratified_sample_rates_and_determinism(ray_session):
    from pboh_entity_linking_ray.pipelines.sampling import stratified_sample

    n = 4000
    t = pa.table({
        "doc_id": list(range(n)),
        "lang": ["en" if i % 2 else "de" for i in range(n)],
    })
    ds = ray.data.from_arrow(t)
    out = stratified_sample(ds, "doc_id", "lang", {"en": 1000}, 5000)
    a = out.to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = (stratified_sample(ray.data.from_arrow(t), "doc_id", "lang",
                           {"en": 1000}, 5000)
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert a.equals(b)                       # deterministic
    rates = a.groupby("lang").size() / (n / 2)
    assert 0.05 <= rates["en"] <= 0.15       # ~10% of en
    assert 0.42 <= rates["de"] <= 0.58       # ~50% default stratum
