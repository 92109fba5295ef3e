"""PinnedShards: key co-location, state building, and repeated routed
probes against the pinned side must match a plain join.

The state/probe functions are defined INSIDE the test: a test module is
not importable on Ray workers, so module-level functions would pickle
by reference and fail to resolve — nested functions serialize by value
(package users hit neither case; see q68's module-level _graph_state).
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from pboh_entity_linking_ray.functions.pinned import PinnedShards


def test_pinned_shards_colocate_and_probe(ray_session):
    def _state(tbl):
        import polars as pl

        return None if tbl is None else pl.from_arrow(tbl)

    def _keys(state):
        if state is None:
            return pa.table({"k": pa.array([], type=pa.int64())})
        return pa.table(
            {"k": state["k"].unique().to_arrow().cast(pa.int64())})

    def _probe_join(state, probe):
        import polars as pl

        empty = pa.table({"k": pa.array([], type=pa.int64()),
                          "v": pa.array([], type=pa.int64()),
                          "q": pa.array([], type=pa.int64())})
        if state is None or probe is None:
            return empty
        out = state.join(pl.from_arrow(probe), on="k", how="inner")
        return out.select(["k", "v", "q"]).to_arrow().cast(empty.schema)

    rng = np.random.default_rng(7)
    base = pd.DataFrame({"k": rng.integers(0, 50, 500).astype("int64"),
                         "v": np.arange(500, dtype="int64")})
    ds = ray.data.from_arrow(pa.Table.from_pandas(base)).repartition(5)
    shards = PinnedShards(ds, "k", _state, n_shards=8)

    # every key homed in exactly ONE shard
    per_shard = [set(t["k"].to_pylist()) for t in shards.gather(_keys)]
    seen = [k for s in per_shard for k in s]
    assert len(seen) == len(set(seen))
    assert set(seen) == set(base["k"])

    # two probe rounds against the pinned side == a plain pandas merge
    for seed in (1, 2):
        prng = np.random.default_rng(seed)
        probe = pd.DataFrame({"k": prng.integers(0, 60, 40).astype("int64"),
                              "q": np.arange(40, dtype="int64") * 100})
        pds = ray.data.from_arrow(pa.Table.from_pandas(probe)).repartition(3)
        got = (shards.map(pds, _probe_join).to_pandas()
               .sort_values(["k", "v", "q"]).reset_index(drop=True))
        want = (base.merge(probe, on="k")
                .sort_values(["k", "v", "q"]).reset_index(drop=True))
        pd.testing.assert_frame_equal(got, want, check_dtype=False)
