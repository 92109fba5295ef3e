"""Property tests: the three join implementations (bucketed hash_join,
skew-salted salted_join, map-side broadcast_join) must agree with a
pandas reference merge on arbitrary key/value tables for every how.

Few examples, seeds fixed by hypothesis derandomization under pytest;
each example builds real (small) Ray datasets, so examples are capped.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pboh_entity_linking_ray.functions.grouping import (broadcast_join,
                                                        hash_join,
                                                        salted_join)

KEYS = st.lists(st.integers(min_value=-5, max_value=9),
                min_size=0, max_size=40)


def _ref(ldf: pd.DataFrame, rdf: pd.DataFrame, how: str) -> pd.DataFrame:
    if how in ("inner", "left"):
        out = ldf.merge(rdf, on="k", how=how)
    elif how == "full":
        out = ldf.merge(rdf, on="k", how="outer")
    elif how == "semi":
        out = ldf[ldf.k.isin(set(rdf.k))]
    else:                                        # anti
        out = ldf[~ldf.k.isin(set(rdf.k))]
    return out.sort_values(out.columns.tolist()).reset_index(drop=True)


def _norm(ds) -> pd.DataFrame:
    df = ds.to_pandas()
    return df.sort_values(df.columns.tolist()).reset_index(drop=True)


@pytest.mark.parametrize("how", ["inner", "left", "semi", "anti", "full"])
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(lk=KEYS, rk=KEYS)
def test_joins_agree_with_pandas(ray_session, how, lk, rk):
    ldf = pd.DataFrame({"k": np.array(lk, dtype="int64"),
                        "lv": np.arange(len(lk), dtype="int64")})
    rdf = pd.DataFrame({"k": np.array(rk, dtype="int64"),
                        "rv": np.arange(len(rk), dtype="int64") * 10})
    want = _ref(ldf, rdf, how)

    left = ray.data.from_arrow(pa.Table.from_pandas(ldf)).repartition(3)
    right_tbl = pa.Table.from_pandas(rdf)
    right = ray.data.from_arrow(right_tbl).repartition(2)

    # full outer is hash_join-only: salted_join would surface unmatched
    # right rows `salt` times (it raises), and broadcast_join's per-batch
    # small side would duplicate unmatched dimension rows across batches
    impls = [("hash", hash_join(left, right, "k", how=how, num_buckets=8))]
    if how != "full":
        impls += [
            ("salted", salted_join(left, right, "k", salt=3, how=how,
                                   num_buckets=8)),
            ("broadcast", broadcast_join(left, right_tbl, "k", how=how)),
        ]
    for name, got in impls:
        got_df = _norm(got)
        if len(want) == 0:
            assert len(got_df) == 0, name
            continue
        # a schema-less EMPTY right side degrades the output schema
        # (right columns unknowable — documented _empty_side_fallback
        # contract); reindex fills them with the nulls pandas produces
        got_df = got_df.reindex(columns=want.columns.tolist())
        pd.testing.assert_frame_equal(got_df, want, check_dtype=False,
                                      obj=name)
