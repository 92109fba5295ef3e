"""asof_join operator semantics: backward match, tie inclusion, left-join
nulls for unmatched rows, and sparse buckets (num_buckets >> keys)."""

import pandas as pd
import pyarrow as pa
import ray.data

from pboh_entity_linking_ray.functions.grouping import asof_join


def _ts(*days):
    return pa.array([pd.Timestamp(f"2024-01-{d:02d}") for d in days],
                    type=pa.timestamp("us"))


def test_asof_backward_with_ties_and_unmatched(ray_session):
    left = ray.data.from_arrow(pa.table({
        "k": pa.array([1, 1, 1, 2, 3], type=pa.int64()),
        "ts": _ts(5, 10, 20, 7, 9),
        "lid": pa.array([0, 1, 2, 3, 4], type=pa.int64()),
    }))
    right = ray.data.from_arrow(pa.table({
        "k": pa.array([1, 1, 2], type=pa.int64()),
        "ts": _ts(10, 15, 8),
        "rv": pa.array([100, 200, 300], type=pa.int64()),
    }))
    out = (asof_join(left, right, by="k", on="ts", num_buckets=8)
           .to_pandas().sort_values("lid").reset_index(drop=True))

    # lid 0: k=1 ts=5  -> no right row at/before 5 -> null
    # lid 1: k=1 ts=10 -> exact tie with right ts=10 (included) -> 100
    # lid 2: k=1 ts=20 -> latest at/before is ts=15 -> 200
    # lid 3: k=2 ts=7  -> right k=2 is ts=8 (after)  -> null
    # lid 4: k=3 ts=9  -> no right rows for k=3 at all -> null
    assert out["rv_r"].tolist()[1] == 100
    assert out["rv_r"].tolist()[2] == 200
    assert pd.isna(out["rv_r"][0]) and pd.isna(out["rv_r"][3])
    assert pd.isna(out["rv_r"][4])
    assert out["ts_r"][2] == pd.Timestamp("2024-01-15")
    assert len(out) == 5  # left join: every left row survives


def test_interval_join_half_open_and_sparse_buckets(ray_session):
    from pboh_entity_linking_ray.functions.grouping import interval_join

    points = ray.data.from_arrow(pa.table({
        "k": pa.array([1, 1, 1, 2, 3], type=pa.int64()),
        "ts": _ts(5, 10, 15, 7, 9),
        "pid": pa.array([0, 1, 2, 3, 4], type=pa.int64()),
    }))
    intervals = ray.data.from_arrow(pa.table({
        "k": pa.array([1, 1, 2], type=pa.int64()),
        "start": _ts(5, 10, 8),
        "end": _ts(10, 20, 9),
        "iid": pa.array([10, 11, 12], type=pa.int64()),
    }))
    # num_buckets >> distinct keys exercises empty-bucket stability
    out = (interval_join(points, intervals, by="k", on="ts",
                         start="start", end="end", num_buckets=32)
           .to_pandas().sort_values(["pid", "iid_r"]).reset_index(drop=True))

    # pid 0 (k=1, ts=5):  in [5,10) only            -> iid 10
    # pid 1 (k=1, ts=10): end of [5,10) is EXCLUSIVE, start of [10,20)
    #                     is inclusive               -> iid 11 only
    # pid 2 (k=1, ts=15): in [10,20)                 -> iid 11
    # pid 3 (k=2, ts=7):  before [8,9)               -> no match (inner)
    # pid 4 (k=3, ts=9):  no k=3 intervals           -> no match
    assert list(zip(out["pid"], out["iid_r"])) == [(0, 10), (1, 11), (2, 11)]


def test_asof_column_collision_rejected(ray_session):
    ds = ray.data.from_arrow(pa.table({
        "k": pa.array([1], type=pa.int64()),
        "ts": _ts(1),
        "x_r": pa.array([1], type=pa.int64()),
    }))
    other = ray.data.from_arrow(pa.table({
        "k": pa.array([1], type=pa.int64()),
        "ts": _ts(1),
        "x": pa.array([2], type=pa.int64()),
    }))
    import pytest

    with pytest.raises(ValueError, match="collision"):
        asof_join(ds, other, by="k", on="ts")


def test_kaplan_meier_matches_float_definition(ray_session):
    import numpy as np
    import pyarrow.parquet as pq

    from pboh_entity_linking_ray.pipelines.temporal import (
        _US_DAY, q167_kaplan_meier)

    SF = "/root/testdata/sf0.001"
    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["user_id", "ts"]).to_pandas()
    day = ev["ts"].astype("int64") // _US_DAY
    g = day.groupby(ev["user_id"]).agg(["min", "max"])
    gmax = g["max"].max()
    lt = (g["max"] - g["min"]).to_numpy()
    churn = (g["max"] < gmax).to_numpy()
    out = q167_kaplan_meier(SF).to_pandas().sort_values("t") \
                               .reset_index(drop=True)
    assert out["m_t"].sum() == len(g)          # every user in one step
    assert out["d_t"].sum() == churn.sum()
    # float-KM agreement within one e6 ulp per recurrence step
    s = 1.0
    for i, row in out.iterrows():
        assert row["n_risk"] == (lt >= row["t"]).sum()
        assert row["d_t"] == churn[lt == row["t"]].sum()
        s *= 1.0 - row["d_t"] / row["n_risk"]
        assert abs(row["surv_e6"] - s * 1_000_000) <= i + 1
    # survival is monotone non-increasing and ends ≥ censored fraction
    assert (np.diff(out["surv_e6"].to_numpy()) <= 0).all()


def test_ltv_triangle_conservation_and_cumsum(ray_session):
    import numpy as np
    import pyarrow.parquet as pq

    from pboh_entity_linking_ray.pipelines.temporal import (
        _US_WEEK, q173_ltv_triangle)

    SF = "/root/testdata/sf0.001"
    ev = pq.read_table(
        f"{SF}/events.parquet",
        columns=["user_id", "ts", "event_type", "value"]).to_pandas()
    out = q173_ltv_triangle(SF).to_pandas()
    # total revenue conservation (exact cents)
    purch = ev[ev.event_type == "purchase"]
    total = int(np.floor(purch["value"].to_numpy() * 100 + 0.5).sum())
    assert out["rev"].sum() == total
    # every (user, week) activity accounted once
    wk = ev["ts"].astype("int64") // _US_WEEK
    assert out["n_active"].sum() == len(set(zip(ev["user_id"], wk)))
    # cumulative column is the per-cohort running sum; age 0 row exists
    for cw, g in out.groupby("cohort_week"):
        g = g.sort_values("age")
        assert g["age"].iloc[0] == 0
        assert (g["cum_rev"].to_numpy() == g["rev"].cumsum().to_numpy()).all()


def test_acf_from_direct_numpy_corrcoef(ray_session):
    import numpy as np
    import pyarrow.parquet as pq

    from pboh_entity_linking_ray.pipelines.temporal import _US_DAY, q177_acf

    SF = "/root/testdata/sf0.001"
    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["event_type", "ts"]).to_pandas()
    ev["d"] = ev["ts"].astype("int64") // _US_DAY
    out = q177_acf(SF).to_pandas().set_index(["event_type", "lag"])
    assert len(out) > 0
    for g, grp in ev.groupby("event_type"):
        n = grp.groupby("d").size().sort_index()
        x = (len(n) * n - n.sum()).to_numpy(dtype=float)
        d = n.index.to_numpy()
        for k in (1, 7):
            pos = np.searchsorted(d, d + k)
            hit = (pos < len(d)) & (d[np.minimum(pos, len(d) - 1)] == d + k)
            if not hit.any():
                continue
            want = (x[hit] * x[pos[hit]]).sum() / (x * x).sum()
            assert abs(out.loc[(g, k), "acf_e6"] - want * 1_000_000) <= 1
    assert (out["acf_e6"].abs() <= 1_000_000).all()


def test_seasonality_from_direct_decomposition(ray_session):
    import numpy as np
    import pyarrow.parquet as pq

    from pboh_entity_linking_ray.pipelines.temporal import (
        _US_DAY, q181_seasonality)

    SF = "/root/testdata/sf0.001"
    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["event_type", "ts"]).to_pandas()
    ev["d"] = ev["ts"].astype("int64") // _US_DAY
    out = q181_seasonality(SF).to_pandas() \
        .set_index(["event_type", "dow"]).sort_index()
    assert len(out) > 0
    for g, grp in ev.groupby("event_type"):
        n = grp.groupby("d").size().sort_index()
        d = n.index.to_numpy()
        full = [(i, dd) for i, dd in enumerate(d)
                if all(dd + o in n.index for o in range(-3, 4))]
        det = {dd: 7 * n[dd] - sum(n[dd + o] for o in range(-3, 4))
               for _, dd in full}
        for w in range(7):
            vals = [v for dd, v in det.items() if (dd + 4) % 7 == w]
            if not vals:
                assert (g, w) not in out.index
                continue
            row = out.loc[(g, w)]
            assert row["n_days"] == len(vals)
            assert row["seasonal_x7_e2"] == int(
                np.floor(100 * sum(vals) / len(vals)))
    # seasonal deviations sum to ~0 across the week (trend removed)
    for g in out.index.get_level_values(0).unique():
        s = out.loc[g, "seasonal_x7_e2"]
        assert abs((s * out.loc[g, "n_days"]).sum()) \
            <= 700 * out.loc[g, "n_days"].sum()


def test_backtest_from_direct_lag_errors(ray_session):
    import numpy as np
    import pyarrow.parquet as pq

    from pboh_entity_linking_ray.pipelines.temporal import (
        _US_DAY, q184_backtest)

    SF = "/root/testdata/sf0.001"
    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["event_type", "ts"]).to_pandas()
    ev["d"] = ev["ts"].astype("int64") // _US_DAY
    out = q184_backtest(SF).to_pandas().set_index("event_type")
    for g, grp in ev.groupby("event_type"):
        n = grp.groupby("d").size().sort_index()
        for k, col in ((7, "l7"), (1, "l1")):
            pairs = [(n[dd], n[dd - k]) for dd in n.index
                     if dd - k in n.index]
            ae = sum(abs(a - b) for a, b in pairs)
            tot = sum(a for a, _ in pairs)
            row = out.loc[g]
            assert row[f"n_days_{col}"] == len(pairs)
            assert row[f"mape_{col}_e4"] == 10000 * ae // tot
            assert row[f"bias_{col}"] == sum(a - b for a, b in pairs)


def test_fano_from_direct_variance(ray_session):
    import numpy as np
    import pyarrow.parquet as pq

    from pboh_entity_linking_ray.pipelines.temporal import _US_DAY, q186_fano

    SF = "/root/testdata/sf0.001"
    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["event_type", "ts"]).to_pandas()
    ev["d"] = ev["ts"].astype("int64") // _US_DAY
    out = q186_fano(SF).to_pandas().set_index("event_type")
    for g, grp in ev.groupby("event_type"):
        n = grp.groupby("d").size().to_numpy(dtype=float)
        fano = n.var(ddof=1) / n.mean()
        row = out.loc[g]
        assert row["n_days"] == len(n)
        assert abs(row["fano_e4"] - fano * 10000) <= 1


def test_conversion_window_from_direct_scan(ray_session):
    import numpy as np
    import pyarrow.parquet as pq

    from pboh_entity_linking_ray.pipelines.temporal import (
        CONV_WINDOWS_US, q187_conversion_window)

    SF = "/root/testdata/sf0.001"
    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["user_id", "event_type", "ts"]).to_pandas()
    ev["us"] = ev["ts"].astype("int64")
    out = q187_conversion_window(SF).to_pandas().iloc[0]
    clicks = ev[ev.event_type == "click"].groupby("user_id")["us"].min()
    purch = ev[ev.event_type == "purchase"].groupby("user_id")["us"] \
        .apply(np.array)
    assert out["n_clickers"] == len(clicks)
    for w, col in zip(CONV_WINDOWS_US, ("conv_1h", "conv_24h", "conv_72h")):
        n = sum(
            1 for uid, t0 in clicks.items()
            if uid in purch.index
            and ((purch[uid] > t0) & (purch[uid] <= t0 + w)).any())
        assert out[col] == n
    assert out["conv_1h"] <= out["conv_24h"] <= out["conv_72h"]
    assert out["rate_72h_e4"] == 10000 * out["conv_72h"] // out["n_clickers"]
