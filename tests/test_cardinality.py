"""Distinct-count operators: the HLL sketch must track the
oracle-checked exact count, and its primitives must be exact."""

import numpy as np

from pboh_entity_linking_ray.pipelines.cardinality import _clz64, _estimate


def test_clz64_exact():
    xs = np.array([0, 1, 2, 3, 2**63, 2**63 + 1, 2**64 - 1, 2**32],
                  dtype=np.uint64)
    exp = [63, 63, 62, 62, 0, 0, 0, 31]
    assert _clz64(xs).tolist() == exp


def test_hll_estimator_linear_range():
    # 100 distinct "hashes" spread over registers: linear counting regime
    regs = np.zeros(4096, dtype=np.int64)
    regs[np.arange(0, 4000, 40)] = 1
    est = _estimate(regs)
    m, zeros = 4096, 4096 - 100
    assert est == int(round(m * np.log(m / zeros)))


def test_hll_tracks_exact(ray_session):
    from pboh_entity_linking_ray.pipelines.cardinality import (
        hll_distinct_users,
        q31_distinct_users,
    )

    sf = "/root/testdata/sf0.001"
    exact = (q31_distinct_users(sf).to_pandas()
             .set_index("event_type")["n_users"])
    est = (hll_distinct_users(sf).to_pandas()
           .set_index("event_type")["n_users_est"])
    assert set(exact.index) == set(est.index)
    for ty in exact.index:
        rel = abs(est[ty] - exact[ty]) / max(1, exact[ty])
        assert rel <= 0.05, (ty, int(est[ty]), int(exact[ty]))


def test_mg_heavy_hitters_sketch_regime(ray_session):
    """k << distinct keys: every key with true count > Σ subtracted mass
    must survive, and [count_lo, count_hi] must bracket the true count."""
    import collections

    import pyarrow as pa
    import ray.data

    from pboh_entity_linking_ray.pipelines.cardinality import mg_heavy_hitters

    rng = np.random.default_rng(7)
    # zipf-ish stream: few heavy keys, long tail
    keys = [f"hot{i}" for i in range(3) for _ in range(500 - 120 * i)]
    keys += [f"t{i}" for i in rng.integers(0, 400, size=2000)]
    rng.shuffle(keys)
    truth = collections.Counter(keys)

    ds = ray.data.from_arrow(pa.table({"tok": keys})).repartition(8)
    got = mg_heavy_hitters(ds, k=8).to_pandas().set_index("tok")

    err = int((got["count_hi"] - got["count_lo"]).iloc[0])
    assert err > 0, "k=8 over ~400 keys must compress"
    for tok, true_n in truth.items():
        if true_n > err:
            assert tok in got.index, (tok, true_n, err)
        if tok in got.index:
            lo, hi = int(got.loc[tok, "count_lo"]), int(got.loc[tok, "count_hi"])
            assert lo <= true_n <= hi, (tok, lo, true_n, hi)
    # the three engineered heavy keys are unmissable
    assert {"hot0", "hot1", "hot2"} <= set(got.index)


def test_quantile_sketch_within_one_bin(ray_session):
    """Histogram-sketch quantiles must land within one bin width of the
    exact quantiles, one-sided (reported value >= exact)."""
    import duckdb

    from pboh_entity_linking_ray.pipelines.cardinality import (
        QSKETCH_BINS, QSKETCH_QS_E4, quantile_sketch_value)

    SF = "/root/testdata/sf0.001"
    got = quantile_sketch_value(SF).to_pandas().set_index("q_e4")["value"]

    con = duckdb.connect()
    lo, hi, rng = con.execute(
        f"SELECT min(value), max(value), max(value) - min(value) "
        f"FROM '{SF}/events.parquet'").fetchone()
    binw = rng / QSKETCH_BINS
    for q in QSKETCH_QS_E4:
        exact = con.execute(
            f"SELECT quantile_disc(value, {q / 10_000}) "
            f"FROM '{SF}/events.parquet'").fetchone()[0]
        v = float(got[q])
        assert exact <= v + 1e-9, (q, v, exact)
        assert v - exact <= binw + 1e-9, (q, v, exact, binw)


def test_l_diversity_homogeneity_semantics(ray_session):
    from pboh_entity_linking_ray.pipelines.cardinality import q170_l_diversity

    out = q170_l_diversity("/root/testdata/sf0.001").to_pandas()
    assert len(out) > 0
    # top value share and distinct count are mutually consistent
    assert (out["l_distinct"] >= 1).all()
    assert (out["top_share_e4"] <= 10000).all()
    # a group's top share can't be below the uniform floor 1/l
    assert (out["top_share_e4"] * out["l_distinct"] >= 10000 - out["l_distinct"]).all()
    # l_distinct == 1 (homogeneity attack) iff top share is 100%
    homog = out["l_distinct"] == 1
    assert (out.loc[homog, "top_share_e4"] == 10000).all()
    assert (out.loc[~homog, "top_share_e4"] < 10000).all()


def test_vocab_richness_from_direct_counts(ray_session):
    import duckdb

    from pboh_entity_linking_ray.pipelines.cardinality import (
        q171_vocab_richness)

    SF = "/root/testdata/sf0.001"
    counts = duckdb.sql(
        "SELECT m, count(*) AS f FROM (SELECT count(*) AS m FROM ("
        "SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS t"
        f" FROM '{SF}/documents.parquet') GROUP BY t) GROUP BY m"
    ).df().set_index("m")["f"]
    out = q171_vocab_richness(SF).to_pandas().iloc[0]
    v = int(counts.sum())
    n = int((counts.index.to_numpy() * counts.to_numpy()).sum())
    s1 = int(counts.get(1, 0))
    s2 = int(counts.get(2, 0))
    assert out["vocab"] == v and out["n_tokens"] == n
    assert out["s1"] == s1 and out["s2"] == s2
    assert out["unseen_e6"] == 1_000_000 * s1 // n
    assert out["chao1"] == v + s1 * (s1 - 1) // (2 * (s2 + 1))
    assert out["chao1"] >= v          # richness floor never below observed


def test_kmv_jaccard_tracks_exact(ray_session):
    from pboh_entity_linking_ray.pipelines.cardinality import (
        KMV_K, kmv_jaccard, q94_audience_overlap)

    SF = "/root/testdata/sf0.001"
    est = (kmv_jaccard(SF).to_pandas()
           .set_index(["type_a", "type_b"]))
    exact = (q94_audience_overlap(SF).to_pandas()
             .set_index(["ta", "tb"]))
    assert len(est) == len(exact)          # every unordered type pair
    for (a, b), row in est.iterrows():
        j_true = exact.loc[(a, b), "jaccard_e4"] / 1e4
        j_est = row["jaccard_est_e6"] / 1e6
        # KMV SE ≈ sqrt(J(1-J)/K); allow 4 SE + rounding slop
        se = (j_true * (1 - j_true) / KMV_K) ** 0.5
        assert abs(j_est - j_true) <= 4 * se + 0.02
        assert row["k_both"] <= row["k_union"] <= KMV_K
    # deterministic
    assert est.equals(kmv_jaccard(SF).to_pandas()
                      .set_index(["type_a", "type_b"]))
