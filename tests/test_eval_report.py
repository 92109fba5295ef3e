"""Micro/macro eval report checked against a hand-built fixture
(reference semantics: GlobalStats.scala:150-248 micro vs macro; macro
averages per-document metrics, empty denominators score 1.0)."""

import numpy as np
import pyarrow as pa
import ray.data

from pboh_entity_linking_ray.stages.evaluate import eval_report


def _scored(rows):
    return ray.data.from_arrow(pa.table({
        "pair_key": [f"{a}\x1f{b}" for a, b, _p in rows],
        "is_match": [p for _a, _b, p in rows],
    }))


def test_eval_report_hand_fixture(ray_session):
    # gold: (a,b)+ (a,c)+ (b,c)+ (d,e)-   | predictions: (a,b)+ (a,c)-
    # (b,c) unscored → predicted negative; (d,e) predicted positive (FP)
    labels = pa.table({
        "conv_a": ["a", "a", "b", "d"],
        "conv_b": ["b", "c", "c", "e"],
        "is_match": [True, True, True, False],
    })
    golden = pa.table({
        "conv_id": ["a", "b", "c", "d", "e"],
        "cluster_id": ["a", "a", "a", "d", "e"],
    })
    scored = _scored([("a", "b", True), ("a", "c", False), ("d", "e", True)])
    rep = eval_report(scored, labels, golden).to_pandas().set_index("bucket")

    allr = rep.loc["__all__"]
    assert (allr.tp, allr.fp, allr.fn) == (1, 1, 2)
    assert np.isclose(allr.micro_p, 0.5)
    assert np.isclose(allr.micro_r, 1 / 3)
    # macro per conv (pairs charged to both convs):
    #  a: tp1 fp0 fn1 → p1   r1/2 ; b: tp1 fp0 fn1 → p1 r1/2
    #  c: tp0 fp0 fn2 → p1   r0   ; d: fp1 → p0 r1 ; e: fp1 → p0 r1
    assert np.isclose(allr.macro_p, (1 + 1 + 1 + 0 + 0) / 5)
    assert np.isclose(allr.macro_r, (0.5 + 0.5 + 0 + 1 + 1) / 5)

    # bucket of the 3-cluster ("3-10") holds the three positive pairs
    b3 = rep.loc["3-10"]
    assert b3.n_pairs == 3 and b3.tp == 1 and b3.fn == 2 and b3.fp == 0
    # the negative (d,e) pair sits in the singleton bucket
    b1 = rep.loc["1"]
    assert b1.n_pairs == 1 and b1.fp == 1


def test_link_pr_curve_consistent_with_f1_gate(ray_session):
    from pboh_entity_linking_ray.pipelines.linkage_queries import (
        _labels, _run, link_pr_curve)
    from pboh_entity_linking_ray.stages.evaluate import pairwise_metrics

    SF = "/root/testdata/sf0.001"
    curve = link_pr_curve(SF).to_pandas().set_index("bin")
    res, cfg = _run(SF)
    m = pairwise_metrics(res.scored, _labels(SF))
    # the bin at the config threshold reproduces the F1 gate's inputs
    # exactly (score >= 0.6  <=>  floor(10*score) >= 6)
    thr_bin = int(round(cfg.weights.match_threshold * 10))
    row = curve.loc[thr_bin]
    assert row["cum_pos"] == m["tp"]
    assert row["cum_pairs"] == m["tp"] + m["fp"]
    # recall is monotone non-increasing in the threshold; its ceiling is
    # the blocking recall (scored gold positives / all gold positives)
    rec = curve.sort_index()["recall_e6"].to_numpy()
    assert (rec[:-1] >= rec[1:]).all()
    assert curve["recall_e6"].max() <= 1_000_000


def test_link_cluster_labels_cover_and_rank(ray_session):
    from pboh_entity_linking_ray.pipelines.linkage_queries import (
        LABEL_TOP_K, _run, link_cluster_labels)

    SF = "/root/testdata/sf0.001"
    out = (link_cluster_labels(SF).to_pandas()
           .sort_values(["cluster_id", "score_e4", "tok"],
                        ascending=[True, False, True])
           .reset_index(drop=True))
    res, _ = _run(SF)
    cl = res.clusters.to_pandas()
    # every cluster gets labels, at most K each, scores non-increasing
    assert set(out["cluster_id"]) == set(cl["cluster_id"])
    g = out.groupby("cluster_id")
    assert (g.size() <= LABEL_TOP_K).all() and (g.size() >= 1).all()
    for _, grp in g:
        s = grp["score_e4"].to_numpy()
        assert (s[:-1] >= s[1:]).all()
    # the top label of a cluster actually occurs in that cluster's text
    import pyarrow.parquet as pq

    import os

    from pboh_entity_linking_ray.pipelines.linkage_queries import (
        CORPUS_CACHE)
    from pboh_entity_linking_ray.sources.synthetic import (
        corpus_dir, sf_to_n_convs)
    d = corpus_dir(CORPUS_CACHE, sf_to_n_convs(SF))
    turns = pq.read_table(os.path.join(d, "turns.parquet"),
                          columns=["conv_id", "text"]).to_pandas()
    conv2cl = dict(zip(cl["conv_id"], cl["cluster_id"]))
    turns["cluster_id"] = turns["conv_id"].map(conv2cl)
    text_by_cl = turns.groupby("cluster_id")["text"] \
        .apply(lambda s: " ".join(s).lower())
    top = out.groupby("cluster_id").first()
    for cid, row in top.sample(10, random_state=0).iterrows():
        assert row["tok"] in text_by_cl[cid]
    # deterministic
    again = (link_cluster_labels(SF).to_pandas()
             .sort_values(["cluster_id", "score_e4", "tok"],
                          ascending=[True, False, True])
             .reset_index(drop=True))
    assert out.equals(again)


def test_threshold_sensitivity_plateau(ray_session):
    from pboh_entity_linking_ray.pipelines.linkage_queries import (
        link_threshold_sensitivity)

    SF = "/root/testdata/sf0.001"
    out = (link_threshold_sensitivity(SF).to_pandas()
           .set_index("threshold_e2").sort_index())
    # the config threshold row compares the partition to itself
    assert out.loc[60, "b3_f1_vs_config_e6"] == 1_000_000
    assert out.loc[60, "ari_vs_config_e6"] == 1_000_000
    # raising the threshold can only split clusters (monotone count)
    assert (out["n_clusters"].diff().dropna() >= 0).all()
    assert (out["b3_f1_vs_config_e6"] <= 1_000_000).all()
    again = (link_threshold_sensitivity(SF).to_pandas()
             .set_index("threshold_e2").sort_index())
    assert out.equals(again)


def test_block_histogram_conserves_inventory(ray_session):
    from pboh_entity_linking_ray.pipelines.linkage_queries import (
        link_block_histogram, link_block_inventory)

    SF = "/root/testdata/sf0.001"
    hist = link_block_histogram(SF).to_pandas()
    inv = link_block_inventory(SF).to_pandas()
    n = inv["count()"].to_numpy()
    n = n[n >= 2]
    assert hist["n_blocks"].sum() == len(n)
    assert hist["n_members"].sum() == n.sum()
    assert hist["n_pairs"].sum() == (n * (n - 1) // 2).sum()
    # cumulative-from-top share is monotone decreasing in block size
    s = hist.sort_values("size_log2")["cum_pair_share_from_top_e6"]
    assert (s.diff().dropna() <= 0).all()
    assert s.iloc[0] == 1_000_000
