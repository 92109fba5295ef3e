"""Golden-fixture gate: pairwise F1 ≥ 0.99 on labeled same-block pairs and
exact cluster agreement vs the generator's gold clusters (BASELINE.md
correctness target; the reference's e2e-vs-gold pattern,
eval/EvalOnDatasets.scala)."""

from pboh_entity_linking_ray.stages.evaluate import (
    cluster_size_histogram,
    pairwise_metrics,
)


def test_pairwise_f1_gate(linkage200, corpus200):
    m = pairwise_metrics(linkage200.scored, corpus200.labels)
    assert m["f1"] >= 0.99, m


def test_cluster_agreement(linkage200, corpus200):
    pred = linkage200.clusters.to_pandas()
    gold = corpus200.golden_clusters.to_pandas()
    j = pred.merge(gold, on="conv_id", suffixes=("_p", "_g"))
    assert len(j) == len(gold)
    agreement = (j.cluster_id_p == j.cluster_id_g).mean()
    assert agreement >= 0.99, agreement


def test_every_conv_clustered_once(linkage200, corpus200):
    pred = linkage200.clusters.to_pandas()
    assert pred["conv_id"].is_unique
    assert len(pred) == corpus200.golden_clusters.num_rows


def test_scored_pairs_unique(linkage200):
    sp = linkage200.scored.to_pandas()
    assert sp["pair_key"].is_unique  # no pair scored twice (FIXTURES.md §5)
    assert sp["score"].between(0, 1).all()
    assert sp["score"].notna().all()  # reference asserts non-NaN scores


def test_cluster_size_histogram(linkage200):
    hist = cluster_size_histogram(linkage200.clusters)
    assert hist["n_convs"].sum() == 200


def test_scorer_differential(linkage200, corpus200):
    """Pluggable-scorer differential (SURVEY §2.10/§5.2): the full scorer
    is at least as accurate as the string-sim-only baseline at the
    shipped threshold, and its labeled separation margin is strictly
    wider — the measurable value of the PBoH statistics (reference
    LBP-vs-ARGMAX pattern, eval/EvalOnDatasets.scala:192-195)."""
    from pboh_entity_linking_ray.stages.evaluate import scorer_differential

    res = linkage200
    rep = scorer_differential(res.pairs, res.features, res.stats_ref,
                              corpus200.labels).to_pandas().iloc[0]
    assert rep["f1_full"] >= rep["f1_base"]
    assert rep["f1_full"] >= 0.99
    assert rep["margin_full"] > rep["margin_base"]
    assert 0.0 < rep["agree_pct"] <= 1.0
    assert rep["n_pairs"] > 0


def test_scorer_registry_selects_baseline(ray_session):
    """PipelineConfig.scorer plugs a different scorer into the fused
    attach+score path; the stringsim scorer emits all-zero pboh."""
    from dataclasses import replace

    import ray.data as rd

    from pboh_entity_linking_ray.config import PipelineConfig
    from pboh_entity_linking_ray.pipelines.linkage import run_linkage
    from pboh_entity_linking_ray.sources.synthetic import generate_corpus

    c = generate_corpus(80, 7)
    cfg = replace(PipelineConfig(), scorer="stringsim")
    res = run_linkage(rd.from_arrow(c.turns), cfg)
    sp = res.scored.to_pandas()
    assert (sp["pboh"] == 0.0).all()
    assert sp["score"].between(0, 1).all()


def test_custom_registered_scorer_reaches_workers(ray_session):
    """Custom plugin defined outside the engine package (locally, as in
    a driver script — cloudpickle ships it by value into workers, where
    the registry dict is fresh): the regression this pins is registry
    name-resolution happening on the DRIVER, not inside the task, which
    would KeyError for every plugin."""
    from dataclasses import replace

    import ray.data as rd

    from pboh_entity_linking_ray.config import PipelineConfig
    from pboh_entity_linking_ray.pipelines.linkage import run_linkage
    from pboh_entity_linking_ray.sources.synthetic import generate_corpus
    from pboh_entity_linking_ray.stages.scoring import register_scorer

    class TaggedScorer:
        def __init__(self, stats_ref, cfg=None):
            from pboh_entity_linking_ray.stages.scoring import StringSimScorer

            self._inner = StringSimScorer(stats_ref, cfg)

        def __call__(self, batch):
            import pyarrow.compute as pc

            out = self._inner(batch)
            i = out.schema.get_field_index("pboh")
            return out.set_column(i, "pboh", pc.add(out["pboh"], 42.0))

    register_scorer("tagged", TaggedScorer)
    c = generate_corpus(80, 7)
    cfg = replace(PipelineConfig(), scorer="tagged")
    res = run_linkage(rd.from_arrow(c.turns), cfg)
    sp = res.scored.to_pandas()
    assert (sp["pboh"] == 42.0).all()     # the plugin actually ran remotely


def test_cluster_digest_invariants(ray_session):
    """Entity digest conserves the corpus exactly: every conversation is
    in one cluster, turn/char totals match the raw corpus, the
    representative is a member, and activity spans bound the corpus."""
    import numpy as np
    import ray.data as rd

    from pboh_entity_linking_ray.pipelines.linkage import run_linkage
    from pboh_entity_linking_ray.pipelines.linkage_queries import \
        cluster_digest
    from pboh_entity_linking_ray.sources.synthetic import generate_corpus

    c = generate_corpus(200, 42)
    res = run_linkage(rd.from_arrow(c.turns))
    d = cluster_digest(res.clusters, rd.from_arrow(c.turns)).to_pandas()
    turns = c.turns.to_pandas()
    clus = res.clusters.to_pandas()

    assert d["n_convs"].sum() == turns["conv_id"].nunique()
    assert d["n_turns"].sum() == len(turns)
    assert d["n_chars"].sum() == turns["text"].str.len().sum()
    # representative is a member of its own cluster (min conv_id rule)
    rep = d.merge(clus, left_on="rep_conv", right_on="conv_id")
    assert (rep["cluster_id_x"] == rep["cluster_id_y"]).all()
    mn = clus.groupby("cluster_id")["conv_id"].min()   # min over ALL members
    assert (d.set_index("cluster_id")["rep_conv"].sort_index()
            == mn.sort_index()).all()
    # activity span bounds
    ts = turns["ts"].astype("datetime64[us]").astype(np.int64)
    assert d["ts_min"].min() == ts.min() and d["ts_max"].max() == ts.max()
    assert (d["ts_min"] <= d["ts_max"]).all()


def test_flagship_cluster_quality_perfect_on_golden(ray_session):
    """On the golden corpus the flagship recovers the exact partition, so
    B-cubed P/R/F1 and ARI must all be exactly 1.0 (e6 integers)."""
    import ray.data as rd

    from pboh_entity_linking_ray.pipelines.linkage import run_linkage
    from pboh_entity_linking_ray.pipelines.linkage_queries import \
        cluster_quality
    from pboh_entity_linking_ray.sources.synthetic import generate_corpus

    c = generate_corpus(200, 42)
    res = run_linkage(rd.from_arrow(c.turns))
    rep = cluster_quality(res.clusters, c.golden_clusters).to_pandas() \
        .set_index("metric")["value"]
    assert rep["n_docs"] == 200
    for m in ("bcubed_p_e6", "bcubed_r_e6", "bcubed_f1_e6", "ari_e6"):
        assert rep[m] == 1_000_000, (m, rep[m])
