"""One-shot programmatic linking (link_one) — the recast of the
reference's console EntityLinkingAPI smoke test
(console_el/ConsoleEntityLinking.scala:114-138): hold out one planted
duplicate, build the base run without it, then link the held-out
transcript and expect it to join its partner's cluster."""

import pyarrow as pa
import pyarrow.compute as pc
import pytest
import ray.data

from pboh_entity_linking_ray.pipelines.console import link_one
from pboh_entity_linking_ray.pipelines.linkage import run_linkage
from pboh_entity_linking_ray.sources.synthetic import generate_corpus


@pytest.fixture(scope="module")
def base_and_holdout(ray_session):
    c = generate_corpus(60, 11)
    gc = c.golden_clusters.to_pandas()
    sizes = gc.groupby("cluster_id")["conv_id"].count()
    cluster = sizes[sizes >= 2].index[0]
    members = sorted(gc.loc[gc["cluster_id"] == cluster, "conv_id"])
    held = members[-1]                       # not the min → not the label
    base_turns = c.turns.filter(pc.field("conv_id") != held)
    held_turns = c.turns.filter(pc.field("conv_id") == held)
    base = run_linkage(ray.data.from_arrow(base_turns))
    base.features = base.features.materialize()
    base.clusters = base.clusters.materialize()
    return base, held, held_turns, members


def test_link_one_joins_partner_cluster(base_and_holdout):
    base, held, held_turns, members = base_and_holdout
    out = link_one(held_turns, base)
    assert out["conv_id"] == held
    assert out["matched"]
    assert out["n_candidates"] >= 1
    # lands in the SAME cluster as its planted partners: the base
    # cluster id is the min conv_id among the remaining members
    assert out["cluster_id"] == min(set(members) - {held})
    assert out["merged_clusters"] == [min(set(members) - {held})]
    # scored pair rows carry this conversation on one side
    assert ((out["pairs"]["conv_a"] == held)
            | (out["pairs"]["conv_b"] == held)).all()


def test_link_one_unmatched_singleton(base_and_holdout):
    base, _, _, _ = base_and_holdout
    rows = [{"conv_id": "conv-zzz", "turn_idx": i, "role": "user",
             "text": f"completely unrelated xylophone quasar {i} qq",
             "tool": ""} for i in range(6)]
    out = link_one(rows, base)
    assert out["conv_id"] == "conv-zzz"
    assert not out["matched"]
    assert out["cluster_id"] == "conv-zzz"   # its own singleton cluster
    assert out["merged_clusters"] == []


def test_link_one_rejects_multi_conversation_input(base_and_holdout):
    base, _, _, _ = base_and_holdout
    rows = [{"conv_id": "a", "turn_idx": 0, "role": "user", "text": "x",
             "tool": ""},
            {"conv_id": "b", "turn_idx": 0, "role": "user", "text": "y",
             "tool": ""}]
    with pytest.raises(ValueError, match="ONE conversation"):
        link_one(rows, base)


def test_link_one_cli_mode(ray_session, tmp_path, capsys):
    """`--link-one transcript.parquet` job-entry mode: hold out one
    planted duplicate, build the base from the rest, link the held-out
    transcript via the CLI and read its assignment JSON."""
    import json

    import pyarrow.parquet as pq

    from pboh_entity_linking_ray.__main__ import main

    c = generate_corpus(40, 5)
    gc = c.golden_clusters.to_pandas()
    sizes = gc.groupby("cluster_id")["conv_id"].count()
    cluster = sizes[sizes >= 2].index[0]
    members = sorted(gc.loc[gc["cluster_id"] == cluster, "conv_id"])
    held = members[-1]
    base_p = str(tmp_path / "base_turns.parquet")
    one_p = str(tmp_path / "one.parquet")
    pq.write_table(c.turns.filter(pc.field("conv_id") != held), base_p)
    pq.write_table(c.turns.filter(pc.field("conv_id") == held), one_p)

    rc = main(["--input", base_p, "--link-one", one_p,
               "--checkpoint-root", str(tmp_path / "ckpt")])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["conv_id"] == held
    assert out["matched"] is True
    assert out["cluster_id"] == min(set(members) - {held})
    assert len(out["top_pairs"]) >= 1
