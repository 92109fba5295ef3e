"""Blocking invariants: duplicates co-block, salting accounts for every
capped pair, cross-block dedup keeps each pair once."""

import ray.data as rd

from pboh_entity_linking_ray.config import PipelineConfig
from pboh_entity_linking_ray.sources.synthetic import generate_corpus
from pboh_entity_linking_ray.stages.blocking import (
    add_block_keys,
    dedup_pairs,
    make_pairs,
)
from pboh_entity_linking_ray.stages.canonicalize import canonicalize
from pboh_entity_linking_ray.stages.featurize import featurize


def _features(corpus):
    return featurize(canonicalize(rd.from_arrow(corpus.turns)))


def test_true_duplicates_share_a_block(ray_session):
    corpus = generate_corpus(80, 21)
    blocked = add_block_keys(_features(corpus)).to_pandas()
    by_conv = blocked.groupby("conv_id")["block_key"].apply(set)
    labels = corpus.labels.to_pandas()
    pos = labels[labels.is_match]
    missed = sum(
        1 for _, r in pos.iterrows()
        if not (by_conv[r.conv_a] & by_conv[r.conv_b])
    )
    assert missed / max(1, len(pos)) < 0.01


def test_pair_uniqueness_after_dedup(ray_session):
    corpus = generate_corpus(60, 22)
    blocked = add_block_keys(_features(corpus))
    pairs = dedup_pairs(make_pairs(blocked)).to_pandas()
    assert pairs["pair_key"].is_unique
    assert (pairs["conv_a"] < pairs["conv_b"]).all()


def test_salting_accounts_for_capped_pairs(ray_session):
    cfg = PipelineConfig(block_cap=8)
    corpus = generate_corpus(60, 23)
    blocked = add_block_keys(_features(corpus), cfg)
    pairs = make_pairs(blocked, cfg).to_pandas()
    # per block: emitted + capped == full m*(m-1)/2
    sizes = blocked.to_pandas().groupby("block_key").size()
    for bk, grp in pairs.groupby("block_key"):
        m = sizes[bk]
        assert len(grp) + grp["capped_pairs"].iloc[0] == m * (m - 1) // 2
        assert grp["capped_pairs"].nunique() == 1
