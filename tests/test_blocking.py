"""Blocking invariants: duplicates co-block, pairs globally unique WITHOUT
a dedup shuffle (min-common-block rule), salting accounts for capped
pairs."""

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


def test_pairs_globally_unique_without_dedup(ray_session):
    """The min-common-block rule must make make_pairs output unique by
    construction — dedup_pairs applied on top must be a no-op."""
    corpus = generate_corpus(60, 22)
    blocked = add_block_keys(_features(corpus))
    pairs = make_pairs(blocked).to_pandas()
    assert pairs["pair_key"].is_unique
    assert (pairs["conv_a"] < pairs["conv_b"]).all()
    deduped = dedup_pairs(make_pairs(blocked)).to_pandas()
    assert len(deduped) == len(pairs)


def test_salting_accounts_for_capped_pairs(ray_session):
    cfg = PipelineConfig(block_cap=8)
    corpus = generate_corpus(60, 23)
    blocked = add_block_keys(_features(corpus), cfg)
    pairs = make_pairs(blocked, cfg).to_pandas()
    sizes = blocked.to_pandas().groupby("block_key").size()
    for bk, grp in pairs.groupby("block_key"):
        m = int(sizes[bk])
        total = m * (m - 1) // 2
        capped = int(grp["capped_pairs"].iloc[0])
        assert grp["capped_pairs"].nunique() == 1
        assert 0 <= capped < total
        # emitted-here ≤ generated = total - capped (min-common-block
        # filtering may hand pairs to other blocks)
        assert len(grp) <= total - capped


def test_oversized_block_pair_budget(ray_session):
    """A hot block must stay under max_pairs_per_block + boundary pairs."""
    cfg = PipelineConfig(block_cap=8, max_pairs_per_block=40, salt_boundary=2)
    corpus = generate_corpus(120, 24)
    blocked = add_block_keys(_features(corpus), cfg)
    pairs = make_pairs(blocked, cfg).to_pandas()
    sizes = blocked.to_pandas().groupby("block_key").size()
    for bk, grp in pairs.groupby("block_key"):
        m = int(sizes[bk])
        if m > cfg.block_cap:
            total = m * (m - 1) // 2
            generated = total - int(grp["capped_pairs"].iloc[0])
            c = max(8, min(cfg.block_cap, 2 * cfg.max_pairs_per_block // m))
            n_chunks = -(-m // c)
            exact_budget = n_chunks * (c * (c - 1) // 2) \
                + (n_chunks - 1) * cfg.salt_boundary ** 2
            assert generated <= exact_budget
