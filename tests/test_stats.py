"""Stats-build correctness vs single-process oracles."""

import numpy as np
import polars as pl
import ray.data as rd

from pboh_entity_linking_ray.functions.text import content_tokens
from pboh_entity_linking_ray.sources.synthetic import generate_corpus
from pboh_entity_linking_ray.stages.canonicalize import canonicalize
from pboh_entity_linking_ray.stages.featurize import TOKEN_HASH_SEED, featurize
from pboh_entity_linking_ray.stages.stats import (
    build_cooc,
    build_mention_prior,
    build_vocab,
)


def _conv_docs(corpus):
    return canonicalize(rd.from_arrow(corpus.turns))


def test_vocab_df_matches_oracle(ray_session):
    corpus = generate_corpus(40, 41)
    conv = _conv_docs(corpus)
    vocab = build_vocab(featurize(conv)).to_pandas()

    # oracle: per-conv distinct content tokens, counted across convs
    docs = conv.to_pandas()
    from collections import Counter

    df_oracle: Counter = Counter()
    for doc in docs["mention_doc"]:
        toks = pl.Series([doc]).str.to_lowercase().str.extract_all("[a-z0-9]+")[0].to_list()
        cts = set(content_tokens(toks))
        if cts:
            hashes = pl.Series(sorted(cts)).hash(seed=TOKEN_HASH_SEED).to_numpy().astype(np.uint64)
            df_oracle.update(int(h) for h in
                             np.unique(hashes & np.uint64(0xFFFFFFFF)))

    got = {int(k): int(v) for k, v in zip(vocab["token_hash"], vocab["df"])}
    assert got == dict(df_oracle)


def test_cooc_counts_bounded_by_df(ray_session):
    corpus = generate_corpus(40, 42)
    feats = featurize(_conv_docs(corpus))
    cooc = build_cooc(feats).to_pandas()
    n_convs = 40
    assert (cooc["count"] >= 1).all()
    assert (cooc["count"] <= n_convs).all()
    # symmetric pair key: every packed key has lo<=hi in the two 32-bit halves
    keys = cooc["pair"].to_numpy().astype(np.int64).view(np.uint64)
    lo = keys >> np.uint64(32)
    hi = keys & np.uint64(0xFFFFFFFF)
    assert (lo <= hi).all()


def test_mention_prior_totals(ray_session):
    corpus = generate_corpus(30, 43)
    prior = build_mention_prior(_conv_docs(corpus)).to_pandas()
    # p̂(e|m) = freq/total must sum to 1 per mention
    sums = prior.groupby("mention").apply(
        lambda g: g["freq"].sum() / g["total"].iloc[0], include_groups=False
    )
    assert np.allclose(sums.to_numpy(), 1.0)
