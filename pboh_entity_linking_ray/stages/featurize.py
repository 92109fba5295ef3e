"""Featurize: conv_docs → per-conversation blocking/scoring features.

Stateless-looking but actor-pooled ``map_batches`` stage (the MinHash
permutation table and compiled tokenizer state are built once per actor in
``__init__`` — the pattern the reference implements with singleton-per-JVM
index objects, reference: src/main/scala/eval/cweb/
RunLoopyAgainstAllGoogleClweb.scala:31-42).

Emitted per conversation:
- ``jw_text``      canonical lowercased text, capped for Jaro-Winkler
- ``tokens``       bottom-k min-wise sample of distinct content-token
                   hashes (sorted uint64) — caps pair-row width, the analog
                   of the reference's top-10 candidate pruning
                   (index/MentEntsFreqIndexWrapper.scala:53-55); bottom-k
                   keeps the token-Jaccard estimator unbiased
- ``n_tokens``     distinct content tokens before capping
- ``minhash``      num_perm uint64 MinHash signature over k-token shingles
- ``sig``          tool/role signature string (from canonicalize)
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..config import PipelineConfig
from ..functions.minhash import MinHasher
from ..functions.text import (
    content_tokens,
    token_lists_to_hashes,
    tokenize_series,
)

TOKEN_HASH_SEED = 7
SHINGLE_HASH_SEED = 11
TOKEN_MASK = np.uint64(0xFFFFFFFF)  # token ids live in a 32-bit domain:
                                    # halves the pair-row payload; the stats
                                    # tables use the same masked domain


class Featurizer:
    def __init__(self, cfg: PipelineConfig | None = None):
        self.cfg = cfg or PipelineConfig()
        self.mh = MinHasher(self.cfg.num_perm, seed=self.cfg.seed)

    def __call__(self, batch: pa.Table) -> pa.Table:
        import polars as pl

        cfg = self.cfg
        docs = batch["mention_doc"]
        norm = pl.from_arrow(docs.combine_chunks()
                             if isinstance(docs, pa.ChunkedArray) else docs)
        norm = norm.str.to_lowercase().str.strip_chars()
        token_lists = norm.str.extract_all("[a-z0-9]+")

        # content tokens: stopword-filter + Porter stem (per row, cached stem)
        content = [content_tokens(ts) for ts in token_lists.to_list()]
        content_series = pl.Series("c", content, dtype=pl.List(pl.String))
        tok_hashes = [
            np.unique((h & TOKEN_MASK).astype(np.uint32))
            for h in token_lists_to_hashes(content_series, seed=TOKEN_HASH_SEED)
        ]

        # shingles over the content-token stream
        k = cfg.shingle_k
        shingle_strs = [
            [" ".join(ts[i : i + k]) for i in range(max(1, len(ts) - k + 1))]
            if ts else []
            for ts in content
        ]
        shingle_series = pl.Series("s", shingle_strs, dtype=pl.List(pl.String))
        shingle_hashes = token_lists_to_hashes(shingle_series, seed=SHINGLE_HASH_SEED)

        sigs = self.mh.signatures(shingle_hashes)

        cap = cfg.max_tokens_per_conv
        n_tokens = np.array([len(h) for h in tok_hashes], dtype=np.int32)
        capped = [h[:cap] for h in tok_hashes]  # h is sorted unique → bottom-k

        jw_texts = norm.str.slice(0, cfg.jw_text_cap)

        return pa.table(
            {
                "conv_id": batch["conv_id"],
                "n_turns": batch["n_turns"],
                "sig": batch["sig"],
                "jw_text": pa.Array.from_pandas(jw_texts.to_pandas()),
                "n_tokens": pa.array(n_tokens, type=pa.int32()),
                "tokens": pa.array(capped, type=pa.list_(pa.uint32())),
                "minhash": pa.array(list(sigs), type=pa.list_(pa.uint64())),
            }
        )


def featurize(conv_docs, cfg: PipelineConfig | None = None):
    cfg = cfg or PipelineConfig()
    return conv_docs.map_batches(
        Featurizer,
        fn_constructor_kwargs={"cfg": cfg},
        batch_format="pyarrow",
        batch_size=2048,
        concurrency=(1, cfg.scorer_concurrency),
        num_cpus=1,
    )
