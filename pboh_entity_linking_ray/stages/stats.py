"""Statistics build: the engine's analog of the reference's index files.

The reference loads pre-built TSV indexes into in-JVM Trove maps at startup
(reference: src/main/scala/index/MentionEntitiesFrequencyIndex.scala:34-77,
EntityCooccurrenceIndex.scala:108-170, WordFreqDict.scala:21-46).  Here the
same statistics are *built by the pipeline itself* from the transcript
corpus as groupby-aggregate shuffles with per-batch pre-aggregation
(partial combine inside ``map_batches`` before the small final groupby),
checkpointed as Parquet, and broadcast to scorer actors via ``ray.put``.

Tables produced (FIXTURES.md §4):
- ``vocab``         token_hash → document frequency (df) + the scalar
                    number of conversations N  (analog of WordFreqDict)
- ``mention_prior`` mention (raw token) → entity (stem hash) freq/total
                    (analog of the mention→candidates index)
- ``cooc``          packed uint64 (t1,t2) → co-conversation count
                    (analog of EntityCooccurrenceIndex; built by
                    groupby-aggregate instead of driver-side load)
popularity(e) is df(e) from ``vocab`` (analog of entity popularity,
EntityCooccurrenceIndex.scala:158-181).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from ..config import PipelineConfig
from ..functions.hashing import pack_pairs_np
from .featurize import TOKEN_HASH_SEED

COOC_TOKEN_CAP = 16  # bottom-k sample of tokens entering the per-conv
                     # co-occurrence cross product (bounds the pair shuffle
                     # to C(16,2)=120 rows/conv; the reference instead caps
                     # candidates at top-10, MentEntsFreqIndexWrapper.scala:53-55)


def _token_stats_partial(batch: pa.Table) -> pa.Table:
    """features batch → partial (token_hash, df) counts from the UNCAPPED
    per-conv distinct token lists the featurizer already computed — no
    re-tokenization, no re-stemming, fully vectorized."""
    tf = batch["tokens_full"]
    if isinstance(tf, pa.ChunkedArray):
        tf = tf.combine_chunks()
    flat = np.asarray(tf.flatten()).astype(np.uint32, copy=False)
    if len(flat) == 0:
        return pa.table({"token_hash": pa.array([], type=pa.int64()),
                         "df_partial": pa.array([], type=pa.int64())})
    uniq, counts = np.unique(flat, return_counts=True)
    # 32-bit token domain fits int64 directly (see featurize.TOKEN_MASK)
    return pa.table({
        "token_hash": pa.array(uniq.astype(np.int64), type=pa.int64()),
        "df_partial": pa.array(counts.astype(np.int64), type=pa.int64()),
    })


def build_vocab(features: ray.data.Dataset) -> ray.data.Dataset:
    """token_hash → df (distinct-conversation frequency), from the
    featurize output's ``tokens_full`` column."""
    from ..functions.grouping import bucketed_sum

    partial = features.map_batches(
        _token_stats_partial, batch_format="pyarrow", batch_size=512,
    )
    return bucketed_sum(partial, ["token_hash"], "df_partial", "df")


def _cooc_partial(batch: pa.Table, cap: int = COOC_TOKEN_CAP) -> pa.Table:
    """features batch → partial (pair_key, count) co-occurrence rows using
    the bottom-k token sample already on the feature rows (plain function
    → elastic task pool, see _token_stats_partial)."""
    toks = batch["tokens"].to_pylist()
    keys: list[np.ndarray] = []
    for row in toks:
        h = np.asarray(row[:cap], dtype=np.uint64)
        if len(h) < 2:
            continue
        a, b = np.triu_indices(len(h), k=1)
        keys.append(pack_pairs_np(h[a], h[b]))
    if not keys:
        return pa.table({"pair": pa.array([], type=pa.int64()),
                         "count_partial": pa.array([], type=pa.int64())})
    flat = np.concatenate(keys)
    uniq, counts = np.unique(flat, return_counts=True)
    return pa.table({
        "pair": pa.array(uniq.view(np.int64), type=pa.int64()),
        "count_partial": pa.array(counts.astype(np.int64), type=pa.int64()),
    })


def build_cooc(features: ray.data.Dataset, cfg: PipelineConfig | None = None):
    """packed (t1,t2) → number of conversations containing both tokens."""

    from ..functions.grouping import bucketed_sum

    partial = features.map_batches(
        _cooc_partial, batch_format="pyarrow", batch_size=512,
    )
    return bucketed_sum(partial, ["pair"], "count_partial", "count")


def _mention_prior_partial(batch: pa.Table) -> pa.Table:
    """conv_docs batch → partial (mention, entity=stem hash) counts.

    Analog of the mention→candidates index build (CandidatesList freq /
    total, reference: index/CandidatesList.scala:95-98): p̂(e|m) =
    freq(m→e) / Σ_e' freq(m→e')."""
    import polars as pl

    from ..functions.stemmer import porter_stem
    from ..functions.text import STOPWORDS

    docs = pl.from_arrow(batch["mention_doc"].combine_chunks())
    token_lists = docs.str.to_lowercase().str.extract_all("[a-z0-9]+")
    mentions: list[str] = []
    for ts in token_lists.to_list():
        mentions.extend(t for t in ts if t not in STOPWORDS)
    if not mentions:
        return pa.table({"mention": pa.array([], type=pa.string()),
                         "entity": pa.array([], type=pa.int64()),
                         "freq_partial": pa.array([], type=pa.int64())})
    s = pl.Series("m", mentions)
    df = (
        pl.DataFrame({"mention": s})
        .group_by("mention")
        .len(name="freq_partial")
    )
    stems = [porter_stem(m) for m in df["mention"].to_list()]
    ent = (
        pl.Series("e", stems).hash(seed=TOKEN_HASH_SEED)
        .to_numpy().astype(np.uint64).view(np.int64)
    )
    return pa.table({
        "mention": pa.array(df["mention"].to_list(), type=pa.string()),
        "entity": pa.array(ent, type=pa.int64()),
        "freq_partial": pa.array(df["freq_partial"].to_numpy().astype(np.int64),
                                 type=pa.int64()),
    })


def build_mention_prior(conv_docs: ray.data.Dataset):
    """mention → (entity, freq, total); total = Σ freq over the mention."""

    from ..functions.grouping import bucketed_sum

    partial = conv_docs.map_batches(
        _mention_prior_partial, batch_format="pyarrow", batch_size=512,
    )
    agg = bucketed_sum(partial, ["mention", "entity"], "freq_partial", "freq")

    def _with_total(bucket: pa.Table) -> pa.Table:
        import polars as pl

        out = pl.from_arrow(bucket).with_columns(
            pl.col("freq").sum().over("mention").alias("total")
        )
        return out.to_arrow()

    from ..functions.grouping import bucketed_groups

    return bucketed_groups(agg, "mention", _with_total)
