"""q32: the end-to-end training-data prep pipeline — the composition
story.  Every stage is an operator the engine already ships, chained
lazily so the whole thing streams: quality gate (q08's metrics) →
exact dedup keep-min (q06's exchange) → stratified language rebalance
(q27's sampler) → deterministic split routing (q16's router).  One
oracle-paired result proves the COMPOSITION is exact, not just each
stage: the DuckDB twin chains the same four steps as CTEs.

At 100 TB every stage is either a streaming map (quality, sample,
split) or the one content-hash exchange the dedup genuinely needs —
there is no other shuffle, no driver materialization, and the output
is ready for ``write_parquet(partition_cols=["split"])``.
"""

from __future__ import annotations

import pyarrow as pa
import ray.data

from .relational import _STOP_SQL, _t, quality_metrics
from .sampling import (
    SAMPLE_SEED,
    SPLIT_MOD,
    STRAT_DEFAULT_E4,
    STRAT_RATES_E4,
    _SPLIT_CASE,
    split_routes,
    stratified_sample,
)


def q32_prep_corpus(sf_dir: str):
    from ..functions.grouping import bucketed_groups

    docs = _t(sf_dir, "documents", ["doc_id", "text", "lang"])

    # 1. quality gate — streaming map, text rides through for the dedup
    def gate(t: pa.Table) -> pa.Table:
        m = quality_metrics(t, keep=("doc_id", "lang", "text"))
        return m.filter(m["quality_ok"]).select(["doc_id", "lang", "text"])

    gated = docs.map_batches(gate, batch_format="pyarrow")

    # 2. exact dedup among the survivors: min doc_id per text, carrying
    #    THAT row's lang (bucketed by text hash, one vectorized pass)
    def keep_first(bucket: pa.Table) -> pa.Table:
        import polars as pl

        return (pl.from_arrow(bucket).sort("doc_id")
                .group_by("text").first()
                .select(["doc_id", "lang"]).to_arrow())

    deduped = bucketed_groups(gated, "text", keep_first, engine="exchange")

    # 3. + 4. rebalance and route — two more streaming maps
    sampled = stratified_sample(deduped, "doc_id", "lang", STRAT_RATES_E4,
                                STRAT_DEFAULT_E4, hasher="md5")
    return (split_routes(sampled, "doc_id", hasher="md5")
            .select_columns(["doc_id", "lang", "split"]))


_STRAT_CASE = ("CASE " + " ".join(
    f"WHEN lang = '{s}' THEN {r}" for s, r in STRAT_RATES_E4.items())
    + f" ELSE {STRAT_DEFAULT_E4} END")

SQL_Q32 = f"""
WITH q AS (
  SELECT doc_id, lang, text
  FROM (SELECT doc_id, lang, text,
               len(toks) AS n_tokens,
               len(list_filter(toks, x -> list_contains({_STOP_SQL}, x)))
                   AS n_stop,
               CAST(coalesce(list_sum(list_transform(toks, x -> length(x))),
                             0) AS BIGINT) AS total_len
        FROM (SELECT doc_id, lang, text,
                     regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
              FROM documents))
  WHERE n_tokens >= 5
    AND (n_stop * 10000) // n_tokens <= 5000
    AND (total_len * 10000) // n_tokens BETWEEN 20000 AND 120000
),
d AS (
  SELECT min(doc_id) AS doc_id, arg_min(lang, doc_id) AS lang
  FROM q GROUP BY text
),
s AS (
  SELECT doc_id, lang FROM d
  WHERE md5_number_lower('{SAMPLE_SEED}:' || doc_id::VARCHAR) % {SPLIT_MOD}
        < {_STRAT_CASE}
)
SELECT doc_id, lang,
       {_SPLIT_CASE.replace("r <", "md5_number_lower(doc_id::VARCHAR)"
                            f" % {SPLIT_MOD} <")} AS split
FROM s
"""


QUERIES = {
    "q32_prep_corpus": (q32_prep_corpus, SQL_Q32),
}
