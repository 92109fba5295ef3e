"""Deterministic split / sample / shuffle operators (SURVEY.md §2.7 T6-T8).

The reference routes lines with wall-clock ``Math.random()``
(reference: src/main/scala/eval/SplitFileIntoDevValidationTest.scala:21-35,
``takeSample``/``shuffle`` at learning/FewParamsLearning.scala:76-79,751-753)
— irreproducible by design.  The recast is CONTENT-HASH routing (SURVEY.md
§2.7 T7): every operator is a pure function of (key, seed), so splits are
stable under re-runs, resumes and repartitioning — the property a 100 TB
train/val/test split cannot live without.

The oracle twins hash with DuckDB's ``md5_number_lower``; the library
functions for the hot path (``split_routes`` with ``hasher="fast"``) use
the vectorized xxhash instead — same routing logic, no per-row Python.
"""

from __future__ import annotations
from pboh_entity_linking_ray.sources.reading import read_parquet_clean

import numpy as np
import pyarrow as pa
import ray.data

from ..functions.hashing import hash_strings_u64, md5_lower64

SPLIT_MOD = 10_000
# (upper bound in permille-of-10k, split name) — evaluated in order;
# proportions mirror the reference's ~1% validation / ~10% test / small
# learn slice / rest index (SplitFileIntoDevValidationTest.scala:21-35)
SPLIT_EDGES = ((100, "val"), (1100, "test"), (1150, "learn"),
               (SPLIT_MOD, "index"))
SAMPLE_SEED = 7
SAMPLE_FRAC_E4 = 500          # 5% sample
SHUFFLE_SEED = 11
SHUFFLE_HEAD = 100


def _route_md5(keys: list[str], seed: int = 0) -> np.ndarray:
    pref = f"{seed}:" if seed else ""
    return np.array([md5_lower64(pref + k) % SPLIT_MOD for k in keys],
                    dtype=np.int64)


def split_routes(ds: ray.data.Dataset, key_col: str, *, seed: int = 0,
                 hasher: str = "fast") -> ray.data.Dataset:
    """Append a ``split`` column routed by content hash — the K5/T7
    splitter as one streaming map (write with
    ``write_parquet(partition_cols=["split"])`` for the 4-sink layout).

    hasher="fast" → vectorized xxhash (production); "md5" → DuckDB-parity
    md5 (oracle twins)."""

    def f(t: pa.Table) -> pa.Table:
        import polars as pl

        keys = pl.from_arrow(t[key_col].combine_chunks()).cast(pl.String)
        if hasher == "md5":
            r = _route_md5(keys.to_list(), seed)
        else:
            pref = (keys + "") if not seed else (str(seed) + ":" + keys)
            r = (hash_strings_u64(pref, seed=seed) %
                 np.uint64(SPLIT_MOD)).astype(np.int64)
        split = np.full(len(r), SPLIT_EDGES[-1][1], dtype=object)
        prev = 0
        for hi, name in SPLIT_EDGES:
            split[(r >= prev) & (r < hi)] = name
            prev = hi
        return t.append_column("split", pa.array(split, type=pa.string()))

    return ds.map_batches(f, batch_format="pyarrow")


def write_split(ds: ray.data.Dataset, root: str, key_col: str, *,
                seed: int = 0) -> None:
    """The K5 splitter SINK: route by content hash and write one Hive
    partition directory per split (train-pipeline layout; the reference
    writes 4 sequential files, SplitFileIntoDevValidationTest.scala:36-40
    — partitioned Parquet is the resumable 100 TB equivalent)."""
    split_routes(ds, key_col, seed=seed).write_parquet(
        root, partition_cols=["split"])


def q16_split(sf_dir: str):
    """documents → per-split row counts (hash-routed 4-way split)."""
    from ray.data.aggregate import Sum

    ds = read_parquet_clean(f"{sf_dir}/documents.parquet",
                               columns=["doc_id"])
    routed = split_routes(ds, "doc_id", hasher="md5")

    def partial(t: pa.Table) -> pa.Table:
        import polars as pl

        out = (pl.from_arrow(t).group_by("split").len(name="n_partial")
               .with_columns(pl.col("n_partial").cast(pl.Int64)))
        return out.to_arrow()

    return (routed.map_batches(partial, batch_format="pyarrow")
            .groupby("split").aggregate(Sum("n_partial", alias_name="n")))


_SPLIT_CASE = ("CASE "
               + " ".join(f"WHEN r < {hi} THEN '{name}'"
                          for hi, name in SPLIT_EDGES[:-1])
               + f" ELSE '{SPLIT_EDGES[-1][1]}' END")

SQL_Q16 = f"""
SELECT {_SPLIT_CASE} AS split, count(*) AS n
FROM (SELECT md5_number_lower(doc_id::VARCHAR) % {SPLIT_MOD} AS r
      FROM documents)
GROUP BY 1
"""


def q17_sample(sf_dir: str):
    """Seeded deterministic sample (T6 recast): keep rows whose seeded
    content hash falls under the rate — reproducible, repartition-proof."""
    ds = read_parquet_clean(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "n_chars"])

    def f(t: pa.Table) -> pa.Table:
        keys = [f"{SAMPLE_SEED}:{v}" for v in t["doc_id"].to_pylist()]
        r = np.array([md5_lower64(k) % SPLIT_MOD for k in keys],
                     dtype=np.int64)
        return t.filter(pa.array(r < SAMPLE_FRAC_E4))

    return ds.map_batches(f, batch_format="pyarrow")


SQL_Q17 = f"""
SELECT doc_id, n_chars FROM documents
WHERE md5_number_lower('{SAMPLE_SEED}:' || doc_id::VARCHAR) % {SPLIT_MOD}
      < {SAMPLE_FRAC_E4}
"""


def stratified_sample(ds: ray.data.Dataset, key_col: str, strata_col: str,
                      rates_e4: dict[str, int], default_e4: int, *,
                      seed: int = SAMPLE_SEED,
                      hasher: str = "fast") -> ray.data.Dataset:
    """Per-stratum deterministic sampling — the rebalancing step of a
    training-data pipeline (e.g. downsample the dominant language,
    upweight the rare ones) as ONE streaming map: a row survives iff its
    seeded content hash falls under its stratum's rate (permille-of-10k).

    Content-hash routing (not RNG) keeps the sample stable under
    re-runs, resumes and repartitioning, and the per-stratum thresholds
    are a plain dict lookup vectorized through polars ``replace_strict``
    — no shuffle, no per-row Python.  ``rates_e4`` is a SMALL table
    (strata counts, not rows); at cluster scale it ships once inside the
    map closure exactly like the broadcast lookups everywhere else."""

    def f(t: pa.Table) -> pa.Table:
        import polars as pl

        keys = pl.from_arrow(t[key_col].combine_chunks()).cast(pl.String)
        if hasher == "md5":
            r = _route_md5([f"{seed}:{k}" for k in keys], 0)
        else:
            r = (hash_strings_u64(str(seed) + ":" + keys, seed=seed)
                 % np.uint64(SPLIT_MOD)).astype(np.int64)
        thr = (pl.from_arrow(t[strata_col].combine_chunks())
               .replace_strict(rates_e4, default=default_e4,
                               return_dtype=pl.Int64).to_numpy())
        return t.filter(pa.array(r < thr))

    return ds.map_batches(f, batch_format="pyarrow")


# stratified rates for q27: keep 5% of English docs, 40% of everything
# else — the classic rebalance-away-from-the-head-language shape
STRAT_RATES_E4 = {"en": 500}
STRAT_DEFAULT_E4 = 4000


def q27_stratified_sample(sf_dir: str):
    ds = read_parquet_clean(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "lang"])
    return stratified_sample(ds, "doc_id", "lang", STRAT_RATES_E4,
                             STRAT_DEFAULT_E4, hasher="md5")


_STRAT_CASE = ("CASE " + " ".join(
    f"WHEN lang = '{s}' THEN {r}" for s, r in STRAT_RATES_E4.items())
    + f" ELSE {STRAT_DEFAULT_E4} END")

SQL_Q27 = f"""
SELECT doc_id, lang FROM documents
WHERE md5_number_lower('{SAMPLE_SEED}:' || doc_id::VARCHAR) % {SPLIT_MOD}
      < {_STRAT_CASE}
"""


def q18_shuffle_head(sf_dir: str):
    """Seeded global shuffle (T8 recast), evidenced by its first
    SHUFFLE_HEAD rows: sort by the seeded content hash (ties by doc_id)
    and take the head — a deterministic permutation any engine reproduces."""
    ds = read_parquet_clean(f"{sf_dir}/documents.parquet",
                               columns=["doc_id"])

    def key(t: pa.Table) -> pa.Table:
        keys = [f"{SHUFFLE_SEED}:{v}" for v in t["doc_id"].to_pylist()]
        r = np.array([md5_lower64(k) for k in keys], dtype=np.uint64)
        return t.append_column("shuffle_key", pa.array(r.view(np.int64)))

    return (ds.map_batches(key, batch_format="pyarrow")
            .sort(["shuffle_key", "doc_id"]).limit(SHUFFLE_HEAD))


SQL_Q18 = f"""
SELECT doc_id,
       CAST(md5_number_lower('{SHUFFLE_SEED}:' || doc_id::VARCHAR)
            - CASE WHEN md5_number_lower('{SHUFFLE_SEED}:' || doc_id::VARCHAR)
                        >= 9223372036854775808 THEN 18446744073709551616
                   ELSE 0 END AS BIGINT) AS shuffle_key
FROM documents
ORDER BY shuffle_key, doc_id LIMIT {SHUFFLE_HEAD}
"""

QUERIES = {
    "q16_split": (q16_split, SQL_Q16),
    "q17_sample": (q17_sample, SQL_Q17),
    "q18_shuffle_head": (q18_shuffle_head, SQL_Q18),
    "q27_stratified_sample": (q27_stratified_sample, SQL_Q27),
}
