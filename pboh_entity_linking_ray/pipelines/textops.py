"""Text fingerprinting / near-dup operators over the documents table.

All three operators hash tokens with DuckDB's ``md5_number_lower``
semantics (functions.hashing.md5_lower64) so each has an exact SQL twin:

- SimHash-64: bit-majority of distinct-token hashes → 64-char bitstring
  (emitted as a bitstring, not an int, to dodge int64/UBIGINT mismatches).
- Winnowing-style fingerprints: 8-token shingles, mod-p sampled (p=8),
  emitted as 16-hex strings (document fingerprinting via rolling shingle
  hashes; Schleimer et al. winnowing, simplified to mod-p selection).
- n-gram Jaccard near-dup pairs: 3-token shingle sets, inverted-index
  pair generation (groupby shingle → pairs → count shared), e4
  fixed-point Jaccard.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from ..functions.hashing import md5_lower64

WINNOW_W = 8        # shingle width for fingerprints
WINNOW_MOD = 8      # keep fp where fp % WINNOW_MOD == 0
JAC_SHINGLE_K = 3
JAC_MIN_E4 = 200    # jaccard >= 0.02


def _docs(sf_dir: str):
    return ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text"])


def _token_lists(t: pa.Table) -> list[list[str]]:
    import polars as pl
    return (
        pl.from_arrow(t["text"].combine_chunks())
        .str.to_lowercase().str.extract_all("[a-z0-9]+")
        .to_list()
    )


# --- SimHash ----------------------------------------------------------------

class SimHasher:
    """Actor: md5 cache persists across batches."""

    def __init__(self):
        self.cache: dict[str, int] = {}

    def _h(self, tok: str) -> int:
        v = self.cache.get(tok)
        if v is None:
            v = md5_lower64(tok)
            self.cache[tok] = v
        return v

    def __call__(self, t: pa.Table) -> pa.Table:
        bits_idx = np.arange(64, dtype=np.uint64)
        out = []
        for toks in _token_lists(t):
            uniq = sorted(set(toks))
            if not uniq:
                out.append("0" * 64)
                continue
            hs = np.array([self._h(x) for x in uniq], dtype=np.uint64)
            bits = (hs[:, None] >> bits_idx[None, :]) & np.uint64(1)
            maj = (2 * bits.astype(np.int64) - 1).sum(axis=0) > 0
            out.append("".join("1" if maj[b] else "0" for b in range(63, -1, -1)))
        return pa.table({"doc_id": t["doc_id"],
                         "simhash_bits": pa.array(out, type=pa.string())})


def q13_simhash(sf_dir: str):
    return _docs(sf_dir).map_batches(SimHasher, batch_format="pyarrow",
                                     batch_size=256, concurrency=(1, 4))


SQL_Q13 = """
WITH tok AS (
  SELECT doc_id,
         unnest(list_distinct(regexp_extract_all(lower(text), '[a-z0-9]+'))) AS t
  FROM documents
),
b AS (
  SELECT doc_id, bit,
         sum(CASE WHEN (md5_number_lower(t) >> bit) & 1 = 1 THEN 1 ELSE -1 END) AS s
  FROM tok CROSS JOIN generate_series(0, 63) g(bit)
  GROUP BY doc_id, bit
)
SELECT doc_id,
       coalesce(string_agg(CASE WHEN s > 0 THEN '1' ELSE '0' END, ''
                           ORDER BY bit DESC), repeat('0', 64)) AS simhash_bits
FROM b GROUP BY doc_id
UNION ALL
SELECT doc_id, repeat('0', 64) AS simhash_bits
FROM documents
WHERE len(regexp_extract_all(lower(text), '[a-z0-9]+')) = 0
"""


# --- Winnowing fingerprints -------------------------------------------------

class Winnower:
    def __init__(self):
        self.cache: dict[str, int] = {}

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = np.asarray(t["doc_id"], dtype=np.int64)
        out_doc, out_fp = [], []
        for i, toks in enumerate(_token_lists(t)):
            seen = set()
            for j in range(max(0, len(toks) - WINNOW_W + 1)):
                sh = " ".join(toks[j : j + WINNOW_W])
                v = self.cache.get(sh)
                if v is None:
                    v = md5_lower64(sh)
                    self.cache[sh] = v
                if v % WINNOW_MOD == 0:
                    seen.add(format(v, "016x"))
            for fp in sorted(seen):
                out_doc.append(int(ids[i]))
                out_fp.append(fp)
        return pa.table({"doc_id": pa.array(out_doc, type=pa.int64()),
                         "fp_hex": pa.array(out_fp, type=pa.string())})


def q15_winnow_fingerprints(sf_dir: str):
    return _docs(sf_dir).map_batches(Winnower, batch_format="pyarrow",
                                     batch_size=256, concurrency=(1, 4))


SQL_Q15 = f"""
WITH sh AS (
  SELECT doc_id,
         unnest(list_distinct(list_transform(
             generate_series(1, greatest(len(toks) - {WINNOW_W - 1}, 0)),
             i -> list_aggregate(toks[i : i + {WINNOW_W - 1}], 'string_agg', ' ')
         ))) AS s
  FROM (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
        FROM documents)
)
SELECT DISTINCT doc_id,
       lower(lpad(to_hex(md5_number_lower(s)), 16, '0')) AS fp_hex
FROM sh
WHERE md5_number_lower(s) % {WINNOW_MOD} = 0
"""


# --- n-gram Jaccard near-dup pairs ------------------------------------------

def q12_ngram_jaccard_pairs(sf_dir: str):
    """Inverted-index near-dup join: explode distinct shingles →
    groupby(shingle) pair emission → groupby(pair) count → Jaccard.
    This is the shuffle-based dedup pattern (no broadcast side); the
    per-doc set size rides on every row so no second join is needed."""
    from ray.data.aggregate import Sum

    k = JAC_SHINGLE_K

    def explode(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["doc_id"], dtype=np.int64)
        out_doc, out_sh, out_n = [], [], []
        for i, toks in enumerate(_token_lists(t)):
            sset = {" ".join(toks[j : j + k])
                    for j in range(max(0, len(toks) - k + 1))}
            for s in sset:
                out_doc.append(int(ids[i]))
                out_sh.append(s)
                out_n.append(len(sset))
        return pa.table({"doc_id": pa.array(out_doc, type=pa.int64()),
                         "sh": pa.array(out_sh, type=pa.string()),
                         "n_sh": pa.array(out_n, type=pa.int64())})

    rows = _docs(sf_dir).map_batches(explode, batch_format="pyarrow",
                                     batch_size=256)

    def pairs(g: pa.Table) -> pa.Table:
        m = g.num_rows
        if m < 2:
            return pa.table({"pair": pa.array([], type=pa.int64()),
                             "na": pa.array([], type=pa.int64()),
                             "nb": pa.array([], type=pa.int64()),
                             "one": pa.array([], type=pa.int64())})
        ids = np.asarray(g["doc_id"], dtype=np.int64)
        ns = np.asarray(g["n_sh"], dtype=np.int64)
        o = np.argsort(ids)
        ids, ns = ids[o], ns[o]
        a, b = np.triu_indices(m, k=1)
        pair = ids[a] * (1 << 32) + ids[b]   # doc ids are < 2^31
        return pa.table({"pair": pa.array(pair),
                         "na": pa.array(ns[a]), "nb": pa.array(ns[b]),
                         "one": pa.array(np.ones(len(a), dtype=np.int64))})

    shared = rows.groupby("sh").map_groups(pairs, batch_format="pyarrow")
    agg = shared.groupby(["pair", "na", "nb"]).aggregate(
        Sum("one", alias_name="inter")
    )

    def finish(t: pa.Table) -> pa.Table:
        pair = np.asarray(t["pair"], dtype=np.int64)
        na = np.asarray(t["na"], dtype=np.int64)
        nb = np.asarray(t["nb"], dtype=np.int64)
        inter = np.asarray(t["inter"], dtype=np.int64)
        jac = (inter * 10000) // (na + nb - inter)
        keep = jac >= JAC_MIN_E4
        return pa.table({
            "doc_a": pa.array(pair[keep] >> 32),
            "doc_b": pa.array(pair[keep] & 0xFFFFFFFF),
            "jac_e4": pa.array(jac[keep]),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


SQL_Q12 = f"""
WITH s AS (
  SELECT doc_id, len(shs) AS n_sh, unnest(shs) AS sh
  FROM (SELECT doc_id, list_distinct(list_transform(
            generate_series(1, greatest(len(toks) - {JAC_SHINGLE_K - 1}, 0)),
            i -> list_aggregate(toks[i : i + {JAC_SHINGLE_K - 1}], 'string_agg', ' ')
        )) AS shs
        FROM (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
              FROM documents))
),
p AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         any_value(a.n_sh) AS na, any_value(b.n_sh) AS nb,
         count(*) AS inter
  FROM s a JOIN s b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b, (inter * 10000) // (na + nb - inter) AS jac_e4
FROM p
WHERE (inter * 10000) // (na + nb - inter) >= {JAC_MIN_E4}
"""

QUERIES = {
    "q12_ngram_jaccard_pairs": (q12_ngram_jaccard_pairs, SQL_Q12),
    "q13_simhash": (q13_simhash, SQL_Q13),
    "q15_winnow_fingerprints": (q15_winnow_fingerprints, SQL_Q15),
}
