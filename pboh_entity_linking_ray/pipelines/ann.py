"""Similarity search over the embeddings table.

- Brute-force cosine top-k: numpy matmul per Arrow batch against a
  broadcast, L2-normalized query matrix (``ray.put`` once, read per actor)
  — the baseline demanded for training-data pipelines.
- Embedding-cosine near-duplicate pairs (the embedding member of the
  dedup family).
- LSH-bucketed approximate variant (``ann_lsh``) — the scale path: random
  hyperplane signatures bucket the corpus; a query only scans its bucket
  and Hamming-1 neighbors.  No SQL twin (approximate by construction).

Cosines are emitted as e6 fixed-point ints (``floor(cos*1e6+0.5)``).
DuckDB's ``list_cosine_similarity`` accumulates in float32 (≈1e-7 off) —
not matchable — so the SQL twins spell the cosine out in float64
(``list_sum`` of per-element DOUBLE products) and the numpy side uses the
same dot/(|a||b|) formula; residual error ~1e-15 never moves an e6 bucket.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

N_QUERIES = 8
TOP_K = 10
NEARDUP_COS_E6 = 250_000  # cos >= 0.25


def _read_embeddings(sf_dir: str):
    return ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                                 columns=["vec_id", "embedding"])


def _matrix(tbl_or_batch) -> tuple[np.ndarray, np.ndarray]:
    ids = np.asarray(tbl_or_batch["vec_id"], dtype=np.int64)
    emb = tbl_or_batch["embedding"]
    if isinstance(emb, pa.ChunkedArray):
        emb = emb.combine_chunks()
    flat = np.asarray(emb.flatten(), dtype=np.float64)
    mat = flat.reshape(len(ids), -1)
    return ids, mat


def _normalize(mat: np.ndarray) -> np.ndarray:
    return mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-30)


def _cos_e6(mat_a: np.ndarray, mat_b: np.ndarray) -> np.ndarray:
    """(na, d) × (nb, d) → (na, nb) e6 fixed-point cosines, with the same
    float64 formula as the SQL twin: dot / (|a| * |b|)."""
    dots = mat_a @ mat_b.T
    na = np.sqrt(np.sum(mat_a * mat_a, axis=1))
    nb = np.sqrt(np.sum(mat_b * mat_b, axis=1))
    cos = dots / np.maximum(na[:, None] * nb[None, :], 1e-30)
    return np.floor(cos * 1_000_000 + 0.5).astype(np.int64)


def q10_knn_bruteforce(sf_dir: str):
    """Exact top-k cosine neighbors for the first N_QUERIES vectors."""
    qt = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"],
        filter=(pa.compute.field("vec_id") < N_QUERIES),
    ).to_arrow_refs()
    q_tbl = pa.concat_tables([ray.get(r) for r in qt])
    q_ids, q_mat = _matrix(q_tbl)
    order = np.argsort(q_ids)
    q_ids, q_mat = q_ids[order], q_mat[order]
    ref = ray.put((q_ids, q_mat))

    class Score:
        def __init__(self, qref):
            self.q_ids, self.q_mat = ray.get(qref) if isinstance(qref, ray.ObjectRef) else qref

        def __call__(self, t: pa.Table) -> pa.Table:
            ids, mat = _matrix(t)
            cos_e6 = _cos_e6(mat, self.q_mat)             # (batch, nq)
            nb, nq = cos_e6.shape
            qcol = np.repeat(self.q_ids[None, :], nb, axis=0).ravel()
            vcol = np.repeat(ids, nq)
            keep = qcol != vcol
            return pa.table({
                "query_id": pa.array(qcol[keep]),
                "vec_id": pa.array(vcol[keep]),
                "cos_e6": pa.array(cos_e6.ravel()[keep]),
            })

    scored = _read_embeddings(sf_dir).map_batches(
        Score, fn_constructor_kwargs={"qref": ref},
        batch_format="pyarrow", batch_size=4096, concurrency=(1, 4),
    )

    def topk(g: pa.Table) -> pa.Table:
        cos = np.asarray(g["cos_e6"])
        vid = np.asarray(g["vec_id"])
        order = np.lexsort((vid, -cos))[:TOP_K]
        return g.take(pa.array(np.sort(order)))

    return scored.groupby("query_id").map_groups(topk, batch_format="pyarrow")


_COS_SQL = (
    "list_sum(list_transform(generate_series(1, len({a})), "
    "i -> {a}[i]::DOUBLE * {b}[i]::DOUBLE)) / ({na} * {nb})"
)

SQL_Q10 = f"""
WITH n AS (SELECT vec_id, embedding,
                  sqrt(list_sum(list_transform(embedding,
                       x -> x::DOUBLE * x::DOUBLE))) AS nrm
           FROM embeddings),
q AS (SELECT vec_id AS query_id, embedding AS qe, nrm AS qn
      FROM n WHERE vec_id < {N_QUERIES}),
c AS (SELECT query_id, e.vec_id,
             CAST(floor(({_COS_SQL.format(a='qe', b='e.embedding',
                                          na='qn', nb='e.nrm')})
                        * 1000000 + 0.5) AS BIGINT) AS cos_e6
      FROM q CROSS JOIN n e
      WHERE e.vec_id <> query_id)
SELECT query_id, vec_id, cos_e6 FROM c
QUALIFY row_number() OVER (PARTITION BY query_id
                           ORDER BY cos_e6 DESC, vec_id) <= {TOP_K}
"""


def q11_embedding_neardup(sf_dir: str):
    """Embedding-cosine near-duplicate pairs (vec_a < vec_b, cos ≥ τ).

    Small-scale form: the whole normalized matrix is broadcast and each
    batch matmuls against it — O(n²) compare but fully vectorized.  The
    100 TB path is ``ann_lsh``: bucket by hyperplane signature and compare
    within buckets only."""
    full = pa.concat_tables(
        [ray.get(r) for r in _read_embeddings(sf_dir).to_arrow_refs()]
    )
    ids_all, mat_all = _matrix(full)
    o = np.argsort(ids_all)
    ids_all, mat_all = ids_all[o], mat_all[o]
    ref = ray.put((ids_all, mat_all))

    class NearDup:
        def __init__(self, r):
            self.ids, self.mat = ray.get(r) if isinstance(r, ray.ObjectRef) else r

        def __call__(self, t: pa.Table) -> pa.Table:
            ids, mat = _matrix(t)
            cos_e6 = _cos_e6(mat, self.mat)
            a = np.repeat(ids, len(self.ids))
            b = np.tile(self.ids, len(ids))
            flat = cos_e6.ravel()
            keep = (a < b) & (flat >= NEARDUP_COS_E6)
            return pa.table({
                "vec_a": pa.array(a[keep]), "vec_b": pa.array(b[keep]),
                "cos_e6": pa.array(flat[keep]),
            })

    return _read_embeddings(sf_dir).map_batches(
        NearDup, fn_constructor_kwargs={"r": ref},
        batch_format="pyarrow", batch_size=2048, concurrency=(1, 4),
    )


SQL_Q11 = f"""
WITH n AS (SELECT vec_id, embedding,
                  sqrt(list_sum(list_transform(embedding,
                       x -> x::DOUBLE * x::DOUBLE))) AS nrm
           FROM embeddings),
c AS (SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
             CAST(floor(({_COS_SQL.format(a='a.embedding', b='b.embedding',
                                          na='a.nrm', nb='b.nrm')})
                        * 1000000 + 0.5) AS BIGINT) AS cos_e6
      FROM n a JOIN n b ON a.vec_id < b.vec_id)
SELECT vec_a, vec_b, cos_e6 FROM c WHERE cos_e6 >= {NEARDUP_COS_E6}
"""


N_PLANES = 8


def ann_lsh(sf_dir: str, n_queries: int = N_QUERIES, k: int = TOP_K):
    """Approximate top-k via random-hyperplane LSH buckets (scale path).

    Index: signature = sign bits of V·H (H = seeded Gaussian hyperplanes)
    → bucket id.  Query probes its own bucket plus all Hamming-1 buckets.
    Approximate → no SQL oracle; recall vs q10 is asserted in tests."""
    full = pa.concat_tables(
        [ray.get(r) for r in _read_embeddings(sf_dir).to_arrow_refs()]
    )
    ids, mat = _matrix(full)
    o = np.argsort(ids)
    ids, mat = ids[o], _normalize(mat[o])
    dim = mat.shape[1]
    planes = np.random.Generator(np.random.PCG64(1234)).standard_normal((dim, N_PLANES))
    sig = (mat @ planes > 0).astype(np.uint32)
    bucket = (sig << np.arange(N_PLANES, dtype=np.uint32)).sum(axis=1)
    ref = ray.put((ids, mat, bucket))

    class Probe:
        def __init__(self, r, planes):
            self.ids, self.mat, self.bucket = (
                ray.get(r) if isinstance(r, ray.ObjectRef) else r
            )
            self.planes = planes
            self.by_bucket: dict[int, np.ndarray] = {}
            for i, b in enumerate(self.bucket):
                self.by_bucket.setdefault(int(b), []).append(i)
            self.by_bucket = {b: np.array(v) for b, v in self.by_bucket.items()}

        def __call__(self, t: pa.Table) -> pa.Table:
            q_ids, q_mat = _matrix(t)
            q_mat = _normalize(q_mat)
            q_sig = (q_mat @ self.planes > 0).astype(np.uint32)
            q_bucket = (q_sig << np.arange(N_PLANES, dtype=np.uint32)).sum(axis=1)
            out_q, out_v, out_c = [], [], []
            for qi in range(len(q_ids)):
                probes = [int(q_bucket[qi])] + [
                    int(q_bucket[qi]) ^ (1 << p) for p in range(N_PLANES)
                ]
                cand = np.concatenate([
                    self.by_bucket.get(b, np.empty(0, dtype=np.int64))
                    for b in probes
                ]).astype(np.int64)
                cand = cand[self.ids[cand] != q_ids[qi]]
                if len(cand) == 0:
                    continue
                cos = self.mat[cand] @ q_mat[qi]
                cos_e6 = np.floor(cos * 1_000_000 + 0.5).astype(np.int64)
                order = np.lexsort((self.ids[cand], -cos_e6))[:k]
                out_q.extend([int(q_ids[qi])] * len(order))
                out_v.extend(self.ids[cand][order].tolist())
                out_c.extend(cos_e6[order].tolist())
            return pa.table({
                "query_id": pa.array(out_q, type=pa.int64()),
                "vec_id": pa.array(out_v, type=pa.int64()),
                "cos_e6": pa.array(out_c, type=pa.int64()),
            })

    queries = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"],
        filter=(pa.compute.field("vec_id") < n_queries),
    )
    return queries.map_batches(
        Probe, fn_constructor_kwargs={"r": ref, "planes": planes},
        batch_format="pyarrow", batch_size=1024, concurrency=(1, 4),
    )


QUERIES = {
    "q10_knn_bruteforce": (q10_knn_bruteforce, SQL_Q10),
    "q11_embedding_neardup": (q11_embedding_neardup, SQL_Q11),
    "ann_lsh_topk": (ann_lsh, None),  # approximate → rows-only check
}
