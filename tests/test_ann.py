"""ANN operators: exactness of the in-bucket verify (every LSH output is
a true cosine row) and real recall on a PLANTED clustered corpus — the
testdata embeddings are near-orthogonal noise (max pairwise cos ≈ 0.48),
where top-k LSH recall is information-theoretically meaningless, so the
recall bars run on vectors with actual duplicate structure."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pboh_entity_linking_ray.pipelines import ann


@pytest.fixture(scope="module")
def planted_dir(tmp_path_factory):
    """120 base vectors, each with 3 noisy near-copies (cos ≈ 0.99)."""
    rng = np.random.Generator(np.random.PCG64(7))
    base = rng.standard_normal((120, 64))
    rows = []
    vid = 0
    for b in base:
        for _ in range(4):
            v = b + 0.05 * rng.standard_normal(64)
            rows.append((vid, v))
            vid += 1
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    mat = np.stack([r[1] for r in rows]).astype(np.float32)
    d = tmp_path_factory.mktemp("planted")
    pq.write_table(
        pa.table({
            "vec_id": pa.array(ids),
            "embedding": pa.array([v.tolist() for v in mat],
                                  type=pa.list_(pa.float32())),
            "label": pa.array((ids // 4).astype(np.int32)),
        }),
        os.path.join(str(d), "embeddings.parquet"))
    return str(d)


def _brute(dirpath):
    t = pq.read_table(os.path.join(dirpath, "embeddings.parquet"))
    ids = np.asarray(t["vec_id"], dtype=np.int64)
    m = np.asarray(t["embedding"].combine_chunks().flatten(),
                   dtype=np.float64).reshape(len(ids), -1)
    return ids, m


def test_neardup_lsh_subset_and_recall(planted_dir, ray_session):
    got = ann.ann_neardup_lsh(planted_dir).to_pandas()
    ids, m = _brute(planted_dir)
    cos = ann._cos_e6(m, m)
    ia, ib = np.triu_indices(len(ids), k=1)
    keep = cos[ia, ib] >= ann.NEARDUP_COS_E6
    truth = {(int(ids[a]), int(ids[b])): int(cos[a, b])
             for a, b in zip(ia[keep], ib[keep])}
    for va, vb, c in got[["vec_a", "vec_b", "cos_e6"]].to_numpy():
        assert truth[(int(va), int(vb))] == int(c)      # exact verify
    # planted copies sit at cos≈0.99 → multi-table collision bound ≈0.997
    planted = {(a, b) for a, b in truth if a // 4 == b // 4}
    found = {(int(a), int(b)) for a, b in got[["vec_a", "vec_b"]].to_numpy()}
    recall = len(planted & found) / len(planted)
    assert recall >= 0.9, recall


def test_ann_lsh_finds_planted_neighbors(planted_dir, ray_session):
    got = ann.ann_lsh(planted_dir).to_pandas()
    # for each query (vec_id<8), its 3 planted near-copies are the true
    # top neighbors; single-table+multiprobe bound ≈0.9 per copy
    hits = 0
    for q in range(ann.N_QUERIES):
        copies = {q // 4 * 4 + i for i in range(4)} - {q}
        found = set(got.loc[got["query_id"] == q, "vec_id"])
        hits += len(copies & found)
    assert hits / (ann.N_QUERIES * 3) >= 0.6


def test_neardup_lsh_subset_on_testdata(ray_session):
    sf = "/root/testdata/sf0.001"
    nd = ann.ann_neardup_lsh(sf).to_pandas()
    q11 = ann.q11_embedding_neardup(sf).to_pandas()
    p11 = set(map(tuple, q11[["vec_a", "vec_b", "cos_e6"]].to_numpy()))
    pnd = set(map(tuple, nd[["vec_a", "vec_b", "cos_e6"]].to_numpy()))
    assert pnd <= p11 and len(pnd) > 0


def test_ann_ivf_finds_planted_neighbors(planted_dir, ray_session):
    """IVF scale path: on the planted-cluster corpus each query's 3 noisy
    near-copies (cos≈0.99) land in the query's own or a probed cell."""
    got = ann.ann_ivf_topk(planted_dir).to_pandas()
    hits = 0
    for q in range(ann.N_QUERIES):
        copies = {q // 4 * 4 + i for i in range(4)} - {q}
        found = set(got.loc[got["query_id"] == q, "vec_id"])
        hits += len(copies & found)
    assert hits / (ann.N_QUERIES * 3) >= 0.8


def test_ann_ivf_rows_are_true_cosines(planted_dir, ray_session):
    """Every IVF output row carries the EXACT cosine (in-cell verify)."""
    got = ann.ann_ivf_topk(planted_dir).to_pandas()
    ids, m = _brute(planted_dir)
    pos = {int(v): i for i, v in enumerate(ids)}
    cos = ann._cos_e6(m, m)
    for q, v, c in got[["query_id", "vec_id", "cos_e6"]].to_numpy():
        assert cos[pos[int(q)], pos[int(v)]] == int(c)
    assert (got.groupby("query_id").size() <= ann.TOP_K).all()


def test_kmeans_deterministic_and_descending(ray_session):
    """kmeans: deterministic across runs, clusters in range, and the
    shared _lloyd_step strictly improves (or holds) mean assignment
    similarity from the hash seeds."""
    import ray.data

    from pboh_entity_linking_ray.pipelines.ann import (
        _hash_seeds,
        _lloyd_step,
        _matrix,
        _normalize,
        _read_embeddings,
        kmeans_embeddings,
    )

    sf = "/root/testdata/sf0.001"
    a = (kmeans_embeddings(sf).to_pandas()
         .sort_values("vec_id").reset_index(drop=True))
    b = (kmeans_embeddings(sf).to_pandas()
         .sort_values("vec_id").reset_index(drop=True))
    assert a.equals(b)
    assert a["cluster"].between(0, 7).all()
    assert a["cluster"].nunique() > 1

    emb = _read_embeddings(sf)
    _, mat = _matrix(emb.take_batch(10_000, batch_format="pyarrow"))
    mn = _normalize(mat)

    def mean_sim(c):
        return float(np.mean(np.max(mn @ c.T, axis=1)))

    seeds = _hash_seeds(emb, 8)
    c1 = _lloyd_step(emb, seeds)
    c2 = _lloyd_step(emb, c1)
    assert mean_sim(c1) >= mean_sim(seeds) - 1e-12
    assert mean_sim(c2) >= mean_sim(c1) - 1e-12


def test_pca_project_matches_numpy(ray_session):
    """pca_project must reproduce numpy's full PCA (population covariance,
    eigh, sign-canonicalized top-K) — the distributed moments pass and the
    one-shot numpy math may differ only by float summation order."""
    import pyarrow.parquet as pq

    from pboh_entity_linking_ray.pipelines.ann import PCA_K, pca_project

    sf = "/root/testdata/sf0.001"
    t = pq.read_table(f"{sf}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    ids = t["vec_id"].to_numpy()
    mat = np.asarray(t["embedding"].combine_chunks().flatten(),
                     dtype=np.float64).reshape(len(ids), -1)
    mean = mat.mean(axis=0)
    cov = (mat.T @ mat) / len(ids) - np.outer(mean, mean)
    _, evecs = np.linalg.eigh(cov)
    comps = evecs[:, ::-1][:, :PCA_K]
    flips = np.sign(comps[np.abs(comps).argmax(axis=0), np.arange(PCA_K)])
    comps = comps * np.where(flips == 0, 1.0, flips)[None, :]
    want = np.floor((mat - mean[None, :]) @ comps * 10_000 + 0.5)

    got = (pca_project(sf).to_pandas()
           .sort_values("vec_id").reset_index(drop=True))
    assert np.array_equal(got["vec_id"].to_numpy(), np.sort(ids))
    order = np.argsort(ids)
    for k in range(PCA_K):
        np.testing.assert_allclose(
            got[f"pc{k + 1}_e4"].to_numpy(), want[order, k], atol=1)
    # components really are variance-ordered
    var = got[[f"pc{k + 1}_e4" for k in range(PCA_K)]].var().to_numpy()
    assert (np.diff(var) <= 1e-9).all()


def test_label_centroid_outliers_semantics(ray_session):
    """q69: every row scored once, cosine within [-1, 1], and rows score
    at least as close to their OWN label's centroid on average as a
    random-label baseline would (prototype coherence)."""
    from pboh_entity_linking_ray.pipelines.ann import (
        q69_label_centroid_outliers,
    )

    out = (q69_label_centroid_outliers("/root/testdata/sf0.001")
           .to_pandas())
    assert out["vec_id"].is_unique and len(out) > 0
    assert out["cos_e6"].between(-1_000_000, 1_000_000).all()
    # labeled synthetic clusters → strong same-label coherence
    assert out.groupby("label")["cos_e6"].mean().min() > 0


def test_negative_sampling_contract(ray_session):
    """q70: ≤ NEG_K negatives per anchor, never the anchor's own label,
    ranks dense from 1, deterministic across runs."""
    import pyarrow.parquet as pq

    from pboh_entity_linking_ray.pipelines.ann import (
        NEG_K,
        q70_negative_sampling,
    )

    sf = "/root/testdata/sf0.001"
    out = (q70_negative_sampling(sf).to_pandas()
           .sort_values(["anchor_id", "rnk"]).reset_index(drop=True))
    assert len(out) > 0
    g = out.groupby("anchor_id")["rnk"]
    assert (g.max() <= NEG_K).all()
    assert (g.min() == 1).all()
    assert (g.apply(lambda s: (s.to_numpy()
                               == np.arange(1, len(s) + 1)).all())).all()
    lbl = pq.read_table(f"{sf}/embeddings.parquet",
                        columns=["vec_id", "label"]).to_pandas()
    m = (out.merge(lbl, left_on="anchor_id", right_on="vec_id")
            .merge(lbl, left_on="neg_id", right_on="vec_id",
                   suffixes=("_a", "_n")))
    assert (m["label_a"] != m["label_n"]).all()
    again = (q70_negative_sampling(sf).to_pandas()
             .sort_values(["anchor_id", "rnk"]).reset_index(drop=True))
    assert out.equals(again)


def test_semantic_dedup_matches_numpy_reference(ray_session):
    """semantic_dedup: the in-cluster keep rule (drop j iff some
    lower-id same-cluster vector has cos ≥ τ, dropped rows still
    compare) must match an exact numpy reference computed on the
    pipeline's own cluster assignment; deterministic across runs;
    row 0 of every cluster is always kept."""
    from pboh_entity_linking_ray.pipelines.ann import (
        NEARDUP_COS_E6,
        _matrix,
        _normalize,
        _read_embeddings,
        semantic_dedup,
    )

    sf = "/root/testdata/sf0.001"
    out = (semantic_dedup(sf).to_pandas()
           .sort_values("vec_id").reset_index(drop=True))
    assert len(out) == 500
    assert out["vec_id"].is_unique

    ids, mat = _matrix(_read_embeddings(sf)
                       .take_batch(10_000, batch_format="pyarrow"))
    mn = _normalize(mat)
    pos = {int(v): i for i, v in enumerate(ids)}
    for cl, grp in out.groupby("cluster"):
        g = grp.sort_values("vec_id").reset_index(drop=True)
        V = mn[[pos[int(v)] for v in g["vec_id"]]]
        sims = np.floor(V @ V.T * 1e6 + 0.5).astype(np.int64)
        want = np.ones(len(g), dtype=bool)
        for j in range(1, len(g)):
            want[j] = not (sims[j, :j] >= NEARDUP_COS_E6).any()
        assert (g["keep"].to_numpy() == want).all(), f"cluster {cl}"
        assert want[0]  # lowest id per cluster always kept

    # dedup actually fires on this corpus, and at least each cluster's
    # lowest-id representative survives (the planted corpus is dense:
    # at τ = NEARDUP_COS_E6 most rows have a lower-id near-neighbor)
    assert (~out["keep"]).sum() > 0
    assert out["keep"].sum() >= out["cluster"].nunique()

    again = (semantic_dedup(sf).to_pandas()
             .sort_values("vec_id").reset_index(drop=True))
    assert out.equals(again)


def test_pq_encode_deterministic_and_compresses(ray_session):
    import numpy as np

    from pboh_entity_linking_ray.pipelines.ann import (
        _matrix, _pq_codes, _pq_train, _read_embeddings, pq_encode)

    SF = "/root/testdata/sf0.001"
    a = pq_encode(SF).to_pandas().sort_values("vec_id").reset_index(drop=True)
    b = pq_encode(SF).to_pandas().sort_values("vec_id").reset_index(drop=True)
    assert a.equals(b)                       # deterministic codebook + codes
    assert (a["pq_code"] >= 0).all()         # 8×4 bits → fits 32 bits
    assert (a["pq_code"] < (1 << 32)).all()
    # reconstruction captures real structure: quantization MSE strictly
    # below the zero-codebook baseline (= mean squared norm)
    import pyarrow.parquet as pq

    ids, mat = _matrix(pq.read_table(f"{SF}/embeddings.parquet"))
    cents = _pq_train(_read_embeddings(SF))
    codes = _pq_codes(mat, cents)
    m, _, sub = cents.shape
    recon = np.zeros_like(mat)
    for mi in range(m):
        recon[:, mi * sub:(mi + 1) * sub] = cents[mi][(codes >> (4 * mi)) & 15]
    assert ((mat - recon) ** 2).sum(1).mean() < 0.8 * (mat ** 2).sum(1).mean()


def test_pq_adc_rerank_recall(ray_session):
    import numpy as np
    import pyarrow.parquet as pq

    from pboh_entity_linking_ray.pipelines.ann import (
        N_QUERIES, TOP_K, _matrix, _query_side, ann_pq_topk)

    SF = "/root/testdata/sf0.001"
    topk = ann_pq_topk(SF).to_pandas()
    ids, mat = _matrix(pq.read_table(f"{SF}/embeddings.parquet"))
    q_ids, q_mat = _query_side(SF, N_QUERIES)
    rec = []
    for qi, qv in zip(q_ids, q_mat):
        d = ((mat - qv) ** 2).sum(1)
        d[ids == qi] = np.inf
        exact = set(ids[np.argsort(d)[:TOP_K]])
        got = set(topk[topk.query_id == qi]["vec_id"])
        assert len(got) == TOP_K
        rec.append(len(exact & got) / TOP_K)
    # exact re-rank of the ADC pool recovers most of the true top-k
    # (bare 4-bit ADC sits ~0.25 on this corpus; the pool lifts it)
    assert np.mean(rec) >= 0.6


def test_ann_ivfpq_finds_planted_neighbors(planted_dir, ray_session):
    """IVF-PQ composition: coarse routing keeps each query's 3 noisy
    near-copies (cos≈0.99) in a probed cell, residual-PQ ADC keeps them
    inside the re-rank pool, and the exact re-rank surfaces them."""
    got = ann.ann_ivfpq_topk(planted_dir).to_pandas()
    hits = 0
    for q in range(ann.N_QUERIES):
        copies = {q // 4 * 4 + i for i in range(4)} - {q}
        found = set(got.loc[got["query_id"] == q, "vec_id"])
        assert len(found) == ann.TOP_K
        hits += len(copies & found)
    assert hits / (ann.N_QUERIES * 3) >= 0.8
    again = ann.ann_ivfpq_topk(planted_dir).to_pandas()
    assert got.sort_values(["query_id", "vec_id"]).reset_index(drop=True) \
        .equals(again.sort_values(["query_id", "vec_id"])
                .reset_index(drop=True))
