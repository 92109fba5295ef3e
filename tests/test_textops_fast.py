"""The fast (xxhash) text fingerprint variants share their algorithmic
cores with the md5 oracle twins; these tests pin that tie at the core
level (same hashes in → same output) plus determinism of the fast path."""

import numpy as np
import pyarrow as pa

from pboh_entity_linking_ray.pipelines.textops import (
    WINNOW_MOD,
    _doc_shingles,
    _simhash_bits,
)


def test_simhash_core_majority():
    # two rows: row 0 has hashes with bit0 set twice, clear once → '1'
    rid = np.array([0, 0, 0, 1], dtype=np.int64)
    hs = np.array([0b1, 0b1, 0b0, 0b10], dtype=np.uint64)
    bits = _simhash_bits(rid, hs, 3)
    assert bits[0][-1] == "1"            # bit 0 majority set
    assert bits[0][:-1] == "0" * 63
    assert bits[1][-2] == "1" and bits[1][-1] == "0"
    assert bits[2] == "0" * 64           # empty row → zero signature


def test_simhash_core_tie_is_zero():
    # equal +1/-1 votes → sum 0 → NOT > 0 → bit stays 0
    rid = np.array([0, 0], dtype=np.int64)
    hs = np.array([0b1, 0b0], dtype=np.uint64)
    assert _simhash_bits(rid, hs, 1)[0] == "0" * 64


def test_simhash_u64_matches_bits():
    from pboh_entity_linking_ray.pipelines.textops import _simhash_u64

    rng = np.random.default_rng(7)
    rid = np.repeat(np.arange(20, dtype=np.int64), rng.integers(0, 6, 20))
    hs = rng.integers(0, 2**63, len(rid)).astype(np.uint64) * np.uint64(2) \
        + (rng.integers(0, 2, len(rid))).astype(np.uint64)
    bits = _simhash_bits(rid, hs, 20)
    vals = _simhash_u64(rid, hs, 20)
    assert [int(b, 2) for b in bits] == [int(v) for v in vals]


def test_popcount_u64_matches_python():
    from pboh_entity_linking_ray.functions.hashing import popcount_u64

    rng = np.random.default_rng(11)
    xs = rng.integers(0, 2**63, 1000).astype(np.uint64) * np.uint64(2) \
        + (rng.integers(0, 2, 1000)).astype(np.uint64)
    xs[:3] = [0, 1, 0xFFFFFFFFFFFFFFFF]
    got = popcount_u64(xs)
    assert got.dtype == np.int64
    assert got.tolist() == [bin(int(x)).count("1") for x in xs]


def test_doc_shingles_matches_naive():
    t = pa.table({
        "doc_id": [1, 2, 3],
        "text": ["a b c d", "a b", ""],
    })
    df = _doc_shingles(t, 3)
    got = {(int(r), s) for r, s in zip(df["rid"], df["sh"])}
    assert got == {(0, "a b c"), (0, "b c d")}   # row 1: <3 tokens, row 2: none


def test_fast_variants_deterministic(ray_session):
    from pboh_entity_linking_ray.pipelines.textops import simhash_fast, winnow_fast

    sf = "/root/testdata/sf0.001"
    a = simhash_fast(sf).to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = simhash_fast(sf).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)
    w = winnow_fast(sf).to_pandas()
    assert (w.groupby("doc_id").size() > 0).all()
    # mod-p selection: every emitted fingerprint honors the sampler
    assert all(int(x, 16) % WINNOW_MOD == 0 for x in w["fp_hex"])


def test_shared_span_pairs_symmetric_and_capped(ray_session):
    """q71: pair keys canonical (doc_a < doc_b), counts positive, and a
    doc never pairs with itself; identical docs share the maximum span
    count among their pairs."""
    from pboh_entity_linking_ray.pipelines.textops import (
        q71_shared_span_pairs,
    )

    out = q71_shared_span_pairs("/root/testdata/sf0.001").to_pandas()
    assert len(out) > 0
    assert (out["doc_a"] < out["doc_b"]).all()
    assert (out["n_shared_spans"] >= 1).all()
    assert not out.duplicated(subset=["doc_a", "doc_b"]).any()


def test_bpe_train_matches_independent_recount(ray_session):
    """bpe_train's merge table must equal an independently-implemented
    Sennrich loop (space-joined string representation, regex-free
    replace) over word counts recounted straight from the parquet."""
    import re
    from collections import Counter

    import duckdb

    from pboh_entity_linking_ray.pipelines.textops import (
        BPE_MERGES,
        bpe_train,
    )

    sf = "/root/testdata/sf0.001"
    texts = duckdb.sql(
        f"SELECT text FROM '{sf}/documents.parquet'").df()["text"]
    wc = Counter(w for txt in texts
                 for w in re.findall("[a-z0-9]+", txt.lower()))

    vocab = Counter({" ".join(w): c for w, c in wc.items()})
    want = []
    for rank in range(1, BPE_MERGES + 1):
        pairs = Counter()
        for w, c in vocab.items():
            syms = w.split(" ")
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        if not pairs:
            break
        (l, r), freq = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        want.append((rank, l, r, freq))
        # split-based merge (string replace is positional-unsafe)
        merged = Counter()
        for w, c in vocab.items():
            syms = w.split(" ")
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            merged[" ".join(out)] += c
        vocab = merged

    got = [tuple(r.values())
           for r in bpe_train(sf).to_pandas().to_dict("records")]
    assert got == want
    assert len(got) == BPE_MERGES


def test_bpe_encode_matches_independent_reencode(ray_session):
    """bpe_encode's per-document counts must equal an independent
    Python re-encode (regex pretokenize + rank-order merge replay)
    of every document, and merging must never increase token count."""
    import re

    import duckdb

    from pboh_entity_linking_ray.pipelines.textops import (
        bpe_encode,
        bpe_train,
    )

    sf = "/root/testdata/sf0.001"
    mt = bpe_train(sf).to_pandas()
    merges = list(zip(mt["left"], mt["right"]))

    def encode_len(word: str) -> int:
        syms = list(word)
        for l, r in merges:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return len(syms)

    docs = duckdb.sql(
        f"SELECT doc_id, text FROM '{sf}/documents.parquet'").df()
    want = {}
    for doc_id, txt in zip(docs["doc_id"], docs["text"]):
        ws = re.findall("[a-z0-9]+", txt.lower())
        if ws:
            want[int(doc_id)] = (len(ws), sum(encode_len(w) for w in ws))

    got = bpe_encode(sf).to_pandas()
    assert got["doc_id"].is_unique
    assert len(got) == len(want)
    for doc_id, n_words, n_bpe in got[
            ["doc_id", "n_words", "n_tokens_bpe"]].to_numpy():
        assert want[int(doc_id)] == (int(n_words), int(n_bpe)), doc_id
    # merges only ever shrink: n_words <= n_tokens_bpe <= total chars
    assert (got["n_tokens_bpe"] >= got["n_words"]).all()


def test_ppjoin_bitset_equals_sortmerge(ray_session):
    """q124's two verification kernels (vocab bitset vs ragged
    sort-merge) must produce identical pairs; the bitset path is what
    the tiny-vocab corpus exercises, the sort-merge path is the
    large-vocabulary fallback."""
    from pboh_entity_linking_ray.pipelines.textops import q124_ppjoin

    sf = "/root/testdata/sf0.001"
    fast = q124_ppjoin(sf).to_pandas() \
        .sort_values(["a", "b"]).reset_index(drop=True)
    slow = q124_ppjoin(sf, bitset_vocab_max=0).to_pandas() \
        .sort_values(["a", "b"]).reset_index(drop=True)
    assert len(fast) > 0
    assert fast.equals(slow)
