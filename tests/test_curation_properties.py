"""Property tests for the curation kernels (pure table-in/table-out —
no Ray session needed): packing offsets against a brute-force token
walk, and the decontamination overlap probe against Python set math."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from pboh_entity_linking_ray.pipelines.curation import (
    DECON_W,
    PACK_BUDGET,
    _overlap_counts,
    _pack_bucket,
)

DOCS = st.lists(
    st.tuples(st.integers(min_value=0, max_value=3),      # source idx
              st.integers(min_value=0, max_value=600)),   # n_tokens
    min_size=0, max_size=60)


@settings(max_examples=40, deadline=None)
@given(docs=DOCS)
def test_pack_bucket_matches_token_walk(docs):
    t = pa.table({
        "doc_id": pa.array(range(len(docs)), type=pa.int64()),
        "source": pa.array([f"s{s}" for s, _ in docs], type=pa.string()),
        "n_tokens": pa.array([n for _, n in docs], type=pa.int64()),
    })
    got = _pack_bucket(t).to_pandas().set_index("doc_id").sort_index()
    # brute force: walk each source's token stream in doc_id order
    offsets = {}
    for src in sorted({f"s{s}" for s, _ in docs}):
        pos = 0
        for i, (s, n) in enumerate(docs):
            if f"s{s}" != src:
                continue
            offsets[i] = (pos // PACK_BUDGET, pos % PACK_BUDGET)
            pos += n
    assert len(got) == len(docs)
    for i, (seq, off) in offsets.items():
        assert got.loc[i, "seq_id"] == seq
        assert got.loc[i, "seq_offset"] == off


TEXTS = st.lists(
    st.lists(st.sampled_from(list("abcde")), min_size=0, max_size=12)
      .map(lambda ws: " ".join(ws)),
    min_size=1, max_size=12)


@settings(max_examples=40, deadline=None)
@given(texts=TEXTS, bench_texts=TEXTS)
def test_overlap_counts_match_set_math(texts, bench_texts):
    from pboh_entity_linking_ray.functions.hashing import md5_lower64

    def shingles(s):
        toks = s.split()
        return {" ".join(toks[i:i + DECON_W])
                for i in range(len(toks) - DECON_W + 1)}

    bench_set = set().union(*(shingles(s) for s in bench_texts)) \
        if bench_texts else set()
    bench = np.array(sorted(md5_lower64(x) for x in bench_set),
                     dtype=np.uint64)
    t = pa.table({"doc_id": pa.array(range(len(texts)), type=pa.int64()),
                  "text": pa.array(texts, type=pa.string())})
    n_sh, n_ov = _overlap_counts(t, bench)
    for i, s in enumerate(texts):
        sh = shingles(s)
        assert n_sh[i] == len(sh)
        assert n_ov[i] == len(sh & bench_set)
