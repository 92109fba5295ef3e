"""q19's vectorized window probe vs the per-pair DEFINITION loop
(`_sim_e4` over the ±NEIGHBORS window) — the SQL twin shares the window
formula, so only a from-definition oracle catches kernel bugs."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from pboh_entity_linking_ray.pipelines.fuzzy import (ACCEPT_SIM_E4,
                                                     NEIGHBORS, _sim_e4,
                                                     _best_window_matches)

TOK = st.text(alphabet="ab01", min_size=1, max_size=6)


def _loop_reference(v: np.ndarray, qs):
    out = []
    for q in qs:
        pos = int(np.searchsorted(v, q))
        lo, hi = max(0, pos - NEIGHBORS), min(len(v), pos + NEIGHBORS + 1)
        best_s, best_m = -1, None
        for cand in v[lo:hi]:
            s = _sim_e4(q, cand)
            if s > best_s or (s == best_s and best_m is not None
                              and cand < best_m):
                best_s, best_m = s, cand
        if best_m is not None and best_s >= ACCEPT_SIM_E4:
            out.append((q, best_m, best_s))
    return out


@settings(max_examples=150, deadline=None)
@given(st.sets(TOK, min_size=0, max_size=60), st.lists(TOK, max_size=12))
def test_vectorized_probe_matches_definition_loop(vocab, queries):
    v = np.sort(np.array(sorted(vocab), dtype=object))
    qs = np.array(queries, dtype=object)
    got = list(zip(*(a.tolist() for a in _best_window_matches(v, qs)))) \
        if len(qs) and len(v) else []
    want = _loop_reference(v, list(qs))
    assert sorted(got) == sorted(want)


def test_trigram_codes_align_on_non_ascii():
    """Owner boundaries are measured in UTF-8 BYTES: a multibyte string
    early in the batch must not shift later owners' code sets (the
    codes become byte-trigrams, a consistent space on both pair sides).
    """
    from pboh_entity_linking_ray.pipelines.fuzzy import _trigram_code_sets

    strs = np.array(["héllo", "café", "plain"], dtype=object)
    owner, codes, counts = _trigram_code_sets(strs)

    def byte_tris(s):
        b = ("^^" + s + "$$").encode("utf-8")
        return {b[i] * 65536 + b[i + 1] * 256 + b[i + 2]
                for i in range(len(b) - 2)}

    for i, s in enumerate(strs):
        got = set(codes[owner == i].tolist())
        assert got == byte_tris(s), s
        assert counts[i] == len(byte_tris(s))


def test_probe_on_realistic_typos():
    v = np.sort(np.array(
        ["conversation", "convergence", "converter", "convex",
         "linkage", "linker", "linking", "zebra"], dtype=object))
    qs = np.array(["converation", "linkng", "qqqqq"], dtype=object)
    got = dict(zip(*(a.tolist() for a in _best_window_matches(v, qs)[:2])))
    assert got["converation"] == "conversation"
    assert got["linkng"] == "linking"
    assert "qqqqq" not in got
