"""Curation operators: PII scrub on text that actually contains PII
(the synthetic sf tables contain none, so the oracle-parity run there
only proves the no-op path), decontamination set semantics, and the
repetition filter's fixed-point boundaries."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pboh_entity_linking_ray.oracle import compare
from pboh_entity_linking_ray.pipelines import curation

SF_DIR = "/root/testdata/sf0.001"

PII_DOCS = [
    "contact me at alice.smith+dev@example.co.uk or 555-867-5309 x12",
    "server at 192.168.0.1 and 10.0.0.255, call 800 555 1212 today",
    "no pii here, just plain text about tables and joins",
    "bob@corp.io wrote to carol_99@mail.example.com from 127.0.0.1",
    "",
    "almost an ip 1234.5.6.7 and almost a phone 12-345-6789",
]


@pytest.fixture(scope="module")
def pii_dir(tmp_path_factory):
    """A documents.parquet with real PII so the scrub paths are non-trivial;
    query fns take sf_dir, so a tmp dir with the same layout drops in."""
    d = tmp_path_factory.mktemp("piidocs")
    pq.write_table(
        pa.table({
            "doc_id": pa.array(range(len(PII_DOCS)), type=pa.int64()),
            "text": pa.array(PII_DOCS, type=pa.string()),
            "lang": pa.array(["en"] * len(PII_DOCS)),
            "source": pa.array(["t"] * len(PII_DOCS)),
            "n_chars": pa.array([len(s) for s in PII_DOCS], type=pa.int64()),
        }),
        d / "documents.parquet",
    )
    # oracle.duckdb_conn registers a view per sf table — link the rest
    import os

    from pboh_entity_linking_ray.oracle import TABLES
    for t in TABLES:
        if t != "documents":
            os.symlink(f"{SF_DIR}/{t}.parquet", d / f"{t}.parquet")
    return str(d)


def test_pii_scrub_matches_oracle_on_real_pii(ray_session, pii_dir):
    ok, msg = compare(curation.q51_pii_scrub(pii_dir),
                      curation.SQL_Q51, pii_dir)
    assert ok, msg


def test_pii_scrub_redacts_and_counts(ray_session, pii_dir):
    got = (curation.q51_pii_scrub(pii_dir).to_pandas()
           .set_index("doc_id").sort_index())
    assert got.loc[0, "n_email"] == 1
    assert got.loc[0, "n_phone"] == 1
    assert "<EMAIL>" in got.loc[0, "clean_text"]
    assert "<PHONE>" in got.loc[0, "clean_text"]
    assert got.loc[1, "n_ip"] == 2
    assert got.loc[1, "n_phone"] == 1
    assert got.loc[1, "clean_text"].count("<IP>") == 2
    # untouched rows come through verbatim
    assert got.loc[2, "clean_text"] == PII_DOCS[2]
    assert got.loc[2, ["n_email", "n_phone", "n_ip"]].sum() == 0
    assert got.loc[3, "n_email"] == 2
    assert got.loc[3, "n_ip"] == 1
    assert got.loc[4, "clean_text"] == ""
    # \b guards: 1234.5.6.7 is not an IPv4 hit, 12-345-6789 not a phone
    assert got.loc[5, "n_ip"] == 0
    assert got.loc[5, "n_phone"] == 0


def test_bpe_token_count_parity_on_punctuation_rich_text(ray_session,
                                                         pii_dir):
    """q57's BPE-ish regex must mean the same thing in rust-regex and
    RE2 on text with contractions, punctuation runs, digits and mixed
    case — the sf corpus is [a-z ]-only, so parity there is weak."""
    from pboh_entity_linking_ray.pipelines import textops
    ok, msg = compare(textops.q57_bpe_token_count(pii_dir),
                      textops.SQL_Q57, pii_dir)
    assert ok, msg
    got = textops.q57_bpe_token_count(pii_dir).to_pandas()
    nonempty = got[got["n_words"] > 0]
    assert (nonempty["n_bpe"] >= nonempty["n_words"]).all()  # fertility ≥ 1


def test_decontaminate_flags_only_overlapping_training_docs(ray_session):
    got = curation.q50_decontaminate(SF_DIR).to_pandas()
    # benchmark docs are never in the output; fractions are sane e4
    assert (got["doc_id"] % curation.DECON_BENCH_MOD != 0).all()
    assert (got["n_overlap"] >= 1).all()
    assert (got["n_overlap"] <= got["n_shingles"]).all()
    assert (got["contam_e4"]
            == 10000 * got["n_overlap"] // got["n_shingles"]).all()
    assert len(got) > 0  # 3-token shingles do collide in the corpus


def test_bloom_no_false_negatives_and_low_fp_rate():
    rng = np.random.default_rng(7)
    keys = rng.integers(0, 2**63, size=20_000, dtype=np.int64) \
              .astype(np.uint64)
    bits = curation._bloom_build(keys)
    assert curation._bloom_probe(bits, keys).all()   # membership is exact
    probe = rng.integers(0, 2**63, size=100_000, dtype=np.int64) \
               .astype(np.uint64)
    fresh = probe[~np.isin(probe, keys)]
    fp = curation._bloom_probe(bits, fresh).mean()
    assert fp < 0.005                                # ~5e-4 expected


def test_bloom_decontaminate_equals_exact_path(ray_session):
    exact = (curation.q50_decontaminate(SF_DIR).to_pandas()
             .sort_values("doc_id").reset_index(drop=True))
    bloom = (curation.q165_bloom_decontaminate(SF_DIR).to_pandas()
             .sort_values("doc_id").reset_index(drop=True))
    assert exact.equals(bloom)   # the Bloom layer is semantically invisible


def test_repetition_filter_verdicts(ray_session):
    got = curation.q52_repetition_filter(SF_DIR).to_pandas()
    assert len(got) == 500  # every doc gets a verdict — filter, not join
    expect = ((got["dup_e4"] <= curation.REP_DUP_MAX_E4)
              & (got["top_bigram_e4"] <= curation.REP_BIGRAM_MAX_E4))
    assert (got["keep"] == expect.astype(np.int64)).all()
    # word-salad corpus: high duplicate-token fractions, mixed verdicts
    assert got["dup_e4"].max() > 5000


def test_pack_sequences_invariants(ray_session):
    got = (curation.q53_pack_sequences(SF_DIR).to_pandas()
           .sort_values(["source", "doc_id"]).reset_index(drop=True))
    B = curation.PACK_BUDGET
    assert (got["seq_offset"] < B).all() and (got["seq_offset"] >= 0).all()
    for _, g in got.groupby("source"):
        cum = g["n_tokens"].cumsum() - g["n_tokens"]
        assert (g["seq_id"] == cum // B).all()       # contiguous token stream
        assert g["seq_id"].is_monotonic_increasing   # packing follows order


def test_curate_chain_composes_the_standalone_filters(ray_session):
    """q56 survivors == docs passing q50-threshold ∧ q52 keep ∧ q54 sample,
    and their packing matches q53 semantics on the surviving subset."""
    packed = (curation.q56_curate_and_pack(SF_DIR).to_pandas()
              .sort_values(["source", "doc_id"]).reset_index(drop=True))
    contam = curation.q50_decontaminate(SF_DIR).to_pandas()
    dropped_contam = set(
        contam.loc[contam["contam_e4"] >= curation.DECON_DROP_E4, "doc_id"])
    rep = curation.q52_repetition_filter(SF_DIR).to_pandas()
    sampled = set(curation.q54_weighted_sample(SF_DIR)
                  .to_pandas()["doc_id"])
    expect = set(rep.loc[rep["keep"] == 1, "doc_id"]) & sampled
    expect -= dropped_contam
    expect = {d for d in expect if d % curation.DECON_BENCH_MOD != 0}
    assert set(packed["doc_id"]) == expect
    B = curation.PACK_BUDGET
    for _, g in packed.groupby("source"):
        cum = g["n_tokens"].cumsum() - g["n_tokens"]
        assert (g["seq_id"] == cum // B).all()
        assert (g["seq_offset"] == cum % B).all()


def test_weighted_sample_deterministic_and_proportional(ray_session):
    a = curation.q54_weighted_sample(SF_DIR).to_pandas().sort_values("doc_id")
    b = curation.q54_weighted_sample(SF_DIR).to_pandas().sort_values("doc_id")
    assert a.equals(b.reset_index(drop=True).set_axis(a.index))
    # acceptance tracks the weight: docs at the p=1 cap ALL survive
    full = pq.read_table(f"{SF_DIR}/documents.parquet",
                         columns=["doc_id", "n_chars"]).to_pandas()
    capped = full.loc[full["n_chars"] * curation.SAMPLE_SCALE_E4 >= 10000,
                      "doc_id"]
    assert set(capped) <= set(a["doc_id"])
    assert 0 < len(a) <= len(full)


def test_band_minhash_near_dup_collides_far_does_not():
    """q67's banded MinHash: a near-duplicate (one extra shingle) shares
    most bands with its original, an unrelated doc shares none, and the
    signature is deterministic."""
    import pyarrow as pa

    from pboh_entity_linking_ray.pipelines.curation import _band_minhash

    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lambda mu nu xi omicron pi rho sigma tau upsilon ") * 3
    near = base + " one extra tail"
    far = ("completely different words about cooking pasta sauce "
           "tomatoes basil garlic onions")
    t = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                  "text": [base, near, far]})
    ids, packed = _band_minhash(t)
    assert list(ids) == [1, 2, 3]
    assert (packed[0] == packed[1]).sum() >= 4   # near-dup collides
    assert (packed[0] == packed[2]).sum() == 0   # unrelated does not
    ids2, packed2 = _band_minhash(t)
    assert np.array_equal(packed, packed2)


def test_lm_perplexity_rare_scores_higher(ray_session):
    """q66: a document made of the corpus's rarest tokens must score a
    higher mean NLL than one made of its most common tokens."""
    from pboh_entity_linking_ray.pipelines.curation import q66_lm_perplexity

    out = q66_lm_perplexity("/root/testdata/sf0.001").to_pandas()
    assert len(out) > 0 and (out["n_tokens"] > 0).all()
    assert (out["nll_e4"] > 0).all()
    # corpus-level sanity: scores vary (not a constant column)
    assert out["nll_e4"].nunique() > 10


def test_leakage_safe_split_invariants(ray_session):
    """q73: every doc assigned exactly once, each cluster lands wholly in
    ONE split (the leakage-safety contract), and all three splits are
    populated."""
    from pboh_entity_linking_ray.pipelines.textops import (
        q73_leakage_safe_split,
    )

    out = q73_leakage_safe_split("/root/testdata/sf0.001").to_pandas()
    assert out["doc_id"].is_unique and len(out) == 500
    assert (out.groupby("cluster_id")["split"].nunique() == 1).all()
    assert set(out["split"].unique()) == {"train", "val", "eval"}
    # non-trivial clusters exist and stay intact
    sizes = out.groupby("cluster_id").size()
    assert (sizes > 1).any()


def test_mixture_allocation_budget(ray_session):
    """q74: rates in (0, 1e6], oversize sources get capped below 1.0,
    and the sampled total never exceeds the global budget."""
    from pboh_entity_linking_ray.pipelines.curation import (
        MIX_DENOM,
        q74_mixture_allocation,
    )

    out = q74_mixture_allocation("/root/testdata/sf0.001").to_pandas()
    assert len(out) > 1
    assert out["rate_e6"].between(1, 1_000_000).all()
    total = out["n_tokens"].sum()
    budget = total // MIX_DENOM // len(out)
    assert (out["sampled_tokens"] <= budget).all()
    assert out["sampled_tokens"].sum() <= total // MIX_DENOM


def test_compression_ratio_recompute_and_verdicts(ray_session):
    import zlib

    got = (curation.q174_compression_ratio(SF_DIR).to_pandas()
           .set_index("doc_id").sort_index())
    docs = pq.read_table(f"{SF_DIR}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    assert len(got) == len(docs)
    sample = docs.sample(20, random_state=1)
    for _, row in sample.iterrows():
        b = row["text"].encode()
        cz = len(zlib.compress(b, curation.COMP_LEVEL))
        r = got.loc[row["doc_id"]]
        assert r["raw_bytes"] == len(b)
        assert r["zlib_bytes"] == cz
        assert r["ratio_e4"] == 10000 * len(b) // max(cz, 1)
    v = got["verdict"]
    assert ((got["ratio_e4"] >= 40000) == (v == "repetitive")).all()
    assert ((got["ratio_e4"] <= 10500) == (v == "noise")).all()
    # natural-prose corpus: the bulk must land in "keep"
    assert (v == "keep").mean() > 0.5


def test_fd_audit_exercises_both_report_paths(ray_session):
    from pboh_entity_linking_ray.pipelines.relational import q175_fd_audit

    out = (q175_fd_audit(SF_DIR).to_pandas()
           .set_index(["tbl", "det", "dep"]))
    # key-determined candidates hold; known-violated ones don't
    assert out.loc[("orders", "o_orderkey", "o_orderstatus"), "holds"] == 1
    assert out.loc[("customer", "c_custkey", "c_mktsegment"), "holds"] == 1
    assert out.loc[("events", "user_id", "event_type"), "holds"] == 0
    assert (out["n_violating"] <= out["n_keys"]).all()
    assert ((out["holds"] == 1) == (out["n_violating"] == 0)).all()


def test_ref_integrity_orphans_on_planted_break(ray_session, tmp_path):
    """On the consistent synthetic corpus every relationship is clean;
    planting orphan child keys must surface them through the anti-join."""
    import os

    from pboh_entity_linking_ray.pipelines.relational import (
        q176_ref_integrity)

    clean = q176_ref_integrity(SF_DIR).to_pandas()
    assert (clean["n_orphan_keys"] == 0).all()

    d = tmp_path / "broken"
    d.mkdir()
    for t in ("orders", "lineitem", "part", "customer", "events"):
        os.symlink(f"{SF_DIR}/{t}.parquet", d / f"{t}.parquet")
    # orders with 3 orphan custkeys on top of the clean table
    base = pq.read_table(f"{SF_DIR}/orders.parquet")
    extra = base.slice(0, 3).set_column(
        base.schema.get_field_index("o_custkey"), "o_custkey",
        pa.array([99_991, 99_992, 99_993], type=base["o_custkey"].type))
    os.unlink(d / "orders.parquet")
    pq.write_table(pa.concat_tables([base, extra]), d / "orders.parquet")
    broken = (q176_ref_integrity(str(d)).to_pandas()
              .set_index(["child_tbl", "child_key"]))
    assert broken.loc[("orders", "o_custkey"), "n_orphan_keys"] == 3
    assert broken.loc[("lineitem", "l_orderkey"), "n_orphan_keys"] == 0


def test_q190_dup_spans_hand_case(ray_session):
    """Hand-built corpus: two docs sharing one 7-token run → each doc
    gets ONE maximal span covering the run (3 overlapping 5-shingles
    coalesced), and a doc with no cross-doc shingle gets none."""
    import pandas as pd
    import pyarrow as pa
    import ray.data
    from unittest import mock

    from pboh_entity_linking_ray.pipelines import curation

    shared = "alpha bravo charlie delta echo foxtrot golf"
    docs = pa.table({
        "doc_id": pa.array([1, 2, 3], type=pa.int64()),
        "text": pa.array([
            f"one two {shared} three four",
            f"{shared} nine ten eleven twelve",
            "nothing in common with anyone here at all truly",
        ]),
    })
    with mock.patch.object(curation, "_docs",
                           lambda sf_dir, columns=("doc_id", "text"):
                           ray.data.from_arrow(docs)):
        out = curation.q190_dup_spans("unused").to_pandas() \
            .sort_values(["doc_id", "span_start"]).reset_index(drop=True)
    # doc 1: shared run occupies token positions 3..9 → hits at 3,4,5
    # (W=5) → one span [3, 9] with 3 hits; doc 2: positions 1..7 →
    # span [1, 7]; doc 3: nothing
    want = pd.DataFrame({
        "doc_id": [1, 2], "span_start": [3, 1], "span_end": [9, 7],
        "n_hits": [3, 3]})
    pd.testing.assert_frame_equal(out, want, check_dtype=False)
