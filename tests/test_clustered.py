"""Zone-map clustered layout: balanced files, correct manifest bounds,
and a range read that actually prunes."""

import os
import shutil

import duckdb
import numpy as np
import pyarrow.parquet as pq
import ray.data

from pboh_entity_linking_ray.state.clustered import (
    clustered_write,
    pruned_files,
    pruned_read,
)

SF = "/root/testdata/sf0.001"


def test_clustered_write_and_pruned_read(ray_session, tmp_path):
    out = str(tmp_path / "li_clustered")
    ds = ray.data.read_parquet(f"{SF}/lineitem.parquet",
                               columns=["l_partkey", "l_quantity"])
    man = clustered_write(ds, "l_partkey", out, n_files=8)

    # manifest bounds are real and files tile the key space disjointly
    total_rows = 0
    prev_max = -1
    for e in sorted(man["files"], key=lambda e: e["min"]):
        t = pq.read_table(os.path.join(out, e["file"]))
        v = np.asarray(t["l_partkey"])
        assert v.min() == e["min"] and v.max() == e["max"]
        assert (np.diff(v) >= 0).all()          # sorted within file
        assert e["min"] > prev_max               # disjoint ranges
        prev_max = e["max"]
        total_rows += e["rows"]
    n_total = duckdb.sql(
        f"SELECT count(*) FROM '{SF}/lineitem.parquet'").fetchone()[0]
    assert total_rows == n_total
    assert len(man["files"]) > 1

    # the range read prunes files AND returns exactly the right rows
    lo, hi = 40, 60
    files, n_files = pruned_files(out, lo, hi)
    assert 0 < len(files) < n_files
    got = pruned_read(out, lo, hi).count()
    want = duckdb.sql(
        f"SELECT count(*) FROM '{SF}/lineitem.parquet' "
        f"WHERE l_partkey BETWEEN {lo} AND {hi}").fetchone()[0]
    assert got == want

    # idempotent: a second write call short-circuits on the manifest
    man2 = clustered_write(ds, "l_partkey", out, n_files=8)
    assert man2 == man

    # crash-safety shape: no manifest → treated as absent (rewrites)
    os.remove(os.path.join(out, "manifest.json"))
    man3 = clustered_write(ds, "l_partkey", out, n_files=8)
    assert sorted(e["min"] for e in man3["files"]) == \
        sorted(e["min"] for e in man["files"])
    shutil.rmtree(out, ignore_errors=True)


def test_coclustered_join_matches_shuffle_join(ray_session, tmp_path):
    """The exchange-free aligned-file join returns exactly the rows a
    plain join does, and refuses layouts with different cut points."""
    import pandas as pd
    import pytest

    from pboh_entity_linking_ray.state.clustered import coclustered_join

    li_dir, pt_dir = str(tmp_path / "li_cc"), str(tmp_path / "pt_cc")
    li = ray.data.read_parquet(f"{SF}/lineitem.parquet",
                               columns=["l_partkey", "l_quantity"])
    pt = ray.data.read_parquet(f"{SF}/part.parquet",
                               columns=["p_partkey", "p_type"])
    man = clustered_write(li, "l_partkey", li_dir, n_files=8)
    assert man["cuts"]                      # cuts are recorded
    clustered_write(pt, "p_partkey", pt_dir, cuts=man["cuts"])

    got = (coclustered_join(li_dir, pt_dir).to_pandas()
           .sort_values(["l_partkey", "l_quantity", "p_type"])
           .reset_index(drop=True))
    want = (duckdb.sql(
        f"SELECT l_partkey, l_quantity, p_type "
        f"FROM '{SF}/lineitem.parquet' JOIN '{SF}/part.parquet' "
        f"ON l_partkey = p_partkey").fetchdf()
        .sort_values(["l_partkey", "l_quantity", "p_type"])
        .reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got[["l_partkey", "l_quantity", "p_type"]].astype(
            {"l_partkey": "int64"}),
        want.astype({"l_partkey": "int64"}))

    # misaligned layouts are rejected, never silently wrong
    other = str(tmp_path / "pt_own_cuts")
    clustered_write(pt, "p_partkey", other, n_files=3)
    with pytest.raises(ValueError, match="co-clustered"):
        coclustered_join(li_dir, other)


def test_clustered_merge_partial_compaction(ray_session, tmp_path):
    """clustered_merge rewrites ONLY the delta-overlapping ranges (new
    generation), leaves other files byte-identical, and the merged
    layout holds exactly base + delta."""
    out = str(tmp_path / "li_merge")
    li = ray.data.read_parquet(f"{SF}/lineitem.parquet",
                               columns=["l_partkey", "l_quantity"])
    base = li.filter(lambda r: r["l_partkey"] > 25)
    delta = li.filter(lambda r: r["l_partkey"] <= 25)
    man1 = clustered_write(base, "l_partkey", out, n_files=8)
    sizes1 = {e["file"]: os.path.getsize(os.path.join(out, e["file"]))
              for e in man1["files"]}

    from pboh_entity_linking_ray.state.clustered import clustered_merge

    man2 = clustered_merge(out, delta)
    assert man2["gen"] == 2
    touched = [e for e in man2["files"] if "-g2" in e["file"]]
    kept = [e for e in man2["files"] if "-g2" not in e["file"]]
    assert touched and kept                # partial, not full, rewrite
    for e in kept:                         # untouched files byte-stable
        assert os.path.getsize(os.path.join(out, e["file"])) \
            == sizes1[e["file"]]
    # delta keys are all <= 25 → only low ranges may be touched
    assert all(e["min"] <= 25 for e in touched)
    # merged rows == base + delta == the whole table
    total = sum(e["rows"] for e in man2["files"])
    n_total = duckdb.sql(
        f"SELECT count(*) FROM '{SF}/lineitem.parquet'").fetchone()[0]
    assert total == n_total
    # superseded generation-1 files are gone; manifest files all exist
    for e in man2["files"]:
        assert os.path.exists(os.path.join(out, e["file"]))


def test_coclustered_join_range_prune(ray_session, tmp_path):
    """lo/hi prunes aligned file pairs on both sides; with an exact
    residual in post, results equal the range-filtered plain join."""
    import pandas as pd

    from pboh_entity_linking_ray.state.clustered import coclustered_join

    li_dir, pt_dir = str(tmp_path / "li"), str(tmp_path / "pt")
    li = ray.data.read_parquet(f"{SF}/lineitem.parquet",
                               columns=["l_partkey", "l_quantity"])
    pt = ray.data.read_parquet(f"{SF}/part.parquet",
                               columns=["p_partkey", "p_type"])
    man = clustered_write(li, "l_partkey", li_dir, n_files=8)
    clustered_write(pt, "p_partkey", pt_dir, cuts=man["cuts"])

    lo, hi = 40, 60

    def residual(t):
        import numpy as np
        import pyarrow as pa
        v = np.asarray(t["l_partkey"])
        return t.filter(pa.array((v >= lo) & (v <= hi)))

    got = (coclustered_join(li_dir, pt_dir, post=residual, lo=lo, hi=hi)
           .to_pandas().sort_values(["l_partkey", "l_quantity", "p_type"])
           .reset_index(drop=True))
    want = (duckdb.sql(
        f"SELECT l_partkey, l_quantity, p_type "
        f"FROM '{SF}/lineitem.parquet' JOIN '{SF}/part.parquet' "
        f"ON l_partkey = p_partkey "
        f"WHERE l_partkey BETWEEN {lo} AND {hi}").fetchdf()
        .sort_values(["l_partkey", "l_quantity", "p_type"])
        .reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got.astype({"l_partkey": "int64"}),
        want.astype({"l_partkey": "int64"}))


def test_time_travel_and_vacuum(ray_session, tmp_path):
    """Generation manifests are immutable snapshots: gen-1 reads the
    pre-merge table byte-for-byte after a merge lands gen 2; vacuum
    drops expired generations and every file only they referenced."""
    from pboh_entity_linking_ray.state.clustered import (
        clustered_merge,
        generations,
        read_generation,
        vacuum,
    )

    out = str(tmp_path / "li_tt")
    li = ray.data.read_parquet(f"{SF}/lineitem.parquet",
                               columns=["l_partkey", "l_quantity"])
    base = li.filter(lambda r: r["l_partkey"] > 25)
    delta = li.filter(lambda r: r["l_partkey"] <= 25)
    n_base = base.count()
    n_total = duckdb.sql(
        f"SELECT count(*) FROM '{SF}/lineitem.parquet'").fetchone()[0]

    clustered_write(base, "l_partkey", out, n_files=8)
    clustered_merge(out, delta)
    assert generations(out) == [1, 2]

    # snapshot reads: gen 1 == base, gen 2 (and current) == base + delta
    assert read_generation(out, 1).count() == n_base
    assert read_generation(out, 2).count() == n_total
    assert read_generation(out).count() == n_total
    g1_sum = int(np.sum([b["l_quantity"].to_numpy().sum()
                         for b in read_generation(out, 1)
                         .iter_batches(batch_format="pyarrow")]))
    base_sum = int(duckdb.sql(
        f"SELECT CAST(SUM(l_quantity) AS BIGINT) "
        f"FROM '{SF}/lineitem.parquet' WHERE l_partkey > 25").fetchone()[0])
    assert g1_sum == base_sum

    # vacuum: gen 1 expires, its superseded files are unlinked, and the
    # retained snapshot still reads in full
    removed = vacuum(out, keep_last=1)
    assert generations(out) == [2]
    assert removed                      # at least one g1 file reclaimed
    for name in removed:
        assert not os.path.exists(os.path.join(out, name))
    assert read_generation(out, 2).count() == n_total
