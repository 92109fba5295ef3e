"""`python -m pboh_entity_linking_ray` job-entry surface (north_rule:
run end-to-end via `ray job submit`)."""

import json
import os

import pyarrow.parquet as pq

from pboh_entity_linking_ray.__main__ import main
from pboh_entity_linking_ray.sources.synthetic import generate_corpus


def test_job_main_end_to_end(ray_session, tmp_path, capsys):
    c = generate_corpus(60, 42)
    turns_p = str(tmp_path / "turns.parquet")
    labels_p = str(tmp_path / "labels.parquet")
    out_dir = str(tmp_path / "out")
    pq.write_table(c.turns, turns_p)
    pq.write_table(c.labels, labels_p)

    rc = main(["--input", turns_p, "--output", out_dir,
               "--labels", labels_p,
               "--checkpoint-root", str(tmp_path / "ckpt")])
    assert rc == 0
    metrics = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert metrics["n_convs"] == 60
    assert metrics["n_clusters"] == 60
    assert metrics["eval"]["f1"] >= 0.99
    # clusters parquet written and readable
    files = [f for f in os.listdir(out_dir) if f.endswith(".parquet")]
    assert files
    tbl = pq.read_table(out_dir)
    assert set(tbl.column_names) >= {"conv_id", "cluster_id"}
    assert tbl.num_rows == 60
    # resume: second invocation reuses every stage checkpoint
    rc2 = main(["--input", turns_p, "--output", str(tmp_path / "out2"),
                "--checkpoint-root", str(tmp_path / "ckpt")])
    assert rc2 == 0
    m2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert m2["n_clusters"] == metrics["n_clusters"]


def test_query_cli_modes(ray_session, tmp_path, capsys):
    rc = main(["--list-queries"])
    assert rc == 0
    listing = capsys.readouterr().out.strip().splitlines()
    assert any(ln.startswith("q05_word_count\toracle") for ln in listing)
    assert len(listing) > 150

    # run one registered query over the testdata dir, to parquet and to stdout
    out_dir = str(tmp_path / "q05")
    rc = main(["--query", "q05_word_count",
               "--input", "/root/testdata/sf0.001", "--output", out_dir])
    assert rc == 0
    metrics = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert metrics["rows"] > 0
    assert pq.read_table(out_dir).num_rows == metrics["rows"]

    rc = main(["--query", "q05_word_count", "--input", "/root/testdata/sf0.001"])
    assert rc == 0
    head = capsys.readouterr().out.strip().splitlines()
    assert 0 < len(head) <= 50
    json.loads(head[0])  # JSONL rows


def test_json_default_unwraps_numpy_scalars():
    """--link-one prints JSON; numpy scalars must become numbers and
    booleans, never the strings "8123"/"True"."""
    import json

    import numpy as np

    from pboh_entity_linking_ray.__main__ import _json_default

    s = json.dumps({"n": np.int64(8123), "ok": np.bool_(True),
                    "x": np.float64(0.5)}, default=_json_default)
    assert json.loads(s) == {"n": 8123, "ok": True, "x": 0.5}


def test_scorer_cli_flag(ray_session, tmp_path, capsys):
    """--scorer selects the inference mode — the reference CLI's
    max-product|sum-product argument (el/EL_LBP_Spark.scala:102-127)."""
    c = generate_corpus(60, 42)
    turns_p = str(tmp_path / "turns.parquet")
    labels_p = str(tmp_path / "labels.parquet")
    pq.write_table(c.turns, turns_p)
    pq.write_table(c.labels, labels_p)

    rc = main(["--input", turns_p, "--output", str(tmp_path / "out_lbp"),
               "--labels", labels_p, "--scorer", "lbp"])
    assert rc == 0
    m = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert m["eval"]["f1"] >= 0.99

    rc2 = main(["--input", turns_p, "--output", str(tmp_path / "oops"),
                "--scorer", "nonsense"])
    assert rc2 == 2
    err = json.loads(capsys.readouterr().err.strip().splitlines()[-1])
    assert err["available"] == ["full", "lbp", "stringsim"]
