"""K5 splitter sink: Hive-partitioned output, total routing, stable under
re-run (content-hash routing)."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

from pboh_entity_linking_ray.pipelines.sampling import write_split


def test_write_split_partition_layout(tmp_path, ray_session):
    ds = ray.data.from_arrow(pa.table({"doc_id": list(range(400)),
                                       "payload": ["x"] * 400}))
    root = str(tmp_path / "out")
    write_split(ds, root, "doc_id")
    parts = sorted(p for p in os.listdir(root) if p.startswith("split="))
    assert parts and all(p.split("=")[1] in
                         {"val", "test", "learn", "index"} for p in parts)
    total = sum(pq.read_table(os.path.join(root, p)).num_rows for p in parts)
    assert total == 400
    # index (the rest bucket) dominates under the reference's proportions
    idx = pq.read_table(os.path.join(root, "split=index")).num_rows
    assert idx > 300
