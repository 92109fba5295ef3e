"""Writer plugins — the export half of the dataset-plugin surface
(sources/__init__.py READERS is the ingest half): a registry mapping a
format name to ``fn(Dataset, path)`` so a pipeline's output can leave
the engine in whatever container the consumer reads, each sink as
distributed as the dataset's blocks (one file per block — the
partitioned, resumable output discipline; never one giant file).

Round-trip contract (pinned in tests/test_sources.py): for every format
with both a reader and a writer, ``read_turns(write(ds))`` reproduces
the rows exactly.
"""

from __future__ import annotations

import ray.data


def write_turns_parquet(ds: ray.data.Dataset, path: str) -> None:
    ds.write_parquet(path)


def write_turns_jsonl(ds: ray.data.Dataset, path: str) -> None:
    """One JSON object per line, one file per block (ray.data's native
    JSON sink is JSONL)."""
    ds.write_json(path)


def write_turns_jsonl_gz(ds: ray.data.Dataset, path: str) -> None:
    """Gzip JSONL sink — the symmetric partner of READERS["jsonl.gz"]:
    compression runs inside the write tasks (``arrow_open_stream_args``),
    one ``.json.gz`` file per block (gzip is unsplittable, so the
    shard-by-file discipline matters doubly here)."""
    ds.write_json(path, arrow_open_stream_args={"compression": "gzip"},
                  filename_provider=_GzSuffix())


class _GzSuffix:
    """FilenameProvider appending .gz so the reader's extension filter
    finds the files."""

    def get_filename_for_block(self, block, write_uuid, task_index,
                               block_index) -> str:
        return (f"{write_uuid}_{task_index:06d}_{block_index:06d}"
                ".json.gz")

    def get_filename_for_row(self, row, write_uuid, task_index,
                             block_index, row_index) -> str:
        return (f"{write_uuid}_{task_index:06d}_{block_index:06d}"
                f"_{row_index:06d}.json.gz")


def write_turns_csv(ds: ray.data.Dataset, path: str) -> None:
    ds.write_csv(path)


def write_turns_tsv(ds: ray.data.Dataset, path: str) -> None:
    """Tab-separated with the S5 column layout
    (conv_id\\tturn_idx\\trole\\ttool\\ttext) the TSV reader parses —
    headerless, tab-delimited pyarrow CSV sink; values must not contain
    tabs/newlines/quotes (the synthetic corpus never does; a general
    exporter would escape them)."""
    import pyarrow as pa
    from pyarrow import csv as pacsv

    def proj(t: pa.Table) -> pa.Table:
        return t.select(["conv_id", "turn_idx", "role", "tool", "text"])

    # WriteOptions is not picklable — build it IN the write task
    def _opts():
        return {"write_options": pacsv.WriteOptions(include_header=False,
                                                    delimiter="\t",
                                                    quoting_style="none")}

    ds.map_batches(proj, batch_format="pyarrow").write_csv(
        path, arrow_csv_args_fn=_opts)


WRITERS: dict[str, object] = {
    "parquet": write_turns_parquet,
    "jsonl": write_turns_jsonl,
    "jsonl.gz": write_turns_jsonl_gz,
    "csv": write_turns_csv,
    "tsv": write_turns_tsv,
}


def register_writer(name: str, fn) -> None:
    """Register a custom sink ``fn(Dataset, path)``."""
    WRITERS[name] = fn


def write_turns(ds: ray.data.Dataset, path: str,
                format: str = "parquet") -> None:
    """Write a turns dataset through the plugin registry."""
    WRITERS[format](ds, path)
