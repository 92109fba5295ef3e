"""Columnar wire-format turn sources beyond Parquet: ORC and Arrow IPC
(Feather v2) — the two other container formats a lakehouse hands a
pipeline.  Ray Data has no native reader for either, so both follow the
jsonl.gz device (sources/text_lines.py): ``read_binary_files`` ships
each file's bytes into a read TASK and decoding runs there — as
distributed as the read, nothing decodes on the driver.

The sharding unit is the FILE (ORC stripes and IPC record batches are
internally splittable, but cross-file parallelism is what the
partitioned-output discipline already guarantees; one-giant-file inputs
should be re-sharded at the producer, same contract as gzip).  Output
casts to the canonical turns schema so every downstream stage is
source-agnostic (the reference's dataset-plugin contract, README.md:23).
"""

from __future__ import annotations

import io

import pyarrow as pa
import ray.data

from .text_lines import TURNS_SCHEMA


def _cast_turns(tbl: pa.Table) -> pa.Table:
    """Canonical column types for the TURNS_SCHEMA fields; extra columns
    the container carries (``ts`` — optional in the canonical schema,
    present in parquet corpora) pass through unchanged."""
    canon = {f.name: f.type for f in TURNS_SCHEMA}
    return pa.table({
        name: (tbl[name].cast(canon[name]) if name in canon else tbl[name])
        for name in tbl.column_names
    })


def _decode_batch(t: pa.Table, opener) -> pa.Table:
    parts = [_cast_turns(opener(io.BytesIO(b.as_py())))
             for b in t["bytes"]]
    return pa.concat_tables(parts) if parts else TURNS_SCHEMA.empty_table()


def read_turns_orc(path: str) -> ray.data.Dataset:
    """ORC turns file(s) → turns Dataset; stripe decode inside the read
    tasks via ``pyarrow.orc``."""
    def decode(t: pa.Table) -> pa.Table:
        from pyarrow import orc

        return _decode_batch(t, lambda buf: orc.ORCFile(buf).read())

    return (ray.data.read_binary_files(path, file_extensions=["orc"])
            .map_batches(decode, batch_format="pyarrow", batch_size=1))


def read_turns_feather(path: str) -> ray.data.Dataset:
    """Arrow IPC / Feather v2 turns file(s) → turns Dataset; zero-parse
    decode (IPC is Arrow's own wire format) inside the read tasks."""
    def decode(t: pa.Table) -> pa.Table:
        from pyarrow import feather

        return _decode_batch(t, feather.read_table)

    return (ray.data.read_binary_files(
                path, file_extensions=["feather", "arrow", "ipc"])
            .map_batches(decode, batch_format="pyarrow", batch_size=1))
