"""Dataset-plugin surface (SURVEY §2.10 row 1).

The reference documents "produce ``Array[(docName, …)]``" as THE way to
add a dataset (reference: README.md:23; example plugin
eval/datasets/AQUAINT_MSNBC_ACE04.scala).  The engine equivalent: a
reader registry mapping a format name to ``fn(path) -> ray.data.Dataset``
emitting the canonical turns schema (``conv_id, turn_idx, role, text,
tool[, ts]`` — sources/text_lines.py:TURNS_SCHEMA); every downstream
stage is source-agnostic, so registering a reader IS adding a dataset.
"""

from __future__ import annotations
from pboh_entity_linking_ray.sources.reading import read_parquet_clean

import ray.data

from .columnar import read_turns_feather, read_turns_orc
from .writers import WRITERS, register_writer, write_turns
from .text_lines import (
    read_turns_csv,
    read_turns_jsonl,
    read_turns_jsonl_gz,
    read_turns_tsv,
)


def _read_parquet_turns(path: str) -> ray.data.Dataset:
    return read_parquet_clean(path)


READERS: dict[str, object] = {
    "parquet": _read_parquet_turns,
    "tsv": read_turns_tsv,
    "jsonl": read_turns_jsonl,
    "jsonl.gz": read_turns_jsonl_gz,
    "csv": read_turns_csv,
    "orc": read_turns_orc,
    "feather": read_turns_feather,
}


def register_reader(name: str, fn) -> None:
    """Register a custom dataset reader ``fn(path) -> Dataset`` emitting
    the canonical turns schema."""
    READERS[name] = fn


def read_turns(path: str, format: str = "parquet") -> ray.data.Dataset:
    """Open a turns dataset through the plugin registry."""
    return READERS[format](path)
