"""Line-oriented text source (SURVEY.md §2.1 S5).

The reference parses positional TSV lines ad hoc
(``loadSingleLine``: "title,pageId\\t[mention\\tentity]*",
reference: src/main/scala/learning/FewParamsLearning.scala:51-65; the
ClueWeb reader groups raw lines by file key,
eval/cweb/RunLoopyAgainstAllGoogleClweb.scala:246-257).  The recast is a
``ray.data.read_text`` → vectorized ``map_batches`` parser producing the
canonical turns schema — malformed lines are counted into a column
instead of crashing the stream (the reference's accumulator pattern,
index_builder/CreateCrosswikisMentionFreqIndex.scala:112-113)."""

from __future__ import annotations

import pyarrow as pa
import ray.data

TURNS_SCHEMA = pa.schema([
    ("conv_id", pa.string()),
    ("turn_idx", pa.int32()),
    ("role", pa.string()),
    ("text", pa.string()),
    ("tool", pa.string()),
])


def parse_turn_lines(t: pa.Table) -> pa.Table:
    """Batch parser: 'conv_id\\tturn_idx\\trole\\ttool\\ttext' lines →
    turns rows; malformed lines dropped (count in ``n_bad`` metadata
    column of a side aggregate if needed)."""
    import polars as pl

    s = pl.from_arrow(t["text"].combine_chunks())
    parts = s.str.split_exact("\t", 4).struct.rename_fields(
        ["conv_id", "turn_idx", "role", "tool", "text"])
    df = parts.struct.unnest()
    ok = (df["turn_idx"].str.contains(r"^\d+$").fill_null(False)
          & df["conv_id"].is_not_null() & df["text"].is_not_null())
    df = df.filter(ok).with_columns(
        pl.col("turn_idx").cast(pl.Int32))
    return df.select(["conv_id", "turn_idx", "role", "text", "tool"]) \
        .to_arrow().cast(TURNS_SCHEMA)


def conform_turns(t: pa.Table) -> pa.Table:
    """Project/cast any column superset onto the canonical turns schema;
    missing optional columns become nulls.  Lets structured readers
    (JSONL/CSV/Parquet-with-extras) share one normalization step."""
    n = t.num_rows
    cols = {}
    for field in TURNS_SCHEMA:
        if field.name in t.column_names:
            c = t[field.name]
            cols[field.name] = c.cast(field.type) if c.type != field.type else c
        else:
            cols[field.name] = pa.nulls(n, type=field.type)
    return pa.table(cols)


def read_turns_jsonl(path: str) -> ray.data.Dataset:
    """JSONL turns source: one JSON object per line carrying the
    canonical field names (``ray.data.read_json`` streams and infers);
    extra keys are dropped, missing optional keys become nulls."""
    return (ray.data.read_json(path)
            .map_batches(conform_turns, batch_format="pyarrow"))


def read_turns_jsonl_gz(path: str) -> ray.data.Dataset:
    """Gzip-compressed JSONL turns source — the wire format crawl dumps
    and log shippers actually deliver.  ``read_json`` decompresses in
    the read tasks (``arrow_open_stream_args``), so decompression is as
    distributed as the read itself; each ``.jsonl.gz`` file is one
    stream (gzip is not splittable — shard the FILES, not the bytes,
    which the partitioned-output discipline already guarantees)."""
    return (ray.data.read_json(
        path, arrow_open_stream_args={"compression": "gzip"},
        file_extensions=["gz"])
        .map_batches(conform_turns, batch_format="pyarrow"))


def read_turns_csv(path: str) -> ray.data.Dataset:
    """Headered CSV turns source via ``ray.data.read_csv``.

    ``null_values=[]`` keeps empty fields as EMPTY STRINGS: pyarrow's
    default reads ``""`` as null, which breaks write→read round-trips
    (CSV cannot distinguish empty from missing, and the canonical turns
    contract uses "" for no-tool)."""
    from pyarrow import csv as pacsv

    return (ray.data.read_csv(
        path,
        convert_options=pacsv.ConvertOptions(null_values=[],
                                             strings_can_be_null=False))
        .map_batches(conform_turns, batch_format="pyarrow"))


def read_turns_tsv(path: str, *, normalize_tools: bool = False
                   ) -> ray.data.Dataset:
    """TSV turns file(s) → turns Dataset (streaming read_text + batch
    parser; the schema matches read_parquet(turns) so every downstream
    stage is source-agnostic).

    ``normalize_tools=True`` runs the wiki-title canonicalizer over the
    ``tool`` column (double-HTML-unescape + ``_``→space + percent-decode
    + capitalize — reference: src/main/scala/utils/Normalizer.scala:15-34)
    for corpora whose tool/link identifiers arrive escaped; off by
    default to keep byte parity with the Parquet reader.
    """
    ds = ray.data.read_text(path).map_batches(
        parse_turn_lines, batch_format="pyarrow")
    if normalize_tools:
        from ..functions.text import normalize_title_series

        def canon(t: pa.Table) -> pa.Table:
            tool = normalize_title_series(t["tool"]).to_arrow()
            return t.set_column(t.schema.get_field_index("tool"),
                                "tool", tool.cast(pa.string()))

        ds = ds.map_batches(canon, batch_format="pyarrow")
    return ds
