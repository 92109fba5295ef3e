"""Metadata-clean parquet reads.

The driver-generated testdata parquet embeds a ``b'pandas'`` schema-
metadata blob (written by pandas), and ``hash(pyarrow.Schema)`` raises
``unhashable type: 'dict'`` on such a schema.  Ray Data hashes block
schemas to dedup them before unifying (``transform_pyarrow.unify_schemas``
early-exit) — with the blob aboard every read task logs ``Failed to hash
the schemas (for deduplication)`` and falls back to the full unify on
every block build.

``read_parquet_clean`` is a drop-in replacement for
``ray.data.read_parquet`` that probes the file-footer schema once on the
driver and, when (and only when) a metadata blob is present, forwards a
stripped ``schema=`` so every downstream block schema is hashable again.
Files written without pandas metadata (all of this repo's own outputs)
pass through with ``schema=None`` — zero behavior change.

Ray treats ``schema=`` as the OUTPUT schema, so it must be projected to
``columns`` when given; a ``filter`` referencing a column outside that
projection cannot be expressed this way (observed ArrowInvalid on Ray
2.49) — that combination passes through unstripped, keeping the read
correct at the cost of the (cosmetic) warning.
"""

from __future__ import annotations

import ray.data

__all__ = ["read_parquet_clean"]

_SCHEMA_CACHE: dict = {}


def _stripped_schema(paths):
    """Footer schema with schema- and field-level metadata removed, or
    None when the file carries none (or the probe fails — never let the
    cosmetic fix break a read)."""
    key = tuple(paths) if isinstance(paths, (list, tuple)) else paths
    if key in _SCHEMA_CACHE:
        return _SCHEMA_CACHE[key]
    out = None
    try:
        import pyarrow as pa
        import pyarrow.dataset as pds

        sch = pds.dataset(paths).schema
        if sch.metadata is not None or any(
                f.metadata is not None for f in sch):
            out = pa.schema([f.remove_metadata() for f in sch])
    except Exception:
        out = None
    _SCHEMA_CACHE[key] = out
    return out


def _filter_within(flt, sch, columns) -> bool:
    """Best-effort: does the filter expression reference only projected
    columns?  ``pyarrow.dataset.Expression`` exposes no field-name API,
    so scan its repr for word-boundary occurrences of the NON-projected
    schema field names — a hit (even a spurious one inside a literal)
    just means we conservatively skip the cosmetic schema strip."""
    import re

    s = str(flt)
    outside = [f.name for f in sch if f.name not in columns]
    return not any(re.search(rf"\b{re.escape(n)}\b", s) for n in outside)


def read_parquet_clean(paths, *, columns=None, schema=None, **kw):
    """``ray.data.read_parquet`` with hashable (metadata-free) schemas.

    Same signature and semantics; only adds a stripped ``schema=`` when
    the caller didn't pass one and the file footer carries metadata."""
    if schema is None:
        sch = _stripped_schema(paths)
        flt = kw.get("filter")
        if sch is not None and not (
                columns is not None and flt is not None
                and not _filter_within(flt, sch, columns)):
            if columns is not None:
                import pyarrow as pa

                sch = pa.schema([sch.field(c) for c in columns])
            schema = sch
    return ray.data.read_parquet(paths, columns=columns, schema=schema,
                                 **kw)
