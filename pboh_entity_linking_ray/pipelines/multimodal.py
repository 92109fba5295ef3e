"""Multimodal column plumbing (binary payload → decode → features).

Images/audio/video are treated as opaque ``binary`` columns with typed
metadata; decode / feature-extract run as actor-pool ``map_batches``
stages with small batches (wide binary rows).  The image/audio codecs are
not available in this container, so the real decode is STUBBED behind an
import-try (``NotImplementedError`` when a real codec would be needed) and
a deterministic fake decode keeps the Ray-side plumbing — schema, batch
size, actor signature, output layout — real and tested.

The fake payload is the document text's utf-8 bytes; metadata (width,
height, channels) is a deterministic function of byte length so the
metadata query has an exact SQL twin.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

FEATURE_DIM = 8


def encode_payloads(sf_dir: str) -> ray.data.Dataset:
    """documents → (doc_id, payload:binary, width, height, channels)."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])

    def enc(t: pa.Table) -> pa.Table:
        texts = t["text"].to_pylist()
        payloads = [s.encode("utf-8") for s in texts]
        n = np.array([len(p) for p in payloads], dtype=np.int64)
        return pa.table({
            "doc_id": t["doc_id"],
            "payload": pa.array(payloads, type=pa.binary()),
            "n_bytes": pa.array(n),
            "width": pa.array(16 + (n % 64)),
            "height": pa.array(16 + ((n // 64) % 64)),
            "channels": pa.array(np.full(len(n), 3, dtype=np.int64)),
        })

    return ds.map_batches(enc, batch_format="pyarrow", batch_size=256)


class MediaDecoder:
    """Actor-pool decode stage.  ``mode="real"`` requires an image codec
    (PIL/opencv — absent here → NotImplementedError); ``mode="fake"``
    produces a deterministic byte-histogram feature vector with the same
    schema the real path would emit."""

    def __init__(self, mode: str = "fake"):
        self.mode = mode
        if mode == "real":
            try:
                import PIL.Image  # noqa: F401
            except ImportError as e:
                raise NotImplementedError(
                    "real image decode needs PIL/opencv, not present in this "
                    "container; use mode='fake'"
                ) from e

    def __call__(self, t: pa.Table) -> pa.Table:
        if self.mode == "real":  # pragma: no cover - stub
            raise NotImplementedError("real decode path is stubbed")
        feats = []
        for payload in t["payload"].to_pylist():
            arr = np.frombuffer(payload, dtype=np.uint8)
            if len(arr) == 0:
                feats.append([0] * FEATURE_DIM)
                continue
            hist, _ = np.histogram(arr, bins=FEATURE_DIM, range=(0, 256))
            feats.append(((hist * 10000) // max(1, len(arr))).astype(np.int64).tolist())
        out = t.drop_columns(["payload"])
        return out.append_column(
            "features_e4", pa.array(feats, type=pa.list_(pa.int64())))


def mm_decode_meta(sf_dir: str):
    """Metadata columns only (oracle-checked)."""
    return encode_payloads(sf_dir).select_columns(
        ["doc_id", "n_bytes", "width", "height", "channels"])


SQL_MM_META = """
SELECT doc_id,
       octet_length(encode(text)) AS n_bytes,
       16 + (octet_length(encode(text)) % 64) AS width,
       16 + ((octet_length(encode(text)) // 64) % 64) AS height,
       CAST(3 AS BIGINT) AS channels
FROM documents
"""


def mm_features(sf_dir: str):
    """Full decode pipeline (fake decode; rows-only check)."""
    return encode_payloads(sf_dir).map_batches(
        MediaDecoder, fn_constructor_kwargs={"mode": "fake"},
        batch_format="pyarrow", batch_size=64, concurrency=(1, 4), num_cpus=1,
    )


QUERIES = {
    "mm_decode_meta": (mm_decode_meta, SQL_MM_META),
    "mm_features": (mm_features, None),
}
