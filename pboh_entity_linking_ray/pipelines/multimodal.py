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
from pboh_entity_linking_ray.sources.reading import read_parquet_clean

import numpy as np
import pyarrow as pa
import ray.data

FEATURE_DIM = 8


def encode_payloads(sf_dir: str) -> ray.data.Dataset:
    """documents → (doc_id, payload:binary, width, height, channels)."""
    ds = read_parquet_clean(f"{sf_dir}/documents.parquet",
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


FRAME_BYTES = 256     # fake-video frame size (bytes per frame window)
FRAME_STRIDE = 4      # sample every 4th frame


def mm_frame_sample(sf_dir: str):
    """Video-style frame sampling plumbing (oracle-checked): the payload
    is treated as a frame sequence of FRAME_BYTES windows; every
    FRAME_STRIDE-th frame is emitted as (doc_id, frame_idx, frame_off,
    frame_len).  Fully vectorized (np.repeat over per-doc frame counts);
    the real decode of each window is the stubbed codec path."""
    ds = encode_payloads(sf_dir).select_columns(["doc_id", "n_bytes"])

    def sample(t: pa.Table) -> pa.Table:
        n = np.asarray(t["n_bytes"], dtype=np.int64)
        if len(n) == 0:
            empty = pa.array([], type=pa.int64())
            return pa.table({"doc_id": t["doc_id"], "frame_idx": empty,
                             "frame_off": empty, "frame_len": empty})
        n_frames = (n + FRAME_BYTES - 1) // FRAME_BYTES
        n_sampled = (n_frames + FRAME_STRIDE - 1) // FRAME_STRIDE
        rep = np.repeat(np.arange(len(n)), n_sampled)
        # frame index within each doc: global arange minus each doc's
        # segment start, times the stride
        total = int(n_sampled.sum())
        starts = np.concatenate(([0], np.cumsum(n_sampled)[:-1]))
        local = np.arange(total) - np.repeat(starts, n_sampled)
        fidx = local * FRAME_STRIDE
        off = fidx * FRAME_BYTES
        ln = np.minimum(FRAME_BYTES, n[rep] - off)
        return pa.table({
            "doc_id": t["doc_id"].take(pa.array(rep)),
            "frame_idx": pa.array(fidx),
            "frame_off": pa.array(off),
            "frame_len": pa.array(ln),
        })

    return ds.map_batches(sample, batch_format="pyarrow")


SQL_MM_FRAMES = f"""
SELECT doc_id,
       unnest(range(0, (n_bytes + {FRAME_BYTES - 1}) // {FRAME_BYTES},
                    {FRAME_STRIDE})) AS frame_idx,
       frame_idx * {FRAME_BYTES} AS frame_off,
       least({FRAME_BYTES}, n_bytes - frame_off) AS frame_len
FROM (SELECT doc_id, octet_length(encode(text)) AS n_bytes FROM documents)
"""


RESIZE_TARGET = 32    # fit into a TARGET×TARGET box, aspect preserved


def mm_resize_meta(sf_dir: str):
    """Resize plumbing (oracle-checked): integer aspect-preserving fit of
    (width, height) into a RESIZE_TARGET box — scale in e4 fixed point,
    exactly reproducible in SQL.  The pixel resample itself is the
    stubbed codec path."""
    ds = mm_decode_meta(sf_dir)

    def rs(t: pa.Table) -> pa.Table:
        w = np.asarray(t["width"], dtype=np.int64)
        h = np.asarray(t["height"], dtype=np.int64)
        s_e4 = np.minimum(RESIZE_TARGET * 10000 // w,
                          RESIZE_TARGET * 10000 // h)
        return pa.table({
            "doc_id": t["doc_id"],
            "width": t["width"], "height": t["height"],
            "scale_e4": pa.array(s_e4),
            "new_w": pa.array(np.maximum(1, w * s_e4 // 10000)),
            "new_h": pa.array(np.maximum(1, h * s_e4 // 10000)),
        })

    return ds.map_batches(rs, batch_format="pyarrow")


SQL_MM_RESIZE = f"""
SELECT doc_id, width, height,
       least({RESIZE_TARGET} * 10000 // width,
             {RESIZE_TARGET} * 10000 // height) AS scale_e4,
       greatest(1, width * scale_e4 // 10000) AS new_w,
       greatest(1, height * scale_e4 // 10000) AS new_h
FROM (SELECT doc_id,
             16 + (octet_length(encode(text)) % 64) AS width,
             16 + ((octet_length(encode(text)) // 64) % 64) AS height
      FROM documents)
"""


def mm_frame_features(sf_dir: str):
    """Actor-pool per-frame feature extraction over the REAL payload
    byte windows (rows-only; the feature is the fake byte-histogram —
    the codec hook is the stubbed MediaDecoder 'real' path)."""

    class FrameFeatures:
        def __call__(self, t: pa.Table) -> pa.Table:
            doc_out, idx_out, feats = [], [], []
            payloads = t["payload"].to_pylist()
            docs = t["doc_id"].to_pylist()
            for d, p in zip(docs, payloads):
                arr = np.frombuffer(p, dtype=np.uint8)
                for f in range(0, (len(arr) + FRAME_BYTES - 1) // FRAME_BYTES,
                               FRAME_STRIDE):
                    win = arr[f * FRAME_BYTES:(f + 1) * FRAME_BYTES]
                    hist, _ = np.histogram(win, bins=FEATURE_DIM,
                                           range=(0, 256))
                    doc_out.append(d)
                    idx_out.append(f)
                    feats.append(((hist * 10000) // max(1, len(win)))
                                 .astype(np.int64).tolist())
            return pa.table({
                "doc_id": pa.array(doc_out, type=t.schema.field("doc_id").type),
                "frame_idx": pa.array(idx_out, type=pa.int64()),
                "features_e4": pa.array(feats, type=pa.list_(pa.int64())),
            })

    return encode_payloads(sf_dir).map_batches(
        FrameFeatures, batch_format="pyarrow", batch_size=64,
        concurrency=(1, 4), num_cpus=1)


# --- REAL codec-free decoders: WAV (RIFF PCM16) and PPM (P6) -----------------
#
# The container ships no image/audio libraries, but two REAL on-disk
# media formats need none: RIFF/WAV PCM and binary PPM are
# header + raw-sample layouts fully decodable with numpy.  These stages
# upgrade the decode story from "stub behind NotImplementedError" to an
# honest end-to-end decode for formats the environment can support, and
# baseline-DCT JPEG is decoded for real too (functions/jpeg.py: stdlib+
# numpy Huffman + dequant + IDCT); the remaining compressed-codec hooks
# (MP3/H.264) stay documented stubs.
# Payload SYNTHESIS is deterministic per doc_id (integer LCG), so tests
# can independently re-decode the pipeline's own bytes (stdlib ``wave``
# for audio — a reference decoder we did not write).

WAV_RATE = 8000


def _lcg_samples(doc_id: int, n: int) -> np.ndarray:
    k = np.arange(n, dtype=np.int64)
    return (((doc_id * 2654435761 + k * 40503) % 65536) - 32768) \
        .astype(np.int16)


def encode_wav_payloads(sf_dir: str) -> ray.data.Dataset:
    """documents → (doc_id, payload) with a complete RIFF/WAV PCM16
    mono file per row (sample count varies per doc)."""
    import struct

    ds = read_parquet_clean(f"{sf_dir}/documents.parquet",
                               columns=["doc_id"])

    def enc(t: pa.Table) -> pa.Table:
        payloads = []
        for doc_id in t["doc_id"].to_pylist():
            n = 400 + (int(doc_id) * 37) % 800
            pcm = _lcg_samples(int(doc_id), n).tobytes()
            hdr = (b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVE"
                   + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, WAV_RATE,
                                           WAV_RATE * 2, 2, 16)
                   + b"data" + struct.pack("<I", len(pcm)))
            payloads.append(hdr + pcm)
        return pa.table({"doc_id": t["doc_id"],
                         "payload": pa.array(payloads, type=pa.binary())})

    return ds.map_batches(enc, batch_format="pyarrow", batch_size=256)


class WavDecoder:
    """Actor-pool REAL WAV decode: parses the RIFF header and PCM16
    samples with numpy only and emits per-clip audio stats.  Raises on
    compressed formats (fmt != 1 PCM) — that is the codec stub's job."""

    def __call__(self, t: pa.Table) -> pa.Table:
        rates, counts, durs, rms, peaks = [], [], [], [], []
        for p in t["payload"].to_pylist():
            b = np.frombuffer(p, dtype=np.uint8)
            if (bytes(b[:4]) != b"RIFF" or bytes(b[8:12]) != b"WAVE"
                    or bytes(b[12:16]) != b"fmt "):
                raise ValueError("not a RIFF/WAVE payload")
            fmt = int(np.frombuffer(p, np.uint16, 1, 20)[0])
            if fmt != 1:
                raise NotImplementedError(
                    "compressed WAV needs a codec (stubbed)")
            rate = int(np.frombuffer(p, np.uint32, 1, 24)[0])
            data_len = int(np.frombuffer(p, np.uint32, 1, 40)[0])
            x = np.frombuffer(p, np.int16, data_len // 2, 44)
            xi = x.astype(np.int64)
            rates.append(rate)
            counts.append(len(x))
            durs.append(len(x) * 1000 // rate)
            rms.append(int(np.sqrt((xi * xi).mean()) / 32768 * 10_000)
                       if len(x) else 0)
            peaks.append(int(np.abs(xi).max()) if len(x) else 0)
        return pa.table({
            "doc_id": t["doc_id"],
            "sample_rate": pa.array(rates, type=pa.int64()),
            "n_samples": pa.array(counts, type=pa.int64()),
            "duration_ms": pa.array(durs, type=pa.int64()),
            "rms_e4": pa.array(rms, type=pa.int64()),
            "peak": pa.array(peaks, type=pa.int64()),
        })


def mm_wav_stats(sf_dir: str):
    """Real RIFF/WAV PCM decode → per-clip stats (rows-only; pytest
    re-decodes the same payloads with the stdlib ``wave`` module)."""
    return encode_wav_payloads(sf_dir).map_batches(
        WavDecoder, batch_format="pyarrow", batch_size=64,
        concurrency=(1, 4), num_cpus=1)


def encode_ppm_payloads(sf_dir: str) -> ray.data.Dataset:
    """documents → (doc_id, payload) with a complete binary PPM (P6)
    image per row (dimensions vary per doc, pixels LCG-deterministic)."""
    ds = read_parquet_clean(f"{sf_dir}/documents.parquet",
                               columns=["doc_id"])

    def enc(t: pa.Table) -> pa.Table:
        payloads = []
        for doc_id in t["doc_id"].to_pylist():
            d = int(doc_id)
            w, h = 8 + d % 9, 8 + (d // 9) % 7
            k = np.arange(w * h * 3, dtype=np.int64)
            px = ((d * 2246822519 + k * 2654435761) % 256).astype(np.uint8)
            payloads.append(f"P6\n{w} {h}\n255\n".encode() + px.tobytes())
        return pa.table({"doc_id": t["doc_id"],
                         "payload": pa.array(payloads, type=pa.binary())})

    return ds.map_batches(enc, batch_format="pyarrow", batch_size=256)


PPM_RESIZE = 4


def _image_stats_table(doc_ids, imgs: "list[np.ndarray]") -> pa.Table:
    """Shared per-image stats contract of the PPM and PNG decoders:
    dims, per-channel integer means (e2), PPM_RESIZE² nearest-neighbor
    downsample checksum.  One place to change = both decoders (and
    both pytest pins) stay in lockstep."""
    ws, hs, mr, mg, mb, ck = [], [], [], [], [], []
    for img in imgs:
        h, w, _ = img.shape
        s = img.astype(np.int64)
        iy = (np.arange(PPM_RESIZE) * h) // PPM_RESIZE
        ix = (np.arange(PPM_RESIZE) * w) // PPM_RESIZE
        small = img[iy][:, ix]
        ws.append(w)
        hs.append(h)
        mr.append(int(s[..., 0].sum()) * 100 // (w * h))
        mg.append(int(s[..., 1].sum()) * 100 // (w * h))
        mb.append(int(s[..., 2].sum()) * 100 // (w * h))
        ck.append(int(small.astype(np.int64).sum()))
    return pa.table({
        "doc_id": doc_ids,
        "width": pa.array(ws, type=pa.int64()),
        "height": pa.array(hs, type=pa.int64()),
        "mean_r_e2": pa.array(mr, type=pa.int64()),
        "mean_g_e2": pa.array(mg, type=pa.int64()),
        "mean_b_e2": pa.array(mb, type=pa.int64()),
        "resized_checksum": pa.array(ck, type=pa.int64()),
    })


class PpmDecoder:
    """Actor-pool REAL PPM (P6) decode + nearest-neighbor resize, numpy
    only: header parse → H×W×3 reshape → shared image-stats tail
    (the resample is real; only compressed codecs remain stubbed)."""

    def __call__(self, t: pa.Table) -> pa.Table:
        imgs = []
        for p in t["payload"].to_pylist():
            magic, dims, maxval, raw = p.split(b"\n", 3)
            if magic != b"P6" or maxval != b"255":
                raise NotImplementedError("only 8-bit P6 PPM (codec stub)")
            w, h = (int(v) for v in dims.split())
            imgs.append(np.frombuffer(raw, np.uint8, w * h * 3)
                        .reshape(h, w, 3))
        return _image_stats_table(t["doc_id"], imgs)


def mm_ppm_stats(sf_dir: str):
    """Real PPM decode + resize → per-image stats (rows-only; pytest
    re-decodes the payload bytes independently)."""
    return encode_ppm_payloads(sf_dir).map_batches(
        PpmDecoder, batch_format="pyarrow", batch_size=64,
        concurrency=(1, 4), num_cpus=1)


# --- real PNG codec (stdlib zlib + numpy, no imaging library) --------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(typ: bytes, data: bytes) -> bytes:
    import struct
    import zlib

    return (struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF))


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa_, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa_ <= pb and pa_ <= pc:
        return a
    return b if pb <= pc else c


def _png_encode(img: np.ndarray) -> bytes:
    """Spec-correct truecolor-8 PNG encoder; the filter type CYCLES
    row % 5 so every decoder unfilter path (None/Sub/Up/Average/Paeth)
    is exercised by the corpus itself."""
    import struct
    import zlib

    h, w, _ = img.shape
    bpp = 3
    raw = bytearray()
    prev = np.zeros(w * bpp, dtype=np.int64)
    for y in range(h):
        cur = img[y].reshape(-1).astype(np.int64)
        ft = y % 5
        raw.append(ft)
        if ft == 0:
            out = cur
        elif ft == 1:      # Sub
            left = np.r_[np.zeros(bpp, dtype=np.int64), cur[:-bpp]]
            out = (cur - left) % 256
        elif ft == 2:      # Up
            out = (cur - prev) % 256
        elif ft == 3:      # Average
            out = np.empty_like(cur)
            for i in range(len(cur)):
                left = cur[i - bpp] if i >= bpp else 0
                out[i] = (cur[i] - (left + prev[i]) // 2) % 256
        else:              # Paeth
            out = np.empty_like(cur)
            for i in range(len(cur)):
                a = cur[i - bpp] if i >= bpp else 0
                c = prev[i - bpp] if i >= bpp else 0
                out[i] = (cur[i] - _paeth(a, int(prev[i]), c)) % 256
        raw.extend(out.astype(np.uint8).tobytes())
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (_PNG_SIG + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
            + _png_chunk(b"IEND", b""))


def _png_decode(data: bytes) -> np.ndarray:
    """Real PNG decode for truecolor-8 non-interlaced images: chunk walk
    with CRC verification, zlib inflate, and the full 5-filter
    reconstruction.  None/Sub/Up rows are vectorized (Sub is a per-stride
    cumulative sum); Average/Paeth are sequential by definition of the
    filter and run per-byte over the (short) row."""
    import struct
    import zlib

    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos = 8
    w = h = None
    idat = bytearray()
    while pos < len(data):
        (ln,) = struct.unpack(">I", data[pos:pos + 4])
        typ = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + ln]
        (crc,) = struct.unpack(">I", data[pos + 8 + ln:pos + 12 + ln])
        if zlib.crc32(typ + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk CRC mismatch in {typ!r}")
        if typ == b"IHDR":
            w, h, depth, ctype, comp, filt, ilace = struct.unpack(
                ">IIBBBBB", body)
            if (depth, ctype, comp, filt, ilace) != (8, 2, 0, 0, 0):
                raise NotImplementedError(
                    "only truecolor-8 non-interlaced PNG (codec stub)")
        elif typ == b"IDAT":
            idat.extend(body)
        elif typ == b"IEND":
            break
        pos += 12 + ln
    bpp = 3
    stride = w * bpp
    flat = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    rows = flat.reshape(h, stride + 1)
    out = np.empty((h, stride), dtype=np.int64)
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(h):
        ft = int(rows[y, 0])
        cur = rows[y, 1:].astype(np.int64)
        if ft == 0:
            rec = cur
        elif ft == 1:
            rec = cur.copy()
            for off in range(bpp):     # per-stride cumulative sum mod 256
                rec[off::bpp] = np.cumsum(cur[off::bpp]) % 256
        elif ft == 2:
            rec = (cur + prev) % 256
        elif ft == 3:
            rec = np.empty_like(cur)
            for i in range(stride):
                left = rec[i - bpp] if i >= bpp else 0
                rec[i] = (cur[i] + (left + prev[i]) // 2) % 256
        elif ft == 4:
            rec = np.empty_like(cur)
            for i in range(stride):
                a = rec[i - bpp] if i >= bpp else 0
                c = prev[i - bpp] if i >= bpp else 0
                rec[i] = (cur[i] + _paeth(int(a), int(prev[i]), int(c))) % 256
        else:
            raise ValueError(f"bad PNG filter type {ft}")
        out[y] = rec
        prev = rec
    return out.reshape(h, w, bpp).astype(np.uint8)


def png_pixels(doc_id: int) -> tuple[np.ndarray, int, int]:
    """Deterministic ground-truth pixels for one doc (shared by the
    encoder and the pytest round-trip check)."""
    d = int(doc_id)
    w, h = 6 + d % 11, 6 + (d // 11) % 8
    k = np.arange(w * h * 3, dtype=np.int64)
    px = ((d * 40503 + k * 2654435761) % 256).astype(np.uint8)
    return px.reshape(h, w, 3), w, h


def encode_png_payloads(sf_dir: str) -> ray.data.Dataset:
    """documents → (doc_id, payload) with a complete, CRC-valid PNG per
    row (filter types cycling per scanline)."""
    ds = read_parquet_clean(f"{sf_dir}/documents.parquet",
                               columns=["doc_id"])

    def enc(t: pa.Table) -> pa.Table:
        payloads = []
        for doc_id in t["doc_id"].to_pylist():
            img, _w, _h = png_pixels(doc_id)
            payloads.append(_png_encode(img))
        return pa.table({"doc_id": t["doc_id"],
                         "payload": pa.array(payloads, type=pa.binary())})

    return ds.map_batches(enc, batch_format="pyarrow", batch_size=256)


class PngDecoder:
    """Actor-pool REAL PNG decode stage (same output contract as
    PpmDecoder, via the shared ``_image_stats_table`` tail)."""

    def __call__(self, t: pa.Table) -> pa.Table:
        return _image_stats_table(
            t["doc_id"], [_png_decode(p) for p in t["payload"].to_pylist()])


def mm_png_stats(sf_dir: str):
    """Real PNG decode (zlib inflate + 5-filter reconstruction + CRC
    verify) → per-image stats (rows-only; pytest round-trips the codec
    against the ground-truth pixel generator and a corrupted payload)."""
    return encode_png_payloads(sf_dir).map_batches(
        PngDecoder, batch_format="pyarrow", batch_size=64,
        concurrency=(1, 4), num_cpus=1)


# --- JPEG: REAL baseline-DCT decode (functions/jpeg.py) --------------------

def jpeg_pixels(doc_id: int) -> tuple[np.ndarray, int, int]:
    """Deterministic ground-truth pixels for one doc — smooth gradients
    (the signal class JPEG represents well), distinct per doc."""
    d = int(doc_id)
    w, h = 9 + d % 10, 9 + (d // 10) % 7
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack([
        (yy * (3 + d % 5) + xx * (2 + d % 7) + d) % 256,
        (yy * (5 + d % 3) + xx * (4 + d % 2) + 2 * d) % 256,
        (yy * 2 + xx * (1 + d % 4) + 3 * d) % 256,
    ], axis=-1).astype(np.uint8)
    return img, w, h


def encode_jpeg_payloads(sf_dir: str) -> ray.data.Dataset:
    """documents → (doc_id, payload) with a complete baseline JFIF
    stream per row (functions/jpeg.py encoder, Annex K tables)."""
    from ..functions.jpeg import jpeg_encode

    ds = read_parquet_clean(f"{sf_dir}/documents.parquet",
                            columns=["doc_id"])

    def enc(t: pa.Table) -> pa.Table:
        payloads = []
        for doc_id in t["doc_id"].to_pylist():
            img, _w, _h = jpeg_pixels(doc_id)
            payloads.append(jpeg_encode(img))
        return pa.table({"doc_id": t["doc_id"],
                         "payload": pa.array(payloads, type=pa.binary())})

    return ds.map_batches(enc, batch_format="pyarrow", batch_size=256)


class JpegDecoder:
    """Actor-pool REAL baseline-JPEG decode stage (marker walk,
    stream-defined Huffman + quant tables, IDCT, YCbCr→RGB) — same
    output contract as Ppm/PngDecoder via ``_image_stats_table``."""

    def __call__(self, t: pa.Table) -> pa.Table:
        from ..functions.jpeg import jpeg_decode

        return _image_stats_table(
            t["doc_id"],
            [jpeg_decode(p) for p in t["payload"].to_pylist()])


def mm_jpeg_stats(sf_dir: str):
    """Real baseline-DCT JPEG decode → per-image stats (rows-only; the
    pytest round-trips the codec near-losslessly with unit quant tables,
    pins PSNR with the Annex K tables, and rejects progressive/
    subsampled streams — functions/jpeg.py)."""
    return encode_jpeg_payloads(sf_dir).map_batches(
        JpegDecoder, batch_format="pyarrow", batch_size=64,
        concurrency=(1, 4), num_cpus=1)


QUERIES = {
    "mm_decode_meta": (mm_decode_meta, SQL_MM_META),
    "mm_png_stats": (mm_png_stats, None),
    "mm_jpeg_stats": (mm_jpeg_stats, None),
    # real codec-free decodes → rows-only; pytest re-decodes the
    # pipeline's own bytes (stdlib wave / independent PPM parse)
    "mm_wav_stats": (mm_wav_stats, None),
    "mm_ppm_stats": (mm_ppm_stats, None),
    "mm_frame_sample": (mm_frame_sample, SQL_MM_FRAMES),
    "mm_resize_meta": (mm_resize_meta, SQL_MM_RESIZE),
    "mm_features": (mm_features, None),
    "mm_frame_features": (mm_frame_features, None),
}
