"""Baseline-DCT JPEG codec (functions/jpeg.py): near-lossless round trip
with unit quant tables, Annex-K-table PSNR floor, stream-defined-table
decode, and explicit rejection of unsupported stream classes."""

import numpy as np
import pytest

from pboh_entity_linking_ray.functions.jpeg import (QT_CHROMA, QT_LUMA,
                                                    jpeg_decode,
                                                    jpeg_encode)


def _img(seed, h, w):
    d = seed
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack([
        (yy * (3 + d % 5) + xx * (2 + d % 7) + d) % 256,
        (yy * (5 + d % 3) + xx * 4 + 2 * d) % 256,
        (yy * 2 + xx * (1 + d % 4) + 3 * d) % 256,
    ], axis=-1).astype(np.uint8)


@pytest.mark.parametrize("h,w", [(8, 8), (13, 18), (6, 23), (17, 7)])
def test_unit_quant_round_trip_near_lossless(h, w):
    """Quant table of ones leaves only DCT/color-transform rounding —
    the round trip must land within ±2 of every source pixel (incl.
    non-multiple-of-8 dims exercising edge-replication padding)."""
    img = _img(h * 31 + w, h, w)
    ones = np.ones(64, dtype=np.int64)
    out = jpeg_decode(jpeg_encode(img, ones, ones))
    assert out.shape == img.shape
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 2


def test_annex_k_tables_psnr_floor():
    """Standard tables are lossy; on a SMOOTH low-frequency image (no
    modular wrap edges) the codec must stay above 30 dB PSNR (sanity
    that quantization is wired right — a zigzag or table-order bug
    craters this)."""
    yy, xx = np.mgrid[0:24, 0:33]
    img = np.stack([
        128 + 90 * np.sin(yy / 9) * np.cos(xx / 11),
        128 + 80 * np.cos(yy / 7),
        128 + 70 * np.sin(xx / 8),
    ], axis=-1).round().clip(0, 255).astype(np.uint8)
    out = jpeg_decode(jpeg_encode(img, QT_LUMA, QT_CHROMA))
    mse = np.mean((out.astype(float) - img.astype(float)) ** 2)
    psnr = 10 * np.log10(255.0 ** 2 / max(mse, 1e-9))
    assert psnr > 30.0


def test_decoder_uses_stream_tables_not_encoder_constants():
    """Decode must be driven by the DQT actually in the stream: encode
    with doubled luma quant and verify the decoder reproduces the
    matching (coarser) reconstruction, not the Annex-K one."""
    img = _img(9, 16, 16)
    coarse = jpeg_decode(jpeg_encode(img, QT_LUMA * 2, QT_CHROMA * 2))
    fine = jpeg_decode(jpeg_encode(img, QT_LUMA, QT_CHROMA))
    e_coarse = np.abs(coarse.astype(int) - img.astype(int)).mean()
    e_fine = np.abs(fine.astype(int) - img.astype(int)).mean()
    assert e_coarse > e_fine            # coarser tables → worse fidelity


def test_rejects_non_jpeg_and_truncated():
    with pytest.raises(ValueError, match="SOI"):
        jpeg_decode(b"\x89PNG\r\n")
    img = _img(2, 8, 8)
    data = jpeg_encode(img)
    with pytest.raises(ValueError, match="SOF|marker"):
        jpeg_decode(data[:2] + b"\xFF\xD9")


def test_rejects_progressive_sof():
    img = _img(3, 8, 8)
    data = bytearray(jpeg_encode(img))
    i = data.find(b"\xFF\xC0")
    data[i + 1] = 0xC2                   # SOF0 → SOF2 (progressive)
    with pytest.raises(NotImplementedError, match="progressive"):
        jpeg_decode(bytes(data))


def test_mm_jpeg_stats_pipeline(ray_session):
    """End-to-end actor-pool decode over the documents table, pinned
    against an independent recompute from the ground-truth pixels."""
    from pboh_entity_linking_ray.pipelines.multimodal import (
        _image_stats_table, jpeg_pixels, mm_jpeg_stats)
    from pboh_entity_linking_ray.functions.jpeg import (jpeg_decode,
                                                        jpeg_encode)

    sf = "/root/testdata/sf0.001"
    got = mm_jpeg_stats(sf).to_pandas().sort_values("doc_id") \
        .reset_index(drop=True)
    assert len(got) > 0
    # independent recompute for the first few docs: ground-truth pixels
    # → encode → decode → stats, outside the Ray plan
    ids = got["doc_id"].head(8).tolist()
    imgs = [jpeg_decode(jpeg_encode(jpeg_pixels(d)[0])) for d in ids]
    want = _image_stats_table(ids, imgs).to_pandas()
    head = got.head(8).reset_index(drop=True)
    for col in want.columns:
        assert (head[col].to_numpy() == want[col].to_numpy()).all(), col
