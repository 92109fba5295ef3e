"""The REAL codec-free media decoders must agree with independent
reference decoders over the pipeline's own payload bytes: stdlib
``wave`` for RIFF/WAV (a decoder we did not write), a from-scratch
parse for PPM."""

import io
import wave

import numpy as np

from pboh_entity_linking_ray.pipelines.multimodal import (
    PPM_RESIZE,
    WAV_RATE,
    encode_ppm_payloads,
    encode_wav_payloads,
    mm_ppm_stats,
    mm_wav_stats,
)

SF = "/root/testdata/sf0.001"


def test_wav_decode_matches_stdlib_wave(ray_session):
    payloads = {r["doc_id"]: r["payload"]
                for r in encode_wav_payloads(SF).take_all()}
    got = mm_wav_stats(SF).to_pandas().set_index("doc_id")
    assert len(got) == len(payloads) > 0
    for doc_id in list(payloads)[::37]:          # spot-check a spread
        with wave.open(io.BytesIO(payloads[doc_id])) as wf:
            assert wf.getnchannels() == 1
            assert wf.getsampwidth() == 2
            assert wf.getframerate() == WAV_RATE
            frames = wf.readframes(wf.getnframes())
        x = np.frombuffer(frames, dtype=np.int16).astype(np.int64)
        row = got.loc[doc_id]
        assert row["sample_rate"] == WAV_RATE
        assert row["n_samples"] == len(x)
        assert row["duration_ms"] == len(x) * 1000 // WAV_RATE
        assert row["peak"] == int(np.abs(x).max())
        assert row["rms_e4"] == int(np.sqrt((x * x).mean()) / 32768 * 10_000)


def test_ppm_decode_matches_independent_parse(ray_session):
    payloads = {r["doc_id"]: r["payload"]
                for r in encode_ppm_payloads(SF).take_all()}
    got = mm_ppm_stats(SF).to_pandas().set_index("doc_id")
    assert len(got) == len(payloads) > 0
    for doc_id in list(payloads)[::41]:
        p = payloads[doc_id]
        assert p.startswith(b"P6\n")
        header, rest = p.split(b"\n255\n", 1)
        w, h = (int(v) for v in header[3:].split())
        img = np.frombuffer(rest, np.uint8).reshape(h, w, 3)
        row = got.loc[doc_id]
        assert (row["width"], row["height"]) == (w, h)
        s = img.astype(np.int64)
        assert row["mean_r_e2"] == int(s[..., 0].sum()) * 100 // (w * h)
        assert row["mean_b_e2"] == int(s[..., 2].sum()) * 100 // (w * h)
        iy = (np.arange(PPM_RESIZE) * h) // PPM_RESIZE
        ix = (np.arange(PPM_RESIZE) * w) // PPM_RESIZE
        assert row["resized_checksum"] == int(
            img[iy][:, ix].astype(np.int64).sum())


def test_png_codec_roundtrip():
    """decode(encode(x)) must reproduce the ground-truth pixels exactly,
    with every filter type (None/Sub/Up/Average/Paeth) exercised, and a
    flipped byte must fail the CRC check."""
    import pytest

    from pboh_entity_linking_ray.pipelines.multimodal import (
        _png_decode,
        _png_encode,
        png_pixels,
    )

    heights = set()
    for doc_id in (0, 1, 7, 23, 119, 460):
        img, w, h = png_pixels(doc_id)
        heights.add(h)
        data = _png_encode(img)
        assert data[:8] == b"\x89PNG\r\n\x1a\n"
        out = _png_decode(data)
        assert out.shape == (h, w, 3)
        assert np.array_equal(out, img)
    # at least one image tall enough that rows hit all 5 filter types
    assert max(heights) >= 5

    img, _, _ = png_pixels(3)
    data = bytearray(_png_encode(img))
    data[40] ^= 0xFF                      # inside IDAT/IHDR body
    with pytest.raises(ValueError, match="CRC"):
        _png_decode(bytes(data))


def test_png_stats_match_ground_truth(ray_session):
    from pboh_entity_linking_ray.pipelines.multimodal import (
        mm_png_stats,
        png_pixels,
    )

    got = mm_png_stats(SF).to_pandas().set_index("doc_id")
    assert len(got) > 0
    for doc_id in list(got.index)[::41]:
        img, w, h = png_pixels(doc_id)
        row = got.loc[doc_id]
        assert (row["width"], row["height"]) == (w, h)
        s = img.astype(np.int64)
        assert row["mean_r_e2"] == int(s[..., 0].sum()) * 100 // (w * h)
        iy = (np.arange(PPM_RESIZE) * h) // PPM_RESIZE
        ix = (np.arange(PPM_RESIZE) * w) // PPM_RESIZE
        assert row["resized_checksum"] == int(
            img[iy][:, ix].astype(np.int64).sum())
