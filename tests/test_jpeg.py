"""Pure-Python baseline JPEG codec (functions/jpeg.py).

The encoder emits spec-conformant baseline JFIF (standard Annex K
tables, standard markers); the decoder is exercised over grayscale,
restart markers, and multi-component subsampled color.  Round-trip
error is bounded by the quantization step — asserted explicitly.
"""

from __future__ import annotations

import numpy as np
import pytest

from csd363_sin_spark.functions.jpeg import (
    decode_jpeg,
    encode_jpeg,
    encode_jpeg_color,
)


def _gray(h, w, seed=3):
    return (
        (np.arange(h * w, dtype=np.int64) * 131 + seed) % 256
    ).astype(np.uint8).reshape(h, w)


@pytest.mark.parametrize("shape", [(8, 8), (16, 24), (5, 7), (33, 17), (1, 1)])
def test_gray_roundtrip_quantization_bounded(shape):
    h, w = shape
    img = _gray(h, w)
    for quality, bound in [(95, 8), (85, 25)]:
        dec = decode_jpeg(encode_jpeg(img, quality=quality))
        assert dec.shape == (1, h, w)
        err = np.abs(dec[0].astype(int) - img.astype(int)).max()
        assert err <= bound, (quality, err)


def test_smooth_image_high_quality_near_exact():
    # low-frequency content survives q95 quantization exactly
    smooth = np.clip(
        np.add.outer(np.arange(32), np.arange(32)) * 4, 0, 255
    ).astype(np.uint8)
    dec = decode_jpeg(encode_jpeg(smooth, quality=95))
    assert np.abs(dec[0].astype(int) - smooth.astype(int)).max() <= 1


@pytest.mark.parametrize("interval", [1, 2, 5])
def test_restart_markers(interval):
    img = _gray(24, 32)
    dec = decode_jpeg(encode_jpeg(img, quality=95, restart_interval=interval))
    base = decode_jpeg(encode_jpeg(img, quality=95))
    # restart markers change framing, not values
    assert (dec == base).all()


@pytest.mark.parametrize("subsampling", [(1, 1), (2, 2), (2, 1)])
def test_color_luma_extraction(subsampling):
    # decoded output == the Y channel (BT.601 luma), chroma discarded —
    # regardless of chroma subsampling (4:4:4 / 4:2:0 / 4:2:2)
    for h, w in [(16, 16), (17, 23)]:
        rgb = np.dstack([_gray(h, w, s) for s in (1, 2, 3)])
        y = 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
        dec = decode_jpeg(encode_jpeg_color(rgb, quality=95, subsampling=subsampling))
        assert dec.shape == (1, h, w)
        assert np.abs(dec[0].astype(float) - y).max() <= 8
        # chroma planes decoded in-sync: a color-cast image must not
        # perturb luma (Cb/Cr blocks share the entropy stream)
        tinted = rgb.copy()
        tinted[..., 2] = 255  # blue cast changes Cb drastically
        y_t = 0.299 * tinted[..., 0] + 0.587 * tinted[..., 1] + 0.114 * tinted[..., 2]
        dec_t = decode_jpeg(encode_jpeg_color(tinted, quality=95, subsampling=subsampling))
        assert np.abs(dec_t[0].astype(float) - y_t).max() <= 8


def test_progressive_rejected():
    img = _gray(8, 8)
    payload = bytearray(encode_jpeg(img))
    idx = payload.find(b"\xff\xc0")
    payload[idx + 1] = 0xC2  # rewrite SOF0 -> SOF2 (progressive)
    with pytest.raises(NotImplementedError, match="PIL"):
        decode_jpeg(bytes(payload))


def test_not_a_jpeg_rejected():
    with pytest.raises(ValueError, match="not a JPEG"):
        decode_jpeg(b"BMnope")


def test_real_decoder_routes_jpeg():
    from csd363_sin_spark.functions.multimodal import _decode_real

    img = _gray(9, 11)
    dec = _decode_real(encode_jpeg(img, quality=95))
    assert dec.shape == (1, 9, 11)
    assert np.abs(dec[0].astype(int) - img.astype(int)).max() <= 8


def test_avi_mjpeg_roundtrip():
    from csd363_sin_spark.functions.avi import decode_avi_mjpeg, encode_avi_mjpeg

    for shape in [(5, 16, 24), (3, 7, 9)]:  # odd dims exercise RIFF padding
        n, h, w = shape
        frames = np.stack([_gray(h, w, s) for s in range(n)])
        dec = decode_avi_mjpeg(encode_avi_mjpeg(frames, quality=95))
        assert dec.shape == shape
        assert np.abs(dec.astype(int) - frames.astype(int)).max() <= 8


def test_avi_rejects_non_mjpeg_and_non_avi():
    from csd363_sin_spark.functions.avi import decode_avi_mjpeg, encode_avi_mjpeg

    with pytest.raises(ValueError, match="not an AVI"):
        decode_avi_mjpeg(b"RIFFxxxxWAVE")
    frames = np.stack([_gray(8, 8)])
    avi = bytearray(encode_avi_mjpeg(frames))
    # corrupt the frame's JPEG SOI so it reads as a foreign codec
    idx = avi.find(b"\xff\xd8", 12)
    avi[idx] = 0x00
    with pytest.raises(NotImplementedError, match="pyav"):
        decode_avi_mjpeg(bytes(avi))


def test_sample_frames_real_avi_e2e(spark):
    from csd363_sin_spark.functions.avi import encode_avi_mjpeg
    from csd363_sin_spark.functions.multimodal import sample_frames

    rows = []
    expect = {}
    for i in range(6):
        n = 3 + i % 3
        frames = np.stack([_gray(8, 12, seed=i * 10 + f) for f in range(n)])
        rows.append((i, "video", bytearray(encode_avi_mjpeg(frames, quality=95)), 12, 8, 0, n))
        expect[i] = frames
    media = spark.createDataFrame(
        rows,
        "media_id long, kind string, payload binary, width int, "
        "height int, sample_rate int, n_frames int",
    )
    got = sample_frames(media, every_k=2, decoder="real").collect()
    by_id = {}
    for r in got:
        by_id.setdefault(r["media_id"], {})[r["frame_idx"]] = r["frame_mean"]
    for i, frames in expect.items():
        kept = list(range(0, frames.shape[0], 2))
        assert sorted(by_id[i]) == kept
        for f in kept:
            # JPEG-lossy mean stays within a couple of gray levels
            assert abs(by_id[i][f] - float(frames[f].mean())) < 2.5
