"""decoder="real": BMP/PPM payloads decode end-to-end without PIL."""

from __future__ import annotations

import numpy as np
import pytest

from csd363_sin_spark.functions.multimodal import (
    _decode_bmp,
    _decode_ppm,
    _decode_real,
    decode_features,
    encode_bmp,
    resize_images,
)


def _gray(h, w, seed=3):
    return (
        (np.arange(h * w, dtype=np.int64) * 131 + seed) % 256
    ).astype(np.uint8).reshape(h, w)


def test_bmp_roundtrip_exact():
    for h, w in [(5, 7), (8, 8), (3, 10)]:  # odd widths exercise padding
        img = _gray(h, w)
        decoded = _decode_bmp(encode_bmp(img))
        assert decoded.shape == (1, h, w)
        # B=G=R=v in the encoder, luma (299+587+114)v//1000 == v (floor of
        # 1000v/1000), so the round trip is exact
        assert (decoded[0] == img).all()


def test_ppm_decode_with_comment():
    h, w = 4, 6
    rgb = np.dstack([_gray(h, w, s) for s in (1, 2, 3)])
    payload = (
        b"P6\n# a comment\n" + f"{w} {h}\n255\n".encode() + rgb.tobytes()
    )
    decoded = _decode_ppm(payload)
    expect = (
        299 * rgb[..., 0].astype(np.int32)
        + 587 * rgb[..., 1].astype(np.int32)
        + 114 * rgb[..., 2].astype(np.int32)
    ) // 1000
    assert decoded.shape == (1, h, w)
    assert (decoded[0] == expect.astype(np.uint8)).all()


def test_real_decode_rejects_unknown_format():
    with pytest.raises(NotImplementedError, match="PIL"):
        _decode_real(b"\xff\xd8\xff\xe0 fake jpeg")


def test_decode_features_real_e2e(spark):
    rows = []
    imgs = {}
    for i in range(12):
        h, w = 4 + i % 3, 5 + i % 4
        img = _gray(h, w, seed=i)
        imgs[i] = img
        rows.append((i, "image", bytearray(encode_bmp(img)), w, h, 0, 1))
    media = spark.createDataFrame(
        rows,
        "media_id long, kind string, payload binary, width int, "
        "height int, sample_rate int, n_frames int",
    )
    feats = {
        r["media_id"]: r
        for r in decode_features(media, decoder="real").collect()
    }
    assert set(feats) == set(imgs)
    for i, img in imgs.items():
        assert feats[i]["n_frames"] == 1
        assert feats[i]["mean_intensity"] == pytest.approx(float(img.mean()))
        hist, _ = np.histogram(img, bins=8, range=(0, 256))
        assert feats[i]["histogram8"] == hist.astype("int64").tolist()

    resized = resize_images(media, out_w=3, out_h=2, decoder="real").collect()
    assert len(resized) == len(imgs)
    from csd363_sin_spark.functions.multimodal import _decode_fake

    for r in resized:
        arr = _decode_fake(bytes(r["payload"]))
        assert arr.shape == (1, 2, 3)
