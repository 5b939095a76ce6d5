"""decoder="real": BMP/PPM/PNG payloads decode end-to-end without PIL."""

from __future__ import annotations

import numpy as np
import pytest

from csd363_sin_spark.functions.multimodal import (
    _decode_bmp,
    _decode_png,
    _decode_ppm,
    _decode_real,
    decode_features,
    encode_bmp,
    encode_png,
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


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
def test_png_roundtrip_all_filters(filter_type):
    # every PNG scanline filter decodes back to the exact source image
    for h, w in [(5, 7), (8, 8), (3, 10), (1, 1)]:
        img = _gray(h, w, seed=filter_type)
        decoded = _decode_png(encode_png(img, filter_type=filter_type))
        assert decoded.shape == (1, h, w)
        assert (decoded[0] == img).all()


def test_png_rgb_and_rgba_luma():
    # hand-build RGB / RGBA PNGs (filter 0) and check the BT.601 luma path
    import struct
    import zlib

    from csd363_sin_spark.functions.multimodal import _PNG_SIG

    h, w = 4, 5
    rgb = np.dstack([_gray(h, w, s) for s in (1, 2, 3)])
    expect = (
        299 * rgb[..., 0].astype(np.int32)
        + 587 * rgb[..., 1].astype(np.int32)
        + 114 * rgb[..., 2].astype(np.int32)
    ) // 1000

    def build(color_type, pixels):
        raw = b"".join(b"\x00" + pixels[y].tobytes() for y in range(h))

        def chunk(ctype, data):
            body = ctype + data
            return (
                struct.pack(">I", len(data))
                + body
                + struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF)
            )

        ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
        return (
            _PNG_SIG
            + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw))
            + chunk(b"IEND", b"")
        )

    got_rgb = _decode_png(build(2, rgb))
    assert (got_rgb[0] == expect.astype(np.uint8)).all()
    rgba = np.dstack([rgb, np.full((h, w), 200, dtype=np.uint8)])
    got_rgba = _decode_png(build(6, rgba))
    assert (got_rgba[0] == expect.astype(np.uint8)).all()


def test_png_unsupported_variants_raise():
    img = _gray(4, 4)
    payload = bytearray(encode_png(img))
    # flip IHDR bit depth (offset: 8 sig + 8 chunk hdr + 8 dims = 24)
    payload[24] = 16
    with pytest.raises(NotImplementedError, match="PIL"):
        _decode_png(bytes(payload))
    payload = bytearray(encode_png(img))
    payload[28] = 1  # interlace byte
    with pytest.raises(NotImplementedError, match="PIL"):
        _decode_png(bytes(payload))


def test_real_decode_rejects_unknown_format():
    # GIF (and video containers) remain honest stubs; BMP/PPM/PNG/JPEG
    # all decode natively now
    with pytest.raises(NotImplementedError, match="pyav"):
        _decode_real(b"GIF89a fake gif")


def test_decode_features_real_e2e(spark):
    rows = []
    imgs = {}
    for i in range(12):
        h, w = 4 + i % 3, 5 + i % 4
        img = _gray(h, w, seed=i)
        imgs[i] = img
        enc = encode_bmp if i % 2 == 0 else encode_png
        rows.append((i, "image", bytearray(enc(img)), w, h, 0, 1))
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
