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


def test_wav_roundtrip_and_features():
    from csd363_sin_spark.functions.multimodal import _decode_wav, encode_wav

    n, rate = 800, 8000
    t = np.arange(n) / rate
    sig = 0.5 * np.sin(2 * np.pi * 440.0 * t)
    x, r = _decode_wav(encode_wav(sig, rate))
    assert r == rate and len(x) == n
    assert np.abs(x - sig).max() < 1e-3  # 16-bit quantization bound

    # stereo mixdown: L == -R must cancel to (near) silence
    import struct as _s

    stereo = np.zeros(2 * n, dtype=np.int16)
    stereo[0::2] = (sig * 32000).astype(np.int16)
    stereo[1::2] = -(sig * 32000).astype(np.int16)
    data = stereo.tobytes()
    fmt = _s.pack("<HHIIHH", 1, 2, rate, rate * 4, 4, 16)
    body = (b"WAVE" + b"fmt " + _s.pack("<I", len(fmt)) + fmt
            + b"data" + _s.pack("<I", len(data)) + data)
    x2, _ = _decode_wav(b"RIFF" + _s.pack("<I", len(body)) + body)
    assert np.abs(x2).max() < 1e-3


def test_audio_features_real_e2e(spark):
    from csd363_sin_spark.functions.multimodal import audio_features, encode_wav

    rate = 8000
    rows = []
    tones = {}
    for i, freq in enumerate([200.0, 440.0, 1000.0]):
        t = np.arange(2000) / rate
        sig = 0.5 * np.sin(2 * np.pi * freq * t)
        tones[i] = freq
        rows.append((i, "audio", bytearray(encode_wav(sig, rate)), 0, 0, rate, 0))
    media = spark.createDataFrame(
        rows,
        "media_id long, kind string, payload binary, width int, "
        "height int, sample_rate int, n_frames int",
    )
    feats = {r["media_id"]: r for r in audio_features(media, decoder="real").collect()}
    assert set(feats) == set(tones)
    for i, freq in tones.items():
        assert feats[i]["sample_rate"] == rate
        assert feats[i]["rms"] == pytest.approx(0.5 / np.sqrt(2), rel=1e-2)
        # a pure tone's spectral centroid sits near the tone frequency
        assert feats[i]["spectral_centroid_hz"] == pytest.approx(freq, rel=0.1)
        # zero crossings of a sine = 2 * freq per second
        assert feats[i]["zero_cross_rate"] == pytest.approx(
            2 * freq / rate, rel=0.05
        )


def test_wav_unsupported_raises():
    from csd363_sin_spark.functions.multimodal import _decode_wav

    with pytest.raises(ValueError, match="not a WAV"):
        _decode_wav(b"RIFFxxxxAVI ")
    # 24-bit PCM: honest stub
    import struct as _s

    fmt = _s.pack("<HHIIHH", 1, 1, 8000, 24000, 3, 24)
    body = (b"WAVE" + b"fmt " + _s.pack("<I", len(fmt)) + fmt
            + b"data" + _s.pack("<I", 0))
    with pytest.raises(NotImplementedError):
        _decode_wav(b"RIFF" + _s.pack("<I", len(body)) + body)


def test_perceptual_hash_and_near_dups(spark):
    """aHash on REAL decoded bytes: a BMP and the PNG re-encode of the
    same pixels hash identically; a uniformly brightened copy stays
    within a few bits; unrelated images are far; the banded near-dup
    join finds exactly the planted pairs."""
    from csd363_sin_spark.functions.multimodal import (
        perceptual_hash,
        perceptual_near_dups,
    )

    base = _gray(32, 32, seed=3)
    bright = np.clip(base.astype(np.int64) + 12, 0, 255).astype(np.uint8)
    other = _gray(32, 32, seed=911)[::-1].T.copy()
    rows = [
        (1, "image", bytearray(encode_bmp(base))),
        (2, "image", bytearray(encode_png(base))),      # re-encode of 1
        (3, "image", bytearray(encode_bmp(bright))),    # brightness shift
        (4, "image", bytearray(encode_bmp(other))),     # unrelated
    ]
    media = spark.createDataFrame(rows, "media_id long, kind string, payload binary")
    ph = {
        r["media_id"]: r["phash"]
        for r in perceptual_hash(media, decoder="real").collect()
    }
    assert ph[1] == ph[2]
    def ham(a, b):
        return bin((a ^ b) & (2**64 - 1)).count("1")

    assert ham(ph[1], ph[3]) <= 4  # uniform shift barely moves mean bits
    assert ham(ph[1], ph[4]) > 10
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in perceptual_near_dups(media, max_hamming=6, decoder="real").collect()
    }
    assert pairs[(1, 2)] == 0
    assert (1, 3) in pairs and (2, 3) in pairs
    assert not any(4 in p for p in pairs)
    # determinism across runs
    ph2 = {
        r["media_id"]: r["phash"]
        for r in perceptual_hash(media, decoder="real").collect()
    }
    assert ph == ph2
