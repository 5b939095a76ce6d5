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


def test_progressive_invalid_scan_band_rejected():
    """A baseline stream relabelled SOF2 carries an Ss=0/Se=63 scan —
    illegal in progressive mode (T.81 G.1: DC scans have Se=0) — and
    must fail loudly instead of mis-decoding."""
    img = _gray(8, 8)
    payload = bytearray(encode_jpeg(img))
    idx = payload.find(b"\xff\xc0")
    payload[idx + 1] = 0xC2  # rewrite SOF0 -> SOF2 (progressive)
    with pytest.raises(ValueError, match="progressive scan band"):
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


def test_progressive_equals_baseline_pixels():
    """Progressive (SOF2) decode must reproduce the baseline decode
    EXACTLY: encode_jpeg_progressive quantizes the same coefficients as
    encode_jpeg, and a completed progressive decode reconstructs them
    losslessly (DC first+refine, AC first+refine over two bands)."""
    import numpy as np

    from csd363_sin_spark.functions.jpeg import encode_jpeg_progressive

    rng = np.random.RandomState(42)
    images = [
        rng.randint(0, 256, (24, 31)).astype(np.uint8),
        (np.add.outer(np.arange(40), np.arange(40)) * 3 % 256).astype(np.uint8),
        np.full((16, 16), 200, np.uint8),  # all-AC-zero: EOB runs > 1
        (np.add.outer(np.arange(9), np.arange(13)) % 2 * 255).astype(np.uint8),
    ]
    for img in images:
        for q in (50, 85, 95):
            base = decode_jpeg(encode_jpeg(img, quality=q))
            prog = decode_jpeg(encode_jpeg_progressive(img, quality=q))
            assert np.array_equal(base, prog), (img.shape, q)


def test_progressive_scan_codecs_roundtrip_crafted():
    """Scan-codec level roundtrip on crafted coefficient blocks that
    force the rare paths: ZRL inside a refinement scan (>=16
    zero-history positions before a newly-significant coefficient),
    long EOB runs with deferred correction bits, and ZRL in AC-first."""
    import numpy as np

    from csd363_sin_spark.functions.jpeg import (
        AC_PROG_BITS,
        AC_PROG_VALS,
        _BitReader,
        _build_huffman,
        _decode_ac_first,
        _decode_ac_refine,
        _encode_ac_first,
        _encode_ac_refine,
        _encode_huffman,
    )

    enc_tab = _encode_huffman(AC_PROG_BITS, AC_PROG_VALS)
    dec_tab = _build_huffman(AC_PROG_BITS, AC_PROG_VALS)
    rng = np.random.RandomState(7)

    blocks = []
    # crafted: refine-ZRL (zz[20] = -1 newly significant behind 19 zeros)
    b = np.zeros(64, dtype=np.int64); b[20] = -1; b[40] = 1
    blocks.append(b)
    # crafted: correction bits inside an EOB run (|v|>1 then nothing new)
    b = np.zeros(64, dtype=np.int64); b[2] = 5; b[3] = -7
    blocks.append(b)
    # crafted: AC-first ZRL (big value behind >16 zeros at Al=1)
    b = np.zeros(64, dtype=np.int64); b[30] = 9
    blocks.append(b)
    # a run of all-zero blocks (EOB run crossing blocks)
    blocks += [np.zeros(64, dtype=np.int64) for _ in range(5)]
    # randomized small-magnitude blocks (many +-1s => dense refine work)
    for _ in range(12):
        b = rng.randint(-3, 4, 64).astype(np.int64)
        b[rng.rand(64) < 0.6] = 0
        blocks.append(b)

    ss, se, al = 1, 63, 1
    first = _encode_ac_first(blocks, ss, se, al, enc_tab)
    refine = _encode_ac_refine(blocks, ss, se, 0, enc_tab)

    got = [np.zeros(64, dtype=np.int64) for _ in blocks]
    reader = _BitReader(first + b"\xff\xd9", 0)
    eobrun = 0
    for zz in got:
        eobrun = _decode_ac_first(reader, zz, dec_tab, ss, se, al, eobrun)
    # after the first scan every coefficient equals (|v|>>1 with sign)<<1
    for zz, want in zip(got, blocks):
        for k in range(ss, se + 1):
            v = int(want[k])
            expect = ((abs(v) >> al) << al) * (1 if v >= 0 else -1)
            assert int(zz[k]) == expect
    reader = _BitReader(refine + b"\xff\xd9", 0)
    eobrun = 0
    for zz in got:
        eobrun = _decode_ac_refine(reader, zz, dec_tab, ss, se, 0, eobrun)
    for zz, want in zip(got, blocks):
        assert np.array_equal(zz[ss : se + 1], want[ss : se + 1])


def test_progressive_multicomponent_raises():
    import pytest as _pytest

    # a color (3-component) SOF2 header must raise the documented
    # PIL-naming boundary, not mis-decode
    import struct

    payload = bytearray(b"\xff\xd8")
    sof2 = struct.pack(">BHHB", 8, 16, 16, 3) + bytes(
        [1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1]
    )
    payload += struct.pack(">HH", 0xFFC2, len(sof2) + 2) + sof2
    with _pytest.raises(NotImplementedError):
        decode_jpeg(bytes(payload))
