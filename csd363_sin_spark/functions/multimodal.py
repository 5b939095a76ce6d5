"""Multimodal column handling (image/audio/video as opaque binary).

The engine treats media as ``binary`` payload columns with typed
metadata, processed through Arrow-batched ``mapInPandas`` kernels:

    media(media_id long, kind string, payload binary,
          width int, height int, sample_rate int, n_frames int)

Real media codecs (PIL/ffmpeg/torchaudio) are NOT in this container, so
the decode step is STUBBED behind ``decoder=`` hooks:

* ``decoder="fake"`` (default) — a deterministic parser of the engine's
  own synthetic payload format (see :func:`synth_media`): byte 0-3 magic,
  then little-endian dims, then raw bytes.  Everything downstream of the
  decode (batching, schema, partitioning, feature shapes) is REAL and
  tested.
* ``decoder="real"`` — decodes REAL image bytes with the pure-numpy
  parsers below: uncompressed 24-bit BMP (BITMAPINFOHEADER) and binary
  PPM (P6), converted to grayscale.  JPEG/PNG/video payloads raise
  NotImplementedError naming the dependency (PIL / pyav) — those two
  codecs are the only remaining stubs; swap in a decode(payload)->ndarray
  with the same contract on a cluster image that has the libs.

Kernels are ``mapInPandas`` (Arrow batches, vectorized numpy per batch)
— never per-row Python.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, "
    "width int, height int, sample_rate int, n_frames int"
)

_MAGIC = b"SYN0"


def synth_media(spark: SparkSession, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table: payload = magic + dims + bytes
    derived from a seeded counter (no RNG state; reproducible)."""
    rows = []
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        w, h = 4 + (i % 5), 3 + (i % 4)
        frames = 1 if kind == "image" else 2 + (i % 3)
        body_len = w * h * frames
        body = bytes(((i * 131 + j * 17 + seed) % 256) for j in range(body_len))
        payload = _MAGIC + struct.pack("<HHH", w, h, frames) + body
        rows.append(
            (
                i,
                kind,
                bytearray(payload),
                w,
                h,
                16000 if kind == "audio" else 0,
                frames,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _decode_fake(payload: bytes) -> np.ndarray:
    if payload[:4] != _MAGIC:
        raise ValueError("bad magic")
    w, h, frames = struct.unpack("<HHH", payload[4:10])
    arr = np.frombuffer(payload[10 : 10 + w * h * frames], dtype=np.uint8)
    return arr.reshape(frames, h, w)


def _decode_bmp(payload: bytes) -> np.ndarray:
    """Uncompressed 24-bit BMP (BITMAPINFOHEADER) -> (1, h, w) uint8
    grayscale (integer BT.601 luma).  Pure numpy — no PIL."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP")
    pix_off = struct.unpack("<I", payload[10:14])[0]
    hdr_sz = struct.unpack("<I", payload[14:18])[0]
    if hdr_sz < 40:
        raise NotImplementedError("BITMAPCOREHEADER BMP needs PIL")
    w, h = struct.unpack("<ii", payload[18:26])
    planes, bpp = struct.unpack("<HH", payload[26:30])
    compression = struct.unpack("<I", payload[30:34])[0]
    if bpp != 24 or compression != 0:
        raise NotImplementedError(
            f"only uncompressed 24-bit BMP is decodable without PIL "
            f"(got bpp={bpp}, compression={compression})"
        )
    top_down = h < 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3  # rows padded to 4 bytes
    data = np.frombuffer(payload, dtype=np.uint8, count=stride * h, offset=pix_off)
    rows = data.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if not top_down:
        rows = rows[::-1]
    b, g, r = (rows[..., i].astype(np.int32) for i in range(3))
    gray = ((299 * r + 587 * g + 114 * b) // 1000).astype(np.uint8)
    return gray.reshape(1, h, w)


def _decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6, maxval <= 255) -> (1, h, w) uint8 grayscale."""
    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM")
    # header: magic, width, height, maxval as whitespace-separated tokens
    # (# comments allowed), then ONE whitespace byte, then raw RGB
    pos, tokens = 2, []
    while len(tokens) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        tokens.append(int(payload[start:pos]))
    pos += 1  # the single whitespace after maxval
    w, h, maxval = tokens
    if maxval > 255:
        raise NotImplementedError("16-bit PPM needs PIL")
    rgb = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=pos)
    rgb = rgb.reshape(h, w, 3).astype(np.int32)
    gray = (
        (299 * rgb[..., 0] + 587 * rgb[..., 1] + 114 * rgb[..., 2]) // 1000
    ).astype(np.uint8)
    return gray.reshape(1, h, w)


def _decode_real(payload: bytes) -> np.ndarray:
    """Real-bytes decode: BMP and PPM natively; other formats honestly
    raise with the dependency a cluster image would add."""
    if payload[:2] == b"BM":
        return _decode_bmp(payload)
    if payload[:2] == b"P6":
        return _decode_ppm(payload)
    raise NotImplementedError(
        "payload is not BMP/PPM — JPEG/PNG need PIL, video needs pyav"
    )


def encode_bmp(gray: np.ndarray) -> bytes:
    """(h, w) uint8 grayscale -> uncompressed 24-bit BMP bytes (test
    corpus generator; round-trips through :func:`_decode_bmp`)."""
    h, w = gray.shape
    stride = (w * 3 + 3) & ~3
    img = np.zeros((h, stride), dtype=np.uint8)
    rgb = np.repeat(gray[::-1, :, None], 3, axis=2)  # bottom-up, B=G=R
    img[:, : w * 3] = rgb.reshape(h, w * 3)
    body = img.tobytes()
    header = (
        b"BM"
        + struct.pack("<IHHI", 54 + len(body), 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    )
    return header + body


def _pick_decoder(decoder: str):
    if decoder == "fake":
        return _decode_fake
    if decoder == "real":
        return _decode_real
    raise ValueError(f"unknown decoder {decoder!r}")


def decode_features(
    media: DataFrame, decoder: str = "fake", batch_hint: int = 64
) -> DataFrame:
    """Decode payloads and emit per-item features:
    (media_id, kind, n_frames, mean_intensity, std_intensity, histogram8).

    The Arrow plumbing (schema, batch shape, partition preservation) is
    the real deliverable; the fake decoder stands in for PIL/av.
    """
    decode = _pick_decoder(decoder)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "media_id": [],
                "kind": [],
                "n_frames": [],
                "mean_intensity": [],
                "std_intensity": [],
                "histogram8": [],
            }
            for mid, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                arr = decode(bytes(payload))
                out["media_id"].append(mid)
                out["kind"].append(kind)
                out["n_frames"].append(arr.shape[0])
                out["mean_intensity"].append(float(arr.mean()))
                out["std_intensity"].append(float(arr.std()))
                hist, _ = np.histogram(arr, bins=8, range=(0, 256))
                out["histogram8"].append(hist.astype("int64").tolist())
            yield pd.DataFrame(out)

    return media.mapInPandas(
        kernel,
        "media_id long, kind string, n_frames int, mean_intensity double, "
        "std_intensity double, histogram8 array<long>",
    )


def resize_images(media: DataFrame, out_w: int, out_h: int, decoder: str = "fake") -> DataFrame:
    """Nearest-neighbor resize of image payloads -> new payload column.
    Same stub policy as :func:`decode_features`."""
    decode = _pick_decoder(decoder)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, payloads = [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                arr = decode(bytes(payload))[0]  # first frame
                h, w = arr.shape
                ys = (np.arange(out_h) * h // out_h).clip(0, h - 1)
                xs = (np.arange(out_w) * w // out_w).clip(0, w - 1)
                resized = arr[np.ix_(ys, xs)]
                new_payload = (
                    _MAGIC + struct.pack("<HHH", out_w, out_h, 1) + resized.tobytes()
                )
                ids.append(mid)
                payloads.append(bytearray(new_payload))
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    return media.filter(F.col("kind") == "image").mapInPandas(
        kernel, "media_id long, payload binary"
    )


def sample_frames(media: DataFrame, every_k: int = 2, decoder: str = "fake") -> DataFrame:
    """Frame sampling for video payloads: one output row per kept frame
    (media_id, frame_idx, frame_mean)."""
    if decoder == "real":
        raise NotImplementedError("real frame sampling requires pyav")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            mids, idxs, means = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                arr = _decode_fake(bytes(payload))
                for fi in range(0, arr.shape[0], every_k):
                    mids.append(mid)
                    idxs.append(fi)
                    means.append(float(arr[fi].mean()))
            yield pd.DataFrame(
                {"media_id": mids, "frame_idx": idxs, "frame_mean": means}
            )

    return media.filter(F.col("kind") == "video").mapInPandas(
        kernel, "media_id long, frame_idx int, frame_mean double"
    )
