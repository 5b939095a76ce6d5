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
* ``decoder="real"`` — raises NotImplementedError with the dependency it
  would use; swap in a PIL/av-backed function with the same signature on
  a cluster image that has the libs.

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


def decode_features(
    media: DataFrame, decoder: str = "fake", batch_hint: int = 64
) -> DataFrame:
    """Decode payloads and emit per-item features:
    (media_id, kind, n_frames, mean_intensity, std_intensity, histogram8).

    The Arrow plumbing (schema, batch shape, partition preservation) is
    the real deliverable; the fake decoder stands in for PIL/av.
    """
    if decoder == "real":
        raise NotImplementedError(
            "real decode requires PIL / pyav / torchaudio — not available "
            "in this container; plug a decode(payload)->ndarray with the "
            "same contract"
        )

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
                arr = _decode_fake(bytes(payload))
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
    if decoder == "real":
        raise NotImplementedError("real resize requires PIL — see decode_features")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, payloads = [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                arr = _decode_fake(bytes(payload))[0]  # first frame
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
