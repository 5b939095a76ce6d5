"""Pure-Python MJPEG-in-AVI video codec (no pyav) for the real media path.

Motion-JPEG AVI is the one video container decodable from first
principles with what this package already has: the RIFF chunk grammar
is ~40 lines, and every ``00dc``/``00db`` frame chunk is a standalone
baseline JPEG handled by :mod:`csd363_sin_spark.functions.jpeg`.

* :func:`decode_avi_mjpeg` — parse the RIFF tree, pull the ``movi``
  frame chunks, decode each to luma -> ``(n_frames, h, w) uint8``.
  Non-MJPEG streams (anything whose frames are not JPEG bytes) raise
  ``NotImplementedError`` naming pyav — codecs with inter-frame state
  (H.264 etc.) are out of scope without a real decoder library.
* :func:`encode_avi_mjpeg` — minimal spec-conformant writer (avih +
  strl/strh/strf headers, ``movi`` list, idx1 index): the test-corpus
  generator.

This makes every media kind in the engine's schema decodable on real
bytes: BMP/PPM/PNG/JPEG images and MJPEG-AVI video.
"""

from __future__ import annotations

import struct

import numpy as np

from csd363_sin_spark.functions.jpeg import decode_jpeg, encode_jpeg


def _chunks(data: bytes, start: int, end: int):
    """Yield (fourcc, body_start, body_size) for RIFF chunks in a range."""
    pos = start
    while pos + 8 <= end:
        fourcc = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        yield fourcc, pos + 8, size
        pos += 8 + size + (size & 1)  # chunks are word-aligned


def decode_avi_mjpeg(payload: bytes) -> np.ndarray:
    """MJPEG AVI bytes -> (n_frames, h, w) uint8 luma frames."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not an AVI")
    frames: list[np.ndarray] = []

    def walk(start: int, end: int) -> None:
        for fourcc, body, size in _chunks(payload, start, end):
            if fourcc == b"LIST":
                walk(body + 4, body + size)  # skip the list-type fourcc
            elif fourcc[2:4] in (b"dc", b"db") and size > 0:
                frame = payload[body : body + size]
                if frame[:2] != b"\xff\xd8":
                    raise NotImplementedError(
                        "AVI stream is not MJPEG — other codecs need pyav"
                    )
                frames.append(decode_jpeg(frame)[0])

    walk(12, len(payload))
    if not frames:
        raise ValueError("AVI contains no video frames")
    h, w = frames[0].shape
    if any(f.shape != (h, w) for f in frames):
        raise ValueError("AVI frames disagree on dimensions")
    return np.stack(frames)


def encode_avi_mjpeg(
    frames: np.ndarray, fps: int = 10, quality: int = 85
) -> bytes:
    """(n, h, w) uint8 grayscale frames -> MJPEG AVI bytes (test-corpus
    generator; round-trips through :func:`decode_avi_mjpeg`)."""
    n, h, w = frames.shape
    encoded = [encode_jpeg(frames[i], quality=quality) for i in range(n)]

    def chunk(fourcc: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) & 1 else b""
        return fourcc + struct.pack("<I", len(body)) + body + pad

    def lst(list_type: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", list_type + body)

    max_bytes = max(len(e) for e in encoded)
    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        1_000_000 // fps,  # microseconds per frame
        max_bytes * fps,  # max bytes per second
        0,  # padding granularity
        0x10,  # flags: AVIF_HASINDEX
        n,  # total frames
        0,  # initial frames
        1,  # streams
        max_bytes,  # suggested buffer size
        w,
        h,
        0, 0, 0, 0,  # reserved
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIIIhhhh",
        b"vids",
        b"MJPG",
        0, 0, 0, 0,  # flags (I), priority (H), language (H), initial frames (I)
        1,  # scale
        fps,  # rate
        0,  # start
        n,  # length
        max_bytes,  # suggested buffer size
        0xFFFFFFFF,  # quality (default)
        0,  # sample size (varies)
        0, 0,  # rcFrame left top
        w, h,  # rcFrame right bottom
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, w, h, 1, 24, b"MJPG", w * h * 3, 0, 0, 0, 0
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih)
        + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi_body = b"".join(chunk(b"00dc", e) for e in encoded)
    movi = lst(b"movi", movi_body)
    # idx1: one entry per frame (offset relative to movi list-type fourcc)
    idx_entries = []
    off = 4
    for e in encoded:
        idx_entries.append(struct.pack("<4sII I", b"00dc", 0x10, off, len(e)))
        off += 8 + len(e) + (len(e) & 1)
    idx1 = chunk(b"idx1", b"".join(idx_entries))
    riff_body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body
