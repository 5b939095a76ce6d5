"""Pure-Python baseline JPEG codec (no PIL) for the multimodal real path.

Scope — honest and tested:

* :func:`decode_jpeg` — baseline sequential DCT JPEG (SOF0), 8-bit,
  grayscale or YCbCr with arbitrary sampling factors (4:4:4, 4:2:0,
  4:2:2, ...), standard or custom DQT/DHT tables, DRI/RSTn restart
  markers; PLUS single-component progressive DCT (SOF2) with full
  spectral selection + successive approximation (DC first/refine, AC
  first/refine, EOB runs — T.81 Annex G, mirroring libjpeg's
  jdphuff.c scan semantics).  Returns the LUMA plane as ``(1, h, w)
  uint8`` — JPEG's Y channel IS BT.601 luma, so grayscale conversion
  is exact and the chroma blocks only need to be entropy-decoded to
  keep the bitstream in sync.  Multi-component progressive,
  arithmetic coding, and 12-bit raise ``NotImplementedError`` naming
  PIL.
* :func:`encode_jpeg` — baseline grayscale encoder (Annex K quant +
  Huffman tables, IJG quality scaling).  Test-corpus generator: its
  output is spec-conformant (standard tables, standard markers) and
  round-trips through :func:`decode_jpeg` within the quantization
  error bound asserted in tests/test_jpeg.py.
* :func:`encode_jpeg_progressive` — progressive grayscale encoder
  (libjpeg-shaped scan script: DC first, two AC first bands, DC
  refinement, two AC refinement bands).  Its quantized coefficients
  are identical to :func:`encode_jpeg`'s at the same quality, so
  tests pin progressive-decode pixels EQUAL to baseline-decode
  pixels.

Everything is numpy + stdlib; the per-bit Huffman loops are Python
(fine for the corpus sizes the engine's Arrow kernels batch per task;
a cluster image with PIL/libjpeg-turbo swaps in via the same
``decode(payload)->ndarray`` contract in functions/multimodal.py).
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# shared tables
# ---------------------------------------------------------------------------

ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# ITU-T T.81 Annex K.1 luminance quantization table (zigzag-natural order)
QUANT_LUM = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
)

# Annex K.3 typical Huffman tables: (bits[1..16], values)
DC_LUM_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUM_VALS = list(range(12))
AC_LUM_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUM_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

# 8x8 DCT-II basis matrix: dct2(b) = C @ b @ C.T ; idct2(c) = C.T @ c @ C
_C = np.zeros((8, 8))
for _k in range(8):
    _a = np.sqrt(0.125) if _k == 0 else 0.5
    for _n in range(8):
        _C[_k, _n] = _a * np.cos((2 * _n + 1) * _k * np.pi / 16.0)


def _build_huffman(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(code_length, code) -> symbol, per T.81 C.2 canonical assignment."""
    table = {}
    code = 0
    i = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[i]
            i += 1
            code += 1
        code <<= 1
    return table


def _encode_huffman(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code_length, code) — the encoder-side inverse."""
    return {v: k for k, v in _build_huffman(bits, vals).items()}


def _quality_scale(table: np.ndarray, quality: int) -> np.ndarray:
    quality = min(100, max(1, int(quality)))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((table * scale + 50) // 100, 1, 255).astype(np.int64)


# ---------------------------------------------------------------------------
# encoder (grayscale baseline)
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, length: int) -> None:
        if length == 0:
            return
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)

    def _pad(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits per spec

    def restart(self, n: int) -> None:
        """Byte-align and emit RSTn (markers are NOT stuffed)."""
        self._pad()
        self.out += bytes([0xFF, 0xD0 + (n & 7)])

    def flush(self) -> bytes:
        self._pad()
        return bytes(self.out)


def _magnitude(v: int) -> tuple[int, int]:
    """JPEG category coding: value -> (size, size-bit code)."""
    if v == 0:
        return 0, 0
    size = int(abs(v)).bit_length()
    code = v if v > 0 else v + (1 << size) - 1
    return size, code


def _encode_block(
    writer: _BitWriter,
    block: np.ndarray,
    qmat: np.ndarray,
    dc_tab: dict,
    ac_tab: dict,
    prev_dc: int,
) -> int:
    """DCT + quantize + entropy-code one 8x8 block; returns its DC."""
    coef = _C @ block @ _C.T
    q = np.round(coef / qmat).astype(np.int64)
    zz = q.reshape(64)[ZIGZAG]
    size, code = _magnitude(int(zz[0]) - prev_dc)
    length, hcode = dc_tab[size]
    writer.write(hcode, length)
    writer.write(code, size)
    run = 0
    nz = np.nonzero(zz[1:])[0]
    last = nz[-1] + 1 if len(nz) else 0
    for k in range(1, last + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            length, hcode = ac_tab[0xF0]  # ZRL
            writer.write(hcode, length)
            run -= 16
        size, code = _magnitude(v)
        length, hcode = ac_tab[(run << 4) | size]
        writer.write(hcode, length)
        writer.write(code, size)
        run = 0
    if last < 63:
        length, hcode = ac_tab[0x00]  # EOB
        writer.write(hcode, length)
    return int(zz[0])


def _seg(marker: int, payload: bytes) -> bytes:
    return struct.pack(">HH", marker, len(payload) + 2) + payload


def _pad_to_mcu(plane: np.ndarray, mh: int, mw: int) -> np.ndarray:
    h, w = plane.shape
    ph = -(-h // mh) * mh
    pw = -(-w // mw) * mw
    return np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")


def encode_jpeg(
    gray: np.ndarray, quality: int = 85, restart_interval: int = 0
) -> bytes:
    """(h, w) uint8 grayscale -> baseline JFIF bytes (standard Annex K
    quantization + Huffman tables, single component, 1x1 sampling).
    ``restart_interval`` > 0 emits a DRI segment and RSTn markers every
    that many MCUs (exercises the decoder's restart handling)."""
    h, w = gray.shape
    quant = _quality_scale(QUANT_LUM, quality)
    qmat = quant.reshape(8, 8).astype(np.float64)
    dc_tab = _encode_huffman(DC_LUM_BITS, DC_LUM_VALS)
    ac_tab = _encode_huffman(AC_LUM_BITS, AC_LUM_VALS)

    img = _pad_to_mcu(gray.astype(np.float64), 8, 8) - 128.0
    ph, pw = img.shape

    writer = _BitWriter()
    prev_dc = 0
    mcu = 0
    rst = 0
    for by in range(0, ph, 8):
        for bx in range(0, pw, 8):
            if restart_interval and mcu and mcu % restart_interval == 0:
                writer.restart(rst)
                rst = (rst + 1) & 7
                prev_dc = 0
            mcu += 1
            prev_dc = _encode_block(
                writer, img[by : by + 8, bx : bx + 8], qmat, dc_tab, ac_tab, prev_dc
            )
    scan = writer.flush()

    out = bytearray(b"\xff\xd8")  # SOI
    out += _seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xFFDB, b"\x00" + bytes(int(quant[z]) for z in ZIGZAG))
    if restart_interval:
        out += _seg(0xFFDD, struct.pack(">H", restart_interval))
    out += _seg(0xFFC0, struct.pack(">BHHB", 8, h, w, 1) + b"\x01\x11\x00")
    out += _seg(0xFFC4, b"\x00" + bytes(DC_LUM_BITS) + bytes(DC_LUM_VALS))
    out += _seg(0xFFC4, b"\x10" + bytes(AC_LUM_BITS) + bytes(AC_LUM_VALS))
    out += _seg(0xFFDA, b"\x01\x01\x00\x00\x3f\x00")
    out += scan
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# Annex K.2 chrominance quantization table (natural order)
QUANT_CHROM = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
)


def encode_jpeg_color(
    rgb: np.ndarray, quality: int = 85, subsampling: tuple[int, int] = (2, 2)
) -> bytes:
    """(h, w, 3) uint8 RGB -> baseline YCbCr JFIF bytes.

    ``subsampling`` is the luma (horizontal, vertical) sampling factor:
    (1, 1) = 4:4:4, (2, 2) = 4:2:0, (2, 1) = 4:2:2.  Chroma reuses the
    luminance Huffman tables (spec-legal; keeps the codec small) with
    its own Annex K.2 quant table — so the decoder's multi-table DQT,
    multi-component MCU interleave, and chroma-subsampled paths are all
    exercised."""
    h, w, _ = rgb.shape
    sh_, sv = subsampling
    r, g, b = (rgb[..., i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b

    y_p = _pad_to_mcu(y, 8 * sv, 8 * sh_) - 128.0
    ph, pw = y_p.shape
    # box-average chroma down by (sv, sh_)
    def sub(plane: np.ndarray) -> np.ndarray:
        p = _pad_to_mcu(plane, sv, sh_)
        hh, ww = p.shape
        return (
            p.reshape(hh // sv, sv, ww // sh_, sh_).mean(axis=(1, 3))
        )

    cb_p = _pad_to_mcu(sub(cb), 8, 8) - 128.0
    cr_p = _pad_to_mcu(sub(cr), 8, 8) - 128.0
    # chroma planes must cover the luma MCU grid
    cb_p = _pad_to_mcu(cb_p, ph // sv, pw // sh_)
    cr_p = _pad_to_mcu(cr_p, ph // sv, pw // sh_)

    q_lum = _quality_scale(QUANT_LUM, quality)
    q_chr = _quality_scale(QUANT_CHROM, quality)
    qm_lum = q_lum.reshape(8, 8).astype(np.float64)
    qm_chr = q_chr.reshape(8, 8).astype(np.float64)
    dc_tab = _encode_huffman(DC_LUM_BITS, DC_LUM_VALS)
    ac_tab = _encode_huffman(AC_LUM_BITS, AC_LUM_VALS)

    writer = _BitWriter()
    pred = [0, 0, 0]
    mcus_y, mcus_x = ph // (8 * sv), pw // (8 * sh_)
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for by in range(sv):
                for bx in range(sh_):
                    y0 = (my * sv + by) * 8
                    x0 = (mx * sh_ + bx) * 8
                    pred[0] = _encode_block(
                        writer, y_p[y0 : y0 + 8, x0 : x0 + 8], qm_lum,
                        dc_tab, ac_tab, pred[0],
                    )
            for ci, plane in ((1, cb_p), (2, cr_p)):
                y0, x0 = my * 8, mx * 8
                pred[ci] = _encode_block(
                    writer, plane[y0 : y0 + 8, x0 : x0 + 8], qm_chr,
                    dc_tab, ac_tab, pred[ci],
                )
    scan = writer.flush()

    out = bytearray(b"\xff\xd8")
    out += _seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xFFDB, b"\x00" + bytes(int(q_lum[z]) for z in ZIGZAG))
    out += _seg(0xFFDB, b"\x01" + bytes(int(q_chr[z]) for z in ZIGZAG))
    samp = (sh_ << 4) | sv
    out += _seg(
        0xFFC0,
        struct.pack(">BHHB", 8, h, w, 3)
        + bytes([1, samp, 0, 2, 0x11, 1, 3, 0x11, 1]),
    )
    out += _seg(0xFFC4, b"\x00" + bytes(DC_LUM_BITS) + bytes(DC_LUM_VALS))
    out += _seg(0xFFC4, b"\x10" + bytes(AC_LUM_BITS) + bytes(AC_LUM_VALS))
    out += _seg(0xFFDA, b"\x03" + bytes([1, 0, 2, 0, 3, 0]) + b"\x00\x3f\x00")
    out += scan
    out += b"\xff\xd9"
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder (baseline, luma output)
# ---------------------------------------------------------------------------


class _BitReader:
    """Entropy-segment bit reader: un-stuffs 0xFF00, stops at markers."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:
                raise _RestartMarker(nxt)
            else:
                raise EOFError("marker in entropy data")
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def sync_to_restart(self) -> None:
        """Skip to just past the next RSTn marker, resetting bit state."""
        self.acc = 0
        self.nbits = 0
        d = self.data
        while not (d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7):
            self.pos += 1
        self.pos += 2


class _RestartMarker(Exception):
    def __init__(self, marker: int) -> None:
        self.marker = marker


def _read_symbol(reader: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code")


def _extend(v: int, size: int) -> int:
    return v if size == 0 or v >= (1 << (size - 1)) else v - (1 << size) + 1


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JPEG -> (1, h, w) uint8 luma.  See module docstring."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    pos = 2
    quant: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None
    restart_interval = 0
    while pos < len(payload):
        if payload[pos] != 0xFF:
            pos += 1
            continue
        marker = payload[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack(">H", payload[pos : pos + 2])
        body = payload[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            b = 0
            while b < len(body):
                prec, tid = body[b] >> 4, body[b] & 0x0F
                if prec != 0:
                    raise NotImplementedError("16-bit quant tables need PIL")
                tab = np.zeros(64, dtype=np.int64)
                tab[ZIGZAG] = np.frombuffer(body[b + 1 : b + 65], dtype=np.uint8)
                quant[tid] = tab
                b += 65
        elif marker == 0xC4:  # DHT (possibly several tables)
            b = 0
            while b < len(body):
                cls, tid = body[b] >> 4, body[b] & 0x0F
                bits = list(body[b + 1 : b + 17])
                n = sum(bits)
                vals = list(body[b + 17 : b + 17 + n])
                (huff_dc if cls == 0 else huff_ac)[tid] = _build_huffman(bits, vals)
                b += 17 + n
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 progressive
            prec, fh, fw, ncomp = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise NotImplementedError(f"{prec}-bit JPEG needs PIL")
            comps = []
            for c in range(ncomp):
                cid, samp, tq = body[6 + 3 * c : 9 + 3 * c]
                comps.append(
                    {"id": cid, "h": samp >> 4, "v": samp & 0x0F, "tq": tq}
                )
            frame = {"h": fh, "w": fw, "comps": comps,
                     "progressive": marker == 0xC2}
            if frame["progressive"]:
                if ncomp != 1:
                    raise NotImplementedError(
                        "multi-component progressive JPEG needs PIL "
                        "(single-component/grayscale SOF2 decodes here)"
                    )
                n_blocks = (-(-fh // 8)) * (-(-fw // 8))
                prog_coefs = np.zeros((n_blocks, 64), dtype=np.int64)
                prog_pred = [0]
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "only DCT JPEG (SOF0/1 baseline, single-component SOF2 "
                "progressive) decodes without PIL"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = body[0]
            scan_sel = {}
            for c in range(ns):
                cid, tabs = body[1 + 2 * c], body[2 + 2 * c]
                scan_sel[cid] = (tabs >> 4, tabs & 0x0F)
            data_start = pos + seglen
            if frame["progressive"]:
                ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
                ahal = body[3 + 2 * ns]
                # T.81 G.1: a progressive scan is either DC (Ss=Se=0) or
                # a pure-AC spectral band (0 < Ss <= Se <= 63)
                if not (
                    (ss == 0 and se == 0) or (0 < ss <= se <= 63)
                ):
                    raise ValueError(
                        f"invalid progressive scan band Ss={ss} Se={se}"
                    )
                pos = _decode_progressive_scan(
                    payload, data_start, prog_coefs, scan_sel,
                    huff_dc, huff_ac, ss, se, ahal >> 4, ahal & 0x0F,
                    prog_pred,
                )
                continue
            return _decode_scan(
                payload, data_start, frame, scan_sel, quant, huff_dc, huff_ac,
                restart_interval,
            )
        pos += seglen
    if frame is not None and frame.get("progressive"):
        return _idct_single_component(frame, prog_coefs, quant)
    raise ValueError("JPEG missing SOS scan")


def _decode_scan(
    data: bytes,
    start: int,
    frame: dict,
    scan_sel: dict,
    quant: dict,
    huff_dc: dict,
    huff_ac: dict,
    restart_interval: int,
) -> np.ndarray:
    comps = frame["comps"]
    fh, fw = frame["h"], frame["w"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = -(-fw // (8 * hmax))
    mcus_y = -(-fh // (8 * vmax))
    # decoded plane per component (MCU-padded)
    planes = [
        np.zeros((mcus_y * c["v"] * 8, mcus_x * c["h"] * 8), dtype=np.float64)
        for c in comps
    ]
    reader = _BitReader(data, start)
    pred = [0] * len(comps)
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                reader.sync_to_restart()
                pred = [0] * len(comps)
            mcu_count += 1
            for ci, comp in enumerate(comps):
                dc_tab_id, ac_tab_id = scan_sel[comp["id"]]
                dct = huff_dc[dc_tab_id]
                act = huff_ac[ac_tab_id]
                qtab = quant[comp["tq"]]
                for by in range(comp["v"]):
                    for bx in range(comp["h"]):
                        try:
                            zz = _decode_block(reader, dct, act, pred, ci)
                        except _RestartMarker:
                            # tolerate encoders emitting RST exactly here
                            reader.sync_to_restart()
                            pred = [0] * len(comps)
                            zz = _decode_block(reader, dct, act, pred, ci)
                        deq = np.zeros(64, dtype=np.float64)
                        # zz is zigzag-ordered; qtab is natural-ordered —
                        # align the quant step to each coefficient first
                        deq[ZIGZAG] = zz * qtab[ZIGZAG]
                        block = _C.T @ deq.reshape(8, 8) @ _C + 128.0
                        y0 = (my * comp["v"] + by) * 8
                        x0 = (mx * comp["h"] + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = block
    # JPEG Y channel IS the BT.601 luma; crop MCU padding to frame size.
    # Y is the first frame component by convention (single-component
    # grayscale trivially so).
    luma = planes[0]
    scale_y = vmax // comps[0]["v"]
    scale_x = hmax // comps[0]["h"]
    if scale_y > 1 or scale_x > 1:  # unusual: subsampled luma
        luma = np.kron(luma, np.ones((scale_y, scale_x)))
    out = np.clip(np.round(luma[:fh, :fw]), 0, 255).astype(np.uint8)
    return out.reshape(1, fh, fw)


def _decode_block(
    reader: _BitReader, dct: dict, act: dict, pred: list[int], ci: int
) -> np.ndarray:
    zz = np.zeros(64, dtype=np.int64)
    size = _read_symbol(reader, dct)
    diff = _extend(reader.read_bits(size), size) if size else 0
    pred[ci] += diff
    zz[0] = pred[ci]
    k = 1
    while k < 64:
        sym = _read_symbol(reader, act)
        if sym == 0x00:  # EOB
            break
        if sym == 0xF0:  # ZRL
            k += 16
            continue
        run, size = sym >> 4, sym & 0x0F
        k += run
        if k > 63:
            raise ValueError("AC run overflow")
        zz[k] = _extend(reader.read_bits(size), size)
        k += 1
    return zz


# ---------------------------------------------------------------------------
# progressive DCT (SOF2) — spectral selection + successive approximation
# ---------------------------------------------------------------------------

# Custom AC table for progressive scans: the Annex K sequential table has
# no EOBn symbols (r<<4 with 0 < r < 15), which progressive AC scans
# require for EOB runs.  A flat canonical table (all 176 meaningful
# RRRRSSSS symbols at 9 bits; Kraft sum 176/512 < 1, so the all-ones
# code stays unused as the spec requires) is valid for any conforming
# decoder — compression is not the point of the test-corpus encoder.
AC_PROG_VALS = [(r << 4) | s for r in range(16) for s in range(11)]
AC_PROG_BITS = [0, 0, 0, 0, 0, 0, 0, 0, len(AC_PROG_VALS), 0, 0, 0, 0, 0, 0, 0]


def _dct_blocks(gray: np.ndarray, qmat: np.ndarray) -> list[np.ndarray]:
    """Quantized zigzag coefficient vector per 8x8 block, raster order —
    the shared front half of both encoders."""
    img = _pad_to_mcu(gray.astype(np.float64), 8, 8) - 128.0
    ph, pw = img.shape
    blocks = []
    for by in range(0, ph, 8):
        for bx in range(0, pw, 8):
            coef = _C @ img[by : by + 8, bx : bx + 8] @ _C.T
            q = np.round(coef / qmat).astype(np.int64)
            blocks.append(q.reshape(64)[ZIGZAG])
    return blocks


def _emit_eobrun(writer: _BitWriter, ac_tab: dict, eobrun: int) -> int:
    """Emit a pending EOBn run (T.81 G.1.2.2: huffman symbol n<<4 where
    2^n <= run < 2^(n+1), then the low n bits of the run)."""
    if eobrun > 0:
        nbits = eobrun.bit_length() - 1
        length, hcode = ac_tab[nbits << 4]
        writer.write(hcode, length)
        if nbits:
            writer.write(eobrun, nbits)
    return 0


def _encode_ac_first(
    blocks: list[np.ndarray], ss: int, se: int, al: int, ac_tab: dict
) -> bytes:
    """AC first scan (Ah=0): magnitudes point-transformed by Al, zero
    runs + EOB runs across blocks (mirror of libjpeg jcphuff
    encode_mcu_AC_first)."""
    wtr = _BitWriter()
    eobrun = 0
    for zz in blocks:
        r = 0
        for k in range(ss, se + 1):
            v = int(zz[k])
            m = abs(v) >> al
            if m == 0:
                r += 1
                continue
            eobrun = _emit_eobrun(wtr, ac_tab, eobrun)
            while r > 15:
                length, hcode = ac_tab[0xF0]
                wtr.write(hcode, length)
                r -= 16
            size, code = _magnitude(m if v > 0 else -m)
            length, hcode = ac_tab[(r << 4) | size]
            wtr.write(hcode, length)
            wtr.write(code, size)
            r = 0
        if r > 0:
            eobrun += 1
            if eobrun == 0x7FFF:
                eobrun = _emit_eobrun(wtr, ac_tab, eobrun)
    _emit_eobrun(wtr, ac_tab, eobrun)
    return wtr.flush()


def _encode_ac_refine(
    blocks: list[np.ndarray], ss: int, se: int, al: int, ac_tab: dict
) -> bytes:
    """AC refinement scan (Ah=Al+1): one new bit of precision — newly
    significant coefficients as (run<<4)|1 + sign bit, correction bits
    for already-significant ones interleaved after each symbol, EOB runs
    carrying deferred correction bits (mirror of libjpeg jcphuff
    encode_mcu_AC_refine)."""
    wtr = _BitWriter()
    eobrun = 0
    pending: list[int] = []  # correction bits deferred inside an EOB run

    def flush_eobrun() -> None:
        nonlocal eobrun
        if eobrun > 0:
            nbits = eobrun.bit_length() - 1
            length, hcode = ac_tab[nbits << 4]
            wtr.write(hcode, length)
            if nbits:
                wtr.write(eobrun, nbits)
            eobrun = 0
            for b in pending:
                wtr.write(b, 1)
            pending.clear()

    for zz in blocks:
        absv = {k: abs(int(zz[k])) >> al for k in range(ss, se + 1)}
        eob = ss - 1  # position of the last NEWLY-significant coefficient
        for k in range(ss, se + 1):
            if absv[k] == 1:
                eob = k
        r = 0
        block_bits: list[int] = []  # correction bits since the last symbol
        for k in range(ss, se + 1):
            a = absv[k]
            if a == 0:
                r += 1
                continue
            while r > 15 and k <= eob:
                flush_eobrun()
                length, hcode = ac_tab[0xF0]
                wtr.write(hcode, length)
                r -= 16
                for b in block_bits:
                    wtr.write(b, 1)
                block_bits = []
            if a > 1:
                block_bits.append(a & 1)
                continue
            flush_eobrun()
            length, hcode = ac_tab[(r << 4) | 1]
            wtr.write(hcode, length)
            wtr.write(1 if int(zz[k]) > 0 else 0, 1)
            for b in block_bits:
                wtr.write(b, 1)
            block_bits = []
            r = 0
        if r > 0 or block_bits:
            eobrun += 1
            pending.extend(block_bits)
            if eobrun == 0x7FFF:
                flush_eobrun()
    flush_eobrun()
    return wtr.flush()


def encode_jpeg_progressive(gray: np.ndarray, quality: int = 85) -> bytes:
    """(h, w) uint8 grayscale -> progressive (SOF2) JFIF bytes.

    libjpeg-shaped scan script exercising every progressive scan type:
    DC first (Al=1) -> AC first bands 1-5 and 6-63 (Al=1) -> DC
    refinement (raw bits) -> AC refinement over both bands.  The
    quantized coefficients are identical to :func:`encode_jpeg` at the
    same quality, so a full progressive decode must reproduce the
    baseline decode EXACTLY — the parity pin tests/test_jpeg.py uses."""
    h, w = gray.shape
    quant = _quality_scale(QUANT_LUM, quality)
    qmat = quant.reshape(8, 8).astype(np.float64)
    blocks = _dct_blocks(gray, qmat)
    dc_tab = _encode_huffman(DC_LUM_BITS, DC_LUM_VALS)
    ac_tab = _encode_huffman(AC_PROG_BITS, AC_PROG_VALS)

    scans: list[tuple[int, int, int, int, bytes]] = []
    # DC first (point transform Al=1; DC uses the ARITHMETIC shift,
    # T.81 G.1.2.1 — python's >> on ints is arithmetic)
    wtr = _BitWriter()
    prev = 0
    for zz in blocks:
        v = int(zz[0]) >> 1
        size, code = _magnitude(v - prev)
        length, hcode = dc_tab[size]
        wtr.write(hcode, length)
        wtr.write(code, size)
        prev = v
    scans.append((0, 0, 0, 1, wtr.flush()))
    for ss, se in ((1, 5), (6, 63)):
        scans.append((ss, se, 0, 1, _encode_ac_first(blocks, ss, se, 1, ac_tab)))
    # DC refinement: one raw bit per block, no entropy coding
    wtr = _BitWriter()
    for zz in blocks:
        wtr.write(int(zz[0]) & 1, 1)
    scans.append((0, 0, 1, 0, wtr.flush()))
    for ss, se in ((1, 5), (6, 63)):
        scans.append((ss, se, 1, 0, _encode_ac_refine(blocks, ss, se, 0, ac_tab)))

    out = bytearray(b"\xff\xd8")
    out += _seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xFFDB, b"\x00" + bytes(int(quant[z]) for z in ZIGZAG))
    out += _seg(0xFFC2, struct.pack(">BHHB", 8, h, w, 1) + b"\x01\x11\x00")
    out += _seg(0xFFC4, b"\x00" + bytes(DC_LUM_BITS) + bytes(DC_LUM_VALS))
    out += _seg(0xFFC4, b"\x10" + bytes(AC_PROG_BITS) + bytes(AC_PROG_VALS))
    for ss, se, ah, al, payload in scans:
        out += _seg(0xFFDA, bytes([1, 1, 0x00, ss, se, (ah << 4) | al]))
        out += payload
    out += b"\xff\xd9"
    return bytes(out)


def _decode_ac_first(
    reader: _BitReader,
    zz: np.ndarray,
    act: dict,
    ss: int,
    se: int,
    al: int,
    eobrun: int,
) -> int:
    """One block of an AC first scan (mirror of jdphuff
    decode_mcu_AC_first); returns the remaining EOB run."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        sym = _read_symbol(reader, act)
        r, s = sym >> 4, sym & 0x0F
        if s == 0:
            if r != 15:
                eobrun = 1 << r
                if r:
                    eobrun += reader.read_bits(r)
                return eobrun - 1
            k += 16  # ZRL
            continue
        k += r
        if k > se:
            raise ValueError("AC run overflow in progressive scan")
        zz[k] = _extend(reader.read_bits(s), s) << al
        k += 1
    return 0


def _decode_ac_refine(
    reader: _BitReader,
    zz: np.ndarray,
    act: dict,
    ss: int,
    se: int,
    al: int,
    eobrun: int,
) -> int:
    """One block of an AC refinement scan (mirror of jdphuff
    decode_mcu_AC_refine): newly-significant coefficients appear as
    ±2^Al; already-significant ones consume one correction bit each as
    they are passed; EOB runs carry correction bits for the rest of the
    band.  Returns the remaining EOB run."""
    p1 = 1 << al
    m1 = -p1
    k = ss

    def correct(idx: int) -> None:
        if reader.read_bit() and (abs(int(zz[idx])) & p1) == 0:
            zz[idx] += p1 if zz[idx] >= 0 else m1

    if eobrun == 0:
        while k <= se:
            sym = _read_symbol(reader, act)
            r, s = sym >> 4, sym & 0x0F
            newval = 0
            if s == 0:
                if r != 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += reader.read_bits(r)
                    break
                # ZRL: r = 15 -> skip 16 zero-history coefficients
            else:
                newval = p1 if reader.read_bit() else m1
            while k <= se:
                if zz[k] != 0:
                    correct(k)
                else:
                    if r == 0:
                        if newval:
                            zz[k] = newval
                        k += 1
                        break
                    r -= 1
                k += 1
    if eobrun > 0:
        while k <= se:
            if zz[k] != 0:
                correct(k)
            k += 1
        eobrun -= 1
    return eobrun


def _next_marker(data: bytes, pos: int) -> int:
    """Position of the next non-stuffing, non-RST marker at/after pos."""
    while pos < len(data) - 1:
        if data[pos] == 0xFF and data[pos + 1] not in (0x00,) and not (
            0xD0 <= data[pos + 1] <= 0xD7
        ):
            return pos
        pos += 1
    return len(data)


def _decode_progressive_scan(
    data: bytes,
    start: int,
    coefs: np.ndarray,
    scan_sel: dict,
    huff_dc: dict,
    huff_ac: dict,
    ss: int,
    se: int,
    ah: int,
    al: int,
    pred: list[int],
) -> int:
    """Decode one progressive scan over the single-component coefficient
    array ``coefs`` (n_blocks x 64, zigzag order); returns the stream
    position just past the scan's entropy data."""
    reader = _BitReader(data, start)
    eobrun = 0
    cid = next(iter(scan_sel))
    dc_tab = huff_dc.get(scan_sel[cid][0])
    ac_tab = huff_ac.get(scan_sel[cid][1])
    for zz in coefs:
        if ss == 0:
            if ah == 0:  # DC first
                size = _read_symbol(reader, dc_tab)
                diff = _extend(reader.read_bits(size), size) if size else 0
                pred[0] += diff
                zz[0] = pred[0] << al
            else:  # DC refinement: one raw bit
                if reader.read_bit():
                    zz[0] |= 1 << al
        elif ah == 0:
            eobrun = _decode_ac_first(reader, zz, ac_tab, ss, se, al, eobrun)
        else:
            eobrun = _decode_ac_refine(reader, zz, ac_tab, ss, se, al, eobrun)
    return _next_marker(data, reader.pos)


def _idct_single_component(
    frame: dict, coefs: np.ndarray, quant: dict
) -> np.ndarray:
    """Dequantize + inverse-DCT the accumulated progressive coefficient
    array of a single-component frame — the same math as the baseline
    scan's per-block tail, run once after the final scan."""
    fh, fw = frame["h"], frame["w"]
    qtab = quant[frame["comps"][0]["tq"]]
    bw = -(-fw // 8)
    bh = -(-fh // 8)
    plane = np.zeros((bh * 8, bw * 8), dtype=np.float64)
    for i, zz in enumerate(coefs):
        deq = np.zeros(64, dtype=np.float64)
        deq[ZIGZAG] = zz * qtab[ZIGZAG]
        block = _C.T @ deq.reshape(8, 8) @ _C + 128.0
        y0 = (i // bw) * 8
        x0 = (i % bw) * 8
        plane[y0 : y0 + 8, x0 : x0 + 8] = block
    out = np.clip(np.round(plane[:fh, :fw]), 0, 255).astype(np.uint8)
    return out.reshape(1, fh, fw)
