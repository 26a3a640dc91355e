"""Baseline JPEG codec (pure Python/NumPy, public ITU-T T.81 spec).

Closes the last documented multimodal decode gap (JPEG previously raised
NotImplementedError): baseline sequential DCT, 8-bit precision, Huffman
entropy coding — the profile every camera/export pipeline emits — with
no external codec library. Progressive (SOF2), arithmetic coding,
hierarchical and 12-bit modes stay NotImplementedError (valid-but-
unsupported, per the decoder error contract).

**Pinned integer numerics.** JPEG is lossy, so the driver-gate goldens
must be able to re-derive decode(encode(px)) WITHOUT these codecs. Every
lossy stage is therefore fixed-point integer math whose result is
independent of summation order (int64 matmuls are exact; `>>` is floor
division in both Python ints and NumPy int64), so a straight-line scalar
re-implementation is bitwise identical to the vectorized one:

- color fwd (JFIF / ITU-T.871 full-range), s=16:
  Y  = (19595 R + 38470 G +  7471 B + 2^15) >> 16
  Cb = ((-11058 R - 21710 G + 32768 B + 2^15) >> 16) + 128, clip [0,255]
  Cr = ((32768 R - 27439 G -  5329 B + 2^15) >> 16) + 128, clip [0,255]
- 4:2:0 chroma: 2x2 box mean (a+b+c+d+2) >> 2 over the edge-padded plane
- fDCT: T = M13 @ (X-128) @ M13.T with M13 = round(2^13 * DCT-II basis)
  (scale 2^26); quantize round-half-away: q = sgn(T)*((2|T| + Q·2^26) //
  (2·Q·2^26))
- IDCT: T = M13.T @ (q·Q) @ M13; x = ((T + 2^25) >> 26) + 128, clip
- chroma upsample: sample replication (np.repeat)
- color inv, s=16:
  R = (2^16 Y + 91881 (Cr-128) + 2^15) >> 16
  G = (2^16 Y - 22553 (Cb-128) - 46802 (Cr-128) + 2^15) >> 16
  B = (2^16 Y + 116130 (Cb-128) + 2^15) >> 16, each clipped [0,255]

Quantization tables are ITU-T T.81 Annex K.1/K.2 scaled by the classic
IJG quality percentage (q<50: 5000/q, else 200-2q; clip [1,255]); Huffman
tables are the Annex K.3 typical tables; canonical code assignment per
Annex C; decoder table reconstruction per F.2.2.3 (MINCODE/MAXCODE/
VALPTR). The decoder accepts any component sampling with integer
Hmax/Hi, Vmax/Vi ratios in {1,2,4} (covers 4:4:4, 4:2:2, 4:2:0, 4:1:1),
restart intervals (DRI/RSTn), multi-scan-irrelevant baseline streams,
16-bit DQT rejection, and is pinned by hand-assembled bitstreams
independent of the encoder (tests/test_jpeg.py).
"""

from __future__ import annotations

import struct
from typing import Dict, List, Tuple

import numpy as np

__all__ = ["encode_jpeg", "decode_jpeg"]

# decompression-bomb guard shared with the other image decoders
# (multimodal._MAX_PIXELS duplicated here to avoid a circular import;
# pinned equal by test_jpeg.py).
_MAX_PIXELS = 1 << 26

# --- pinned fixed-point constants (see module docstring) -------------------

# round(2^13 * 0.5*c(u)*cos((2x+1)u*pi/16)) — the exact DCT-II basis
_M13 = np.array([
    [2896, 2896, 2896, 2896, 2896, 2896, 2896, 2896],
    [4017, 3406, 2276, 799, -799, -2276, -3406, -4017],
    [3784, 1567, -1567, -3784, -3784, -1567, 1567, 3784],
    [3406, -799, -4017, -2276, 2276, 4017, 799, -3406],
    [2896, -2896, -2896, 2896, 2896, -2896, -2896, 2896],
    [2276, -4017, 799, 3406, -3406, -799, 4017, -2276],
    [1567, -3784, 3784, -1567, -1567, 3784, -3784, 1567],
    [799, -2276, 3406, -4017, 4017, -3406, 2276, -799]], dtype=np.int64)

# zig-zag: raster index of each zig-zag position (T.81 Figure 5)
_ZZ = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63],
    dtype=np.int64)

# Annex K.1 / K.2 base quantization tables (raster order)
_QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int64)
_QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], dtype=np.int64)

# Annex K.3 typical Huffman tables: (BITS[1..16], HUFFVAL)
_DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUMA_VALS = list(range(12))
_DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_CHROMA_VALS = list(range(12))
_AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125]
_AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA]
_AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119]
_AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA]


def _clean_decode_errors(fn):
    """struct/overflow/index internals from corrupt payloads surface as
    ValueError — the (ValueError, NotImplementedError) decoder error
    contract shared with the other media decoders."""
    import functools

    @functools.wraps(fn)
    def inner(*a, **k):
        try:
            return fn(*a, **k)
        except (struct.error, OverflowError, IndexError, KeyError) as e:
            raise ValueError(f"corrupt JPEG payload: {e}") from e
    return inner


def _scaled_quant(base: np.ndarray, quality: int) -> np.ndarray:
    """IJG percent scaling of an Annex K base table (public libjpeg
    convention: q<50 -> 5000/q, else 200-2q; entries clipped [1,255] —
    baseline streams require 8-bit table entries)."""
    if not 1 <= quality <= 100:
        raise ValueError("quality must be in [1, 100]")
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = (base * scale + 50) // 100
    return np.clip(q, 1, 255).astype(np.int64)


def _canonical_codes(bits: List[int], vals: List[int]) -> Dict[int, Tuple[int, int]]:
    """Annex C canonical assignment: symbol -> (code, length)."""
    codes: Dict[int, Tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


# ---------------------------------------------------------------------------
# shared integer transform stages (vectorized; scalar twins live in the
# tests/goldens and must stay bitwise identical)
# ---------------------------------------------------------------------------

def _rgb_to_ycbcr(px: np.ndarray) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    r = px[:, :, 0].astype(np.int64)
    g = px[:, :, 1].astype(np.int64)
    b = px[:, :, 2].astype(np.int64)
    half = np.int64(1 << 15)
    y = (19595 * r + 38470 * g + 7471 * b + half) >> 16
    cb = ((-11058 * r - 21710 * g + 32768 * b + half) >> 16) + 128
    cr = ((32768 * r - 27439 * g - 5329 * b + half) >> 16) + 128
    return (np.clip(y, 0, 255), np.clip(cb, 0, 255), np.clip(cr, 0, 255))


def _ycbcr_to_rgb(y: np.ndarray, cb: np.ndarray, cr: np.ndarray) -> np.ndarray:
    yy = y.astype(np.int64) << 16
    cb = cb.astype(np.int64) - 128
    cr = cr.astype(np.int64) - 128
    half = np.int64(1 << 15)
    r = (yy + 91881 * cr + half) >> 16
    g = (yy - 22553 * cb - 46802 * cr + half) >> 16
    b = (yy + 116130 * cb + half) >> 16
    return np.stack([np.clip(r, 0, 255), np.clip(g, 0, 255),
                     np.clip(b, 0, 255)], axis=2).astype(np.uint8)


def _pad_edge(plane: np.ndarray, mh: int, mw: int) -> np.ndarray:
    h, w = plane.shape
    ph = (mh - h % mh) % mh
    pw = (mw - w % mw) % mw
    if ph or pw:
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    return plane


def _box_down(plane: np.ndarray, fy: int, fx: int) -> np.ndarray:
    """Pinned box mean: (sum + n/2) >> log2(n) over fy x fx cells."""
    if fy == 1 and fx == 1:
        return plane
    h, w = plane.shape
    s = plane.reshape(h // fy, fy, w // fx, fx).sum(axis=(1, 3))
    n = fy * fx
    return (s + n // 2) >> (n.bit_length() - 1)


def _blocks_of(plane: np.ndarray) -> np.ndarray:
    """(H,W) multiple-of-8 plane -> (H//8, W//8, 8, 8) int64 blocks."""
    h, w = plane.shape
    return (plane.reshape(h // 8, 8, w // 8, 8)
            .transpose(0, 2, 1, 3).astype(np.int64))


def _fdct_quant(blocks: np.ndarray, qtab: np.ndarray) -> np.ndarray:
    """Batched fixed-point fDCT + round-half-away quantization.
    blocks: (..., 8, 8) level-shifted int64 -> (..., 64) zig-zag int64."""
    t = _M13 @ blocks @ _M13.T                      # scale 2^26, exact
    d = qtab.reshape(8, 8)[(_ZZ // 8), (_ZZ % 8)]   # raster -> zig-zag
    tz = t.reshape(*t.shape[:-2], 64)[..., _ZZ]     # raster -> zig-zag
    dd = d << 26
    q = np.sign(tz) * ((2 * np.abs(tz) + dd) // (2 * dd))
    return q


def _dequant_idct(zz: np.ndarray, qtab: np.ndarray) -> np.ndarray:
    """Batched dequant + fixed-point IDCT.
    zz: (..., 64) zig-zag int64 -> (..., 8, 8) uint8 samples."""
    d = qtab.reshape(8, 8)[(_ZZ // 8), (_ZZ % 8)]
    coef = np.zeros(zz.shape, dtype=np.int64)
    coef[..., _ZZ] = zz * d
    c = coef.reshape(*zz.shape[:-1], 8, 8)
    t = _M13.T @ c @ _M13                           # scale 2^26, exact
    x = ((t + (1 << 25)) >> 26) + 128
    return np.clip(x, 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------

class _BitWriter:
    """MSB-first accumulator with 0xFF byte stuffing (B.1.1.5)."""

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            byte = (self.acc >> (self.n - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def pad_align(self) -> None:
        if self.n:
            self.put(0x7F, 8 - self.n)  # pad with 1-bits

    def marker(self, m: int) -> None:
        self.pad_align()
        self.out += bytes([0xFF, m])


def _magnitude(v: int) -> Tuple[int, int]:
    """(category ssss, value bits) per F.1.2.1: negatives encode as
    v + 2^ssss - 1."""
    ssss = int(abs(v)).bit_length()
    bits = v if v >= 0 else v + (1 << ssss) - 1
    return ssss, bits


def _encode_block(w: _BitWriter, zz: np.ndarray, pred: int,
                  dc: Dict[int, Tuple[int, int]],
                  ac: Dict[int, Tuple[int, int]]) -> int:
    diff = int(zz[0]) - pred
    ssss, bits = _magnitude(diff)
    code, ln = dc[ssss]
    w.put(code, ln)
    if ssss:
        w.put(bits, ssss)
    run = 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac[0xF0]                     # ZRL
            w.put(code, ln)
            run -= 16
        s, b = _magnitude(v)
        code, ln = ac[(run << 4) | s]
        w.put(code, ln)
        w.put(b, s)
        run = 0
    if run:
        code, ln = ac[0x00]                         # EOB
        w.put(code, ln)
    return int(zz[0])


def encode_jpeg(img: np.ndarray, quality: int = 75,
                subsampling: str = "4:2:0",
                restart_interval: int = 0) -> bytes:
    """(h, w[, 3]) image -> baseline JFIF bytes.

    Accepts float in [0, 1] (quantized with the shared
    clip(round(x*255)) rule) or uint8. 3-channel input is encoded as
    YCbCr with ``subsampling`` '4:4:4', '4:2:2' or '4:2:0'; 2-D input as
    single-component grayscale. ``restart_interval`` > 0 emits DRI +
    RSTn markers every that many MCUs (exercises the decoder's resync
    path).
    """
    a = np.asarray(img)
    if a.dtype != np.uint8:
        a = np.clip(np.round(a.astype(np.float64) * 255.0), 0, 255) \
              .astype(np.uint8)
    gray = a.ndim == 2
    if not gray and (a.ndim != 3 or a.shape[2] != 3):
        raise ValueError("image must be (h, w) or (h, w, 3)")
    if subsampling not in ("4:4:4", "4:2:2", "4:2:0"):
        raise ValueError(
            "subsampling must be '4:4:4', '4:2:2' or '4:2:0'")
    h, w = a.shape[:2]
    if h < 1 or w < 1:
        raise ValueError("empty image")

    qt_l = _scaled_quant(_QT_LUMA, quality)
    qt_c = _scaled_quant(_QT_CHROMA, quality)

    if gray:
        comps = [(1, 1, 1, 0)]                      # (id, H, V, Tq)
    elif subsampling == "4:4:4":
        comps = [(1, 1, 1, 0), (2, 1, 1, 1), (3, 1, 1, 1)]
    elif subsampling == "4:2:2":
        comps = [(1, 2, 1, 0), (2, 1, 1, 1), (3, 1, 1, 1)]
    else:
        comps = [(1, 2, 2, 0), (2, 1, 1, 1), (3, 1, 1, 1)]
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcx = -(-w // (8 * hmax))
    mcy = -(-h // (8 * vmax))

    if gray:
        planes = [a.astype(np.int64)]
    else:
        planes = list(_rgb_to_ycbcr(a))
    # full-res pad to the MCU grid, then per-component box downsample
    comp_zz = []
    for (cid, ch, cv, tq), plane in zip(comps, planes):
        p = _pad_edge(plane, 8 * vmax, 8 * hmax)
        p = _box_down(p, vmax // cv, hmax // ch)
        blocks = _blocks_of(p) - 128
        qtab = qt_l if tq == 0 else qt_c
        comp_zz.append(_fdct_quant(blocks, qtab))   # (nby, nbx, 64)

    # ---- headers ----
    out = bytearray(b"\xff\xd8")                    # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" \
        + bytes([1, 1, 0]) + struct.pack(">HH", 1, 1) + bytes([0, 0])
    for tq, qt in ((0, qt_l), (1, qt_c))[: 1 if gray else 2]:
        zzq = qt.reshape(8, 8)[(_ZZ // 8), (_ZZ % 8)]
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq]) \
            + bytes(int(v) for v in zzq)
    out += b"\xff\xc0" + struct.pack(">H", 8 + 3 * len(comps)) \
        + bytes([8]) + struct.pack(">HH", h, w) + bytes([len(comps)])
    for cid, ch, cv, tq in comps:
        out += bytes([cid, (ch << 4) | cv, tq])
    tables = [(0x00, _DC_LUMA_BITS, _DC_LUMA_VALS),
              (0x10, _AC_LUMA_BITS, _AC_LUMA_VALS)]
    if not gray:
        tables += [(0x01, _DC_CHROMA_BITS, _DC_CHROMA_VALS),
                   (0x11, _AC_CHROMA_BITS, _AC_CHROMA_VALS)]
    for tcth, bits, vals in tables:
        out += b"\xff\xc4" + struct.pack(">H", 19 + len(vals)) \
            + bytes([tcth]) + bytes(bits) + bytes(vals)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    out += b"\xff\xda" + struct.pack(">H", 6 + 2 * len(comps)) \
        + bytes([len(comps)])
    for cid, ch, cv, tq in comps:
        td_ta = 0x00 if tq == 0 else 0x11
        out += bytes([cid, td_ta])
    out += bytes([0, 63, 0])                        # Ss, Se, AhAl

    # ---- entropy-coded scan ----
    dc_l = _canonical_codes(_DC_LUMA_BITS, _DC_LUMA_VALS)
    ac_l = _canonical_codes(_AC_LUMA_BITS, _AC_LUMA_VALS)
    dc_c = _canonical_codes(_DC_CHROMA_BITS, _DC_CHROMA_VALS)
    ac_c = _canonical_codes(_AC_CHROMA_BITS, _AC_CHROMA_VALS)
    huff = [(dc_l, ac_l) if tq == 0 else (dc_c, ac_c)
            for _, _, _, tq in comps]

    bw = _BitWriter()
    preds = [0] * len(comps)
    rst = 0
    nmcu = 0
    for my in range(mcy):
        for mx in range(mcx):
            if restart_interval and nmcu and nmcu % restart_interval == 0:
                bw.marker(0xD0 + rst)
                rst = (rst + 1) & 7
                preds = [0] * len(comps)
            for ci, (cid, ch, cv, tq) in enumerate(comps):
                dct, act = huff[ci]
                for v in range(cv):
                    for hh in range(ch):
                        zz = comp_zz[ci][my * cv + v, mx * ch + hh]
                        preds[ci] = _encode_block(bw, zz, preds[ci],
                                                  dct, act)
            nmcu += 1
    bw.pad_align()
    out += bw.out
    out += b"\xff\xd9"                              # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------

class _HuffDecoder:
    """F.2.2.3 MINCODE/MAXCODE/VALPTR decode tables."""

    def __init__(self, bits: List[int], vals: List[int]) -> None:
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        self.vals = vals
        code = 0
        k = 0
        for ln in range(1, 17):
            if bits[ln - 1]:
                self.valptr[ln] = k
                self.mincode[ln] = code
                code += bits[ln - 1]
                k += bits[ln - 1]
                self.maxcode[ln] = code - 1
            code <<= 1


class _BitReader:
    """Entropy-segment reader: un-stuffs FF00, stops at markers, resyncs
    at RSTn."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.d = data
        self.pos = pos
        self.acc = 0
        self.n = 0
        self.marker_hit: int | None = None

    def _fill(self) -> None:
        if self.marker_hit is not None:
            raise ValueError("JPEG entropy stream ended early "
                             f"(marker 0x{self.marker_hit:02x})")
        b = self.d[self.pos]
        self.pos += 1
        if b == 0xFF:
            nxt = self.d[self.pos]
            if nxt == 0x00:
                self.pos += 1
            else:
                # a real marker terminates entropy data; report the
                # current bit position as exhausted
                self.pos -= 1
                self.marker_hit = nxt
                raise ValueError(
                    f"JPEG entropy stream ended early (marker 0x{nxt:02x})")
        self.acc = (self.acc << 8) | b
        self.n += 8

    def bit(self) -> int:
        if self.n == 0:
            self._fill()
        self.n -= 1
        return (self.acc >> self.n) & 1

    def receive(self, ssss: int) -> int:
        v = 0
        for _ in range(ssss):
            v = (v << 1) | self.bit()
        return v

    def decode(self, t: _HuffDecoder) -> int:
        code = self.bit()
        ln = 1
        while code > t.maxcode[ln]:
            ln += 1
            if ln > 16:
                raise ValueError("invalid JPEG Huffman code")
            code = (code << 1) | self.bit()
        return t.vals[t.valptr[ln] + code - t.mincode[ln]]

    def sync_restart(self, expect: int) -> None:
        """Byte-align and consume the expected RSTn marker."""
        self.acc = 0
        self.n = 0
        self.marker_hit = None
        while self.d[self.pos] != 0xFF:
            self.pos += 1                           # skip pad bits' bytes
        while self.d[self.pos] == 0xFF and self.d[self.pos + 1] == 0xFF:
            self.pos += 1
        m = self.d[self.pos + 1]
        if m != 0xD0 + expect:
            raise ValueError(
                f"expected RST{expect}, found marker 0x{m:02x}")
        self.pos += 2


def _extend(v: int, t: int) -> int:
    return v - (1 << t) + 1 if t and v < (1 << (t - 1)) else v


@_clean_decode_errors
def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JFIF/JPEG bytes -> (h, w, 3) float64 RGB in [0, 1]
    (grayscale replicated across channels, matching the GIF/BMP decoder
    contract). See the module docstring for the pinned integer pipeline
    and supported profile."""
    b = bytes(payload)
    if b[:3] != b"\xff\xd8\xff":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    qtabs: Dict[int, np.ndarray] = {}
    huff: Dict[Tuple[int, int], _HuffDecoder] = {}
    restart_interval = 0
    frame = None                                    # (h, w, comps)
    while True:
        if b[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        while b[pos] == 0xFF and pos + 1 < len(b) and b[pos + 1] == 0xFF:
            pos += 1                                # fill bytes
        m = b[pos + 1]
        pos += 2
        if m == 0xD9:                               # EOI before scan
            raise ValueError("JPEG ended without image data")
        if m == 0x01 or 0xD0 <= m <= 0xD7:
            continue                                # parameterless
        ln = struct.unpack_from(">H", b, pos)[0]
        seg = b[pos + 2: pos + ln]
        if len(seg) != ln - 2:
            raise ValueError("truncated JPEG segment")
        if m == 0xDB:                               # DQT
            off = 0
            while off < len(seg):
                pq, tq = seg[off] >> 4, seg[off] & 15
                if pq != 0:
                    raise NotImplementedError(
                        "16-bit quantization tables (Pq=1) unsupported")
                if off + 65 > len(seg):
                    raise ValueError("truncated DQT")
                zzq = np.frombuffer(seg[off + 1: off + 65],
                                    np.uint8).astype(np.int64)
                raster = np.zeros(64, np.int64)
                raster[_ZZ] = zzq
                qtabs[tq] = raster
                off += 65
        elif m == 0xC4:                             # DHT
            off = 0
            while off < len(seg):
                tc, th = seg[off] >> 4, seg[off] & 15
                bits = list(seg[off + 1: off + 17])
                nv = sum(bits)
                vals = list(seg[off + 17: off + 17 + nv])
                if len(vals) != nv:
                    raise ValueError("truncated DHT")
                huff[(tc, th)] = _HuffDecoder(bits, vals)
                off += 17 + nv
        elif m == 0xDD:                             # DRI
            restart_interval = struct.unpack_from(">H", seg, 0)[0]
        elif m == 0xC0 or m == 0xC1:                # SOF0/1 baseline-ish
            prec = seg[0]
            if prec != 8:
                raise NotImplementedError(
                    f"{prec}-bit precision unsupported (8-bit baseline only)")
            fh, fw = struct.unpack_from(">HH", seg, 1)
            nc = seg[5]
            if fh < 1 or fw < 1 or nc not in (1, 3):
                raise ValueError(
                    f"unsupported JPEG geometry h={fh} w={fw} comps={nc}")
            if fh * fw > _MAX_PIXELS:
                raise ValueError(
                    f"JPEG dimensions {fw}x{fh} exceed the "
                    f"decompression-bomb guard ({_MAX_PIXELS} px)")
            comps = []
            for i in range(nc):
                cid, hv, tq = seg[6 + 3 * i: 9 + 3 * i]
                comps.append([cid, hv >> 4, hv & 15, tq, 0, 0])
            frame = (fh, fw, comps)
        elif m in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                   0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG SOF marker 0x{m:02x} (progressive/arithmetic/"
                "hierarchical) unsupported — baseline SOF0 only")
        elif m == 0xDA:                             # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            fh, fw, comps = frame
            if ns != len(comps):
                raise NotImplementedError(
                    "multi-scan JPEG (partial-component SOS) unsupported")
            sel = {}
            for i in range(ns):
                cs, tdta = seg[1 + 2 * i: 3 + 2 * i]
                sel[cs] = (tdta >> 4, tdta & 15)
            for c in comps:
                if c[0] not in sel:
                    raise ValueError("SOS references unknown component")
                c[4], c[5] = sel[c[0]]
            pos += ln
            return _decode_scan(b, pos, fh, fw, comps, qtabs, huff,
                                restart_interval)
        # APPn / COM / others: skip
        pos += ln


def _decode_scan(b: bytes, pos: int, fh: int, fw: int, comps,
                 qtabs, huff, restart_interval: int) -> np.ndarray:
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    for c in comps:
        if c[1] < 1 or c[2] < 1 or hmax % c[1] or vmax % c[2] \
                or hmax // c[1] not in (1, 2, 4) \
                or vmax // c[2] not in (1, 2, 4):
            raise NotImplementedError(
                f"unsupported sampling factors H={c[1]} V={c[2]}")
        if c[3] not in qtabs:
            raise ValueError(f"missing quantization table {c[3]}")
        if (0, c[4]) not in huff or (1, c[5]) not in huff:
            raise ValueError("missing Huffman table")
    mcx = -(-fw // (8 * hmax))
    mcy = -(-fh // (8 * vmax))
    nblocks = {i: (mcy * c[2], mcx * c[1])
               for i, c in enumerate(comps)}
    coefs = {i: np.zeros((nb[0] * nb[1], 64), dtype=np.int64)
             for i, nb in nblocks.items()}

    r = _BitReader(b, pos)
    preds = [0] * len(comps)
    rst = 0
    nmcu = 0
    for my in range(mcy):
        for mx in range(mcx):
            if restart_interval and nmcu and nmcu % restart_interval == 0:
                r.sync_restart(rst)
                rst = (rst + 1) & 7
                preds = [0] * len(comps)
            for ci, c in enumerate(comps):
                dct = huff[(0, c[4])]
                act = huff[(1, c[5])]
                for v in range(c[2]):
                    for hh in range(c[1]):
                        zz = np.zeros(64, dtype=np.int64)
                        t = r.decode(dct)
                        if t > 11:
                            raise ValueError(
                                f"invalid DC category {t}")
                        diff = _extend(r.receive(t), t)
                        preds[ci] += diff
                        zz[0] = preds[ci]
                        k = 1
                        while k < 64:
                            rs = r.decode(act)
                            rr, s = rs >> 4, rs & 15
                            if s == 0:
                                if rr == 15:
                                    k += 16
                                    continue
                                break               # EOB
                            k += rr
                            if k > 63:
                                raise ValueError(
                                    "JPEG AC run past block end")
                            zz[k] = _extend(r.receive(s), s)
                            k += 1
                        bi = (my * c[2] + v) * nblocks[ci][1] \
                            + mx * c[1] + hh
                        coefs[ci][bi] = zz
            nmcu += 1

    planes = []
    for ci, c in enumerate(comps):
        nby, nbx = nblocks[ci]
        qtab = qtabs[c[3]]
        px = _dequant_idct(coefs[ci], qtab)         # (n, 8, 8)
        plane = (px.reshape(nby, nbx, 8, 8)
                   .transpose(0, 2, 1, 3).reshape(nby * 8, nbx * 8))
        fy, fx = vmax // c[2], hmax // c[1]
        if fy > 1 or fx > 1:
            plane = np.repeat(np.repeat(plane, fy, axis=0), fx, axis=1)
        planes.append(plane[:fh, :fw])
    if len(comps) == 1:
        y = planes[0]
        rgb = np.stack([y, y, y], axis=2)
    else:
        rgb = _ycbcr_to_rgb(planes[0], planes[1], planes[2])
    return np.ascontiguousarray(rgb).astype(np.float64) / 255.0
