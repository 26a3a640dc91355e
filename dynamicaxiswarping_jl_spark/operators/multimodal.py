"""Multimodal (image/audio/video) column plumbing.

Design: media are opaque BINARY columns + typed metadata structs; decode /
feature-extract / resize / frame-sample are Arrow-batched pandas UDFs over
mapInPandas.

Decode support (pure NumPy, no media libs in this container):

- **BMP** (Windows bitmap, BITMAPINFOHEADER, uncompressed BI_RGB 24/32
  bpp, bottom-up or top-down): ``decode_bmp`` / ``encode_bmp``. The
  format is public and uncompressed, so a struct-level parser is exact.
- **WAV** (RIFF/WAVE PCM: 8/16/32-bit integer and 32/64-bit IEEE float):
  ``decode_wav`` / ``encode_wav``.
- **PNG** (8-bit depth, color types 0/2/3/4/6, all five scanline
  filters, non-interlaced): ``decode_png`` / ``encode_png``. Deflate is
  stdlib ``zlib``; the chunk/filter layer is a spec-level NumPy
  implementation with CRC verification.
- **GIF** (87a/89a animations: LZW, global/local palettes, per-frame
  delay/disposal/transparency, interlace): ``decode_gif`` /
  ``encode_gif`` (operators/gif) — the REAL path of ``frame_sample``.
- **JPEG** (baseline sequential ITU-T T.81, 8-bit, Huffman; grayscale +
  YCbCr at any integer sampling ratio incl. 4:4:4/4:2:2/4:2:0, restart
  markers): ``decode_jpeg`` / ``encode_jpeg`` (operators/jpeg) — lossy
  stages are pinned integer fixed-point so goldens can re-derive
  decode(encode(px)) bitwise without the codecs.
- **AVI/MJPEG** (RIFF AVI container, Motion-JPEG video stream — every
  frame a complete baseline JPEG): ``decode_avi`` / ``encode_avi``
  (operators/avi) — real VIDEO for ``frame_sample``, with exact
  integer frame timing from the stream header's dwScale/dwRate.

Progressive/arithmetic/12-bit JPEG, MP3 and inter-frame video codecs
(H.264 etc.) stay NotImplementedError; ``fake=True`` keeps the
deterministic sha256 pseudo-decode for plumbing tests and the
golden-pinned ``media_features`` driver query.
"""

from __future__ import annotations

import hashlib
import struct
from typing import Iterator, Tuple

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .avi import decode_avi, encode_avi  # noqa: F401  (re-export)
from .gif import decode_gif, encode_gif  # noqa: F401  (re-export)
from .jpeg import decode_jpeg, encode_jpeg  # noqa: F401  (re-export)

__all__ = ["MEDIA_SCHEMA", "attach_media_metadata", "image_features",
           "frame_sample", "decode_bmp", "encode_bmp", "decode_wav",
           "encode_wav", "decode_png", "encode_png", "decode_gif",
           "encode_gif", "decode_jpeg", "encode_jpeg", "decode_avi",
           "encode_avi", "decode_image",
           "audio_features", "resize_bilinear", "resize_nearest",
           "resize_images"]

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("kind", T.StringType()),      # image | audio | video
    T.StructField("mime", T.StringType()),
    T.StructField("payload", T.BinaryType()),
    T.StructField("meta", T.StructType([
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
    ])),
])


def _fake_decode(payload: bytes, w: int = 8, h: int = 8) -> np.ndarray:
    """Deterministic fake decode: bytes → pseudo-pixel grid via sha256
    expansion. Kept for plumbing tests and the golden-pinned
    ``media_features`` query; real formats go through decode_bmp /
    decode_wav."""
    d = hashlib.sha256(bytes(payload)).digest()
    reps = (w * h * 3) // len(d) + 1
    buf = np.frombuffer((d * reps)[: w * h * 3], dtype=np.uint8)
    return buf.reshape(h, w, 3).astype(np.float64) / 255.0


# decompression-bomb / corrupt-header guard shared by the image
# decoders: a flipped 4-byte dimension field must raise ValueError, not
# attempt a multi-GB canvas allocation on an executor (on_error='skip'
# then shields the job). 2^26 pixels = a 8192x8192 RGB image = 1.5 GB
# as float64 — beyond any sane training-data payload.
_MAX_PIXELS = 1 << 26


def _clean_decode_errors(fmt: str):
    """Decorator: translate struct/zlib/overflow internals from corrupt
    payloads into ValueError so the decoders' error surface is exactly
    (ValueError, NotImplementedError) — the contract the on_error='skip'
    fuzz pins."""
    import functools
    import zlib as _z

    def wrap(fn):
        @functools.wraps(fn)
        def inner(*a, **k):
            try:
                return fn(*a, **k)
            except (struct.error, _z.error, OverflowError,
                    IndexError) as e:
                # IndexError = a bytes[] access past a truncation point
                raise ValueError(f"corrupt {fmt} payload: {e}") from e
        return inner
    return wrap


def resize_bilinear(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Deterministic float64 bilinear resample with half-pixel centers
    (the align_corners=False convention PIL/torch/TF2 default to):
    output pixel i samples input coordinate (i + 0.5)·scale − 0.5,
    border-clamped. The expression order is pinned —
    tl·(1−fy)(1−fx) + tr·(1−fy)fx + bl·fy(1−fx) + br·fy·fx — so a
    straight-line scalar re-derivation (the golden oracle) is bitwise
    identical to this vectorized form."""
    a = np.asarray(img, dtype=np.float64)
    h, w = a.shape[:2]
    if out_h < 1 or out_w < 1:
        raise ValueError("resize dimensions must be >= 1")
    ys = (np.arange(out_h) + 0.5) * (h / out_h) - 0.5
    xs = (np.arange(out_w) + 0.5) * (w / out_w) - 0.5
    y0 = np.clip(np.floor(ys), 0, h - 1).astype(np.int64)
    x0 = np.clip(np.floor(xs), 0, w - 1).astype(np.int64)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    fy = np.clip(ys - y0, 0.0, 1.0)[:, None, None]
    fx = np.clip(xs - x0, 0.0, 1.0)[None, :, None]
    tl = a[y0][:, x0]
    tr = a[y0][:, x1]
    bl = a[y1][:, x0]
    br = a[y1][:, x1]
    out = (tl * (1 - fy) * (1 - fx) + tr * (1 - fy) * fx
           + bl * fy * (1 - fx) + br * fy * fx)
    return np.ascontiguousarray(out)


def resize_nearest(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resample, half-pixel centers, border-clamped."""
    a = np.asarray(img, dtype=np.float64)
    h, w = a.shape[:2]
    if out_h < 1 or out_w < 1:
        raise ValueError("resize dimensions must be >= 1")
    ys = np.clip(np.floor((np.arange(out_h) + 0.5) * (h / out_h)),
                 0, h - 1).astype(np.int64)
    xs = np.clip(np.floor((np.arange(out_w) + 0.5) * (w / out_w)),
                 0, w - 1).astype(np.int64)
    return np.ascontiguousarray(a[ys][:, xs])


def resize_images(media: DataFrame, width: int, height: int,
                  method: str = "bilinear", fake: bool = False,
                  id_col: str = "media_id",
                  on_error: str = "raise") -> DataFrame:
    """Decode → resample → re-encode (PNG) via mapInPandas:
    (id, payload PNG bytes, width, height). The training-data-pipeline
    normalization step — every image lands at one (width, height) in a
    lossless container. ``method``: 'bilinear' (half-pixel centers,
    values rounded back to uint8 with np.round half-to-even) or
    'nearest'.
    ``on_error='skip'`` drops undecodable rows (see _skip_guard)."""
    if method not in ("bilinear", "nearest"):
        raise ValueError("method must be 'bilinear' or 'nearest'")
    skip = _skip_guard(on_error)
    schema = T.StructType([
        T.StructField(id_col, T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ])
    fn = resize_bilinear if method == "bilinear" else resize_nearest

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, pays = [], []
            for mid, payload in zip(pdf[id_col], pdf["payload"]):
                try:
                    img = decode_image(bytes(payload), fake=fake)
                    out = fn(img, height, width)
                except Exception:
                    if skip:
                        continue
                    raise
                ids.append(mid)
                pays.append(bytearray(encode_png(
                    np.clip(np.round(out * 255.0), 0, 255)
                    .astype(np.uint8))))
            if ids:
                yield pd.DataFrame({
                    id_col: ids, "payload": pays,
                    "width": [width] * len(ids),
                    "height": [height] * len(ids)})

    return media.select(id_col, "payload").mapInPandas(run, schema)


# ---------------------------------------------------------------------------
# Real decoders (public uncompressed formats, pure NumPy)
# ---------------------------------------------------------------------------

@_clean_decode_errors("BMP")
def decode_bmp(payload: bytes) -> np.ndarray:
    """Windows BMP → (height, width, 3) float64 RGB in [0, 1].

    Supports the dominant uncompressed form: BITMAPFILEHEADER +
    BITMAPINFOHEADER (or larger V4/V5 headers), BI_RGB, 24 or 32 bits
    per pixel, bottom-up (positive height) or top-down (negative
    height) row order, rows padded to 4-byte boundaries, pixel byte
    order BGR(A). Alpha (32 bpp) is dropped."""
    b = bytes(payload)
    if len(b) < 54 or b[:2] != b"BM":
        raise ValueError("not a BMP payload (missing 'BM' magic)")
    data_off = struct.unpack_from("<I", b, 10)[0]
    hdr_size = struct.unpack_from("<I", b, 14)[0]
    if hdr_size < 40:
        raise NotImplementedError(
            f"BITMAPCOREHEADER (size {hdr_size}) not supported")
    width, height = struct.unpack_from("<ii", b, 18)
    planes, bpp = struct.unpack_from("<HH", b, 26)
    compression = struct.unpack_from("<I", b, 30)[0]
    if compression not in (0, 3) or bpp not in (24, 32):
        # BI_BITFIELDS (3) with the default masks is laid out like
        # BI_RGB for 32 bpp; anything else (RLE, 1/4/8 bpp palettes)
        # needs palette/bitfield handling out of scope here
        raise NotImplementedError(
            f"only uncompressed 24/32-bpp BMP supported "
            f"(compression={compression}, bpp={bpp})")
    if compression == 3:
        # BI_BITFIELDS is only spec-valid for 16/32 bpp, and we decode
        # it by ASSUMING the default BGRA layout — verify the channel
        # masks (at offset 54 for BITMAPINFOHEADER-with-trailing-masks
        # and V4/V5 alike) actually say so, or a mask-permuted file
        # would silently decode with channels swapped
        if bpp != 32:
            raise NotImplementedError(
                "BI_BITFIELDS is only supported at 32 bpp")
        if len(b) < 66:
            raise ValueError("truncated BMP: BI_BITFIELDS masks missing")
        r_m, g_m, b_m = struct.unpack_from("<III", b, 54)
        if (r_m, g_m, b_m) != (0x00FF0000, 0x0000FF00, 0x000000FF):
            raise NotImplementedError(
                f"non-default BI_BITFIELDS masks "
                f"(R={r_m:#010x} G={g_m:#010x} B={b_m:#010x}); only the "
                f"BGRA default layout is supported")
    if width <= 0 or height == 0 or planes != 1 \
            or width * abs(height) > _MAX_PIXELS:
        raise ValueError("invalid BMP dimensions")
    top_down = height < 0
    h = abs(height)
    nch = bpp // 8
    stride = ((width * nch + 3) // 4) * 4
    need = data_off + stride * h
    if len(b) < need:
        raise ValueError(f"truncated BMP: need {need} bytes, got {len(b)}")
    rows = np.frombuffer(b, dtype=np.uint8, count=stride * h,
                         offset=data_off).reshape(h, stride)
    px = rows[:, : width * nch].reshape(h, width, nch)
    if not top_down:
        px = px[::-1]
    rgb = px[:, :, [2, 1, 0]]  # BGR(A) → RGB
    # canonical C layout: the advanced channel index leaves the copy
    # channel-major, and numpy's pairwise reductions associate in MEMORY
    # order — downstream feature math must not depend on which decoder
    # produced the array (knife-edge fp reassociation flips DuckDB-style
    # rounding at exact .5 boundaries)
    return np.ascontiguousarray(rgb).astype(np.float64) / 255.0


def encode_bmp(img: np.ndarray, bpp: int = 24,
               top_down: bool = False) -> bytes:
    """(h, w, 3) float64/uint8 RGB → BMP bytes (BI_RGB, 24 or 32 bpp).

    The fixture/test-data inverse of decode_bmp; round-trip is exact
    for uint8 inputs."""
    a = np.asarray(img)
    if a.dtype != np.uint8:
        a = np.clip(np.round(a * 255.0), 0, 255).astype(np.uint8)
    h, w, _ = a.shape
    nch = bpp // 8
    if bpp not in (24, 32):
        raise ValueError("bpp must be 24 or 32")
    stride = ((w * nch + 3) // 4) * 4
    rows = np.zeros((h, stride), dtype=np.uint8)
    bgr = a[:, :, [2, 1, 0]]
    if nch == 4:
        bgra = np.concatenate(
            [bgr, np.full((h, w, 1), 255, np.uint8)], axis=2)
        rows[:, : w * 4] = bgra.reshape(h, w * 4)
    else:
        rows[:, : w * 3] = bgr.reshape(h, w * 3)
    if not top_down:
        rows = rows[::-1]
    data = rows.tobytes()
    data_off = 14 + 40
    file_hdr = struct.pack("<2sIHHI", b"BM", data_off + len(data), 0, 0,
                           data_off)
    info_hdr = struct.pack("<IiiHHIIiiII", 40, w,
                           -h if top_down else h, 1, bpp, 0, len(data),
                           2835, 2835, 0, 0)
    return file_hdr + info_hdr + data


@_clean_decode_errors("WAV")
def decode_wav(payload: bytes) -> Tuple[np.ndarray, int]:
    """RIFF/WAVE → ((n_samples, n_channels) float64 in [-1, 1], rate).

    Supports PCM (format 1: 8-bit unsigned, 16/32-bit signed) and IEEE
    float (format 3: 32/64-bit), plus WAVE_FORMAT_EXTENSIBLE (0xFFFE)
    wrapping either. Chunks are walked by the RIFF rules (word-aligned,
    unknown chunks skipped), so extra chunks (LIST, fact) are fine."""
    b = bytes(payload)
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(b):
        cid = b[pos:pos + 4]
        size = struct.unpack_from("<I", b, pos + 4)[0]
        body = b[pos + 8: pos + 8 + size]
        if cid == b"fmt ":
            if size < 16:
                raise ValueError("truncated fmt chunk")
            fmt = struct.unpack_from("<HHIIHH", body, 0)
            if fmt[0] == 0xFFFE and size >= 40:
                # WAVE_FORMAT_EXTENSIBLE: true format = first 2 bytes
                # of the SubFormat GUID
                sub = struct.unpack_from("<H", body, 24)[0]
                fmt = (sub,) + fmt[1:]
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # RIFF chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt or data chunk")
    audio_fmt, nch, rate, _, _, bits = fmt
    if nch < 1:
        raise ValueError("invalid channel count")
    if audio_fmt == 1 and bits == 8:
        x = (np.frombuffer(data, np.uint8).astype(np.float64)
             - 128.0) / 128.0
    elif audio_fmt == 1 and bits == 16:
        x = np.frombuffer(data, "<i2").astype(np.float64) / 32768.0
    elif audio_fmt == 1 and bits == 32:
        x = np.frombuffer(data, "<i4").astype(np.float64) / 2147483648.0
    elif audio_fmt == 3 and bits == 32:
        x = np.frombuffer(data, "<f4").astype(np.float64)
    elif audio_fmt == 3 and bits == 64:
        x = np.frombuffer(data, "<f8").astype(np.float64)
    else:
        raise NotImplementedError(
            f"WAV format {audio_fmt}/{bits}-bit not supported "
            "(PCM 8/16/32 int, IEEE 32/64 float only)")
    n = (len(x) // nch) * nch
    return x[:n].reshape(-1, nch), int(rate)


def encode_wav(samples: np.ndarray, rate: int, bits: int = 16) -> bytes:
    """(n, ch) or (n,) float64 in [-1, 1] → RIFF/WAVE PCM bytes."""
    a = np.asarray(samples, dtype=np.float64)
    if a.ndim == 1:
        a = a[:, None]
    nch = a.shape[1]
    if bits == 16:
        raw = np.clip(np.round(a * 32768.0), -32768,
                      32767).astype("<i2").tobytes()
    elif bits == 8:
        raw = np.clip(np.round(a * 128.0 + 128.0), 0,
                      255).astype(np.uint8).tobytes()
    elif bits == 32:
        raw = np.clip(np.round(a * 2147483648.0), -2147483648,
                      2147483647).astype("<i4").tobytes()
    else:
        raise ValueError("bits must be 8, 16 or 32")
    block = nch * bits // 8
    fmt = struct.pack("<HHIIHH", 1, nch, rate, rate * block, block, bits)
    chunks = (b"WAVE"
              + b"fmt " + struct.pack("<I", len(fmt)) + fmt
              + b"data" + struct.pack("<I", len(raw)) + raw
              + (b"\x00" if len(raw) & 1 else b""))
    return b"RIFF" + struct.pack("<I", len(chunks)) + chunks


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# channels per pixel by PNG color type: 0=gray, 2=RGB, 3=palette index,
# 4=gray+alpha, 6=RGBA
_PNG_NCH = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _png_unfilter(raw: bytes, h: int, stride: int, bpp: int) -> np.ndarray:
    """Reverse the five PNG scanline filters (spec §6): returns the
    (h, stride) reconstructed bytes. None/Up/Sub rows are vectorized
    (Sub is a per-lane cumsum mod 256); Average/Paeth recurse on the
    just-reconstructed left pixel, so those rows walk pixels with
    bpp-wide vector steps."""
    arr = np.frombuffer(raw, dtype=np.uint8)
    if arr.size != h * (stride + 1):
        raise ValueError(
            f"bad PNG pixel-data length: {arr.size} != {h * (stride + 1)}")
    arr = arr.reshape(h, stride + 1)
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        f = int(arr[y, 0])
        r = arr[y, 1:]
        if f == 0:          # None
            row = r.copy()
        elif f == 2:        # Up (uint8 addition wraps mod 256)
            row = r + prev
        elif f == 1:        # Sub: recon[x] = raw[x] + recon[x-bpp]
            lanes = r.reshape(-1, bpp).astype(np.int64)
            row = (np.cumsum(lanes, axis=0) % 256).astype(
                np.uint8).reshape(-1)
        elif f in (3, 4):   # Average / Paeth: left-recursive
            row = np.empty(stride, dtype=np.uint8)
            ri = r.astype(np.int32)
            pv = prev.astype(np.int32)
            left = np.zeros(bpp, dtype=np.int32)
            ul = np.zeros(bpp, dtype=np.int32)
            for x0 in range(0, stride, bpp):
                up = pv[x0:x0 + bpp]
                if f == 3:
                    pred = (left + up) >> 1
                else:
                    p = left + up - ul
                    pa = np.abs(p - left)
                    pb = np.abs(p - up)
                    pc = np.abs(p - ul)
                    pred = np.where((pa <= pb) & (pa <= pc), left,
                                    np.where(pb <= pc, up, ul))
                cur = (ri[x0:x0 + bpp] + pred) & 0xFF
                row[x0:x0 + bpp] = cur
                left = cur
                ul = up
        else:
            raise ValueError(f"invalid PNG filter type {f}")
        out[y] = row
        prev = row
    return out


@_clean_decode_errors("PNG")
def decode_png(payload: bytes) -> np.ndarray:
    """PNG → (height, width, 3) float64 RGB in [0, 1].

    Spec-level implementation over stdlib zlib: chunk stream with CRC
    verification, IHDR/PLTE/IDAT/IEND, bit depth 8, color types 0
    (gray), 2 (RGB), 3 (palette), 4 (gray+alpha), 6 (RGBA), all five
    scanline filters, non-interlaced only (Adam7 raises). Alpha is
    dropped and gray is expanded to 3 channels so the pixel contract
    matches decode_bmp (identical float64 array for identical pixels —
    the media goldens rely on this)."""
    import zlib
    b = bytes(payload)
    if b[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload (missing signature)")
    pos, ihdr, plte, idat, ended = 8, None, None, [], False
    while pos + 12 <= len(b):
        ln, typ = struct.unpack_from(">I4s", b, pos)
        data = b[pos + 8: pos + 8 + ln]
        if len(data) < ln:
            raise ValueError("truncated PNG chunk")
        crc = struct.unpack_from(">I", b, pos + 8 + ln)[0]
        if zlib.crc32(typ + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk CRC mismatch in {typ!r}")
        pos += 12 + ln
        if typ == b"IHDR":
            if len(data) != 13:
                raise ValueError("bad PNG IHDR length")
            ihdr = struct.unpack(">IIBBBBB", data)
        elif typ == b"PLTE":
            if len(data) % 3:
                raise ValueError("PLTE length not a multiple of 3")
            plte = np.frombuffer(data, np.uint8).reshape(-1, 3)
        elif typ == b"IDAT":
            idat.append(data)
        elif typ == b"IEND":
            ended = True
            break
    if ihdr is None or not ended or not idat:
        raise ValueError("PNG missing IHDR/IDAT/IEND")
    w, h, depth, ctype, comp, fmeth, interlace = ihdr
    if w == 0 or h == 0 or w * h > _MAX_PIXELS:
        raise ValueError("invalid PNG dimensions")
    if comp != 0 or fmeth != 0:
        raise ValueError("invalid PNG compression/filter method")
    if interlace != 0:
        raise NotImplementedError("Adam7-interlaced PNG not supported")
    if depth != 8 or ctype not in _PNG_NCH:
        raise NotImplementedError(
            f"only 8-bit-depth PNG color types 0/2/3/4/6 supported "
            f"(depth={depth}, color_type={ctype})")
    if ctype == 3 and plte is None:
        raise ValueError("palette PNG without PLTE chunk")
    nch = _PNG_NCH[ctype]
    stride = w * nch
    # bounded inflate: the expected pixel-data size is known, so a
    # deflate bomb can never expand past it (+1 detects oversize)
    want = h * (stride + 1)
    dec = zlib.decompressobj()
    raw = dec.decompress(b"".join(idat), want + 1)
    if len(raw) > want or (not dec.eof and dec.unconsumed_tail):
        raise ValueError("PNG pixel data exceeds expected size")
    recon = _png_unfilter(raw, h, stride, nch)
    px = recon.reshape(h, w, nch)
    if ctype == 0:
        rgb = np.repeat(px, 3, axis=2)
    elif ctype == 2:
        rgb = px
    elif ctype == 3:
        if int(px.max()) >= len(plte):
            raise ValueError("palette index out of range")
        rgb = plte[px[:, :, 0]]
    elif ctype == 4:
        rgb = np.repeat(px[:, :, :1], 3, axis=2)
    else:  # 6
        rgb = px[:, :, :3]
    # same canonical C layout + dtype rule as decode_bmp (see there)
    return np.ascontiguousarray(rgb).astype(np.float64) / 255.0


def _png_filter_row(f: int, row: np.ndarray, prev: np.ndarray,
                    bpp: int) -> np.ndarray:
    """Forward scanline filter for the encoder (filters reference the
    reconstructed bytes, which equal the raw bytes — lossless)."""
    if f == 0:
        return row.copy()
    r = row.astype(np.int32)
    pv = prev.astype(np.int32)
    left = np.concatenate([np.zeros(bpp, np.int32), r[:-bpp]]) \
        if r.size >= bpp else np.zeros_like(r)
    if f == 1:
        return ((r - left) & 0xFF).astype(np.uint8)
    if f == 2:
        return ((r - pv) & 0xFF).astype(np.uint8)
    if f == 3:
        return ((r - ((left + pv) >> 1)) & 0xFF).astype(np.uint8)
    if f == 4:
        ul = np.concatenate([np.zeros(bpp, np.int32), pv[:-bpp]]) \
            if pv.size >= bpp else np.zeros_like(pv)
        p = left + pv - ul
        pa = np.abs(p - left)
        pb = np.abs(p - pv)
        pc = np.abs(p - ul)
        pred = np.where((pa <= pb) & (pa <= pc), left,
                        np.where(pb <= pc, pv, ul))
        return ((r - pred) & 0xFF).astype(np.uint8)
    raise ValueError(f"invalid PNG filter type {f}")


def encode_png(img: np.ndarray, color_type: int | None = None,
               filter_type: int | str = 0) -> bytes:
    """Pixels → PNG bytes (8-bit depth, non-interlaced).

    ``img``: (h, w) gray, or (h, w, {1,2,3,4}) gray/gray+alpha/RGB/RGBA,
    uint8 or float in [0, 1]. ``color_type`` defaults to match the
    channel count (0/4/2/6; palette type 3 is decode-only).
    ``filter_type``: one scanline filter 0-4 for every row,
    or ``'mixed'`` to cycle through all five (row y uses filter y % 5) —
    the fixture/test-data inverse of decode_png; round-trip is exact for
    uint8 inputs under every filter choice."""
    import zlib
    a = np.asarray(img)
    if a.dtype != np.uint8:
        a = np.clip(np.round(a * 255.0), 0, 255).astype(np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, nch = a.shape
    if color_type is None:
        color_type = {1: 0, 2: 4, 3: 2, 4: 6}[nch]
    if _PNG_NCH.get(color_type) != nch or color_type == 3:
        raise ValueError(
            f"color_type {color_type} incompatible with {nch} channels")
    rows = np.ascontiguousarray(a.reshape(h, w * nch))
    prev = np.zeros(w * nch, dtype=np.uint8)
    parts = []
    for y in range(h):
        f = (y % 5) if filter_type == "mixed" else int(filter_type)
        parts.append(bytes([f]))
        parts.append(_png_filter_row(f, rows[y], prev, nch).tobytes())
        prev = rows[y]
    raw = b"".join(parts)

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + typ + data
                + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (_PNG_SIG + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw, 9)) + chunk(b"IEND", b""))


def decode_image(payload: bytes, fake: bool = False) -> np.ndarray:
    """Dispatch decode by magic number. BMP, PNG, GIF (first composited
    frame) and baseline JPEG decode for real; ``fake=True`` routes
    everything through the deterministic sha256 pseudo-decode (plumbing
    tests, golden-pinned queries)."""
    b = bytes(payload)
    if fake:
        return _fake_decode(b)
    if b[:2] == b"BM":
        return decode_bmp(b)
    if b[:8] == _PNG_SIG:
        return decode_png(b)
    if b[:6] in (b"GIF87a", b"GIF89a"):
        return decode_gif(b)[0][0]  # first composited frame
    if b[:3] == b"\xff\xd8\xff":
        return decode_jpeg(b)
    if b[:4] == b"RIFF" and b[8:12] == b"AVI ":
        return decode_avi(b)[0][0]  # first frame
    raise ValueError("unrecognized image payload")


def attach_media_metadata(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Cheap metadata without decoding: byte length + magic-number mime."""
    p = F.col(payload_col)
    mime = (F.when(F.expr(f"substring({payload_col}, 1, 3)") == bytes(b"\xff\xd8\xff"), "image/jpeg")
            .when(F.expr(f"substring({payload_col}, 2, 3)") == bytes(b"PNG"), "image/png")
            .when(F.expr(f"substring({payload_col}, 1, 4)") == bytes(b"GIF8"), "image/gif")
            .when((F.expr(f"substring({payload_col}, 1, 4)") == bytes(b"RIFF"))
                  & (F.expr(f"substring({payload_col}, 9, 4)") == bytes(b"AVI ")),
                  "video/x-msvideo")
            .when((F.expr(f"substring({payload_col}, 1, 4)") == bytes(b"RIFF"))
                  & (F.expr(f"substring({payload_col}, 9, 4)") == bytes(b"WAVE")),
                  "audio/wav")
            .otherwise("application/octet-stream"))
    return df.withColumn("n_bytes", F.length(p)).withColumn("mime_sniffed", mime)


def _skip_guard(on_error: str):
    """Shared error policy for the media feature extractors. At cluster
    scale one corrupt payload must not kill a 1000-executor job:
    ``on_error='skip'`` drops the failing row (any decode exception —
    corrupt bytes raise ValueError, unsupported-but-valid formats raise
    NotImplementedError, and a skip must shield against both plus
    anything unforeseen) while ``'raise'`` (default) keeps fail-fast
    semantics for gated/golden paths. Skipped ids are discoverable with
    an anti-join against the input."""
    if on_error not in ("raise", "skip"):
        raise ValueError("on_error must be 'raise' or 'skip'")
    return on_error == "skip"


def image_features(media: DataFrame, fake: bool = False,
                   id_col: str = "media_id",
                   on_error: str = "raise") -> DataFrame:
    """Per-image feature vector (mean/std per channel) via mapInPandas.

    ``fake=False`` (default) decodes REAL payloads (BMP, PNG, GIF first
    frame, baseline JPEG — see decode_image).
    ``fake=True`` keeps the deterministic sha256 pseudo-decode on the
    identical Arrow path (plumbing tests + the golden-pinned
    ``media_features`` query). ``on_error='skip'`` drops undecodable
    rows instead of failing the job (see _skip_guard).
    """
    skip = _skip_guard(on_error)
    schema = T.StructType([
        T.StructField(id_col, T.LongType()),
        T.StructField("features", T.ArrayType(T.DoubleType())),
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, feats = [], []
            for mid, payload in zip(pdf[id_col], pdf["payload"]):
                try:
                    img = decode_image(bytes(payload), fake=fake)
                except Exception:
                    if skip:
                        continue
                    raise
                feats.append(np.concatenate([img.mean(axis=(0, 1)),
                                             img.std(axis=(0, 1))]).tolist())
                ids.append(mid)
            if ids:  # an all-skipped batch yields nothing (a bare
                # {[], []} dict would give Arrow an untyped float column)
                yield pd.DataFrame({id_col: ids, "features": feats})

    return media.select(id_col, "payload").mapInPandas(run, schema)


def audio_features(media: DataFrame, id_col: str = "media_id",
                   on_error: str = "raise") -> DataFrame:
    """Per-clip audio features from REAL WAV payloads via mapInPandas:
    duration_ms, per-clip RMS, mean, and zero-crossing rate (channel-
    averaged) — the standard cheap audio-quality signals for a
    training-data pipeline. ``on_error='skip'`` drops undecodable rows
    instead of failing the job (see _skip_guard)."""
    skip = _skip_guard(on_error)
    schema = T.StructType([
        T.StructField(id_col, T.LongType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("mean", T.DoubleType()),
        T.StructField("zcr", T.DoubleType()),
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = []
            for mid, payload in zip(pdf[id_col], pdf["payload"]):
                try:
                    x, rate = decode_wav(bytes(payload))
                except Exception:
                    if skip:
                        continue
                    raise
                n = x.shape[0]
                zc = (np.signbit(x[1:]) != np.signbit(x[:-1])).mean() \
                    if n > 1 else 0.0
                recs.append({id_col: mid,
                             "duration_ms": int(round(n * 1000.0 / rate)),
                             "rms": float(np.sqrt((x ** 2).mean())),
                             "mean": float(x.mean()),
                             "zcr": float(zc)})
            yield pd.DataFrame(recs, columns=[f.name for f in schema.fields])

    return media.select(id_col, "payload").mapInPandas(run, schema)


def frame_sample(media: DataFrame, every_ms: int = 1000, fake: bool = True,
                 id_col: str = "media_id",
                 on_error: str = "raise") -> DataFrame:
    """Video/animation → sampled frame rows (media_id, frame_idx, t_ms,
    features).

    ``fake=False`` decodes REAL payloads: animated GIF (operators/gif)
    and MJPEG AVI video (operators/avi) — the two moving-picture
    containers whose entropy stages are in-scope without codec
    libraries. Frame timing comes from the container (GIF: Graphic
    Control Extension delays; AVI: the vids stream's dwScale/dwRate);
    the frame visible at each sample instant t (the last frame whose
    cumulative start time is <= t) is composited and reduced to
    per-channel means. Sample instants run every ``every_ms`` over
    [0, total_duration) — a zero-total-duration animation yields one
    sample at t=0 of the final canvas. Containers needing real codecs
    (MP4/H.264 etc.) raise NotImplementedError. ``fake=True`` keeps the
    deterministic sha256 pseudo-decode driven by meta.duration_ms
    (plumbing tests, golden-pinned queries). ``on_error='skip'`` drops
    undecodable/unsupported rows instead of failing the job (see
    _skip_guard)."""
    skip = _skip_guard(on_error)
    schema = T.StructType([
        T.StructField(id_col, T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("t_ms", T.LongType()),
        T.StructField("features", T.ArrayType(T.DoubleType())),
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = []
            for row in pdf.itertuples(index=False):
                rid = getattr(row, id_col)
                if not fake:
                    try:
                        b = bytes(row.payload)
                        if b[:6] in (b"GIF87a", b"GIF89a"):
                            frames, delays = decode_gif(b)
                        elif b[:4] == b"RIFF" and b[8:12] == b"AVI ":
                            frames, delays = decode_avi(b)
                        else:
                            raise NotImplementedError(
                                "real video decode beyond animated GIF "
                                "and MJPEG AVI requires codec libraries "
                                "not in this container")
                    except Exception:
                        if skip:
                            continue
                        raise
                    starts = np.concatenate(
                        [[0], np.cumsum(delays)[:-1]])
                    total = int(sum(delays))
                    for i, t in enumerate(range(0, max(total, 1),
                                                every_ms)):
                        fi = int(np.searchsorted(starts, t,
                                                 side="right") - 1)
                        recs.append({id_col: rid, "frame_idx": i,
                                     "t_ms": t,
                                     "features": frames[fi].mean(
                                         axis=(0, 1)).tolist()})
                    continue
                dur = int(row.meta["duration_ms"] if isinstance(row.meta, dict)
                          else (row.meta.duration_ms or 0))
                for i, t in enumerate(range(0, max(dur, 1), every_ms)):
                    img = _fake_decode(bytes(row.payload) + t.to_bytes(8, "little"))
                    recs.append({id_col: rid, "frame_idx": i,
                                 "t_ms": t,
                                 "features": img.mean(axis=(0, 1)).tolist()})
            yield pd.DataFrame(recs, columns=[f.name for f in schema.fields])

    # the real path gets timing from the GIF's own delays — only the
    # fake path needs meta.duration_ms, so only it requires the column
    cols = [id_col, "payload"] + (["meta"] if fake else [])
    return media.select(*cols).mapInPandas(run, schema)
