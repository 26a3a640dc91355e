"""Animated-GIF codec (pure Python/NumPy, public GIF87a/89a spec).

Backs the REAL path of ``operators/multimodal.frame_sample``: GIF is the
one widely-deployed animation container whose entropy stage (LZW) needs
no external codec library, so the video-column plumbing can be exercised
end-to-end on real bytes.

Decoder: header + logical screen descriptor, global/local color tables,
Graphic Control Extensions (per-frame delay, disposal methods 0-3,
transparency index), interlaced and non-interlaced image descriptors,
and a spec-complete LZW decoder (growing code widths to 12 bits, CLEAR /
EOI, the KwKwK code==next_code case, deferred-clear full dictionaries).
Frames are composited onto the logical screen and returned as full
canvases — the shape a frame sampler wants.

Encoder (fixture/test-data inverse): exact global palette (≤ 256
distinct colors), optional per-frame delay/disposal/transparency/
interlace, LZW written with the classic clear-often "uncompressed GIF"
trick (a CLEAR every 2^min_code_size − 2 literals keeps the decoder's
dictionary below the first width growth — valid LZW, no compression).
Round-trip is exact for palette-sized inputs; the decoder is also pinned
by hand-built code streams independent of the encoder.
"""

from __future__ import annotations

import struct
from typing import List, Optional, Tuple

import numpy as np

__all__ = ["decode_gif", "encode_gif"]


# ---------------------------------------------------------------------------
# LZW
# ---------------------------------------------------------------------------

def _lzw_decode(data: bytes, min_code_size: int) -> bytes:
    """GIF-variant LZW: LSB-first bit packing, code width grows from
    min_code_size+1 as the dictionary fills, capped at 12 bits (a full
    dictionary keeps emitting existing codes until a CLEAR — the
    'deferred clear' case)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = nbits = pos = 0
    width = min_code_size + 1
    table: dict = {}
    prev: Optional[bytes] = None
    next_code = eoi + 1

    def reset():
        nonlocal width, table, prev, next_code
        width = min_code_size + 1
        table = {i: bytes([i]) for i in range(clear)}
        prev = None
        next_code = eoi + 1

    reset()
    while True:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("truncated GIF LZW stream (no EOI)")
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            reset()
            continue
        if code == eoi:
            return bytes(out)
        if prev is None:
            entry = table.get(code)
            if entry is None:
                raise ValueError("GIF LZW: first code after CLEAR "
                                 "is not a root")
        elif code < next_code:
            entry = table[code]
            if next_code < 4096:
                table[next_code] = prev + entry[:1]
                next_code += 1
        elif code == next_code and next_code < 4096:
            entry = prev + prev[:1]          # KwKwK
            table[next_code] = entry
            next_code += 1
        else:
            raise ValueError(f"corrupt GIF LZW stream (code {code})")
        out += entry
        prev = entry
        if next_code == (1 << width) and width < 12:
            width += 1


def _lzw_encode_uncompressed(indices: np.ndarray,
                             min_code_size: int) -> bytes:
    """Valid LZW with zero compression: every pixel a root code, a CLEAR
    every 2^min_code_size − 2 literals so the decoder's dictionary never
    reaches the first width growth — the code width stays
    min_code_size+1 throughout, which keeps the writer trivial."""
    clear = 1 << min_code_size
    eoi = clear + 1
    width = min_code_size + 1
    out = bytearray()
    acc = nbits = 0

    def emit(code: int):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    burst = 0
    limit = (1 << min_code_size) - 2
    for idx in np.asarray(indices, dtype=np.int64).ravel():
        if burst == limit:
            emit(clear)
            burst = 0
        emit(int(idx))
        burst += 1
    emit(eoi)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _subblocks(data: bytes) -> bytes:
    """Chop a byte stream into ≤255-byte length-prefixed sub-blocks,
    zero-terminated."""
    parts = []
    for i in range(0, len(data), 255):
        chunk = data[i:i + 255]
        parts.append(bytes([len(chunk)]) + chunk)
    parts.append(b"\x00")
    return b"".join(parts)


def _read_subblocks(b: bytes, pos: int) -> Tuple[bytes, int]:
    parts = []
    while True:
        if pos >= len(b):
            raise ValueError("truncated GIF sub-blocks")
        n = b[pos]
        pos += 1
        if n == 0:
            return b"".join(parts), pos
        parts.append(b[pos:pos + n])
        if len(parts[-1]) < n:
            raise ValueError("truncated GIF sub-block")
        pos += n


def _deinterlace_order(h: int) -> np.ndarray:
    """Row order of an interlaced image's stored rows (GIF spec
    appendix E): pass 1 rows 0,8,16…, pass 2 rows 4,12…, pass 3 rows
    2,6,10…, pass 4 rows 1,3,5…. Returned array maps stored-row index →
    display-row index."""
    return np.concatenate([np.arange(0, h, 8), np.arange(4, h, 8),
                           np.arange(2, h, 4), np.arange(1, h, 2)])


# ---------------------------------------------------------------------------
# Decode
# ---------------------------------------------------------------------------

def _clean_gif_errors(fn):
    """struct internals from corrupt payloads surface as ValueError —
    the (ValueError, NotImplementedError) decoder error contract."""
    import functools

    @functools.wraps(fn)
    def inner(*a, **k):
        try:
            return fn(*a, **k)
        except (struct.error, OverflowError, IndexError) as e:
            # IndexError = a bytes[] access past a truncation point —
            # every such site is a corrupt-payload symptom
            raise ValueError(f"corrupt GIF payload: {e}") from e
    return inner


@_clean_gif_errors
def decode_gif(payload: bytes) -> Tuple[List[np.ndarray], List[int]]:
    """GIF bytes → (frames, delays_ms).

    Each frame is the full (height, width, 3) float64 RGB canvas in
    [0, 1] AFTER compositing that image (same dtype/layout contract as
    decode_bmp/decode_png); delays are the Graphic Control Extension
    delays in milliseconds (0 when absent). Disposal methods: 0/1 leave
    the canvas, 2 restores the frame's region to the background color,
    3 restores the pre-frame canvas. Transparent pixels leave the
    underlying canvas visible."""
    b = bytes(payload)
    if b[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload (missing GIF87a/89a magic)")
    if len(b) < 13:
        raise ValueError("truncated GIF header")
    w, h, packed, bg_idx, _aspect = struct.unpack_from("<HHBBB", b, 6)
    if w == 0 or h == 0 or w * h > (1 << 26):
        # same decompression-bomb guard as the other decoders: a corrupt
        # dimension field raises instead of allocating a huge canvas
        raise ValueError("invalid GIF dimensions")
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(b[pos:pos + 3 * n], np.uint8).reshape(-1, 3)
        if len(gct) < n:
            raise ValueError("truncated GIF global color table")
        pos += 3 * n
    bg_rgb = (gct[bg_idx] if gct is not None and bg_idx < len(gct)
              else np.zeros(3, np.uint8))
    canvas = np.tile(bg_rgb, (h, w, 1)).astype(np.uint8)
    frames: List[np.ndarray] = []
    delays: List[int] = []
    delay_ms = 0
    disposal = 0
    transparent: Optional[int] = None
    while True:
        if pos >= len(b):
            raise ValueError("truncated GIF (no trailer)")
        block = b[pos]
        pos += 1
        if block == 0x3B:            # trailer
            break
        if block == 0x21:            # extension
            label = b[pos]
            pos += 1
            data, pos = _read_subblocks(b, pos)
            if label == 0xF9:        # Graphic Control Extension
                if len(data) < 4:
                    raise ValueError("short GIF graphic control block")
                gpacked = data[0]
                disposal = (gpacked >> 2) & 0x07
                delay_ms = struct.unpack_from("<H", data, 1)[0] * 10
                transparent = data[3] if gpacked & 0x01 else None
            continue                 # comments/app extensions skipped
        if block != 0x2C:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
        left, top, fw, fh, ipacked = struct.unpack_from("<HHHHB", b, pos)
        pos += 9
        if left + fw > w or top + fh > h or fw == 0 or fh == 0:
            raise ValueError("GIF frame exceeds logical screen")
        ct = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            ct = np.frombuffer(b[pos:pos + 3 * n], np.uint8).reshape(-1, 3)
            if len(ct) < n:
                raise ValueError("truncated GIF local color table")
            pos += 3 * n
        if ct is None:
            raise ValueError("GIF frame without any color table")
        min_code = b[pos]
        pos += 1
        if not 2 <= min_code <= 11:
            raise ValueError(f"invalid GIF LZW min code size {min_code}")
        lzw, pos = _read_subblocks(b, pos)
        idx = np.frombuffer(_lzw_decode(lzw, min_code), np.uint8)
        if idx.size < fw * fh:
            raise ValueError("GIF frame pixel data too short")
        idx = idx[: fw * fh].reshape(fh, fw)
        if ipacked & 0x40:           # interlaced
            display = np.empty_like(idx)
            display[_deinterlace_order(fh)] = idx
            idx = display
        if int(idx.max()) >= len(ct):
            raise ValueError("GIF color index out of table range")
        saved = canvas.copy() if disposal == 3 else None
        region = canvas[top:top + fh, left:left + fw]
        if transparent is None:
            region[:] = ct[idx]
        else:
            opaque = idx != transparent
            region[opaque] = ct[idx[opaque]]
        frames.append(np.ascontiguousarray(canvas).astype(np.float64)
                      / 255.0)
        delays.append(delay_ms)
        if disposal == 2:
            canvas[top:top + fh, left:left + fw] = bg_rgb
        elif disposal == 3:
            canvas = saved
        delay_ms, disposal, transparent = 0, 0, None  # GCE is one-shot
    if not frames:
        raise ValueError("GIF contains no image data")
    return frames, delays


# ---------------------------------------------------------------------------
# Encode
# ---------------------------------------------------------------------------

def encode_gif(frames, delays_ms=None, disposal=1,
               transparent_rgb=None, interlace: bool = False) -> bytes:
    """Frame list → animated GIF89a bytes (fixture/test-data inverse).

    ``frames``: list of (h, w, 3) uint8 (or float in [0, 1]) RGB arrays,
    all the same shape, with ≤ 256 distinct colors across all frames
    (exact global palette — no quantization). ``delays_ms`` rounds down
    to centiseconds. ``transparent_rgb``: that exact color encodes as
    the transparency index (the decoder then keeps the underlying canvas
    there). ``disposal``: one method for every frame or a per-frame
    list. Round-trip with decode_gif is exact under disposal 0/1."""
    fr = []
    for f in frames:
        a = np.asarray(f)
        if a.dtype != np.uint8:
            a = np.clip(np.round(a * 255.0), 0, 255).astype(np.uint8)
        fr.append(a)
    if not fr:
        raise ValueError("need at least one frame")
    h, w, _ = fr[0].shape
    if any(f.shape != (h, w, 3) for f in fr):
        raise ValueError("all frames must share one (h, w, 3) shape")
    colors = np.unique(np.concatenate([f.reshape(-1, 3) for f in fr],
                                      axis=0), axis=0)
    if transparent_rgb is not None:
        t = np.asarray(transparent_rgb, np.uint8).reshape(1, 3)
        colors = np.unique(np.concatenate([colors, t], axis=0), axis=0)
    if len(colors) > 256:
        raise ValueError(f"{len(colors)} distinct colors exceed the "
                         f"exact-palette limit of 256")
    ctbits = max(1, int(np.ceil(np.log2(max(2, len(colors))))))
    n_ct = 1 << ctbits
    palette = np.zeros((n_ct, 3), np.uint8)
    palette[: len(colors)] = colors
    lookup = {tuple(c): i for i, c in enumerate(colors)}
    t_idx = (lookup[tuple(np.asarray(transparent_rgb, np.uint8))]
             if transparent_rgb is not None else None)
    min_code = max(2, ctbits)
    # explicit None check + per-element int(): a numpy delays array would
    # break a truthiness check, and zip() would silently DROP frames on a
    # short list instead of failing loudly
    delays_ms = ([0] * len(fr) if delays_ms is None
                 else [int(d) for d in delays_ms])
    if len(delays_ms) != len(fr):
        raise ValueError("per-frame delays list length mismatch")
    disposals = (list(disposal) if isinstance(disposal, (list, tuple))
                 else [int(disposal)] * len(fr))
    if len(disposals) != len(fr):
        raise ValueError("per-frame disposal list length mismatch")
    out = [b"GIF89a",
           struct.pack("<HHBBB", w, h, 0x80 | (ctbits - 1), 0, 0),
           palette.tobytes()]
    for f, dms, disp in zip(fr, delays_ms, disposals):
        gpacked = (disp & 0x07) << 2
        ti = 0
        if t_idx is not None:
            gpacked |= 0x01
            ti = t_idx
        out.append(b"\x21\xf9\x04"
                   + bytes([gpacked])
                   + struct.pack("<H", int(dms) // 10)
                   + bytes([ti, 0]))
        idx = np.array([lookup[tuple(px)] for px in f.reshape(-1, 3)],
                       dtype=np.uint8).reshape(h, w)
        if interlace:
            idx = idx[_deinterlace_order(h)]
        out.append(b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h,
                                         0x40 if interlace else 0))
        out.append(bytes([min_code]))
        out.append(_subblocks(_lzw_encode_uncompressed(idx, min_code)))
    out.append(b"\x3b")
    return b"".join(out)
