"""MJPEG-in-AVI video container codec (pure Python/NumPy, public spec).

Closes the "real video decode" gap in the multimodal layer
(`frame_sample` previously raised NotImplementedError for anything but
animated GIF): the RIFF AVI container (Microsoft "AVI RIFF File
Reference") carrying Motion-JPEG — every ``00dc`` chunk of the video
stream is a complete baseline JPEG, decoded by ``operators/jpeg``'s
pinned-integer codec. MJPEG is the one *video* codec whose entropy and
transform stages are fully in scope without external codec libraries
(the per-frame payload IS baseline JPEG, which this repo already
implements and golden-pins); inter-frame codecs (H.264/VP9/AV1 etc.)
stay NotImplementedError per the decoder error contract
(valid-but-unsupported), and corrupt containers raise ValueError.

Decoder contract matches ``decode_gif``: ``decode_avi(bytes) ->
(frames, delays_ms)`` where each frame is the full (h, w, 3) float64
RGB canvas in [0, 1] and ``delays_ms`` are integer per-frame display
durations. AVI timing is uniform — a ``vids`` stream plays at
``dwRate / dwScale`` frames per second (AVIStreamHeader) — so the
delays are derived with exact integer arithmetic::

    delay[i] = ((i+1) * 1000 * dwScale) // dwRate
             - ( i    * 1000 * dwScale) // dwRate

which sums telescopically to ``(n * 1000 * dwScale) // dwRate`` (total
duration, floor-ms) and is therefore independent of frame order — the
same order-independence rule the JPEG codec pins for its lossy stages,
so goldens can re-derive timing without this module.

Layout notes (all little-endian; every chunk is padded to even size):

    RIFF('AVI '
      LIST('hdrl'
        avih(MainAVIHeader, 56 bytes)
        LIST('strl' strh(AVIStreamHeader, 56) strf(BITMAPINFOHEADER, 40)) x streams
      )
      LIST('movi'  {'%02d'%stream}dc(<JPEG>) ...   [or nested LIST('rec ')]
      idx1(AVIINDEXENTRY x n)                       [optional]
    )

The demuxer walks the ``movi`` list directly (including ``rec `` record
sub-lists) instead of trusting ``idx1`` — players do the same for files
with absent or absolute-offset indexes.
"""

from __future__ import annotations

import functools
import struct
from typing import List, Tuple

import numpy as np

from .jpeg import decode_jpeg, encode_jpeg

__all__ = ["decode_avi", "encode_avi"]

# decompression-bomb guards, same posture as the image decoders: a
# corrupt header field raises instead of allocating. Per-frame pixel
# count is additionally capped inside decode_jpeg (_MAX_PIXELS); the
# total cap here bounds frames x pixels for the whole container.
_MAX_FRAMES = 1 << 14
_MAX_TOTAL_PIXELS = 1 << 28


def _clean_avi_errors(fn):
    """Truncated/corrupt containers surface as ValueError (never
    IndexError/struct.error/KeyError), matching the shared decoder
    error contract the media extractors' on_error='skip' relies on."""
    @functools.wraps(fn)
    def wrap(*a, **kw):
        try:
            return fn(*a, **kw)
        except (IndexError, struct.error, KeyError, OverflowError) as e:
            raise ValueError(f"corrupt AVI payload: {e}") from e
    return wrap


def _chunks(b: bytes, pos: int, end: int):
    """Yield (fourcc, data_start, data_size) walking [pos, end); every
    chunk is padded to even length per RIFF."""
    while pos + 8 <= end:
        fcc = b[pos:pos + 4]
        (size,) = struct.unpack_from("<I", b, pos + 4)
        start = pos + 8
        if start + size > end:
            raise ValueError("RIFF chunk overruns its parent")
        yield fcc, start, size
        pos = start + size + (size & 1)


@_clean_avi_errors
def decode_avi(payload: bytes) -> Tuple[List[np.ndarray], List[int]]:
    """MJPEG AVI bytes -> (frames, delays_ms); see module docstring."""
    b = bytes(payload)
    if b[:4] != b"RIFF" or b[8:12] != b"AVI ":
        raise ValueError("not an AVI payload (missing RIFF/'AVI ' magic)")
    (riff_size,) = struct.unpack_from("<I", b, 4)
    if 8 + riff_size > len(b):
        raise ValueError("truncated AVI (RIFF size exceeds payload)")
    end = 8 + riff_size

    vids_stream = None          # index of the video stream among streams
    scale = rate = None
    handler = compression = b""
    width = height = 0
    stream_idx = 0
    movi = None                 # (start, end) of the movi list body

    for fcc, start, size in _chunks(b, 12, end):
        if fcc != b"LIST":
            continue
        ltype = b[start:start + 4]
        if ltype == b"hdrl":
            for f2, s2, z2 in _chunks(b, start + 4, start + size):
                if f2 != b"LIST" or b[s2:s2 + 4] != b"strl":
                    continue
                strh = strf = None
                for f3, s3, z3 in _chunks(b, s2 + 4, s2 + z2):
                    if f3 == b"strh":
                        strh = (s3, z3)
                    elif f3 == b"strf":
                        strf = (s3, z3)
                if strh is None:
                    raise ValueError("strl list without strh header")
                fcc_type = b[strh[0]:strh[0] + 4]
                if fcc_type == b"vids" and vids_stream is None:
                    if strh[1] < 32:
                        raise ValueError("short strh for vids stream")
                    handler = b[strh[0] + 4:strh[0] + 8]
                    scale, rate = struct.unpack_from("<II", b, strh[0] + 20)
                    if strf is not None and strf[1] >= 40:
                        (_, width, height, _, _, compression) = \
                            struct.unpack_from("<IiiHH4s", b, strf[0])
                    vids_stream = stream_idx
                stream_idx += 1
        elif ltype == b"movi" and movi is None:
            movi = (start + 4, start + size)

    if vids_stream is None:
        raise ValueError("AVI has no video ('vids') stream")
    if movi is None:
        raise ValueError("AVI has no movi list")
    if not rate or not scale:
        raise ValueError("vids stream has zero dwRate/dwScale timing")
    up = (handler.upper(), compression.upper())
    if b"MJPG" not in up:
        raise NotImplementedError(
            "AVI video codec %r requires codec libraries not in this "
            "container (only MJPG is supported)" % handler.decode(
                "ascii", "replace"))

    want = (b"%02ddc" % vids_stream, b"%02ddb" % vids_stream)
    frames: List[np.ndarray] = []
    total_px = 0

    def walk_movi(pos: int, stop: int):
        nonlocal total_px
        for f2, s2, z2 in _chunks(b, pos, stop):
            if f2 == b"LIST" and b[s2:s2 + 4] == b"rec ":
                walk_movi(s2 + 4, s2 + z2)
            elif f2 in want:
                if len(frames) >= _MAX_FRAMES:
                    raise ValueError(
                        "AVI frame count exceeds decompression-bomb "
                        f"guard ({_MAX_FRAMES} frames)")
                img = decode_jpeg(b[s2:s2 + z2])
                total_px += img.shape[0] * img.shape[1]
                if total_px > _MAX_TOTAL_PIXELS:
                    raise ValueError(
                        "AVI total pixel count exceeds decompression-"
                        f"bomb guard ({_MAX_TOTAL_PIXELS} px)")
                if width and height and \
                        img.shape[:2] != (abs(height), width):
                    raise ValueError(
                        "frame dimensions disagree with BITMAPINFOHEADER")
                frames.append(img)

    walk_movi(movi[0], movi[1])
    if not frames:
        raise ValueError("AVI movi list has no frames for the vids stream")
    s, r = int(scale), int(rate)
    delays = [((i + 1) * 1000 * s) // r - (i * 1000 * s) // r
              for i in range(len(frames))]
    return frames, delays


def encode_avi(frames, fps: int = 2, quality: int = 75,
               subsampling: str = "4:4:4") -> bytes:
    """uint8/float frames (each (h, w[, 3])) -> MJPEG AVI bytes.

    Each frame is encoded as baseline JPEG (``operators/jpeg`` — the
    pinned-integer codec, so decode(encode(px)) is re-derivable without
    the engine) and wrapped as a ``00dc`` chunk; timing is dwScale=1,
    dwRate=fps. An ``idx1`` index is emitted for spec completeness
    (offsets relative to the 'movi' fourcc, keyframe-flagged — MJPEG
    frames are all keyframes)."""
    if not frames:
        raise ValueError("encode_avi requires at least one frame")
    if fps <= 0:
        raise ValueError("fps must be positive")
    payloads = [encode_jpeg(f, quality=quality, subsampling=subsampling)
                for f in frames]
    h, w = np.asarray(frames[0]).shape[:2]
    for f in frames[1:]:
        if np.asarray(f).shape[:2] != (h, w):
            raise ValueError("all frames must share one (h, w)")

    def chunk(fcc: bytes, data: bytes) -> bytes:
        pad = b"\x00" if len(data) & 1 else b""
        return fcc + struct.pack("<I", len(data)) + data + pad

    def lst(ltype: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", ltype + body)

    max_bytes = max(len(p) for p in payloads)
    avih = struct.pack(
        "<IIIIIIIIII4I",
        1_000_000 // fps,            # dwMicroSecPerFrame
        max_bytes * fps,             # dwMaxBytesPerSec (upper bound)
        0,                           # dwPaddingGranularity
        0x10,                        # dwFlags: AVIF_HASINDEX
        len(payloads), 0, 1,         # totalframes, initialframes, streams
        max_bytes,                   # dwSuggestedBufferSize
        w, h, 0, 0, 0, 0)
    strh = struct.pack(
        "<4s4sIHHIIIIIIiI4h",
        b"vids", b"MJPG", 0, 0, 0, 0,
        1, fps,                      # dwScale, dwRate
        0, len(payloads),            # dwStart, dwLength (frames)
        max_bytes, -1, 0,            # bufsize, quality (signed), samplesize
        0, 0, w, h)                  # rcFrame
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, w, h, 1, 24, b"MJPG",
        h * w * 3, 0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))

    movi_body = b""
    index = b""
    for p in payloads:
        # idx1 offsets are relative to the 'movi' fourcc position
        off = 4 + len(movi_body)
        index += struct.pack("<4sIII", b"00dc", 0x10, off, len(p))
        movi_body += chunk(b"00dc", p)
    movi = lst(b"movi", movi_body)
    body = b"AVI " + hdrl + movi + chunk(b"idx1", index)
    return b"RIFF" + struct.pack("<I", len(body)) + body
