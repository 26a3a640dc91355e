"""Baseline JPEG codec tests.

The load-bearing property is the pinned-integer-numerics contract
(operators/jpeg.py module docstring): every lossy stage is fixed-point
integer math whose result is independent of summation order, so the
scalar pure-Python re-derivation here — no NumPy vectorization, no
Huffman, shares only the public constants — must be BITWISE identical to
decode_jpeg(encode_jpeg(px)). That is what lets the driver-gate goldens
re-derive the lossy pipeline without the engine codecs.

The decoder is additionally pinned by a hand-assembled bitstream that
never touched the encoder (the GIF hand-built-LZW pattern).
"""

import numpy as np
import pytest

from dynamicaxiswarping_jl_spark.operators.jpeg import (
    _M13, _MAX_PIXELS, _QT_CHROMA, _QT_LUMA, _ZZ, _scaled_quant,
    decode_jpeg, encode_jpeg)

_M = [[int(_M13[i][j]) for j in range(8)] for i in range(8)]


# ---------------------------------------------------------------------------
# scalar oracle: the whole lossy pipeline in pure Python ints
# ---------------------------------------------------------------------------

def _fwd_color(px):
    h, w, _ = px.shape
    Y = [[0] * w for _ in range(h)]
    Cb = [[0] * w for _ in range(h)]
    Cr = [[0] * w for _ in range(h)]
    for i in range(h):
        for j in range(w):
            r, g, b = int(px[i, j, 0]), int(px[i, j, 1]), int(px[i, j, 2])
            y = (19595 * r + 38470 * g + 7471 * b + (1 << 15)) >> 16
            cb = ((-11058 * r - 21710 * g + 32768 * b + (1 << 15)) >> 16) + 128
            cr = ((32768 * r - 27439 * g - 5329 * b + (1 << 15)) >> 16) + 128
            Y[i][j] = min(max(y, 0), 255)
            Cb[i][j] = min(max(cb, 0), 255)
            Cr[i][j] = min(max(cr, 0), 255)
    return Y, Cb, Cr


def _pad_edge(P, mh, mw):
    h, w = len(P), len(P[0])
    H = ((h + mh - 1) // mh) * mh
    W = ((w + mw - 1) // mw) * mw
    return [[P[min(i, h - 1)][min(j, w - 1)] for j in range(W)]
            for i in range(H)]


def _box2(P):
    h, w = len(P), len(P[0])
    return [[(P[2 * i][2 * j] + P[2 * i][2 * j + 1]
              + P[2 * i + 1][2 * j] + P[2 * i + 1][2 * j + 1] + 2) >> 2
             for j in range(w // 2)] for i in range(h // 2)]


def _block_pipe(P, qt):
    """fDCT -> quant -> dequant -> IDCT per 8x8 block, scalar ints."""
    h, w = len(P), len(P[0])
    out = [[0] * w for _ in range(h)]
    for by in range(h // 8):
        for bx in range(w // 8):
            X = [[P[by * 8 + i][bx * 8 + j] - 128 for j in range(8)]
                 for i in range(8)]
            T1 = [[sum(_M[u][x] * X[x][j] for x in range(8))
                   for j in range(8)] for u in range(8)]
            T2 = [[sum(T1[u][x] * _M[v][x] for x in range(8))
                   for v in range(8)] for u in range(8)]
            C = [[0] * 8 for _ in range(8)]
            for u in range(8):
                for v in range(8):
                    t = T2[u][v]
                    D = int(qt[u * 8 + v]) << 26
                    q = (2 * abs(t) + D) // (2 * D)
                    q = q if t >= 0 else -q
                    C[u][v] = q * int(qt[u * 8 + v])
            S1 = [[sum(_M[u][i] * C[u][v] for u in range(8))
                   for v in range(8)] for i in range(8)]
            S2 = [[sum(S1[i][v] * _M[v][j] for v in range(8))
                   for j in range(8)] for i in range(8)]
            for i in range(8):
                for j in range(8):
                    x = ((S2[i][j] + (1 << 25)) >> 26) + 128
                    out[by * 8 + i][bx * 8 + j] = min(max(x, 0), 255)
    return out


def _inv_color(Y, Cb, Cr, h, w):
    out = np.zeros((h, w, 3), np.uint8)
    for i in range(h):
        for j in range(w):
            y = Y[i][j] << 16
            cb = Cb[i][j] - 128
            cr = Cr[i][j] - 128
            r = (y + 91881 * cr + (1 << 15)) >> 16
            g = (y - 22553 * cb - 46802 * cr + (1 << 15)) >> 16
            b = (y + 116130 * cb + (1 << 15)) >> 16
            out[i, j] = [min(max(r, 0), 255), min(max(g, 0), 255),
                         min(max(b, 0), 255)]
    return out


def _boxh(P):
    h, w = len(P), len(P[0])
    return [[(P[i][2 * j] + P[i][2 * j + 1] + 1) >> 1
             for j in range(w // 2)] for i in range(h)]


def jpeg_oracle(px, quality, subsampling):
    """Expected decode(encode(px)) as uint8 RGB, engine-free."""
    h, w, _ = px.shape
    qtl = [int(v) for v in _scaled_quant(_QT_LUMA, quality)]
    qtc = [int(v) for v in _scaled_quant(_QT_CHROMA, quality)]
    Y, Cb, Cr = _fwd_color(px)
    if subsampling == "4:4:4":
        return _inv_color(_block_pipe(_pad_edge(Y, 8, 8), qtl),
                          _block_pipe(_pad_edge(Cb, 8, 8), qtc),
                          _block_pipe(_pad_edge(Cr, 8, 8), qtc), h, w)
    if subsampling == "4:2:2":
        Yp = _block_pipe(_pad_edge(Y, 8, 16), qtl)
        Cbp = _block_pipe(_boxh(_pad_edge(Cb, 8, 16)), qtc)
        Crp = _block_pipe(_boxh(_pad_edge(Cr, 8, 16)), qtc)
        H, W = len(Yp), len(Yp[0])
        up = lambda P: [[P[i][j // 2] for j in range(W)] for i in range(H)]
        return _inv_color(Yp, up(Cbp), up(Crp), h, w)
    Yp = _block_pipe(_pad_edge(Y, 16, 16), qtl)
    Cbp = _block_pipe(_box2(_pad_edge(Cb, 16, 16)), qtc)
    Crp = _block_pipe(_box2(_pad_edge(Cr, 16, 16)), qtc)
    H, W = len(Yp), len(Yp[0])
    up = lambda P: [[P[i // 2][j // 2] for j in range(W)] for i in range(H)]
    return _inv_color(Yp, up(Cbp), up(Crp), h, w)


def _rt(px, **kw):
    """decode(encode(px)) back to uint8 (k/255 float -> k is exact)."""
    return (decode_jpeg(encode_jpeg(px, **kw)) * 255).round().astype(np.uint8)


class TestScalarOracleParity:
    @pytest.mark.parametrize("shape", [(8, 8), (13, 9), (21, 35)])
    @pytest.mark.parametrize("quality", [30, 90])
    @pytest.mark.parametrize("ss", ["4:4:4", "4:2:2", "4:2:0"])
    def test_color_bitwise(self, shape, quality, ss):
        rng = np.random.default_rng(hash((shape, quality)) % 2**31)
        px = rng.integers(0, 256, (*shape, 3), dtype=np.uint8)
        eng = _rt(px, quality=quality, subsampling=ss)
        np.testing.assert_array_equal(eng, jpeg_oracle(px, quality, ss))

    def test_grayscale_bitwise(self):
        rng = np.random.default_rng(5)
        g = rng.integers(0, 256, (11, 18), dtype=np.uint8)
        eng = _rt(g, quality=75)
        qtl = [int(v) for v in _scaled_quant(_QT_LUMA, 75)]
        plane = _block_pipe(_pad_edge([[int(v) for v in row] for row in g],
                                      8, 8), qtl)
        want = np.array(plane, np.uint8)[:11, :18]
        np.testing.assert_array_equal(eng, np.stack([want] * 3, axis=2))

    def test_restart_markers_do_not_change_pixels(self):
        rng = np.random.default_rng(6)
        px = rng.integers(0, 256, (24, 40, 3), dtype=np.uint8)
        base = _rt(px, quality=75, subsampling="4:2:0")
        for ri in (1, 2, 5):
            np.testing.assert_array_equal(
                base, _rt(px, quality=75, subsampling="4:2:0",
                          restart_interval=ri))

    def test_float_input_quantization_rule(self):
        # float [0,1] goes through the shared clip(round(x*255)) rule,
        # so k/255 floats and their uint8 twins encode identically
        px = np.random.default_rng(7).integers(0, 256, (9, 9, 3),
                                               dtype=np.uint8)
        assert encode_jpeg(px.astype(np.float64) / 255.0) \
            == encode_jpeg(px)


class TestHandAssembledBitstream:
    def test_dc_only_grayscale(self):
        """8x8 grayscale, one DC coefficient, assembled byte-by-byte
        from the spec without the encoder: DQT all-17, std Annex K DC/AC
        luma tables, scan bits = DC cat2 '011' + '11' (diff=+3) + EOB
        '1010', padded with 1s. Expected plane: dequant 3*17=51 ->
        IDCT[i][j] = ((2896*51*2896 + 2^25) >> 26) + 128 = 134."""
        import struct as st
        dc_bits = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
        dc_vals = list(range(12))
        ac_bits = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125]
        from dynamicaxiswarping_jl_spark.operators.jpeg import _AC_LUMA_VALS
        b = bytearray(b"\xff\xd8")
        b += b"\xff\xdb" + st.pack(">H", 67) + bytes([0]) + bytes([17] * 64)
        b += b"\xff\xc0" + st.pack(">H", 11) + bytes([8]) \
            + st.pack(">HH", 8, 8) + bytes([1, 1, 0x11, 0])
        b += b"\xff\xc4" + st.pack(">H", 19 + 12) + bytes([0x00]) \
            + bytes(dc_bits) + bytes(dc_vals)
        b += b"\xff\xc4" + st.pack(">H", 19 + 162) + bytes([0x10]) \
            + bytes(ac_bits) + bytes(_AC_LUMA_VALS)
        b += b"\xff\xda" + st.pack(">H", 8) + bytes([1, 1, 0x00, 0, 63, 0])
        b += bytes([0b01111101, 0b01111111])        # 011 11 1010 + pad
        b += b"\xff\xd9"
        out = decode_jpeg(bytes(b))
        want = ((2896 * 51 * 2896 + (1 << 25)) >> 26) + 128
        assert want == 134
        np.testing.assert_array_equal(
            (out * 255).round().astype(np.uint8),
            np.full((8, 8, 3), want, np.uint8))


class TestLossyBehavior:
    def test_quality_monotone_on_smooth_image(self):
        x = np.linspace(0, 1, 48)[None, :, None]
        y = np.linspace(0, 1, 32)[:, None, None]
        img = np.clip(0.6 * x + 0.4 * y, 0, 1) * np.ones((1, 1, 3))
        px = np.clip(np.round(img * 255), 0, 255).astype(np.uint8)
        errs = {}
        for q in (10, 50, 95):
            out = _rt(px, quality=q, subsampling="4:4:4")
            errs[q] = float(np.mean((out.astype(float) - px) ** 2))
        assert errs[95] <= errs[50] <= errs[10]
        psnr = 10 * np.log10(255.0 ** 2 / max(errs[95], 1e-9))
        assert psnr > 35.0

    def test_decode_output_contract(self):
        px = np.random.default_rng(8).integers(0, 256, (8, 8, 3),
                                               dtype=np.uint8)
        out = decode_jpeg(encode_jpeg(px))
        assert out.dtype == np.float64 and out.flags["C_CONTIGUOUS"]
        assert out.min() >= 0.0 and out.max() <= 1.0


class TestErrorSurface:
    def test_bomb_guard_matches_shared_limit(self):
        from dynamicaxiswarping_jl_spark.operators import multimodal
        assert _MAX_PIXELS == multimodal._MAX_PIXELS

    def test_bomb_dimensions_raise(self):
        px = np.zeros((8, 8, 3), np.uint8)
        blob = bytearray(encode_jpeg(px))
        i = blob.index(b"\xff\xc0")
        # SOF0 height/width live at i+5..i+8 — inflate to 65535x65535
        blob[i + 5: i + 9] = b"\xff\xff\xff\xff"
        with pytest.raises(ValueError, match="decompression-bomb"):
            decode_jpeg(bytes(blob))

    def test_progressive_raises_notimplemented(self):
        px = np.zeros((8, 8, 3), np.uint8)
        blob = bytearray(encode_jpeg(px))
        i = blob.index(b"\xff\xc0")
        blob[i + 1] = 0xC2                          # SOF0 -> SOF2
        with pytest.raises(NotImplementedError, match="progressive"):
            decode_jpeg(bytes(blob))

    def test_12bit_and_16bit_tables_raise_notimplemented(self):
        px = np.zeros((8, 8, 3), np.uint8)
        blob = bytearray(encode_jpeg(px))
        i = blob.index(b"\xff\xc0")
        hacked = bytearray(blob)
        hacked[i + 4] = 12                          # precision byte
        with pytest.raises(NotImplementedError, match="12-bit"):
            decode_jpeg(bytes(hacked))
        j = blob.index(b"\xff\xdb")
        hacked = bytearray(blob)
        hacked[j + 4] = 0x10                        # Pq=1
        with pytest.raises(NotImplementedError, match="16-bit"):
            decode_jpeg(bytes(hacked))

    def test_corruption_fuzz_error_contract(self):
        """Truncations and single-byte flips must surface as ValueError/
        NotImplementedError — never a raw struct/index/KeyError and
        never a hang (the on_error='skip' shield relies on this)."""
        px = np.random.default_rng(9).integers(0, 256, (16, 16, 3),
                                               dtype=np.uint8)
        blob = encode_jpeg(px, quality=75, subsampling="4:2:0",
                           restart_interval=2)
        rng = np.random.default_rng(10)
        for cut in rng.integers(2, len(blob), 40):
            try:
                decode_jpeg(blob[:cut])
            except (ValueError, NotImplementedError):
                pass
        for _ in range(80):
            i = int(rng.integers(2, len(blob)))
            flipped = bytearray(blob)
            flipped[i] ^= int(rng.integers(1, 256))
            try:
                decode_jpeg(bytes(flipped))
            except (ValueError, NotImplementedError):
                pass

    def test_not_a_jpeg(self):
        with pytest.raises(ValueError, match="SOI"):
            decode_jpeg(b"\x89PNG not a jpeg")

    def test_bad_encode_inputs(self):
        with pytest.raises(ValueError, match="quality"):
            encode_jpeg(np.zeros((4, 4, 3), np.uint8), quality=0)
        with pytest.raises(ValueError, match="subsampling"):
            encode_jpeg(np.zeros((4, 4, 3), np.uint8), subsampling="4:1:1")
        with pytest.raises(ValueError, match="\\(h, w\\)"):
            encode_jpeg(np.zeros((4, 4, 2), np.uint8))


class TestSparkPath:
    def test_image_features_mixed_formats(self, spark):
        """BMP + PNG + JPEG payloads through the real mapInPandas decode
        path in one DataFrame; JPEG features must equal the local
        decode_jpeg-derived features exactly."""
        from dynamicaxiswarping_jl_spark.operators.multimodal import (
            MEDIA_SCHEMA, encode_bmp, encode_png, image_features)
        rng = np.random.default_rng(12)
        px = [rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)
              for _ in range(3)]
        payloads = [encode_bmp(px[0]), encode_png(px[1]),
                    encode_jpeg(px[2], quality=90)]
        rows = [(i, "image", "application/octet-stream", bytes(p),
                 {"width": 8, "height": 8, "duration_ms": 0})
                for i, p in enumerate(payloads)]
        media = spark.createDataFrame(rows, MEDIA_SCHEMA)
        got = {r["media_id"]: list(r["features"])
               for r in image_features(media, fake=False).collect()}
        assert set(got) == {0, 1, 2}
        for i, p in enumerate(payloads):
            from dynamicaxiswarping_jl_spark.operators.multimodal import (
                decode_image)
            img = decode_image(p)
            want = np.concatenate([img.mean(axis=(0, 1)),
                                   img.std(axis=(0, 1))])
            np.testing.assert_allclose(got[i], want, rtol=0, atol=0)

    def test_on_error_skip_shields_truncated_jpeg(self, spark):
        from dynamicaxiswarping_jl_spark.operators.multimodal import (
            MEDIA_SCHEMA, image_features)
        good = encode_jpeg(np.full((8, 8, 3), 77, np.uint8))
        rows = [(0, "image", "image/jpeg", bytes(good),
                 {"width": 8, "height": 8, "duration_ms": 0}),
                (1, "image", "image/jpeg", bytes(good[:40]),
                 {"width": 8, "height": 8, "duration_ms": 0})]
        media = spark.createDataFrame(rows, MEDIA_SCHEMA)
        got = image_features(media, fake=False, on_error="skip").collect()
        assert [r["media_id"] for r in got] == [0]
        with pytest.raises(Exception):
            image_features(media, fake=False).collect()
