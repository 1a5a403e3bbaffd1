"""Lossy WebP (VP8) codec tests.

Two tiers: the always-on tier exercises the pure-Python pair
(vp8_enc fixture encoder -> vp8 decoder) with reconstruction-error
bounds and structural assertions — no external library; the oracle
tier (skipped when no system libwebp is loadable) pins BIT-EXACT
Y/U/V/RGB equality against libwebp's own decoder over real
libwebp-encoded streams, and that our fixture streams are accepted
and identically decoded by libwebp — the proof they are spec-valid,
not merely self-consistent."""

from __future__ import annotations

import sys

import numpy as np
import pytest

from rta_registrations_pyspark_glue_spark.operators import vp8, vp8_enc

sys.path.insert(0, "tools")
try:
    import libwebp_ref

    _LIB = libwebp_ref.load()
except Exception:  # pragma: no cover
    _LIB = None

needs_libwebp = pytest.mark.skipif(_LIB is None, reason="no system libwebp")


def _noise(h, w, seed=7, sigma=30):
    rng = np.random.default_rng(seed)
    return np.clip(rng.normal(128, sigma, (h, w)), 0, 255).astype(np.uint8)


# ------------------------------------------------------- always-on


def test_bool_coder_roundtrip_fuzz():
    rng = np.random.default_rng(0)
    for _ in range(60):
        n = int(rng.integers(1, 300))
        probs = rng.integers(1, 255, n)
        bits = rng.integers(0, 2, n)
        e = vp8_enc.BoolEncoder()
        for p, b in zip(probs, bits):
            e.put(int(p), int(b))
        d = vp8.BoolDecoder(e.finish())
        assert [d.get(int(p)) for p in probs] == list(bits)


def test_idct_dc_only():
    """A pure-DC block reconstructs uniformly to (dc+4)>>3: the column
    pass leaves t[i]=dc in column 0 only, the row pass averages it
    into (dc+0+4)>>3 everywhere — pin the exact integer for dc=100."""
    out = vp8.idct4x4([100] + [0] * 15)
    assert all(v == 13 for v in out)


def test_iwht_uniform_dc():
    """WHT with only coefficient 0 set spreads (v+3)>>3 to all 16
    subblock DC terms."""
    out = vp8.iwht4x4([800] + [0] * 15)
    assert all(v == (800 + 3) >> 3 for v in out)


def test_forward_inverse_transform_pair():
    rng = np.random.default_rng(1)
    for _ in range(20):
        resid = rng.integers(-120, 120, (4, 4))
        f = vp8_enc.fdct4x4(resid)
        deq = [0] * 16
        for i in range(16):
            zz = vp8.ZIGZAG[i]
            deq[zz] = int(f[zz >> 2, zz & 3])
        back = np.array(vp8.idct4x4(deq)).reshape(4, 4)
        assert np.abs(back - resid).max() <= 2  # unquantized roundtrip


def test_bpred_dc_borders():
    """B_DC over the spec's off-frame borders: (4*127 + 4*129 + 4)>>3
    == 128."""
    out = vp8._bpred_block([127] * 4, [129] * 4, 127, [127] * 4, vp8.B_DC)
    assert all(v == 128 for row in out for v in row)


def test_roundtrip_error_bounded_by_quantizer():
    """encoder -> decoder reconstruction error stays within a small
    multiple of the quantization step, across modes and sizes."""
    y = _noise(48, 32)
    u = _noise(24, 16, 8, 20)
    v = _noise(24, 16, 9, 20)
    for q, bound in ((10, 12), (40, 40)):
        chunk = vp8_enc.encode_vp8(y, u, v, q_index=q, filter_level=0)
        dy, du, dv = vp8.decode_vp8(chunk)
        assert dy.shape == (48, 32) and du.shape == (24, 16)
        assert np.abs(dy.astype(int) - y.astype(int)).max() <= bound
        assert np.abs(du.astype(int) - u.astype(int)).max() <= bound


def test_roundtrip_all_intra_modes():
    y = _noise(32, 32)
    u = _noise(16, 16, 2)
    v = _noise(16, 16, 3)
    for ymode in (vp8.DC_PRED, vp8.V_PRED, vp8.H_PRED, vp8.TM_PRED):
        chunk = vp8_enc.encode_vp8(y, u, v, q_index=15, filter_level=0,
                                   ymode=ymode, uvmode=ymode % 4)
        dy, _, _ = vp8.decode_vp8(chunk)
        assert np.abs(dy.astype(int) - y.astype(int)).max() <= 20
    chunk = vp8_enc.encode_vp8(
        y, u, v, q_index=15, filter_level=0, ymode=vp8.B_PRED,
        bmodes=lambda mby, mbx, sb: (mby * 7 + mbx * 3 + sb) % 10,
    )
    dy, _, _ = vp8.decode_vp8(chunk)
    assert np.abs(dy.astype(int) - y.astype(int)).max() <= 20


def test_odd_dimensions_cropped():
    y = _noise(17, 23)
    u = _noise(9, 12)
    v = _noise(9, 12)
    chunk = vp8_enc.encode_vp8(y, u, v, q_index=12, filter_level=0)
    dy, du, dv = vp8.decode_vp8(chunk)
    assert dy.shape == (17, 23) and du.shape == (9, 12) and dv.shape == (9, 12)


def test_loop_filter_stream_decodes():
    """filter_level > 0 exercises the normal in-loop filter; the
    result must stay a valid bounded reconstruction (the filter only
    smooths block edges)."""
    y = _noise(32, 32)
    u = _noise(16, 16)
    v = _noise(16, 16)
    for simple in (False, True):
        chunk = vp8_enc.encode_vp8(y, u, v, q_index=12, filter_level=20,
                                   filter_type_simple=simple)
        dy, _, _ = vp8.decode_vp8(chunk)
        assert np.abs(dy.astype(int) - y.astype(int)).max() <= 60


def test_malformed_streams_raise():
    with pytest.raises(vp8.VP8Error):
        vp8.decode_vp8(b"\x00\x01")
    with pytest.raises(vp8.VP8Error):
        vp8.decode_vp8(b"\x00" * 20)  # bad start code
    y = _noise(16, 16)
    chunk = vp8_enc.encode_vp8(y, _noise(8, 8), _noise(8, 8), q_index=12)
    # interframe bit set
    bad = bytes([chunk[0] | 1]) + chunk[1:]
    with pytest.raises(vp8.VP8Error):
        vp8.decode_vp8(bad)
    # truncated first partition
    with pytest.raises(vp8.VP8Error):
        vp8.decode_vp8(chunk[:8])


def test_decode_webp_dispatches_vp8():
    from rta_registrations_pyspark_glue_spark.operators.webp import decode_webp

    y = _noise(16, 16)
    chunk = vp8_enc.encode_vp8(y, _noise(8, 8), _noise(8, 8), q_index=10)
    out = decode_webp(vp8_enc.wrap_webp(chunk))
    assert out.shape == (16, 16, 3) and out.dtype.name == "uint8"


# ------------------------------------------------------ libwebp oracle


def _encode_rgb(img, q):
    return libwebp_ref.encode_rgb(_LIB, img, q)


@needs_libwebp
def test_real_streams_bit_exact_yuv():
    """libwebp-encoded streams across sizes and qualities (loop
    filter, segmentation, prob updates, B_PRED all active) decode to
    BIT-IDENTICAL Y/U/V planes."""
    rng = np.random.default_rng(11)
    for (h, w) in [(16, 16), (32, 48), (17, 23), (64, 64)]:
        base = rng.integers(0, 255, (h // 4 + 2, w // 4 + 2, 3))
        img = np.kron(base, np.ones((4, 4, 1)))[:h, :w].astype(np.uint8)
        for q in (10.0, 35.0, 75.0, 95.0):
            webp = _encode_rgb(img, q)
            y0, u0, v0 = libwebp_ref.decode_yuv(_LIB, webp)
            y1, u1, v1 = vp8.decode_vp8(libwebp_ref.vp8_chunk(webp))
            assert np.array_equal(y0, y1), (h, w, q)
            assert np.array_equal(u0, u1) and np.array_equal(v0, v1), (h, w, q)


@needs_libwebp
def test_rgb_conversion_bit_exact():
    """yuv_to_rgb (fancy upsampler + fixed-point BT.601) matches
    WebPDecodeRGB byte for byte."""
    import ctypes

    rng = np.random.default_rng(5)
    img = np.kron(rng.integers(0, 255, (10, 14, 3)),
                  np.ones((4, 4, 1)))[:37, :53].astype(np.uint8)
    webp = _encode_rgb(img, 70.0)
    w = ctypes.c_int()
    h = ctypes.c_int()
    _LIB.WebPDecodeRGB.restype = ctypes.POINTER(ctypes.c_uint8)
    p = _LIB.WebPDecodeRGB(webp, ctypes.c_size_t(len(webp)),
                           ctypes.byref(w), ctypes.byref(h))
    ref = np.ctypeslib.as_array(p, shape=(h.value, w.value, 3)).copy()
    _LIB.WebPFree(p)
    y, u, v = vp8.decode_vp8(libwebp_ref.vp8_chunk(webp))
    assert np.array_equal(vp8.yuv_to_rgb(y, u, v), ref)


@needs_libwebp
def test_fixture_streams_accepted_and_identical():
    """Our fixture encoder's streams are spec-valid: libwebp decodes
    them, and to the SAME planes as our decoder — every intra mode."""
    y = _noise(32, 32)
    u = _noise(16, 16, 2)
    v = _noise(16, 16, 3)
    cases = [dict(ymode=m) for m in
             (vp8.DC_PRED, vp8.V_PRED, vp8.H_PRED, vp8.TM_PRED)]
    cases += [dict(ymode=vp8.B_PRED,
                   bmodes=lambda mby, mbx, sb, _m=m: _m) for m in range(10)]
    cases += [dict(ymode=vp8.B_PRED,
                   bmodes=lambda mby, mbx, sb: (mby + mbx * 3 + sb) % 10)]
    for kw in cases:
        chunk = vp8_enc.encode_vp8(y, u, v, q_index=25, filter_level=0, **kw)
        y0, u0, v0 = libwebp_ref.decode_yuv(_LIB, vp8_enc.wrap_webp(chunk))
        y1, u1, v1 = vp8.decode_vp8(chunk)
        assert np.array_equal(y0, y1), kw
        assert np.array_equal(u0, u1) and np.array_equal(v0, v1), kw


@needs_libwebp
def test_fixture_loop_filter_bit_exact():
    """Loop-filtered fixture streams (normal AND simple filter, with
    sharpness) decode identically in both decoders — pins the §15
    filter math, not just the filter-off path."""
    y = _noise(48, 48)
    u = _noise(24, 24, 2)
    v = _noise(24, 24, 3)
    for simple in (False, True):
        for level, sharp in ((8, 0), (25, 0), (40, 3), (63, 7)):
            chunk = vp8_enc.encode_vp8(y, u, v, q_index=20,
                                       filter_level=level, sharpness=sharp,
                                       filter_type_simple=simple)
            y0, u0, v0 = libwebp_ref.decode_yuv(_LIB, vp8_enc.wrap_webp(chunk))
            y1, u1, v1 = vp8.decode_vp8(chunk)
            assert np.array_equal(y0, y1), (simple, level, sharp)
            assert np.array_equal(u0, u1) and np.array_equal(v0, v1)


@needs_libwebp
def test_python_webp_rgba_bit_exact():
    """The real-world lossy+alpha WebP decodes to the same RGBA bytes
    libwebp produces (VP8 + fancy upsampling + VP8L-compressed ALPH)."""
    import ctypes
    import glob

    from rta_registrations_pyspark_glue_spark.operators.webp import decode_webp

    paths = glob.glob(
        "/root/.pyenv/versions/*/lib/python*/test/test_email/data/python.webp"
    )
    if not paths:
        pytest.skip("no lossy sample in container")
    data = open(paths[0], "rb").read()
    out = decode_webp(data)
    w = ctypes.c_int()
    h = ctypes.c_int()
    _LIB.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_uint8)
    p = _LIB.WebPDecodeRGBA(data, ctypes.c_size_t(len(data)),
                            ctypes.byref(w), ctypes.byref(h))
    ref = np.ctypeslib.as_array(p, shape=(h.value, w.value, 4)).copy()
    _LIB.WebPFree(p)
    assert np.array_equal(out, ref)


@needs_libwebp
def test_vp8l_decodes_real_libwebp_lossless():
    """The r8 VP8L decoder against REAL libwebp lossless encodes (the
    r9 CODE_LENGTH_ORDER fix is exactly what this pins: fixture
    self-consistency cannot catch a transposed constant)."""
    import ctypes

    from rta_registrations_pyspark_glue_spark.operators.webp import decode_webp

    _LIB.WebPEncodeLosslessRGB.restype = ctypes.c_size_t
    rng = np.random.default_rng(3)
    for kind in ("noise", "gradient", "palette"):
        h, w = 25, 33
        if kind == "noise":
            img = rng.integers(0, 255, (h, w, 3)).astype(np.uint8)
        elif kind == "gradient":
            yy, xx = np.mgrid[0:h, 0:w]
            img = np.stack([(xx * 3) % 256, (yy * 5) % 256,
                            ((xx + yy) * 2) % 256], -1).astype(np.uint8)
        else:
            img = (rng.integers(0, 4, (h, w, 1))
                   * np.array([[[60, 30, 90]]])).astype(np.uint8)
        out = ctypes.POINTER(ctypes.c_uint8)()
        sz = _LIB.WebPEncodeLosslessRGB(
            np.ascontiguousarray(img).ctypes.data_as(
                ctypes.POINTER(ctypes.c_uint8)),
            w, h, w * 3, ctypes.byref(out))
        assert sz
        webp = ctypes.string_at(out, sz)
        _LIB.WebPFree(out)
        dec = decode_webp(webp)
        assert np.array_equal(dec[..., :3], img), kind
