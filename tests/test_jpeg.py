"""Baseline-JPEG decoder tests (operators/jpeg.py).

Strategy: a spec-following test-side ENCODER (below) produces real
baseline streams — SOI/DQT/SOF0/DHT/(DRI)/SOS/EOI with canonical
Huffman tables, byte stuffing, restart markers — that the decoder must
invert. Roundtrips are exact to the quantized coefficients by
construction, so the tests compare decoder output against an
INDEPENDENT reference IDCT (explicit cosine double loop, no shared
code) for bit-exactness, plus analytic anchors a shared spec
misreading could not satisfy:

- the T.81 zigzag sequence's known prefix;
- solid-color images decode to the exact color (DC-only path, unit
  quant table);
- smooth gradients decode within a small bound of the ORIGINAL pixels
  (a zigzag/Huffman confusion shared by encoder+decoder would scramble
  high frequencies and blow this bound);
- 4:2:0 subsampling and restart markers round-trip.
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from rta_registrations_pyspark_glue_spark.operators import multimodal
from rta_registrations_pyspark_glue_spark.operators.jpeg import (
    ZIGZAG,
    _pad,
    decode_baseline_jpeg,
    encode_baseline_jpeg,
)
from rta_registrations_pyspark_glue_spark.operators.jpeg import _fdct  # noqa: E501

# ------------------------ independent reference -----------------------


def _reference_idct(zzq: np.ndarray, qz: list[int]) -> np.ndarray:
    """Explicit double-loop IDCT per T.81 A.3.3 — shares no code with
    the decoder's matrix form."""
    coeff = np.zeros((8, 8))
    for k in range(64):
        coeff.flat[ZIGZAG[k]] = zzq[k] * qz[k]
    out = np.zeros((8, 8))
    for y in range(8):
        for x in range(8):
            acc = 0.0
            for u in range(8):
                for v in range(8):
                    cu = math.sqrt(0.5) if u == 0 else 1.0
                    cv = math.sqrt(0.5) if v == 0 else 1.0
                    acc += (
                        cu
                        * cv
                        * coeff[u, v]
                        * math.cos((2 * y + 1) * u * math.pi / 16.0)
                        * math.cos((2 * x + 1) * v * math.pi / 16.0)
                    )
            out[y, x] = acc / 4.0 + 128.0
    return out


def _gradient(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    return ((yy * 3 + xx * 2) % 200 + 20).astype(np.uint8)


# ------------------------------- tests --------------------------------


def test_zigzag_matches_t81():
    assert ZIGZAG[:16] == [0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5]
    assert ZIGZAG[63] == 63
    assert sorted(ZIGZAG) == list(range(64))


def test_solid_color_exact():
    for val in (0, 77, 128, 200, 255):
        img = np.full((16, 16), val, dtype=np.uint8)
        decoded = decode_baseline_jpeg(encode_baseline_jpeg(img))
        assert decoded.shape == (16, 16, 1)
        assert np.array_equal(decoded[:, :, 0], img), val


def test_gradient_grayscale_bit_exact_vs_reference():
    """Non-multiple-of-8 dims (crop path), unit quant table: decoder
    pixels must equal the independent reference IDCT of the encoder's
    quantized coefficients exactly, and sit within 2 of the original."""
    img = _gradient(17, 24)
    data = encode_baseline_jpeg(img)
    decoded = decode_baseline_jpeg(data)[:, :, 0].astype(np.float64)
    # Reference: re-run the encoder's quantization and invert blocks.
    padded = _pad(img.astype(np.float64), 24, 24)
    ref = np.zeros((24, 24))
    for my in range(3):
        for mx in range(3):
            block = padded[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8]
            fb = _fdct(block)
            zzq = np.array(
                [round(fb.flat[ZIGZAG[k]]) for k in range(64)], dtype=np.int64
            )
            ref[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8] = _reference_idct(
                zzq, [1] * 64
            )
    ref = np.clip(np.rint(ref), 0, 255)[:17, :24]
    assert np.array_equal(decoded, ref)
    assert np.max(np.abs(decoded - img.astype(np.float64))) <= 2.0


def test_rgb_444_roundtrip_close_to_original():
    rng = np.random.default_rng(5)
    base = _gradient(16, 16)
    img = np.stack(
        [base, np.roll(base, 3, axis=1), np.roll(base, 5, axis=0)], axis=2
    ).astype(np.uint8)
    decoded = decode_baseline_jpeg(encode_baseline_jpeg(img))
    assert decoded.shape == (16, 16, 3)
    err = np.max(
        np.abs(decoded.astype(np.float64) - img.astype(np.float64))
    )
    # Unit quant: only DCT rounding + two colorspace trips.
    assert err <= 4.0, err


def test_420_subsampling_constant_chroma_close():
    """4:2:0: constant-chroma color image — subsample/upsample is exact
    for constant chroma, so error stays at colorspace+rounding level."""
    lum = _gradient(32, 32)
    img = np.stack([lum, lum, lum], axis=2).astype(np.uint8)  # gray RGB
    data = encode_baseline_jpeg(img, y_sampling=(2, 2))
    decoded = decode_baseline_jpeg(data)
    assert decoded.shape == (32, 32, 3)
    err = np.max(np.abs(decoded.astype(np.float64) - img.astype(np.float64)))
    assert err <= 4.0, err


def test_quant_table_and_restart_markers():
    """Realistic quant steps + DRI=2: decoder must consume RSTn
    boundaries, reset DC predictors, and stay within the quantization
    error bound of the original."""
    qz = [16, 11, 12, 14, 12, 10, 16, 14] + [14] * 56
    img = _gradient(32, 24)
    data = encode_baseline_jpeg(img, qtable_zz=qz, restart_interval=2)
    assert b"\xff\xd0" in data or b"\xff\xd1" in data  # RSTn present
    decoded = decode_baseline_jpeg(data)[:, :, 0]
    err = np.max(np.abs(decoded.astype(np.float64) - img.astype(np.float64)))
    # Worst-case IDCT error for |e| <= q/2 per coeff is bounded by
    # (1/4)·sum(c_u c_v |e|) ≈ 29 at q=16; smooth input keeps it low.
    assert err <= 20.0, err


def test_byte_stuffing_roundtrip():
    """An image whose entropy stream contains 0xFF bytes must decode —
    the stuffed 0x00 removal path. High-contrast blocks make 0xFF
    likely; assert stuffing actually occurred to keep the test honest."""
    rng = np.random.default_rng(11)
    img = (rng.integers(0, 2, size=(24, 24)) * 255).astype(np.uint8)
    data = encode_baseline_jpeg(img)
    sos = data.index(b"\xff\xda")
    assert b"\xff\x00" in data[sos:], "fixture produced no stuffed bytes"
    decoded = decode_baseline_jpeg(data)[:, :, 0]
    assert decoded.shape == (24, 24)
    assert np.max(np.abs(decoded.astype(np.float64) - img.astype(np.float64))) <= 4.0


def test_error_paths():
    img = np.full((8, 8), 100, dtype=np.uint8)
    good = encode_baseline_jpeg(img)
    with pytest.raises(ValueError):
        decode_baseline_jpeg(b"\x00\x01not a jpeg")
    with pytest.raises(ValueError):
        decode_baseline_jpeg(good[: len(good) // 2])  # truncated entropy
    # SOF2 decodes natively since round 7 — a baseline stream merely
    # relabeled progressive is MALFORMED (its scan says Ss=0,Se=63,
    # which a progressive DC scan cannot), not unsupported
    relabeled = good.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with pytest.raises(ValueError):
        decode_baseline_jpeg(relabeled)
    # arithmetic coding stays behind the NotImplementedError boundary
    arithmetic = good.replace(b"\xff\xc0", b"\xff\xc9", 1)
    with pytest.raises(NotImplementedError, match="SOF9"):
        decode_baseline_jpeg(arithmetic)


def test_decode_image_dispatches_jpeg():
    img = np.full((8, 8), 42, dtype=np.uint8)
    out = multimodal.decode_image(encode_baseline_jpeg(img))
    assert out.shape == (8, 8, 1) and int(out[0, 0, 0]) == 42
    # PNG decodes natively since round 7 — a PNG-magic payload that is
    # merely truncated is MALFORMED (ValueError), not unsupported
    with pytest.raises(ValueError):
        multimodal.decode_image(b"\x89PNG\r\n\x1a\n....")


# ----------------------- progressive (SOF2) --------------------------


def test_progressive_solid_color_exact():
    from rta_registrations_pyspark_glue_spark.operators.jpeg import (
        encode_progressive_jpeg,
    )

    for v in (0, 42, 128, 255):
        img = np.full((16, 16), v, dtype=np.uint8)
        out = decode_baseline_jpeg(encode_progressive_jpeg(img))
        assert out.shape == (16, 16, 1) and (out == v).all(), v


def test_progressive_decodes_identically_to_baseline():
    """Baseline and progressive are two entropy codings of the SAME
    quantized coefficient domain — both encoders quantize identically,
    so the decoder must produce bit-identical pixels. This pins the
    whole Annex G machinery (spectral selection, successive
    approximation, EOB runs, AC refinement correction bits) against
    the independently-tested sequential path."""
    from rta_registrations_pyspark_glue_spark.operators.jpeg import (
        encode_progressive_jpeg,
    )

    rng = np.random.default_rng(7)
    q = [16, 11, 10, 16, 24, 40, 51, 61] * 8
    cases = [
        ((16, 16), (1, 1)),
        ((13, 9, 3), (1, 1)),
        ((17, 23, 3), (1, 1)),
        ((32, 16, 3), (2, 2)),
    ]
    for shape, samp in cases:
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        b = decode_baseline_jpeg(encode_baseline_jpeg(img, y_sampling=samp))
        p = decode_baseline_jpeg(
            encode_progressive_jpeg(img, y_sampling=samp)
        )
        assert (b == p).all(), (shape, samp, "unit quant")
        bq = decode_baseline_jpeg(
            encode_baseline_jpeg(img, qtable_zz=q, y_sampling=samp)
        )
        pq = decode_baseline_jpeg(
            encode_progressive_jpeg(img, qtable_zz=q, y_sampling=samp)
        )
        assert (bq == pq).all(), (shape, samp, "real quant")


def test_progressive_scan_script_configurations():
    from rta_registrations_pyspark_glue_spark.operators.jpeg import (
        encode_progressive_jpeg,
    )

    rng = np.random.default_rng(8)
    img = rng.integers(0, 256, (24, 16, 3), dtype=np.uint8)
    b = decode_baseline_jpeg(encode_baseline_jpeg(img))
    for al_dc, bands, ac_al in [
        (0, ((1, 63),), 0),  # pure spectral selection, no approximation
        (2, ((1, 2), (3, 20), (21, 63)), 2),  # deep approximation, 3 bands
        (1, ((1, 10), (11, 63)), 3),  # 3 AC refinement passes per band
    ]:
        p = decode_baseline_jpeg(
            encode_progressive_jpeg(
                img, al_dc=al_dc, ac_bands=bands, ac_al=ac_al
            )
        )
        assert (b == p).all(), (al_dc, bands, ac_al)


def test_progressive_truncation_raises():
    from rta_registrations_pyspark_glue_spark.operators.jpeg import (
        encode_progressive_jpeg,
    )

    rng = np.random.default_rng(9)
    good = encode_progressive_jpeg(
        rng.integers(0, 256, (16, 16), dtype=np.uint8)
    )
    for cut in (len(good) // 3, len(good) // 2, len(good) - 3):
        with pytest.raises(ValueError):
            decode_baseline_jpeg(good[:cut])


def test_progressive_restart_markers():
    """DRI + RSTn inside progressive scans: DC predictors, EOB runs,
    and refinement bit buffers must all reset at restart boundaries —
    decode must stay bit-identical to baseline at any interval."""
    from rta_registrations_pyspark_glue_spark.operators.jpeg import (
        encode_progressive_jpeg,
    )

    rng = np.random.default_rng(13)
    for shape, samp in [((24, 16, 3), (1, 1)), ((32, 16, 3), (2, 2))]:
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        b = decode_baseline_jpeg(encode_baseline_jpeg(img, y_sampling=samp))
        for ri in (1, 3):
            data = encode_progressive_jpeg(
                img, y_sampling=samp, restart_interval=ri
            )
            assert any(
                bytes([0xFF, 0xD0 + i]) in data for i in range(8)
            ), "fixture produced no RST markers"
            p = decode_baseline_jpeg(data)
            assert (b == p).all(), (shape, samp, ri)


def test_non_divisor_sampling_rejected():
    """Spec-legal but non-divisor sampling combinations (hmax=3 with a
    2x1 component) would silently upsample by a truncated integer ratio
    (r7 advice): they must fail at the documented NotImplementedError
    boundary, at SOF-parse time, not produce wrong-sized planes."""
    base = _gradient(16, 16)
    img = np.stack([base, base, base], axis=2).astype(np.uint8)
    data = bytearray(encode_baseline_jpeg(img, y_sampling=(2, 2)))
    i = data.find(b"\xff\xc0")
    assert i > 0
    # SOF0 layout: marker(2) len(2) precision(1) height(2) width(2)
    # ncomp(1), then per component: id(1) hv(1) tq(1).
    comp0 = i + 2 + 2 + 1 + 2 + 2 + 1
    data[comp0 + 1] = 0x31  # Y: 3x1
    data[comp0 + 4] = 0x21  # Cb: 2x1 -> hmax=3, 3 % 2 != 0
    with pytest.raises(NotImplementedError, match="non-divisor"):
        decode_baseline_jpeg(bytes(data))
