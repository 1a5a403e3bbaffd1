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
    decode_baseline_jpeg,
)

# --------------------------- test-side encoder ------------------------


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nacc = 0

    def write(self, value: int, nbits: int) -> None:
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.nacc += 1
            if self.nacc == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.nacc = 0

    def flush(self) -> None:
        if self.nacc:
            self.write((1 << (8 - self.nacc)) - 1, 8 - self.nacc)


def _fdct(block: np.ndarray) -> np.ndarray:
    a = np.zeros((8, 8))
    for u in range(8):
        c = math.sqrt(0.5) if u == 0 else 1.0
        for x in range(8):
            a[u, x] = 0.5 * c * math.cos((2 * x + 1) * u * math.pi / 16.0)
    return a @ (block - 128.0) @ a.T


def _magnitude(v: int) -> tuple[int, int]:
    """(size, value-bits) per T.81 F.1.2.1 / F.1.4."""
    s = int(v).bit_length() if v >= 0 else int(-v).bit_length()
    bits = v if v >= 0 else v + (1 << s) - 1
    return s, bits


def _canonical_codes(symbols: list[int]) -> tuple[list[int], list[int], dict]:
    """All symbols at one length L (2^L > n keeps the all-ones code
    free): counts, symbol order, and symbol -> (L, code) map."""
    syms = sorted(set(symbols))
    n = len(syms)
    length = max(1, (n + 1 - 1).bit_length())  # smallest L with 2^L > n
    while (1 << length) <= n:
        length += 1
    counts = [0] * 16
    counts[length - 1] = n
    return counts, syms, {s: (length, i) for i, s in enumerate(syms)}


def _component_blocks(plane, mcus_y, mcus_x, h, v):
    """Yield (mcu_index, natural-order 8x8 blocks) in scan order."""
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for by in range(v):
                for bx in range(h):
                    y0, x0 = (my * v + by) * 8, (mx * h + bx) * 8
                    yield my * mcus_x + mx, plane[y0 : y0 + 8, x0 : x0 + 8]


def _pad(plane, rows, cols):
    return np.pad(
        plane,
        ((0, rows - plane.shape[0]), (0, cols - plane.shape[1])),
        mode="edge",
    )


def encode_baseline_jpeg(
    img: np.ndarray,
    qtable_zz: list[int] | None = None,
    y_sampling: tuple[int, int] = (1, 1),
    restart_interval: int = 0,
) -> bytes:
    """Minimal spec-following baseline encoder for decoder tests.

    ``img``: HxW uint8 grayscale or HxWx3 uint8 RGB. ``qtable_zz``: one
    64-entry quant table in zigzag order used for every component
    (default all-ones = lossless-to-rounding). ``y_sampling``: (h, v)
    for the luma component; chroma is always (1, 1) — (2, 2) gives
    4:2:0."""
    qz = list(qtable_zz or [1] * 64)
    gray = img.ndim == 2 or img.shape[2] == 1
    if gray:
        planes = [img.reshape(img.shape[0], img.shape[1]).astype(np.float64)]
        samps = [(1, 1)]
    else:
        rgb = img.astype(np.float64)
        r, g, b = rgb[:, :, 0], rgb[:, :, 1], rgb[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
        h, v = y_sampling
        if (h, v) != (1, 1):
            hh, vv = y.shape[0] // v * v, y.shape[1] // h * h
            assert y.shape[0] % v == 0 and y.shape[1] % h == 0, (
                "test encoder: image dims must be multiples of the sampling"
            )
            cb = cb.reshape(hh // v, v, vv // h, h).mean(axis=(1, 3))
            cr = cr.reshape(hh // v, v, vv // h, h).mean(axis=(1, 3))
        planes = [y, cb, cr]
        samps = [y_sampling, (1, 1), (1, 1)]
    height, width = img.shape[0], img.shape[1]
    hmax = max(s[0] for s in samps)
    vmax = max(s[1] for s in samps)
    mcus_x = -(-width // (8 * hmax))
    mcus_y = -(-height // (8 * vmax))

    # Quantize every block once (natural -> zigzag), collecting symbols.
    comp_blocks: list[list[np.ndarray]] = []
    for plane, (h, v) in zip(planes, samps):
        padded = _pad(plane, mcus_y * v * 8, mcus_x * h * 8)
        blocks = []
        for _m, block in _component_blocks(padded, mcus_y, mcus_x, h, v):
            fb = _fdct(block)
            zzq = np.array(
                [round(fb.flat[ZIGZAG[k]] / qz[k]) for k in range(64)], dtype=np.int64
            )
            blocks.append(zzq)
        comp_blocks.append(blocks)

    n_comp = len(planes)

    per_mcu = [{m: [] for m in range(mcus_y * mcus_x)} for _ in range(n_comp)]
    for ci, (plane, (h, v)) in enumerate(zip(planes, samps)):
        bi = 0
        for m, _block in _component_blocks(
            _pad(plane, mcus_y * v * 8, mcus_x * h * 8), mcus_y, mcus_x, h, v
        ):
            per_mcu[ci][m].append(comp_blocks[ci][bi])
            bi += 1

    def emit(tables, writer_factory, rst_sink):
        """Shared emission walk: pass 1 collects symbols (tables=None),
        pass 2 writes bits — ONE loop so restart-interval DC resets are
        identical in both (a divergence here was the first bug this
        test suite caught)."""
        collected = {(0, 0): [], (1, 0): [], (0, 1): [], (1, 1): []}
        w = writer_factory()
        preds = [0] * n_comp
        rst_n = 0
        for m in range(mcus_y * mcus_x):
            if restart_interval and m and m % restart_interval == 0:
                if tables is not None:
                    w.flush()
                    rst_sink(w, rst_n)
                    w = writer_factory()
                rst_n += 1
                preds = [0] * n_comp
            for ci in range(n_comp):
                th = 0 if ci == 0 else 1
                for zzq in per_mcu[ci][m]:
                    s, bits = _magnitude(int(zzq[0]) - preds[ci])
                    preds[ci] = int(zzq[0])
                    if tables is None:
                        collected[(0, th)].append(s)
                    else:
                        ln, code = tables[(0, th)][2][s]
                        w.write(code, ln)
                        w.write(bits, s)
                    run = 0
                    for k in range(1, 64):
                        v = int(zzq[k])
                        if v == 0:
                            run += 1
                            continue
                        while run > 15:
                            if tables is None:
                                collected[(1, th)].append(0xF0)
                            else:
                                ln, code = tables[(1, th)][2][0xF0]
                                w.write(code, ln)
                            run -= 16
                        s, bits = _magnitude(v)
                        if tables is None:
                            collected[(1, th)].append((run << 4) | s)
                        else:
                            ln, code = tables[(1, th)][2][(run << 4) | s]
                            w.write(code, ln)
                            w.write(bits, s)
                        run = 0
                    if run:
                        if tables is None:
                            collected[(1, th)].append(0x00)
                        else:
                            ln, code = tables[(1, th)][2][0x00]
                            w.write(code, ln)
        if tables is not None:
            w.flush()
            rst_sink(w, None)
        return collected

    collected = emit(None, _BitWriter, lambda w, n: None)
    tables = {}
    for key in ((0, 0), (1, 0)) + (((0, 1), (1, 1)) if n_comp == 3 else ()):
        tables[key] = _canonical_codes(collected[key] or [0])

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + (2 + 1 + 64).to_bytes(2, "big") + bytes([0x00])
    out += bytes(min(255, q) for q in qz)
    # SOF0
    sof = bytearray([8])
    sof += height.to_bytes(2, "big") + width.to_bytes(2, "big")
    sof.append(n_comp)
    for ci in range(n_comp):
        h, v = samps[ci]
        sof += bytes([ci + 1, (h << 4) | v, 0x00])
    out += b"\xff\xc0" + (2 + len(sof)).to_bytes(2, "big") + sof
    for (tc, th), (counts, syms, _m) in sorted(tables.items()):
        body = bytes([(tc << 4) | th]) + bytes(counts) + bytes(syms)
        out += b"\xff\xc4" + (2 + len(body)).to_bytes(2, "big") + body
    if restart_interval:
        out += b"\xff\xdd" + (4).to_bytes(2, "big")
        out += restart_interval.to_bytes(2, "big")
    sos = bytearray([n_comp])
    for ci in range(n_comp):
        th = 0 if ci == 0 else 1
        sos += bytes([ci + 1, (th << 4) | th])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + (2 + len(sos)).to_bytes(2, "big") + sos

    # Entropy-coded data, interleaved MCU order (same walk as pass 1).
    def rst_sink(w, n):
        out.extend(w.out)
        if n is not None:
            out.extend(bytes([0xFF, 0xD0 + (n % 8)]))

    emit(tables, _BitWriter, rst_sink)
    out += b"\xff\xd9"
    return bytes(out)


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
    progressive = good.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with pytest.raises(NotImplementedError, match="progressive"):
        decode_baseline_jpeg(progressive)


def test_decode_image_dispatches_jpeg():
    img = np.full((8, 8), 42, dtype=np.uint8)
    out = multimodal.decode_image(encode_baseline_jpeg(img))
    assert out.shape == (8, 8, 1) and int(out[0, 0, 0]) == 42
    with pytest.raises(NotImplementedError, match="PNG"):
        multimodal.decode_image(b"\x89PNG\r\n\x1a\n....")
