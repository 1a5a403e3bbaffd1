"""PNG codec contract (operators/png.py).

Strategy mirrors test_jpeg.py: the fixture-grade encoder follows the
spec independently of the decoder (chunk framing + CRC, forward
filters, bit packing, Adam7 pass construction), so exact roundtrips
across the full (colour type × filter × depth × interlace) matrix pin
both sides; malformed-payload cases pin the ValueError contract the
mixed-media decode path (multimodal.decode_image_features) relies on;
the analytic-pixel-sum gate rows (multimodal_suite 'png') are the
third, DuckDB-side check.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from rta_registrations_pyspark_glue_spark.operators.multimodal import decode_image
from rta_registrations_pyspark_glue_spark.operators.png import (
    _ADAM7,
    decode_png,
    encode_png,
)

RNG = np.random.default_rng(0xC0DEC)


@pytest.mark.parametrize("channels", [1, 2, 3, 4])
@pytest.mark.parametrize("filt", [0, 1, 2, 3, 4])
def test_roundtrip_8bit_every_filter(channels, filt):
    img = RNG.integers(0, 256, (13, 17, channels), dtype=np.uint8)
    out = decode_png(encode_png(img, filters=filt))
    assert out.shape == img.shape and out.dtype == np.uint8
    assert (out == img).all()


@pytest.mark.parametrize("channels", [1, 3, 4])
def test_roundtrip_adam7_interlace(channels):
    # Odd dimensions exercise the empty/partial Adam7 passes; cycling
    # filters exercise per-pass filter state reset.
    for h, w in [(1, 1), (2, 3), (7, 5), (13, 17), (16, 16)]:
        img = RNG.integers(0, 256, (h, w, channels), dtype=np.uint8)
        out = decode_png(encode_png(img, filters=[0, 1, 2, 3, 4], interlace=1))
        assert (out == img).all(), (h, w, channels)


def test_roundtrip_16bit_high_byte():
    img = RNG.integers(0, 65536, (9, 11, 3), dtype=np.uint16)
    out = decode_png(encode_png(img, bit_depth=16, filters=4))
    assert (out == (img >> 8).astype(np.uint8)).all()


@pytest.mark.parametrize("depth", [1, 2, 4])
def test_roundtrip_sub_byte_gray(depth):
    img = RNG.integers(0, 1 << depth, (10, 23, 1), dtype=np.uint8)
    out = decode_png(encode_png(img, bit_depth=depth, filters=[0, 1, 2]))
    # spec scaling: max sample value maps to 255 exactly
    assert (out[:, :, 0] == img[:, :, 0] * (255 // ((1 << depth) - 1))).all()


def test_palette_and_trns_alpha_table():
    pal = RNG.integers(0, 256, (16, 3), dtype=np.uint8)
    idx = RNG.integers(0, 16, (8, 8, 1), dtype=np.uint8)
    out = decode_png(encode_png(idx, bit_depth=4, palette=pal, filters=1))
    assert (out == pal[idx[:, :, 0]]).all()
    trns = bytes(range(10))
    out = decode_png(encode_png(idx, bit_depth=8, palette=pal, trns=trns))
    assert out.shape[2] == 4
    alpha = np.full(16, 255, dtype=np.uint8)
    alpha[:10] = np.frombuffer(trns, dtype=np.uint8)
    assert (out[:, :, 3] == alpha[idx[:, :, 0]]).all()


def test_colour_key_trns_gray_and_rgb16():
    img = np.array([[5, 6], [7, 5]], dtype=np.uint8)[:, :, None]
    out = decode_png(encode_png(img, trns=struct.pack(">H", 5)))
    assert out.shape[2] == 2
    assert (out[:, :, 1] == np.where(img[:, :, 0] == 5, 0, 255)).all()
    # RGB key must match at the ORIGINAL 16-bit depth, not post-reduction
    img16 = np.zeros((2, 2, 3), dtype=np.uint16)
    img16[0, 0] = (1, 2, 3)
    out = decode_png(
        encode_png(img16, bit_depth=16, trns=struct.pack(">HHH", 1, 2, 3))
    )
    assert out.shape[2] == 4
    assert out[0, 0, 3] == 0 and int(out[:, :, 3].astype(int).sum()) == 3 * 255


def test_adam7_pass_table_covers_every_pixel_once():
    seen = np.zeros((8, 8), dtype=int)
    for x0, y0, dx, dy in _ADAM7:
        seen[y0::dy, x0::dx] += 1
    assert (seen == 1).all()


def test_filter_cycling_payload_matches_fixed_filter_pixels():
    img = RNG.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    a = decode_png(encode_png(img, filters=[0, 1, 2, 3, 4]))
    b = decode_png(encode_png(img, filters=0))
    assert (a == b).all()


def test_bad_crc_raises():
    payload = bytearray(encode_png(RNG.integers(0, 256, (4, 4, 3), dtype=np.uint8)))
    payload[40] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(payload))


def test_truncated_idat_raises():
    payload = encode_png(RNG.integers(0, 256, (4, 4, 3), dtype=np.uint8))
    with pytest.raises(ValueError):
        decode_png(payload[:-20])


def test_corrupt_deflate_stream_raises():
    img = RNG.integers(0, 256, (4, 4, 3), dtype=np.uint8)
    good = encode_png(img)
    # rebuild the IDAT chunk with garbage data but a VALID chunk CRC,
    # so the failure is inflate, not chunk framing
    sig_ihdr = good[: 8 + 25]
    bad_data = b"\x00" * 10
    idat = (
        struct.pack(">I", len(bad_data))
        + b"IDAT"
        + bad_data
        + struct.pack(">I", zlib.crc32(b"IDAT" + bad_data) & 0xFFFFFFFF)
    )
    iend = good[-12:]
    with pytest.raises(ValueError, match="IDAT"):
        decode_png(sig_ihdr + idat + iend)


def test_illegal_depth_colour_combo_raises():
    img = RNG.integers(0, 256, (4, 4, 3), dtype=np.uint8)
    payload = bytearray(encode_png(img))
    # patch IHDR bit depth to 4 (illegal for colour type 2) + fix CRC
    ihdr = bytearray(payload[16 : 16 + 13])
    ihdr[8] = 4
    crc = zlib.crc32(b"IHDR" + bytes(ihdr)) & 0xFFFFFFFF
    payload[16 : 16 + 13] = ihdr
    payload[29:33] = struct.pack(">I", crc)
    with pytest.raises(ValueError, match="bit depth"):
        decode_png(bytes(payload))


def test_decode_image_dispatches_png():
    img = RNG.integers(0, 256, (6, 6, 3), dtype=np.uint8)
    out = decode_image(encode_png(img))
    assert (out == img).all()
    # WebP dispatches to the native decoder (r8 VP8L / r9 VP8) — a
    # truncated container is a malformed-payload error, not a boundary
    with pytest.raises(ValueError):
        decode_image(b"RIFF\x00\x00\x00\x00WEBPVP8 ")


def test_gate_fixture_pixel_sum_matches_analytic_formula():
    """The multimodal_suite 'png' oracle predicts
    3·16·Σ_y (doc_id·7 + y·13) % 256 without decoding; pin the Python
    side of that equality for a few doc_ids."""
    from rta_registrations_pyspark_glue_spark.operators.png import decode_png

    for doc_id in (0, 1, 37, 255, 12345):
        base = (doc_id * 7) % 256
        rows = (base + 13 * np.arange(16, dtype=np.int64)) % 256
        img = np.repeat(rows, 16 * 3).reshape(16, 16, 3).astype(np.uint8)
        payload = encode_png(img, filters=[0, 1, 2, 3, 4])
        arr = decode_png(payload)
        assert int(arr.astype(np.int64).sum()) == int(48 * rows.sum())
