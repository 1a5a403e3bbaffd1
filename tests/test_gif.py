"""GIF codec contract (operators/gif.py).

The LZW encoder follows the giflib-interoperable width schedule
independently of the decoder (emit-then-add with the one-emit-later
widen), so exact roundtrips across code sizes, payload entropies, and
the 4096-entry cap pin both sides; a WELL-KNOWN EXTERNAL fixture (the
canonical 43-byte 1×1 transparent GIF that circulates verbatim across
the web) pins real-world interop; malformed cases pin the ValueError
contract. The DuckDB-side check is multimodal_suite's 'gif' rows.
"""

from __future__ import annotations

import numpy as np
import pytest

from rta_registrations_pyspark_glue_spark.operators.gif import (
    decode_gif,
    encode_gif,
    first_frame_on_screen,
    lzw_decode,
    lzw_encode,
)
from rta_registrations_pyspark_glue_spark.operators.multimodal import decode_image

RNG = np.random.default_rng(0x61F)

#: The canonical smallest valid GIF — 1×1, single transparent pixel —
#: byte-identical to the fixture published in countless HTTP-beacon
#: implementations. External ground truth for header/GCE/LZW layout.
TINY_GIF = bytes(
    [
        0x47, 0x49, 0x46, 0x38, 0x39, 0x61,  # GIF89a
        0x01, 0x00, 0x01, 0x00, 0x80, 0x00, 0x00,  # 1x1, GCT of 2
        0x00, 0x00, 0x00, 0xFF, 0xFF, 0xFF,  # palette: black, white
        0x21, 0xF9, 0x04, 0x01, 0x00, 0x00, 0x00, 0x00,  # GCE transp idx 0
        0x2C, 0x00, 0x00, 0x00, 0x00, 0x01, 0x00, 0x01, 0x00, 0x00,
        0x02, 0x02, 0x44, 0x01, 0x00,  # LZW: clear, 0, end
        0x3B,
    ]
)


@pytest.mark.parametrize("mcs", [2, 4, 8])
@pytest.mark.parametrize("length", [1, 10, 1000, 20000])
def test_lzw_roundtrip(mcs, length):
    data = RNG.integers(0, 1 << mcs, length).astype(np.uint8).tobytes()
    low_entropy = (data[:7] * (length // 7 + 1))[:length]
    for payload in (data, low_entropy):
        assert lzw_decode(mcs, lzw_encode(mcs, payload), len(payload)) == payload


def test_lzw_roundtrip_past_dictionary_cap():
    # 100k random bytes at mcs=8 drives the table to the 4096 cap,
    # after which both sides must coast on the frozen dictionary
    payload = RNG.integers(0, 256, 100_000).astype(np.uint8).tobytes()
    assert lzw_decode(8, lzw_encode(8, payload), len(payload)) == payload


def test_external_tiny_gif_fixture():
    clip = decode_gif(TINY_GIF)
    assert clip["width"] == 1 and clip["height"] == 1
    assert clip["n_frames"] == 1
    img = clip["frames"][0]["image"]
    assert img.shape == (1, 1, 4)  # transparency → alpha channel
    assert tuple(int(v) for v in img[0, 0]) == (0, 0, 0, 0)  # idx 0, transparent


def test_palette_roundtrip():
    pal = RNG.integers(0, 256, (64, 3), dtype=np.uint8)
    img = RNG.integers(0, 64, (23, 31), dtype=np.uint8)
    clip = decode_gif(encode_gif(img, pal))
    assert clip["n_frames"] == 1
    assert (clip["frames"][0]["image"] == pal[img]).all()


def test_interlaced_roundtrip():
    pal = RNG.integers(0, 256, (16, 3), dtype=np.uint8)
    for h in (1, 2, 7, 16, 23):
        img = RNG.integers(0, 16, (h, 9), dtype=np.uint8)
        clip = decode_gif(encode_gif(img, pal, interlace=True))
        assert (clip["frames"][0]["image"] == pal[img]).all(), h


def test_transparency_becomes_alpha():
    pal = RNG.integers(0, 256, (8, 3), dtype=np.uint8)
    img = RNG.integers(0, 8, (6, 6), dtype=np.uint8)
    clip = decode_gif(encode_gif(img, pal, transparent_idx=5))
    fr = clip["frames"][0]["image"]
    assert fr.shape[2] == 4
    assert (fr[:, :, 3] == np.where(img == 5, 0, 255)).all()


def test_multiframe_offsets_and_screen_composite():
    pal = RNG.integers(0, 256, (32, 3), dtype=np.uint8)
    f1 = RNG.integers(0, 32, (23, 31), dtype=np.uint8)
    f2 = RNG.integers(0, 32, (5, 5), dtype=np.uint8)
    clip = decode_gif(
        encode_gif([f1, f2], pal, offsets=[(0, 0), (3, 4)], screen=(31, 23))
    )
    assert clip["n_frames"] == 2
    assert clip["frames"][1]["left"] == 3 and clip["frames"][1]["top"] == 4
    screen = first_frame_on_screen(clip)
    assert screen.shape == (23, 31, 3) and (screen == pal[f1]).all()


def test_malformed_contract():
    pal = RNG.integers(0, 256, (4, 3), dtype=np.uint8)
    good = encode_gif(RNG.integers(0, 4, (8, 8), dtype=np.uint8), pal)
    for bad in (
        b"GIF89a",  # header only
        good[:-10],  # truncated
        good.replace(b"GIF89a", b"GIF99a"),  # bad version
        b"PK\x03\x04zipzip",  # wrong magic entirely
    ):
        with pytest.raises(ValueError):
            decode_gif(bad)


def test_decode_image_dispatches_gif():
    pal = np.repeat(np.arange(256, dtype=np.uint8)[:, None], 3, axis=1)
    img = RNG.integers(0, 256, (7, 9), dtype=np.uint8)
    out = decode_image(encode_gif(img, pal))
    assert out.shape == (7, 9, 3)
    assert (out[:, :, 0] == img).all()  # grayscale palette: R == index


def test_gate_fixture_pixel_sum_matches_analytic_formula():
    pal = np.repeat(np.arange(256, dtype=np.uint8)[:, None], 3, axis=1)
    for doc_id in (0, 1, 51, 255, 9999):
        base = (doc_id * 5) % 256
        p = np.arange(256, dtype=np.int64)
        idx = ((base + p) % 256).astype(np.uint8).reshape(16, 16)
        arr = decode_image(encode_gif(idx, pal))
        assert int(arr.astype(np.int64).sum()) == int(3 * ((base + p) % 256).sum())
