"""TIFF codec + EXIF contract (operators/tiff.py).

Roundtrips across the (compression × photometric × strip × byte
order) matrix; TIFF-variant LZW pinned across its early-change width
boundaries (the famous off-by-one vs GIF LZW); PackBits against
hand-computed runs; EXIF extraction from a hand-built APP1 segment —
the EXIF block is a TIFF IFD, so this also exercises the parser on a
non-zero base offset and both byte orders.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from rta_registrations_pyspark_glue_spark.operators.multimodal import decode_image
from rta_registrations_pyspark_glue_spark.operators.tiff import (
    decode_tiff,
    encode_tiff,
    extract_exif,
    packbits_decode,
    packbits_encode,
    parse_ifd,
    tiff_lzw_decode,
    tiff_lzw_encode,
)

RNG = np.random.default_rng(0x71FF)


@pytest.mark.parametrize("compression", [1, 5, 8, 32773])
@pytest.mark.parametrize("big_endian", [False, True])
def test_image_roundtrip_matrix(compression, big_endian):
    for shape in [(1, 1, 1), (7, 5, 1), (16, 16, 3), (9, 11, 4)]:
        for rps in (None, 3):
            img = RNG.integers(0, 256, shape, dtype=np.uint8)
            out = decode_tiff(
                encode_tiff(
                    img,
                    compression=compression,
                    rows_per_strip=rps,
                    big_endian=big_endian,
                )
            )
            assert out.shape == img.shape and (out == img).all()


def test_white_is_zero_inverts():
    img = RNG.integers(0, 256, (4, 4, 1), dtype=np.uint8)
    payload = encode_tiff(img, white_is_zero=True)
    assert (decode_tiff(payload) == img).all()
    # the stored raster really is inverted (photometric 0 semantics)
    tags = parse_ifd(payload)[0]
    assert tags[262] == 0


def test_lzw_roundtrip_across_width_boundaries():
    # lengths sized to cross the 511/1023/2047 early-change boundaries
    for length in (1, 300, 600, 1500, 5000, 60000):
        data = RNG.integers(0, 256, length).astype(np.uint8).tobytes()
        rep = (data[:5] * (length // 5 + 1))[:length]
        for payload in (data, rep):
            assert tiff_lzw_decode(tiff_lzw_encode(payload), length) == payload


def test_lzw_early_change_differs_from_gif():
    """The signature of TIFF LZW: MSB-first packing and the one-early
    width change. A GIF-schedule decode of a TIFF stream must NOT
    reproduce the payload (if it did, the schedules would be
    indistinguishable and this test meaningless)."""
    from rta_registrations_pyspark_glue_spark.operators.gif import lzw_decode

    payload = RNG.integers(0, 256, 2000).astype(np.uint8).tobytes()
    stream = tiff_lzw_encode(payload)
    try:
        wrong = lzw_decode(8, stream, len(payload))
        assert wrong != payload
    except ValueError:
        pass  # desync raising is equally conclusive


def test_packbits_hand_cases():
    assert packbits_encode(b"aaaa") == bytes([257 - 4]) + b"a"
    assert packbits_decode(bytes([3]) + b"wxyz", 4) == b"wxyz"
    assert packbits_decode(bytes([128, 0]) + b"q", 1) == b"q"  # no-op byte
    with pytest.raises(ValueError):
        packbits_decode(bytes([5]) + b"ab", 6)  # truncated literal


def test_multi_strip_layout_tags():
    img = RNG.integers(0, 256, (10, 6, 1), dtype=np.uint8)
    tags = parse_ifd(encode_tiff(img, rows_per_strip=4))[0]
    assert tags[278] == 4 and len(tags[273]) == 3 and len(tags[279]) == 3


def test_unsupported_variants_raise():
    img = RNG.integers(0, 256, (4, 4, 1), dtype=np.uint8)
    good = bytearray(encode_tiff(img))
    with pytest.raises(NotImplementedError):
        decode_tiff(encode_tiff_16bit_stub(img))
    with pytest.raises(ValueError):
        decode_tiff(bytes(good[:20]))


def encode_tiff_16bit_stub(img):
    """A valid header whose BitsPerSample says 16 — decoder must refuse."""
    payload = bytearray(encode_tiff(img))
    tags = parse_ifd(bytes(payload))[0]
    # find the BITS_PER_SAMPLE entry in the IFD and patch its value
    e = "<"
    (n,) = struct.unpack_from(e + "H", payload, 8)
    pos = 10
    for _ in range(n):
        tag, typ, cnt = struct.unpack_from(e + "HHI", payload, pos)
        if tag == 258:
            struct.pack_into(e + "H", payload, pos + 8, 16)
        pos += 12
    del tags
    return bytes(payload)


def _build_exif_jpeg() -> bytes:
    """Hand-assemble a JPEG with an APP1 Exif segment (big-endian TIFF
    IFD carrying make/model/orientation/datetime)."""
    e = ">"
    make, model, dt = b"CamCo\x00", b"X100\x00", b"2024:05:06 07:08:09\x00"
    n_tags = 4
    ifd_off = 8
    data_off = ifd_off + 2 + n_tags * 12 + 4
    extra = bytearray()

    def alloc(raw: bytes) -> int:
        nonlocal extra
        off = data_off + len(extra)
        extra += raw
        return off

    entries = []
    entries.append((271, 2, len(make), alloc(make)))
    entries.append((272, 2, len(model), alloc(model)))
    entries.append(
        (274, 3, 1, struct.unpack(e + "I", struct.pack(e + "HH", 6, 0))[0])
    )
    entries.append((306, 2, len(dt), alloc(dt)))
    tiffblk = bytearray(b"MM" + struct.pack(e + "H", 42) + struct.pack(e + "I", ifd_off))
    tiffblk += struct.pack(e + "H", n_tags)
    for tag, typ, cnt, val in sorted(entries):
        tiffblk += struct.pack(e + "HHII", tag, typ, cnt, val)
    tiffblk += struct.pack(e + "I", 0)
    tiffblk += extra
    app1 = b"Exif\x00\x00" + bytes(tiffblk)
    seg = b"\xff\xe1" + struct.pack(">H", len(app1) + 2) + app1
    return b"\xff\xd8" + seg + b"\xff\xd9"


def test_exif_from_jpeg_app1():
    exif = extract_exif(_build_exif_jpeg())
    assert exif["make"] == "CamCo"
    assert exif["model"] == "X100"
    assert exif["orientation"] == 6
    assert exif["datetime"] == "2024:05:06 07:08:09"


def test_exif_absent_is_empty_not_error():
    assert extract_exif(b"\xff\xd8\xff\xd9") == {}
    assert extract_exif(b"not an image at all") == {}


def test_decode_image_dispatches_tiff():
    img = RNG.integers(0, 256, (6, 6, 3), dtype=np.uint8)
    for be in (False, True):
        out = decode_image(encode_tiff(img, compression=5, big_endian=be))
        assert (out == img).all()


def test_gate_fixture_pixel_sum_matches_analytic_formula():
    for doc_id in (0, 1, 85, 255, 7777):
        base = (doc_id * 3) % 256
        p = np.arange(256, dtype=np.int64)
        img = ((base + p) % 256).astype(np.uint8).reshape(16, 16, 1)
        payload = encode_tiff(img, compression=5, rows_per_strip=8)
        arr = decode_image(payload)
        assert int(arr.astype(np.int64).sum()) == int(((base + p) % 256).sum())


def test_extract_image_exif_operator(spark):
    from rta_registrations_pyspark_glue_spark.operators.multimodal import (
        extract_image_exif,
    )

    jpeg = _build_exif_jpeg()
    df = spark.createDataFrame(
        [(1, jpeg), (2, b"\xff\xd8\xff\xd9"), (3, b"junk"), (4, None)],
        "doc_id bigint, content binary",
    )
    rows = {r.doc_id: r for r in extract_image_exif(df).collect()}
    assert rows[1].make == "CamCo" and rows[1].orientation == 6
    assert rows[1].has_exif
    for i in (2, 3, 4):
        assert not rows[i].has_exif and rows[i].make is None


def test_apply_orientation_all_eight():
    from rta_registrations_pyspark_glue_spark.operators.tiff import (
        apply_orientation,
    )

    arr = np.arange(24, dtype=np.uint8).reshape(2, 4, 3)
    got = {o: apply_orientation(arr, o) for o in range(1, 9)}
    assert (got[1] == arr).all()
    assert (got[2] == arr[:, ::-1]).all()
    assert (got[3] == arr[::-1, ::-1]).all()
    assert (got[4] == arr[::-1]).all()
    for o in (5, 6, 7, 8):
        assert got[o].shape == (4, 2, 3), o
    # rotate-90-CW: new[0,0] = old bottom-left
    assert (got[6][0, 0] == arr[1, 0]).all()
    # rotate-90-CCW: new[0,0] = old top-right
    assert (got[8][0, 0] == arr[0, 3]).all()
    # applying 6 then 8 (CW then CCW) restores the image
    from rta_registrations_pyspark_glue_spark.operators.tiff import (
        apply_orientation as ap,
    )
    assert (ap(got[6], 8) == arr).all()
    assert (apply_orientation(arr, 99) == arr).all()  # unknown: no-op


def test_gray_alpha_two_sample_roundtrip():
    """c==2 (gray+alpha): BITS_PER_SAMPLE is two SHORTs = 4 bytes, which
    the TIFF inline rule stores IN the value field — the encoder
    previously packed (8, 0) there, zeroing the alpha bit depth so its
    own decoder rejected the file (r7 advice). Both endiannesses."""
    import numpy as np

    from rta_registrations_pyspark_glue_spark.operators.tiff import (
        decode_tiff,
        encode_tiff,
    )

    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, size=(5, 7, 2), dtype=np.uint8)
    for be in (False, True):
        out = decode_tiff(encode_tiff(img, big_endian=be))
        assert out.shape == (5, 7, 2)
        assert (out == img).all()
