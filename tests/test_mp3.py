"""MP3 frame-level decode contract (operators/mp3.py).

Side-info unpacking pinned bit-for-bit (both granule layouts, both
channel modes), CRC-16 verification, ID3v2 skip, padding-bit frame
length math, reservoir bounds, the silent-granule exactness claim, the
Huffman plug-in boundary, and the skip-marked libmpg123 differential
(tools/mpg123_ref.py). The DuckDB-side check is multimodal_suite's
'mp3' rows (closed-form field sums per doc)."""

from __future__ import annotations

import numpy as np
import pytest

from rta_registrations_pyspark_glue_spark.operators import mp3


def _fixture(d: int, **kw) -> bytes:
    args = dict(
        bitrate_kbps=(128, 160, 192)[d % 3],
        sample_rate=(44100, 48000, 32000)[d % 3],
        channels=1 + d % 2,
        gg=lambda i, gr, ch, d=d: (d * 13 + 7 * i + 3 * gr + ch) % 256,
        sfc=lambda i, gr, ch, d=d: (d * 5 + i + gr + ch) % 16,
        protected=d % 3 == 0,
        id3_pad=64 if d % 5 == 0 else 0,
    )
    args.update(kw)
    return mp3.encode_mp3_silent(2 + d % 3, **args)


def test_silent_decode_exact_all_variants():
    for d in range(16):
        clip = mp3.decode_mp3(_fixture(d))
        nf, ch = 2 + d % 3, 1 + d % 2
        assert clip["n_frames"] == nf and clip["channels"] == ch
        assert clip["pcm"].shape == (1152 * nf, ch)
        assert int(clip["pcm"].astype(np.int64).sum()) == 0
        assert clip["gg_sum"] == sum(
            (d * 13 + 7 * i + 3 * gr + c) % 256
            for i in range(nf) for gr in range(2) for c in range(ch)
        )
        assert clip["sfc_sum"] == sum(
            (d * 5 + i + gr + c) % 16
            for i in range(nf) for gr in range(2) for c in range(ch)
        )


def test_side_info_layout_is_bit_exact():
    """Parse the written side info back field by field: a width error
    in ANY field would shift everything after it."""
    buf = _fixture(7, protected=False, id3_pad=0)
    frames = mp3.parse_mp3_frames(buf)
    ch = 1 + 7 % 2  # stereo
    for i, fr in enumerate(frames):
        assert fr["n_channels"] == ch
        for gr in range(2):
            for c in range(ch):
                g = fr["side"]["granules"][gr][c]
                assert g["part2_3_length"] == 0
                assert g["global_gain"] == (7 * 13 + 7 * i + 3 * gr + c) % 256
                assert g["scalefac_compress"] == (7 * 5 + i + gr + c) % 16
                assert g["window_switching"] == (i + gr) & 1
                if g["window_switching"]:
                    assert g["block_type"] == 2
                    assert g["subblock_gain"] == [i % 8, gr % 8, (i + gr) % 8]
                else:
                    assert g["region0_count"] == (i + gr) % 16
                    assert g["region1_count"] == i % 8


def test_crc_detects_side_info_corruption():
    buf = bytearray(_fixture(0, protected=True, id3_pad=0))
    clip = mp3.decode_mp3(bytes(buf))  # valid first
    assert clip["n_frames"] == 2
    buf[9] ^= 0x10  # flip a side-info bit inside the first frame
    with pytest.raises(mp3.Mp3Error, match="CRC"):
        mp3.decode_mp3(bytes(buf))


def test_id3v2_skip_and_padding_math():
    with_id3 = _fixture(5)  # d=5: id3_pad=64, 3 frames, padding alternates
    assert with_id3[:3] == b"ID3"
    clip = mp3.decode_mp3(with_id3)
    assert clip["n_frames"] == 2 + 5 % 3
    # byte-identical stream without the tag decodes identically
    bare = _fixture(5, id3_pad=0)
    clip2 = mp3.decode_mp3(bare)
    assert clip["gg_sum"] == clip2["gg_sum"]


def test_huffman_boundary_and_reservoir_bounds():
    buf = bytearray(_fixture(1, protected=False, id3_pad=0))
    # force part2_3_length nonzero in frame 0's first granule:
    # side info starts at byte 4; bits 0-8 main_data_begin, 9-11
    # private(stereo 3), 12-19 scfsi, 20-31 part2_3_length
    buf[4 + 2] |= 0x0F
    buf[4 + 3] |= 0xF0
    with pytest.raises(NotImplementedError, match="Huffman"):
        mp3.decode_mp3(bytes(buf))
    # main_data_begin pointing past an empty reservoir must fail loudly
    buf2 = bytearray(_fixture(1, protected=False, id3_pad=0))
    buf2[4] |= 0x80  # high bit of main_data_begin
    with pytest.raises(mp3.Mp3Error, match="reservoir"):
        mp3.decode_mp3(bytes(buf2))


def test_malformed_envelope():
    with pytest.raises(mp3.Mp3Error):
        mp3.decode_mp3(b"\xff\xfb")  # truncated header
    with pytest.raises(mp3.Mp3Error):
        mp3.decode_mp3(b"not audio at all")
    buf = _fixture(2)
    with pytest.raises(mp3.Mp3Error):
        mp3.decode_mp3(buf[: len(buf) - len(buf) // 3 * 2])


def test_layer12_routes_to_boundary():
    """A Layer II header must hit the NotImplementedError boundary,
    not mis-decode as Layer III."""
    buf = bytearray(_fixture(3, protected=False, id3_pad=0))
    h = int.from_bytes(buf[0:4], "big")
    h = (h & ~(3 << 17)) | (2 << 17)  # layer bits: III(1) → II(2)
    buf[0:4] = h.to_bytes(4, "big")
    with pytest.raises((NotImplementedError, mp3.Mp3Error)):
        mp3.decode_mp3(bytes(buf))


def test_mpg123_differential_silent():
    """Differential against a system libmpg123 when present (this
    container has none — the skip is the documented state, same
    convention as the libwebp oracle)."""
    from tools import mpg123_ref

    lib = mpg123_ref.load()
    if lib is None:
        pytest.skip("no system libmpg123 (documented: absent here)")
    buf = _fixture(4, protected=False, id3_pad=0)
    ours = mp3.decode_mp3(buf)
    pcm, rate = mpg123_ref.decode(lib, buf)
    assert rate == ours["sample_rate"]
    # decoder delay trims differ; silence must agree where both emit
    n = min(len(pcm), len(ours["pcm"]))
    assert int(np.abs(pcm[:n]).sum()) == 0
