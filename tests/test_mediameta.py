"""Media-metadata extraction contract (operators/mediameta.py).

Exact field recovery through the fixture encoders for all four
container families, format-grammar edge cases (64-bit MP4 boxes,
mvhd v1, unknown-size EBML segments, ID3v2 skip, Xing VBR frame
counts, Ogg page CRC verification and multi-segment lacing), and the
malformed-payload envelope. The DuckDB-side check is
multimodal_suite's 'mediameta' rows (closed-form fields per doc)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from rta_registrations_pyspark_glue_spark.operators import mediameta as mm


# ---------------------------------------------------------------------------
# MP4


def test_mp4_fields_roundtrip():
    b = mm.encode_minimal_mp4(duration_ms=3456, width=400, height=336)
    m = mm.extract_media_meta(b)
    assert (m["container"], m["brand"]) == ("mp4", "isom")
    assert (m["duration_ms"], m["width"], m["height"]) == (3456, 400, 336)
    assert (m["video_codec"], m["audio_codec"]) == ("avc1", "mp4a")
    assert m["n_tracks"] == 2


def test_mp4_mvhd_version1_and_largesize():
    b = mm.encode_minimal_mp4(duration_ms=7000, width=64, height=48)
    # rewrite mvhd v0 → v1 in place: widen creation/mod/duration to 64-bit
    i = b.index(b"mvhd")
    body = i + 4
    ts, dur = struct.unpack_from(">II", b, body + 12)
    v1_payload = (
        b"\x01\x00\x00\x00" + b"\x00" * 16
        + struct.pack(">IQ", ts, dur) + b[body + 20 : body + 20 + 80]
    )
    old_size = struct.unpack_from(">I", b, i - 4)[0]
    new_box = struct.pack(">I", len(v1_payload) + 8) + b"mvhd" + v1_payload
    nb = b[: i - 4] + new_box + b[i - 4 + old_size :]
    # fix the enclosing moov size
    j = nb.index(b"moov")
    moov_size = struct.unpack_from(">I", nb, j - 4)[0]
    nb = (
        nb[: j - 4]
        + struct.pack(">I", moov_size + len(new_box) - old_size)
        + nb[j:]
    )
    m = mm.extract_media_meta(nb)
    assert m["duration_ms"] == 7000

    # 64-bit largesize on ftyp: size=1 + 8-byte largesize
    (fsize,) = struct.unpack_from(">I", b, 0)
    big = (
        struct.pack(">I", 1) + b[4:8] + struct.pack(">Q", fsize + 8)
        + b[8:fsize] + b[fsize:]
    )
    m = mm.extract_media_meta(big)
    assert m["brand"] == "isom" and m["duration_ms"] == 7000


# ---------------------------------------------------------------------------
# MKV / EBML


def test_mkv_fields_and_doctypes():
    for dt in ("matroska", "webm"):
        b = mm.encode_minimal_mkv(
            duration_ms=1234.0, width=640, height=480, doc_type=dt
        )
        m = mm.extract_media_meta(b)
        assert m["brand"] == dt
        assert (m["duration_ms"], m["width"], m["height"]) == (1234, 640, 480)
        assert (m["video_codec"], m["audio_codec"]) == ("V_VP9", "A_OPUS")
        assert m["n_tracks"] == 2


def test_mkv_unknown_size_segment():
    b = mm.encode_minimal_mkv(duration_ms=500.0, width=16, height=16)
    # replace the Segment's size vint with the 1-byte unknown marker 0xFF
    seg_id = (0x18538067).to_bytes(4, "big")
    i = b.index(seg_id)
    size, body = mm._ebml_vint(b, i + 4, keep_marker=False)
    nb = b[: i + 4] + b"\xff" + b[body:]
    m = mm.extract_media_meta(nb)
    assert m["duration_ms"] == 500


def test_ebml_vint_grammar():
    assert mm._ebml_vint(b"\x81", 0, keep_marker=False) == (1, 1)
    assert mm._ebml_vint(b"\x40\x02", 0, keep_marker=False) == (2, 2)
    assert mm._ebml_vint(b"\x83", 0, keep_marker=True) == (0x83, 1)
    assert mm._ebml_vint(b"\x42\x82", 0, keep_marker=True) == (0x4282, 2)
    with pytest.raises(ValueError):
        mm._ebml_vint(b"\x00", 0, keep_marker=False)


# ---------------------------------------------------------------------------
# MP3


def test_mp3_cbr_header_math():
    for kbps, rate in ((64, 44100), (128, 44100), (192, 32000)):
        b = mm.encode_mp3_cbr(n_frames=30, bitrate_kbps=kbps, sample_rate=rate)
        m = mm.extract_media_meta(b)
        assert m["bitrate_kbps"] == kbps and m["sample_rate"] == rate
        assert m["duration_ms"] == 30 * 1152 * 1000 // rate


def test_mp3_id3v2_skip_and_xing_vbr():
    frames = mm.encode_mp3_cbr(n_frames=5, bitrate_kbps=128)
    # ID3v2 header: 'ID3', version, flags, syncsafe size 200
    id3 = b"ID3\x04\x00\x00" + bytes([0, 0, 1, 72]) + b"\x00" * 200
    m = mm.extract_media_meta(id3 + frames)
    assert m["duration_ms"] == 5 * 1152 * 1000 // 44100

    # Xing header claiming 1000 frames overrides the walk; VBR → no kbps
    first_len = 144 * 128000 // 44100
    frame0 = bytearray(frames[:first_len])
    xing_off = 4 + 32  # MPEG1, joint-stereo-coded mono=False? mode 3 -> 17
    xing_off = 4 + 17  # mono (channel mode 3) side info is 17 bytes
    frame0[xing_off : xing_off + 4] = b"Xing"
    frame0[xing_off + 4 : xing_off + 8] = struct.pack(">I", 1)
    frame0[xing_off + 8 : xing_off + 12] = struct.pack(">I", 1000)
    m = mm.extract_media_meta(bytes(frame0) + frames[first_len:])
    assert m["duration_ms"] == 1000 * 1152 * 1000 // 44100
    assert m["bitrate_kbps"] is None  # VBR: header bitrate is meaningless


def test_mp3_no_sync_raises():
    # sync-looking first byte pair but a reserved layer: dispatches to
    # the MP3 parser, which must reject it
    with pytest.raises(ValueError, match="sync"):
        mm.extract_media_meta(b"\xff\xe0\x00\x00garbage")


# ---------------------------------------------------------------------------
# Ogg


def test_ogg_opus_duration_and_crc():
    b = mm.encode_ogg_opus(duration_samples=96000, channels=2, pre_skip=312)
    m = mm.extract_media_meta(b)
    assert m["audio_codec"] == "opus" and m["sample_rate"] == 48000
    assert m["duration_ms"] == 2000
    # flip one payload byte → CRC must catch it
    bb = bytearray(b)
    bb[-1] ^= 0x01
    with pytest.raises(ValueError, match="CRC"):
        mm.extract_media_meta(bytes(bb))


def test_ogg_multi_segment_lacing():
    # a >255-byte page body exercises the 255-run segment table
    body = b"OpusHead" + bytes([1, 1]) + struct.pack("<H", 0) \
        + struct.pack("<I", 48000) + struct.pack("<h", 0) + b"\x00"
    pad = body + b"\x00" * 300  # pretend-extension padding, same packet
    segs = []
    rem = len(pad)
    while rem >= 255:
        segs.append(255)
        rem -= 255
    segs.append(rem)
    hdr = (
        b"OggS\x00\x02" + struct.pack("<q", 0) + struct.pack("<I", 1)
        + struct.pack("<I", 0) + b"\x00" * 4 + bytes([len(segs)])
        + bytes(segs)
    )
    crc = mm._ogg_crc(hdr + pad)
    page = hdr[:22] + struct.pack("<I", crc) + hdr[26:] + pad
    m = mm.extract_media_meta(page)
    assert m["audio_codec"] == "opus"


def test_ogg_vorbis_identification():
    ident = b"\x01vorbis" + struct.pack("<I", 0) + bytes([2]) \
        + struct.pack("<I", 44100) + b"\x00" * 16 + b"\x01"
    segs = [len(ident)]
    hdr = (
        b"OggS\x00\x02" + struct.pack("<q", 44100) + struct.pack("<I", 9)
        + struct.pack("<I", 0) + b"\x00" * 4 + bytes([1]) + bytes(segs)
    )
    crc = mm._ogg_crc(hdr + ident)
    page = hdr[:22] + struct.pack("<I", crc) + hdr[26:] + ident
    m = mm.extract_media_meta(page)
    assert m["audio_codec"] == "vorbis" and m["sample_rate"] == 44100
    assert m["duration_ms"] == 1000


# ---------------------------------------------------------------------------
# Dispatch + envelope


def test_unrecognized_container_raises():
    with pytest.raises(ValueError, match="unrecognized"):
        mm.extract_media_meta(b"\x00" * 64)


def test_avi_header_only_path():
    from rta_registrations_pyspark_glue_spark.operators import avi

    b = avi.encode_avi(
        [np.full((8, 8), 1, np.uint8)] * 3, codec="MJPG", fps=(30, 1)
    )
    m = mm.extract_media_meta(b)
    assert m["container"] == "avi" and m["video_codec"] == "MJPG"
    assert m["n_frames"] == 3


# ---------------------------------------------------------------------------
# Gate fixture ↔ oracle equality + Spark surface


def test_gate_fixture_fields_match_analytic_formula():
    for d in (0, 1, 2, 3, 17, 38, 103, 1000):
        r = d % 4
        if r == 0:
            payload = mm.encode_minimal_mp4(
                duration_ms=(d * 7) % 5000 + 1000,
                width=320 + (d % 16) * 8, height=240 + (d % 9) * 16,
            )
            expect_dur = (d * 7) % 5000 + 1000
        elif r == 1:
            payload = mm.encode_minimal_mkv(
                duration_ms=float((d * 11) % 9000 + 500),
                width=160 + (d % 32) * 4, height=120 + (d % 20) * 8,
                doc_type="webm" if d % 8 == 1 else "matroska",
            )
            expect_dur = (d * 11) % 9000 + 500
        elif r == 2:
            payload = mm.encode_mp3_cbr(
                n_frames=10 + d % 20,
                bitrate_kbps=(64, 96, 128, 192)[(d // 4) % 4],
            )
            expect_dur = (10 + d % 20) * 1152 * 1000 // 44100
        else:
            payload = mm.encode_ogg_opus(
                duration_samples=4800 + (d % 100) * 480
            )
            expect_dur = (4800 + (d % 100) * 480) // 48
        m = mm.extract_media_meta(payload)
        assert m["duration_ms"] == expect_dur, (d, m)


def test_spark_fixture_and_features(spark):
    docs = spark.createDataFrame([(i,) for i in range(12)], "doc_id bigint")
    out = mm.extract_media_meta_features(
        mm.synthesize_media_docs(docs)
    ).orderBy("doc_id")
    rows = out.collect()
    assert len(rows) == 12
    for r in rows:
        assert r.parse_ok
        expected = ("mp4", "mkv", "mp3", "ogg")[r.doc_id % 4]
        assert r.container == expected, (r.doc_id, r.container)
        if expected == "mp3":
            assert r.bitrate_kbps in (64, 96, 128, 192)
        if expected in ("mp4", "mkv"):
            assert r.width is not None and r.n_tracks == 2


def test_mp3_xing_offset_honors_crc_bytes():
    """r10 fix: with protection_bit = 0 the Xing header sits AFTER the
    2-byte frame CRC; the CRC-blind offset missed it entirely."""
    from rta_registrations_pyspark_glue_spark.operators import mp3 as mp3mod

    frames = mp3mod.encode_mp3_silent(5, protected=True)  # mono, 128k/44100
    first_len = 144 * 128000 // 44100
    frame0 = bytearray(frames[:first_len])
    xing_off = 4 + 2 + 17  # header + CRC + mono side info
    frame0[xing_off : xing_off + 4] = b"Xing"
    frame0[xing_off + 4 : xing_off + 8] = struct.pack(">I", 1)
    frame0[xing_off + 8 : xing_off + 12] = struct.pack(">I", 777)
    m = mm.extract_media_meta(bytes(frame0) + frames[first_len:])
    assert m["duration_ms"] == 777 * 1152 * 1000 // 44100
