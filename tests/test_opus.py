"""Opus structural-extraction contract (operators/opus.py, r12).

RFC 6716 TOC + frame-packing pinned writer-vs-parser over all four
count codes (incl. the two-byte length escape, code-3 CBR/VBR, the
255-run padding), RFC 7845 OpusHead roundtrip, Ogg packet reassembly
with REAL lacing including a packet continued across pages, the
Matroska A_OPUS route, the malformed-input envelope, and the Spark
gate leg ('opus' rows, doc_id % 16 == 4)."""

from __future__ import annotations

import struct

import numpy as np
import pytest
from pyspark.sql import functions as F

from rta_registrations_pyspark_glue_spark.operators import mkv, opus


def test_toc_table():
    # RFC 6716 Table 2 spot checks across the three mode ranges
    assert opus.parse_opus_toc(0b00000_0_00) == {
        "config": 0, "mode": "silk", "bandwidth": "NB",
        "frame_samples": 480, "stereo": False, "count_code": 0,
    }
    t = opus.parse_opus_toc((14 << 3) | 0x4 | 2)
    assert (t["mode"], t["bandwidth"], t["frame_samples"]) == (
        "hybrid", "FB", 480,
    )
    assert t["stereo"] and t["count_code"] == 2
    t = opus.parse_opus_toc((31 << 3) | 1)
    assert (t["mode"], t["bandwidth"], t["frame_samples"]) == (
        "celt", "FB", 960,
    )


def test_packet_roundtrip_all_codes():
    f = [bytes([10 + i] * (4 + i)) for i in range(5)]
    # code 0
    info = opus.parse_opus_packet(opus.build_opus_packet(3, False, [f[0]]))
    assert info["count_code"] == 0 and info["frame_sizes"] == [4]
    assert info["duration_samples"] == 2880  # config 3 = SILK 60 ms
    # code 1 (equal)
    info = opus.parse_opus_packet(
        opus.build_opus_packet(18, True, [f[1], f[1]])
    )
    assert info["count_code"] == 1 and info["frame_sizes"] == [5, 5]
    assert info["stereo"]
    # code 2 (unequal) + the two-byte length escape on a big frame
    info = opus.parse_opus_packet(
        opus.build_opus_packet(18, False, [bytes(700), f[2]])
    )
    assert info["count_code"] == 2 and info["frame_sizes"] == [700, 6]
    # code 3 VBR with a 255-run padding length
    info = opus.parse_opus_packet(
        opus.build_opus_packet(17, False, f[:3], vbr=True, padding=600)
    )
    assert info["count_code"] == 3 and info["n_frames"] == 3
    assert info["frame_sizes"] == [4, 5, 6] and info["padding"] == 600
    # code 3 CBR, forced code (2 equal frames would infer code 1)
    info = opus.parse_opus_packet(
        opus.build_opus_packet(20, False, [f[1], f[1]], vbr=False, code=3)
    )
    assert info["count_code"] == 3 and info["frame_sizes"] == [5, 5]
    # DTX zero-length frame through the length coding
    info = opus.parse_opus_packet(
        opus.build_opus_packet(16, False, [b"", f[0]])
    )
    assert info["frame_sizes"] == [0, 4]


def test_packet_envelope():
    with pytest.raises(ValueError):
        opus.parse_opus_packet(b"")
    with pytest.raises(ValueError):  # code 1 odd payload
        opus.parse_opus_packet(bytes([1]) + b"abc")
    with pytest.raises(ValueError):  # code 2 length beyond packet
        opus.parse_opus_packet(bytes([2, 200]) + b"ab")
    with pytest.raises(ValueError):  # code 3 without count byte
        opus.parse_opus_packet(bytes([3]))
    with pytest.raises(ValueError):  # frame count 0
        opus.parse_opus_packet(bytes([3, 0]))
    with pytest.raises(ValueError):  # CBR not divisible
        opus.parse_opus_packet(bytes([3, 2]) + b"abc")
    with pytest.raises(ValueError):  # 49 x 60 ms >> 120 ms
        opus.parse_opus_packet(
            bytes([(3 << 3) | 3, 49]) + bytes(49)
        )
    with pytest.raises(ValueError):  # 3 x 60 ms = 180 ms > 120 ms
        opus.parse_opus_packet(bytes([(3 << 3) | 3, 3]) + bytes(3))


def test_opus_head_roundtrip():
    h = opus.parse_opus_head(
        opus.build_opus_head(2, 356, 44100, -256, 0)
    )
    assert h["channels"] == 2 and h["pre_skip"] == 356
    assert h["input_sample_rate"] == 44100
    assert h["output_gain_q8"] == -256  # -1.0 dB in Q7.8
    assert h["mapping_family"] == 0 and h["version"] == 1
    with pytest.raises(ValueError):
        opus.parse_opus_head(b"OpusHead\x10" + bytes(10))  # major != 0
    with pytest.raises(ValueError):
        opus.parse_opus_head(b"OpusTags")


def test_ogg_packet_spanning_pages():
    """A packet whose lacing continues across a page boundary (255-run
    ending on the NEXT page with the 0x01 continuation flag) must
    reassemble byte-for-byte."""
    from rta_registrations_pyspark_glue_spark.operators.mediameta import _ogg_crc

    big = opus.build_opus_packet(
        16, False, [bytes(range(256)) * 2]
    )  # 513 bytes -> lacing 255,255,3

    def page(segs, body, flags, seq):
        hdr = (
            b"OggS\x00" + bytes([flags]) + struct.pack("<q", 0)
            + struct.pack("<I", 7) + struct.pack("<I", seq)
            + b"\x00\x00\x00\x00" + bytes([len(segs)]) + bytes(segs)
        )
        crc = _ogg_crc(hdr + body)
        return hdr[:22] + struct.pack("<I", crc) + hdr[26:] + body

    head = opus.build_opus_head()
    tags = b"OpusTags\x00\x00\x00\x00\x00\x00\x00\x00"
    buf = (
        page([len(head)], head, 0x02, 0)
        + page([len(tags)], tags, 0, 1)
        # first page carries 255+255 (packet OPEN at page end)
        + page([255, 255], big[:510], 0, 2)
        # continuation page carries the final 3-byte segment
        + page([len(big) - 510], big[510:], 0x01 | 0x04, 3)
    )
    out = opus.extract_ogg_opus(buf)
    assert out["n_packets"] == 1
    assert out["frame_bytes"] == 512 and out["n_frames"] == 1
    # corrupting one body byte must fail the page CRC
    bad = bytearray(buf)
    bad[-1] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        opus.extract_ogg_opus(bytes(bad))


def test_mkv_a_opus_codec_config_route():
    """Matroska A_OPUS: CodecPrivate is an OpusHead, block frames are
    raw packets — extract_mkv_codec_config recovers the same fields
    the Ogg path does, from the same walk."""
    d = 21
    pkts = opus._doc_packets(d)
    buf = mkv.encode_mkv_av(
        [np.zeros((16, 16, 3), np.uint8)], codec="V_UNCOMPRESSED",
        audio=pkts, audio_codec="A_OPUS",
        audio_codec_private=opus.build_opus_head(2, 311, 16000, 64),
    )
    a = mkv.extract_mkv_codec_config(buf)["audio"]
    assert a["container"] == "mkv"
    assert (a["channels"], a["pre_skip"]) == (2, 311)
    assert a["output_gain_q8"] == 64
    want = opus.walk_opus_packets(pkts)
    for k, v in want.items():
        assert a[k] == v, (k, a[k], v)
    # truncated OpusHead stays in the ValueError envelope
    bad = mkv.encode_mkv_av(
        [np.zeros((16, 16, 3), np.uint8)], codec="V_UNCOMPRESSED",
        audio=pkts[:1], audio_codec="A_OPUS",
        audio_codec_private=b"OpusHead\x01\x02",
    )
    with pytest.raises(ValueError):
        mkv.extract_mkv_codec_config(bad)


def test_mediameta_duration_consistent():
    """The r9 mediameta Ogg leg and the r12 structural walk must agree
    on the granule math: the writer's final granule is pre_skip +
    total duration, so mediameta's duration_ms equals the structural
    duration at the 48 kHz clock."""
    from rta_registrations_pyspark_glue_spark.operators import mediameta

    d = 9
    pkts = opus._doc_packets(d)
    buf = opus.encode_ogg_opus_packets(pkts, pre_skip=400)
    meta = mediameta.extract_media_meta(buf)
    out = opus.extract_ogg_opus(buf)
    assert meta["container"] == "ogg" and meta["audio_codec"] == "opus"
    assert meta["duration_ms"] == out["duration_samples"] * 1000 // 48000


def test_spark_leg_matches_local(spark, sf_dir):
    """The r12 gate leg ('opus' rows): the Spark synthesize→extract
    pipeline reproduces walk_opus_packets' numbers for the closed-form
    packet plan."""
    from rta_registrations_pyspark_glue_spark.sources.testdata import load_table

    docs = load_table(spark, "documents", sf_dir).filter(
        F.col("doc_id") % 16 == 4
    ).limit(25)
    rows = opus.extract_opus_features(
        opus.synthesize_opus_docs(docs)
    ).collect()
    assert rows
    for r in rows:
        d = r.doc_id
        assert r.parse_ok
        want = opus.walk_opus_packets(opus._doc_packets(d))
        assert r.n_packets == want["n_packets"] == 3 + d % 4
        assert r.n_frames == want["n_frames"]
        assert r.duration_samples == want["duration_samples"]
        assert r.frame_byte_sum == want["frame_byte_sum"]
        assert r.padding_bytes == want["padding_bytes"]
        assert (r.n_silk, r.n_hybrid, r.n_celt) == (
            want["n_silk"], want["n_hybrid"], want["n_celt"]
        )
        assert r.channels == 1 + d % 2
        assert r.pre_skip == 312 + d % 100
        assert r.input_sample_rate == [48000, 44100, 16000, 8000][d % 4]
        assert r.output_gain_q8 == (d % 41) - 20
