"""Matroska sample-extraction contract (operators/mkv.py).

Block parsing pinned lacing scheme by lacing scheme (none / Xiph /
fixed / EBML signed-delta), both routed video codecs, both PCM byte
orders, the compressed-codec track boundary, and the malformed-input
envelope. The DuckDB-side check is multimodal_suite's 'mkv' rows
(closed forms shared with the AVI/MP4 legs on disjoint residues)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from rta_registrations_pyspark_glue_spark.operators import mkv


def _rgb_frames(d: int, n: int = 2, size: int = 16) -> list[np.ndarray]:
    p = np.arange(size * size, dtype=np.int64)[:, None]
    c = np.arange(3, dtype=np.int64)[None, :]
    return [
        ((d * 7 + f * 11 + p * 3 + c) % 256).astype(np.uint8).reshape(size, size, 3)
        for f in range(n)
    ]


def _aud(d: int, n: int = 64) -> np.ndarray:
    s = np.arange(n, dtype=np.int64)
    return (((d * 3 + s) % 256 - 128) * 4).astype(np.int16)


@pytest.mark.parametrize("lacing", ["none", "fixed", "xiph", "ebml"])
@pytest.mark.parametrize("acodec", ["A_PCM/INT/LIT", "A_PCM/INT/BIG"])
def test_uncompressed_roundtrip_all_lacings(lacing, acodec):
    frames, aud = _rgb_frames(9), _aud(9)
    clip = mkv.demux_mkv(
        mkv.encode_mkv_av(
            frames, codec="V_UNCOMPRESSED", audio=aud,
            audio_codec=acodec, audio_lacing=lacing,
        )
    )
    for got, want in zip(clip["frames"], frames):
        assert np.array_equal(got, want)
    assert clip["audio_codec"] == acodec
    assert np.array_equal(clip["audio"][:, 0], aud), lacing


def test_mjpeg_solid_frames_dc_exact():
    d = 6
    frames = [np.full((16, 16), (d * 37 + f * 11) % 256, np.uint8) for f in range(2)]
    clip = mkv.demux_mkv(
        mkv.encode_mkv_av(frames, codec="V_MJPEG", audio=_aud(d))
    )
    want = 3 * 256 * sum((d * 37 + f * 11) % 256 for f in range(2))
    assert sum(int(f.astype(np.int64).sum()) for f in clip["frames"]) == want


def test_block_lacing_unit_vectors():
    """parse_block against hand-built bodies: the vint/size math for
    each scheme, not just roundtrips through our own encoder."""
    # no lacing: track 1, ts 5, one 3-byte frame
    body = bytes([0x81]) + (5).to_bytes(2, "big") + bytes([0x80]) + b"abc"
    assert mkv.parse_block(body, 0, len(body)) == (1, 5, [b"abc"])
    # Xiph: 3 frames of 2, 300, 4 bytes (300 = 255 + 45 run)
    fr = [b"ab", b"x" * 300, b"defg"]
    body = (
        bytes([0x82]) + (0).to_bytes(2, "big") + bytes([0x80 | 0x02, 2])
        + bytes([2, 255, 45]) + b"".join(fr)
    )
    assert mkv.parse_block(body, 0, len(body)) == (2, 0, fr)
    # fixed: 4 equal frames
    fr = [b"abcd", b"efgh", b"ijkl", b"mnop"]
    body = bytes([0x81, 0, 0, 0x80 | 0x04, 3]) + b"".join(fr)
    assert mkv.parse_block(body, 0, len(body)) == (1, 0, fr)
    # EBML: sizes 500, 300 (delta -200), remainder
    fr = [b"a" * 500, b"b" * 300, b"c" * 7]
    first = (500 | 0x4000).to_bytes(2, "big")   # 2-byte uvint
    delta = ((-200 + 0x1FFF) | 0x4000).to_bytes(2, "big")  # 2-byte svint
    body = bytes([0x81, 0, 0, 0x80 | 0x06, 2]) + first + delta + b"".join(fr)
    assert mkv.parse_block(body, 0, len(body)) == (1, 0, fr)


def test_compressed_codec_boundaries():
    frames = _rgb_frames(3)
    buf = mkv.encode_mkv_av(frames, codec="V_UNCOMPRESSED", audio=_aud(3))
    pad = b"V_VP9" + b"\x00" * (len(b"V_UNCOMPRESSED") - 5)
    with pytest.raises(NotImplementedError, match="V_VP9"):
        mkv.demux_mkv(buf.replace(b"V_UNCOMPRESSED", pad))
    pad = b"A_OPUS" + b"\x00" * (len(b"A_PCM/INT/LIT") - 6)
    with pytest.raises(NotImplementedError, match="A_OPUS"):
        mkv.demux_mkv(buf.replace(b"A_PCM/INT/LIT", pad))


def test_malformed_envelope():
    frames = _rgb_frames(5)
    buf = mkv.encode_mkv_av(frames, codec="V_UNCOMPRESSED", audio=_aud(5))
    with pytest.raises(ValueError):
        mkv.demux_mkv(b"\x1a\x45")  # truncated EBML header
    with pytest.raises(ValueError):
        mkv.demux_mkv(buf[: len(buf) // 2])
    # wrong-size uncompressed frame must fail loudly
    bad = buf.replace(b"\xb0" + bytes([0x80 | 1, 16]), b"\xb0" + bytes([0x80 | 1, 15]), 1)
    with pytest.raises((ValueError, NotImplementedError)):
        mkv.demux_mkv(bad)


def test_mediameta_reads_demux_fixtures():
    from rta_registrations_pyspark_glue_spark.operators import mediameta

    buf = mkv.encode_mkv_av(_rgb_frames(4), codec="V_UNCOMPRESSED", audio=_aud(4))
    meta = mediameta.extract_media_meta(buf)
    assert meta["container"] == "mkv" and meta["n_tracks"] == 2
    assert meta["video_codec"] == "V_UNCOMPRESSED"
    assert (meta["width"], meta["height"]) == (16, 16)


def test_spark_leg_matches_local(spark, sf_dir):
    from rta_registrations_pyspark_glue_spark.sources.testdata import load_table

    docs = (
        load_table(spark, "documents", sf_dir)
        .filter(F.col("doc_id") % 8 == 7)
        .limit(6)
    )
    rows = mkv.demux_mkv_features(mkv.synthesize_mkv_docs(docs)).collect()
    assert rows and all(r["decode_ok"] for r in rows)
    for r in rows:
        d = r["doc_id"]
        assert r["audio_sum"] == int(_aud(d).astype(np.int64).sum())
        assert r["pix_sum"] == sum(
            int(f.astype(np.int64).sum()) for f in _rgb_frames(d)
        )
        assert r["codec"] == "V_UNCOMPRESSED" and r["n_audio"] == 64


def test_mp3_track_routes_to_frame_decoder():
    """A_MPEG/L3 block frames reassemble the elementary stream and ride
    operators/mp3.py — the same cross-container contract as MP4's
    '.mp3' entries."""
    from rta_registrations_pyspark_glue_spark.operators import mp3 as mp3mod

    es = mp3mod.encode_mp3_silent(2, channels=1)
    clip = mkv.demux_mkv(
        mkv.encode_mkv_av(
            _rgb_frames(4), codec="V_UNCOMPRESSED",
            audio=es, audio_codec="A_MPEG/L3",
        )
    )
    assert clip["audio_codec"] == "A_MPEG/L3" and clip["n_samples"] == 2 * 1152
    assert int(np.abs(clip["audio"]).sum()) == 0


def test_codec_config_extraction_avc_and_aac():
    """Cross-container structural routing (r11): a Matroska
    V_MPEG4/ISO/AVC track's CodecPrivate is an avcC record and an
    A_AAC track's is a raw AudioSpecificConfig — extract_mkv_codec_config
    must recover the same fields the MP4-side extractors do, from the
    same parsers, plus per-track NAL/AU stats over the real blocks."""
    import struct as _struct

    from rta_registrations_pyspark_glue_spark.operators import h264

    d = 43
    width, height = 16 * 5 - 2, 16 * 4 - 2
    sps = h264.write_sps(width, height, profile_idc=100, level_idc=32)
    pps = h264.write_pps()
    samples = []
    slice_sum = 0
    for s in range(3):
        if s == 0:
            sl = b"\x65" + bytes((d + i) % 256 for i in range(20))
            nals = [sps, pps, sl]
        else:
            sl = b"\x61" + bytes((d + 7 * s + i) % 256 for i in range(12))
            nals = [sl]
        slice_sum += sum(sl)
        samples.append(
            b"".join(_struct.pack(">I", len(n)) + n for n in nals)
        )
    asc = bytes([(2 << 3) | (7 >> 1), ((7 & 1) << 7) | (1 << 3)])
    aus = [bytes((d + 3 * k + i) % 256 for i in range(10 + k))
           for k in range(4)]
    buf = mkv.encode_mkv_av(
        samples, codec="V_MPEG4/ISO/AVC", frame_size=(height, width),
        codec_private=h264.build_avcc(sps, pps),
        audio=aus, audio_codec="A_AAC", audio_codec_private=asc,
    )
    cfg = mkv.extract_mkv_codec_config(buf)
    v, a = cfg["video"], cfg["audio"]
    assert (v["width"], v["height"]) == (width, height)
    assert v["profile"] == "High" and v["level_idc"] == 32
    assert v["n_samples"] == 3 and v["keyframes"] == 1
    assert v["nal_counts"]["sps"] == 1 and v["nal_counts"]["non_idr"] == 2
    assert v["slice_byte_sum"] == slice_sum
    assert a["profile"] == "AAC-LC" and a["sample_rate"] == 22050
    assert a["channels"] == 1 and a["n_access_units"] == 4
    assert a["au_sizes"] == [len(x) for x in aus]
    assert a["au_byte_sum"] == sum(b for au in aus for b in au)
    assert a["duration_samples"] == 4 * 1024
    # the demux boundary errors name the actual parsed streams
    with pytest.raises(NotImplementedError, match=r"High L32 78x62"):
        mkv.demux_mkv(buf)
    # a PCM-only file reports no compressed config
    plain = mkv.encode_mkv_av(
        [np.zeros((16, 16, 3), np.uint8)], codec="V_UNCOMPRESSED",
        audio=np.zeros(64, np.int16),
    )
    out = mkv.extract_mkv_codec_config(plain)
    assert out == {"video": None, "audio": None}


def test_corrupt_codec_private_stays_in_envelope():
    """r11 advice regressions: a corrupt CodecPrivate must surface as
    the documented error classes, never leak IndexError/struct.error
    past demux_mkv_features' (ValueError, NotImplementedError,
    TypeError) catch and crash the Spark task on one bad doc.

    - an ASC of b'\\xf8\\x00' uses the AOT-31 escape then runs out of
      bits mid-field (used to leak IndexError from _Bits.take);
    - a truncated avcC hits struct.unpack_from at a length field (used
      to leak struct.error from extract_mkv_codec_config)."""
    from rta_registrations_pyspark_glue_spark.operators import h264
    from rta_registrations_pyspark_glue_spark.operators.mp4 import (
        parse_audio_specific_config,
    )

    short_escape_asc = b"\xf8\x00"
    with pytest.raises(ValueError, match="truncated"):
        parse_audio_specific_config(short_escape_asc)

    aus = [bytes(range(8))]
    buf = mkv.encode_mkv_av(
        [np.zeros((16, 16, 3), np.uint8)], codec="V_UNCOMPRESSED",
        audio=aus, audio_codec="A_AAC",
        audio_codec_private=short_escape_asc,
    )
    # the boundary fires WITHOUT the detail (parse failed) and stays
    # NotImplementedError — the class demux_mkv_features catches
    with pytest.raises(NotImplementedError, match="A_AAC"):
        mkv.demux_mkv(buf)
    with pytest.raises(ValueError, match="AAC CodecPrivate|truncated"):
        mkv.extract_mkv_codec_config(buf)

    sps = h264.write_sps(32, 32)
    avcc = h264.build_avcc(sps, h264.write_pps())
    sample = b"\x00\x00\x00\x02\x65\x00"
    for cut in (3, 7, len(avcc) - 1):
        bad = mkv.encode_mkv_av(
            [sample], codec="V_MPEG4/ISO/AVC", frame_size=(32, 32),
            codec_private=avcc[:cut],
        )
        with pytest.raises(ValueError):
            mkv.extract_mkv_codec_config(bad)
        # demux's detail branch swallows the parse error and still
        # raises the named boundary
        with pytest.raises(NotImplementedError, match="ISO/AVC"):
            mkv.demux_mkv(bad)
