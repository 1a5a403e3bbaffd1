"""MP4 (ISO-BMFF) sample-extraction contract (operators/mp4.py).

The stbl addressing walk pinned piece by piece — stsc run flattening,
co64, per-sample vs uniform stsz, both PCM byte orders, Motion-JPEG
routing — plus the NotImplementedError track boundary and the
malformed-input envelope. The DuckDB-side check is multimodal_suite's
'mp4' rows (closed-form pixel/audio sums per doc)."""

from __future__ import annotations

import struct

import numpy as np
import pytest
from pyspark.sql import functions as F

from rta_registrations_pyspark_glue_spark.operators import mp4


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


def test_raw_roundtrip_exact_both_endiannesses():
    for codec, d in (("sowt", 3), ("twos", 9)):
        frames, aud = _rgb_frames(d), _aud(d)
        clip = mp4.demux_mp4(
            mp4.encode_mp4_av(frames, codec="raw ", audio=aud, audio_codec=codec)
        )
        assert clip["video_codec"] == "raw " and clip["audio_codec"] == codec
        assert (clip["width"], clip["height"]) == (16, 16)
        for got, want in zip(clip["frames"], frames):
            assert np.array_equal(got, want)
        assert np.array_equal(clip["audio"][:, 0], aud)


def test_jpeg_solid_frames_dc_exact():
    d = 8
    frames = [np.full((16, 16), (d * 37 + f * 11) % 256, np.uint8) for f in range(2)]
    clip = mp4.demux_mp4(mp4.encode_mp4_av(frames, codec="jpeg", audio=_aud(d)))
    want = 3 * 256 * sum((d * 37 + f * 11) % 256 for f in range(2))
    got = sum(int(f.astype(np.int64).sum()) for f in clip["frames"])
    assert got == want


def test_co64_offsets():
    frames = _rgb_frames(5)
    a = mp4.demux_mp4(mp4.encode_mp4_av(frames, codec="raw ", audio=_aud(5)))
    b = mp4.demux_mp4(
        mp4.encode_mp4_av(frames, codec="raw ", audio=_aud(5), use_co64=True)
    )
    for fa, fb in zip(a["frames"], b["frames"]):
        assert np.array_equal(fa, fb)
    assert np.array_equal(a["audio"], b["audio"])


def test_stsc_multi_run_walk():
    """Five frames → chunk 1 holds frame 0, chunk 2 holds 1-4: the
    layout walk must follow the run boundary, not assume one sample
    per chunk (the addressing bug class stsc exists to create)."""
    frames = _rgb_frames(11, n=5)
    clip = mp4.demux_mp4(mp4.encode_mp4_av(frames, codec="raw "))
    assert len(clip["frames"]) == 5
    for got, want in zip(clip["frames"], frames):
        assert np.array_equal(got, want)


def test_sample_layout_flattening_unit():
    # 3 chunks at offsets 100/200/300; runs: chunk1→2 samples,
    # chunks2+→1 sample; 4 samples of sizes 10,20,30,40
    layout = mp4._sample_layout(
        [(1, 2, 1), (2, 1, 1)], [100, 200, 300], 4, 0, [10, 20, 30, 40]
    )
    assert layout == [(100, 10), (110, 20), (200, 30), (300, 40)]
    # uniform sizes
    layout = mp4._sample_layout([(1, 2, 1)], [50], 2, 8, None)
    assert layout == [(50, 8), (58, 8)]
    # under-addressed: stsc/stco cover fewer samples than stsz claims
    with pytest.raises(ValueError):
        mp4._sample_layout([(1, 1, 1)], [100], 5, 8, None)


def test_compressed_codec_boundaries():
    frames = _rgb_frames(2)
    buf = mp4.encode_mp4_av(frames, codec="raw ", audio=_aud(2))
    # swap the stsd fourccs: the track boundary must name the codec
    with pytest.raises(NotImplementedError, match="avc1"):
        mp4.demux_mp4(buf.replace(b"raw ", b"avc1"))
    with pytest.raises(NotImplementedError, match="mp4a"):
        mp4.demux_mp4(buf.replace(b"sowt", b"mp4a"))


def test_malformed_envelope():
    frames = _rgb_frames(6)
    buf = mp4.encode_mp4_av(frames, codec="raw ", audio=_aud(6))
    with pytest.raises(ValueError):
        mp4.demux_mp4(b"\x00\x00\x00\x08free")  # no ftyp
    with pytest.raises((ValueError, struct.error)):
        mp4.demux_mp4(buf[: len(buf) // 2])  # truncated moov
    # a chunk offset past EOF must fail loudly, not wrap or return junk
    bad = bytearray(buf)
    pos = bad.rfind(b"stco")
    struct.pack_into(">I", bad, pos + 12, len(buf) + 1000)
    with pytest.raises(ValueError):
        mp4.demux_mp4(bytes(bad))


def test_mediameta_reads_demux_fixtures():
    """The header-only parser (operators/mediameta.py) and the payload
    walker must agree on the same bytes — one fixture, two surfaces."""
    from rta_registrations_pyspark_glue_spark.operators import mediameta

    buf = mp4.encode_mp4_av(_rgb_frames(3), codec="raw ", audio=_aud(3))
    meta = mediameta.extract_media_meta(buf)
    assert meta["container"] == "mp4"
    assert meta["video_codec"] == "raw " and meta["audio_codec"] == "sowt"
    assert (meta["width"], meta["height"]) == (16, 16)
    assert meta["n_tracks"] == 2


def test_spark_leg_matches_local(spark, sf_dir):
    """The Arrow path end-to-end: synthesize → demux over Spark equals
    the same loop run locally."""
    from rta_registrations_pyspark_glue_spark.sources.testdata import load_table

    docs = (
        load_table(spark, "documents", sf_dir)
        .filter(F.col("doc_id") % 8 == 1)
        .limit(6)
    )
    rows = mp4.demux_mp4_features(mp4.synthesize_mp4_docs(docs)).collect()
    assert rows and all(r["decode_ok"] for r in rows)
    for r in rows:
        d = r["doc_id"]
        want_aud = int(_aud(d).astype(np.int64).sum())
        assert r["audio_sum"] == want_aud and r["n_audio"] == 64
        want_pix = sum(int(f.astype(np.int64).sum()) for f in _rgb_frames(d))
        assert r["pix_sum"] == want_pix and r["codec"] == "raw "


def test_mp3_track_routes_to_frame_decoder():
    """'.mp3' sample entries reassemble the elementary stream and ride
    operators/mp3.py: silent streams decode exactly; a Huffman-coded
    granule surfaces THAT module's documented boundary through the
    container, never garbage."""
    from rta_registrations_pyspark_glue_spark.operators import mp3 as mp3mod

    es = mp3mod.encode_mp3_silent(3, channels=2, protected=True)
    frames = _rgb_frames(4)
    clip = mp4.demux_mp4(
        mp4.encode_mp4_av(frames, codec="raw ", audio=es, audio_codec=".mp3")
    )
    assert clip["audio_codec"] == ".mp3" and clip["n_samples"] == 3 * 1152
    assert int(np.abs(clip["audio"]).sum()) == 0
    hot = bytearray(mp3mod.encode_mp3_silent(1))
    hot[4 + 2] |= 0x0F  # non-zero part2_3_length
    with pytest.raises(NotImplementedError, match="Huffman"):
        mp4.demux_mp4(
            mp4.encode_mp4_av(
                frames, codec="raw ", audio=bytes(hot), audio_codec=".mp3"
            )
        )


# ---------------------------------------------------------------------------
# AAC (mp4a) structural extraction (r11)


def _aac_fixture(d: int) -> tuple[bytes, dict]:
    n_aus = 3 + d % 5
    aus = []
    for k in range(n_aus):
        size = 16 + (d * 13 + k * 7) % 32
        i = np.arange(size, dtype=np.int64)
        aus.append(((d + 3 * k + i) % 256).astype(np.uint8).tobytes())
    frame = np.full((8, 8), (d * 37) % 256, np.uint8)
    buf = mp4.encode_mp4_av(
        [frame], codec="jpeg", audio=aus, audio_codec="mp4a",
        aac_freq_index=d % 13, aac_channels=1 + d % 2,
    )
    want = {
        "n_aus": n_aus,
        "sizes": [len(a) for a in aus],
        "byte_sum": sum(b for a in aus for b in a),
        "rate": mp4._AAC_SAMPLE_RATES[d % 13],
        "channels": 1 + d % 2,
    }
    return buf, want


def test_aac_structural_roundtrip():
    """esds chain + AU addressing recover exactly what the fixture
    wrote: profile, the 14496-3 frequency-index rate, channels, AU
    sizes and byte sum, 1024-sample duration."""
    for d in (0, 3, 19, 37, 255):
        buf, want = _aac_fixture(d)
        info = mp4.extract_aac_track(buf)
        assert info["profile"] == "AAC-LC"
        assert info["object_type"] == 2
        assert info["sample_rate"] == want["rate"]
        assert info["channels"] == want["channels"]
        assert info["frame_length"] == 1024
        assert info["n_access_units"] == want["n_aus"]
        assert info["au_sizes"] == want["sizes"]
        assert info["au_byte_sum"] == want["byte_sum"]
        assert info["duration_samples"] == want["n_aus"] * 1024


def test_aac_demux_boundary_names_the_stream():
    """demux_mp4 still refuses mp4a PCM decode, but the boundary error
    now names the ACTUAL parsed stream (profile, rate, channels, AU
    count) — an operator of a 100 TB pipeline reads the error and knows
    which plug-in to provision."""
    buf, want = _aac_fixture(19)
    with pytest.raises(NotImplementedError) as ei:
        mp4.demux_mp4(buf)
    msg = str(ei.value)
    assert "AAC-LC" in msg
    assert f"{want['rate']} Hz" in msg
    assert "extract_aac_track" in msg


def test_asc_escapes():
    """AudioSpecificConfig corner decodes: the 31-escape object type,
    the 15-escape explicit 24-bit rate, and the 960-sample
    frameLengthFlag."""
    # object_type 2 (AAC-LC), freq idx 3 (48000), 2ch, frameLength 960
    b0 = (2 << 3) | (3 >> 1)
    b1 = ((3 & 1) << 7) | (2 << 3) | (1 << 2)  # frameLengthFlag=1
    info = mp4.parse_audio_specific_config(bytes([b0, b1]))
    assert (info["sample_rate"], info["frame_length"]) == (48000, 960)
    # escape rate: freq idx 15 then explicit 24-bit 12345 Hz
    packed = ((2 << 43) | (15 << 39) | (12345 << 15) | (2 << 11)).to_bytes(6, "big")
    info = mp4.parse_audio_specific_config(packed)
    assert info["sample_rate"] == 12345
    assert info["channels"] == 2
    # escape object type: aot 31 -> 32 + ext
    ext = ((31 << 43) | (4 << 37) | (4 << 33) | (2 << 29)).to_bytes(6, "big")
    info = mp4.parse_audio_specific_config(ext)
    assert info["object_type"] == 36
    assert info["sample_rate"] == 44100


def test_aac_malformed_envelope():
    """Garbage esds bodies land in the declared ValueError envelope."""
    buf, _ = _aac_fixture(7)
    with pytest.raises(ValueError):
        mp4.extract_aac_track(b"\x00\x00\x00\x08ftyp")
    # no mp4a track at all
    frames = _rgb_frames(1, 1)
    plain = mp4.encode_mp4_av(frames, codec="raw ")
    with pytest.raises(ValueError):
        mp4.extract_aac_track(plain)
    with pytest.raises(ValueError):
        mp4.parse_audio_specific_config(b"\x12")


def test_aac_spark_leg_matches_local(spark, sf_dir):
    """The Arrow/pandas leg agrees with a local loop over the same
    closed forms."""
    from rta_registrations_pyspark_glue_spark.sources.testdata import load_table

    docs = load_table(spark, "documents", sf_dir).filter(
        F.col("doc_id") % 16 == 3
    ).limit(40)
    rows = mp4.extract_aac_features(mp4.synthesize_aac_docs(docs)).collect()
    assert rows
    for r in rows:
        _, want = _aac_fixture(r.doc_id)
        assert r.parse_ok
        assert r.profile == "AAC-LC"
        assert r.sample_rate == want["rate"]
        assert r.channels == want["channels"]
        assert r.n_aus == want["n_aus"]
        assert r.au_bytes == sum(want["sizes"])
        assert r.au_byte_sum == want["byte_sum"]
        assert r.duration_samples == want["n_aus"] * 1024


def test_adts_structural_roundtrip():
    """ADTS carrier: header fields, frequency-index table, CRC-present
    and CRC-absent header sizes, AU payload addressing, byte sums."""
    aus = [bytes((i + k) % 256 for i in range(20 + 3 * k)) for k in range(4)]
    for prot in (False, True):
        buf = mp4.encode_adts(aus, freq_index=7, channels=1, protected=prot)
        info = mp4.extract_aac_track(buf)
        assert info["container"] == "adts"
        assert info["profile"] == "AAC-LC"
        assert info["sample_rate"] == 22050
        assert info["channels"] == 1
        assert info["n_access_units"] == 4
        assert info["au_sizes"] == [len(a) for a in aus]
        assert info["au_byte_sum"] == sum(b for a in aus for b in a)
        assert info["duration_samples"] == 4 * 1024
    # dispatch: the MP4 carrier still routes to the esds path
    buf, _ = _aac_fixture(37)
    assert mp4.extract_aac_track(buf)["container"] == "mp4"


def test_adts_malformed_envelope():
    """Sync loss, truncation, and mid-stream config changes land in the
    declared ValueError envelope."""
    aus = [b"\x01" * 16, b"\x02" * 16]
    buf = mp4.encode_adts(aus)
    with pytest.raises(ValueError):
        mp4.parse_adts(buf[:-4])  # truncated final frame
    bad = bytearray(buf)
    bad[0] = 0x00
    with pytest.raises(ValueError):
        mp4.extract_aac_track(bytes(bad) + b"x")  # not ADTS, not MP4
    # config change mid-stream: second frame different freq index
    two = bytearray(
        mp4.encode_adts([aus[0]], freq_index=4)
        + mp4.encode_adts([aus[1]], freq_index=5)
    )
    with pytest.raises(ValueError, match="configuration"):
        mp4.parse_adts(bytes(two))
