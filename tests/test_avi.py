"""AVI demux + frame decode contract (operators/avi.py).

Exact roundtrips through the fixture-grade muxer for both native
codecs (MJPG via the real JPEG coder, BI_RGB DIBs), the Annex K
missing-DHT convention pinned by HAND-BUILT entropy vectors (the
fixture encoder's canonical tables differ from Annex K's, so a
stripped-table fixture could never catch a wrong standard table —
only a stream entropy-coded against Annex K can), the interleaved
PCM audio leg, the malformed-payload envelope, and the Spark-side
fixture/feature operators recomputed exactly in local Python. The
DuckDB-side check is multimodal_suite's 'avi' rows (analytic sums).
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from rta_registrations_pyspark_glue_spark.operators import avi
from rta_registrations_pyspark_glue_spark.operators.avi import (
    decode_avi,
    decode_avi_features,
    encode_avi,
    synthesize_avi_docs,
)
from rta_registrations_pyspark_glue_spark.operators.jpeg import (
    encode_baseline_jpeg,
)

RNG = np.random.default_rng(0xAA51)


# ---------------------------------------------------------------------------
# DIB path


def test_dib_roundtrip_odd_width_stride():
    # width 17 → 51-byte rows padded to 52: stride handling must be exact
    frames = [RNG.integers(0, 256, (13, 17, 3)).astype(np.uint8) for _ in range(3)]
    d = decode_avi(encode_avi(frames, codec="DIB "))
    assert d["codec"] == "DIB " and d["width"] == 17 and d["height"] == 13
    assert len(d["frames"]) == 3
    for f, g in zip(frames, d["frames"]):
        assert np.array_equal(f, g)


def test_dib_topdown_negative_height():
    img = RNG.integers(0, 256, (4, 5, 3)).astype(np.uint8)
    stride = ((5 * 3) + 3) & ~3
    rows = np.zeros((4, stride), np.uint8)
    rows[:, : 5 * 3] = img[:, :, ::-1].reshape(4, 15)  # top-down, BGR
    out = avi._decode_dib_frame(rows.tobytes(), 5, -4, 24, None)
    assert np.array_equal(out, img)


def test_dib_32bit_and_palettized():
    img = RNG.integers(0, 256, (3, 3, 3)).astype(np.uint8)
    bgrx = np.zeros((3, 3, 4), np.uint8)
    bgrx[:, :, :3] = img[:, :, ::-1]
    out = avi._decode_dib_frame(bgrx[::-1].tobytes(), 3, 3, 32, None)
    assert np.array_equal(out, img)

    palette = RNG.integers(0, 256, (256, 3)).astype(np.uint8)
    idx = RNG.integers(0, 256, (2, 4)).astype(np.uint8)
    out = avi._decode_dib_frame(idx[::-1].tobytes(), 4, -2, 8, palette)
    # -2: bottom-up flip applied manually above via [::-1]... height>0 flips
    out2 = avi._decode_dib_frame(idx.tobytes(), 4, -2, 8, palette)
    assert np.array_equal(out2, palette[idx])
    assert np.array_equal(out, palette[idx[::-1]])


# ---------------------------------------------------------------------------
# MJPG path


def test_mjpg_solid_frames_exact():
    # solid frames ride the DC-only JPEG path — exact (same argument as
    # synthesize_jpeg_docs), so pixel equality holds bit-for-bit
    frames = [np.full((16, 16), v, np.uint8) for v in (0, 37, 128, 255)]
    d = decode_avi(encode_avi(frames, codec="MJPG"))
    assert d["codec"] == "MJPG" and len(d["frames"]) == 4
    for v, g in zip((0, 37, 128, 255), d["frames"]):
        assert g.shape == (16, 16, 3) and (g == v).all()


def _headerless_jpeg(dc_bits: str) -> bytes:
    """8×8 single-component JPEG with NO DHT, entropy-coded against the
    T.81 Annex K tables: dc_bits (DC code+value bits) then EOB ('1010'
    in the Annex K AC-luma table), 1-padded to a byte."""
    dqt = b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes([1] * 64)
    sof = (
        b"\xff\xc0" + struct.pack(">H", 11) + b"\x08"
        + struct.pack(">HH", 8, 8) + b"\x01" + b"\x01\x11\x00"
    )
    sos = b"\xff\xda" + struct.pack(">H", 8) + b"\x01\x01\x00\x00\x3f\x00"
    bits = dc_bits + "1010"
    bits += "1" * (-len(bits) % 8)
    ent = bytes(int(bits[i : i + 8], 2) for i in range(0, len(bits), 8))
    ent = ent.replace(b"\xff", b"\xff\x00")
    return b"\xff\xd8" + dqt + sof + sos + ent + b"\xff\xd9"


def test_missing_dht_annex_k_hand_vectors():
    from rta_registrations_pyspark_glue_spark.operators.jpeg import decode_jpeg

    # DC category 0 ('00') → diff 0 → solid 128
    img = np.asarray(decode_jpeg(avi._ensure_dht(_headerless_jpeg("00"))))
    assert (img.reshape(8, 8) == 128).all()
    # DC category 7 ('11110') + value bits 1000000 (+64) → solid 136
    img = np.asarray(
        decode_jpeg(avi._ensure_dht(_headerless_jpeg("11110" + "1000000")))
    )
    assert (img.reshape(8, 8) == 136).all()


def test_missing_dht_in_avi_end_to_end():
    b = encode_avi([_headerless_jpeg("00")], codec="MJPG", frame_size=(8, 8))
    d = decode_avi(b)
    assert len(d["frames"]) == 1 and (d["frames"][0] == 128).all()


def test_ensure_dht_leaves_tabled_frames_untouched():
    j = encode_baseline_jpeg(np.full((8, 8), 9, np.uint8))
    assert avi._ensure_dht(j) is j


# ---------------------------------------------------------------------------
# Audio leg + container structure


def test_interleaved_pcm_audio_mono_and_stereo():
    frames = [np.zeros((8, 8, 3), np.uint8)] * 2
    mono = (np.arange(64, dtype=np.int64) % 256 - 128).astype(np.int16) * 4
    d = decode_avi(encode_avi(frames, codec="DIB ", audio=mono))
    assert d["audio"].shape == (64, 1) and d["audio_rate"] == 8000
    assert np.array_equal(d["audio"][:, 0], mono)

    stereo = np.stack([mono, -mono], axis=1)
    d = decode_avi(encode_avi(frames, codec="DIB ", audio=stereo, audio_rate=16000))
    assert d["audio"].shape == (64, 2) and d["audio_rate"] == 16000
    assert np.array_equal(d["audio"], stereo)


def test_rec_list_interleave_groups():
    # wrap the movi payload chunks in a 'rec ' LIST — the OpenDML
    # interleave grouping some muxers emit — and expect identical decode
    frames = [np.full((8, 8), 50, np.uint8)]
    b = encode_avi(frames, codec="MJPG")
    i = b.index(b"LIST", 12)
    while b[i + 8 : i + 12] != b"movi":
        i = b.index(b"LIST", i + 4)
    (lsize,) = struct.unpack_from("<I", b, i + 4)
    inner = b[i + 12 : i + 8 + lsize]
    rec = b"LIST" + struct.pack("<I", 4 + len(inner)) + b"rec " + inner
    new_movi = b"LIST" + struct.pack("<I", 4 + len(rec)) + b"movi" + rec
    nb = b[:i] + new_movi + b[i + 8 + lsize :]
    nb = nb[:4] + struct.pack("<I", len(nb) - 8) + nb[8:]
    d = decode_avi(nb)
    assert len(d["frames"]) == 1 and (d["frames"][0] == 50).all()


def test_dropped_frame_placeholder_repeats_previous():
    frames = [np.full((8, 8), 7, np.uint8)]
    b = encode_avi(frames, codec="MJPG")
    i = b.index(b"LIST", 12)
    while b[i + 8 : i + 12] != b"movi":
        i = b.index(b"LIST", i + 4)
    (lsize,) = struct.unpack_from("<I", b, i + 4)
    inner = b[i + 12 : i + 8 + lsize] + b"00dc" + struct.pack("<I", 0)
    new_movi = b"LIST" + struct.pack("<I", 4 + len(inner)) + b"movi" + inner
    nb = b[:i] + new_movi + b[i + 8 + lsize :]
    nb = nb[:4] + struct.pack("<I", len(nb) - 8) + nb[8:]
    d = decode_avi(nb)
    assert len(d["frames"]) == 2
    assert np.array_equal(d["frames"][0], d["frames"][1])


# ---------------------------------------------------------------------------
# Malformed-payload envelope


def test_malformed_envelope():
    with pytest.raises(ValueError, match="RIFF"):
        decode_avi(b"NOPE")
    with pytest.raises(ValueError, match="AVI form"):
        decode_avi(b"RIFF" + struct.pack("<I", 4) + b"WAVE")
    good = encode_avi([np.full((8, 8), 1, np.uint8)], codec="MJPG")
    with pytest.raises(ValueError):
        decode_avi(good[: len(good) // 2])
    # no movi list
    with pytest.raises(ValueError, match="movi"):
        decode_avi(b"RIFF" + struct.pack("<I", 4) + b"AVI ")


def test_unknown_codec_is_a_named_boundary():
    b = encode_avi([np.zeros((8, 8, 3), np.uint8)], codec="DIB ")
    nb = b.replace(b"strf", b"strf", 1)
    # patch biCompression (offset 16 into the vids strf body) to 'cvid'
    i = nb.index(b"strf")
    nb = nb[: i + 8 + 16] + b"cvid" + nb[i + 8 + 20 :]
    with pytest.raises(NotImplementedError, match="cvid"):
        decode_avi(nb)


# ---------------------------------------------------------------------------
# Gate fixture ↔ analytic oracle equality (the Python side of the
# multimodal_suite 'avi' rows)


def test_gate_fixture_sums_match_analytic_formula():
    size, n_frames = 16, 2
    for doc_id in (2, 6, 37, 255, 1001):
        s = np.arange(64, dtype=np.int64)
        aud = (((doc_id * 3 + s) % 256 - 128) * 4).astype(np.int16)
        if doc_id % 2 == 0:
            frames = [
                np.full((size, size), (doc_id * 37 + f * 11) % 256, np.uint8)
                for f in range(n_frames)
            ]
            expect = 3 * size * size * sum(
                (doc_id * 37 + f * 11) % 256 for f in range(n_frames)
            )
            payload = encode_avi(frames, codec="MJPG", audio=aud)
        else:
            p = np.arange(size * size, dtype=np.int64)[:, None]
            c = np.arange(3, dtype=np.int64)[None, :]
            frames = [
                ((doc_id * 7 + f * 11 + p * 3 + c) % 256)
                .astype(np.uint8)
                .reshape(size, size, 3)
                for f in range(n_frames)
            ]
            expect = int(
                sum(
                    int(((doc_id * 7 + f * 11 + p * 3 + c) % 256).sum())
                    for f in range(n_frames)
                )
            )
            payload = encode_avi(frames, codec="DIB ", audio=aud)
        d = decode_avi(payload)
        got = sum(int(f.astype(np.int64).sum()) for f in d["frames"])
        assert got == expect, (doc_id, got, expect)
        assert int(d["audio"].sum()) == int(aud.astype(np.int64).sum())


def test_spark_fixture_and_features(spark):
    docs = spark.createDataFrame(
        [(i,) for i in range(8)], "doc_id bigint"
    )
    out = decode_avi_features(synthesize_avi_docs(docs)).orderBy("doc_id")
    rows = out.collect()
    assert len(rows) == 8
    for r in rows:
        assert r.decode_ok and r.width == 16 and r.height == 16
        assert r.n_frames == 2 and r.n_audio == 64
        assert r.codec == ("MJPG" if r.doc_id % 2 == 0 else "DIB ")
        if r.doc_id % 2 == 0:
            assert r.pix_sum == 3 * 256 * sum(
                (r.doc_id * 37 + f * 11) % 256 for f in range(2)
            )


def test_sample_video_frames_dispatches_avi(spark):
    from rta_registrations_pyspark_glue_spark.operators.video import (
        sample_video_frames,
    )

    frames = [np.full((8, 8, 3), v, np.uint8) for v in (10, 20, 30)]
    payload = encode_avi(frames, codec="DIB ")
    df = spark.createDataFrame([(1, bytearray(payload))], "doc_id bigint, content binary")
    rows = sample_video_frames(df, every_k=2).orderBy("frame_idx").collect()
    # frames 0 and 2 sampled; solid RGB v → luma v
    assert [(r.frame_idx, r.y_sum) for r in rows] == [(0, 64 * 10), (2, 64 * 30)]
