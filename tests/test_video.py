"""Y4M codec + real frame sampling contract (operators/video.py).

Exact roundtrips through the fixture-grade encoder across the chroma
matrix, the malformed-payload ValueError contract, and the Spark-side
frame-sampling operator recomputed exactly in local Python. The
DuckDB-side check is multimodal_suite's 'y4m' rows (analytic Y sums).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pytest

from rta_registrations_pyspark_glue_spark.operators.video import (
    decode_y4m,
    encode_y4m,
    sample_video_frames,
    synthesize_y4m_docs,
)

RNG = np.random.default_rng(0x51DE0)


@pytest.mark.parametrize(
    "chroma,cshape",
    [("420jpeg", (4, 4)), ("420", (4, 4)), ("422", (8, 4)), ("444", (8, 8)), ("mono", None)],
)
def test_roundtrip_chroma_matrix(chroma, cshape):
    frames = []
    for _ in range(3):
        y = RNG.integers(0, 256, (8, 8), dtype=np.uint8)
        if cshape is None:
            frames.append((y, None, None))
        else:
            frames.append(
                (
                    y,
                    RNG.integers(0, 256, cshape, dtype=np.uint8),
                    RNG.integers(0, 256, cshape, dtype=np.uint8),
                )
            )
    clip = decode_y4m(encode_y4m(frames, fps=(30, 1), chroma=chroma))
    assert clip["width"] == 8 and clip["height"] == 8
    assert clip["fps"] == (30, 1) and len(clip["frames"]) == 3
    for (y, cb, cr), (dy, dcb, dcr) in zip(frames, clip["frames"]):
        assert (y == dy).all()
        if cshape is None:
            assert dcb is None and dcr is None
        else:
            assert (cb == dcb).all() and (cr == dcr).all()


def test_odd_dimensions_ceil_divide_chroma():
    y = RNG.integers(0, 256, (5, 7), dtype=np.uint8)
    cb = RNG.integers(0, 256, (3, 4), dtype=np.uint8)
    cr = RNG.integers(0, 256, (3, 4), dtype=np.uint8)
    clip = decode_y4m(encode_y4m([(y, cb, cr)], chroma="420"))
    assert (clip["frames"][0][0] == y).all()
    assert (clip["frames"][0][1] == cb).all()


def test_zero_frames_is_valid():
    y = RNG.integers(0, 256, (4, 4), dtype=np.uint8)
    payload = encode_y4m([(y, None, None)], chroma="mono")
    header_only = payload[: payload.index(b"\nFRAME") + 1]
    clip = decode_y4m(header_only)
    assert clip["frames"] == []


def test_malformed_contract():
    y = RNG.integers(0, 256, (4, 4), dtype=np.uint8)
    cb = np.full((2, 2), 128, dtype=np.uint8)
    good = encode_y4m([(y, cb, cb)], chroma="420")
    for bad in (
        b"RIFFxxxx",  # wrong magic
        b"YUV4MPEG2 W0 H8 F25:1 C420\nFRAME\n",  # zero width
        b"YUV4MPEG2 W4 H4 F25:1 C999\nFRAME\n",  # unknown chroma
        good[:-5],  # truncated frame
        good.replace(b"FRAME", b"FRAMX", 1),  # bad marker
    ):
        with pytest.raises(ValueError):
            decode_y4m(bad)


def test_frame_params_after_marker_are_skipped():
    y = np.arange(16, dtype=np.uint8).reshape(4, 4)
    payload = b"YUV4MPEG2 W4 H4 F25:1 Cmono\nFRAME Xsome=param\n" + y.tobytes()
    clip = decode_y4m(payload)
    assert (clip["frames"][0][0] == y).all()


def test_sample_video_frames_recomputed_exactly(spark):
    docs = spark.range(6).withColumnRenamed("id", "doc_id")
    clips = synthesize_y4m_docs(docs)
    rows = {
        (r.doc_id, r.frame_idx): (r.y_sum, r.y_md5)
        for r in sample_video_frames(clips, every_k=2).collect()
    }
    p = np.arange(64, dtype=np.int64)
    expected_idx = {0, 2}  # 3 frames, every 2nd
    assert {i for (_, i) in rows} == expected_idx
    for d in range(6):
        for f in expected_idx:
            yvals = ((d * 13) % 256 + f * 7 + p) % 256
            y = yvals.astype(np.uint8).reshape(8, 8)
            assert rows[(d, f)] == (
                int(yvals.sum()),
                hashlib.md5(y.tobytes()).hexdigest(),
            )


def test_undecodable_payload_contributes_zero_frame_rows(spark):
    df = spark.createDataFrame(
        [(1, b"not a video"), (2, None)], "doc_id bigint, content binary"
    )
    assert sample_video_frames(df).count() == 0


def test_sample_video_frames_handles_animated_gif(spark):
    import hashlib as hl

    import numpy as np

    from rta_registrations_pyspark_glue_spark.operators.gif import encode_gif
    from rta_registrations_pyspark_glue_spark.operators.video import (
        sample_video_frames,
    )

    rng = np.random.default_rng(0x617)
    pal = rng.integers(0, 256, (32, 3), dtype=np.uint8)
    frames = [rng.integers(0, 32, (6, 6), dtype=np.uint8) for _ in range(4)]
    payload = encode_gif(frames, pal)
    df = spark.createDataFrame([(1, payload)], "doc_id bigint, content binary")
    rows = {
        r.frame_idx: (r.y_sum, r.y_md5)
        for r in sample_video_frames(df, every_k=2).collect()
    }
    assert set(rows) == {0, 2}
    for i in (0, 2):
        rgb = pal[frames[i]].astype(np.int64)
        y = ((299 * rgb[:, :, 0] + 587 * rgb[:, :, 1] + 114 * rgb[:, :, 2]) // 1000).astype(np.uint8)
        assert rows[i] == (int(y.astype(np.int64).sum()), hl.md5(y.tobytes()).hexdigest())
