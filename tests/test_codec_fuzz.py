"""Property-based codec fuzzing (hypothesis): every pure-Python codec
must roundtrip ARBITRARY images/clips/streams within its declared
envelope — dimensions, filter choices, chroma modes, bit depths, and
payload entropy are all generated, catching the edge geometry
(1-pixel images, single-column Adam7 passes, odd chroma ceilings,
sub-byte row padding) that fixed fixtures miss. Examples are bounded
so the suite stays fast.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings, strategies as st

from rta_registrations_pyspark_glue_spark.operators.audio import (
    decode_wav,
    encode_wav,
)
from rta_registrations_pyspark_glue_spark.operators.gif import (
    decode_gif,
    encode_gif,
    lzw_decode,
    lzw_encode,
)
from rta_registrations_pyspark_glue_spark.operators.jpeg import (
    decode_jpeg,
    encode_baseline_jpeg,
    encode_progressive_jpeg,
)
from rta_registrations_pyspark_glue_spark.operators.png import (
    decode_png,
    encode_png,
)
from rta_registrations_pyspark_glue_spark.operators.video import (
    decode_y4m,
    encode_y4m,
)

_dims = st.tuples(st.integers(1, 40), st.integers(1, 40))


def _img(draw, h, w, c, seed):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (h, w, c), dtype=np.uint8)


@settings(max_examples=30, deadline=None)
@given(
    dims=_dims,
    channels=st.sampled_from([1, 2, 3, 4]),
    filt=st.one_of(st.integers(0, 4), st.just([0, 1, 2, 3, 4])),
    interlace=st.integers(0, 1),
    seed=st.integers(0, 2**32 - 1),
)
def test_png_roundtrip_fuzz(dims, channels, filt, interlace, seed):
    h, w = dims
    img = _img(None, h, w, channels, seed)
    out = decode_png(encode_png(img, filters=filt, interlace=interlace))
    assert out.shape == img.shape and (out == img).all()


@settings(max_examples=20, deadline=None)
@given(
    dims=_dims,
    pal_bits=st.integers(1, 8),
    interlace=st.booleans(),
    seed=st.integers(0, 2**32 - 1),
)
def test_gif_roundtrip_fuzz(dims, pal_bits, interlace, seed):
    h, w = dims
    rng = np.random.default_rng(seed)
    n = 1 << pal_bits
    pal = rng.integers(0, 256, (n, 3), dtype=np.uint8)
    idx = rng.integers(0, n, (h, w), dtype=np.uint8)
    clip = decode_gif(encode_gif(idx, pal, interlace=interlace))
    assert (clip["frames"][0]["image"] == pal[idx]).all()


@settings(max_examples=25, deadline=None)
@given(
    mcs=st.integers(2, 8),
    length=st.integers(0, 4000),
    alphabet=st.integers(1, 256),
    seed=st.integers(0, 2**32 - 1),
)
def test_lzw_roundtrip_fuzz(mcs, length, alphabet, seed):
    rng = np.random.default_rng(seed)
    hi = min(alphabet, 1 << mcs)
    payload = rng.integers(0, hi, length).astype(np.uint8).tobytes()
    assert lzw_decode(mcs, lzw_encode(mcs, payload), length) == payload


@settings(max_examples=20, deadline=None)
@given(
    n=st.integers(1, 500),
    channels=st.integers(1, 4),
    bits=st.sampled_from([8, 16, 24, 32]),
    rate=st.sampled_from([8000, 16000, 44100]),
    seed=st.integers(0, 2**32 - 1),
)
def test_wav_pcm_roundtrip_fuzz(n, channels, bits, rate, seed):
    rng = np.random.default_rng(seed)
    lo, hi = -(1 << (bits - 1)), 1 << (bits - 1)
    s = rng.integers(lo, hi, (n, channels), dtype=np.int64).astype(np.int32)
    frames, got_rate = decode_wav(encode_wav(s, rate, bits=bits))
    assert got_rate == rate and frames.shape == (n, channels)
    assert (frames == s).all()


@settings(max_examples=15, deadline=None)
@given(
    dims=st.tuples(st.integers(1, 24), st.integers(1, 24)),
    n_frames=st.integers(1, 4),
    chroma=st.sampled_from(["420jpeg", "422", "444", "mono"]),
    seed=st.integers(0, 2**32 - 1),
)
def test_y4m_roundtrip_fuzz(dims, n_frames, chroma, seed):
    h, w = dims
    rng = np.random.default_rng(seed)
    div = {"420jpeg": (2, 2), "422": (2, 1), "444": (1, 1), "mono": None}[chroma]
    frames = []
    for _ in range(n_frames):
        y = rng.integers(0, 256, (h, w), dtype=np.uint8)
        if div is None:
            frames.append((y, None, None))
        else:
            cw = (w + div[0] - 1) // div[0]
            ch = (h + div[1] - 1) // div[1]
            frames.append(
                (
                    y,
                    rng.integers(0, 256, (ch, cw), dtype=np.uint8),
                    rng.integers(0, 256, (ch, cw), dtype=np.uint8),
                )
            )
    clip = decode_y4m(encode_y4m(frames, chroma=chroma))
    assert len(clip["frames"]) == n_frames
    for (y, cb, cr), (dy, dcb, dcr) in zip(frames, clip["frames"]):
        assert (y == dy).all()
        if div is not None:
            assert (cb == dcb).all() and (cr == dcr).all()


@settings(max_examples=10, deadline=None)
@given(
    dims=st.tuples(st.integers(1, 24), st.integers(1, 24)),
    gray=st.booleans(),
    seed=st.integers(0, 2**32 - 1),
)
def test_jpeg_progressive_equals_baseline_fuzz(dims, gray, seed):
    """The strongest JPEG property: progressive and baseline encodings
    of the same image decode BIT-IDENTICALLY (shared coefficient
    domain) at any geometry."""
    h, w = dims
    rng = np.random.default_rng(seed)
    shape = (h, w) if gray else (h, w, 3)
    img = rng.integers(0, 256, shape, dtype=np.uint8)
    b = decode_jpeg(encode_baseline_jpeg(img))
    p = decode_jpeg(encode_progressive_jpeg(img))
    assert (b == p).all()


@settings(max_examples=20, deadline=None)
@given(
    dims=st.tuples(st.integers(1, 32), st.integers(1, 32)),
    channels=st.sampled_from([1, 3, 4]),
    compression=st.sampled_from([1, 5, 8, 32773]),
    rps=st.one_of(st.none(), st.integers(1, 8)),
    big_endian=st.booleans(),
    seed=st.integers(0, 2**32 - 1),
)
def test_tiff_roundtrip_fuzz(dims, channels, compression, rps, big_endian, seed):
    from rta_registrations_pyspark_glue_spark.operators.tiff import (
        decode_tiff,
        encode_tiff,
    )

    h, w = dims
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (h, w, channels), dtype=np.uint8)
    out = decode_tiff(
        encode_tiff(
            img, compression=compression, rows_per_strip=rps, big_endian=big_endian
        )
    )
    assert out.shape == img.shape and (out == img).all()
