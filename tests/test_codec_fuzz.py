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


@settings(max_examples=30, deadline=None)
@given(
    dims=_dims,
    channels=st.sampled_from([3, 4]),
    mode=st.sampled_from(["plain", "subtract_green", "palette"]),
    n_colors=st.integers(1, 40),
    seed=st.integers(0, 2**32 - 1),
)
def test_webp_vp8l_roundtrip_fuzz(dims, channels, mode, n_colors, seed):
    """VP8L lossless must roundtrip arbitrary images across every
    encoder mode — palette sizes straddle all three packing widths
    (1/2/4 bpp) plus the unpacked >16-color case; 1-pixel images and
    single-color palettes hit the degenerate prefix-code forms."""
    from rta_registrations_pyspark_glue_spark.operators.webp import (
        decode_webp,
        encode_webp,
    )

    h, w = dims
    rng = np.random.default_rng(seed)
    if mode == "palette":
        base = rng.integers(0, 256, (n_colors, channels), dtype=np.uint8)
        img = base[rng.integers(0, n_colors, (h, w))]
        out = decode_webp(encode_webp(img, palette=True))
    else:
        img = rng.integers(0, 256, (h, w, channels), dtype=np.uint8)
        out = decode_webp(encode_webp(img, subtract_green=(mode == "subtract_green")))
    assert out.shape == (h, w, 4)
    assert (out[:, :, :channels] == img).all()
    if channels == 3:
        assert (out[:, :, 3] == 255).all()


@settings(max_examples=40, deadline=None)
@given(
    n=st.integers(1, 700),
    spb=st.sampled_from([9, 17, 64, 505]),
    channels=st.integers(1, 2),
    amp=st.integers(0, 32000),
    seed=st.integers(0, 2**32 - 1),
)
def test_ima_adpcm_decode_fuzz(n, spb, channels, amp, seed):
    """IMA ADPCM decode of arbitrary encoded signals: shapes and rates
    survive, samples stay in int16 range (the clamp), fact-chunk
    trimming matches the input length, and decode is deterministic."""
    from rta_registrations_pyspark_glue_spark.operators.audio import (
        decode_wav,
        encode_ima_adpcm_wav,
    )

    rng = np.random.default_rng(seed)
    sig = rng.integers(-amp - 1, amp + 1, (n, channels)).astype(np.int32)
    wav = encode_ima_adpcm_wav(sig, 8000, samples_per_block=spb)
    frames, rate = decode_wav(wav)
    assert rate == 8000 and frames.shape == (n, channels)
    assert frames.min() >= -32768 and frames.max() <= 32767
    frames2, _ = decode_wav(wav)
    assert (frames2 == frames).all()


@settings(max_examples=60, deadline=None)
@given(
    seed=st.integers(0, 2**32 - 1),
    n_flips=st.integers(1, 12),
    truncate=st.booleans(),
)
def test_webp_corruption_raises_cleanly(seed, n_flips, truncate):
    """Randomly corrupted/truncated VP8L payloads must fail with the
    codec's declared exceptions (ValueError / NotImplementedError) or
    decode to SOME image — never escape with IndexError/KeyError/
    struct.error from the bit machinery."""
    from rta_registrations_pyspark_glue_spark.operators.webp import (
        decode_webp,
        encode_webp,
    )

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (9, 11, 3), dtype=np.uint8)
    data = bytearray(encode_webp(img))
    if truncate:
        data = data[: rng.integers(12, len(data))]
    for _ in range(n_flips):
        data[rng.integers(0, len(data))] ^= 1 << rng.integers(0, 8)
    try:
        out = decode_webp(bytes(data))
        assert out.ndim == 3  # corrupted-but-decodable is acceptable
    except (ValueError, NotImplementedError):
        pass  # the declared failure envelope


@settings(max_examples=40, deadline=None)
@given(
    n=st.integers(1, 700),
    spb=st.sampled_from([4, 17, 64, 500]),
    channels=st.integers(1, 2),
    amp=st.integers(0, 32000),
    seed=st.integers(0, 2**32 - 1),
)
def test_ms_adpcm_decode_fuzz(n, spb, channels, amp, seed):
    """MS ADPCM decode of arbitrary encoded signals: shapes and rates
    survive, samples stay in int16 range (the clamp), fact-chunk
    trimming matches the input length, and decode is deterministic."""
    from rta_registrations_pyspark_glue_spark.operators.audio import (
        decode_wav,
        encode_ms_adpcm_wav,
    )

    rng = np.random.default_rng(seed)
    sig = rng.integers(-amp - 1, amp + 1, (n, channels)).astype(np.int32)
    wav = encode_ms_adpcm_wav(sig, 8000, samples_per_block=spb)
    frames, rate = decode_wav(wav)
    assert rate == 8000 and frames.shape == (n, channels)
    assert frames.min() >= -32768 and frames.max() <= 32767
    frames2, _ = decode_wav(wav)
    assert (frames2 == frames).all()


@settings(max_examples=60, deadline=None)
@given(
    seed=st.integers(0, 2**32 - 1),
    n_flips=st.integers(1, 12),
    truncate=st.booleans(),
)
def test_ms_adpcm_corruption_raises_cleanly(seed, n_flips, truncate):
    """Randomly corrupted/truncated MS-ADPCM payloads must fail with
    the decoder's declared exceptions (ValueError /
    NotImplementedError) or decode to SOME frames — never escape with
    IndexError/struct.error from the block walker."""
    from rta_registrations_pyspark_glue_spark.operators.audio import (
        decode_wav,
        encode_ms_adpcm_wav,
    )

    rng = np.random.default_rng(seed)
    sig = rng.integers(-8000, 8000, 150).astype(np.int32)
    wav = bytearray(encode_ms_adpcm_wav(sig, 8000, samples_per_block=64))
    if truncate:
        wav = wav[: rng.integers(8, len(wav))]
    for _ in range(n_flips):
        if not wav:
            break
        wav[rng.integers(0, len(wav))] ^= 1 << rng.integers(0, 8)
    try:
        frames, rate = decode_wav(bytes(wav))
        assert frames.ndim == 2 and rate >= 0
    except (ValueError, NotImplementedError):
        pass
