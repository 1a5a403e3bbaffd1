"""Pure-Python/numpy MP4 (ISO-BMFF) sample extraction — no external codec.

Closes the dominant-container half of the boundary `video.py` declared
(MP4/WebM/MKV used to raise at one call site; AVI landed in round 9):
the ISO base-media file format stores every track's payload as SAMPLES
addressed by four `stbl` tables — `stsz` (sizes), `stsc` (sample→chunk
runs), `stco`/`co64` (chunk offsets), `stsd` (codec + entry header) —
and walking those tables is pure struct parsing. Frame EXTRACTION is
therefore container work, not codec work, and the extracted payloads
route to decoders this repo already owns:

- **'jpeg'** video sample entries (QuickTime Motion-JPEG / photo-JPEG
  in MP4): one ISO/IEC 10918 JPEG per sample, decoded by
  `operators/jpeg.py`; table-less frames get the T.81 Annex K typical
  tables injected by `avi._ensure_dht` (the same OpenDML convention
  MJPEG-in-MP4 muxers follow).
- **'raw '** video entries (uncompressed, depth 24): top-down packed
  RGB rows, width·3 bytes each — a numpy reshape.
- **'sowt'/'twos'** audio entries: little-/big-endian 16-bit PCM
  (the QuickTime uncompressed-audio pair) through numpy, the same
  sample semantics `operators/audio.py` pins for WAV.

Compressed codecs (avc1, hvc1, vp09, mp4a/AAC, ...) raise
NotImplementedError at the per-track boundary — the documented plug-in
point where ffmpeg/PyAV slots in — while the container walk, the other
track, and the features still work. The box walk itself is shared with
`operators/mediameta.py` (`_mp4_boxes`), which parses the same files
header-only; this module is the payload path.

Spark surface mirrors avi.py: fixtures and features are Arrow-batched
``mapInPandas`` — memory bounded by the batch, parallelism = partition
parallelism, nothing driver-side. At 100 TB the demux is
embarrassingly parallel per file; bytes touched = moov + the routed
samples, and the one-pass table walk never materializes more than one
sample at a time beyond the decoded frames requested.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame

from rta_registrations_pyspark_glue_spark.operators.spread import spread_ids

from rta_registrations_pyspark_glue_spark.operators.avi import _ensure_dht, _to_rgb
from rta_registrations_pyspark_glue_spark.operators.jpeg import (
    decode_jpeg,
    encode_baseline_jpeg,
)
from rta_registrations_pyspark_glue_spark.operators.mediameta import _mp4_boxes

_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl"}

#: codecs this demux can ROUTE (everything else is the documented
#: NotImplementedError boundary)
_VIDEO_ROUTED = {"jpeg", "raw "}
_AUDIO_ROUTED = {"sowt", "twos", ".mp3"}


# ---------------------------------------------------------------------------
# stbl table parsing


def _parse_stsd(buf: bytes, body: int) -> dict:
    """First sample-description entry: codec fourcc + the typed fields
    the routers need (dims for video; channels/bits/rate for audio)."""
    (n_entries,) = struct.unpack_from(">I", buf, body + 4)
    if n_entries < 1:
        raise ValueError("stsd with no entries")
    esize, = struct.unpack_from(">I", buf, body + 8)
    codec = buf[body + 12 : body + 16].decode("latin-1")
    entry = body + 16  # after size+fourcc
    if esize < 16 or body + 8 + esize > len(buf) + 1:
        raise ValueError("bad stsd entry size")
    # 6 reserved + 2 data_reference_index, then the class-specific part
    fields = entry + 8
    return {"codec": codec, "entry_off": fields, "entry_size": esize}


def _stsd_video_dims(buf: bytes, fields: int) -> tuple[int, int, int]:
    """(width, height, depth) from a VisualSampleEntry."""
    w, h = struct.unpack_from(">HH", buf, fields + 16)
    (depth,) = struct.unpack_from(">H", buf, fields + 66)
    return w, h, depth


def _stsd_audio_fmt(buf: bytes, fields: int) -> tuple[int, int, int]:
    """(channels, bits, sample_rate) from an AudioSampleEntry v0."""
    ch, bits = struct.unpack_from(">HH", buf, fields + 8)
    (rate_fx,) = struct.unpack_from(">I", buf, fields + 16)
    return ch, bits, rate_fx >> 16


def _parse_stsz(buf: bytes, body: int) -> tuple[int, list[int] | None]:
    uniform, count = struct.unpack_from(">II", buf, body + 4)
    if uniform:
        return count, None
    sizes = list(struct.unpack_from(f">{count}I", buf, body + 12))
    return count, sizes


def _parse_stsc(buf: bytes, body: int) -> list[tuple[int, int, int]]:
    (count,) = struct.unpack_from(">I", buf, body + 4)
    out = []
    for i in range(count):
        out.append(struct.unpack_from(">III", buf, body + 8 + 12 * i))
    return out


def _parse_stco(buf: bytes, body: int, wide: bool) -> list[int]:
    (count,) = struct.unpack_from(">I", buf, body + 4)
    fmt = ">Q" if wide else ">I"
    step = 8 if wide else 4
    return [
        struct.unpack_from(fmt, buf, body + 8 + step * i)[0]
        for i in range(count)
    ]


def _sample_layout(
    stsc: list[tuple[int, int, int]],
    chunk_offsets: list[int],
    n_samples: int,
    uniform_size: int,
    sizes: list[int] | None,
) -> list[tuple[int, int]]:
    """Flatten the stsc runs against the chunk-offset table into one
    (file_offset, size) per sample — the core ISO-BMFF addressing walk.
    stsc entries are (first_chunk, samples_per_chunk, desc_idx) runs,
    1-based, each applying until the next entry's first_chunk."""
    if not chunk_offsets or not stsc:
        return []
    out: list[tuple[int, int]] = []
    si = 0  # 0-based running sample index

    def size_of(i: int) -> int:
        return sizes[i] if sizes is not None else uniform_size

    for ri, (first, spc, _desc) in enumerate(stsc):
        nxt = stsc[ri + 1][0] if ri + 1 < len(stsc) else len(chunk_offsets) + 1
        if first < 1 or nxt <= first or spc < 1:
            raise ValueError("stsc runs not ascending")
        last = nxt - 1
        for ci in range(first, last + 1):
            if ci - 1 >= len(chunk_offsets):
                break
            pos = chunk_offsets[ci - 1]
            for _ in range(spc):
                if si >= n_samples:
                    return out
                sz = size_of(si)
                out.append((pos, sz))
                pos += sz
                si += 1
    if si < n_samples:
        raise ValueError(
            f"stsc/stco address only {si} of {n_samples} samples"
        )
    return out


# ---------------------------------------------------------------------------
# Demux


def demux_mp4(content: bytes) -> dict:
    """Parse an ISO-BMFF file, extract every addressed sample of the
    first video and first audio track, and ROUTE payloads to owned
    decoders: 'jpeg' → operators/jpeg (Annex-K injection for table-less
    frames), 'raw ' depth-24 → packed top-down RGB, 'sowt'/'twos' →
    LE/BE int16 PCM. Returns {width, height, video_codec, frames
    [HxWx3 uint8], audio (n, ch) int16 | None, audio_codec, n_samples}.
    Compressed codecs raise NotImplementedError at the track boundary.
    The declared failure envelope is ValueError / NotImplementedError —
    truncated fixed-width fields (struct.error) are converted at this
    boundary so callers never see the internals' exception types."""
    try:
        return _demux_mp4_inner(content)
    except struct.error as e:
        raise ValueError(f"truncated MP4 structure: {e}") from None


def _demux_mp4_inner(content: bytes) -> dict:
    buf = content
    tracks: list[dict] = []
    track: dict = {}
    saw_ftyp = False

    def walk(pos: int, end: int) -> None:
        nonlocal track, saw_ftyp
        for typ, body, bend in _mp4_boxes(buf, pos, end):
            if typ == b"ftyp":
                saw_ftyp = True
            elif typ == b"hdlr":
                track["class"] = buf[body + 8 : body + 12]
            elif typ == b"stsd":
                track["stsd"] = _parse_stsd(buf, body)
            elif typ == b"stsz":
                track["n_samples"], track["sizes"] = _parse_stsz(buf, body)
                (track["uniform"],) = struct.unpack_from(">I", buf, body + 4)
            elif typ == b"stsc":
                track["stsc"] = _parse_stsc(buf, body)
            elif typ == b"stco":
                track["chunks"] = _parse_stco(buf, body, wide=False)
            elif typ == b"co64":
                track["chunks"] = _parse_stco(buf, body, wide=True)
            elif typ in _CONTAINERS:
                if typ == b"trak":
                    track = {}
                walk(body, bend)
                if typ == b"trak":
                    tracks.append(track)

    walk(0, len(buf))
    if not saw_ftyp:
        raise ValueError("MP4 without ftyp")

    out = {
        "width": None, "height": None, "video_codec": None, "frames": [],
        "audio": None, "audio_codec": None, "n_samples": 0,
    }
    vide = next((t for t in tracks if t.get("class") == b"vide"), None)
    soun = next((t for t in tracks if t.get("class") == b"soun"), None)

    if vide is not None and "stsd" in vide:
        codec = vide["stsd"]["codec"]
        out["video_codec"] = codec
        if codec not in _VIDEO_ROUTED:
            raise NotImplementedError(
                f"MP4 video codec {codec!r}: sample extraction works, "
                "decode needs an external codec (ffmpeg/PyAV plug-in "
                "boundary; 'jpeg' and 'raw ' route natively)"
            )
        w, h, depth = _stsd_video_dims(buf, vide["stsd"]["entry_off"])
        out["width"], out["height"] = w, h
        layout = _sample_layout(
            vide.get("stsc", []), vide.get("chunks", []),
            vide.get("n_samples", 0), vide.get("uniform", 0),
            vide.get("sizes"),
        )
        for off, sz in layout:
            if off + sz > len(buf):
                raise ValueError("sample beyond EOF")
            payload = buf[off : off + sz]
            if codec == "jpeg":
                out["frames"].append(_to_rgb(decode_jpeg(_ensure_dht(payload))))
            else:  # 'raw '
                if depth != 24:
                    raise NotImplementedError(
                        f"'raw ' depth {depth}: only 24-bit packed RGB"
                    )
                if sz != w * h * 3:
                    raise ValueError("raw sample size != w*h*3")
                out["frames"].append(
                    np.frombuffer(payload, np.uint8).reshape(h, w, 3).copy()
                )

    if soun is not None and "stsd" in soun:
        codec = soun["stsd"]["codec"]
        out["audio_codec"] = codec
        if codec not in _AUDIO_ROUTED:
            raise NotImplementedError(
                f"MP4 audio codec {codec!r}: 'sowt'/'twos' PCM and '.mp3' "
                "route natively; other compressed audio is the plug-in "
                "boundary"
            )
        if codec == ".mp3":
            # MP3-in-MP4 ('.mp3' sample entry): samples are whole MPEG
            # frames — reassemble the elementary stream and hand it to
            # the frame decoder (operators/mp3.py: silent granules are
            # exact; Huffman granules raise at ITS documented boundary)
            from rta_registrations_pyspark_glue_spark.operators.mp3 import (
                decode_mp3,
            )

            layout = _sample_layout(
                soun.get("stsc", []), soun.get("chunks", []),
                soun.get("n_samples", 0), soun.get("uniform", 0),
                soun.get("sizes"),
            )
            for off, sz in layout:
                if off + sz > len(buf):
                    raise ValueError("audio sample beyond EOF")
            clip = decode_mp3(b"".join(buf[o : o + s] for o, s in layout))
            out["audio"] = clip["pcm"]
            out["n_samples"] = int(clip["pcm"].shape[0])
            return out
        ch, bits, _rate = _stsd_audio_fmt(buf, soun["stsd"]["entry_off"])
        if bits != 16 or ch < 1:
            raise NotImplementedError(f"PCM {bits}-bit x{ch}: 16-bit only")
        layout = _sample_layout(
            soun.get("stsc", []), soun.get("chunks", []),
            soun.get("n_samples", 0), soun.get("uniform", 0),
            soun.get("sizes"),
        )
        for off, sz in layout:
            if off + sz > len(buf):
                raise ValueError("audio sample beyond EOF")
        raw = b"".join(buf[o : o + s] for o, s in layout)
        dt = "<i2" if codec == "sowt" else ">i2"
        pcm = np.frombuffer(raw, dt).astype(np.int16)
        out["audio"] = pcm.reshape(-1, ch)
        out["n_samples"] = out["audio"].shape[0]

    return out


# ---------------------------------------------------------------------------
# Fixture encoder


def _box(typ: bytes, body: bytes) -> bytes:
    return struct.pack(">I", len(body) + 8) + typ + body


def _full(typ: bytes, body: bytes) -> bytes:
    return _box(typ, b"\x00\x00\x00\x00" + body)


def encode_mp4_av(
    frames: list,
    *,
    codec: str = "jpeg",
    frame_size: tuple[int, int] | None = None,
    audio: np.ndarray | None = None,
    audio_rate: int = 8000,
    audio_codec: str = "sowt",
    use_co64: bool = False,
) -> bytes:
    """Fixture-grade ISO-BMFF writer with REAL sample tables: mdat
    carries the actual payloads, and stsd/stts/stsc/stsz/stco (or co64
    when ``use_co64``) address them. Video samples are split across
    TWO chunks (frame 0 alone, the rest together) so the stsc run walk
    is exercised, and audio PCM frames go in two 32-sample chunks
    interleaved between them — the classic progressive-download
    interleave. ``frames``: HxW gray or HxWx3 RGB uint8 arrays (or
    pre-encoded JPEG bytes with ``frame_size``); ``codec``: 'jpeg' or
    'raw ' (packed top-down RGB24); ``audio``: (n,) or (n, ch) int16,
    written 'sowt' (LE) or 'twos' (BE)."""
    if frame_size is not None:
        h, w = frame_size
    else:
        h, w = frames[0].shape[:2]

    payloads: list[bytes] = []
    if codec == "jpeg":
        for f in frames:
            payloads.append(f if isinstance(f, bytes) else encode_baseline_jpeg(f))
        depth = 24
    elif codec == "raw ":
        for f in frames:
            if f.ndim != 3:
                raise ValueError("'raw ' frames must be HxWx3")
            payloads.append(np.ascontiguousarray(f, np.uint8).tobytes())
        depth = 24
    else:
        raise ValueError(f"fixture codec {codec!r}")

    if audio_codec == ".mp3" and audio is not None:
        # MP3-in-MP4 fixture: ``audio`` is the raw elementary stream
        # (bytes); each half is one sample so the layout walk still runs
        es = bytes(audio)
        ch, n_pcm = 1, 2
        a_chunks = [es[: len(es) // 2], es[len(es) // 2 :]]
        mp3_sizes = [len(c) for c in a_chunks]
    elif audio is not None:
        a = np.asarray(audio, np.int16)
        if a.ndim == 1:
            a = a[:, None]
        ch = a.shape[1]
        dt = "<i2" if audio_codec == "sowt" else ">i2"
        pcm = a.astype(dt).tobytes()
        n_pcm = a.shape[0]
        a_chunks = [
            pcm[: (n_pcm // 2) * 2 * ch],
            pcm[(n_pcm // 2) * 2 * ch :],
        ]
        mp3_sizes = None
    else:
        ch, n_pcm, a_chunks, mp3_sizes = 0, 0, [], None

    # mdat layout: [v0][a0][v1..][a1] — offsets are absolute, so lay
    # out the file as ftyp + mdat + moov (moov-at-end, the capture
    # layout) and compute stco against the known prefix.
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2mp41")
    v_chunks = [b"".join(payloads[:1]), b"".join(payloads[1:])]
    mdat_body = v_chunks[0]
    offs = {"v": [len(ftyp) + 8], "a": []}
    if a_chunks:
        offs["a"].append(len(ftyp) + 8 + len(mdat_body))
        mdat_body += a_chunks[0]
    if len(payloads) > 1:
        offs["v"].append(len(ftyp) + 8 + len(mdat_body))
        mdat_body += v_chunks[1]
    if a_chunks:
        offs["a"].append(len(ftyp) + 8 + len(mdat_body))
        mdat_body += a_chunks[1]
    mdat = _box(b"mdat", mdat_body)

    ts = 1000
    dur = max(1, len(payloads)) * 40  # 25 fps in a 1 kHz timescale

    def stco_box(offsets: list[int]) -> bytes:
        if use_co64:
            return _full(
                b"co64",
                struct.pack(">I", len(offsets))
                + b"".join(struct.pack(">Q", o) for o in offsets),
            )
        return _full(
            b"stco",
            struct.pack(">I", len(offsets))
            + b"".join(struct.pack(">I", o) for o in offsets),
        )

    def trak(
        cls: bytes, fourcc: str, tid: int, *, stsd_entry: bytes,
        stts: list[tuple[int, int]], stsc: list[tuple[int, int, int]],
        uniform: int, sizes: list[int] | None, n_samples: int,
        offsets: list[int], tdur: int,
    ) -> bytes:
        tkhd = _box(
            b"tkhd",
            struct.pack(">B3B", 0, 0, 0, 7) + struct.pack(">II", 0, 0)
            + struct.pack(">I4xI", tid, tdur) + b"\x00" * 8
            + struct.pack(">HH", 0, 0) + struct.pack(">H2x", 0x0100)
            + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
            + struct.pack(">II", (w if cls == b"vide" else 0) << 16,
                          (h if cls == b"vide" else 0) << 16),
        )
        mdhd = _box(
            b"mdhd",
            struct.pack(">B3x", 0) + struct.pack(">II", 0, 0)
            + struct.pack(">II", ts, tdur) + struct.pack(">HH", 0x55C4, 0),
        )
        hdlr = _box(b"hdlr", struct.pack(">B3x4x", 0) + cls + b"\x00" * 12 + b"\x00")
        stsd = _full(
            b"stsd", struct.pack(">I", 1) + _box(fourcc.encode("latin-1"), stsd_entry)
        )
        stts_b = _full(
            b"stts",
            struct.pack(">I", len(stts))
            + b"".join(struct.pack(">II", c, d) for c, d in stts),
        )
        stsc_b = _full(
            b"stsc",
            struct.pack(">I", len(stsc))
            + b"".join(struct.pack(">III", f, s, d) for f, s, d in stsc),
        )
        if sizes is None:
            stsz_b = _full(b"stsz", struct.pack(">II", uniform, n_samples))
        else:
            stsz_b = _full(
                b"stsz",
                struct.pack(">II", 0, n_samples)
                + b"".join(struct.pack(">I", s) for s in sizes),
            )
        mhd = (
            _full(b"vmhd", struct.pack(">HHHH", 0, 0, 0, 0))
            if cls == b"vide"
            else _full(b"smhd", struct.pack(">HH", 0, 0))
        )
        # url box: version 0, flags 0x000001 = media is self-contained
        dref = _full(
            b"dref", struct.pack(">I", 1) + _box(b"url ", b"\x00\x00\x00\x01")
        )
        dinf = _box(b"dinf", dref)
        stbl = _box(b"stbl", stsd + stts_b + stsc_b + stsz_b + stco_box(offsets))
        minf = _box(b"minf", mhd + dinf + stbl)
        mdia = _box(b"mdia", mdhd + hdlr + minf)
        return _box(b"trak", tkhd + mdia)

    v_entry = (
        b"\x00" * 6 + struct.pack(">H", 1)
        + b"\x00" * 16 + struct.pack(">HH", w, h)
        + struct.pack(">II", 0x00480000, 0x00480000) + b"\x00" * 4
        + struct.pack(">H", 1) + b"\x00" * 32
        + struct.pack(">Hh", depth, -1)
    )
    v_stsc = [(1, 1, 1)] + ([(2, len(payloads) - 1, 1)] if len(payloads) > 1 else [])
    traks = trak(
        b"vide", codec, 1, stsd_entry=v_entry,
        stts=[(len(payloads), 40)], stsc=v_stsc, uniform=0,
        sizes=[len(p) for p in payloads], n_samples=len(payloads),
        offsets=offs["v"], tdur=dur,
    )
    if audio is not None:
        a_entry = (
            b"\x00" * 6 + struct.pack(">H", 1)
            + b"\x00" * 8 + struct.pack(">HH", ch, 16) + b"\x00" * 4
            + struct.pack(">I", audio_rate << 16)
        )
        if mp3_sizes is not None:
            a_stsc = [(1, 1, 1), (2, 1, 1)]
            traks += trak(
                b"soun", audio_codec, 2, stsd_entry=a_entry,
                stts=[(2, 1)], stsc=a_stsc, uniform=0, sizes=mp3_sizes,
                n_samples=2, offsets=offs["a"], tdur=2,
            )
        else:
            half = n_pcm // 2
            a_stsc = [(1, half, 1), (2, n_pcm - half, 1)]
            traks += trak(
                b"soun", audio_codec, 2, stsd_entry=a_entry,
                stts=[(n_pcm, 1)], stsc=a_stsc, uniform=2 * ch, sizes=None,
                n_samples=n_pcm, offsets=offs["a"], tdur=n_pcm,
            )

    mvhd = _box(
        b"mvhd",
        struct.pack(">B3x", 0) + struct.pack(">II", 0, 0)
        + struct.pack(">II", ts, dur)
        + struct.pack(">IH2x", 0x00010000, 0x0100) + b"\x00" * 8
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + b"\x00" * 24 + struct.pack(">I", 3),
    )
    moov = _box(b"moov", mvhd + traks)
    return ftyp + mdat + moov


# ---------------------------------------------------------------------------
# Spark surface

MP4_SCHEMA = (
    "doc_id bigint, width int, height int, n_frames int, codec string, "
    "pix_sum bigint, n_audio bigint, audio_sum bigint, decode_ok boolean"
)


def synthesize_mp4_docs(
    docs: DataFrame, size: int = 16, n_frames: int = 2
) -> DataFrame:
    """(doc_id, content): a deterministic two-track MP4 per doc, codec
    alternating by parity so ONE oracle kind pins both routed paths
    (the avi.synthesize_avi_docs convention, same closed forms):

    - even doc_id → **'jpeg'**: solid-gray frames ``v_f = (doc_id·37 +
      f·11) % 256`` (DC-only decode is exact) → ``pix_sum =
      3·size²·Σ_f v_f``; audio written **'sowt'** (LE).
    - odd doc_id → **'raw '**: per-pixel ``(doc_id·7 + f·11 + p·3 + c)
      % 256`` packed RGB; audio written **'twos'** (BE) so both PCM
      byte orders ride the gate.

    Both carry mono 16-bit PCM, sample ``s`` of 64 = ``((doc_id·3 + s)
    % 256 − 128)·4`` — identical to the AVI leg, so a routing bug in
    either container is distinguishable from a decoder bug."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                s = np.arange(64, dtype=np.int64)
                aud = (((d * 3 + s) % 256 - 128) * 4).astype(np.int16)
                if d % 2 == 0:
                    frames = [
                        np.full((size, size), (d * 37 + f * 11) % 256, np.uint8)
                        for f in range(n_frames)
                    ]
                    payloads.append(
                        encode_mp4_av(
                            frames, codec="jpeg", audio=aud, audio_codec="sowt"
                        )
                    )
                else:
                    p = np.arange(size * size, dtype=np.int64)[:, None]
                    c = np.arange(3, dtype=np.int64)[None, :]
                    frames = [
                        ((d * 7 + f * 11 + p * 3 + c) % 256)
                        .astype(np.uint8)
                        .reshape(size, size, 3)
                        for f in range(n_frames)
                    ]
                    payloads.append(
                        encode_mp4_av(
                            frames, codec="raw ", audio=aud, audio_codec="twos"
                        )
                    )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "content": pd.Series(payloads, dtype="object"),
                }
            )

    return spread_ids(docs.select("doc_id")).mapInPandas(op, "doc_id bigint, content binary")


def demux_mp4_features(df: DataFrame) -> DataFrame:
    """Demux + route the binary column with the REAL ISO-BMFF walker
    and emit container-level features: dimensions, frame count, video
    codec, exact RGB pixel sum over all frames, audio sample count and
    sum. Undecodable rows come back decode_ok=false with NULLs."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ws, hs, nfs, codecs, psums, nas, asums, oks = (
                [], [], [], [], [], [], [], [],
            )
            for content in pdf["content"]:
                try:
                    clip = demux_mp4(bytes(content))
                except (ValueError, NotImplementedError, TypeError, struct.error):
                    for col in (ws, hs, nfs, codecs, psums, nas, asums):
                        col.append(None)
                    oks.append(False)
                else:
                    ws.append(clip["width"])
                    hs.append(clip["height"])
                    nfs.append(len(clip["frames"]))
                    codecs.append(clip["video_codec"])
                    psums.append(
                        int(sum(int(f.astype(np.int64).sum()) for f in clip["frames"]))
                    )
                    if clip["audio"] is None:
                        nas.append(None)
                        asums.append(None)
                    else:
                        nas.append(int(clip["audio"].shape[0]))
                        asums.append(int(clip["audio"].astype(np.int64).sum()))
                    oks.append(True)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": pd.array(ws, dtype="Int32"),
                    "height": pd.array(hs, dtype="Int32"),
                    "n_frames": pd.array(nfs, dtype="Int32"),
                    "codec": pd.Series(codecs, dtype="object"),
                    "pix_sum": pd.array(psums, dtype="Int64"),
                    "n_audio": pd.array(nas, dtype="Int64"),
                    "audio_sum": pd.array(asums, dtype="Int64"),
                    "decode_ok": pd.array(oks, dtype="boolean"),
                }
            )

    return df.select("doc_id", "content").mapInPandas(op, MP4_SCHEMA)
