"""Pure-Python/numpy PNG codec — no external imaging library.

Closes the last common-format gap in the native decode boundary
(``multimodal.decode_image``): after round 6's PPM/PGM/BMP and round
7's baseline JPEG, PNG was the remaining codec a real image corpus is
guaranteed to contain. The reference has no imaging surface at all
(it is a 544-line Glue ETL, see SURVEY.md §2) — this exists for the
LLM-data-pipeline extension, where multimodal corpora arrive as opaque
binary columns and decode must not require cluster-wide native deps.

Decoder (``decode_png``) implements the full static subset of the PNG
spec (RFC 2083 / W3C PNG second edition — public documents):

- chunk framing with CRC-32 verification on every chunk;
- IHDR validation of the legal (bit depth, colour type) matrix;
- all five scanline filters (None/Sub/Up/Average/Paeth);
- bit depths 1/2/4/8/16 — sub-byte samples are unpacked MSB-first,
  16-bit samples reduce to their high byte (the decode contract is
  HxWxC uint8; the high byte is the spec's own recommended 16→8
  reduction and matches what PIL's ``convert("L")`` path does);
- colour types 0 (gray), 2 (RGB), 3 (palette), 4 (gray+alpha),
  6 (RGBA), with PLTE lookup and tRNS in all three forms (palette
  alpha table, gray colour-key, RGB colour-key — keyed at the
  ORIGINAL bit depth, before 16→8 reduction, per spec);
- Adam7 interlace (7-pass deinterlace; each pass filtered
  independently inside the single zlib stream).

Malformed input (bad CRC, truncated IDAT, illegal header combos,
short scanlines) raises ValueError — the decode_image contract for
recognized-but-broken payloads.

Encoder (``encode_png``) exists to build fixtures that exercise every
decoder path from tests and from the oracle-checked
``multimodal.synthesize_png_docs``: per-row filter choice (int or
cycled sequence), palette mode, tRNS, sub-byte packing, 16-bit, and
Adam7 interlace. It is correctness-grade, not a compressor.

Scale note: decode runs inside Arrow-batched ``mapInPandas``
(multimodal.decode_image_features) — per-executor memory is bounded by
the Arrow batch size, parallelism is partition parallelism. The
unfilter hot loops for Sub/Up are numpy-vectorized (lane cumsum /
row add); Average/Paeth are per-pixel (they are sequential by
definition) — at 100 TB the decode cost is embarrassingly parallel
and dominated by inflate, which is C-side zlib.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"

#: colour type -> samples per pixel
_SAMPLES = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}

#: legal bit depths per colour type (PNG spec table 11.1)
_LEGAL_DEPTHS = {
    0: (1, 2, 4, 8, 16),
    2: (8, 16),
    3: (1, 2, 4, 8),
    4: (8, 16),
    6: (8, 16),
}

#: Adam7 passes: (x0, y0, dx, dy)
_ADAM7 = (
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
)


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


# ---------------------------------------------------------------- decode


def decode_png(content: bytes) -> np.ndarray:
    """bytes → HxWxC uint8 (C=1 gray, 2 gray+alpha, 3 RGB, 4 RGBA).

    Raises ValueError for malformed payloads (bad signature/CRC/header,
    truncated or corrupt IDAT, short scanlines, bad filter byte)."""
    if content[:8] != _SIG:
        raise ValueError("not a PNG (bad signature)")
    chunks = _parse_chunks(content)
    if not chunks or chunks[0][0] != b"IHDR":
        raise ValueError("PNG missing IHDR")
    if len(chunks[0][1]) != 13:
        raise ValueError("bad IHDR length")
    w, h, depth, ctype, comp, filt, interlace = struct.unpack(
        ">IIBBBBB", chunks[0][1]
    )
    if w == 0 or h == 0:
        raise ValueError(f"bad PNG dimensions {w}x{h}")
    if comp != 0 or filt != 0:
        raise ValueError("unknown PNG compression/filter method")
    if interlace not in (0, 1):
        raise ValueError(f"unknown PNG interlace method {interlace}")
    if ctype not in _SAMPLES:
        raise ValueError(f"unknown PNG colour type {ctype}")
    if depth not in _LEGAL_DEPTHS[ctype]:
        raise ValueError(f"illegal bit depth {depth} for colour type {ctype}")

    palette: bytes | None = None
    trns: bytes | None = None
    idat: list[bytes] = []
    for ctag, data in chunks[1:]:
        if ctag == b"PLTE":
            if len(data) % 3 or not data:
                raise ValueError("bad PLTE length")
            palette = data
        elif ctag == b"tRNS":
            trns = data
        elif ctag == b"IDAT":
            idat.append(data)
        elif ctag == b"IEND":
            break
    if not idat:
        raise ValueError("PNG missing IDAT")
    if ctype == 3 and palette is None:
        raise ValueError("palette image missing PLTE")
    try:
        raw = zlib.decompress(b"".join(idat))
    except zlib.error as exc:
        raise ValueError(f"corrupt PNG IDAT: {exc}") from None

    samples = _SAMPLES[ctype]
    if interlace == 0:
        grid, pos = _read_subimage(raw, 0, w, h, samples, depth)
    else:
        grid = np.zeros((h, w, samples), dtype=np.uint16)
        pos = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw == 0 or ph == 0:
                continue
            sub, pos = _read_subimage(raw, pos, pw, ph, samples, depth)
            grid[y0::dy, x0::dx, :] = sub
    if pos != len(raw):
        raise ValueError("trailing bytes after PNG image data")
    return _to_rgb(grid, depth, ctype, palette, trns)


def _parse_chunks(content: bytes) -> list[tuple[bytes, bytes]]:
    chunks: list[tuple[bytes, bytes]] = []
    pos = 8
    n = len(content)
    while pos < n:
        if pos + 8 > n:
            raise ValueError("truncated PNG chunk header")
        (length,) = struct.unpack_from(">I", content, pos)
        ctag = content[pos + 4 : pos + 8]
        end = pos + 8 + length
        if end + 4 > n:
            raise ValueError(f"truncated PNG chunk {ctag!r}")
        data = content[pos + 8 : end]
        (crc,) = struct.unpack_from(">I", content, end)
        if zlib.crc32(ctag + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"bad CRC on PNG chunk {ctag!r}")
        chunks.append((ctag, data))
        pos = end + 4
        if ctag == b"IEND":
            break
    return chunks


def _read_subimage(
    raw: bytes, pos: int, w: int, h: int, samples: int, depth: int
) -> tuple[np.ndarray, int]:
    """Unfilter one (sub)image of ``h`` scanlines starting at ``pos`` in
    the inflated stream; returns (h, w, samples) uint16 sample values
    and the new offset."""
    bits_pp = samples * depth
    rowbytes = (w * bits_pp + 7) // 8
    bpp = max(1, bits_pp // 8)
    need = h * (1 + rowbytes)
    if pos + need > len(raw):
        raise ValueError("truncated PNG image data")
    prev = np.zeros(rowbytes, dtype=np.int64)
    rows = np.empty((h, rowbytes), dtype=np.uint8)
    for y in range(h):
        ft = raw[pos]
        pos += 1
        line = np.frombuffer(raw, dtype=np.uint8, count=rowbytes, offset=pos).astype(
            np.int64
        )
        pos += rowbytes
        if ft == 0:
            recon = line
        elif ft == 1:  # Sub: per-lane cumulative sum mod 256
            recon = _unfilter_sub(line, bpp)
        elif ft == 2:  # Up: vectorized row add
            recon = (line + prev) & 255
        elif ft == 3:  # Average: sequential in x by definition
            # r14: the sequential filters run on Python ints (tolist)
            # — per-element numpy scalar indexing was ~4x slower under
            # profile; arithmetic is identical (nonneg ints, //2 == >>1)
            rec = line.tolist()
            pv = prev.tolist()
            for x in range(bpp):
                rec[x] = (rec[x] + (pv[x] >> 1)) & 255
            for x in range(bpp, rowbytes):
                rec[x] = (rec[x] + ((rec[x - bpp] + pv[x]) >> 1)) & 255
            recon = np.asarray(rec, dtype=np.int64)
        elif ft == 4:  # Paeth: sequential in x by definition
            rec = line.tolist()
            pv = prev.tolist()
            for x in range(bpp):
                # paeth(0, b, 0) == b for every byte value b
                rec[x] = (rec[x] + pv[x]) & 255
            for x in range(bpp, rowbytes):
                a, b, c = rec[x - bpp], pv[x], pv[x - bpp]
                p = a + b - c
                pa = p - a if p >= a else a - p
                pb = p - b if p >= b else b - p
                pc = p - c if p >= c else c - p
                if pa <= pb and pa <= pc:
                    pred = a
                elif pb <= pc:
                    pred = b
                else:
                    pred = c
                rec[x] = (rec[x] + pred) & 255
            recon = np.asarray(rec, dtype=np.int64)
        else:
            raise ValueError(f"bad PNG filter type {ft}")
        prev = recon
        rows[y] = recon.astype(np.uint8)
    return _rows_to_samples(rows, w, samples, depth), pos


def _unfilter_sub(line: np.ndarray, bpp: int) -> np.ndarray:
    """Sub filter inverse: recon[x] = raw[x] + recon[x-bpp]. Per byte
    lane (stride bpp) this is exactly a cumulative sum mod 256."""
    lanes = line.reshape(-1, bpp)
    return (np.cumsum(lanes, axis=0) & 255).reshape(-1)


def _rows_to_samples(
    rows: np.ndarray, w: int, samples: int, depth: int
) -> np.ndarray:
    """(h, rowbytes) uint8 → (h, w, samples) uint16 sample values at the
    original bit depth."""
    h = rows.shape[0]
    if depth == 8:
        return rows[:, : w * samples].astype(np.uint16).reshape(h, w, samples)
    if depth == 16:
        pairs = rows.reshape(h, -1, 2).astype(np.uint16)
        vals = (pairs[:, :, 0] << 8) | pairs[:, :, 1]
        return vals[:, : w * samples].reshape(h, w, samples)
    # sub-byte depths (1/2/4): samples == 1 always (gray or palette)
    bits = np.unpackbits(rows, axis=1)
    per = bits.reshape(h, -1, depth)
    weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.uint16)
    vals = (per * weights).sum(axis=2).astype(np.uint16)
    return vals[:, :w].reshape(h, w, 1)


def _to_rgb(
    grid: np.ndarray,
    depth: int,
    ctype: int,
    palette: bytes | None,
    trns: bytes | None,
) -> np.ndarray:
    """Sample grid at original depth → HxWxC uint8 per the decode
    contract. tRNS colour keys compare at the ORIGINAL bit depth (the
    grid), before any 16→8 reduction."""
    h, w = grid.shape[:2]
    if ctype == 3:
        pal = np.frombuffer(palette, dtype=np.uint8).reshape(-1, 3)
        idx = grid[:, :, 0]
        if int(idx.max()) >= pal.shape[0]:
            raise ValueError("palette index out of range")
        rgb = pal[idx]
        if trns is not None:
            alpha_tab = np.full(pal.shape[0], 255, dtype=np.uint8)
            alpha_tab[: len(trns)] = np.frombuffer(trns, dtype=np.uint8)
            return np.dstack([rgb, alpha_tab[idx]])
        return rgb
    # scale samples to 8-bit
    if depth == 16:
        scaled = (grid >> 8).astype(np.uint8)
    elif depth == 8:
        scaled = grid.astype(np.uint8)
    else:  # 1/2/4-bit gray: expand to full 8-bit range per spec
        scaled = (grid * (255 // ((1 << depth) - 1))).astype(np.uint8)
    if ctype == 0:
        if trns is not None:
            if len(trns) != 2:
                raise ValueError("bad gray tRNS length")
            (key,) = struct.unpack(">H", trns)
            alpha = np.where(grid[:, :, 0] == key, 0, 255).astype(np.uint8)
            return np.dstack([scaled, alpha])
        return scaled
    if ctype == 2:
        if trns is not None:
            if len(trns) != 6:
                raise ValueError("bad RGB tRNS length")
            key = np.array(struct.unpack(">HHH", trns), dtype=np.uint16)
            match = (grid == key).all(axis=2)
            alpha = np.where(match, 0, 255).astype(np.uint8)
            return np.dstack([scaled, alpha])
        return scaled
    return scaled  # ctype 4 (gray+alpha) and 6 (RGBA) are already final


# ---------------------------------------------------------------- encode


def encode_png(
    img: np.ndarray,
    *,
    bit_depth: int = 8,
    palette: np.ndarray | None = None,
    trns: bytes | None = None,
    filters: int | list[int] = 0,
    interlace: int = 0,
) -> bytes:
    """Fixture-grade PNG encoder covering every decoder path.

    ``img``: HxW (gray / palette indices) or HxWxC array. uint8 for
    depths ≤ 8, uint16 for depth 16. ``palette``: Nx3 uint8 → colour
    type 3 with ``img`` as indices. ``filters``: one filter type for
    all rows, or a sequence cycled per scanline (exercises the
    decoder's unfilter paths). ``interlace=1`` writes Adam7."""
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, c = img.shape
    if palette is not None:
        ctype = 3
        if c != 1:
            raise ValueError("palette image must be HxW indices")
    else:
        ctype = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    if bit_depth not in _LEGAL_DEPTHS[ctype]:
        raise ValueError(f"illegal bit depth {bit_depth} for colour type {ctype}")
    flist = [filters] if isinstance(filters, int) else list(filters)

    def pass_bytes(sub: np.ndarray, row0: int) -> bytes:
        ph, pw = sub.shape[:2]
        out = bytearray()
        bits_pp = c * bit_depth
        rowbytes = (pw * bits_pp + 7) // 8
        bpp = max(1, bits_pp // 8)
        prev = bytes(rowbytes)
        for y in range(ph):
            if bit_depth == 16:
                row = sub[y].astype(">u2").tobytes()
            elif bit_depth == 8:
                row = sub[y].astype(np.uint8).tobytes()
            else:
                vals = sub[y, :, 0].astype(np.uint8)
                bits = np.unpackbits(vals[:, None], axis=1)[:, 8 - bit_depth :]
                flat = bits.reshape(-1)
                pad = (-len(flat)) % 8
                flat = np.concatenate([flat, np.zeros(pad, dtype=np.uint8)])
                row = np.packbits(flat).tobytes()
            ft = flist[(row0 + y) % len(flist)]
            out.append(ft)
            out.extend(_filter_row(row, prev, bpp, ft))
            prev = row
        return bytes(out)

    if interlace == 0:
        raw = pass_bytes(img, 0)
    else:
        parts = []
        row0 = 0
        for x0, y0, dx, dy in _ADAM7:
            sub = img[y0::dy, x0::dx, :]
            if sub.shape[0] == 0 or sub.shape[1] == 0:
                continue
            parts.append(pass_bytes(sub, row0))
            row0 += sub.shape[0]
        raw = b"".join(parts)

    def chunk(ctag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctag
            + data
            + struct.pack(">I", zlib.crc32(ctag + data) & 0xFFFFFFFF)
        )

    out = bytearray(_SIG)
    out += chunk(
        b"IHDR", struct.pack(">IIBBBBB", w, h, bit_depth, ctype, 0, 0, interlace)
    )
    if palette is not None:
        out += chunk(b"PLTE", palette.astype(np.uint8).tobytes())
    if trns is not None:
        out += chunk(b"tRNS", trns)
    out += chunk(b"IDAT", zlib.compress(raw, 6))
    out += chunk(b"IEND", b"")
    return bytes(out)


def _filter_row(row: bytes, prev: bytes, bpp: int, ft: int) -> bytes:
    if ft == 0:
        return row
    out = bytearray(len(row))
    for x in range(len(row)):
        left = row[x - bpp] if x >= bpp else 0
        up = prev[x]
        ul = prev[x - bpp] if x >= bpp else 0
        if ft == 1:
            pred = left
        elif ft == 2:
            pred = up
        elif ft == 3:
            pred = (left + up) // 2
        elif ft == 4:
            pred = _paeth(left, up, ul)
        else:
            raise ValueError(f"bad filter type {ft}")
        out[x] = (row[x] - pred) & 255
    return bytes(out)
