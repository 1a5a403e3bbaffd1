"""Pure-Python lossy WebP (VP8) keyframe decoder — RFC 6386.

WebP still images are always VP8 KEYFRAMES, so the whole inter-frame
half of VP8 (motion vectors, golden/altref buffers, mode probabilities
for P-frames) does not exist here; what remains is a complete
keyframe decoder:

  boolean arithmetic decoder (§7) → frame header (§9: segmentation,
  loop-filter params, quantizer indices, token-probability updates) →
  per-MB intra modes (§11, keyframe trees) → DCT/WHT token decoding
  (§13, default + updated probabilities) → dequantization (§14) →
  inverse WHT/DCT (§14.3) → intra prediction + reconstruction (§12)
  → in-loop deblocking filter (§15, normal and simple).

The constant tables (dequant lookups, default/update token
probabilities, keyframe 4x4-mode probabilities) live in
vp8_tables.py, recovered from the public spec via a system libwebp
binary — see tools/extract_vp8_tables.py for method and cross-checks.

Correctness: tests/test_vp8.py decodes libwebp-ENCODED bitstreams
(every quality tier, segment counts, partition counts, filter
strengths, odd sizes) and compares Y/U/V planes BIT-EXACTLY against
libwebp's own WebPDecodeYUVInto via ctypes when the shared object is
present; the always-on gate path roundtrips fixtures from the
pure-Python fixture encoder in vp8_enc.py.

Scale note: this runs inside mapInPandas over binary image columns
(operators/multimodal.py) — per-row Python work, Arrow-batched, no
shuffle; the codec itself is the bottleneck only in the decode stage,
which is embarrassingly parallel.
"""

from __future__ import annotations

import numpy as np

from rta_registrations_pyspark_glue_spark.operators.vp8_tables import (
    AC_QLOOKUP,
    COEFF_DEFAULT_PROBS,
    COEFF_UPDATE_PROBS,
    DC_QLOOKUP,
    KF_BMODE_PROBS,
)

# ---------------------------------------------------------------- trees

#: 16x16 luma modes (and implied 4x4 context modes for non-B_PRED MBs)
DC_PRED, V_PRED, H_PRED, TM_PRED, B_PRED = 0, 1, 2, 3, 4
#: 4x4 submodes
(B_DC, B_TM, B_VE, B_HE, B_LD, B_RD, B_VR, B_VL, B_HD, B_HU) = range(10)

KF_YMODE_TREE = (-B_PRED, 2, 4, 6, -DC_PRED, -V_PRED, -H_PRED, -TM_PRED)
KF_YMODE_PROBS = (145, 156, 163, 128)
UV_MODE_TREE = (-DC_PRED, 2, -V_PRED, 4, -H_PRED, -TM_PRED)
KF_UV_MODE_PROBS = (142, 114, 183)
BMODE_TREE = (
    -B_DC, 2,
    -B_TM, 4,
    -B_VE, 6,
    8, 12,
    -B_HE, 10,
    -B_RD, -B_VR,
    -B_LD, 14,
    -B_VL, 16,
    -B_HD, -B_HU,
)

#: DCT token tree (§13.2). Leaves: EOB, 0, 1, 2, 3, 4, cat1..cat6.
TOK_EOB, TOK_0, TOK_1, TOK_2, TOK_3, TOK_4 = 0, 1, 2, 3, 4, 5
TOK_CAT1, TOK_CAT2, TOK_CAT3, TOK_CAT4, TOK_CAT5, TOK_CAT6 = 6, 7, 8, 9, 10, 11
COEFF_TREE = (
    -TOK_EOB, 2,
    -TOK_0, 4,
    -TOK_1, 6,
    8, 12,
    -TOK_2, 10,
    -TOK_3, -TOK_4,
    14, 16,
    -TOK_CAT1, -TOK_CAT2,
    18, 20,
    -TOK_CAT3, -TOK_CAT4,
    -TOK_CAT5, -TOK_CAT6,
)
#: category base values and extra-bit probabilities (§13.2)
CAT_BASE = {TOK_CAT1: 5, TOK_CAT2: 7, TOK_CAT3: 11, TOK_CAT4: 19,
            TOK_CAT5: 35, TOK_CAT6: 67}
CAT_PROBS = {
    TOK_CAT1: (159,),
    TOK_CAT2: (165, 145),
    TOK_CAT3: (173, 148, 140),
    TOK_CAT4: (176, 155, 140, 135),
    TOK_CAT5: (180, 157, 141, 134, 130),
    TOK_CAT6: (254, 254, 243, 230, 196, 177, 153, 140, 133, 130, 129),
}

COEFF_BANDS = (0, 1, 2, 3, 6, 4, 5, 6, 6, 6, 6, 6, 6, 6, 6, 7)
ZIGZAG = (0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15)

MB_FEATURE_TREE_PROBS = 3  # segment-id tree has 3 probabilities


class VP8Error(ValueError):
    pass


# ------------------------------------------------------- bool decoder


class BoolDecoder:
    """§7 boolean arithmetic decoder. Reads past the end of ``buf``
    yield zero bytes (the spec's defined behavior for well-formed
    streams that end mid-symbol)."""

    __slots__ = ("buf", "pos", "value", "range", "bits")

    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 2
        self.value = (buf[0] << 8 | buf[1]) if len(buf) >= 2 else (
            (buf[0] << 8) if buf else 0
        )
        self.range = 255
        self.bits = 0

    def get(self, prob: int) -> int:
        split = 1 + (((self.range - 1) * prob) >> 8)
        big = split << 8
        if self.value >= big:
            ret = 1
            self.range -= split
            self.value -= big
        else:
            ret = 0
            self.range = split
        while self.range < 128:
            self.value <<= 1
            self.range <<= 1
            self.bits += 1
            if self.bits == 8:
                self.bits = 0
                if self.pos < len(self.buf):
                    self.value |= self.buf[self.pos]
                self.pos += 1
        return ret

    def bit(self) -> int:
        return self.get(128)

    def literal(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.get(128)
        return v

    def signed_literal(self, n: int) -> int:
        v = self.literal(n)
        return -v if self.bit() else v

    def tree(self, tree, probs, start: int = 0) -> int:
        i = start
        while True:
            i = tree[i + self.get(probs[i >> 1])]
            if i <= 0:
                return -i


# ------------------------------------------------------- inverse DCTs

_C1 = 20091  # cospi8sqrt2 - 1, Q16
_C2 = 35468  # sinpi8sqrt2, Q16


def idct4x4(block):
    """§14.3 inverse 4x4 DCT, integer-exact. ``block`` is a flat
    16-list in raster order; returns a 4x4 int array of residuals."""
    t = [0] * 16
    for i in range(4):
        i0, i4, i8, i12 = block[i], block[i + 4], block[i + 8], block[i + 12]
        a1 = i0 + i8
        b1 = i0 - i8
        c1 = ((i4 * _C2) >> 16) - (i12 + ((i12 * _C1) >> 16))
        d1 = (i4 + ((i4 * _C1) >> 16)) + ((i12 * _C2) >> 16)
        t[i] = a1 + d1
        t[i + 12] = a1 - d1
        t[i + 4] = b1 + c1
        t[i + 8] = b1 - c1
    out = [0] * 16
    for i in range(4):
        r = 4 * i
        i0, i1, i2, i3 = t[r], t[r + 1], t[r + 2], t[r + 3]
        a1 = i0 + i2
        b1 = i0 - i2
        c1 = ((i1 * _C2) >> 16) - (i3 + ((i3 * _C1) >> 16))
        d1 = (i1 + ((i1 * _C1) >> 16)) + ((i3 * _C2) >> 16)
        out[r] = (a1 + d1 + 4) >> 3
        out[r + 3] = (a1 - d1 + 4) >> 3
        out[r + 1] = (b1 + c1 + 4) >> 3
        out[r + 2] = (b1 - c1 + 4) >> 3
    return out


def iwht4x4(block):
    """§14.3 inverse Walsh-Hadamard for the Y2 (DC) block."""
    t = [0] * 16
    for i in range(4):
        a1 = block[i] + block[i + 12]
        b1 = block[i + 4] + block[i + 8]
        c1 = block[i + 4] - block[i + 8]
        d1 = block[i] - block[i + 12]
        t[i] = a1 + b1
        t[i + 4] = c1 + d1
        t[i + 8] = a1 - b1
        t[i + 12] = d1 - c1
    out = [0] * 16
    for i in range(4):
        r = 4 * i
        a1 = t[r] + t[r + 3]
        b1 = t[r + 1] + t[r + 2]
        c1 = t[r + 1] - t[r + 2]
        d1 = t[r] - t[r + 3]
        out[r] = (a1 + b1 + 3) >> 3
        out[r + 1] = (c1 + d1 + 3) >> 3
        out[r + 2] = (a1 - b1 + 3) >> 3
        out[r + 3] = (d1 - c1 + 3) >> 3
    return out


# -------------------------------------------------------- dequant


def _clip(v, hi):
    return 0 if v < 0 else (hi if v > hi else v)


def _quant_factors(q, ydc_d, y2dc_d, y2ac_d, uvdc_d, uvac_d):
    """§14.1 per-plane (dc, ac) dequant factors from the segment's
    base index + header deltas. Matches libwebp's integer forms
    (y2ac = ac * 101581 >> 16 clamped up to 8; the uv-dc INDEX is
    clamped at 117, whose table value is the spec's 132 cap)."""
    y1 = (DC_QLOOKUP[_clip(q + ydc_d, 127)], AC_QLOOKUP[_clip(q, 127)])
    y2dc = DC_QLOOKUP[_clip(q + y2dc_d, 127)] * 2
    y2ac = (AC_QLOOKUP[_clip(q + y2ac_d, 127)] * 101581) >> 16
    if y2ac < 8:
        y2ac = 8
    uv = (DC_QLOOKUP[_clip(q + uvdc_d, 117)], AC_QLOOKUP[_clip(q + uvac_d, 127)])
    return y1, (y2dc, y2ac), uv


# --------------------------------------------------------- header


class _FrameHeader:
    __slots__ = (
        "width", "height", "mb_w", "mb_h",
        "seg_enabled", "seg_update_map", "seg_abs", "seg_quant", "seg_lf",
        "seg_tree_probs",
        "filter_type_simple", "filter_level", "sharpness",
        "lf_delta_enabled", "ref_lf_deltas", "mode_lf_deltas",
        "n_parts", "quant", "use_skip", "prob_skip",
        "coeff_probs",
    )


def _parse_header(bd: BoolDecoder, width: int, height: int) -> _FrameHeader:
    h = _FrameHeader()
    h.width, h.height = width, height
    h.mb_w, h.mb_h = (width + 15) >> 4, (height + 15) >> 4

    bd.bit()  # color space (must be 0 for the defined profile)
    bd.bit()  # clamping type

    h.seg_quant = [0, 0, 0, 0]
    h.seg_lf = [0, 0, 0, 0]
    h.seg_tree_probs = [255, 255, 255]
    h.seg_abs = False
    h.seg_update_map = False
    h.seg_enabled = bool(bd.bit())
    if h.seg_enabled:
        h.seg_update_map = bool(bd.bit())
        update_data = bd.bit()
        if update_data:
            h.seg_abs = bool(bd.bit())
            for i in range(4):
                if bd.bit():
                    h.seg_quant[i] = bd.signed_literal(7)
            for i in range(4):
                if bd.bit():
                    h.seg_lf[i] = bd.signed_literal(6)
        if h.seg_update_map:
            for i in range(MB_FEATURE_TREE_PROBS):
                h.seg_tree_probs[i] = bd.literal(8) if bd.bit() else 255

    h.filter_type_simple = bool(bd.bit())
    h.filter_level = bd.literal(6)
    h.sharpness = bd.literal(3)
    h.ref_lf_deltas = [0, 0, 0, 0]
    h.mode_lf_deltas = [0, 0, 0, 0]
    h.lf_delta_enabled = bool(bd.bit())
    if h.lf_delta_enabled:
        if bd.bit():  # deltas updated this frame
            for i in range(4):
                if bd.bit():
                    h.ref_lf_deltas[i] = bd.signed_literal(6)
            for i in range(4):
                if bd.bit():
                    h.mode_lf_deltas[i] = bd.signed_literal(6)

    h.n_parts = 1 << bd.literal(2)

    y_ac_qi = bd.literal(7)
    ydc_d = bd.signed_literal(4) if bd.bit() else 0
    y2dc_d = bd.signed_literal(4) if bd.bit() else 0
    y2ac_d = bd.signed_literal(4) if bd.bit() else 0
    uvdc_d = bd.signed_literal(4) if bd.bit() else 0
    uvac_d = bd.signed_literal(4) if bd.bit() else 0
    # per-segment base index (abs or delta), resolved here once
    h.quant = []
    for s in range(4):
        if h.seg_enabled:
            q = h.seg_quant[s] if h.seg_abs else y_ac_qi + h.seg_quant[s]
        else:
            q = y_ac_qi
        h.quant.append(
            _quant_factors(_clip(q, 127), ydc_d, y2dc_d, y2ac_d, uvdc_d, uvac_d)
        )

    bd.bit()  # refresh_entropy_probs (meaningless on a keyframe)

    probs = list(COEFF_DEFAULT_PROBS)
    for i in range(4):
        for j in range(8):
            for k in range(3):
                base = ((i * 8 + j) * 3 + k) * 11
                for t in range(11):
                    if bd.get(COEFF_UPDATE_PROBS[base + t]):
                        probs[base + t] = bd.literal(8)
    h.coeff_probs = probs

    h.use_skip = bool(bd.bit())
    h.prob_skip = bd.literal(8) if h.use_skip else 0
    return h


# -------------------------------------------------- token decoding


def _decode_coeffs(bd: BoolDecoder, probs, block_type: int, first: int,
                   ctx: int, dc_q: int, ac_q: int):
    """Decode one 4x4 block's coefficient tokens (§13.3). Returns
    (coeffs-in-raster-order or None if all zero, nonzero_flag)."""
    coeffs = None
    i = first
    base_t = block_type * 264  # 8*3*11
    # entering the loop, ctx is the left+above nonzero sum; afterwards
    # it tracks the previous token (0, 1, or 2+)
    start = 0  # tree start: 0 reads the EOB branch; 2 skips it
    while i < 16:
        band = COEFF_BANDS[i]
        p = base_t + (band * 3 + ctx) * 11
        tok = bd.tree(COEFF_TREE, probs[p:p + 11], start)
        if tok == TOK_EOB:
            break
        if tok == TOK_0:
            ctx = 0
            start = 2  # a zero token cannot be followed by EOB
            i += 1
            continue
        start = 0
        if tok == TOK_1:
            val = 1
            ctx = 1
        else:
            ctx = 2
            if tok <= TOK_4:
                val = tok - 1  # TOK_2..TOK_4 -> 2..4
            else:
                extra = 0
                for pb in CAT_PROBS[tok]:
                    extra = (extra << 1) | bd.get(pb)
                val = CAT_BASE[tok] + extra
        if bd.bit():
            val = -val
        if coeffs is None:
            coeffs = [0] * 16
        coeffs[ZIGZAG[i]] = val * (dc_q if i == 0 else ac_q)
        i += 1
    return coeffs, (0 if coeffs is None else 1)


# -------------------------------------------------- intra prediction


def _predict_16_or_chroma(plane, mb_y, mb_x, size, mode):
    """Whole-block intra prediction (§12.2) for the 16x16 luma or 8x8
    chroma block at (mb_y*size, mb_x*size). Returns an int32 array."""
    y0, x0 = mb_y * size, mb_x * size
    have_above = mb_y > 0
    have_left = mb_x > 0
    above = plane[y0 - 1, x0:x0 + size].astype(np.int32) if have_above else None
    left = plane[y0:y0 + size, x0 - 1].astype(np.int32) if have_left else None
    if mode == DC_PRED:
        if not have_above and not have_left:
            v = 128
        elif not have_above:
            v = (int(left.sum()) + (size >> 1)) >> (size.bit_length() - 1)
        elif not have_left:
            v = (int(above.sum()) + (size >> 1)) >> (size.bit_length() - 1)
        else:
            v = (int(above.sum()) + int(left.sum()) + size) >> size.bit_length()
        return np.full((size, size), v, np.int32)
    if mode == V_PRED:
        row = above if have_above else np.full(size, 127, np.int32)
        return np.tile(row, (size, 1))
    if mode == H_PRED:
        col = left if have_left else np.full(size, 129, np.int32)
        return np.tile(col.reshape(-1, 1), (1, size))
    # TM_PRED. Border conventions (§12.2): top-row MBs see above and
    # above-left as 127; left-column MBs (below the top row) see left
    # and above-left as 129.
    row = above if have_above else np.full(size, 127, np.int32)
    col = left if have_left else np.full(size, 129, np.int32)
    if not have_above:
        tl = 127
    elif not have_left:
        tl = 129
    else:
        tl = int(plane[y0 - 1, x0 - 1])
    p = col.reshape(-1, 1) + row.reshape(1, -1) - tl
    return np.clip(p, 0, 255)


def _bpred_block(a, l, tl, ar, mode):
    """4x4 intra prediction (§12.3). a: above[4], ar: above-right[4],
    l: left[4], tl: top-left scalar — all ints. Returns 4x4 list."""
    out = [[0] * 4 for _ in range(4)]
    if mode == B_DC:
        v = (sum(a) + sum(l) + 4) >> 3
        for r in range(4):
            for c in range(4):
                out[r][c] = v
        return out
    if mode == B_TM:
        for r in range(4):
            for c in range(4):
                p = l[r] + a[c] - tl
                out[r][c] = 0 if p < 0 else (255 if p > 255 else p)
        return out
    if mode == B_VE:
        top = [tl] + list(a) + [ar[0]]
        row = [(top[i] + 2 * top[i + 1] + top[i + 2] + 2) >> 2 for i in range(4)]
        for r in range(4):
            out[r] = row[:]
        return out
    if mode == B_HE:
        e = [tl] + list(l) + [l[3]]
        col = [(e[i] + 2 * e[i + 1] + e[i + 2] + 2) >> 2 for i in range(4)]
        for r in range(4):
            for c in range(4):
                out[r][c] = col[r]
        return out
    # Extended above row for the diagonal modes
    t = list(a) + list(ar)  # t[0..7]
    if mode == B_LD:
        for r in range(4):
            for c in range(4):
                i = r + c
                if i < 6:
                    out[r][c] = (t[i] + 2 * t[i + 1] + t[i + 2] + 2) >> 2
                else:
                    out[r][c] = (t[6] + 3 * t[7] + 2) >> 2
        return out
    # Modes using the full left+corner+above edge
    e = [l[3], l[2], l[1], l[0], tl, a[0], a[1], a[2], a[3]]  # e[0..8]
    if mode == B_RD:
        for r in range(4):
            for c in range(4):
                i = c - r + 4  # 1..7
                out[r][c] = (e[i - 1] + 2 * e[i] + e[i + 1] + 2) >> 2
        return out
    if mode == B_VR:
        for r in range(4):
            for c in range(4):
                i = 2 * c - r  # -3..6
                if i >= 0:
                    if i & 1:
                        out[r][c] = (e[4 + (i - 1) // 2] + 2 * e[5 + (i - 1) // 2]
                                     + e[6 + (i - 1) // 2] + 2) >> 2
                    else:
                        out[r][c] = (e[4 + i // 2] + e[5 + i // 2] + 1) >> 1
                else:
                    out[r][c] = (e[4 + i] + 2 * e[5 + i] + e[6 + i] + 2) >> 2
        return out
    if mode == B_VL:
        for r in range(4):
            for c in range(4):
                i = 2 * c + r
                if i >= 8:  # cells (2,3) and (3,3): the spec's corner
                    # cases reach one pixel further right than the
                    # regular diagonals
                    out[r][c] = (t[(i + 1) // 2] + 2 * t[(i + 1) // 2 + 1]
                                 + t[(i + 1) // 2 + 2] + 2) >> 2
                elif i & 1:
                    out[r][c] = (t[i // 2] + 2 * t[i // 2 + 1]
                                 + t[i // 2 + 2] + 2) >> 2
                else:
                    out[r][c] = (t[i // 2] + t[i // 2 + 1] + 1) >> 1
        return out
    if mode == B_HD:
        for r in range(4):
            for c in range(4):
                i = 2 * r - c  # -3..6
                if i >= 0:
                    if i & 1:
                        out[r][c] = (e[3 - (i + 1) // 2] + 2 * e[4 - (i + 1) // 2]
                                     + e[5 - (i + 1) // 2] + 2) >> 2
                    else:
                        out[r][c] = (e[3 - i // 2] + e[4 - i // 2] + 1) >> 1
                else:
                    out[r][c] = (e[2 - i] + 2 * e[3 - i] + e[4 - i] + 2) >> 2
        return out
    if mode == B_HU:
        for r in range(4):
            for c in range(4):
                i = r * 2 + c
                if i < 5:
                    if i & 1:
                        out[r][c] = (l[i // 2] + 2 * l[i // 2 + 1]
                                     + l[i // 2 + 2] + 2) >> 2
                    else:
                        out[r][c] = (l[i // 2] + l[i // 2 + 1] + 1) >> 1
                elif i == 5:
                    out[r][c] = (l[2] + 3 * l[3] + 2) >> 2
                else:
                    out[r][c] = l[3]
        return out
    raise VP8Error(f"bad bmode {mode}")


# ---------------------------------------------------- loop filter


def _filter_common(p1, p0, q0, q1, use_outer_taps):
    """§15.2 common adjustment. Arrays int32; returns deltas applied
    in place to p0/q0 (and p1/q1 handled by callers)."""
    a = 3 * (q0 - p0)
    if use_outer_taps is not None:
        a = a + np.clip(p1 - q1, -128, 127) * use_outer_taps
    a = np.clip(a, -128, 127)
    f1 = np.clip(a + 4, -128, 127) >> 3
    f2 = np.clip(a + 3, -128, 127) >> 3
    return f1, f2


def _c(v):
    return np.clip(v, -128, 127)


def _u(v):
    return np.clip(v, 0, 255)


def _simple_filter(pix, idx, stride, limit):
    """§15.1 simple filter on signed-shifted values, vectorized over
    the edge: pix is the int32 plane, idx the flat indices of q0."""
    p1 = pix[idx - 2 * stride] - 128
    p0 = pix[idx - stride] - 128
    q0 = pix[idx] - 128
    q1 = pix[idx + stride] - 128
    mask = (np.abs(p0 - q0) * 2 + (np.abs(p1 - q1) >> 1)) <= limit
    a = _c(_c(p1 - q1) + 3 * (q0 - p0))
    f1 = _c(a + 4) >> 3
    f2 = _c(a + 3) >> 3
    pix[idx - stride] = np.where(mask, _u(p0 + f2 + 128), pix[idx - stride])
    pix[idx] = np.where(mask, _u(q0 - f1 + 128), pix[idx])


def _normal_filter(pix, idx, stride, e_limit, i_limit, hev_t, mb_edge):
    """§15.3 normal filter across one edge, vectorized. idx indexes
    q0; pixels at offsets -4..+3 strides participate."""
    p3 = pix[idx - 4 * stride] - 128
    p2 = pix[idx - 3 * stride] - 128
    p1 = pix[idx - 2 * stride] - 128
    p0 = pix[idx - stride] - 128
    q0 = pix[idx] - 128
    q1 = pix[idx + stride] - 128
    q2 = pix[idx + 2 * stride] - 128
    q3 = pix[idx + 3 * stride] - 128

    mask = (
        (np.abs(p0 - q0) * 2 + (np.abs(p1 - q1) >> 1) <= e_limit)
        & (np.abs(p3 - p2) <= i_limit) & (np.abs(p2 - p1) <= i_limit)
        & (np.abs(p1 - p0) <= i_limit) & (np.abs(q1 - q0) <= i_limit)
        & (np.abs(q2 - q1) <= i_limit) & (np.abs(q3 - q2) <= i_limit)
    )
    hev = (np.abs(p1 - p0) > hev_t) | (np.abs(q1 - q0) > hev_t)

    # high-variance (or subblock-edge) path: like the simple filter,
    # outer taps only under hev
    a_hev = _c(_c(p1 - q1) + 3 * (q0 - p0))
    f1 = _c(a_hev + 4) >> 3
    f2 = _c(a_hev + 3) >> 3
    np0_h = _u(p0 + f2 + 128) - 128
    nq0_h = _u(q0 - f1 + 128) - 128

    if not mb_edge:
        a_n = _c(3 * (q0 - p0))
        f1n = _c(a_n + 4) >> 3
        f2n = _c(a_n + 3) >> 3
        a3 = (f1n + 1) >> 1
        np0 = np.where(hev, np0_h, _u(p0 + f2n + 128) - 128)
        nq0 = np.where(hev, nq0_h, _u(q0 - f1n + 128) - 128)
        np1 = np.where(hev, p1, _u(p1 + a3 + 128) - 128)
        nq1 = np.where(hev, q1, _u(q1 - a3 + 128) - 128)
        np2, nq2 = p2, q2
    else:
        w = _c(_c(p1 - q1) + 3 * (q0 - p0))
        a = (27 * w + 63) >> 7
        np0 = _u(p0 + a + 128) - 128
        nq0 = _u(q0 - a + 128) - 128
        a = (18 * w + 63) >> 7
        np1 = _u(p1 + a + 128) - 128
        nq1 = _u(q1 - a + 128) - 128
        a = (9 * w + 63) >> 7
        np2 = _u(p2 + a + 128) - 128
        nq2 = _u(q2 - a + 128) - 128
        np0 = np.where(hev, np0_h, np0)
        nq0 = np.where(hev, nq0_h, nq0)
        np1 = np.where(hev, p1, np1)
        nq1 = np.where(hev, q1, nq1)
        np2 = np.where(hev, p2, np2)
        nq2 = np.where(hev, q2, nq2)

    m = mask
    pix[idx - 3 * stride] = np.where(m, np2 + 128, pix[idx - 3 * stride])
    pix[idx - 2 * stride] = np.where(m, np1 + 128, pix[idx - 2 * stride])
    pix[idx - stride] = np.where(m, np0 + 128, pix[idx - stride])
    pix[idx] = np.where(m, nq0 + 128, pix[idx])
    pix[idx + stride] = np.where(m, nq1 + 128, pix[idx + stride])
    pix[idx + 2 * stride] = np.where(m, nq2 + 128, pix[idx + 2 * stride])


# ------------------------------------------------------ the decoder


def decode_vp8(data: bytes):
    """Decode one VP8 keyframe (the payload of a 'VP8 ' chunk).
    Returns (y, u, v) uint8 numpy planes cropped to the frame size
    (chroma at half resolution, ceil division)."""
    if len(data) < 10:
        raise VP8Error("truncated VP8 frame")
    tag = data[0] | data[1] << 8 | data[2] << 16
    if tag & 1:
        raise VP8Error("not a keyframe (WebP stills must be)")
    part0_size = tag >> 5
    if data[3:6] != b"\x9d\x01\x2a":
        raise VP8Error("bad VP8 start code")
    w_raw = data[6] | data[7] << 8
    h_raw = data[8] | data[9] << 8
    width, height = w_raw & 0x3FFF, h_raw & 0x3FFF
    if width == 0 or height == 0:
        raise VP8Error("zero dimension")
    if 10 + part0_size > len(data):
        raise VP8Error("first partition overruns frame")

    bd = BoolDecoder(data[10:10 + part0_size])
    h = _parse_header(bd, width, height)

    # token partitions
    rest = data[10 + part0_size:]
    sizes = []
    off = (h.n_parts - 1) * 3
    if len(rest) < off:
        raise VP8Error("missing partition size table")
    for i in range(h.n_parts - 1):
        sizes.append(rest[3 * i] | rest[3 * i + 1] << 8 | rest[3 * i + 2] << 16)
    parts = []
    for i in range(h.n_parts):
        if i < h.n_parts - 1:
            end = off + sizes[i]
            if end > len(rest):
                raise VP8Error("token partition overruns frame")
            parts.append(BoolDecoder(rest[off:end]))
            off = end
        else:
            parts.append(BoolDecoder(rest[off:]))

    mb_w, mb_h = h.mb_w, h.mb_h
    W, H = mb_w * 16, mb_h * 16
    y_plane = np.zeros((H, W), np.int32)
    u_plane = np.zeros((H >> 1, W >> 1), np.int32)
    v_plane = np.zeros((H >> 1, W >> 1), np.int32)

    # entropy contexts
    above_nz = np.zeros((mb_w, 9), np.int8)  # 4 Y, 2 U, 2 V, 1 Y2
    above_sub = np.zeros((mb_w, 4), np.int8)  # bottom submodes per MB col
    # per-MB filter metadata for the loop-filter pass
    mb_seg = np.zeros((mb_h, mb_w), np.int8)
    mb_bpred = np.zeros((mb_h, mb_w), bool)
    mb_has_coeffs = np.zeros((mb_h, mb_w), bool)

    probs = h.coeff_probs
    coeffs_store = {}  # (mby,mbx) -> (y2, y_blocks, u_blocks, v_blocks)
    modes_store = {}

    for mby in range(mb_h):
        left_nz = np.zeros(9, np.int8)
        left_sub = [B_DC, B_DC, B_DC, B_DC]
        tbd = parts[mby % h.n_parts]
        for mbx in range(mb_w):
            # ---- mode parsing (first partition)
            seg = 0
            if h.seg_enabled and h.seg_update_map:
                p = h.seg_tree_probs
                if bd.get(p[0]):
                    seg = 2 + bd.get(p[2])
                else:
                    seg = bd.get(p[1])
            elif h.seg_enabled:
                seg = 0
            mb_seg[mby, mbx] = seg
            skip = bool(bd.get(h.prob_skip)) if h.use_skip else False

            ymode = bd.tree(KF_YMODE_TREE, KF_YMODE_PROBS)
            if ymode == B_PRED:
                sub = [0] * 16
                for sb in range(16):
                    r, c = sb >> 2, sb & 3
                    am = sub[sb - 4] if r > 0 else int(above_sub[mbx, c])
                    lm = sub[sb - 1] if c > 0 else left_sub[r]
                    bp = KF_BMODE_PROBS[(am * 10 + lm) * 9:(am * 10 + lm) * 9 + 9]
                    sub[sb] = bd.tree(BMODE_TREE, bp)
                above_sub[mbx] = sub[12:16]
                left_sub = [sub[3], sub[7], sub[11], sub[15]]
            else:
                implied = {DC_PRED: B_DC, V_PRED: B_VE,
                           H_PRED: B_HE, TM_PRED: B_TM}[ymode]
                sub = [implied] * 16
                above_sub[mbx] = [implied] * 4
                left_sub = [implied] * 4
            uvmode = bd.tree(UV_MODE_TREE, KF_UV_MODE_PROBS)
            mb_bpred[mby, mbx] = ymode == B_PRED
            modes_store[(mby, mbx)] = (ymode, sub, uvmode)

            has_y2 = ymode != B_PRED
            (y1dc, y1ac), (y2dc, y2ac), (uvdc, uvac) = h.quant[seg]

            # ---- token decoding (this row's token partition)
            if skip:
                left_nz[0:8] = 0
                above_nz[mbx, 0:8] = 0
                if has_y2:
                    left_nz[8] = 0
                    above_nz[mbx, 8] = 0
                coeffs_store[(mby, mbx)] = None
                mb_has_coeffs[mby, mbx] = False
                continue

            any_nz = 0
            y2_block = None
            if has_y2:
                ctx = int(left_nz[8]) + int(above_nz[mbx, 8])
                y2_block, nz = _decode_coeffs(
                    tbd, probs, 1, 0, ctx, y2dc, y2ac
                )
                left_nz[8] = above_nz[mbx, 8] = nz
                any_nz |= nz

            y_blocks = [None] * 16
            btype = 0 if has_y2 else 3
            first = 1 if has_y2 else 0
            for sb in range(16):
                r, c = sb >> 2, sb & 3
                ctx = int(left_nz[r]) + int(above_nz[mbx, c])
                blk, nz = _decode_coeffs(
                    tbd, probs, btype, first, ctx, y1dc, y1ac
                )
                y_blocks[sb] = blk
                left_nz[r] = nz
                above_nz[mbx, c] = nz
                any_nz |= nz

            u_blocks = [None] * 4
            v_blocks = [None] * 4
            for pi, blocks in ((0, u_blocks), (1, v_blocks)):
                for sb in range(4):
                    r, c = sb >> 1, sb & 1
                    li, ai = 4 + 2 * pi + r, 4 + 2 * pi + c
                    ctx = int(left_nz[li]) + int(above_nz[mbx, ai])
                    blk, nz = _decode_coeffs(
                        tbd, probs, 2, 0, ctx, uvdc, uvac
                    )
                    blocks[sb] = blk
                    left_nz[li] = nz
                    above_nz[mbx, ai] = nz
                    any_nz |= nz

            coeffs_store[(mby, mbx)] = (y2_block, y_blocks, u_blocks, v_blocks)
            mb_has_coeffs[mby, mbx] = bool(any_nz)

    # ---- reconstruction (raster order; B_PRED needs it sequential)
    for mby in range(mb_h):
        for mbx in range(mb_w):
            ymode, sub, uvmode = modes_store[(mby, mbx)]
            stored = coeffs_store[(mby, mbx)]
            y2_block, y_blocks, u_blocks, v_blocks = (
                stored if stored is not None else (None, [None] * 16,
                                                   [None] * 4, [None] * 4)
            )
            y0, x0 = mby * 16, mbx * 16

            if y2_block is not None:
                dcs = iwht4x4(y2_block)
            else:
                dcs = None

            if ymode != B_PRED:
                pred = _predict_16_or_chroma(y_plane, mby, mbx, 16, ymode)
                for sb in range(16):
                    blk = y_blocks[sb]
                    if dcs is not None:
                        if blk is None:
                            if dcs[sb] == 0:
                                continue
                            blk = [0] * 16
                        blk = blk[:]
                        blk[0] = dcs[sb]
                    if blk is None:
                        continue
                    res = idct4x4(blk)
                    r, c = (sb >> 2) * 4, (sb & 3) * 4
                    pred[r:r + 4, c:c + 4] += np.array(res, np.int32).reshape(4, 4)
                y_plane[y0:y0 + 16, x0:x0 + 16] = np.clip(pred, 0, 255)
            else:
                for sb in range(16):
                    r, c = (sb >> 2) * 4, (sb & 3) * 4
                    ay, ax = y0 + r - 1, x0 + c
                    # above / above-right / left / top-left with the
                    # spec's border conventions
                    if y0 + r == 0:
                        a = [127, 127, 127, 127]
                        ar = [127, 127, 127, 127]
                        tl = 127  # top row: above-left is 127 everywhere
                    else:
                        a = [int(v) for v in y_plane[ay, ax:ax + 4]]
                        if c < 12:
                            # above-right: within this MB row, from the
                            # already-reconstructed plane
                            ar = [int(v) for v in y_plane[ay, ax + 4:ax + 8]]
                        else:
                            # rightmost subblock column: above-right
                            # comes from the MB-above's neighbor row
                            # (stale for r>0 — the spec quirk). Top MB
                            # row -> 127s; rightmost MB -> replicate
                            # the above row's last pixel (libwebp's
                            # 0x01010101*top[15] fill)
                            if y0 == 0:
                                ar = [127, 127, 127, 127]
                            elif x0 + 16 < W:
                                ar = [int(v) for v in
                                      y_plane[y0 - 1, x0 + 16:x0 + 20]]
                            else:
                                ar = [int(y_plane[y0 - 1, W - 1])] * 4
                        if x0 + c == 0:
                            tl = 129 if y0 + r > 0 else 127
                        else:
                            tl = int(y_plane[ay, ax - 1])
                    if x0 + c == 0:
                        l = [129, 129, 129, 129]
                    else:
                        l = [int(v) for v in y_plane[y0 + r:y0 + r + 4, x0 + c - 1]]
                    pred = _bpred_block(a, l, tl, ar, sub[sb])
                    blk = y_blocks[sb]
                    if blk is not None:
                        res = idct4x4(blk)
                        for rr in range(4):
                            for cc in range(4):
                                v = pred[rr][cc] + res[rr * 4 + cc]
                                pred[rr][cc] = 0 if v < 0 else (
                                    255 if v > 255 else v)
                    y_plane[y0 + r:y0 + r + 4, x0 + c:x0 + c + 4] = pred

            # chroma
            cy0, cx0 = mby * 8, mbx * 8
            for plane, blocks in ((u_plane, u_blocks), (v_plane, v_blocks)):
                pred = _predict_16_or_chroma(plane, mby, mbx, 8, uvmode)
                for sb in range(4):
                    blk = blocks[sb]
                    if blk is None:
                        continue
                    res = idct4x4(blk)
                    r, c = (sb >> 1) * 4, (sb & 1) * 4
                    pred[r:r + 4, c:c + 4] += np.array(res, np.int32).reshape(4, 4)
                plane[cy0:cy0 + 8, cx0:cx0 + 8] = np.clip(pred, 0, 255)

    # ---- loop filter
    if h.filter_level > 0:
        _loop_filter(h, y_plane, u_plane, v_plane, mb_seg, mb_bpred,
                     mb_has_coeffs)

    cw, ch_ = (width + 1) >> 1, (height + 1) >> 1
    return (
        y_plane[:height, :width].astype(np.uint8),
        u_plane[:ch_, :cw].astype(np.uint8),
        v_plane[:ch_, :cw].astype(np.uint8),
    )


def yuv_to_rgb(y: np.ndarray, u: np.ndarray, v: np.ndarray) -> np.ndarray:
    """libwebp-exact YUV420 -> RGB: the 9-3-3-1 "fancy" chroma
    upsampler followed by the fixed-point BT.601 conversion
    (coefficients 19077/26149/6419/13320/33050, >>6 clip) — output is
    bit-identical to WebPDecodeRGB on the same planes (pinned by
    tests against the ctypes oracle when libwebp is present)."""
    H, W = y.shape
    # upsample chroma with edge replication: chroma sample (i,j) sits
    # at luma (2i+0.5, 2j+0.5); output (r,c) blends the 4 nearest
    # samples with weights 9/3/3/1
    def up(c):
        ch, cw = c.shape
        p = np.pad(c.astype(np.int32), 1, mode="edge")
        a = p[1:1 + ch, 1:1 + cw]  # nearest sample, every parity
        out = np.empty((ch * 2, cw * 2), np.int32)
        for dy in (0, 1):
            ys = 2 * dy  # vertical neighbor row offset into the pad
            for dx in (0, 1):
                xs = 2 * dx
                bv = p[ys:ys + ch, 1:1 + cw]
                bh = p[1:1 + ch, xs:xs + cw]
                d = p[ys:ys + ch, xs:xs + cw]
                out[dy::2, dx::2] = (9 * a + 3 * (bv + bh) + d + 8) >> 4
        return out[:H, :W]

    uu = up(u)
    vv = up(v)
    yy = y.astype(np.int32)
    ymul = yy * 19077 >> 8
    r = (ymul + (vv * 26149 >> 8) - 14234) >> 6
    g = (ymul - (uu * 6419 >> 8) - (vv * 13320 >> 8) + 8708) >> 6
    b = (ymul + (uu * 33050 >> 8) - 17685) >> 6
    return np.clip(np.stack([r, g, b], axis=-1), 0, 255).astype(np.uint8)


def _loop_filter(h, y_plane, u_plane, v_plane, mb_seg, mb_bpred,
                 mb_has_coeffs):
    """§15: per-MB deblocking in raster order — vertical (left) MB
    edge, internal vertical edges, horizontal (top) MB edge, internal
    horizontal edges; Y always, chroma only for the normal filter."""
    mb_h, mb_w = mb_seg.shape
    H, W = y_plane.shape
    for mby in range(mb_h):
        for mbx in range(mb_w):
            level = h.filter_level
            if h.seg_enabled:
                seg = int(mb_seg[mby, mbx])
                level = h.seg_lf[seg] if h.seg_abs else level + h.seg_lf[seg]
            if h.lf_delta_enabled:
                level += h.ref_lf_deltas[0]  # keyframes are INTRA_FRAME
                if mb_bpred[mby, mbx]:
                    level += h.mode_lf_deltas[0]
            level = _clip(level, 63)
            if level == 0:
                continue

            interior = level
            if h.sharpness:
                interior >>= 2 if h.sharpness > 4 else 1
                if interior > 9 - h.sharpness:
                    interior = 9 - h.sharpness
            if interior < 1:
                interior = 1
            hev_t = 2 if level >= 40 else (1 if level >= 15 else 0)
            mb_lim = ((level + 2) * 2) + interior
            sub_lim = (level * 2) + interior

            inner = bool(mb_has_coeffs[mby, mbx]) or bool(mb_bpred[mby, mbx])
            y0, x0 = mby * 16, mbx * 16

            if h.filter_type_simple:
                # same edge limits as the normal filter; luma only
                rows = np.arange(y0, y0 + 16)
                if mbx > 0:
                    idx = rows * W + x0
                    _simple_filter(y_plane.reshape(-1), idx, 1, mb_lim)
                if inner:
                    for dx in (4, 8, 12):
                        idx = rows * W + (x0 + dx)
                        _simple_filter(y_plane.reshape(-1), idx, 1, sub_lim)
                cols = np.arange(x0, x0 + 16)
                if mby > 0:
                    idx = y0 * W + cols
                    _simple_filter(y_plane.reshape(-1), idx, W, mb_lim)
                if inner:
                    for dy in (4, 8, 12):
                        idx = (y0 + dy) * W + cols
                        _simple_filter(y_plane.reshape(-1), idx, W, sub_lim)
                continue

            yflat = y_plane.reshape(-1)
            rows = np.arange(y0, y0 + 16)
            cols = np.arange(x0, x0 + 16)
            if mbx > 0:
                _normal_filter(yflat, rows * W + x0, 1, mb_lim, interior,
                               hev_t, True)
            if inner:
                for dx in (4, 8, 12):
                    _normal_filter(yflat, rows * W + (x0 + dx), 1, sub_lim,
                                   interior, hev_t, False)
            if mby > 0:
                _normal_filter(yflat, y0 * W + cols, W, mb_lim, interior,
                               hev_t, True)
            if inner:
                for dy in (4, 8, 12):
                    _normal_filter(yflat, (y0 + dy) * W + cols, W, sub_lim,
                                   interior, hev_t, False)

            cw = W >> 1
            cy0, cx0 = mby * 8, mbx * 8
            crows = np.arange(cy0, cy0 + 8)
            ccols = np.arange(cx0, cx0 + 8)
            for plane in (u_plane, v_plane):
                pf = plane.reshape(-1)
                if mbx > 0:
                    _normal_filter(pf, crows * cw + cx0, 1, mb_lim, interior,
                                   hev_t, True)
                if inner:
                    _normal_filter(pf, crows * cw + (cx0 + 4), 1, sub_lim,
                                   interior, hev_t, False)
                if mby > 0:
                    _normal_filter(pf, cy0 * cw + ccols, cw, mb_lim, interior,
                                   hev_t, True)
                if inner:
                    _normal_filter(pf, (cy0 + 4) * cw + ccols, cw, sub_lim,
                                   interior, hev_t, False)
