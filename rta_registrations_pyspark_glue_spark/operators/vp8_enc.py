"""Minimal pure-Python VP8 keyframe ENCODER — the fixture side of the
lossy-WebP codec pair (decoder: vp8.py). Emits spec-valid bitstreams
exercising the decoder's full token/prediction/reconstruction path
with a deliberately simple coding strategy:

- no segmentation, loop filter level configurable (0 = off),
  one token partition, default probability tables, no skip flags;
- every macroblock is coded 16x16 intra (DC/V/H/TM per caller) with
  a real forward WHT/DCT + quantization of the residual, or B_PRED
  with per-subblock modes when requested;
- chroma coded DC with quantized residuals.

This is NOT a rate-optimized encoder (that is what libwebp is for);
it exists so the always-on test/gate path can roundtrip lossy WebP
through decode_vp8 without any system library, with reconstruction
error bounded by the chosen quantizer. tests/test_vp8.py additionally
feeds these fixtures to libwebp itself (when present) to pin that the
STREAMS are spec-valid, not merely self-consistent."""

from __future__ import annotations

import numpy as np

from rta_registrations_pyspark_glue_spark.operators.vp8 import (
    B_PRED,
    BMODE_TREE,
    CAT_BASE,
    CAT_PROBS,
    COEFF_BANDS,
    COEFF_TREE,
    DC_PRED,
    H_PRED,
    KF_BMODE_PROBS,
    KF_UV_MODE_PROBS,
    KF_YMODE_PROBS,
    KF_YMODE_TREE,
    TM_PRED,
    TOK_0,
    TOK_1,
    TOK_4,
    TOK_CAT1,
    TOK_CAT6,
    TOK_EOB,
    UV_MODE_TREE,
    V_PRED,
    ZIGZAG,
    _quant_factors,
)
from rta_registrations_pyspark_glue_spark.operators.vp8_tables import (
    COEFF_DEFAULT_PROBS,
    COEFF_UPDATE_PROBS,
)


class BoolEncoder:
    """§7 boolean arithmetic encoder (the exact inverse of
    vp8.BoolDecoder, carry propagation included)."""

    def __init__(self):
        self.out = bytearray()
        self.range = 255
        self.bottom = 0
        self.bit_count = 24

    def _carry(self):
        i = len(self.out) - 1
        while True:
            if i < 0:
                raise OverflowError("carry out of stream start")
            if self.out[i] == 0xFF:
                self.out[i] = 0
                i -= 1
            else:
                self.out[i] += 1
                return

    def put(self, prob: int, bit: int):
        split = 1 + (((self.range - 1) * prob) >> 8)
        if bit:
            self.bottom += split
            self.range -= split
        else:
            self.range = split
        while self.range < 128:
            self.range <<= 1
            if self.bottom & (1 << 31):
                self._carry()
                self.bottom &= (1 << 31) - 1
            self.bottom <<= 1
            self.bit_count -= 1
            if self.bit_count == 0:
                self.out.append((self.bottom >> 24) & 0xFF)
                self.bottom &= (1 << 24) - 1
                self.bit_count = 8

    def bit(self, b: int):
        self.put(128, b)

    def literal(self, v: int, n: int):
        for i in range(n - 1, -1, -1):
            self.bit((v >> i) & 1)

    def tree(self, tree, probs, leaf: int, start: int = 0):
        """Emit the bit path that makes vp8.BoolDecoder.tree return
        ``leaf`` starting from node ``start``."""
        path = _tree_path(tree, leaf, start)
        for node, b in path:
            self.put(probs[node >> 1], b)

    def finish(self) -> bytes:
        for _ in range(32):
            if self.bottom & (1 << 31):
                self._carry()
                self.bottom &= (1 << 31) - 1
            self.bottom <<= 1
            self.bit_count -= 1
            if self.bit_count == 0:
                self.out.append((self.bottom >> 24) & 0xFF)
                self.bottom &= (1 << 24) - 1
                self.bit_count = 8
        return bytes(self.out)


def _tree_path(tree, leaf: int, start: int = 0):
    """DFS for the (node, bit) path that reaches ``-leaf``."""
    stack = [(start, [])]
    while stack:
        node, path = stack.pop()
        for b in (0, 1):
            nxt = tree[node + b]
            if nxt == -leaf and nxt <= 0:
                return path + [(node, b)]
            if nxt > 0:
                stack.append((nxt, path + [(node, b)]))
    raise ValueError(f"leaf {leaf} unreachable")


# forward transforms (exact inverses are in vp8.py; these only need to
# be close enough that quantized coefficients reconstruct within the
# quantizer step — they follow libvpx's short_fdct4x4 scaling so the
# spec inverse returns the residual)


def fdct4x4(block: np.ndarray) -> np.ndarray:
    """Forward 4x4 DCT matched to vp8.idct4x4's fixed-point inverse
    (libvpx vp8_short_fdct4x4_c)."""
    b = block.astype(np.int64)
    t = np.zeros((4, 4), np.int64)
    for i in range(4):
        a1 = (b[i, 0] + b[i, 3]) * 8
        b1 = (b[i, 1] + b[i, 2]) * 8
        c1 = (b[i, 1] - b[i, 2]) * 8
        d1 = (b[i, 0] - b[i, 3]) * 8
        t[i, 0] = a1 + b1
        t[i, 2] = a1 - b1
        t[i, 1] = (c1 * 2217 + d1 * 5352 + 14500) >> 12
        t[i, 3] = (d1 * 2217 - c1 * 5352 + 7500) >> 12
    out = np.zeros((4, 4), np.int64)
    for i in range(4):
        a1 = t[0, i] + t[3, i]
        b1 = t[1, i] + t[2, i]
        c1 = t[1, i] - t[2, i]
        d1 = t[0, i] - t[3, i]
        out[0, i] = (a1 + b1 + 7) >> 4
        out[2, i] = (a1 - b1 + 7) >> 4
        out[1, i] = ((c1 * 2217 + d1 * 5352 + 12000) >> 16) + (1 if d1 != 0 else 0)
        out[3, i] = (d1 * 2217 - c1 * 5352 + 51000) >> 16
    return out


def fwht4x4(dcs: np.ndarray) -> np.ndarray:
    """Forward WHT over the 16 subblock DC terms (libvpx
    vp8_short_walsh4x4_c), inverse of vp8.iwht4x4."""
    b = dcs.astype(np.int64)
    t = np.zeros((4, 4), np.int64)
    for i in range(4):
        a1 = (b[i, 0] + b[i, 2]) * 4
        d1 = (b[i, 1] + b[i, 3]) * 4
        c1 = (b[i, 1] - b[i, 3]) * 4
        b1 = (b[i, 0] - b[i, 2]) * 4
        t[i, 0] = a1 + d1 + (1 if a1 != 0 else 0)
        t[i, 1] = b1 + c1
        t[i, 2] = b1 - c1
        t[i, 3] = a1 - d1
    out = np.zeros((4, 4), np.int64)
    for i in range(4):
        a1 = t[0, i] + t[2, i]
        d1 = t[1, i] + t[3, i]
        c1 = t[1, i] - t[3, i]
        b1 = t[0, i] - t[2, i]
        a2 = a1 + d1
        b2 = b1 + c1
        c2 = b1 - c1
        d2 = a1 - d1
        out[0, i] = (a2 + (1 if a2 < 0 else 0) + 3) >> 3
        out[1, i] = (b2 + (1 if b2 < 0 else 0) + 3) >> 3
        out[2, i] = (c2 + (1 if c2 < 0 else 0) + 3) >> 3
        out[3, i] = (d2 + (1 if d2 < 0 else 0) + 3) >> 3
    return out


def _token_for(v: int):
    """abs value -> (token, extra). Values above cat6 range clamp."""
    if v <= 4:
        return (TOK_0 + v, 0)
    for tok in (TOK_CAT1, TOK_CAT1 + 1, TOK_CAT1 + 2, TOK_CAT1 + 3,
                TOK_CAT1 + 4):
        base = CAT_BASE[tok]
        span = 1 << len(CAT_PROBS[tok])
        if v < base + span:
            return (tok, v - base)
    base = CAT_BASE[TOK_CAT6]
    span = 1 << len(CAT_PROBS[TOK_CAT6])
    if v >= base + span:
        v = base + span - 1
    return (TOK_CAT6, v - base)


def _encode_block(enc: BoolEncoder, probs, block_type: int, first: int,
                  ctx: int, qcoeffs) -> int:
    """Encode one 4x4 block's quantized coefficients (zigzag order
    list of 16 ints, pre-division). Returns the nonzero flag."""
    base_t = block_type * 264
    # find last nonzero in zigzag order
    last = -1
    for i in range(15, first - 1, -1):
        if qcoeffs[i]:
            last = i
            break
    i = first
    start = 0
    while i < 16:
        band = COEFF_BANDS[i]
        p = base_t + (band * 3 + ctx) * 11
        pr = probs[p:p + 11]
        if i > last:
            enc.tree(COEFF_TREE, pr, TOK_EOB, 0)
            break
        v = qcoeffs[i]
        a = abs(v)
        tok, extra = _token_for(a)
        a = CAT_BASE.get(tok, a) + extra if tok >= TOK_CAT1 else a
        enc.tree(COEFF_TREE, pr, tok, start)
        if tok == TOK_0:
            ctx = 0
            start = 2
            i += 1
            continue
        start = 0
        if tok >= TOK_CAT1:
            cps = CAT_PROBS[tok]
            for bi, pb in enumerate(cps):
                enc.put(pb, (extra >> (len(cps) - 1 - bi)) & 1)
        enc.bit(1 if v < 0 else 0)
        ctx = 1 if a == 1 else 2
        i += 1
    else:
        # ran through i == 15 with last == 15: no EOB needed
        pass
    return 1 if last >= first else 0


def _clamp_q(v):
    return 0 if v < 0 else (127 if v > 127 else v)


def encode_vp8(y: np.ndarray, u: np.ndarray, v: np.ndarray, q_index: int = 40,
               filter_level: int = 0, ymode: int = DC_PRED,
               uvmode: int = DC_PRED, bmodes=None,
               filter_type_simple: bool = False, sharpness: int = 0) -> bytes:
    """Encode Y/U/V planes (uint8; chroma may be any half-res shape —
    padded internally) as one VP8 keyframe. All MBs share ``ymode``
    (pass B_PRED + a ``bmodes`` callable (mby, mbx, sb) -> mode for
    4x4 coding) and ``uvmode``. Returns the raw 'VP8 ' chunk payload.
    """
    from rta_registrations_pyspark_glue_spark.operators import vp8 as dec

    height, width = y.shape
    mb_w, mb_h = (width + 15) >> 4, (height + 15) >> 4
    W, H = mb_w * 16, mb_h * 16
    yp = np.full((H, W), 0, np.int32)
    yp[:height, :width] = y
    # edge-pad so prediction sees repeated content (any values are
    # legal; padding replication keeps residuals small)
    yp[:height, width:] = yp[:height, width - 1:width]
    yp[height:, :] = yp[height - 1:height, :]
    ch, cw = (height + 1) >> 1, (width + 1) >> 1
    up = np.zeros((H >> 1, W >> 1), np.int32)
    vp = np.zeros((H >> 1, W >> 1), np.int32)
    up[:u.shape[0], :u.shape[1]] = u
    vp[:v.shape[0], :v.shape[1]] = v
    up[:ch, cw:] = up[:ch, cw - 1:cw]
    up[ch:, :] = up[ch - 1:ch, :]
    vp[:ch, cw:] = vp[:ch, cw - 1:cw]
    vp[ch:, :] = vp[ch - 1:ch, :]

    (y1dc, y1ac), (y2dc, y2ac), (uvdc, uvac) = _quant_factors(
        _clamp_q(q_index), 0, 0, 0, 0, 0
    )

    probs = list(COEFF_DEFAULT_PROBS)

    # ---------- header partition
    hdr = BoolEncoder()
    hdr.bit(0)  # color space
    hdr.bit(0)  # clamping
    hdr.bit(0)  # segmentation disabled
    hdr.bit(1 if filter_type_simple else 0)
    hdr.literal(filter_level, 6)
    hdr.literal(sharpness, 3)
    hdr.bit(0)  # no lf deltas
    hdr.literal(0, 2)  # one token partition
    hdr.literal(_clamp_q(q_index), 7)
    for _ in range(5):
        hdr.bit(0)  # no quant deltas
    hdr.bit(0)  # refresh entropy (ignored on keyframe)
    for i in range(1056):
        hdr.put(COEFF_UPDATE_PROBS[i], 0)  # keep default probs
    hdr.bit(0)  # mb_no_coeff_skip off: every MB codes coefficients

    tok = BoolEncoder()

    # entropy contexts mirror the decoder's
    above_nz = np.zeros((mb_w, 9), np.int8)
    above_sub = np.zeros((mb_w, 4), np.int8)

    recon_y = np.zeros((H, W), np.int32)
    recon_u = np.zeros((H >> 1, W >> 1), np.int32)
    recon_v = np.zeros((H >> 1, W >> 1), np.int32)

    for mby in range(mb_h):
        left_nz = np.zeros(9, np.int8)
        left_sub = [0, 0, 0, 0]
        for mbx in range(mb_w):
            y0, x0 = mby * 16, mbx * 16
            # --- modes
            hdr.tree(KF_YMODE_TREE, KF_YMODE_PROBS, ymode)
            if ymode == B_PRED:
                sub = [0] * 16
                for sb in range(16):
                    r, c = sb >> 2, sb & 3
                    am = sub[sb - 4] if r > 0 else int(above_sub[mbx, c])
                    lm = sub[sb - 1] if c > 0 else left_sub[r]
                    m = bmodes(mby, mbx, sb) if bmodes else 0
                    bp = KF_BMODE_PROBS[(am * 10 + lm) * 9:(am * 10 + lm) * 9 + 9]
                    hdr.tree(BMODE_TREE, bp, m)
                    sub[sb] = m
                above_sub[mbx] = sub[12:16]
                left_sub = [sub[3], sub[7], sub[11], sub[15]]
            else:
                implied = {DC_PRED: 0, V_PRED: 2, H_PRED: 3, TM_PRED: 1}[ymode]
                sub = [implied] * 16
                above_sub[mbx] = [implied] * 4
                left_sub = [implied] * 4
            hdr.tree(UV_MODE_TREE, KF_UV_MODE_PROBS, uvmode)

            has_y2 = ymode != B_PRED

            # --- luma: predict from RECONSTRUCTED pixels, transform,
            # quantize, then reconstruct exactly as the decoder will
            if has_y2:
                pred = dec._predict_16_or_chroma(
                    recon_y, mby, mbx, 16, ymode
                )
                resid = yp[y0:y0 + 16, x0:x0 + 16] - pred
                qy = []
                dcs = np.zeros((4, 4), np.int64)
                coeffs = []
                for sb in range(16):
                    r, c = (sb >> 2) * 4, (sb & 3) * 4
                    f = fdct4x4(resid[r:r + 4, c:c + 4])
                    dcs[sb >> 2, sb & 3] = f[0, 0]
                    coeffs.append(f)
                wht = fwht4x4(dcs)
                qy2 = [0] * 16
                for i in range(16):
                    zz = ZIGZAG[i]
                    val = int(wht[zz >> 2, zz & 3])
                    q = y2dc if i == 0 else y2ac
                    qy2[i] = int(np.sign(val)) * (abs(val) // q)
                ctx = int(left_nz[8]) + int(above_nz[mbx, 8])
                nz = _encode_block(tok, probs, 1, 0, ctx, qy2)
                left_nz[8] = above_nz[mbx, 8] = nz
                # dequantized y2 -> iwht -> subblock DCs (decoder view)
                deq2 = [0] * 16
                for i in range(16):
                    q = y2dc if i == 0 else y2ac
                    deq2[ZIGZAG[i]] = qy2[i] * q
                dec_dcs = dec.iwht4x4(deq2)

                for sb in range(16):
                    r, c = (sb >> 2) * 4, (sb & 3) * 4
                    f = coeffs[sb]
                    qb = [0] * 16
                    for i in range(1, 16):
                        zz = ZIGZAG[i]
                        val = int(f[zz >> 2, zz & 3])
                        qb[i] = int(np.sign(val)) * (abs(val) // y1ac)
                    cr, cc = sb >> 2, sb & 3
                    ctx = int(left_nz[cr]) + int(above_nz[mbx, cc])
                    nz = _encode_block(tok, probs, 0, 1, ctx, qb)
                    left_nz[cr] = above_nz[mbx, cc] = nz
                    deq = [0] * 16
                    for i in range(1, 16):
                        deq[ZIGZAG[i]] = qb[i] * y1ac
                    deq[0] = dec_dcs[sb]
                    res = dec.idct4x4(deq)
                    blkp = pred[r:r + 4, c:c + 4] + np.array(
                        res, np.int32).reshape(4, 4)
                    recon_y[y0 + r:y0 + r + 4, x0 + c:x0 + c + 4] = np.clip(
                        blkp, 0, 255)
            else:
                for sb in range(16):
                    r, c = (sb >> 2) * 4, (sb & 3) * 4
                    ay, ax = y0 + r - 1, x0 + c
                    if y0 + r == 0:
                        a = [127] * 4
                        ar = [127] * 4
                        tl = 127
                    else:
                        a = [int(t) for t in recon_y[ay, ax:ax + 4]]
                        if c < 12:
                            ar = [int(t) for t in recon_y[ay, ax + 4:ax + 8]]
                        elif y0 == 0:
                            ar = [127] * 4
                        elif x0 + 16 < W:
                            ar = [int(t) for t in
                                  recon_y[y0 - 1, x0 + 16:x0 + 20]]
                        else:
                            ar = [int(recon_y[y0 - 1, W - 1])] * 4
                        if x0 + c == 0:
                            tl = 129
                        else:
                            tl = int(recon_y[ay, ax - 1])
                    if x0 + c == 0:
                        l = [129] * 4
                    else:
                        l = [int(t) for t in
                             recon_y[y0 + r:y0 + r + 4, x0 + c - 1]]
                    m = sub[sb]
                    predb = np.array(dec._bpred_block(a, l, tl, ar, m),
                                     np.int32)
                    resid = yp[y0 + r:y0 + r + 4, x0 + c:x0 + c + 4] - predb
                    f = fdct4x4(resid)
                    qb = [0] * 16
                    for i in range(16):
                        zz = ZIGZAG[i]
                        val = int(f[zz >> 2, zz & 3])
                        q = y1dc if i == 0 else y1ac
                        qb[i] = int(np.sign(val)) * (abs(val) // q)
                    cr, cc = sb >> 2, sb & 3
                    ctx = int(left_nz[cr]) + int(above_nz[mbx, cc])
                    nz = _encode_block(tok, probs, 3, 0, ctx, qb)
                    left_nz[cr] = above_nz[mbx, cc] = nz
                    deq = [0] * 16
                    for i in range(16):
                        q = y1dc if i == 0 else y1ac
                        deq[ZIGZAG[i]] = qb[i] * q
                    res = dec.idct4x4(deq)
                    recon_y[y0 + r:y0 + r + 4, x0 + c:x0 + c + 4] = np.clip(
                        predb + np.array(res, np.int32).reshape(4, 4), 0, 255)

            # --- chroma
            cy0, cx0 = mby * 8, mbx * 8
            for pi, (plane, rplane) in enumerate(
                ((up, recon_u), (vp, recon_v))
            ):
                pred = dec._predict_16_or_chroma(rplane, mby, mbx, 8, uvmode)
                resid = plane[cy0:cy0 + 8, cx0:cx0 + 8] - pred
                for sb in range(4):
                    r, c = (sb >> 1) * 4, (sb & 1) * 4
                    f = fdct4x4(resid[r:r + 4, c:c + 4])
                    qb = [0] * 16
                    for i in range(16):
                        zz = ZIGZAG[i]
                        val = int(f[zz >> 2, zz & 3])
                        q = uvdc if i == 0 else uvac
                        qb[i] = int(np.sign(val)) * (abs(val) // q)
                    li, ai = 4 + 2 * pi + (sb >> 1), 4 + 2 * pi + (sb & 1)
                    ctx = int(left_nz[li]) + int(above_nz[mbx, ai])
                    nz = _encode_block(tok, probs, 2, 0, ctx, qb)
                    left_nz[li] = above_nz[mbx, ai] = nz
                    deq = [0] * 16
                    for i in range(16):
                        q = uvdc if i == 0 else uvac
                        deq[ZIGZAG[i]] = qb[i] * q
                    res = dec.idct4x4(deq)
                    rplane[cy0 + r:cy0 + r + 4, cx0 + c:cx0 + c + 4] = np.clip(
                        pred[r:r + 4, c:c + 4]
                        + np.array(res, np.int32).reshape(4, 4), 0, 255)

    part0 = hdr.finish()
    part1 = tok.finish()
    tag = (len(part0) << 5) | (1 << 4) | 0  # keyframe, version 0, shown
    out = bytearray()
    out += bytes((tag & 0xFF, (tag >> 8) & 0xFF, (tag >> 16) & 0xFF))
    out += b"\x9d\x01\x2a"
    out += bytes((width & 0xFF, (width >> 8) & 0x3F))
    out += bytes((height & 0xFF, (height >> 8) & 0x3F))
    out += part0
    out += part1
    return bytes(out)


def synthesize_vp8_stream(q_index: int, ty: int, tu: int, tv: int) -> bytes:
    """One 16x16 VP8 keyframe with EXACTLY-known decode: a single
    DC16 macroblock whose Y2 block carries dc token ``ty`` and whose
    four U / four V blocks carry dc tokens ``tu`` / ``tv`` (all other
    coefficients EOB). The decoded planes are closed-form integers —
    Y = 128 + (((ty*y2dc + 3)>>3) + 4)>>3 uniformly (WHT spread then
    DC-only IDCT), U/V = 128 + ((t*uvdc + 4)>>3) — which is what lets
    the driver gate hash lossy-VP8 decode against an ANALYTIC SQL
    oracle (queries_similarity._MM_VP8_ORACLE mirrors these exact
    shifts). Tokens must be small enough to stay below clipping."""
    (y1dc, y1ac), (y2dc, y2ac), (uvdc, uvac) = _quant_factors(
        _clamp_q(q_index), 0, 0, 0, 0, 0
    )
    probs = list(COEFF_DEFAULT_PROBS)
    hdr = BoolEncoder()
    hdr.bit(0)  # color space
    hdr.bit(0)  # clamping
    hdr.bit(0)  # segmentation disabled
    hdr.bit(0)  # normal filter
    hdr.literal(0, 6)  # filter level 0
    hdr.literal(0, 3)  # sharpness
    hdr.bit(0)  # no lf deltas
    hdr.literal(0, 2)  # one token partition
    hdr.literal(_clamp_q(q_index), 7)
    for _ in range(5):
        hdr.bit(0)  # no quant deltas
    hdr.bit(0)  # refresh entropy
    for i in range(1056):
        hdr.put(COEFF_UPDATE_PROBS[i], 0)
    hdr.bit(0)  # no skip flags
    hdr.tree(KF_YMODE_TREE, KF_YMODE_PROBS, DC_PRED)
    hdr.tree(UV_MODE_TREE, KF_UV_MODE_PROBS, DC_PRED)

    tok = BoolEncoder()
    _encode_block(tok, probs, 1, 0, 0, [ty] + [0] * 15)
    for _ in range(16):
        # every luma block is all-zero, so left/above nz contexts
        # stay 0 throughout (frame-corner MB)
        _encode_block(tok, probs, 0, 1, 0, [0] * 16)
    for t in (tu, tv):
        lnz = [0, 0]
        anz = [0, 0]
        for sb in range(4):
            r, c = sb >> 1, sb & 1
            ctx = int(lnz[r]) + int(anz[c])
            b = _encode_block(tok, probs, 2, 0, ctx, [t] + [0] * 15)
            lnz[r] = anz[c] = b

    part0 = hdr.finish()
    part1 = tok.finish()
    tag = (len(part0) << 5) | (1 << 4)
    out = bytearray()
    out += bytes((tag & 0xFF, (tag >> 8) & 0xFF, (tag >> 16) & 0xFF))
    out += b"\x9d\x01\x2a"
    out += bytes((16, 0, 16, 0))
    out += part0
    out += part1
    return bytes(out)


def wrap_webp(vp8_payload: bytes) -> bytes:
    """RIFF/WEBP container around a raw VP8 chunk."""
    chunk = b"VP8 " + len(vp8_payload).to_bytes(4, "little") + vp8_payload
    if len(vp8_payload) & 1:
        chunk += b"\x00"
    return b"RIFF" + (len(chunk) + 4).to_bytes(4, "little") + b"WEBP" + chunk
