"""Extract the VP8 keyframe decoding constant tables from a system
libwebp shared object into operators/vp8_tables.py.

The tables are the public constants of RFC 6386 (the VP8 bitstream
spec; its appendix carries the reference decoder they come from):
dequantization lookups (§14.1), the default DCT-token probabilities
and their update probabilities (§13.4-13.5), and the keyframe 4x4
intra-mode probabilities (§11.5). We do not have the RFC text in this
environment, so the byte-exact values are recovered from the
container's BSD-licensed libwebp binary (which compiles those same
spec tables into .rodata) by STRUCTURAL search — each table has an
unambiguous signature — then cross-checked against the spec fragments
we know independently (dc table ends 157, ac ends 284, category
extra-bit probabilities, the first default-probability row
{253,136,254,...}) and, end-to-end, by the differential tests that
decode libwebp-encoded bitstreams bit-exactly (tests/test_vp8.py).

Signatures used:
- ac_qlookup[128]  : uint16, monotone, starts 4,5,6,7, ends 284
- dc_qlookup[128]  : uint8, monotone, starts 4,5,6,7, ends 157
- update probs     : 1056 bytes, >800 of them 255, none 0
- kf b-mode probs  : the 900 bytes immediately after the update table
                     (first row {231,120,48,...} — RFC kf_bmode_prob)
- default probs    : 1056 bytes starting {253,136,254,255,228,219,...}
                     (RFC coeff_probs block 0 / band 0 / ctx 0)

Run: python tools/extract_vp8_tables.py [path-to-libwebp.so]
Rewrites rta_registrations_pyspark_glue_spark/operators/vp8_tables.py.
"""

from __future__ import annotations

import struct
import sys
from pathlib import Path

DEFAULT_SO = "/usr/lib/x86_64-linux-gnu/libwebp.so.7"
OUT = (
    Path(__file__).resolve().parent.parent
    / "rta_registrations_pyspark_glue_spark"
    / "operators"
    / "vp8_tables.py"
)


def _find_ac(f: bytes) -> tuple[int, ...]:
    for off in range(0, len(f) - 256, 2):
        if f[off : off + 4] == b"\x04\x00\x05\x00":
            vals = struct.unpack_from("<128H", f, off)
            if all(vals[i] <= vals[i + 1] for i in range(127)) and vals[-1] == 284:
                return vals
    raise SystemExit("ac_qlookup not found")


def _find_dc(f: bytes) -> tuple[int, ...]:
    for off in range(0, len(f) - 128):
        if f[off : off + 4] == bytes([4, 5, 6, 7]):
            vals = tuple(f[off : off + 128])
            if all(vals[i] <= vals[i + 1] for i in range(127)) and vals[-1] == 157:
                return vals
    raise SystemExit("dc_qlookup not found")


#: libwebp's internal 4x4-mode enum orders the diagonal modes
#: RD,VR,LD at indices 4,5,6, where the RFC enum has LD,RD,VR — the
#: tree POSITIONS encode the same mode either way, but kBModesProba's
#: context axes are indexed with libwebp numbering, so rows/columns
#: 4..6 must be permuted into RFC numbering on extraction. (Round-9
#: debugging war story: with the raw table, every mode except
#: LD/RD/VR round-trips bit-exactly — the three permuted rows only
#: desynchronize at asymmetric above/left contexts.)
_LIBWEBP_FROM_RFC = (0, 1, 2, 3, 6, 4, 5, 7, 8, 9)


def _find_update_and_bmode(f: bytes) -> tuple[bytes, bytes]:
    off = 0
    while off < len(f) - 1056:
        w = f[off : off + 1056]
        if w.count(255) > 800 and 0 not in w:
            # walk back to the true start of the 255 run
            while f[off - 1] == 255:
                off -= 1
            upd = f[off : off + 1056]
            raw = f[off + 1056 : off + 1056 + 900]
            if raw[:3] == bytes([231, 120, 48]):
                bmode = bytearray(900)
                for a in range(10):
                    for l in range(10):
                        la, ll = _LIBWEBP_FROM_RFC[a], _LIBWEBP_FROM_RFC[l]
                        src = (la * 10 + ll) * 9
                        dst = (a * 10 + l) * 9
                        bmode[dst : dst + 9] = raw[src : src + 9]
                return upd, bytes(bmode)
        off += 64
    raise SystemExit("update/bmode tables not found")


def _find_default(f: bytes) -> bytes:
    # {253,136,254,...} is row [0][1][0] — block type 0 ("Y after
    # Y2") starts its coefficients at index 1, so its band-0 rows
    # [0][0][*] are 33 dummy bytes of 128 sitting immediately BEFORE
    # the signature. (Round-9 debugging war story: extracting from
    # the signature itself shifts every probability by one band and
    # silently desynchronizes the arithmetic decoder against real
    # libwebp streams while remaining perfectly self-consistent.)
    sig = bytes([253, 136, 254, 255, 228, 219, 128, 128, 128, 128, 128])
    i = f.find(sig)
    if i < 0:
        raise SystemExit("default coeff probs not found")
    start = i - 33
    if f[start:i] != bytes([128]) * 33:
        raise SystemExit("default coeff probs: dummy band-0 rows missing")
    return f[start : start + 1056]


def _fmt(name: str, flat: list[int], shape: str) -> str:
    body = ",".join(str(v) for v in flat)
    return f"#: {shape}\n{name} = (\n    {body},\n)\n"


def main() -> None:
    so = sys.argv[1] if len(sys.argv) > 1 else DEFAULT_SO
    f = Path(so).read_bytes()
    ac = _find_ac(f)
    dc = _find_dc(f)
    upd, bmode = _find_update_and_bmode(f)
    dflt = _find_default(f)
    parts = [
        '"""VP8 keyframe decode constants (RFC 6386 / the public VP8',
        "bitstream spec). GENERATED by tools/extract_vp8_tables.py from a",
        "system libwebp .rodata (see that script for the recovery method",
        "and cross-checks) — edit the extractor, not this file. Flat",
        "tuples; index arithmetic documented per table.\"\"\"",
        "",
        _fmt("DC_QLOOKUP", list(dc), "uint8[128] — §14.1 dc dequant factors"),
        _fmt("AC_QLOOKUP", list(ac), "uint16[128] — §14.1 ac dequant factors"),
        _fmt(
            "COEFF_UPDATE_PROBS",
            list(upd),
            "uint8[4*8*3*11] — §13.4 probability-update gates,"
            " [block][band][ctx][token] row-major",
        ),
        _fmt(
            "COEFF_DEFAULT_PROBS",
            list(dflt),
            "uint8[4*8*3*11] — §13.5 default token probabilities,"
            " [block][band][ctx][token] row-major",
        ),
        _fmt(
            "KF_BMODE_PROBS",
            list(bmode),
            "uint8[10*10*9] — §11.5 keyframe 4x4 intra-mode"
            " probabilities, [above][left][tree-node] row-major",
        ),
    ]
    OUT.write_text("\n".join(parts))
    print(f"wrote {OUT}: dc[-1]={dc[-1]} ac[-1]={ac[-1]} "
          f"upd255={upd.count(255)} dflt0={dflt[:3].hex()}")


if __name__ == "__main__":
    main()
