"""ctypes bindings to a system libwebp, used ONLY as a differential
test oracle for the pure-Python VP8/VP8L codecs: encode pixel arrays
to real libwebp bitstreams, and decode to raw Y/U/V planes for
bit-exact comparison. Not a runtime dependency — everything degrades
to None when the shared object is absent (tests skip)."""

from __future__ import annotations

import ctypes
import ctypes.util

import numpy as np

_SO_CANDIDATES = (
    "libwebp.so.7",
    "libwebp.so",
    ctypes.util.find_library("webp"),
)


def load():
    for name in _SO_CANDIDATES:
        if not name:
            continue
        try:
            lib = ctypes.CDLL(name)
            lib.WebPGetInfo.restype = ctypes.c_int
            return lib
        except OSError:
            continue
    return None


def encode_rgb(lib, rgb: np.ndarray, quality: float) -> bytes:
    """RGB HxWx3 uint8 -> lossy WebP bytes via WebPEncodeRGB."""
    h, w, _ = rgb.shape
    rgb = np.ascontiguousarray(rgb, dtype=np.uint8)
    out = ctypes.POINTER(ctypes.c_uint8)()
    lib.WebPEncodeRGB.restype = ctypes.c_size_t
    n = lib.WebPEncodeRGB(
        rgb.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int(w), ctypes.c_int(h), ctypes.c_int(w * 3),
        ctypes.c_float(quality), ctypes.byref(out),
    )
    if n == 0:
        raise RuntimeError("WebPEncodeRGB failed")
    data = ctypes.string_at(out, n)
    lib.WebPFree(out)
    return data


def decode_yuv(lib, webp: bytes):
    """WebP bytes -> (y, u, v) uint8 planes via WebPDecodeYUVInto —
    the raw decoder output BEFORE any RGB conversion, which is the
    bit-exact comparison surface for a VP8 decoder."""
    w = ctypes.c_int()
    h = ctypes.c_int()
    if not lib.WebPGetInfo(webp, ctypes.c_size_t(len(webp)),
                           ctypes.byref(w), ctypes.byref(h)):
        raise RuntimeError("WebPGetInfo failed")
    W, H = w.value, h.value
    cw, ch = (W + 1) >> 1, (H + 1) >> 1
    y = np.zeros((H, W), np.uint8)
    u = np.zeros((ch, cw), np.uint8)
    v = np.zeros((ch, cw), np.uint8)
    lib.WebPDecodeYUVInto.restype = ctypes.POINTER(ctypes.c_uint8)
    r = lib.WebPDecodeYUVInto(
        webp, ctypes.c_size_t(len(webp)),
        y.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_size_t(y.size), ctypes.c_int(W),
        u.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_size_t(u.size), ctypes.c_int(cw),
        v.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_size_t(v.size), ctypes.c_int(cw),
    )
    if not r:
        raise RuntimeError("WebPDecodeYUVInto failed")
    return y, u, v


def vp8_chunk(webp: bytes) -> bytes:
    """Extract the raw 'VP8 ' chunk payload from a WebP container."""
    assert webp[:4] == b"RIFF" and webp[8:12] == b"WEBP"
    i = 12
    while i + 8 <= len(webp):
        tag = webp[i:i + 4]
        size = int.from_bytes(webp[i + 4:i + 8], "little")
        if tag == b"VP8 ":
            return webp[i + 8:i + 8 + size]
        i += 8 + size + (size & 1)
    raise ValueError("no VP8 chunk")
