"""ctypes bindings to a system libmpg123, used ONLY as a differential
test oracle for operators/mp3.py: decode an MP3 byte stream to int16
PCM for sample-exact comparison against the pure-Python frame decoder
(today: the silent-granule subset; when the Huffman path lands, the
full signal). Not a runtime dependency — everything degrades to None
when the shared object is absent (tests skip), exactly like
tools/libwebp_ref.py. This container ships no libmpg123; the harness
exists so any host that HAS one verifies interop for free."""

from __future__ import annotations

import ctypes
import ctypes.util

import numpy as np

_SO_CANDIDATES = (
    "libmpg123.so.0",
    "libmpg123.so",
    ctypes.util.find_library("mpg123"),
)

MPG123_OK = 0
MPG123_NEW_FORMAT = -11
MPG123_DONE = -12
MPG123_NEED_MORE = -10
MPG123_ENC_SIGNED_16 = 0x10 | 0x80  # MPG123_ENC_16 | MPG123_ENC_SIGNED


def load():
    for name in _SO_CANDIDATES:
        if not name:
            continue
        try:
            lib = ctypes.CDLL(name)
            lib.mpg123_init()
            lib.mpg123_new.restype = ctypes.c_void_p
            return lib
        except (OSError, AttributeError):
            continue
    return None


def decode(lib, data: bytes) -> tuple[np.ndarray, int]:
    """MP3 bytes → ((n, channels) int16 PCM, sample_rate) via the
    feed API (open_feed/feed/read), forcing signed-16 output."""
    handle = ctypes.c_void_p(lib.mpg123_new(None, None))
    if not handle:
        raise RuntimeError("mpg123_new failed")
    try:
        if lib.mpg123_open_feed(handle) != MPG123_OK:
            raise RuntimeError("mpg123_open_feed failed")
        lib.mpg123_feed(handle, data, len(data))
        out = bytearray()
        rate = ctypes.c_long()
        channels = ctypes.c_int()
        enc = ctypes.c_int()
        buf = (ctypes.c_uint8 * 65536)()
        done = ctypes.c_size_t()
        sr, ch = None, None
        while True:
            rc = lib.mpg123_read(
                handle, buf, len(buf), ctypes.byref(done)
            )
            out += bytes(buf[: done.value])
            if rc == MPG123_NEW_FORMAT:
                lib.mpg123_getformat(
                    handle, ctypes.byref(rate), ctypes.byref(channels),
                    ctypes.byref(enc),
                )
                sr, ch = rate.value, channels.value
                continue
            if rc in (MPG123_DONE, MPG123_NEED_MORE):
                break
            if rc != MPG123_OK:
                raise RuntimeError(f"mpg123_read rc={rc}")
        if sr is None or ch is None:
            raise RuntimeError("mpg123 never reported a format")
        pcm = np.frombuffer(bytes(out), "<i2").reshape(-1, ch)
        return pcm, sr
    finally:
        lib.mpg123_delete(handle)
