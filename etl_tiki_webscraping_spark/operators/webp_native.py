"""ctypes binding to the system libwebp (round-14) — REAL lossy-VP8
pixel decode, and the conformance cross-check for the pure-Python VP8L
codec in :mod:`.webp`.

Round-13 deferred the VP8 bool-coder decision to this round.  The
decision: a hand-written VP8 payload decoder needs ~2.3k exact spec
constants (default/update coefficient probability tables, quantizer
lookups) that cannot be derived from first principles — unlike
VP8L/FLAC/JPEG, whose code tables are self-describing in-stream — so a
from-scratch decoder could only be verified self-consistently, never
against the actual spec.  The container ships ``libwebp.so.7`` (the
reference implementation, public open source), whose flat C API binds
cleanly through stdlib ctypes — so lossy WebP gets REAL decode, and
the VP8L encoder/decoder pair gets production-grade conformance
evidence in both directions (tests/test_webp_native.py):

- bitstreams written by :func:`..webp.encode_webp_lossless` must
  decode BIT-IDENTICALLY through libwebp (our writer is conformant);
- bitstreams written by libwebp's lossless encoder must decode
  bit-identically through :func:`..webp.decode_webp_lossless` (our
  reader handles a production encoder's stream choices).

Everything degrades gracefully: if the shared library is absent, every
entry point returns None and the callers' quarantine rows report the
coverage loss per variant (the sniff_audio_formats contract).  Scale
shape: the callers wrap these in the same 1->1 Arrow-batched
mapInPandas kernels as the pure-Python codecs — blobs never shuffle,
and the C calls run inside the Python worker with no extra copies
beyond the output array.
"""

from __future__ import annotations

import ctypes
from typing import Optional

import numpy as np

_LIB: "ctypes.CDLL | None | bool" = None  # False = tried and absent


def _lib() -> "ctypes.CDLL | None":
    global _LIB
    if _LIB is None:
        try:
            lib = ctypes.CDLL("libwebp.so.7")
            lib.WebPGetInfo.restype = ctypes.c_int
            lib.WebPGetInfo.argtypes = [
                ctypes.c_char_p, ctypes.c_size_t,
                ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ]
            lib.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_uint8)
            lib.WebPDecodeRGBA.argtypes = [
                ctypes.c_char_p, ctypes.c_size_t,
                ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ]
            lib.WebPEncodeRGBA.restype = ctypes.c_size_t
            lib.WebPEncodeRGBA.argtypes = [
                ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_float, ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
            ]
            lib.WebPEncodeLosslessRGBA.restype = ctypes.c_size_t
            lib.WebPEncodeLosslessRGBA.argtypes = [
                ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
            ]
            lib.WebPFree.restype = None
            lib.WebPFree.argtypes = [ctypes.c_void_p]
            _LIB = lib
        except OSError:
            _LIB = False
    return _LIB if _LIB is not False else None


def native_available() -> bool:
    return _lib() is not None


def webp_native_get_info(content: bytes) -> "Optional[tuple[int, int]]":
    """(width, height) via WebPGetInfo, or None (bad bytes / no lib)."""
    lib = _lib()
    if lib is None or not content:
        return None
    w, h = ctypes.c_int(0), ctypes.c_int(0)
    ok = lib.WebPGetInfo(content, len(content), ctypes.byref(w), ctypes.byref(h))
    return (w.value, h.value) if ok else None


def webp_native_decode_rgba(content: bytes) -> "Optional[np.ndarray]":
    """(h, w, 4) uint8 RGBA via WebPDecodeRGBA (lossy VP8, lossless
    VP8L, and extended VP8X files alike), or None."""
    lib = _lib()
    if lib is None or not content:
        return None
    w, h = ctypes.c_int(0), ctypes.c_int(0)
    buf = lib.WebPDecodeRGBA(content, len(content), ctypes.byref(w), ctypes.byref(h))
    if not buf:
        return None
    try:
        n = w.value * h.value * 4
        arr = np.ctypeslib.as_array(buf, shape=(n,)).copy()
    finally:
        lib.WebPFree(ctypes.cast(buf, ctypes.c_void_p))
    return arr.reshape(h.value, w.value, 4)


def webp_native_decode_luma(content: bytes) -> "Optional[np.ndarray]":
    """Luma plane (float32) through the native decode — the
    :func:`..multimodal._decode_image_impl` dispatch contract, same
    gray-exact convention as the pure-Python decoders (stored channel
    for r==g==b, weighted luma otherwise)."""
    px = webp_native_decode_rgba(content)
    if px is None:
        return None
    r = px[..., 0].astype(np.float32)
    g = px[..., 1].astype(np.float32)
    b = px[..., 2].astype(np.float32)
    if (px[..., 0] == px[..., 1]).all() and (px[..., 2] == px[..., 1]).all():
        return g
    return 0.299 * r + 0.587 * g + 0.114 * b


def _encode_rgba(img: np.ndarray, lossless: bool, quality: float) -> "Optional[bytes]":
    lib = _lib()
    if lib is None:
        return None
    if img.ndim == 2:  # gray -> opaque RGBA
        img = np.stack([img, img, img, np.full_like(img, 255)], axis=-1)
    if img.ndim != 3 or img.shape[2] != 4:
        raise ValueError("expected (h, w) gray or (h, w, 4) RGBA uint8")
    h, w = img.shape[:2]
    data = np.ascontiguousarray(img, dtype=np.uint8).tobytes()
    out = ctypes.POINTER(ctypes.c_uint8)()
    if lossless:
        size = lib.WebPEncodeLosslessRGBA(data, w, h, w * 4, ctypes.byref(out))
    else:
        size = lib.WebPEncodeRGBA(data, w, h, w * 4, quality, ctypes.byref(out))
    if not size or not out:
        return None
    try:
        return bytes(bytearray(np.ctypeslib.as_array(out, shape=(size,))))
    finally:
        lib.WebPFree(ctypes.cast(out, ctypes.c_void_p))


def webp_native_encode_lossy(img: np.ndarray, quality: float = 75.0) -> "Optional[bytes]":
    """Real lossy-VP8 WebP bytes from a gray/RGBA uint8 array — the
    fixture writer the lossy-decode query uses (our pure-Python
    surface deliberately has no lossy encoder)."""
    return _encode_rgba(img, lossless=False, quality=quality)


def webp_native_encode_lossless(img: np.ndarray) -> "Optional[bytes]":
    """libwebp's own VP8L writer — the cross-check input for the
    pure-Python decoder's conformance tests."""
    return _encode_rgba(img, lossless=True, quality=0.0)
