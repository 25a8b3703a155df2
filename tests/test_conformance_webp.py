"""Cross-implementation conformance for BOTH WebP codecs against the
system libwebp (env-gated: every test skips when the .so is absent).

Direction 1 (our encoder → libwebp): certifies our streams are
spec-valid as judged by the reference implementation.
Direction 2 (libwebp's encoder → our decoder): certifies our decoder on
REAL streams that use coding tools our fixture encoders never emit
(cross-color transform, per-tile predictor selection, backward
references chosen by a real cost model).

This oracle has caught real bugs the self-round-trips could not — see
FIXTURES.md §22 and the color-transform channel-layout fix in
codec_vp8l (an encoder/decoder pair that agrees with itself on a wrong
layout round-trips forever).
"""

from __future__ import annotations

import ctypes
import os
import struct

import numpy as np
import pytest

_LIBWEBP = "/usr/lib/x86_64-linux-gnu/libwebp.so.7"

pytestmark = pytest.mark.skipif(
    not os.path.exists(_LIBWEBP), reason="system libwebp not present")


@pytest.fixture(scope="module")
def lib():
    lib = ctypes.CDLL(_LIBWEBP)
    lib.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_uint8)
    lib.WebPDecodeRGBA.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
    lib.WebPEncodeLosslessRGBA.restype = ctypes.c_size_t
    lib.WebPEncodeLosslessRGBA.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8))]
    lib.WebPEncodeRGBA.restype = ctypes.c_size_t
    lib.WebPEncodeRGBA.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8))]
    return lib


def _lib_decode_rgba(lib, riff: bytes):
    w = ctypes.c_int()
    h = ctypes.c_int()
    ptr = lib.WebPDecodeRGBA(riff, len(riff), ctypes.byref(w), ctypes.byref(h))
    assert ptr, "libwebp refused the stream"
    return np.ctypeslib.as_array(ptr, shape=(h.value, w.value, 4)).copy()


def _lib_encode_lossless(lib, rgb: np.ndarray) -> bytes:
    h, w = rgb.shape[:2]
    rgba = np.dstack([rgb, np.full((h, w), 255, np.uint8)])
    out = ctypes.POINTER(ctypes.c_uint8)()
    n = lib.WebPEncodeLosslessRGBA(rgba.tobytes(), w, h, w * 4,
                                   ctypes.byref(out))
    assert n > 0
    return bytes(np.ctypeslib.as_array(out, shape=(n,)))


def _luma(rgb: np.ndarray) -> np.ndarray:
    r = rgb[..., 0].astype(int)
    g = rgb[..., 1].astype(int)
    b = rgb[..., 2].astype(int)
    return ((77 * r + 150 * g + 29 * b) >> 8).astype(np.uint8)


# ----------------------------------------------------------- VP8L


def test_vp8l_our_encoder_accepted_by_libwebp(lib):
    from gnosis_ocr_spark.functions.codec_vp8l import (
        encode_webp_lossless_gray,
    )

    rng = np.random.default_rng(4)
    for kw in ({}, dict(predictor=True), dict(rle=True),
               dict(cache_bits=4), dict(palette=True)):
        w, h = int(rng.integers(3, 60)), int(rng.integers(3, 40))
        maxv = 16 if kw.get("palette") else 256
        px = rng.integers(0, maxv, w * h, dtype=np.uint8).tobytes()
        riff = encode_webp_lossless_gray(px, w, h, **kw)
        rgba = _lib_decode_rgba(lib, riff)
        want = np.frombuffer(px, np.uint8).reshape(h, w)
        for ch in range(3):
            assert np.array_equal(rgba[..., ch], want), kw
        assert (rgba[..., 3] == 255).all()


def _content_cases():
    rng = np.random.default_rng(8)
    yy, xx = np.mgrid[0:40, 0:56]
    gradient = np.stack([(yy * 4 + xx) % 256, (xx * 3) % 256,
                         (yy * 2 + xx * 2) % 256], -1).astype(np.uint8)
    pal = np.array([[10, 200, 30], [250, 10, 10],
                    [10, 10, 250], [200, 200, 0]], np.uint8)
    palette = pal[rng.integers(0, 4, (33, 47))]
    noise = rng.integers(0, 256, (25, 31, 3), dtype=np.uint8)
    photo = (np.cumsum(np.cumsum(
        rng.integers(-2, 3, (48, 64, 3)), 0), 1) % 256).astype(np.uint8)
    return [("gradient", gradient), ("palette", palette),
            ("noise", noise), ("photo", photo)]


@pytest.mark.parametrize("name,rgb", _content_cases(),
                         ids=[c[0] for c in _content_cases()])
def test_vp8l_real_libwebp_streams_decode_exact(lib, name, rgb):
    """libwebp's own lossless encoder picks transforms (predictor tiles,
    cross-color, palettes, LZ77) our fixtures never emit — the decoded
    luma must still be pixel-exact."""
    from gnosis_ocr_spark.functions.codec_vp8l import decode_webp_gray

    riff = _lib_encode_lossless(lib, rgb)
    h, w = rgb.shape[:2]
    dw, dh, gray = decode_webp_gray(riff)
    assert (dw, dh) == (w, h)
    assert gray == _luma(rgb).tobytes()


# ----------------------------------------------------------- VP8 (lossy)


def test_vp8_real_libwebp_lossy_stream_decodes(lib):
    """A lossy stream produced by libwebp's own encoder (which enables
    SEGMENTATION and its own mode/filter decisions — paths our fixture
    writer never exercises) must decode byte-identically to libwebp's
    own WebPDecodeYUV planes."""
    lib.WebPDecodeYUV.restype = ctypes.POINTER(ctypes.c_uint8)
    lib.WebPDecodeYUV.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
    from gnosis_ocr_spark.functions.codec_vp8 import decode_vp8

    rgb = _content_cases()[3][1]  # photo-like
    h, w = rgb.shape[:2]
    rgba = np.dstack([rgb, np.full((h, w), 255, np.uint8)])
    out = ctypes.POINTER(ctypes.c_uint8)()
    n = lib.WebPEncodeRGBA(rgba.tobytes(), w, h, w * 4,
                           ctypes.c_float(90.0), ctypes.byref(out))
    assert n > 0
    riff = bytes(np.ctypeslib.as_array(out, shape=(n,)))
    pos, vp8 = 12, None
    while pos + 8 <= len(riff):
        fourcc = riff[pos:pos + 4]
        size = struct.unpack("<I", riff[pos + 4:pos + 8])[0]
        if fourcc == b"VP8 ":
            vp8 = riff[pos + 8:pos + 8 + size]
        pos += 8 + size + (size & 1)
    assert vp8 is not None

    W = ctypes.c_int()
    H = ctypes.c_int()
    uptr = ctypes.POINTER(ctypes.c_uint8)()
    vptr = ctypes.POINTER(ctypes.c_uint8)()
    stride = ctypes.c_int()
    us = ctypes.c_int()
    yptr = lib.WebPDecodeYUV(
        riff, len(riff), ctypes.byref(W), ctypes.byref(H),
        ctypes.byref(uptr), ctypes.byref(vptr),
        ctypes.byref(stride), ctypes.byref(us))
    assert yptr
    ref_y = np.ctypeslib.as_array(yptr, shape=(H.value, stride.value))[
        :, :W.value].copy()
    ref_u = np.ctypeslib.as_array(uptr, shape=((H.value + 1) // 2, us.value))[
        :, :(W.value + 1) // 2].copy()
    ref_v = np.ctypeslib.as_array(vptr, shape=((H.value + 1) // 2, us.value))[
        :, :(W.value + 1) // 2].copy()

    got = decode_vp8(vp8)
    assert got["_header"].segmentation  # the path this test exists for
    assert np.array_equal(got["y"], ref_y)
    assert np.array_equal(got["u"], ref_u)
    assert np.array_equal(got["v"], ref_v)
