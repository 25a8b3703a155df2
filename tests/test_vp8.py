"""VP8 (lossy WebP) codec tests — RFC 6386 key frames.

Certification layers:
1. Self-contained round-trips: decode(encode(x)) == the encoder's own
   reconstruction (computed through the shared inverse/predict/filter
   path), across all intra modes, submodes, both loop filters, odd
   dimensions and the full qindex range.
2. Conformance (env-gated on the system libwebp): the SAME streams
   decode byte-identically in libwebp, and a real libwebp-encoded
   stream (CPython test data) decodes byte-identically here.  An
   arithmetic decoder with any wrong probability table desyncs rather
   than self-correcting, so these exact-match checks certify the
   transcribed RFC tables end to end.
"""

from __future__ import annotations

import ctypes
import ctypes.util
import random
import struct

import numpy as np
import pytest

import gnosis_ocr_spark.functions.codec_vp8 as V


# --------------------------------------------------------- bool coder


def test_bool_coder_roundtrip_fuzz():
    rng = random.Random(7)
    for _ in range(40):
        seq = [(rng.randint(1, 254), rng.randint(0, 1))
               for _ in range(rng.randint(1, 500))]
        be = V.BoolEncoder()
        for p, b in seq:
            be.bool(p, b)
        bd = V.BoolDecoder(be.finish())
        for p, b in seq:
            assert bd.bool(p) == b


def test_bool_literals_and_trees():
    be = V.BoolEncoder()
    be.literal(0x2A, 7)
    be.signed_literal(-13, 6)
    be.flag_signed(0, 4)
    be.flag_signed(5, 4)
    bd = V.BoolDecoder(be.finish())
    assert bd.literal(7) == 0x2A
    assert bd.signed_literal(6) == -13
    assert bd.flag_signed(4) == 0
    assert bd.flag_signed(4) == 5


# --------------------------------------------------------- tables


def test_probability_tables_shape_and_range():
    for t, shape in ((V.DEFAULT_COEF_PROBS, (4, 8, 3, 11)),
                     (V.COEF_UPDATE_PROBS, (4, 8, 3, 11))):
        arr = np.array(t)
        assert arr.shape == shape
        assert arr.min() >= 1 and arr.max() <= 255
    kbm = np.array(V.KF_BMODE_PROBS)
    assert kbm.shape == (10, 10, 9)
    assert kbm.min() >= 1 and kbm.max() <= 255
    assert len(V.DC_QLOOKUP) == 128 and len(V.AC_QLOOKUP) == 128


# --------------------------------------------------------- round-trips


def _rt(y, u=None, v=None, **kw):
    frame, recon = V.encode_vp8(y, u, v, **kw)
    out = V.decode_vp8(frame)
    assert np.array_equal(out["y"], recon["y"])
    assert np.array_equal(out["u"], recon["u"])
    assert np.array_equal(out["v"], recon["v"])
    return frame, recon


def test_roundtrip_flat_and_gradient():
    _rt(np.full((32, 48), 100, np.uint8), qindex=40)
    yy, xx = np.mgrid[0:48, 0:64]
    frame, recon = _rt(((yy * 3 + xx * 2) % 256).astype(np.uint8), qindex=12)
    # low-q reconstruction stays close to the source
    y = ((yy * 3 + xx * 2) % 256).astype(np.uint8)
    assert np.abs(recon["y"].astype(int) - y.astype(int)).mean() < 3


def test_roundtrip_noise_all_qindexes():
    rng = np.random.default_rng(42)
    y = rng.integers(0, 256, (64, 80), dtype=np.uint8)
    u = rng.integers(0, 256, (32, 40), dtype=np.uint8)
    v = rng.integers(0, 256, (32, 40), dtype=np.uint8)
    for qi in (0, 12, 40, 90, 127):
        _rt(y, u, v, qindex=qi)


def test_roundtrip_all_modes_and_submodes():
    mbh, mbw = 4, 5
    ymodes = np.array([[(r * 5 + c) % 5 for c in range(mbw)]
                       for r in range(mbh)], np.int8)
    bm = np.zeros((mbh, mbw, 16), np.int8)
    for r in range(mbh):
        for c in range(mbw):
            for sb in range(16):
                bm[r, c, sb] = (r * 53 + c * 17 + sb) % 10
    yy, xx = np.mgrid[0:mbh * 16, 0:mbw * 16]
    y = ((yy * 7 ^ xx * 3) % 256).astype(np.uint8)
    _rt(y, qindex=20, ymodes=ymodes, bmodes=bm)


def test_roundtrip_odd_dims_and_no_skip():
    rng = np.random.default_rng(1)
    y = rng.integers(0, 256, (37, 53), dtype=np.uint8)
    u = rng.integers(0, 256, (19, 27), dtype=np.uint8)
    v = rng.integers(0, 256, (19, 27), dtype=np.uint8)
    _rt(y, u, v, qindex=30)
    _rt(np.full((16, 16), 128, np.uint8), qindex=50, use_skip=False)


def test_roundtrip_loop_filters():
    yy, xx = np.mgrid[0:48, 0:48]
    y = ((yy // 8 * 40 + xx // 8 * 25) % 256).astype(np.uint8)
    for ft, lvl, sh in ((0, 30, 0), (0, 63, 3), (0, 12, 5), (1, 20, 0)):
        _rt(y, qindex=60, filter_level=lvl, filter_type=ft, sharpness=sh)


# --------------------------------------------------------- container


def test_webp_container_gray_and_rgb_fixture():
    from gnosis_ocr_spark.functions.codec_vp8l import decode_webp_gray

    yy, xx = np.mgrid[0:24, 0:40]
    rgb = np.stack([(yy * 9) % 256, (xx * 5) % 256,
                    ((yy + xx) * 3) % 256], axis=-1).astype(np.uint8)
    y, u, v = V.rgb_to_yuv420(rgb)
    riff, recon = V.build_webp_lossy(y, u, v, qindex=8)
    w, h, gray = decode_webp_gray(riff)
    assert (w, h) == (40, 24)
    assert gray == recon["y"].tobytes()


def test_scan_matrix_survives_q0():
    from gnosis_ocr_spark.functions.codec_png import (
        decode_scan_text_robust,
        encode_scan_pixels_robust,
    )

    text = "lossy webp carries the robust scan matrix end to end"
    px = encode_scan_pixels_robust(text, 64, 64)
    y = np.frombuffer(px, np.uint8).reshape(64, 64)
    _, recon = V.encode_vp8(y, qindex=0)
    assert decode_scan_text_robust(recon["y"].tobytes()) == text


# --------------------------------------------------------- hostile input


def test_hostile_inputs_raise():
    with pytest.raises(V.Vp8Error):
        V.decode_vp8(b"\x00" * 4)
    with pytest.raises(V.Vp8Error, match="interframe"):
        V.decode_vp8(b"\x01\x00\x00" + b"\x9d\x01\x2a" + b"\x00" * 8)
    with pytest.raises(V.Vp8Error, match="start code"):
        V.decode_vp8(b"\x00\x00\x00" + b"\xff\xff\xff" + b"\x00" * 8)
    # dims exceeding MAX_PIXELS (hostile header, tiny body)
    big = struct.pack("<HH", 0x3FFF, 0x3FFF)
    with pytest.raises(V.Vp8Error, match="MAX_PIXELS"):
        V.decode_vp8(b"\x00\x80\x00" + b"\x9d\x01\x2a" + big + b"\x00" * 64)
    # truncated first partition
    frame, _ = V.encode_vp8(np.full((16, 16), 50, np.uint8), qindex=20)
    with pytest.raises(V.Vp8Error):
        V.decode_vp8(frame[:8])


# --------------------------------------------------------- conformance

_LIBWEBP = "/usr/lib/x86_64-linux-gnu/libwebp.so.7"


def _libwebp_yuv(vp8_frame: bytes):
    lib = ctypes.CDLL(_LIBWEBP)
    lib.WebPDecodeYUV.restype = ctypes.POINTER(ctypes.c_uint8)
    lib.WebPDecodeYUV.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
    chunk = b"VP8 " + struct.pack("<I", len(vp8_frame)) + vp8_frame
    if len(vp8_frame) & 1:
        chunk += b"\x00"
    riff = b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk
    w = ctypes.c_int()
    h = ctypes.c_int()
    uptr = ctypes.POINTER(ctypes.c_uint8)()
    vptr = ctypes.POINTER(ctypes.c_uint8)()
    stride = ctypes.c_int()
    us = ctypes.c_int()
    yptr = lib.WebPDecodeYUV(
        riff, len(riff), ctypes.byref(w), ctypes.byref(h),
        ctypes.byref(uptr), ctypes.byref(vptr),
        ctypes.byref(stride), ctypes.byref(us))
    if not yptr:
        return None
    W, H, S, US = w.value, h.value, stride.value, us.value
    y = np.ctypeslib.as_array(yptr, shape=(H, S))[:, :W].copy()
    u = np.ctypeslib.as_array(uptr, shape=((H + 1) // 2, US))[
        :, :(W + 1) // 2].copy()
    v = np.ctypeslib.as_array(vptr, shape=((H + 1) // 2, US))[
        :, :(W + 1) // 2].copy()
    return y, u, v


libwebp_missing = not __import__("os").path.exists(_LIBWEBP)


@pytest.mark.skipif(libwebp_missing, reason="system libwebp not present")
def test_conformance_fixtures_vs_libwebp():
    """Our encoder's streams decode byte-identically in libwebp —
    certifying bitstream validity AND that our decoder (which matches
    our encoder by the round-trip tests) matches libwebp."""
    rng = np.random.default_rng(3)
    for _ in range(6):
        mbh, mbw = int(rng.integers(1, 4)), int(rng.integers(1, 4))
        ym = rng.integers(0, 5, (mbh, mbw)).astype(np.int8)
        bm = rng.integers(0, 10, (mbh, mbw, 16)).astype(np.int8)
        h = mbh * 16 - int(rng.integers(0, 12))
        w = mbw * 16 - int(rng.integers(0, 12))
        y = rng.integers(0, 256, (h, w), dtype=np.uint8)
        u = rng.integers(0, 256, ((h + 1) // 2, (w + 1) // 2), dtype=np.uint8)
        v = rng.integers(0, 256, ((h + 1) // 2, (w + 1) // 2), dtype=np.uint8)
        qi = int(rng.integers(0, 128))
        lvl = int(rng.integers(0, 64))
        sh = int(rng.integers(0, 8))
        ft = int(rng.integers(0, 2))
        frame, recon = V.encode_vp8(
            y, u, v, qindex=qi, ymodes=ym, bmodes=bm,
            filter_level=lvl, sharpness=sh, filter_type=ft)
        ref = _libwebp_yuv(frame)
        assert ref is not None, "libwebp refused our stream"
        ry, ru, rv = ref
        assert np.array_equal(ry, recon["y"])
        assert np.array_equal(ru, recon["u"])
        assert np.array_equal(rv, recon["v"])


_REAL_WEBP = ("/root/.pyenv/versions/3.13.0/lib/python3.13/test/"
              "test_email/data/python.webp")


@pytest.mark.skipif(
    not __import__("os").path.exists(_REAL_WEBP),
    reason="CPython test-data webp not present")
def test_real_libwebp_stream_decodes():
    """A genuinely libwebp-encoded key frame (CPython's PSF-licensed
    test image) decodes cleanly: every partition consumed to within the
    flush tail, and — when the system libwebp is present — every plane
    byte-identical to its own decode."""
    data = open(_REAL_WEBP, "rb").read()
    pos, vp8 = 12, None
    while pos + 8 <= len(data):
        fourcc = data[pos:pos + 4]
        size = struct.unpack("<I", data[pos + 4:pos + 8])[0]
        if fourcc == b"VP8 ":
            vp8 = data[pos + 8:pos + 8 + size]
        pos += 8 + size + (size & 1)
    assert vp8 is not None
    out = V.decode_vp8(vp8)
    assert (out["width"], out["height"]) == (16, 16)
    assert out["_diag"]["first_part_slack"] <= 4
    assert all(s <= 4 for s in out["_diag"]["token_slack"])
    if not libwebp_missing:
        ry, ru, rv = _libwebp_yuv(vp8)
        assert np.array_equal(out["y"], ry)
        assert np.array_equal(out["u"], ru)
        assert np.array_equal(out["v"], rv)
