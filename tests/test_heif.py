"""HEIF/AVIF metadata layer: brand sniffing, meta→ispe walk, fixture
writer, and conformance of the fixtures against the system libheif
(env-gated: conformance tests skip when the .so is absent).

Pixel decode is deliberately absent (HEVC/AV1 — see the codec_media HEIF
section header), so the certified surface is exactly what the engine
claims: media-type dispatch and primary-item dimensions/rotation."""

from __future__ import annotations

import ctypes
import os

import pytest

from gnosis_ocr_spark.functions.codec_media import (
    bmff_media_type,
    build_heif,
    build_mp4,
    ftyp_brands,
    heif_info,
)
from gnosis_ocr_spark.operators.multimodal import sniff_media_type

_LIBHEIF = "/usr/lib/x86_64-linux-gnu/libheif.so.1"


# ---------------------------------------------------------------- units


def test_ftyp_brands():
    major, brands = ftyp_brands(build_heif(8, 8))
    assert major == b"heic" and b"mif1" in brands
    with pytest.raises(ValueError):
        ftyp_brands(b"\x00" * 16)


def test_bmff_dispatch_heif_avif_mp4():
    assert bmff_media_type(build_heif(8, 8)) == "image/heif"
    assert bmff_media_type(build_heif(8, 8, brand=b"avif", codec=b"av01")) == "image/avif"
    assert bmff_media_type(build_mp4(1.5)) == "video/mp4"


def test_sniff_routes_through_brand_dispatch():
    assert sniff_media_type(build_heif(8, 8)) == "image/heif"
    assert sniff_media_type(build_heif(8, 8, brand=b"avif", codec=b"av01")) == "image/avif"
    assert sniff_media_type(build_mp4(2.0)) == "video/mp4"


def test_heif_info_fields():
    info = heif_info(build_heif(1920, 1080, rotation=180))
    assert info == {
        "major_brand": "heic",
        "codec": "hevc",
        "width": 1920,
        "height": 1080,
        "rotation": 180,
        "n_items": 1,
    }
    info = heif_info(build_heif(64, 32, brand=b"avif", codec=b"av01"))
    assert (info["codec"], info["width"], info["height"]) == ("av1", 64, 32)


def test_heif_info_rejects_meta_less_and_hostile_counts():
    with pytest.raises(ValueError):
        heif_info(build_mp4(1.0))  # no meta box
    # hostile iinf count: claim 2^31 entries in a tiny file — the bound
    # must trip before any per-entry work
    import struct

    def full(fourcc, body, ver=0):
        return struct.pack(">I", 12 + len(body)) + fourcc + bytes((ver, 0, 0, 0)) + body

    iinf = full(b"iinf", struct.pack(">I", 2**31), ver=1)
    meta = full(b"meta", iinf)
    ftyp = struct.pack(">I", 16) + b"ftyp" + b"heic" + struct.pack(">I", 0)
    with pytest.raises(ValueError, match="bound"):
        heif_info(ftyp + meta)


def test_media_metadata_heif_row(spark):
    from gnosis_ocr_spark.operators.multimodal import media_metadata

    rows = [
        ("h1", bytearray(build_heif(320, 200))),
        ("a1", bytearray(build_heif(100, 50, brand=b"avif", codec=b"av01"))),
    ]
    df = spark.createDataFrame(rows, "url string, data binary")
    out = {r.url: r for r in media_metadata(df).collect()}
    assert out["h1"].media_type == "image/heif"
    assert (out["h1"].width, out["h1"].height) == (320, 200)
    assert out["a1"].media_type == "image/avif"
    assert (out["a1"].width, out["a1"].height) == (100, 50)
    assert out["h1"].duration_sec is None


# ---------------------------------------------------------------- libheif


class _HeifError(ctypes.Structure):
    _fields_ = [
        ("code", ctypes.c_int),
        ("subcode", ctypes.c_int),
        ("message", ctypes.c_char_p),
    ]


@pytest.fixture(scope="module")
def heiflib():
    if not os.path.exists(_LIBHEIF):
        pytest.skip("system libheif not present")
    lib = ctypes.CDLL(_LIBHEIF)
    lib.heif_context_alloc.restype = ctypes.c_void_p
    lib.heif_context_read_from_memory_without_copy.restype = _HeifError
    lib.heif_context_read_from_memory_without_copy.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_size_t, ctypes.c_void_p]
    lib.heif_context_get_primary_image_handle.restype = _HeifError
    lib.heif_context_get_primary_image_handle.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_void_p)]
    for fn in ("heif_image_handle_get_width", "heif_image_handle_get_height"):
        getattr(lib, fn).restype = ctypes.c_int
        getattr(lib, fn).argtypes = [ctypes.c_void_p]
    lib.heif_context_free.argtypes = [ctypes.c_void_p]
    return lib


@pytest.mark.parametrize(
    "kw,exp",
    [
        ({}, (640, 480)),
        ({"brand": b"avif", "codec": b"av01"}, (640, 480)),
        # libheif reports POST-rotation display dims; our info keeps coded
        # dims + rotation separate — both views must agree
        ({"rotation": 90}, (480, 640)),
        ({"brand": b"avif", "codec": b"av01", "rotation": 270}, (480, 640)),
    ],
)
def test_fixture_accepted_by_libheif(heiflib, kw, exp):
    data = build_heif(640, 480, **kw)
    ctx = heiflib.heif_context_alloc()
    try:
        err = heiflib.heif_context_read_from_memory_without_copy(
            ctx, data, len(data), None)
        assert err.code == 0, err.message
        h = ctypes.c_void_p()
        err = heiflib.heif_context_get_primary_image_handle(ctx, ctypes.byref(h))
        assert err.code == 0, err.message
        got = (
            heiflib.heif_image_handle_get_width(h),
            heiflib.heif_image_handle_get_height(h),
        )
        assert got == exp
        info = heif_info(data)
        rot = kw.get("rotation", 0)
        coded = (info["width"], info["height"])
        assert info["rotation"] == rot
        assert (coded if rot % 180 == 0 else coded[::-1]) == exp
    finally:
        heiflib.heif_context_free(ctx)
