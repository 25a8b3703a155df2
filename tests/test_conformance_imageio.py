"""Cross-implementation conformance for the raster codecs against
javax.imageio in the Spark JVM — a second independent oracle next to
the libwebp one (test_conformance_webp).

Direction 1 (our encoders → ImageIO): PNG/GIF/BMP/TIFF(+compressions)
streams we write must read back pixel-exact in the JVM; our baseline
JPEG must agree with ImageIO's decode within the IDCT variance the
JPEG spec permits (±1).
Direction 2 (ImageIO writers → our decoders): real third-party
PNG/GIF/BMP/TIFF/JPEG streams (different filter/LZW/strip choices than
our own writers make) must decode pixel-exact (JPEG: ±2).

The JVM is already running for the Spark tests, so this oracle costs
one fixture; it needs no extra dependency.
"""

from __future__ import annotations

import numpy as np
import pytest


@pytest.fixture(scope="module")
def jio(spark):
    jvm = spark._jvm

    def transcode(data: bytes, fmt_out: str) -> bytes | None:
        bais = jvm.java.io.ByteArrayInputStream(bytearray(data))
        img = jvm.javax.imageio.ImageIO.read(bais)
        if img is None:
            return None
        baos = jvm.java.io.ByteArrayOutputStream()
        if not jvm.javax.imageio.ImageIO.write(img, fmt_out, baos):
            return None
        return bytes(baos.toByteArray())

    return transcode


def _gray(w, h, seed=3):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (h, w), dtype=np.uint8)


def _via_bmp(jio, data: bytes) -> tuple[int, int, bytes]:
    """ImageIO's view of any stream, extracted through BMP (raw rows —
    effectively ground truth by construction, and independently
    certified below)."""
    from gnosis_ocr_spark.functions.codec_media import decode_bmp_gray

    bmp = jio(data, "bmp")
    assert bmp is not None, "ImageIO could not read/write the stream"
    return decode_bmp_gray(bmp)


# ------------------------------------------- direction 1: ours → ImageIO


def test_our_png_gif_bmp_read_exact_by_imageio(jio):
    from gnosis_ocr_spark.functions.codec_media import (
        encode_gray_bmp,
        encode_gray_gif,
    )
    from gnosis_ocr_spark.functions.codec_png import encode_gray_png

    px = _gray(33, 24)
    for name, blob in (
            ("png", encode_gray_png(px.tobytes(), 33, 24)),
            ("gif", encode_gray_gif(px.tobytes(), 33, 24)),
            ("bmp", encode_gray_bmp(px.tobytes(), 33, 24))):
        w, h, gray = _via_bmp(jio, blob)
        assert (w, h) == (33, 24), name
        assert gray == px.tobytes(), name


def test_our_tiff_compressions_read_exact_by_imageio(jio):
    from gnosis_ocr_spark.functions.codec_tiff import encode_tiff_gray

    px = _gray(70, 41, seed=5)
    bilevel = (px > 127).astype(np.uint8) * 255
    for comp, data in (
            ("none", px), ("lzw", px), ("packbits", px),
            ("deflate", px), ("g4", bilevel)):
        kw = dict(compression=comp, rows_per_strip=16)
        if comp == "g4":
            kw["photometric"] = 0
        blob = encode_tiff_gray(data.tobytes(), 70, 41, **kw)
        w, h, gray = _via_bmp(jio, blob)
        assert (w, h) == (70, 41), comp
        assert gray == data.tobytes(), comp


def test_our_baseline_jpeg_agrees_with_imageio_within_idct_variance(jio):
    from gnosis_ocr_spark.functions.codec_jpeg import (
        decode_jpeg,
        encode_gray_jpeg,
    )

    px = _gray(48, 32, seed=7)
    blob = encode_gray_jpeg(px.tobytes(), 48, 32)
    _, _, ours = decode_jpeg(blob)[0], decode_jpeg(blob)[1], decode_jpeg(blob)[3]
    w, h, theirs = _via_bmp(jio, blob)
    assert (w, h) == (48, 32)
    d = np.abs(np.frombuffer(ours, np.uint8).astype(int)
               - np.frombuffer(theirs, np.uint8).astype(int))
    assert d.max() <= 1  # the JPEG spec's permitted IDCT variance


# ------------------------------------------- direction 2: ImageIO → ours


def test_imageio_written_streams_decode_exact(jio):
    from gnosis_ocr_spark.functions.codec_media import (
        decode_bmp_gray,
        decode_gif_gray,
        encode_gray_bmp,
    )
    from gnosis_ocr_spark.functions.codec_png import decode_png_gray
    from gnosis_ocr_spark.functions.codec_tiff import decode_tiff_gray

    px = _gray(53, 37, seed=11)
    src = encode_gray_bmp(px.tobytes(), 53, 37)
    for fmt, dec in (("png", decode_png_gray), ("gif", decode_gif_gray),
                     ("bmp", decode_bmp_gray), ("tiff", decode_tiff_gray)):
        blob = jio(src, fmt)
        assert blob is not None, fmt
        w, h, gray = dec(blob)
        assert (w, h) == (53, 37), fmt
        assert gray == px.tobytes(), fmt


def test_imageio_written_jpeg_decodes_within_tolerance(jio):
    from gnosis_ocr_spark.functions.codec_jpeg import decode_jpeg
    from gnosis_ocr_spark.functions.codec_media import encode_gray_bmp

    # smooth content: what a real crawl JPEG looks like after ImageIO's
    # default-quality quantization
    yy, xx = np.mgrid[0:40, 0:56]
    px = ((yy * 2 + xx) % 256).astype(np.uint8)
    jpg = jio(encode_gray_bmp(px.tobytes(), 56, 40), "jpg")
    assert jpg is not None
    w, h, _, ours = decode_jpeg(jpg)
    assert (w, h) == (56, 40)
    # ImageIO's own view of the same lossy stream
    _, _, theirs = _via_bmp(jio, jpg)
    d = np.abs(np.frombuffer(ours, np.uint8).astype(int)
               - np.frombuffer(theirs, np.uint8).astype(int))
    assert d.max() <= 2  # two independent IDCTs of one stream
