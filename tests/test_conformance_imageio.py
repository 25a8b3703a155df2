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


@pytest.fixture(scope="module")
def jio_write(spark):
    """ImageIO writer with explicit ImageWriteParam control — lets the
    conformance tests request the JDK's OWN CCITT fax encoders and its
    progressive-JPEG progression script, which the plain ImageIO.write
    path never emits."""
    jvm = spark._jvm

    def write(data: bytes, fmt: str, compression: str | None = None,
              progressive: bool = False, bilevel: bool = False):
        bais = jvm.java.io.ByteArrayInputStream(bytearray(data))
        img = jvm.javax.imageio.ImageIO.read(bais)
        if img is None:
            return None
        if bilevel:
            # CCITT requires TYPE_BYTE_BINARY (=12); feed 0/255 sources so
            # the redraw is an exact binarization, never a dither.
            bi = jvm.java.awt.image.BufferedImage(
                img.getWidth(), img.getHeight(), 12)
            g = bi.getGraphics()
            g.drawImage(img, 0, 0, None)
            g.dispose()
            img = bi
        it = jvm.javax.imageio.ImageIO.getImageWritersByFormatName(fmt)
        if not it.hasNext():
            return None
        writer = it.next()
        param = writer.getDefaultWriteParam()
        if compression is not None:
            param.setCompressionMode(2)  # ImageWriteParam.MODE_EXPLICIT
            param.setCompressionType(compression)
        if progressive:
            param.setProgressiveMode(3)  # ImageWriteParam.MODE_DEFAULT
        baos = jvm.java.io.ByteArrayOutputStream()
        ios = jvm.javax.imageio.ImageIO.createImageOutputStream(baos)
        writer.setOutput(ios)
        writer.write(None, jvm.javax.imageio.IIOImage(img, None, None),
                     param)
        ios.close()
        writer.dispose()
        return bytes(baos.toByteArray())

    return write


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


def test_imageio_written_ccitt_tiffs_decode_exact(jio_write):
    """Direction 2 for the fax codecs: the JDK TIFF writer's OWN CCITT
    encoders ('CCITT T.6' = G4 MMR, 'CCITT T.4' = G3, 'CCITT RLE' = MH
    byte-aligned) produce real third-party streams — different V/H/P mode
    and run-length choices than codec_ccitt's encoder makes — that our
    decoder must reproduce bit-exactly. This is the cross-implementation
    check the self-round-trips cannot provide (an encoder/decoder pair
    that agrees with itself on a wrong table round-trips forever)."""
    from gnosis_ocr_spark.functions.codec_media import encode_gray_bmp
    from gnosis_ocr_spark.functions.codec_tiff import decode_tiff_gray

    rng = np.random.default_rng(13)
    # speckle + runs: exercises short runs, long runs, and row transitions
    px = (rng.random((44, 61)) < 0.3).astype(np.uint8) * 255
    px[10:14, :] = 255  # all-white band (pass modes / makeup runs)
    px[20:22, :] = 0    # all-black band
    src = encode_gray_bmp(px.tobytes(), 61, 44)
    for comp in ("CCITT T.6", "CCITT T.4", "CCITT RLE"):
        blob = jio_write(src, "tiff", compression=comp, bilevel=True)
        assert blob is not None, comp
        w, h, gray = decode_tiff_gray(blob)
        assert (w, h) == (61, 44), comp
        assert gray == px.tobytes(), comp


def test_our_g3_tiffs_read_exact_by_imageio(jio):
    """Direction 1 for the G3 variants (the existing direction-1 TIFF test
    covers G4 only): our T.4 1-D, byte-aligned RLE, and 2-D encodings must
    read back exactly in the JDK TIFF reader."""
    from gnosis_ocr_spark.functions.codec_tiff import encode_tiff_gray

    rng = np.random.default_rng(17)
    px = (rng.random((38, 53)) < 0.4).astype(np.uint8) * 255
    for comp in ("g3", "g3_2d", "rle"):
        blob = encode_tiff_gray(px.tobytes(), 53, 38, compression=comp,
                                photometric=0, rows_per_strip=16)
        w, h, gray = _via_bmp(jio, blob)
        assert (w, h) == (53, 38), comp
        assert gray == px.tobytes(), comp


def test_imageio_written_progressive_jpeg_decodes_within_tolerance(
        jio, jio_write):
    """Direction 2 for progressive JPEG: the JDK writer's MODE_DEFAULT
    progression script (its own spectral-selection/successive-approximation
    scan split, not our fixture writer's) must decode through our SOF2 path
    within the two-independent-IDCTs tolerance of ImageIO's own view."""
    from gnosis_ocr_spark.functions.codec_jpeg import decode_jpeg
    from gnosis_ocr_spark.functions.codec_media import encode_gray_bmp

    yy, xx = np.mgrid[0:48, 0:64]
    px = (((yy * 3 + xx) // 2) % 256).astype(np.uint8)
    jpg = jio_write(encode_gray_bmp(px.tobytes(), 64, 48), "jpg",
                    progressive=True)
    assert jpg is not None
    assert b"\xff\xc2" in jpg  # really SOF2 — the param took effect
    w, h, _, ours = decode_jpeg(jpg)
    assert (w, h) == (64, 48)
    _, _, theirs = _via_bmp(jio, jpg)
    d = np.abs(np.frombuffer(ours, np.uint8).astype(int)
               - np.frombuffer(theirs, np.uint8).astype(int))
    assert d.max() <= 2


def test_our_progressive_jpeg_read_by_imageio_within_tolerance(jio):
    """Direction 1 for progressive JPEG: our SOF2 fixture writer's streams
    must be valid as judged by the JDK's progressive decoder."""
    from gnosis_ocr_spark.functions.codec_jpeg import (
        decode_jpeg,
        encode_gray_jpeg_progressive,
    )

    px = _gray(56, 40, seed=23)
    blob = encode_gray_jpeg_progressive(px.tobytes(), 56, 40)
    assert b"\xff\xc2" in blob
    w, h, theirs = _via_bmp(jio, blob)
    assert (w, h) == (56, 40)
    _, _, _, ours = decode_jpeg(blob)
    d = np.abs(np.frombuffer(ours, np.uint8).astype(int)
               - np.frombuffer(theirs, np.uint8).astype(int))
    assert d.max() <= 2


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
