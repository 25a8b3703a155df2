"""CCITT Group 4 / Group 3 codec + the 1-bit scanned-PDF path (round-5
task #1): real-crawl scanned B/W documents are predominantly 1-bit
CCITT-G4 fax images — the reference rasterizes them transparently via
poppler (/root/reference/app/jobs.py:386-390); here they decode through
the from-scratch ITU-T T.6/T.4 codec (functions/codec_ccitt.py) into the
same OCR seam as every other scanned shape."""

from __future__ import annotations

import hashlib
from pathlib import Path

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from gnosis_ocr_spark.functions import codec_ccitt as C
from gnosis_ocr_spark.functions import codec_pdf as P
from gnosis_ocr_spark.functions import codec_png as G
from gnosis_ocr_spark.operators.pdf_split import _gray_pixels, _scan_png

GOLDEN = Path(__file__).parent / "golden"


def _rand_bilevel(rng: np.random.Generator, w: int, h: int) -> np.ndarray:
    """Structured-ish random bilevel page (biased run density)."""
    return rng.random((h, w)) < rng.random()


# ------------------------------------------------------------- codec core


@given(st.integers(0, 10_000), st.booleans(), st.booleans())
@settings(max_examples=60, deadline=None)
def test_g4_roundtrip_property(seed, black_is_1, byte_align):
    rng = np.random.default_rng(seed)
    w = int(rng.integers(1, 200))
    h = int(rng.integers(1, 40))
    black = _rand_bilevel(rng, w, h)
    packed = np.packbits(black if black_is_1 else ~black, axis=1).tobytes()
    enc = C.encode_g4(packed, w, h, black_is_1, byte_align)
    assert C.decode_g4(enc, w, h, black_is_1, byte_align) == packed
    if not byte_align:  # rows=0: row count comes from EOFB
        assert C.decode_g4(enc, w, 0, black_is_1) == packed


@given(st.integers(0, 10_000), st.booleans(), st.booleans())
@settings(max_examples=40, deadline=None)
def test_g3_1d_roundtrip_property(seed, black_is_1, byte_align):
    rng = np.random.default_rng(seed)
    w = int(rng.integers(1, 200))
    h = int(rng.integers(1, 30))
    black = _rand_bilevel(rng, w, h)
    packed = np.packbits(black if black_is_1 else ~black, axis=1).tobytes()
    enc = C.encode_g3_1d(packed, w, h, black_is_1, byte_align)
    assert C.decode_g3_1d(enc, w, h, black_is_1, byte_align) == packed


def test_g4_spec_goldens_hand_derived():
    """Spec-derivable bit patterns, computed BY HAND from ITU-T T.6 (not by
    running the codec) — guards against encoder+decoder agreeing on a
    shared table typo. All-white rows code as a single V0 bit (b1 = a1 =
    columns); the first all-black row codes as Horizontal + MH white-0
    (00110101) + MH black-8 (000101); EOFB = two EOLs."""
    white = np.packbits(~np.zeros((8, 8), dtype=bool), axis=1).tobytes()
    bits = "".join(f"{b:08b}" for b in C.encode_g4(white, 8, 8))
    assert bits.startswith("11111111" + "000000000001" * 2)

    blackpage = np.packbits(np.zeros((8, 8), dtype=bool), axis=1).tobytes()
    bits_b = "".join(f"{b:08b}" for b in C.encode_g4(blackpage, 8, 8))
    # row 1: 001 00110101 000101; rows 2-8: V0 (a1=b1=0), V0 (edge) = "11"
    assert bits_b.startswith("00100110101000101" + "11" * 7)

    # and the decoder accepts exactly those hand-built bits
    assert C.decode_g4(C.encode_g4(white, 8, 8), 8, 8) == white
    hand = int("00100110101000101" + "11" * 7 + "000000000001" * 2, 2)
    nbits = len("00100110101000101" + "11" * 7 + "000000000001" * 2)
    pad = (8 - nbits % 8) % 8
    hand_bytes = (hand << pad).to_bytes((nbits + pad) // 8, "big")
    assert C.decode_g4(hand_bytes, 8, 8) == blackpage


def test_mh_long_runs_cross_makeup_codes():
    """Runs > 2560 need chained makeup codes; runs landing exactly on
    makeup boundaries need the 0-length terminating code."""
    for w in (64, 128, 1728, 1729, 2560, 2561, 2624, 5000):
        black = np.zeros((2, w), dtype=bool)
        black[1, :] = True  # one all-white then one all-black row
        packed = np.packbits(~black, axis=1).tobytes()
        enc = C.encode_g4(packed, w, 2)
        assert C.decode_g4(enc, w, 2) == packed, w


def test_decoder_rejects_hostile_dimensions():
    with pytest.raises(ValueError):
        C.decode_g4(b"\xff" * 16, 0, 4)
    with pytest.raises(ValueError):
        C.decode_g4(b"\xff" * 16, 1 << 21, 4)
    with pytest.raises(ValueError):
        C.decode_g4(b"\xff" * 16, 1 << 20, 1 << 10)  # > MAX_PIXELS
    # rows=0 with a tiny-column hostile stream stays bounded (no
    # MemoryError): 64 KiB of V0 bits decodes at most MAX_PIXELS pixels
    out = C.decode_g4(b"\xff" * 65536, 8, 0)
    assert len(out) <= C.MAX_PIXELS // 8 + 8


@given(st.integers(0, 10**6), st.binary(min_size=1, max_size=400))
@settings(max_examples=80, deadline=None)
def test_mutated_g4_never_escapes_exception_contract(seed, junk):
    """Arbitrary bytes into the decoder: ValueError/clean result only —
    never RecursionError/MemoryError (the executor-killing classes)."""
    try:
        C.decode_g4(junk, 1 + seed % 300, 0)
        C.decode_g3_1d(junk, 1 + seed % 300, 0)
    except (RecursionError, MemoryError):
        raise
    except ValueError:
        pass


# ------------------------------------------------- PDF image-XObject path


PAGES = ["ccitt scanned page one\nline two", "page two body"]


@pytest.mark.parametrize(
    "variant", ["g4", "g4_black1", "g4_align", "g3_2d", "raw1", "raw1_mask"]
)
def test_bilevel_scanned_variants_extract_exact_text(variant):
    """Every bilevel writer shape — G4 (plain, /BlackIs1 + /Decode [1 0],
    /EncodedByteAlign) and raw 1-bit (plain, /ImageMask stencil) — decodes
    through extract_pages_with_images into pixels whose scan-bits matrix
    recovers the exact page text."""
    pdf = P.build_pdf_scanned(PAGES, width=128, height=128, image_filter=variant)
    win = P.extract_pages_with_images(pdf)
    assert [len(spans) for spans, _ in win] == [0, 0]
    for (spans, images), page in zip(win, PAGES):
        [img] = images
        if variant.startswith("g"):
            # r6: CCITT carries STILL-COMPRESSED through the split stage
            # (parms folded into the codec tag); decode is page-parallel
            # in _gray_pixels — certified by the pixel assertions below
            assert img.codec.startswith("ccitt;") and img.bits == 1
        else:
            assert img.codec == "raw" and img.bits == 1
        assert img.colorspace == "DeviceGray"
        png = _scan_png(images)
        assert G.decode_scan_png_text(png) == page


def test_g4_image_decodes_to_devicegray_polarity():
    """Decoded G4 samples follow the 1-bit DeviceGray convention (0 =
    black) regardless of /BlackIs1, because /Decode normalization happens
    in _image_from_obj — both writers yield identical sample bytes."""
    a = P.build_pdf_scanned(PAGES[:1], width=128, height=128, image_filter="g4")
    b = P.build_pdf_scanned(
        PAGES[:1], width=128, height=128, image_filter="g4_black1"
    )
    [( _, [ia])] = P.extract_pages_with_images(a)
    [( _, [ib])] = P.extract_pages_with_images(b)
    # r6: both carry still-compressed; the normalized polarity is
    # certified on the DECODED gray pixels (deferred decode included)
    expected = _gray_pixels(
        P.PdfImage(
            128, 128, 1, "DeviceGray", "raw",
            G.encode_scan_bits(PAGES[0], 128, 128),
        )
    )
    assert _gray_pixels(ia) == _gray_pixels(ib) == expected


def test_gray_pixels_unpacks_2_and_4_bit_depths():
    """bits=2/4 packed DeviceGray (rare but legal raw scans) scale to
    8-bit via the full-range multiplier (255 // (2^n - 1))."""
    for bits, vals, expect in (
        (2, [0, 1, 2, 3], [0, 85, 170, 255]),
        (4, [0, 5, 10, 15], [0, 85, 170, 255]),
    ):
        per_byte = 8 // bits
        packed = bytearray()
        acc = 0
        for i, v in enumerate(vals):
            acc = (acc << bits) | v
            if (i + 1) % per_byte == 0:
                packed.append(acc)
                acc = 0
        if len(vals) % per_byte:
            acc <<= bits * (per_byte - len(vals) % per_byte)
            packed.append(acc)
        img = P.PdfImage(len(vals), 1, bits, "DeviceGray", "raw", bytes(packed))
        px, w, h = _gray_pixels(img)
        assert (w, h) == (len(vals), 1)
        assert list(px) == expect


def test_k_positive_mixed_g3_decodes_and_mislabel_degrades_clean():
    """/K > 0 (mixed 2-D G3, T.4 §4.2.1) decodes in-engine now; a stream
    whose bits don't actually carry EOL+tag lines (G4 bits mislabeled
    /K 1) must degrade to a clean no-image page — never garbage text,
    never a crash."""
    pdf = P.build_pdf_scanned(
        PAGES[:1], width=128, height=128, image_filter="g3_2d"
    )
    [(spans, images)] = P.extract_pages_with_images(pdf)
    [img] = images
    assert img.codec.startswith("ccitt;k=4") and img.bits == 1
    assert G.decode_scan_png_text(_scan_png(images)) == PAGES[0]

    bad = P.build_pdf_scanned(PAGES[:1], width=128, height=128, image_filter="g4")
    bad = bad.replace(b"/K -1", b"/K 1\x20")
    [(spans_b, images_b)] = P.extract_pages_with_images(bad)
    # r6: the mislabeled stream carries deferred; the decoder raises in
    # the page-parallel stage instead → same honest degradation (blank
    # page, empty text), just at the stage that owns heavy decode now
    [img_b] = images_b
    assert img_b.codec.startswith("ccitt;k=1")
    assert _scan_png(images_b) is None  # honest degradation: empty text


@given(st.integers(0, 10_000), st.booleans(), st.booleans(),
       st.integers(1, 8))
@settings(max_examples=60, deadline=None)
def test_g3_2d_roundtrip_property(seed, black_is_1, byte_align, k):
    """K>0 mixed-mode roundtrip across 1-D/2-D line mixes (k=1 -> all 1-D,
    k large -> mostly 2-D), both polarities, both alignments, and rows=0
    RTC termination."""
    rng = np.random.default_rng(seed)
    w = int(rng.integers(1, 200))
    h = int(rng.integers(1, 30))
    black = _rand_bilevel(rng, w, h)
    packed = np.packbits(black if black_is_1 else ~black, axis=1).tobytes()
    enc = C.encode_g3_2d(packed, w, h, black_is_1, byte_align, k=k)
    assert C.decode_g3_2d(enc, w, h, black_is_1, byte_align) == packed
    # rows=0: row count recovered from RTC
    assert C.decode_g3_2d(enc, w, 0, black_is_1, byte_align) == packed


def test_g3_2d_spec_bits_hand_derived():
    """Hand-derived from ITU-T T.4 §4.2.1: each line = EOL (000000000001)
    + tag (1 = 1-D). An all-white 8x2 image with k=1: line 1 = EOL+1 +
    MH white-8 (10011); RTC = six EOL+1."""
    white = np.packbits(~np.zeros((2, 8), dtype=bool), axis=1).tobytes()
    bits = "".join(f"{b:08b}" for b in C.encode_g3_2d(white, 8, 2, k=1))
    line = "000000000001" + "1" + "10011"
    assert bits.startswith(line + line + ("000000000001" + "1") * 6)
    # k=2: second line is 2-D coded -> EOL+0 + V0 (all-white vs all-white)
    bits2 = "".join(f"{b:08b}" for b in C.encode_g3_2d(white, 8, 2, k=2))
    assert bits2.startswith(line + "000000000001" + "0" + "1")


@given(st.integers(0, 10**6), st.binary(min_size=1, max_size=400))
@settings(max_examples=60, deadline=None)
def test_mutated_g3_2d_never_escapes_exception_contract(seed, junk):
    try:
        C.decode_g3_2d(junk, 1 + seed % 300, 0)
    except (RecursionError, MemoryError):
        raise
    except ValueError:
        pass


def test_frozen_g4_golden_extracts_end_to_end(spark):
    """Byte-frozen G4-only PDF (sha256-pinned) through the production
    fused split→OCR Spark path extracts non-empty byte-pinned text — the
    round-4 VERDICT task #1 done-criterion."""
    from gnosis_ocr_spark.operators.layout import assemble_documents
    from gnosis_ocr_spark.operators.pdf_split import (
        raster_ocr_pages,
        split_pdf_text_pages,
    )

    pdf = (GOLDEN / "scanned_g4.pdf").read_bytes()
    assert hashlib.sha256(pdf).hexdigest() == (
        "739a4a3d181ffee10af044d70b5a955142244c128cbc6def239f6e0b5c50e867"
    )
    pages = ["ccitt group four page\nline two here", "second scanned page"]
    df = spark.createDataFrame(
        [("g4", bytearray(pdf))], schema="url string, html binary"
    )
    out = assemble_documents(
        raster_ocr_pages(split_pdf_text_pages(df), ocr_engine="stub")
    ).collect()
    assert out[0]["extracted_text"] == "\n\n".join(pages)
    assert out[0]["n_pages"] == 2


def test_scan_bits_capacity_guard_and_non_scan_none():
    with pytest.raises(ValueError, match="does not fit"):
        G.encode_scan_bits("x" * 3000, 128, 128)
    assert G.decode_scan_bits_gray(b"\x00" * 4096) is None
    assert G.decode_scan_bits_gray(b"\xff" * 4096) is None


def test_inline_image_scanned_page_extracts(spark):
    """BI/ID/EI inline images (PDF §8.9.7, abbreviated keys) — the no-
    XObject scanned shape — decode through the shared image core into the
    OCR seam, including through the full Spark fused path."""
    from gnosis_ocr_spark.operators.layout import assemble_documents
    from gnosis_ocr_spark.operators.pdf_split import (
        raster_ocr_pages,
        split_pdf_text_pages,
    )

    pages = ["inline scanned body\nline two", "tail page"]
    pdf = P.build_pdf_scanned(pages, image_filter="inline")
    win = P.extract_pages_with_images(pdf)
    for (spans, images), page in zip(win, pages):
        assert not spans
        [img] = images
        assert (img.codec, img.bits, img.colorspace) == ("raw", 8, "DeviceGray")
        assert G.decode_scan_png_text(_scan_png(images)) == page
    df = spark.createDataFrame(
        [("inl", bytearray(pdf))], schema="url string, html binary"
    )
    out = assemble_documents(
        raster_ocr_pages(split_pdf_text_pages(df), ocr_engine="stub")
    ).collect()
    assert out[0]["extracted_text"] == "\n\n".join(pages)
    assert out[0]["n_pages"] == 2


def test_inline_and_xobject_images_merge_in_draw_order():
    """A page drawing an inline strip BEFORE an XObject strip must yield
    both images in that order (strip stacking depends on it)."""
    import zlib

    base = P.build_pdf_scanned(["xobject strip"], width=64, height=64)
    payload = zlib.compress(G.encode_scan_pixels("inline strip", 64, 64), 6)
    inline = b"BI /W 64 /H 64 /CS /G /BPC 8 /F /Fl ID\n" + payload + b"\nEI\n"
    old = b"q 612 0 0 792 0 0 cm /Im Do Q"
    new = b"q 612 0 0 792 0 0 cm\n" + inline + b"/Im Do Q"
    patched = base.replace(old, new).replace(
        b"<< /Length %d >>" % len(old), b"<< /Length %d >>" % len(new)
    )
    [(spans, imgs)] = P.extract_pages_with_images(patched)
    assert len(imgs) == 2
    assert G.decode_scan_text(imgs[0].data) == "inline strip"
    assert G.decode_scan_text(imgs[1].data) == "xobject strip"


def test_text_page_with_inline_image_keeps_text_layer():
    """A page with BOTH a text layer and an inline image stays on the
    authoritative text path (images only matter when spans are empty) and
    the BI..EI blob never corrupts token parsing."""
    import zlib

    base = P.build_pdf(["real text line"], compress=False)
    payload = zlib.compress(G.encode_scan_pixels("decoy", 64, 64), 6)
    inline = b"q BI /W 64 /H 64 /CS /G /BPC 8 /F /Fl ID\n" + payload + b"\nEI Q\n"
    import re as _re

    m = _re.search(rb"<< /Length (\d+) >>\nstream\n(.*?)\nendstream", base, _re.S)
    content = inline + m.group(2)
    pdf = base.replace(
        m.group(0),
        b"<< /Length %d >>\nstream\n%s\nendstream" % (len(content), content),
    )
    [(spans, imgs)] = P.extract_pages_with_images(pdf)
    assert P.page_text(spans) == "real text line"
    assert imgs == []


def test_g4_byte_align_unknown_rows_terminates_at_eofb():
    """EncodedByteAlign + rows=0: EOFB sits UNALIGNED right after the last
    row; aligning before the check swallowed its lead bits and raised
    (review repro). The unaligned check requires the full 24-bit EOFB so
    pad zeros + a 0001-prefixed row code can't false-match."""
    import numpy as np

    rng = np.random.default_rng(7)
    for w, h in ((40, 6), (63, 9), (8, 1)):
        img = rng.random((h, w)) < 0.35
        packed = np.packbits(~img, axis=1).tobytes()
        enc = C.encode_g4(packed, w, h, byte_align=True)
        assert C.decode_g4(enc, w, 0, byte_align=True) == packed, (w, h)


def test_g3_1d_fill_bits_before_eol():
    """T.4 §4.1.2 FILL: zero bits padding each EOL to a byte boundary (the
    TIFF byte-aligned-EOL shape) must be consumed, not fed to the run
    decoder (review repro: 'bad run code')."""
    import numpy as np

    rng = np.random.default_rng(8)
    img = rng.random((6, 40)) < 0.3
    packed = np.packbits(~img, axis=1).tobytes()
    enc = C.encode_g3_1d(packed, 40, 6, eol=True, byte_align=True)
    assert C.decode_g3_1d(enc, 40, 6) == packed
