"""JBIG2 (ITU-T T.88) generic-region codec + the scanned-PDF path: the
other dominant real-crawl scanned-B/W encoding next to CCITT G4 — the
reference rasterizes those pages transparently via poppler
(/root/reference/app/jobs.py:386-390); here they decode through the
from-scratch MQ arithmetic coder and generic-region decoder
(functions/codec_jbig2.py) into the same OCR seam as every other scanned
shape."""

from __future__ import annotations

import hashlib
import random
import struct
from pathlib import Path

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from gnosis_ocr_spark.functions import codec_jbig2 as J
from gnosis_ocr_spark.functions import codec_pdf as P
from gnosis_ocr_spark.functions import codec_png as G
from gnosis_ocr_spark.operators.pdf_split import _scan_png

GOLDEN = Path(__file__).parent / "golden"


# ------------------------------------------------------------- MQ coder


@given(st.integers(0, 10_000))
@settings(max_examples=60, deadline=None)
def test_mq_coder_roundtrip_property(seed):
    """Encoder → decoder identity over random bit/context streams: the
    coder pair is self-consistent for any context mix, including the
    marker-byte (0xFF) stuffing and carry paths."""
    rng = random.Random(seed)
    n_ctx = rng.choice([1, 2, 16, 1 << 13])
    n = rng.randint(1, 4000)
    # biased streams exercise long MPS runs (the carry-heavy shape)
    bias = rng.choice([0.02, 0.5, 0.98])
    bits = [1 if rng.random() < bias else 0 for _ in range(n)]
    cxs = [rng.randrange(n_ctx) for _ in range(n)]
    enc = J._MQEncoder()
    st_e = bytearray(n_ctx)
    for cx, b in zip(cxs, bits):
        enc.encode(st_e, cx, b)
    data = enc.flush()
    dec = J._MQDecoder(data)
    st_d = bytearray(n_ctx)
    assert [dec.decode(st_d, cx) for cx in cxs] == bits


def test_mq_decoder_survives_empty_and_truncated_streams():
    """Reads past the end feed 1-bits (spec marker convention) — no index
    errors, and output stays 0/1."""
    for data in (b"", b"\x00", b"\xff", b"\xff\xff", b"\x5a"):
        dec = J._MQDecoder(data)
        states = bytearray(16)
        out = {dec.decode(states, i % 16) for i in range(200)}
        assert out <= {0, 1}


# ------------------------------------------------------ generic regions


@given(st.integers(0, 10_000))
@settings(max_examples=40, deadline=None)
def test_generic_region_roundtrip_property(seed):
    """encode → embedded stream → decode identity across all four GB
    templates, TPGDON on/off, and varied densities/dimensions."""
    rng = np.random.default_rng(seed)
    w = int(rng.integers(1, 150))
    h = int(rng.integers(1, 40))
    density = float(rng.choice([0.02, 0.3, 0.7, 0.98]))
    black = rng.random((h, w)) < density
    packed = np.packbits(~black, axis=1).tobytes()  # PDF 0 = black
    template = int(rng.integers(0, 4))
    tpgdon = bool(rng.integers(0, 2))
    blob = J.encode_jbig2_generic(
        packed, w, h, template=template, tpgdon=tpgdon
    )
    assert J.decode_jbig2(blob) == (w, h, packed)


def test_generic_region_custom_at_pixels_roundtrip():
    """Non-nominal AT positions force the generic (slot-ordered) context
    path on both sides; the pair must still be the identity."""
    rng = np.random.default_rng(5)
    black = rng.random((30, 70)) < 0.4
    packed = np.packbits(~black, axis=1).tobytes()
    at0 = ((1, -1), (-1, -1), (1, -2), (-1, -2))  # template 0: 4 AT pixels
    blob = J.encode_jbig2_generic(packed, 70, 30, template=0, at=at0)
    assert J.decode_jbig2(blob) == (70, 30, packed)
    at1 = ((-4, -1),)
    blob = J.encode_jbig2_generic(packed, 70, 30, template=2, at=at1)
    assert J.decode_jbig2(blob) == (70, 30, packed)


def test_mmr_variant_roundtrip_reuses_t6_coder():
    rng = np.random.default_rng(9)
    black = rng.random((40, 130)) < 0.2
    packed = np.packbits(~black, axis=1).tobytes()
    blob = J.encode_jbig2_generic(packed, 130, 40, mmr=True)
    assert J.decode_jbig2(blob) == (130, 40, packed)


def test_tpgdon_compresses_repeated_rows():
    """Typical prediction must actually fire: a tall region of identical
    noisy rows with TPGDON codes each duplicate row as ONE decision, so
    the stream beats the TPGDON-off coding of the same bitmap (the margin
    is modest — MQ context adaptation already models vertical repeats)."""
    rng = np.random.default_rng(3)
    row = rng.random((1, 96)) < 0.5
    black = np.repeat(row, 200, axis=0)
    packed = np.packbits(~black, axis=1).tobytes()
    with_tp = J.encode_jbig2_generic(packed, 96, 200, tpgdon=True)
    without = J.encode_jbig2_generic(packed, 96, 200, tpgdon=False)
    assert J.decode_jbig2(with_tp) == (96, 200, packed)
    assert len(with_tp) < len(without) * 0.8


def test_at_pixel_referencing_undecoded_area_rejected():
    with pytest.raises(ValueError, match="undecoded"):
        J.encode_jbig2_generic(b"\x00" * 8, 8, 8, at=((0, 0), (-3, -1), (2, -2), (-2, -2)))


def test_hostile_dimensions_rejected_before_allocation():
    """A crafted header declaring a giant region must raise, never
    MemoryError an executor (codec_jpeg MAX_PIXELS rationale)."""
    region_info = struct.pack(">IIIIB", 1 << 16, 1 << 16, 0, 0, 0)
    body = region_info + b"\x00" + b"\x03\xff\xfd\xfe\x02\xfe\xfe" + b"\x00" * 8
    blob = (
        J._seg_header(0, J._SEG_GENERIC_IMMEDIATE_LOSSLESS, 1, len(body))
        + body
    )
    with pytest.raises(ValueError):
        J.decode_jbig2(blob)


@given(st.integers(0, 10_000), st.binary(max_size=300))
@settings(max_examples=60, deadline=None)
def test_mutated_stream_never_escapes_exception_contract(seed, junk):
    """Arbitrary bytes into the embedded-stream decoder: ValueError/clean
    result only — never RecursionError/MemoryError (the executor-killing
    classes). Mutations of a valid stream follow the same contract."""
    rng = random.Random(seed)
    base = bytearray(
        J.encode_jbig2_generic(bytes(64), 16, 32, tpgdon=bool(seed % 2))
    )
    for _ in range(rng.randint(1, 6)):
        base[rng.randrange(len(base))] = rng.randrange(256)
    for data in (junk, bytes(base)):
        try:
            J.decode_jbig2(data)
        except (RecursionError, MemoryError):
            raise
        except ValueError:
            pass


def test_unsupported_subsets_carry_opaque():
    """The still-unsupported JBIG2 subsets — halftone/refinement segments
    and the Huffman-coded variants — degrade exactly like JPX: ValueError
    from the codec, opaque carry from codec_pdf, never garbage. An
    unresolvable /JBIG2Globals reference (no object map at the call site)
    short-circuits the same way."""
    # a pattern-dictionary segment (type 16) ahead of anything else
    pat = J._seg_header(0, 16, 1, 4) + b"\x00\x00\x00\x00"
    with pytest.raises(ValueError, match="unsupported"):
        J.decode_jbig2(pat)
    # Huffman symbol dictionary (SDHUFF flag) and a text region that
    # references it: both reject before any MQ decoding
    huff_sd = J._seg_header(1, 0, 1, 12) + struct.pack(
        ">H", 0x0001
    ) + b"\x00" * 10
    with pytest.raises(ValueError, match="Huffman"):
        J.decode_jbig2(huff_sd)
    from gnosis_ocr_spark.functions.codec_pdf import _apply_one_filter

    assert _apply_one_filter(b"JBIG2Decode", b"", bytes(pat)) is None
    valid = J.encode_jbig2_generic(bytes(64), 16, 32)
    # globals ref with no resolver (content-stream path) → opaque carry
    assert _apply_one_filter(
        b"JBIG2Decode", b"<< /JBIG2Globals 9 0 R >>", valid
    ) is None
    # and the supported path decodes through the same dispatch
    assert _apply_one_filter(b"JBIG2Decode", b"", valid) == bytes(64)


# ------------------------------------------------------- symbol coding


@given(st.integers(0, 10_000))
@settings(max_examples=25, deadline=None)
def test_symbol_mode_roundtrip_property(seed):
    """encode_jbig2_symbol → decode_jbig2 identity: the page re-tiles into
    a symbol dictionary + text region (the jbig2enc shape) and the decoder
    reassembles it bit-exactly, inline-dictionary and /JBIG2Globals
    layouts alike."""
    rng = np.random.default_rng(seed)
    w = int(rng.integers(1, 150))
    h = int(rng.integers(1, 80))
    density = float(rng.choice([0.0, 0.05, 0.5, 0.97]))
    black = rng.random((h, w)) < density
    packed = np.packbits(~black, axis=1).tobytes()  # PDF 0 = black
    use_globals = bool(rng.integers(0, 2))
    stream, glob = J.encode_jbig2_symbol(
        packed, w, h, use_globals=use_globals
    )
    assert (glob != b"") == use_globals
    assert J.decode_jbig2(stream, glob) == (w, h, packed)


def test_symbol_dictionary_shared_across_pages_via_globals():
    """One /JBIG2Globals dictionary serves several page streams — the PDF
    layout globals exist for. Each page's text region places instances of
    the SHARED symbols, so pages drawing the same tiles decode exactly."""
    rng = np.random.default_rng(11)
    black = (rng.random((48, 64)) < 0.3).astype(np.uint8)
    packed = np.packbits(1 - black, axis=1).tobytes()
    stream, glob = J.encode_jbig2_symbol(packed, 64, 48, use_globals=True)
    # the same stream decoded twice against the same globals (two pages
    # of a doc referencing one globals object) is deterministic
    assert J.decode_jbig2(stream, glob) == J.decode_jbig2(stream, glob)
    # without its globals the stream's text region has no symbols → raises
    with pytest.raises(ValueError):
        J.decode_jbig2(stream)


# ------------------------------------------------- PDF image-XObject path


PAGES = ["jbig2 scanned page one\nline two", "page two body"]


@pytest.mark.parametrize(
    "variant", ["jbig2", "jbig2_mmr", "jbig2_sym", "jbig2_globals"]
)
def test_jbig2_scanned_variants_extract_exact_text(variant):
    """All four JBIG2 writer shapes — arithmetic generic region (TPGDON),
    MMR, symbol-coded (dictionary + text region), and symbol-coded with a
    shared /JBIG2Globals stream — decode through
    extract_pages_with_images into pixels whose scan-bits matrix recovers
    the exact page text."""
    pdf = P.build_pdf_scanned(
        PAGES, width=128, height=128, image_filter=variant
    )
    win = P.extract_pages_with_images(pdf)
    assert [len(spans) for spans, _ in win] == [0, 0]
    for (spans, images), page in zip(win, PAGES):
        [img] = images
        # r6: JBIG2 carries STILL-COMPRESSED (globals prefixed) through
        # the split stage; decode is page-parallel in _gray_pixels —
        # certified by the recovered-text assertion below
        assert img.codec.startswith("jbig2;") and img.bits == 1
        assert img.colorspace == "DeviceGray"
        assert G.decode_scan_png_text(_scan_png(images)) == page


def test_jbig2_samples_identical_to_g4_and_raw1():
    """All bilevel writers normalize to the same DeviceGray sample bytes —
    JBIG2's internal 1-=-black polarity is inverted on the way out."""
    from gnosis_ocr_spark.operators.pdf_split import _gray_pixels

    imgs = {}
    for variant in ("jbig2", "jbig2_mmr", "jbig2_sym", "jbig2_globals",
                    "g4", "raw1"):
        pdf = P.build_pdf_scanned(
            PAGES[:1], width=128, height=128, image_filter=variant
        )
        [(_, [img])] = P.extract_pages_with_images(pdf)
        # r6: CCITT/JBIG2 carry still-compressed — compare the DECODED
        # gray pixels (deferred decode included) instead of raw samples
        imgs[variant] = _gray_pixels(img)
    expected = _gray_pixels(
        P.PdfImage(
            128, 128, 1, "DeviceGray", "raw",
            G.encode_scan_bits(PAGES[0], 128, 128),
        )
    )
    assert all(px == expected for px in imgs.values())


def test_frozen_jbig2_golden_extracts_end_to_end(spark):
    """Byte-frozen JBIG2-only PDF (sha256-pinned) through the production
    fused split→OCR Spark path extracts non-empty byte-pinned text."""
    from gnosis_ocr_spark.operators.layout import assemble_documents
    from gnosis_ocr_spark.operators.pdf_split import (
        raster_ocr_pages,
        split_pdf_text_pages,
    )

    pdf = (GOLDEN / "scanned_jbig2.pdf").read_bytes()
    assert hashlib.sha256(pdf).hexdigest() == (
        "904c7cba9d532a8b29c5228238931d90ee5daff2733422f0175021305a30a895"
    )
    pages = ["jbig2 generic region page\nline two here", "second scanned page"]
    df = spark.createDataFrame(
        [("jbig2", bytearray(pdf))], schema="url string, html binary"
    )
    out = assemble_documents(
        raster_ocr_pages(split_pdf_text_pages(df), ocr_engine="stub")
    ).collect()
    assert out[0]["extracted_text"] == "\n\n".join(pages)
    assert out[0]["n_pages"] == 2


def test_symbol_stream_mutations_terminate():
    """Hostile symbol-dictionary bytes must TERMINATE (raise or decode) —
    review found two infinite loops (zero-length export runs; empty
    height classes) that wedged the executor with no catchable error.
    500 heavy mutations of a valid symbol stream now complete quickly
    under the runaway guards."""
    import random
    import time

    import numpy as np

    rng = np.random.default_rng(3)
    black = rng.random((48, 64)) < 0.3
    packed = np.packbits(~black, axis=1).tobytes()
    base, _glob = J.encode_jbig2_symbol(packed, 64, 48)
    rnd = random.Random(99)
    t0 = time.monotonic()
    for _ in range(500):
        buf = bytearray(base)
        for _ in range(rnd.randrange(1, 6)):
            buf[rnd.randrange(len(buf))] = rnd.randrange(256)
        try:
            J.decode_jbig2(bytes(buf))
        except ValueError:
            pass
    assert time.monotonic() - t0 < 120  # a single pre-fix hang ran forever
