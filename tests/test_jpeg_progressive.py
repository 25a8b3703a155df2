"""Progressive (SOF2) JPEG decode (round-4 VERDICT task #3): crawl JPEGs
are often progressive — spectral-selection + successive-approximation
scans now accumulate into the same IDCT path as baseline
(functions/codec_jpeg.py). The reference decodes them transparently via
poppler/PIL (/root/reference/app/jobs.py:386-390)."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from gnosis_ocr_spark.functions import codec_pdf as P
from gnosis_ocr_spark.functions.codec_jpeg import (
    JpegError,
    decode_baseline_jpeg,
    decode_jpeg,
    encode_gray_jpeg,
    encode_gray_jpeg_progressive,
)
from gnosis_ocr_spark.functions.codec_png import decode_scan_png_text
from gnosis_ocr_spark.operators.pdf_split import _scan_png


@given(st.integers(0, 10_000), st.booleans())
@settings(max_examples=40, deadline=None)
def test_progressive_decodes_identical_to_sequential(seed, random_px):
    """The four-scan progressive encoding carries the SAME quantized
    coefficients as the sequential encoding — decode must be bit-identical
    between them (coefficient-exact scan accumulation), and within the
    rounding bound of the source."""
    rng = np.random.default_rng(seed)
    w = int(rng.integers(1, 80))
    h = int(rng.integers(1, 80))
    if random_px:
        px = rng.integers(0, 256, (h, w), dtype=np.uint8)
    else:
        px = ((np.arange(h)[:, None] * 13 + np.arange(w) * 7) % 256).astype(
            np.uint8
        )
    seq = decode_jpeg(encode_gray_jpeg(px.tobytes(), w, h))
    prog = decode_jpeg(encode_gray_jpeg_progressive(px.tobytes(), w, h))
    assert seq == prog
    got = np.frombuffer(prog[3], np.uint8).astype(int)
    assert np.abs(got - px.reshape(-1).astype(int)).max() <= 4


def test_progressive_exercises_all_four_scan_kinds():
    """The fixture writer emits exactly four SOS segments — DC first,
    DC refine, AC first, AC refine — and a SOF2 frame; a busy image
    guarantees ZRL folding + interleaved correction bits get hit."""
    rng = np.random.default_rng(11)
    px = rng.integers(0, 256, (48, 48), dtype=np.uint8)
    data = encode_gray_jpeg_progressive(px.tobytes(), 48, 48)
    assert data.count(b"\xff\xc2") >= 1  # SOF2
    assert data.count(b"\xff\xda") == 4  # four scans
    w, h, nc, luma = decode_jpeg(data)
    assert (w, h, nc) == (48, 48, 1)


def test_decode_baseline_jpeg_alias_handles_progressive():
    """Callers still importing decode_baseline_jpeg (pdf_split,
    multimodal) get progressive support through the alias."""
    px = bytes(range(64))
    data = encode_gray_jpeg_progressive(px, 8, 8)
    assert decode_baseline_jpeg(data) == decode_jpeg(data)


def test_arithmetic_coded_still_raises():
    px = bytes(64)
    data = bytearray(encode_gray_jpeg_progressive(px, 8, 8))
    i = data.find(b"\xff\xc2")
    data[i + 1] = 0xCA  # SOF10: progressive arithmetic
    with pytest.raises(JpegError, match="unsupported"):
        decode_jpeg(bytes(data))


@given(st.integers(0, 10**6),
       st.lists(st.tuples(st.integers(0, 10**6), st.integers(0, 255)),
                min_size=1, max_size=10))
@settings(max_examples=60, deadline=None)
def test_mutated_progressive_never_escapes_exception_contract(seed, flips):
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, (24, 24), dtype=np.uint8)
    data = bytearray(encode_gray_jpeg_progressive(px.tobytes(), 24, 24))
    for pos, val in flips:
        data[pos % len(data)] = val
    try:
        decode_jpeg(bytes(data))
    except (RecursionError, MemoryError):
        raise
    except Exception:
        pass


def test_progressive_scanned_pdf_extracts_exact_text():
    """/DCTDecode image XObject holding a REAL progressive JPEG — the
    scanned-page shape a crawl carries — extracts the exact page text
    through the robust scan matrix (progressive round-trip error ≤ ±4,
    inside the matrix's ±7 tolerance)."""
    pages = ["progressive scanned page\nline two", "second page"]
    pdf = P.build_pdf_scanned(pages, image_filter="jpeg_prog")
    win = P.extract_pages_with_images(pdf)
    for (spans, images), page in zip(win, pages):
        assert not spans
        [img] = images
        assert img.codec == "dct" and img.data.find(b"\xff\xc2") > 0
        assert decode_scan_png_text(_scan_png(images)) == page
