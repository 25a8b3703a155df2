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


def _encode_prog_color_444(y, dri: int = 0) -> bytes:
    """Test-only 3-component 4:4:4 PROGRESSIVE encoder (constant-128
    chroma): one interleaved DC scan over all components (optionally with
    RSTn restarts) + three non-interleaved full-band AC scans — the
    multi-component progressive geometry the decoder must walk."""
    import struct

    import numpy as np

    from gnosis_ocr_spark.functions import codec_jpeg as J

    h, w = y.shape
    assert h % 8 == 0 and w % 8 == 0
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes([1] * 64)
    out += (
        b"\xff\xc2" + struct.pack(">H", 8 + 9) + b"\x08"
        + struct.pack(">HH", h, w) + b"\x03"
        + b"\x01\x11\x00" + b"\x02\x11\x00" + b"\x03\x11\x00"
    )
    for tc, bits, vals in ((0, J._ENC_DC_BITS, J._ENC_DC_VALS),
                           (1, J._ENC_AC_BITS, J._ENC_AC_VALS)):
        out += (b"\xff\xc4" + struct.pack(">H", 19 + len(vals))
                + bytes([tc << 4]) + bytes(bits) + vals)
    if dri:
        out += b"\xff\xdd" + struct.pack(">HH", 4, dri)

    def zz_of(block):
        coef = J._M @ (block - 128.0) @ J._M.T
        return np.rint(coef.reshape(64)[J._ZZ_FLAT]).astype(np.int64)

    blocks = {1: [], 2: [], 3: []}
    chroma = np.full((8, 8), 128.0)
    for by in range(h // 8):
        for bx in range(w // 8):
            blocks[1].append(zz_of(
                y[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8].astype(float)))
            blocks[2].append(zz_of(chroma))
            blocks[3].append(zz_of(chroma))

    # scan 1: interleaved DC (Ss=Se=0, Al=0) over all three components
    out += (b"\xff\xda" + struct.pack(">H", 6 + 6)
            + b"\x03\x01\x00\x02\x00\x03\x00\x00\x00\x00")
    bw = J._BitWriter()
    dc = {1: 0, 2: 0, 3: 0}
    rst = 0
    for i in range(len(blocks[1])):
        if dri and i and i % dri == 0:
            out += bw.flush()
            bw = J._BitWriter()
            out += bytes([0xFF, 0xD0 + rst])
            rst = (rst + 1) % 8
            dc = {1: 0, 2: 0, 3: 0}
        for cid in (1, 2, 3):
            v = int(blocks[cid][i][0])
            diff = v - dc[cid]
            dc[cid] = v
            s = J._category(diff)
            ln, code = J._ENC_DC.code[s]
            bw.write(code, ln)
            if s:
                bw.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
    out += bw.flush()

    # scans 2-4: per-component AC 1-63 first (Al=0), non-interleaved.
    # DRI persists across scans (T.81): comp 1's AC scan emits RSTn every
    # dri BLOCKS (exercising the per-scan eobrun/restart reset); a DRI 0
    # marker then disables restarts for the chroma scans.
    for cid in (1, 2, 3):
        if dri and cid == 2:
            out += b"\xff\xdd" + struct.pack(">HH", 4, 0)
        out += (b"\xff\xda" + struct.pack(">H", 6 + 2)
                + bytes([1, cid, 0, 1, 63, 0]))
        bw = J._BitWriter()
        rst = 0
        for bi, zzb in enumerate(blocks[cid]):
            if dri and cid == 1 and bi and bi % dri == 0:
                out += bw.flush()
                bw = J._BitWriter()
                out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
            run = 0
            for k in range(1, 64):
                v = int(zzb[k])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    ln, code = J._ENC_AC.code[0xF0]
                    bw.write(code, ln)
                    run -= 16
                s = J._category(v)
                ln, code = J._ENC_AC.code[(run << 4) | s]
                bw.write(code, ln)
                bw.write(v if v >= 0 else v + (1 << s) - 1, s)
                run = 0
            if run:
                ln, code = J._ENC_AC.code[0x00]
                bw.write(code, ln)
        out += bw.flush()
    out += b"\xff\xd9"
    return bytes(out)


@pytest.mark.parametrize("dri", [0, 3])
def test_progressive_multi_component_with_restarts(dri):
    """Color progressive: interleaved multi-component DC scan (with RSTn
    resets at dri=3) + per-component non-interleaved AC scans reconstruct
    the luma plane bit-identically to the grayscale sequential encoding
    of the same pixels (identical quantized coefficients)."""
    rng = np.random.default_rng(23)
    y = rng.integers(0, 256, size=(24, 32), dtype=np.uint8)
    jp = _encode_prog_color_444(y, dri=dri)
    w, h, nc, out = decode_jpeg(jp)
    assert (w, h, nc) == (32, 24, 3)
    seq = decode_jpeg(encode_gray_jpeg(y.tobytes(), 32, 24))
    assert out == seq[3]
