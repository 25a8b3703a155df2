"""Multi-page TIFF as a first-class scanned-document SOURCE.

Real scan archives ship multi-page G4/LZW TIFFs (the same corpus poppler
handles transparently for the reference, /root/reference/app/jobs.py:386-390).
Here TIFF rides the exact same heavy-branch topology as PDF: magic-byte
route → salted repartition → cheap split (pages rebuilt as still-compressed
single-page files, pure memcpy) → page respread → fused strip-decode +
raster + OCR → sort-aggregate assembly. These tests certify the splitter,
the route column threading, and the e2e golden (ground truth by
construction via the scan-matrix pixel encodings, non-circular)."""

from __future__ import annotations

import numpy as np
import pytest

from gnosis_ocr_spark.functions import codec_png as G
from gnosis_ocr_spark.functions import codec_tiff as T


def _noise_gray(w: int, h: int, seed: int) -> bytes:
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=w * h, dtype=np.uint8).tobytes()


def _bilevel_gray(w: int, h: int, seed: int) -> bytes:
    rng = np.random.default_rng(seed)
    return (rng.integers(0, 2, size=w * h, dtype=np.uint8) * 255).tobytes()


# ------------------------------------------------------------- splitting


def test_split_tiff_pages_roundtrip_mixed_compressions():
    """A 3-page chain with a different compression per page splits into
    three single-page files, each decoding to the original pixels."""
    pages = [
        (_bilevel_gray(80, 40, 1), 80, 40),
        (_noise_gray(64, 64, 2), 64, 64),
        (_noise_gray(48, 32, 3), 48, 32),
    ]
    blob = T.encode_tiff_gray_pages(
        pages, compression=["g4", "lzw", "packbits"],
        photometric=0, rows_per_strip=16,
    )
    assert T.tiff_num_pages(blob) == 3
    split = T.split_tiff_pages(blob)
    assert len(split) == 3
    for (page_bytes, w, h, bits), (gray, ew, eh), comp in zip(
        split, pages, ["g4", "lzw", "packbits"]
    ):
        assert (w, h) == (ew, eh)
        assert bits == (1 if comp == "g4" else 8)
        dw, dh, out = T.decode_tiff_gray(page_bytes)
        assert (dw, dh) == (ew, eh)
        # the codec is visual-gray in/out regardless of photometric
        assert out == gray


def test_split_big_endian_source_keeps_byte_order():
    """Rebuilt pages preserve the source byte order — 16-bit sample
    payloads inside the sliced blocks follow it and are never transcoded."""
    gray = _noise_gray(32, 32, 7)
    blob = T.encode_tiff_gray_pages(
        [(gray, 32, 32), (gray, 32, 32)],
        compression="deflate", photometric=1, big_endian=True,
    )
    split = T.split_tiff_pages(blob)
    assert len(split) == 2
    for page_bytes, w, h, bits in split:
        assert page_bytes[:4] == b"MM\x00*"
        assert T.decode_tiff_gray(page_bytes) == (32, 32, gray)
    # the 16-bit case this rule exists for: BE samples survive the split
    blob16 = T.encode_tiff_gray16(gray, 32, 32, big_endian=True)
    [(p16, *_)] = T.split_tiff_pages(blob16)
    assert T.decode_tiff_gray(p16) == (32, 32, gray)


def test_split_unsupported_page_degrades_per_page():
    """A broken page (claims tiling but carries no tile tables) in the
    middle of the chain rebuilds as None while its neighbours survive —
    per-page honest degradation, never whole-file."""
    ok = T._gray_page_parts(
        _noise_gray(16, 16, 9), 16, 16, "none", None, 1, 1, 1
    )
    tiled_tags = [
        (256, T._LONG, [16]), (257, T._LONG, [16]), (258, T._SHORT, [8]),
        (259, T._SHORT, [1]), (262, T._SHORT, [1]),
        (322, T._LONG, [16]), (323, T._LONG, [16]),  # tile dims, no tables
    ]
    blob = T._assemble_tiff_multi(
        [ok, ([b"\x00" * 256], tiled_tags), ok], "<"
    )
    split = T.split_tiff_pages(blob)
    assert [p is not None for p, *_ in split] == [True, False, True]
    assert split[1][1:3] == (16, 16)  # dims still reported


def test_split_hostile_inputs_raise():
    with pytest.raises(ValueError):
        T.split_tiff_pages(b"II*\x00" + b"\xff" * 16)  # IFD out of range
    with pytest.raises(ValueError):
        T.split_tiff_pages(b"not a tiff at all")
    # cycle-safe: IFD pointing back at itself terminates
    gray = _noise_gray(8, 8, 4)
    blob = bytearray(T.encode_tiff_gray(gray, 8, 8))
    # patch the next-IFD pointer (last 4 bytes of the IFD block) to loop —
    # locate it by re-reading the chain
    import struct

    (ifd_off,) = struct.unpack_from("<I", blob, 4)
    (n,) = struct.unpack_from("<H", blob, ifd_off)
    struct.pack_into("<I", blob, ifd_off + 2 + 12 * n, ifd_off)
    split = T.split_tiff_pages(bytes(blob))
    assert len(split) == 1  # visited once, cycle broken


def test_split_tiled_and_jpeg_pages_rebuild():
    """Tiled pages rebuild with their tile structure intact and
    JPEG-in-TIFF pages carry tag 347 through — both decode after the
    split exactly like the original first IFD."""
    gray = _noise_gray(48, 40, 21)
    tiled = T.encode_tiff_gray_tiled(gray, 48, 40, tile_width=16,
                                     tile_length=16, compression="deflate")
    jpeg = T.encode_tiff_gray_jpeg(gray, 48, 40, rows_per_strip=16,
                                   shared_tables=True)
    # splice both single-page files into one two-page chain by re-packing
    # their decoded tag sets is unnecessary: split each and compare
    [(pt, w, h, bits)] = T.split_tiff_pages(tiled)
    assert (w, h, bits) == (48, 40, 8)
    assert T.tiff_info(pt)["tiled"]
    assert T.decode_tiff_gray(pt) == T.decode_tiff_gray(tiled)
    [(pj, w2, h2, _)] = T.split_tiff_pages(jpeg)
    assert (w2, h2) == (48, 40)
    assert T.tiff_info(pj)["jpeg_tables"] is not None
    assert T.decode_tiff_gray(pj) == T.decode_tiff_gray(jpeg)


def test_split_page_cap():
    gray = _noise_gray(8, 8, 5)
    blob = T.encode_tiff_gray_pages([(gray, 8, 8)] * 6, compression="none")
    assert len(T.split_tiff_pages(blob, max_pages=4)) == 4


# --------------------------------------------------------------- routing


def test_route_col_tiff(spark):
    from gnosis_ocr_spark.operators.routing import route_col

    import pyspark.sql.functions as F

    rows = [
        ("le", bytearray(b"II*\x00rest")),
        ("be", bytearray(b"MM\x00*rest")),
        ("pdf", bytearray(b"%PDF-1.4")),
        ("html", bytearray(b"<html>")),
        ("empty", bytearray(b"")),
        ("near", bytearray(b"II**not tiff")),
    ]
    df = spark.createDataFrame(rows, schema="url string, html binary")
    got = {
        r["url"]: r["route"]
        for r in df.select("url", route_col(F.col("html")).alias("route")).collect()
    }
    assert got == {
        "le": "tiff", "be": "tiff", "pdf": "pdf",
        "html": "html", "empty": "empty", "near": "html",
    }


# ------------------------------------------------------------------- e2e


def _scan_matrix_tiff(texts: list[str], compression: str) -> bytes:
    """Pages whose pixels carry their ground truth by construction
    (codec_png scan-matrix) — lossless compressions preserve it exactly."""
    pages = [(G.encode_scan_pixels(t, 64, 64), 64, 64) for t in texts]
    return T.encode_tiff_gray_pages(pages, compression=compression,
                                    photometric=1, rows_per_strip=16)


def _bilevel_matrix_tiff(texts: list[str]) -> bytes:
    """G4 fax pages carrying their ground truth in the bilevel matrix —
    the dominant real scan-archive shape."""
    pages = []
    for t in texts:
        packed = G.encode_scan_bits(t, 128, 128)
        bits = np.unpackbits(
            np.frombuffer(packed, dtype=np.uint8).reshape(128, 16), axis=1
        )[:, :128]
        pages.append(((bits * np.uint8(255)).tobytes(), 128, 128))
    return T.encode_tiff_gray_pages(pages, compression="g4", photometric=0)


def test_tiff_source_end_to_end_golden(spark):
    """Multi-page TIFFs through the PRODUCTION extract_corpus plan: text
    extracts byte-identically to the by-construction golden, page counts
    and the route column are exact, corrupt files degrade to sentinels."""
    from gnosis_ocr_spark.plans.pipeline import extract_corpus

    lzw_texts = ["tiff page one\nline two", "tiff page two"]
    g4_texts = ["fax body page", "fax tail"]
    rows = [
        ("lzw", bytearray(_scan_matrix_tiff(lzw_texts, "lzw"))),
        ("g4", bytearray(_bilevel_matrix_tiff(g4_texts))),
        ("broken", bytearray(b"II*\x00" + b"\xff" * 32)),
        ("html", bytearray(
            b"<html><body><p>web text here, long enough to clear the "
            b"extractor's paragraph length floor comfortably.</p></body></html>"
        )),
        ("empty", bytearray(b"")),
    ]
    docs = spark.createDataFrame(rows, schema="url string, html binary")
    out = {r["url"]: r for r in extract_corpus(docs).collect()}

    assert out["lzw"]["extracted_text"] == "\n\n".join(lzw_texts)
    assert out["lzw"]["n_pages"] == 2 and out["lzw"]["route"] == "tiff"
    assert out["g4"]["extracted_text"] == "\n\n".join(g4_texts)
    assert out["g4"]["n_pages"] == 2 and out["g4"]["route"] == "tiff"
    # corrupt TIFF → sentinel ('', 0) but the url and route survive
    assert out["broken"]["extracted_text"] == ""
    assert out["broken"]["n_pages"] == 0 and out["broken"]["route"] == "tiff"
    assert out["html"]["route"] == "html" and "web text" in out["html"]["extracted_text"]
    assert out["empty"]["route"] == "empty" and out["empty"]["n_pages"] == 0


def test_mixed_pdf_and_tiff_share_one_heavy_branch(spark):
    """PDF and TIFF docs flow through the SAME split/OCR/assembly plan with
    per-document routes — and the plan grows no new exchange for it."""
    from gnosis_ocr_spark.functions import codec_pdf as P
    from gnosis_ocr_spark.plans.pipeline import extract_corpus

    texts = ["shared body text", "second page"]
    rows = [
        ("pdf", bytearray(P.build_pdf(texts, compress=True))),
        ("tiff", bytearray(_scan_matrix_tiff(texts, "deflate"))),
    ]
    docs = spark.createDataFrame(rows, schema="url string, html binary")
    result = extract_corpus(docs)

    # route threading rides existing shuffles: exchange count matches the
    # documented census (salted repartition, page respread, assembly) —
    # checked on the pre-execution plan (post-AQE explain prints the
    # initial AND final trees, double-counting)
    import contextlib
    import io
    import re

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        result.explain("formatted")
    n_exchanges = len(re.findall(r"^\(\d+\) Exchange", buf.getvalue(), re.M))
    assert n_exchanges == 3, buf.getvalue()

    out = {r["url"]: r for r in result.collect()}
    golden = "\n\n".join(texts)
    assert out["pdf"]["extracted_text"] == golden
    assert out["tiff"]["extracted_text"] == golden
    assert out["pdf"]["route"] == "pdf" and out["tiff"]["route"] == "tiff"


def test_unsupported_tiff_page_extracts_empty_but_counts(spark):
    """A chain mixing decodable and un-rebuildable pages (tile dims with
    no tile tables) keeps per-page honesty through the full plan: good
    pages extract, bad pages blank."""
    from gnosis_ocr_spark.operators.layout import assemble_documents
    from gnosis_ocr_spark.operators.pdf_split import (
        raster_ocr_pages,
        split_pdf_text_pages,
    )

    good = T._gray_page_parts(
        G.encode_scan_pixels("good page", 64, 64), 64, 64, "none",
        None, 1, 1, 1,
    )
    tiled = (
        [b"\x00" * 64],
        [(256, T._LONG, [8]), (257, T._LONG, [8]), (258, T._SHORT, [8]),
         (259, T._SHORT, [1]), (262, T._SHORT, [1]), (322, T._LONG, [8]),
         (323, T._LONG, [8])],
    )
    blob = T._assemble_tiff_multi([good, tiled], "<")
    df = spark.createDataFrame(
        [("doc", bytearray(blob))], schema="url string, html binary"
    )
    ocred = raster_ocr_pages(
        split_pdf_text_pages(df, with_route=True), ocr_engine="stub"
    )
    [row] = assemble_documents(ocred).collect()
    # the blank page contributes an empty segment (same engine semantics
    # as an undecodable page inside a multi-page PDF)
    assert row["extracted_text"].strip() == "good page"
    assert row["n_pages"] == 2 and row["route"] == "tiff"
