"""Office / e-book extraction (operators/office_extract.py, functions/codec_zip.py).

Every format roundtrips through its by-construction fixture writer; the ZIP
container codec is cross-validated against the stdlib reader in BOTH
directions (our archives open with ``zipfile``; ``zipfile``-written archives
open with ours), and hostile-input behavior (truncation, bombs, mutation
fuzz) is pinned: extractors are total, the bomb guard raises before
allocating."""

from __future__ import annotations

import io
import random
import zipfile
import zlib

import pytest

from gnosis_ocr_spark.functions.codec_zip import (
    MAX_ENTRY_BYTES,
    ZipError,
    ZipView,
    build_zip,
    zip_entries,
    zip_read,
)
from gnosis_ocr_spark.operators.office_extract import (
    build_docx,
    build_epub,
    build_odt,
    build_pptx,
    build_rtf,
    build_xlsx,
    extract_office,
    extract_rtf,
)

PARAS = ["Hello office world & <friends>.", "Second paragraph with    runs\tof ws."]
NORM = ["Hello office world & <friends>.", "Second paragraph with runs of ws."]
EXPECT = "\n\n".join(NORM)


# ---------------------------------------------------------------------------
# ZIP container codec
# ---------------------------------------------------------------------------


def test_zip_roundtrip_and_stdlib_cross_validation():
    entries = [
        ("mimetype", b"application/epub+zip"),
        ("a/b.xml", b"<x>hello</x>" * 100),
        ("t.txt", "unicodé namés".encode()),
    ]
    z = build_zip(entries, stored={"mimetype"})
    # stdlib opens ours (spec validity), CRCs verify
    zf = zipfile.ZipFile(io.BytesIO(z))
    assert zf.namelist() == [n for n, _ in entries]
    assert zf.testzip() is None
    for name, payload in entries:
        assert zf.read(name) == payload
    # mimetype stored first (EPUB/ODT OCF requirement)
    assert zf.infolist()[0].compress_type == zipfile.ZIP_STORED
    # ours opens stdlib's
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as w:
        w.writestr("word/document.xml", b"<w:document/>" * 50)
        w.writestr("stored.bin", b"S" * 10)
    v = ZipView(buf.getvalue())
    assert v.read("word/document.xml") == b"<w:document/>" * 50
    assert v.read("stored.bin") == b"S" * 10


def test_zip_truncated_central_dir_recovers_front_entries():
    z = build_zip([("first.xml", b"A" * 2000), ("second.xml", b"B" * 2000)])
    cut = z.find(b"PK\x01\x02") - 5  # cut into the last entry's tail
    v = ZipView(z[:cut])
    assert v.try_read("first.xml") == b"A" * 2000


def test_zip_trailing_garbage_and_prefix():
    z = build_zip([("x", b"payload")])
    assert ZipView(z + b"trailing-garbage" * 4).read("x") == b"payload"


def test_zip_bomb_guard():
    # a member whose decompressed size exceeds the per-entry ceiling must
    # raise before allocating, not MemoryError the executor
    big = b"\x00" * (MAX_ENTRY_BYTES + 1024)
    comp = zlib.compressobj(9, zlib.DEFLATED, -15)
    cdata = comp.compress(big) + comp.flush()
    import struct

    name = b"bomb.bin"
    local = (
        b"PK\x03\x04"
        + struct.pack(
            "<HHHHHLLLHH", 20, 0, 8, 0, 0,
            zlib.crc32(big), len(cdata), len(big), len(name), 0,
        )
        + name
        + cdata
    )
    cen = b"PK\x01\x02" + struct.pack(
        "<HHHHHHLLLHHHHHLL", 20, 20, 0, 8, 0, 0,
        zlib.crc32(big), len(cdata), len(big), len(name), 0, 0, 0, 0, 0, 0,
    ) + name
    eocd = b"PK\x05\x06" + struct.pack("<HHHHLLH", 0, 0, 1, 1, len(cen), len(local), 0)
    data = local + cen + eocd
    (entry,) = zip_entries(data)
    with pytest.raises(ZipError):
        zip_read(data, entry)


def test_zip_crc_verification():
    z = bytearray(build_zip([("f", b"x" * 64)], compress=False))
    body = z.find(b"x" * 64)
    z[body] ^= 0xFF
    (entry,) = zip_entries(bytes(z))
    with pytest.raises(ZipError):
        zip_read(bytes(z), entry, verify_crc=True)


# ---------------------------------------------------------------------------
# format roundtrips (goldens by construction)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "builder,subtype,n_pages",
    [
        (lambda: build_docx(PARAS), "docx", 1),
        (lambda: build_rtf(PARAS), "rtf", 1),
        (lambda: build_odt(PARAS), "odt", 1),
        (lambda: build_xlsx([[p] for p in PARAS]), "xlsx", 1),
        (lambda: build_pptx([[PARAS[0]], [PARAS[1]]]), "pptx", 2),
        (lambda: build_epub([[PARAS[0]], [PARAS[1]]]), "epub", 2),
    ],
)
def test_format_roundtrip(builder, subtype, n_pages):
    text, np_, sub = extract_office(builder())
    assert sub == subtype
    assert np_ == n_pages
    assert text == EXPECT


def test_docx_tabs_breaks_and_tables_normalize():
    # hand-built document.xml with tab/br separators inside a run
    from gnosis_ocr_spark.functions.codec_zip import build_zip as bz
    from gnosis_ocr_spark.operators.office_extract import _CT_DOCX, _RELS_DOCX, _W_NS

    doc = (
        f"<w:document {_W_NS}><w:body>"
        "<w:p><w:r><w:t>alpha</w:t><w:tab/><w:t>beta</w:t>"
        "<w:br/><w:t>gamma</w:t></w:r></w:p>"
        "</w:body></w:document>"
    )
    z = bz(
        [
            ("[Content_Types].xml", _CT_DOCX.encode()),
            ("_rels/.rels", _RELS_DOCX.encode()),
            ("word/document.xml", doc.encode()),
        ]
    )
    text, _, sub = extract_office(z)
    assert sub == "docx"
    assert text == "alpha beta gamma"  # separators normalize to single spaces


def test_xlsx_inline_numeric_and_shared_cells():
    from gnosis_ocr_spark.functions.codec_zip import build_zip as bz
    from gnosis_ocr_spark.operators.office_extract import _CT_XLSX, _RELS_XLSX

    ns = 'xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"'
    sheet = (
        f"<worksheet {ns}><sheetData>"
        '<row r="1">'
        '<c r="A1" t="s"><v>0</v></c>'
        '<c r="B1"><v>42.5</v></c>'
        '<c r="C1" t="inlineStr"><is><t>inline text</t></is></c>'
        "</row></sheetData></worksheet>"
    )
    sst = f'<sst {ns}><si><t>shared text</t></si></sst>'
    z = bz(
        [
            ("[Content_Types].xml", _CT_XLSX.encode()),
            ("_rels/.rels", _RELS_XLSX.encode()),
            ("xl/workbook.xml", f"<workbook {ns}/>".encode()),
            ("xl/sharedStrings.xml", sst.encode()),
            ("xl/worksheets/sheet1.xml", sheet.encode()),
        ]
    )
    text, np_, sub = extract_office(z)
    assert sub == "xlsx"
    assert text == "shared text 42.5 inline text"
    assert np_ == 1


def test_pptx_slide_order_is_numeric_not_lexicographic():
    # slide10 must come AFTER slide2
    slides = [[f"slide {i} body"] for i in range(1, 12)]
    text, np_, _ = extract_office(build_pptx(slides))
    lines = text.split("\n\n")
    assert lines[1] == "slide 2 body"
    assert lines[9] == "slide 10 body"
    assert np_ == 11


def test_epub_spine_order_and_main_content_strip():
    # chapters carry nav boilerplate; the main-content extractor drops it
    chapters = [["chapter one body text that is long enough to survive"],
                ["chapter two body text that is long enough to survive"]]
    text, np_, sub = extract_office(build_epub(chapters))
    assert sub == "epub"
    assert np_ == 2
    assert "toc" not in text
    assert text.startswith("chapter one")
    assert "chapter two" in text


def test_truncated_docx_part_keeps_parsed_prefix():
    # cut document.xml mid-stream INSIDE the zip: the lenient XML walker
    # keeps the paragraphs that parsed before the cut
    paras = [f"paragraph number {i} with recognizable text" for i in range(20)]
    z = build_docx(paras)
    # truncate the archive into the middle of document.xml's deflate data
    view = ZipView(z)
    e = view.entries["word/document.xml"]
    cut = e.header_off + 30 + len("word/document.xml") + e.csize * 9 // 10
    text, np_, sub = extract_office(z[:cut])
    assert sub == "docx"
    assert text.startswith("paragraph number 0")
    assert "paragraph number 1" in text
    assert np_ == 1


# ---------------------------------------------------------------------------
# RTF tokenizer details
# ---------------------------------------------------------------------------


def test_rtf_unicode_uc_skip_and_hex_bytes():
    # \uc1: one fallback char after \uN must be swallowed; \'e9 = é in cp1252
    rtf = (
        b"{\\rtf1\\ansi\\ansicpg1252\\uc1 caf\\'e9 \\u8212?dash"
        b"\\uc2 \\u952 ??theta\\par}"
    )
    text, _ = extract_rtf(rtf)
    # the spaces after \uc2 and \u952 are control-word delimiters, not text
    assert text == "café —dashθtheta"


def test_rtf_destinations_and_groups_dropped():
    rtf = (
        b"{\\rtf1\\ansi{\\fonttbl{\\f0 Arial;}}{\\*\\generator Fake 1.0;}"
        b"{\\stylesheet{\\s1 Heading;}}"
        b"real body text"
        b"{\\footnote this footnote text must not appear}"
        b" continues\\par}"
    )
    text, _ = extract_rtf(rtf)
    assert text == "real body text continues"
    assert "Arial" not in text and "Fake" not in text and "footnote" not in text


def test_rtf_bin_skip_and_escapes():
    rtf = b"{\\rtf1 a\\bin5 XXXXXb \\{br\\}ace\\\\slash\\par}"
    text, _ = extract_rtf(rtf)
    assert text == "ab {br}ace\\slash"


def test_rtf_negative_unicode_and_line_controls():
    rtf = b"{\\rtf1\\uc0 high\\u-10179 \\u-8704  low\\line next\\tab t\\par}"
    # \u-10179\u-8704 = U+1F600 as a surrogate pair (emoji via RTF)
    text, _ = extract_rtf(rtf)
    assert "high" in text and "low next t" in text


# ---------------------------------------------------------------------------
# totality / fuzz
# ---------------------------------------------------------------------------


def test_extract_office_total_on_hostile_bytes():
    assert extract_office(None) == ("", 0, "empty")
    assert extract_office(b"") == ("", 0, "empty")
    assert extract_office(b"PK\x03\x04" + b"\x00" * 64) == ("", 0, "zip")
    assert extract_office(b"\x89PNG not office")[2] == "other"
    assert extract_office(b"{\\rtf1")[2] == "rtf"


def test_mutation_fuzz_never_raises():
    rng = random.Random(1234)
    seeds = [
        build_docx(PARAS), build_rtf(PARAS), build_odt(PARAS),
        build_xlsx([PARAS]), build_pptx([PARAS]), build_epub([PARAS]),
    ]
    for seed in seeds:
        for _ in range(40):
            b = bytearray(seed)
            for _ in range(rng.randint(1, 8)):
                b[rng.randrange(len(b))] = rng.randrange(256)
            text, np_, sub = extract_office(bytes(b))  # must not raise
            assert isinstance(text, str) and isinstance(np_, int)
        for cut in (1, len(seed) // 3, len(seed) - 2):
            extract_office(bytes(seed[:cut]))


# ---------------------------------------------------------------------------
# Spark integration — vectorized UDF + pipeline routing
# ---------------------------------------------------------------------------


def test_office_udf_and_pipeline_routes(spark):
    from gnosis_ocr_spark.plans.pipeline import extract_corpus

    rows = [
        ("u-docx", build_docx(PARAS)),
        ("u-rtf", build_rtf(PARAS)),
        ("u-epub", build_epub([[PARAS[0]], [PARAS[1]]])),
        ("u-xlsx", build_xlsx([[p] for p in PARAS])),
        ("u-html", b"<html><body><article><p>plain web page body text here</p></article></body></html>"),
        ("u-zip", b"PK\x03\x04" + b"\x00" * 40),
    ]
    df = spark.createDataFrame(
        [(u, None, b, None, "") for u, b in rows],
        schema="url string, warc_ts timestamp, html binary, text string, lang string",
    )
    out = {
        r["url"]: r
        for r in extract_corpus(df).collect()
    }
    assert out["u-docx"]["extracted_text"] == EXPECT
    assert out["u-docx"]["route"] == "office"
    assert out["u-rtf"]["extracted_text"] == EXPECT
    assert out["u-rtf"]["route"] == "office"
    assert out["u-epub"]["extracted_text"] == EXPECT
    assert out["u-epub"]["n_pages"] == 2
    assert out["u-xlsx"]["extracted_text"] == EXPECT
    assert out["u-html"]["extracted_text"] == "plain web page body text here"
    assert out["u-zip"]["extracted_text"] == ""
    assert out["u-zip"]["n_pages"] == 0


# ---------------------------------------------------------------------------
# gzip transparency (still-content-encoded crawl payloads)
# ---------------------------------------------------------------------------


def test_gzip_payload_transparency():
    import gzip

    html = (
        b"<html><body><article><p>hello gzipped web page body text here"
        b"</p></article></body></html>"
    )
    t, np_, sub = extract_office(gzip.compress(html, mtime=0))
    assert (t, np_, sub) == ("hello gzipped web page body text here", 1, "gz-html")
    # gzipped containers recurse once
    t, np_, sub = extract_office(gzip.compress(build_docx(PARAS), mtime=0))
    assert (t, sub) == (EXPECT, "gz-docx")
    # page-structured inner formats are a LOUD miss, not silent garbage
    assert extract_office(gzip.compress(b"%PDF-1.4 x"))[2] == "gz-pdf"
    # nesting cap refuses instead of garbling
    double = gzip.compress(gzip.compress(gzip.compress(html)))
    assert extract_office(double)[2] in ("gz-gz-deep", "gz-deep")
    # hostile gzip header
    assert extract_office(b"\x1f\x8b\x00garbage")[2] == "gz-bad"


def test_ods_odp_extract_through_the_odt_walker():
    """ODF spreadsheets/presentations put cell/frame text in the same
    <text:p> elements — the ODT walker extracts them; sniff labels the
    subtype from the OCF mimetype."""
    from gnosis_ocr_spark.functions.codec_zip import build_zip as bz

    t_ns = 'xmlns:text="urn:oasis:names:tc:opendocument:xmlns:text:1.0"'
    o_ns = 'xmlns:office="urn:oasis:names:tc:opendocument:xmlns:office:1.0"'
    tab_ns = 'xmlns:table="urn:oasis:names:tc:opendocument:xmlns:table:1.0"'
    content = (
        f"<office:document-content {o_ns} {t_ns} {tab_ns}>"
        "<office:body><office:spreadsheet><table:table>"
        "<table:table-row>"
        "<table:table-cell><text:p>cell alpha text</text:p></table:table-cell>"
        "<table:table-cell><text:p>cell beta text</text:p></table:table-cell>"
        "</table:table-row>"
        "</table:table></office:spreadsheet></office:body>"
        "</office:document-content>"
    )
    ods = bz(
        [
            ("mimetype", b"application/vnd.oasis.opendocument.spreadsheet"),
            ("content.xml", content.encode()),
        ],
        stored={"mimetype"},
    )
    text, np_, sub = extract_office(ods)
    assert sub == "ods"
    assert text == "cell alpha text\n\ncell beta text"
    assert np_ == 1
    odp = bz(
        [
            ("mimetype", b"application/vnd.oasis.opendocument.presentation"),
            ("content.xml", content.replace("spreadsheet>", "presentation>").encode()),
        ],
        stored={"mimetype"},
    )
    assert extract_office(odp)[2] == "odp"


def test_rtf_surrogate_pairs_and_out_of_range_unicode():
    """Word writes astral chars as \\uN surrogate PAIRS — they must
    combine into the real character (raw surrogates would crash the UDF
    at the Arrow boundary); out-of-range \\uN values drop instead of
    degrading the whole document to 'bad'."""
    from gnosis_ocr_spark.operators.office_extract import extract_rtf

    emoji = rb"{\rtf1\ansi body \u-10179?\u-9089? tail}"
    text, np_ = extract_rtf(emoji)
    assert "\U0001f47f" in text and "body" in text and "tail" in text
    text.encode("utf-8")  # serializable — the actual UDF requirement
    bad_cp = rb"{\rtf1\ansi keep \u-70000? this}"
    text2, _ = extract_rtf(bad_cp)
    assert "keep" in text2 and "this" in text2


def test_odt_annotation_paragraph_keeps_tail_text():
    """A </text:p> inside office:annotation must not close the OUTER
    paragraph — text after the annotation was silently dropped."""
    from gnosis_ocr_spark.functions.codec_zip import build_zip
    from gnosis_ocr_spark.functions.codec_zip import ZipView
    from gnosis_ocr_spark.operators.office_extract import extract_odt

    content = (
        b'<?xml version="1.0"?><office:document-content>'
        b"<office:body><office:text>"
        b"<text:p>before <office:annotation><text:p>note body</text:p>"
        b"</office:annotation>after</text:p>"
        b"<text:p>second para</text:p>"
        b"</office:text></office:body></office:document-content>"
    )
    blob = build_zip([
        ("mimetype", b"application/vnd.oasis.opendocument.text"),
        ("content.xml", content),
    ])
    text, np_ = extract_odt(ZipView(blob))
    assert "before after" in text
    assert "second para" in text
    assert "note body" not in text  # annotations stay skipped


def test_zip_eocd_signature_inside_comment():
    """An EOCD signature embedded in the archive COMMENT must not shadow
    the real EOCD (rfind would land on the impostor and lose every
    entry)."""
    from gnosis_ocr_spark.functions.codec_zip import build_zip, zip_entries

    blob = bytearray(build_zip([("a.txt", b"hello"), ("b.txt", b"world")]))
    # append a comment containing the EOCD magic: declare comment length
    comment = b"see PK\x05\x06 docs"
    import struct

    struct.pack_into("<H", blob, len(blob) - 2, len(comment))
    blob += comment
    names = {e.name for e in zip_entries(bytes(blob))}
    assert names == {"a.txt", "b.txt"}
