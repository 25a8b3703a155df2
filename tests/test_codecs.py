"""Unit tests for the stdlib PDF/PNG codecs (pure functions, no Spark)."""

from __future__ import annotations
import re

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from gnosis_ocr_spark.functions import codec_pdf as P
from gnosis_ocr_spark.functions import codec_png as G

printable = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126), min_size=1, max_size=80
)


@given(st.lists(printable, min_size=1, max_size=5), st.booleans())
@settings(max_examples=60, deadline=None)
def test_pdf_roundtrip_property(lines_per_page, compress):
    pages = ["\n".join([line]) for line in lines_per_page]
    pdf = P.build_pdf(pages, compress=compress)
    assert P.is_pdf(pdf)
    assert P.page_count(pdf) == len(pages)
    got = [P.page_text(pg) for pg in P.extract_pages(pdf)]
    # page_text collapses a row's spans with single spaces; our writer puts one
    # span per line, so the roundtrip is exact
    assert got == pages


def test_pdf_multiline_and_escapes():
    pages = ["a(b)c \\ d\nsecond (line)", "page2\nwith\nthree lines"]
    pdf = P.build_pdf(pages)
    got = ["\n".join(s.text for s in pg) for pg in P.extract_pages(pdf)]
    assert got == pages


def test_pdf_page_range_pushdown():
    pdf = P.build_pdf([f"page {i}" for i in range(1, 8)])
    window = P.extract_pages(pdf, first_page=3, last_page=5)
    assert [P.page_text(pg) for pg in window] == ["page 3", "page 4", "page 5"]


def test_pdf_rejects_garbage():
    for bad in (b"", b"hello", b"%PDF-1.4\ntruncated"):
        if bad[:5] == b"%PDF-":
            assert P.page_count(bad) == 0
        else:
            try:
                P.page_count(bad)
                raised = False
            except ValueError:
                raised = True
            assert raised


@given(st.text(min_size=0, max_size=200))
@settings(max_examples=50, deadline=None)
def test_png_text_roundtrip_property(text):
    png = G.encode_page_png(text)
    assert G.decode_stub_text(png) == text
    w, h = G.decode_dimensions(png)
    assert len(G.decode_pixels(png)) == w * h


def test_png_pixels_differ_by_text():
    a = G.decode_pixels(G.encode_page_png("alpha"))
    b = G.decode_pixels(G.encode_page_png("beta"))
    assert a != b


def test_reading_order_reconstruction():
    spans = [
        P.Span(300, 700, "right-top"),
        P.Span(72, 700, "left-top"),
        P.Span(72, 650, "second-row"),
        P.Span(72, 600, "third-row"),
    ]
    assert P.page_text(spans) == "left-top right-top\nsecond-row\nthird-row"


def test_flate_compressed_roundtrip():
    pages = ["compressed page one\nsecond line", "page (two) \\ with escapes"]
    pdf = P.build_pdf(pages, compress=True)
    assert b"/FlateDecode" in pdf
    assert P.page_count(pdf) == 2
    assert [P.page_text(pg) for pg in P.extract_pages(pdf)] == pages
    window = P.extract_pages(pdf, first_page=2, last_page=2)
    assert P.page_text(window[0]) == pages[1]


def test_flate_garbage_stream_is_sentinel_safe():
    pdf = P.build_pdf(["x"], compress=True)
    corrupted = pdf.replace(b"stream\n", b"stream\n\x00\x01", 1)
    pages = P.extract_pages(corrupted)
    assert pages == [[]]  # undecodable stream -> empty page, no crash


# ---------------------------------------------------------------- PDF 1.5 era


@given(st.lists(st.lists(printable, min_size=1, max_size=4), min_size=1, max_size=4))
@settings(max_examples=40, deadline=None)
def test_pdf15_matches_classic_writer_property(pages_lines):
    """ObjStm + xref-stream + split-content + Tm/TL/' files must extract
    byte-identically to the classic Td-chain writer at the same layout."""
    pages = ["\n".join(lines) for lines in pages_lines]
    p14 = P.build_pdf(pages)
    p15 = P.build_pdf_15(pages)
    assert P.page_count(p15) == len(pages)
    got14 = [P.page_text(pg) for pg in P.extract_pages(p14)]
    got15 = [P.page_text(pg) for pg in P.extract_pages(p15)]
    assert got15 == got14


def test_pdf15_page_tree_really_lives_in_objstm():
    """The 1.5 fixture is a genuinely different file class: no page object is
    visible to a plain obj..endobj scan (they are flate-packed in /ObjStm) and
    there is no classic xref table — the features the parser grew this round."""
    pdf = P.build_pdf_15(["page one text", "page two text"])
    assert b"/Type /Page" not in pdf  # compressed away inside the ObjStm
    assert b"\nxref\n" not in pdf  # xref STREAM, not a classic table
    assert b"/Type /ObjStm" in pdf and b"/Type /XRef" in pdf
    assert P.page_count(pdf) == 2
    texts = [P.page_text(pg) for pg in P.extract_pages(pdf)]
    assert texts == ["page one text", "page two text"]


def test_pdf15_page_range_pushdown():
    pdf = P.build_pdf_15([f"page {i}\nsecond line {i}" for i in range(1, 6)])
    window = P.extract_pages(pdf, first_page=2, last_page=3)
    assert [P.page_text(pg) for pg in window] == [
        "page 2\nsecond line 2", "page 3\nsecond line 3"
    ]


def test_contents_array_state_carries_across_streams():
    """Graphics state (origin, leading) set in content stream A must apply in
    stream B of the same page — the spec treats the array as ONE stream."""
    pdf = P.build_pdf_15(["l1\nl2\nl3\nl4"])  # splits 2+2 across streams
    (spans,) = P.extract_pages(pdf)
    ys = [s.y for s in spans]
    assert ys == [720.0, 706.0, 692.0, 678.0]  # 14pt leading throughout


def test_hex_strings_in_content_streams():
    """<hex> string operands for Tj and inside TJ arrays (PDF §7.3.4.3):
    whitespace-tolerant, odd length pads a trailing zero nibble."""
    base = P.build_pdf(["placeholder"])
    content = (
        b"BT /F1 12 Tf 72 720 Td <48656C6C6F> Tj "
        b"0 -14 Td [(mi) -120 <78 65 64> (!)] TJ "
        b"0 -14 Td <4A7> Tj ET"  # odd length -> 0x4A 0x70 = 'Jp'
    )
    # patch the fixture's content object wholesale with the hex-string ops
    import re as _re

    pdf = _re.sub(
        rb"<< /Length \d+ >>\nstream\n.*?\nendstream",
        b"<< /Length %d >>\nstream\n%s\nendstream" % (len(content), content),
        base,
        count=1,
        flags=_re.S,
    )
    (spans,) = P.extract_pages(pdf)
    assert [s.text for s in spans] == ["Hello", "mixed!", "Jp"]
    assert P.page_text(spans) == "Hello\nmixed!\nJp"


def test_nested_page_tree_walked_in_order():
    """Real large PDFs balance the page tree with intermediate /Pages nodes;
    page order and count must come from a DFS of the leaves, not the root's
    immediate /Kids (which here are internal nodes, not pages)."""

    def obj(n: int, body: bytes) -> bytes:
        return b"%d 0 obj\n" % n + body + b"\nendobj\n"

    def content(n: int, text: bytes) -> bytes:
        s = b"BT /F1 12 Tf 72 720 Td (" + text + b") Tj ET"
        return obj(n, b"<< /Length %d >>\nstream\n%s\nendstream" % (len(s), s))

    def page(n: int, parent: int, contents: int) -> bytes:
        return obj(
            n,
            b"<< /Type /Page /Parent %d 0 R /MediaBox [0 0 612 792] "
            b"/Resources << /Font << /F1 11 0 R >> >> /Contents %d 0 R >>"
            % (parent, contents),
        )

    buf = bytearray(b"%PDF-1.4\n")
    buf += obj(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    buf += obj(2, b"<< /Type /Pages /Kids [3 0 R 4 0 R] /Count 3 >>")
    buf += obj(3, b"<< /Type /Pages /Parent 2 0 R /Kids [5 0 R 6 0 R] /Count 2 >>")
    buf += obj(4, b"<< /Type /Pages /Parent 2 0 R /Kids [7 0 R] /Count 1 >>")
    buf += page(5, 3, 8) + page(6, 3, 9) + page(7, 4, 10)
    buf += content(8, b"page one") + content(9, b"page two") + content(10, b"page three")
    buf += obj(11, b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    buf += b"trailer\n<< /Size 12 /Root 1 0 R >>\n%%EOF\n"
    pdf = bytes(buf)

    assert P.page_count(pdf) == 3  # leaves, not the root's 2 internal kids
    texts = [P.page_text(pg) for pg in P.extract_pages(pdf)]
    assert texts == ["page one", "page two", "page three"]
    # page-range pushdown still 1-based over the LEAF order
    (mid,) = P.extract_pages(pdf, first_page=2, last_page=2)
    assert P.page_text(mid) == "page two"


@given(st.integers(min_value=1, max_value=40), st.integers(min_value=1, max_value=40),
       st.integers(min_value=0, max_value=2**32 - 1))
@settings(max_examples=30, deadline=None)
def test_gray_png_roundtrip_property(w, h, seed):
    import zlib as _z

    px = bytes((seed * 2654435761 + i * 40503) % 251 for i in range(w * h))
    png = G.encode_gray_png(px, w, h)
    assert G.decode_dimensions(png) == (w, h)
    assert G.decode_pixels(png) == px
    assert _z.crc32(png) is not None  # valid container end-to-end


# ------------------------------------------------------ round 3: font tables


def test_tounicode_cmap_byte_identity():
    """Non-WinAnsi text must extract byte-identically THROUGH the /ToUnicode
    CMap (the content stream carries custom byte codes, so a latin-1 parse
    CANNOT produce this text — the mapping is genuinely exercised)."""
    pages = ["héllo wörld — café\nnaïve ψυχη résumé",
             "second pagé\nwith ümlauts ß and π"]
    pdf = P.build_pdf_tounicode(pages, mode="tounicode")
    assert [P.page_text(s) for s in P.extract_pages(pdf)] == pages
    # the custom code bytes really are in the file (not the utf-8 text)
    assert "é".encode() not in pdf.split(b"beginbfchar")[0].split(b"stream")[0]


def test_encoding_differences_byte_identity():
    pages = ["héllo wörld café\nnaïve ψυχη résumé"]
    pdf = P.build_pdf_tounicode(pages, mode="differences")
    assert [P.page_text(s) for s in P.extract_pages(pdf)] == pages


def test_inline_images_do_not_corrupt_text():
    """BI…ID…EI binary payloads contain fake Tj/Td operators — the tokenizer
    must skip the whole inline image."""
    pages = ["line one\nline two\nline three", "päge twö\nlast löne"]
    pdf = P.build_pdf_tounicode(pages, mode="tounicode", inline_images=True)
    assert [P.page_text(s) for s in P.extract_pages(pdf)] == pages


@given(st.lists(st.text(
    alphabet="aä bc…é—ψπß√ñ€°", min_size=1, max_size=40), min_size=1, max_size=4))
@settings(max_examples=25, deadline=None)
def test_tounicode_property(lines):
    """Any unicode text (arbitrary planes via uniXXXX-free CMap path) round-
    trips byte-identically through encode → ToUnicode-decode."""
    pages = ["\n".join(lines)]
    pdf = P.build_pdf_tounicode(pages, mode="tounicode")
    assert [P.page_text(s) for s in P.extract_pages(pdf)] == pages


def test_winansi_base_encoding_applies():
    """A font declaring /Encoding /WinAnsiEncoding must decode 0x80-0x9F via
    cp1252 (e.g. 0x93/0x94 are curly quotes), not latin-1 control chars."""
    def obj(n, body):
        return b"%d 0 obj\n" % n + body + b"\nendobj\n"

    stream = b"BT /F1 12 Tf 72 720 Td (\x93quoted\x94 \x85) Tj ET"
    buf = bytearray(b"%PDF-1.4\n")
    buf += obj(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    buf += obj(2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    buf += obj(3, b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                  b"/Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >>")
    buf += obj(4, b"<< /Length %d >>\nstream\n%s\nendstream" % (len(stream), stream))
    buf += obj(5, b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
                  b"/Encoding /WinAnsiEncoding >>")
    buf += b"trailer\n<< /Size 6 /Root 1 0 R >>\n%%EOF\n"
    (page,) = P.extract_pages(bytes(buf))
    assert P.page_text(page) == "“quoted” …"


def test_page_count_partial_tree_uses_root_count():
    """Damaged file: /Kids reference objects missing from the body — the DFS
    finds fewer leaves, but the root /Count floors the probe (round-3
    advice: partial trees must not silently under-report)."""
    def obj(n, body):
        return b"%d 0 obj\n" % n + body + b"\nendobj\n"

    buf = bytearray(b"%PDF-1.4\n")
    buf += obj(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    # declares 3 pages but objects 6 and 7 are missing (truncated file)
    buf += obj(2, b"<< /Type /Pages /Kids [3 0 R 6 0 R 7 0 R] /Count 3 >>")
    buf += obj(3, b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                  b"/Contents 4 0 R >>")
    buf += obj(4, b"<< /Length 30 >>\nstream\nBT 72 720 Td (only page) Tj ET\nendstream")
    buf += b"trailer\n<< /Size 5 /Root 1 0 R >>\n%%EOF\n"
    assert P.page_count(bytes(buf)) == 3
    # extraction still yields the one parseable page
    assert [P.page_text(s) for s in P.extract_pages(bytes(buf))] == ["only page"]


def test_type0_identity_h_cid_font_byte_identity():
    """Composite /Type0 /Identity-H fonts (the embedded-subset-TrueType norm
    in modern crawls): show strings are 2-byte CID sequences meaningful only
    through the /ToUnicode CMap — text must round-trip byte-identically and
    the raw text bytes must NOT be present in the file."""
    pages = ["héllo CID wörld — ψ\nsecond line ümlaut", "page twö\nlast"]
    pdf = P.build_pdf_type0(pages)
    assert [P.page_text(s) for s in P.extract_pages(pdf)] == pages
    assert "héllo".encode() not in pdf and b"hello" not in pdf


@given(st.lists(st.text(alphabet="abλπ …é—z9", min_size=1, max_size=30),
                min_size=1, max_size=3))
@settings(max_examples=20, deadline=None)
def test_type0_property(lines):
    pages = ["\n".join(lines)]
    assert [P.page_text(s) for s in P.extract_pages(P.build_pdf_type0(pages))] == pages


def test_png_predictor_coded_stream_decodes():
    """FlateDecode + /DecodeParms /Predictor 12 (PNG Up row predictor — the
    near-universal xref-stream coding in the wild) must inflate AND
    un-predict before tokenizing."""
    import zlib as _z

    content = b"BT /F1 12 Tf 72 720 Td (predicted text) Tj ET"
    cols = 16
    padded = content + b" " * ((-len(content)) % cols)
    rows, prev, out = [padded[i:i + cols] for i in range(0, len(padded), cols)], bytes(cols), bytearray()
    for r in rows:
        out += bytes([2]) + bytes((r[i] - prev[i]) & 0xFF for i in range(cols))
        prev = r
    payload = _z.compress(bytes(out))
    body = (
        b"<< /Length %d /Filter /FlateDecode /DecodeParms "
        b"<< /Predictor 12 /Columns %d >> >>\nstream\n" % (len(payload), cols)
    ) + payload + b"\nendstream"
    decoded = P._stream_bytes(body)
    assert decoded.rstrip(b" ") == content
    assert P.page_text(P._parse_content(decoded)) == "predicted text"


def test_png_unpredict_all_filter_types():
    """Round-trip every PNG filter type (None/Sub/Up/Average/Paeth) through
    the un-predictor against a reference forward implementation."""
    cols, bpp = 8, 1
    data = bytes((i * 37 + 11) % 256 for i in range(cols * 5))
    rows = [data[i:i + cols] for i in range(0, len(data), cols)]

    def fwd(ftype):
        prev, enc = bytes(cols), bytearray()
        for r in rows:
            enc.append(ftype)
            for i in range(cols):
                a = r[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                if ftype == 0:
                    pred = 0
                elif ftype == 1:
                    pred = a
                elif ftype == 2:
                    pred = b
                elif ftype == 3:
                    pred = (a + b) >> 1
                else:
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                enc.append((r[i] - pred) & 0xFF)
            prev = r
        return bytes(enc)

    for ftype in range(5):
        assert P._png_unpredict(fwd(ftype), cols, 1, 8) == data, ftype


def test_encrypted_pdf_empty_user_password_decrypts():
    """Standard security handler (RC4, owner-locked, EMPTY user password —
    the dominant encrypted shape in crawls): streams are byte-encrypted in
    the file yet text extracts byte-identically through the handler."""
    pages = ["secret page one\nline two", "page two content"]
    for rev in (2, 3):  # 40-bit /V1 and 128-bit /V2
        pdf = P.build_pdf_encrypted(pages, revision=rev)
        assert b"secret page one" not in pdf
        assert P.page_count(pdf) == 2
        assert [P.page_text(s) for s in P.extract_pages(pdf)] == pages


def test_encrypted_pdf_with_real_user_password_is_rejected_loudly():
    import re as _re

    pdf = P.build_pdf_encrypted(["x"], revision=3)
    bad = _re.sub(rb"/U <([0-9A-F]{8})", rb"/U <00000000", pdf)
    with pytest.raises(ValueError, match="password required"):
        P.extract_pages(bad)
    with pytest.raises(ValueError, match="password required"):
        P.page_count(bad)


def test_locked_pdf_flows_to_sentinel_in_pipeline(spark):
    """A password-locked (or AES) PDF must not kill the job: the split stage
    catches the ValueError and emits the standard parse-failure sentinel
    (url survives with extracted_text='', n_pages=0)."""
    import re as _re

    from gnosis_ocr_spark.operators.pdf_split import split_pdf_text_pages
    from gnosis_ocr_spark.operators.layout import assemble_documents

    ok = P.build_pdf_encrypted(["readable page"])
    locked = _re.sub(rb"/U <([0-9A-F]{8})", rb"/U <00000000", ok)
    df = spark.createDataFrame(
        [("ok", bytearray(ok)), ("locked", bytearray(locked))],
        schema="url string, html binary",
    )
    out = {r["url"]: r for r in
           assemble_documents(split_pdf_text_pages(df)).collect()}
    assert out["ok"]["extracted_text"] == "readable page"
    assert out["locked"]["extracted_text"] == "" and out["locked"]["n_pages"] == 0


# ---------------------------------------------------------------- filters


@given(st.lists(printable, min_size=1, max_size=3), st.booleans())
@settings(max_examples=40, deadline=None)
def test_filter_chain_property(pages, indirect):
    """Every supported /Filter chain — singles and stacked chains — must
    extract byte-identically to the uncompressed writer, with both direct
    and indirect (/Length n 0 R) stream lengths."""
    chains = [
        ("ASCIIHexDecode",),
        ("ASCII85Decode",),
        ("RunLengthDecode",),
        ("LZWDecode",),
        ("ASCII85Decode", "FlateDecode"),
        ("ASCIIHexDecode", "LZWDecode"),
        ("ASCII85Decode", "RunLengthDecode"),
    ]
    for chain in chains:
        pdf = P.build_pdf_filtered(pages, filters=chain, indirect_length=indirect)
        assert P.page_count(pdf) == len(pages), chain
        got = [P.page_text(s) for s in P.extract_pages(pdf)]
        assert got == pages, chain


def test_lzw_roundtrip_crosses_width_boundaries():
    """Encoder/decoder bit-compatibility across the 9→10→11→12-bit width
    transitions and a mid-stream table reset (>4k table entries)."""
    data = bytes((i * 7 + (i >> 3) * 131 + (i >> 7) * 17) % 256
                 for i in range(60_000))
    assert P._lzw_decode(P._lzw_encode(data)) == data


def test_lzw_early_change_zero():
    """/EarlyChange 0 shifts the width schedule by one entry; both coder
    sides must honor it (PDF default is 1)."""
    data = bytes((i * 13 + 5) % 251 for i in range(20_000))
    assert P._lzw_decode(P._lzw_encode(data, early_change=0), early_change=0) == data

def test_lzw_eoi_width_at_early_change_boundary():
    """Regression (round 5): a stream whose table lands exactly on the
    early-change boundary at the LAST data code must frame EOI at the
    bumped width — the old encoder wrote it one bit narrow and decoders
    (ours, libtiff) read a spurious trailing entry. n=769 random bytes is
    the minimal-ish shape that lands the table on the 10→11-bit edge."""
    import random

    rnd = random.Random(1)
    for ec in (0, 1):
        for n in (511, 512, 765, 766, 767, 768, 769, 770, 1021, 1022, 1023):
            raw = bytes(rnd.randrange(256) for _ in range(n))
            enc = P._lzw_encode(raw, early_change=ec)
            assert P._lzw_decode(enc, early_change=ec, max_out=n) == raw



def test_rle_decode_spec_vectors():
    # literal run, repeat run, EOD mid-stream (trailing bytes ignored)
    assert P._rle_decode(bytes([2]) + b"abc" + bytes([254]) + b"x" + bytes([128]) + b"IGNORED") == b"abcxxx"
    assert P._rle_decode(P._rle_encode(b"aaaaabcdefffffff" * 40)) == b"aaaaabcdefffffff" * 40


def test_ascii85_decode_z_shortcut_and_partial_group():
    assert P._ascii85_decode(b"z~>") == b"\x00\x00\x00\x00"
    import base64
    msg = b"hello world!"
    assert P._ascii85_decode(base64.a85encode(msg) + b"~>") == msg
    # Adobe <~ framing tolerated
    assert P._ascii85_decode(b"<~" + base64.a85encode(msg) + b"~>") == msg


def test_unknown_image_filter_is_sentinel_safe():
    """/DCTDecode (JPEG XObjects) carries no text operators; the stream must
    decode to None (sentinel) instead of raising or emitting garbage."""
    body = b"<< /Length 4 /Filter /DCTDecode >>\nstream\n\xff\xd8\xff\xe0\nendstream"
    assert P._stream_bytes(body) is None


def test_indirect_length_with_endstream_bytes_in_payload():
    """An indirect /Length must slice the exact span even when the
    compressed payload happens to contain the literal 'endstream'."""
    import zlib
    # craft a payload containing b"endstream" after compression is hopeless;
    # instead use an UNFILTERED stream whose text contains it
    content = b"BT /F1 12 Tf 72 720 Td (fake endstream inside) Tj ET"
    objs = {9: b" %d " % len(content)}
    body = b"<< /Length 9 0 R >>\nstream\n" + content + b"\nendstream"
    assert P._stream_bytes(body, None, objs) == content


def test_tj_kerned_word_gaps_recover_spaces():
    """Kerning-only word breaks: no 0x20 appears in any show string, yet the
    extracted text matches the original (TJ_SPACE_KERN heuristic); small
    intra-word kerns must NOT introduce spaces."""
    pages = ["hello kerned world\nsecond line here", "one two"]
    pdf = P.build_pdf_tj_kerned(pages)
    # the space character never appears inside a literal show string
    import re as _re
    for m in _re.finditer(rb"\(((?:[^()\\]|\\.)*)\)", pdf):
        assert b" " not in m.group(1)
    assert [P.page_text(s) for s in P.extract_pages(pdf)] == pages


@given(st.lists(st.text(alphabet=st.characters(min_codepoint=33, max_codepoint=126,
                                               exclude_characters="[]<>"),
                        min_size=1, max_size=12),
                min_size=1, max_size=8))
@settings(max_examples=60, deadline=None)
def test_tj_kerned_property(words):
    line = " ".join(words)
    pdf = P.build_pdf_tj_kerned([line])
    assert [P.page_text(s) for s in P.extract_pages(pdf)] == [line]


def test_incremental_update_latest_definition_wins():
    """PDFs saved with incremental updates append redefined objects at the
    end of the file (older bodies remain); the scan must honor the LATEST
    definition — here the update rewrites page 1's content stream."""
    pdf = P.build_pdf(["original first page", "second page"])
    # find page 1's /Contents object number, then append a new definition
    import re as _re
    m = _re.search(rb"/Type /Page .*?/Contents (\d+) 0 R", pdf, _re.S)
    content_no = int(m.group(1))
    new_stream = b"BT /F1 12 Tf 72 720 Td (updated first page) Tj ET"
    update = b"%d 0 obj\n<< /Length %d >>\nstream\n%s\nendstream\nendobj\n" % (
        content_no, len(new_stream), new_stream
    )
    updated = pdf + update  # (no new xref section needed for a scan parser)
    assert [P.page_text(s) for s in P.extract_pages(updated)] == [
        "updated first page", "second page"
    ]
    # the original, un-updated file is untouched semantics
    assert P.page_text(P.extract_pages(pdf)[0]) == "original first page"


def test_annotation_appearance_extraction():
    """Visible /AP /N appearance text extracts in reading order; hidden
    (/F 2) appearances and bare /Link annots contribute nothing; the /AS
    state dictionary selects the /On stream, never the /Off decoy."""
    pages = ["alpha one\nbeta two\ngamma three", "single annot line"]
    for sd in (False, True):
        pdf = P.build_pdf_annots(pages, state_dict=sd)
        got = [P.page_text(s) for s in P.extract_pages(pdf)]
        assert got == pages, (sd, got)
        joined = "\n\n".join(got)
        assert "HIDDEN" not in joined and "DECOY" not in joined
        assert "sticky-note" not in joined  # /Contents string never used


def test_annotation_only_page_is_a_text_page():
    """A page whose only text lives in an annotation appearance must route
    as a TEXT page (poppler renders it), never fall through to the
    image/OCR branch."""
    pdf = P.build_pdf_annots(["only the annotation speaks"])
    (spans, images), = P.extract_pages_with_images(pdf)
    assert spans and not images
    assert P.page_text(spans) == "only the annotation speaks"


def test_annotation_rect_places_reading_order():
    """The appearance BBox lower-left maps to the Rect lower-left, so an
    annotation high on the page sorts BEFORE lower content text."""
    # visible annot carries the LAST split line but at Rect y=90 (bottom);
    # content lines render from y=706 down — reading order keeps content
    # first. This is the writer's layout contract; pin it explicitly.
    pdf = P.build_pdf_annots(["top content\nbottom annot"])
    spans = P.extract_pages(pdf)[0]
    ys = {s.text: s.y for s in spans}
    assert ys["top content"] > ys["bottom annot"]


def test_dquote_show_operator():
    """The '"' operator (aw ac (s) \") sets word/char spacing, advances one
    leading, and shows — poppler treats it as T* + show; spacing operands
    have no effect on span extraction."""
    content = (b"BT /F1 12 Tf 14 TL 1 0 0 1 72 720 Tm (first line) Tj "
               b"0.5 0 (second via dquote) \" (third) ' ET")
    body = b"<< /Length %d >>\nstream\n%s\nendstream" % (len(content), content)
    spans = P._parse_content(P._stream_bytes(body))
    assert P.page_text(spans) == "first line\nsecond via dquote\nthird"


@given(
    st.integers(min_value=0, max_value=10**9),
    st.lists(st.tuples(st.integers(0, 10**6), st.integers(0, 255)),
             min_size=1, max_size=12),
)
@settings(max_examples=80, deadline=None)
def test_mutated_pdf_never_escapes_the_sentinel_contract(seed, flips):
    """Crawl-grade robustness: ANY byte-mutated PDF must either parse (to
    some spans) or raise an ordinary exception that pdf_split's broad
    except flows into the parse-failure sentinel — never a RecursionError
    or MemoryError (the classes that would take down an executor rather
    than one row) and never a hang. Mutations hit every writer class."""
    import random as _rnd

    rng = _rnd.Random(seed)
    pages = ["some page text\nsecond line", "two"]
    builders = [
        lambda: P.build_pdf(pages, compress=True),
        lambda: P.build_pdf_15(pages),
        lambda: P.build_pdf_filtered(pages, filters=("LZWDecode",)),
        lambda: P.build_pdf_encrypted(pages),
        lambda: P.build_pdf_type0(pages),
        lambda: P.build_pdf_tj_kerned(pages),
        lambda: P.build_pdf_form_xobject(pages),
        lambda: P.build_pdf_encrypted(pages, revision=4),
        lambda: P.build_pdf_type0(pages, custom_cmap=True),
        lambda: P.build_pdf_scanned(pages),
        lambda: P.build_pdf_type0(pages, predefined="UniGB-UCS2-H"),
        lambda: P.build_pdf_scanned(pages, image_filter="jpeg"),
        lambda: P.build_pdf_scanned(
            pages, width=128, height=128, image_filter="g4"
        ),
        lambda: P.build_pdf_annots(pages),
        lambda: P.build_pdf_annots(pages, state_dict=True),
        lambda: P.build_pdf_scanned(
            pages, width=128, height=128, image_filter="raw1"
        ),
        lambda: P.build_pdf_type0(
            pages, predefined="GBK-EUC-H", charset="gbk"
        ),
        lambda: P.build_pdf_scanned(pages, image_filter="inline"),
        lambda: P.build_pdf_embedded_font(pages, kind="type1"),
        lambda: P.build_pdf_embedded_font(pages, kind="truetype"),
        lambda: P.build_pdf_embedded_font(pages, kind="cff"),
        lambda: P.build_pdf_incremental(pages),
        lambda: P.build_pdf_incremental(pages, objstm=True),
        lambda: P.build_pdf_matrix(pages),
        lambda: P.build_pdf_rotate(pages),
        lambda: P.build_pdf_rotate(pages, inherit=True),
        lambda: P.build_pdf_scanned(pages, rotate=90),
        lambda: P.build_pdf_scanned(pages, rotate=270),
        lambda: P.build_pdf_actualtext(pages),
        lambda: P.build_pdf_ocg(pages),
        lambda: P.build_pdf_type3(pages),
        lambda: P.build_pdf_scanned(pages, image_filter="indexed"),
        lambda: P.build_pdf_scanned(pages, image_filter="cmyk"),
    ]
    pdf = bytearray(builders[seed % len(builders)]())
    for pos, val in flips:
        pdf[pos % len(pdf)] = val
    try:
        pgs = P.extract_pages(bytes(pdf))
        assert isinstance(pgs, list)
        for spans in pgs:
            P.page_text(spans)
        P.page_count(bytes(pdf))
    except (RecursionError, MemoryError):
        raise
    except Exception:
        pass  # pdf_split catches Exception into the sentinel row


def test_stray_numeric_garbage_skips_token_not_document():
    """'.'-like tokens that [\\d.]+ would match but float() rejects must be
    skipped (losing at most that token), never raise and sentinel the doc."""
    content = (b"BT /F1 12 Tf 14 TL 72 720 Td (keep me) Tj "
               b"[(a) . (b) 1.2.3 (c) -250 (d)] TJ "
               b". . Td (still here) Tj ET")
    body = b"<< /Length %d >>\nstream\n%s\nendstream" % (len(content), content)
    spans = P._parse_content(P._stream_bytes(body))
    text = " ".join(s.text for s in spans)
    assert "keep me" in text and "still here" in text
    # 1.2.3 tokenizes as 1.2 and .3 — small kerns, no space, no crash
    assert "abc d" in text


def test_quote_and_dquote_hex_operands():
    content = (b"BT /F1 12 Tf 14 TL 1 0 0 1 72 720 Tm (lead) Tj "
               b"<68657820717578> ' "
               b"0 0 <68657820647175> \" ET")
    body = b"<< /Length %d >>\nstream\n%s\nendstream" % (len(content), content)
    assert P.page_text(P._parse_content(P._stream_bytes(body))) == (
        "lead\nhex qux\nhex dqu"
    )


def test_form_xobject_roundtrip_matches_plain_writer():
    pages = ["first line\nsecond line\nthird", "only one line", "a\nb"]
    pdf = P.build_pdf_form_xobject(pages)
    got = [P.page_text(s) for s in P.extract_pages(pdf)]
    assert got == pages
    assert got == [P.page_text(s) for s in P.extract_pages(P.build_pdf(pages))]
    assert P.page_count(pdf) == 3


def test_matrix_writer_roundtrip_matches_plain_writer():
    """Full-affine writer (plain Tm / q+cm / rotated-Tm+Td / rotated
    TL+T*) reconstructs byte-identically to the plain writer — certifies
    the Trm = Tlm·CTM composition, because an untransformed reading
    places three of the four shapes at wrong coordinates."""
    pages = [
        "one two\nthree four\nfive six\nseven eight\nnine ten",
        "single",
        "a\nb\nc",
    ]
    pdf = P.build_pdf_matrix(pages)
    got = [P.page_text(s) for s in P.extract_pages(pdf)]
    assert got == pages
    assert got == [P.page_text(s) for s in P.extract_pages(P.build_pdf(pages))]


def test_affine_text_and_ctm_composition():
    """Direct _parse_content semantics of the §9.4.2/§8.4.4 state machine."""
    def spans_of(content: bytes):
        body = b"<< /Length %d >>\nstream\n%s\nendstream" % (
            len(content), content)
        return P._parse_content(P._stream_bytes(body))

    # Td composes THROUGH a rotated Tm: 50 right in text space = 50 DOWN
    s = spans_of(b"BT 0 -1 1 0 72 770 Tm 50 0 Td (r) Tj ET")
    assert (s[0].x, s[0].y) == (72.0, 720.0)
    # T* composes through rotation via the leading
    s = spans_of(b"BT 14 TL 0 -1 1 0 86 720 Tm T* (t) Tj ET")
    assert (s[0].x, s[0].y) == (72.0, 720.0)
    # ' (T*-then-show) composes the same way
    s = spans_of(b"BT 14 TL 0 -1 1 0 86 720 Tm (l) ' ET")
    assert (s[0].x, s[0].y) == (72.0, 720.0)
    # cm translates; Q restores past a decoy scaled push
    s = spans_of(
        b"q 3 0 0 3 9 9 cm Q q 1 0 0 1 10 20 cm BT (a) Tj ET Q BT (b) Tj ET"
    )
    assert [(p.x, p.y) for p in s] == [(10.0, 20.0), (0.0, 0.0)]
    # scaled CTM multiplies a Tm translation (Trm = Tlm x CTM)
    s = spans_of(b"q 2 0 0 2 0 0 cm BT 1 0 0 1 30 40 Tm (a) Tj ET Q")
    assert (s[0].x, s[0].y) == (60.0, 80.0)
    # unbalanced Q degrades to identity, never raises
    s = spans_of(b"Q Q BT 1 0 0 1 5 6 Tm (x) Tj ET")
    assert (s[0].x, s[0].y) == (5.0, 6.0)
    # BT resets the text matrix but NOT the CTM
    s = spans_of(b"1 0 0 1 7 8 cm BT (x) Tj ET BT (y) Tj ET")
    assert [(p.x, p.y) for p in s] == [(7.0, 8.0), (7.0, 8.0)]


def test_rotate_writer_all_three_rotations_and_inheritance():
    """/Rotate 90/180/270 pages authored in rotated space reconstruct
    byte-identically to the plain writer, with /Rotate on the page dict
    AND inherited from the /Pages root. Without display normalization a
    90°/270° page's lines share one y row and would join with spaces."""
    for n in (1, 2, 3):  # page count picks the rotation: 90/180/270
        pages = [f"alpha {k}\nbravo {k}\ncharlie {k}" for k in range(n)]
        for inherit in (False, True):
            pdf = P.build_pdf_rotate(pages, inherit=inherit)
            got = [P.page_text(s) for s in P.extract_pages(pdf)]
            assert got == pages, (n, inherit)
            assert P.page_count(pdf) == n


def test_actualtext_replaces_enclosed_shows():
    """§14.9.4 semantics: the OUTERMOST /ActualText region substitutes
    for everything it encloses, at the first show's position; nested
    regions and UTF-16BE text strings decode; stray EMC never breaks."""
    def spans_of(content: bytes):
        body = b"<< /Length %d >>\nstream\n%s\nendstream" % (
            len(content), content)
        return P._parse_content(P._stream_bytes(body))

    s = spans_of(
        b"BT 1 0 0 1 72 720 Tm (keep) Tj ET "
        b"BT 1 0 0 1 72 706 Tm /Span << /ActualText (real) >> BDC "
        b"(dec) Tj 2 0 Td (oy) Tj EMC ET"
    )
    assert P.page_text(s) == "keep\nreal"
    assert (s[1].x, s[1].y) == (72.0, 706.0)
    # outer region wins over nested BMC and nested ActualText
    s = spans_of(
        b"BT 1 0 0 1 72 720 Tm /Span << /ActualText (outer) >> BDC "
        b"/P BMC (a) Tj EMC /Span << /ActualText (inner) >> BDC (b) Tj "
        b"EMC (c) Tj EMC (after) Tj ET"
    )
    assert [p.text for p in s] == ["outer", "after"]
    # UTF-16BE hex text string: BOM stripped, code units decoded
    s = spans_of(
        b"BT /Span << /ActualText <FEFF00660069> >> BDC (x) Tj EMC ET"
    )
    assert [p.text for p in s] == ["fi"]
    # empty region emits at EMC-time origin; stray EMC is harmless
    s = spans_of(
        b"EMC BT 1 0 0 1 30 40 Tm /Span << /ActualText (ghost) >> BDC "
        b"EMC (ok) Tj ET EMC"
    )
    assert [(p.x, p.y, p.text) for p in s] == [
        (30.0, 40.0, "ghost"), (30.0, 40.0, "ok"),
    ]


def test_ocg_hidden_layer_suppressed_visible_layer_extracts():
    """§8.11 optional content: /OC regions of an OCG in the default
    config's /OFF array must not extract (incl. visible nested inside
    hidden); ON-by-default regions must. Negative control: breaking the
    /OFF array makes the decoys leak — the feature is load-bearing."""
    pages = ["alpha one\nbeta two\ngamma three", "solo"]
    pdf = P.build_pdf_ocg(pages)
    got = [P.page_text(s) for s in P.extract_pages(pdf)]
    assert got == pages
    assert got == [P.page_text(s) for s in P.extract_pages(P.build_pdf(pages))]
    leaked = P.extract_pages(pdf.replace(b"/OFF [", b"/XFF ["))
    assert "DRAFT WATERMARK" in P.page_text(leaked[0])
    assert "NESTED DECOY" in P.page_text(leaked[0])


def test_actualtext_writer_roundtrip_matches_plain_writer():
    pages = ["alpha one\nbeta two\ngamma three\ndelta four", "solo", "a\nb"]
    pdf = P.build_pdf_actualtext(pages)
    got = [P.page_text(s) for s in P.extract_pages(pdf)]
    assert got == pages
    assert got == [P.page_text(s) for s in P.extract_pages(P.build_pdf(pages))]


def test_scanned_rotate_roundtrips_through_split_and_materialize():
    """Image-only /Rotate pages: samples stored sideways must come back
    upright through the split → GIMG pack → materialize seam (the same
    orientation poppler rasterizes for the reference's OCR)."""
    from gnosis_ocr_spark.operators.pdf_split import (
        _materialize_scan,
        _pdf_page_rows,
    )

    pages = ["rotated scan line\nsecond line", "page two text"]
    for rot in (0, 90, 180, 270):
        pdf = P.build_pdf_scanned(pages, rotate=rot)
        got = []
        for txt, png in _pdf_page_rows(pdf):
            assert txt is None
            got.append(G.decode_scan_png_text(_materialize_scan(png, 64, 64)))
        assert got == pages, rot
    with pytest.raises(ValueError):
        P.build_pdf_scanned(pages, image_filter="g4", rotate=90)


def test_page_rotation_lookup_edges():
    # absent → 0; non-multiple-of-90 degrades to 0; negatives normalize
    assert P._page_rotation({}, b"<< /Type /Page >>") == 0
    assert P._page_rotation({}, b"<< /Type /Page /Rotate 45 >>") == 0
    assert P._page_rotation({}, b"<< /Type /Page /Rotate -90 >>") == 270
    assert P._page_rotation({}, b"<< /Type /Page /Rotate 450 >>") == 90
    # inherited through /Parent; a parent CYCLE must terminate at 0
    objs = {2: b"<< /Type /Pages /Rotate 180 >>"}
    assert P._page_rotation(objs, b"<< /Parent 2 0 R >>") == 180
    cyc = {2: b"<< /Parent 3 0 R >>", 3: b"<< /Parent 2 0 R >>"}
    assert P._page_rotation(cyc, b"<< /Parent 2 0 R >>") == 0


def _wrap_stream(body_dict: bytes, content: bytes) -> bytes:
    return body_dict + b" /Length %d >>\nstream\n%s\nendstream" % (
        len(content), content)


def test_nested_form_xobjects_and_cycle_guard():
    """A form invoking a second form extracts both; a self-referencing form
    terminates (cycle guard) keeping its own text; an /Image Do is a no-op."""
    inner = _wrap_stream(
        b"<< /Type /XObject /Subtype /Form /Matrix [1 0 0 1 0 -14]",
        b"BT /F1 12 Tf 72 0 Td (inner text) Tj ET")
    outer = _wrap_stream(
        b"<< /Type /XObject /Subtype /Form /Matrix [1 0 0 1 0 720] "
        b"/Resources << /XObject << /In 8 0 R >> >>",
        b"BT /F1 12 Tf 72 0 Td (outer text) Tj ET\n/In Do")
    selfref = _wrap_stream(
        b"<< /Type /XObject /Subtype /Form /Matrix [1 0 0 1 0 680] "
        b"/Resources << /XObject << /Me 9 0 R >> >>",
        b"BT /F1 12 Tf 72 0 Td (loop text) Tj ET\n/Me Do")
    image = _wrap_stream(
        b"<< /Type /XObject /Subtype /Image /Width 1 /Height 1",
        b"\x00")
    content = b"/Fm Do\n/Lp Do\n/Im Do"
    objects = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Resources << /Font << /F1 6 0 R >> /XObject "
        b"<< /Fm 7 0 R /Lp 9 0 R /Im 10 0 R >> >> /Contents 4 0 R >>",
        _wrap_stream(b"<<", content),
        b"<< >>",  # filler so font lands at 6
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
        outer,   # 7
        inner,   # 8
        selfref, # 9
        image,   # 10
    ]
    pdf = P._assemble_classic(objects)
    [spans] = P.extract_pages(pdf)
    text = P.page_text(spans)
    # outer at y=720, inner at 720-14=706, loop at 680 — reading order
    assert text == "outer text\ninner text\nloop text"


def test_form_without_resources_inherits_page_fonts():
    """A form with no /Resources uses the invoking context's fonts — here
    the page's /Differences-encoded font must apply inside the form."""
    form = _wrap_stream(
        b"<< /Type /XObject /Subtype /Form /Matrix [1 0 0 1 0 720]",
        b"BT /F1 12 Tf 72 0 Td (ab) Tj ET")
    objects = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Resources << /Font << /F1 5 0 R >> /XObject << /Fm 6 0 R >> >> "
        b"/Contents 4 0 R >>",
        _wrap_stream(b"<<", b"/Fm Do"),
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
        b"/Encoding << /BaseEncoding /WinAnsiEncoding "
        b"/Differences [ 97 /zero 98 /one ] >> >>",
        form,
    ]
    pdf = P._assemble_classic(objects)
    [spans] = P.extract_pages(pdf)
    assert P.page_text(spans) == "01"


def test_aes_fips197_known_answers():
    """FIPS-197 appendix B/C and NIST SP800-38A CBC vectors."""
    from gnosis_ocr_spark.functions.aes import (
        _decrypt_block, _encrypt_block, _expand_key, cbc_decrypt, cbc_encrypt,
    )

    k128 = bytes.fromhex("2b7e151628aed2a6abf7158809cf4f3c")
    pt = bytes.fromhex("3243f6a8885a308d313198a2e0370734")
    ct = _encrypt_block(pt, _expand_key(k128))
    assert ct.hex() == "3925841d02dc09fbdc118597196a0b32"
    assert _decrypt_block(ct, _expand_key(k128)) == pt
    k256 = bytes.fromhex(
        "000102030405060708090a0b0c0d0e0f101112131415161718191a1b1c1d1e1f")
    pt2 = bytes.fromhex("00112233445566778899aabbccddeeff")
    ct2 = _encrypt_block(pt2, _expand_key(k256))
    assert ct2.hex() == "8ea2b7ca516745bfeafc49904b496089"
    assert _decrypt_block(ct2, _expand_key(k256)) == pt2
    iv = bytes.fromhex("000102030405060708090a0b0c0d0e0f")
    p1 = bytes.fromhex("6bc1bee22e409f96e93d7e117393172a")
    assert cbc_encrypt(k128, iv, p1)[:16].hex() == \
        "7649abac8119b246cee98e9b12e9197d"
    msg = b"odd-length pdf stream payload!" * 9
    assert cbc_decrypt(k128, iv, cbc_encrypt(k128, iv, msg)) == msg


def test_aes_encrypted_pdf_roundtrips():
    """AESV2 (/V 4 /R 4) and AESV3 (/V 5 /R 6) files extract byte-identically;
    corrupting /U on the R6 file makes the empty-password check fail loudly
    (ValueError → pipeline sentinel)."""
    import pytest

    pages = ["aes line one\nsecond line", "page two text"]
    for rev in (4, 6):
        pdf = P.build_pdf_encrypted(pages, revision=rev)
        assert [P.page_text(s) for s in P.extract_pages(pdf)] == pages
        assert P.page_count(pdf) == 2
    pdf6 = P.build_pdf_encrypted(pages, revision=6)
    um = re.search(rb"/U\s*<([0-9A-Fa-f]+)>", pdf6)
    broken = pdf6.replace(
        um.group(1), (b"0" if um.group(1)[:1] != b"0" else b"1")
        + um.group(1)[1:])
    with pytest.raises(ValueError):
        P.extract_pages(broken)


def test_aes_stream_corrupt_padding_degrades():
    """A truncated/garbled AES stream must decode to SOMETHING (possibly
    empty/garbage spans), never raise out of the codec."""
    pages = ["resilient text"]
    pdf = bytearray(P.build_pdf_encrypted(pages, revision=4))
    m = re.search(rb"stream\r?\n", bytes(pdf))
    pdf[m.end() + 5] ^= 0xFF  # garble ciphertext
    pgs = P.extract_pages(bytes(pdf))
    assert isinstance(pgs, list)


def test_type3_font_decodes_via_differences():
    """Type3 fonts (glyphs as content streams) carry text meaning through
    /Encoding /Differences exactly like Type1 — the simple-font decode path
    must not special-case /Subtype."""
    objects = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >>",
        b"<< /Length 38 >>\nstream\nBT /F1 12 Tf 72 720 Td (abc) Tj ET\nendstream",
        b"<< /Type /Font /Subtype /Type3 /FontBBox [0 0 10 10] "
        b"/FontMatrix [0.001 0 0 0.001 0 0] "
        b"/CharProcs << /g97 6 0 R >> "
        b"/Encoding << /Differences [ 97 /uni0041 98 /uni0042 99 /space ] >> >>",
        b"<< /Length 10 >>\nstream\n0 0 d0\nf\nendstream",
    ]
    pdf = P._assemble_classic(objects)
    [spans] = P.extract_pages(pdf)
    assert P.page_text(spans) == "AB "


def test_type0_embedded_cmap_encoding_roundtrip():
    """Composite font whose /Encoding is an embedded CMap stream (codes →
    CID = code + 100 via cidrange + cidchar) with a CID-keyed /ToUnicode:
    an Identity-H assumption would look up the wrong CIDs and decode
    nothing, so a clean roundtrip proves the code→CID→unicode composition."""
    pages = ["hello composite world\nsecond line here", "page two body"]
    pdf = P.build_pdf_type0(pages, custom_cmap=True)
    assert [P.page_text(s) for s in P.extract_pages(pdf)] == pages
    # the same document parsed with the encoding stream REMOVED (simulating
    # a predefined CMap we don't ship) must degrade to U+FFFD, not garbage
    broken = re.sub(rb"begincidrange.*?endcidrange", b"", pdf, flags=re.S)
    broken = re.sub(rb"begincidchar.*?endcidchar", b"", broken, flags=re.S)
    [p1, p2] = P.extract_pages(broken)
    assert set(P.page_text(p1)) <= {"�", "\n", " "}


# ---------------------------------------------------------------- scanned


def test_scanned_pdf_extracts_images_not_spans():
    """Image-only pages yield zero spans and one decoded raw image whose
    scan-matrix pixels carry the exact page text (the scanned-page shape the
    reference rasterizes via poppler, app/jobs.py:386-390)."""
    pages = ["scanned page one\nline two", "page two only"]
    pdf = P.build_pdf_scanned(pages)
    assert P.page_count(pdf) == 2
    res = P.extract_pages_with_images(pdf)
    assert [len(spans) for spans, _ in res] == [0, 0]
    for (spans, imgs), page in zip(res, pages):
        [img] = imgs
        assert (img.width, img.height, img.bits) == (64, 64, 8)
        assert img.colorspace == "DeviceGray" and img.codec == "raw"
        assert len(img.data) == 64 * 64
        assert G.decode_scan_text(img.data) == page


def test_scanned_dct_is_opaque_carry_with_metadata():
    """/DCTDecode images can't be decoded in-container: the codec must carry
    the compressed bytes + typed metadata (codec='dct'), never garbage."""
    pdf = P.build_pdf_scanned(["jpeg page"], image_filter="dct")
    [(spans, imgs)] = P.extract_pages_with_images(pdf)
    assert spans == []
    [img] = imgs
    assert img.codec == "dct" and img.data[:2] == b"\xff\xd8"
    assert (img.width, img.height, img.colorspace) == (64, 64, "DeviceGray")


def test_text_pages_skip_image_collection():
    """The text layer is authoritative: pages WITH spans never pay the
    image-parse cost (images list empty by contract)."""
    pdf = P.build_pdf(["has a text layer"], compress=True)
    [(spans, imgs)] = P.extract_pages_with_images(pdf)
    assert spans and imgs == []


def test_scan_matrix_capacity_guard():
    with pytest.raises(ValueError, match="does not fit"):
        G.encode_scan_pixels("x" * 5000, 64, 64)
    # non-scan pixels decode to None, never raise
    assert G.decode_scan_text(b"\x00" * 4096) is None
    assert G.decode_scan_png_text(G.encode_page_png("not a scan")) is None


def test_scanned_pdf_end_to_end_golden(spark):
    """e2e: an image-only PDF through the production fused split→OCR path
    extracts non-empty, byte-pinned text (round-4 task #1 done-criterion)."""
    from gnosis_ocr_spark.operators.layout import assemble_documents
    from gnosis_ocr_spark.operators.pdf_split import (
        raster_ocr_pages,
        split_pdf_text_pages,
    )

    pages = ["deterministic scanned body\nsecond line", "tail page"]
    mixed = spark.createDataFrame(
        [
            ("scan", bytearray(P.build_pdf_scanned(pages))),
            ("text", bytearray(P.build_pdf(pages, compress=True))),
            ("dct", bytearray(P.build_pdf_scanned(["opaque"], image_filter="dct"))),
        ],
        schema="url string, html binary",
    )
    ocred = raster_ocr_pages(split_pdf_text_pages(mixed), ocr_engine="stub")
    out = {r["url"]: r for r in assemble_documents(ocred).collect()}
    golden = "deterministic scanned body\nsecond line\n\ntail page"
    assert out["scan"]["extracted_text"] == golden
    assert out["scan"]["n_pages"] == 2
    # the scanned doc matches the text-layer doc byte-for-byte
    assert out["text"]["extracted_text"] == golden
    # opaque DCT: page exists but extracts empty (honest container gap)
    assert out["dct"]["extracted_text"] == "" and out["dct"]["n_pages"] == 1


# ------------------------------------------------------- predefined CMaps


def test_predefined_unicode_cmaps_roundtrip():
    """Type0 fonts referencing predefined Uni*-UCS2/UTF16 CMaps by NAME
    (what real CJK crawl PDFs ship — no ToUnicode, no embedded stream):
    the 2-byte codes are Unicode code units by the family's public
    definition, so CJK (and non-BMP via UTF16 surrogates) text must
    extract byte-identically. Previously these degraded to U+FFFD."""
    pages = ["hello 世界 混合 text\nsecond 行 line", "日本語のページ",
             "한국어 페이지 𠀋"]
    for name in ("UniGB-UCS2-H", "UniJIS-UCS2-HW-V", "UniKS-UTF16-H",
                 "UniCNS-UCS2-V", "UniJIS2004-UTF16-H"):
        pdf = P.build_pdf_type0(pages, predefined=name)
        assert b"/ToUnicode" not in pdf
        assert [P.page_text(s) for s in P.extract_pages(pdf)] == pages, name
        assert P.page_count(pdf) == 3
    # matches the plain writer byte-for-byte on shared (ASCII) content
    ascii_pages = ["plain ascii line\nsecond", "tail"]
    got = [P.page_text(s) for s in
           P.extract_pages(P.build_pdf_type0(ascii_pages, predefined="UniGB-UCS2-H"))]
    assert got == [P.page_text(s) for s in P.extract_pages(P.build_pdf(ascii_pages))]


def test_unknown_predefined_cmap_still_degrades_to_replacement():
    """A predefined name outside BOTH the Unicode families and the legacy
    charset table (e.g. the Mac-encoding B5pc-H we deliberately don't
    map) must keep degrading to U+FFFD — never decode as if it were UCS-2
    or a guessed charset (that would be garbage)."""
    pdf = P.build_pdf_type0(["abc"], predefined="UniGB-UCS2-H")
    bad = pdf.replace(b"/UniGB-UCS2-H", b"/B5pc-H\x20\x20\x20\x20\x20\x20")
    [spans] = P.extract_pages(bad)
    assert set(P.page_text(spans)) <= {"�"}


def test_legacy_charset_predefined_cmaps_roundtrip():
    """Byte-oriented legacy predefined CMaps (round-4 VERDICT task #5):
    GBK-EUC / GBK2K / GB-EUC / 90ms(p)-RKSJ / EUC / KSCms-UHC(-HW) /
    KSC-EUC / ETen-B5 show strings are the legacy charset's bytes; the
    matching stdlib codec decodes them exactly (mixed 1/2-byte codes,
    halfwidth kana, CJK). Previously all of these degraded to U+FFFD."""
    cases = [
        ("GBK-EUC-H", "gbk", ["你好世界 mixed ascii\n第二行 line", "简体中文页面"]),
        ("GBK2K-H", "gb18030", ["中文 gb18030 页\nsecond", "㐀 ext char"]),
        ("GB-EUC-H", "gb2312", ["中文页面 simple\nline two", "tail"]),
        ("90ms-RKSJ-H", "cp932", ["日本語のページ desu\n二行目",
                                  "カタカナ ｶﾀｶﾅ halfwidth"]),
        ("90msp-RKSJ-V", "cp932", ["縦書きテスト", "二ページ"]),
        ("EUC-H", "euc_jp", ["日本語 euc テスト\n行二", "おわり"]),
        ("KSCms-UHC-H", "cp949", ["한국어 페이지\n둘째 줄", "끝"]),
        ("KSCms-UHC-HW-H", "cp949", ["한국 halfwidth variant", "tail"]),
        ("KSC-EUC-H", "euc_kr", ["한국어 euc", "둘"]),
        ("ETen-B5-H", "cp950", ["繁體中文頁面\n第二行", "結尾"]),
    ]
    for name, codec, pages in cases:
        pdf = P.build_pdf_type0(pages, predefined=name, charset=codec)
        assert b"/ToUnicode" not in pdf
        assert [P.page_text(s) for s in P.extract_pages(pdf)] == pages, name
    # ASCII parity with the plain writer (GBK is ASCII-transparent)
    ascii_pages = ["plain ascii line\nsecond", "tail"]
    got = [P.page_text(s) for s in P.extract_pages(
        P.build_pdf_type0(ascii_pages, predefined="GBK-EUC-H", charset="gbk"))]
    assert got == [P.page_text(s) for s in P.extract_pages(P.build_pdf(ascii_pages))]
    # malformed charset bytes degrade per-sequence, never throw
    pdf = P.build_pdf_type0(["ok"], predefined="GBK-EUC-H", charset="gbk")
    # truncated 2-byte sequence: 'o' then a dangling 0x81 lead byte
    [spans] = P.extract_pages(pdf.replace(b"<6F6B>", b"<6F81>"))
    assert P.page_text(spans) == "o�"


def test_frozen_r6_aes256_fixture_extracts(spark):
    """AES-256 /V 5 /R 6 exercised END-TO-END from a byte-frozen fixture
    (tests/golden/r6_aes256.pdf, sha256-pinned): the hardened R6 password
    hash costs ~0.25 s/invocation in pure Python — by design (ISO 32000-2
    anti-brute-force) — so the file is generated once and frozen rather
    than rotated through the 500-doc corpus (FIXTURES.md documents the
    asymmetry). Covers: frozen bytes stay stable, codec decrypts and
    extracts them, and the Spark split→OCR path handles an R6 doc."""
    import hashlib
    from pathlib import Path

    from gnosis_ocr_spark.operators.layout import assemble_documents
    from gnosis_ocr_spark.operators.pdf_split import (
        raster_ocr_pages,
        split_pdf_text_pages,
    )

    pdf = (Path(__file__).parent / "golden" / "r6_aes256.pdf").read_bytes()
    assert hashlib.sha256(pdf).hexdigest() == (
        "c1fef34bce2294f2f12a59451f5fff32706f426c9d8b771aca67ddb8bf574416"
    )
    pages = ["aes256 revision six page\nline two here", "second page body"]
    assert [P.page_text(s) for s in P.extract_pages(pdf)] == pages
    assert P.page_count(pdf) == 2
    df = spark.createDataFrame(
        [("r6", bytearray(pdf))], schema="url string, html binary"
    )
    out = assemble_documents(
        raster_ocr_pages(split_pdf_text_pages(df), ocr_engine="stub")
    ).collect()
    assert out[0]["extracted_text"] == "\n\n".join(pages)
    assert out[0]["n_pages"] == 2


def test_scan_png_rgb_and_striped_pages():
    """_scan_png handles raw DeviceRGB images (integer luma) and stacks
    multi-strip pages (the scanner-output shape) vertically in draw order."""
    import numpy as np

    from gnosis_ocr_spark.functions.codec_pdf import PdfImage
    from gnosis_ocr_spark.functions.codec_png import decode_dimensions, decode_pixels
    from gnosis_ocr_spark.operators.pdf_split import _scan_png

    rgb = bytes(v for x in range(8 * 4) for v in (200, 100, 50))
    img_rgb = PdfImage(8, 4, 8, "DeviceRGB", "raw", rgb)
    png = _scan_png([img_rgb])
    assert decode_dimensions(png) == (8, 4)
    expect = (200 * 299 + 100 * 587 + 50 * 114) // 1000
    assert set(decode_pixels(png)) == {expect}

    # two gray strips of different widths stack vertically, padded white
    top = PdfImage(6, 2, 8, "DeviceGray", "raw", bytes([10] * 12))
    bottom = PdfImage(4, 3, 8, "DeviceGray", "raw", bytes([20] * 12))
    png = _scan_png([top, bottom])
    assert decode_dimensions(png) == (6, 5)
    px = np.frombuffer(decode_pixels(png), dtype=np.uint8).reshape(5, 6)
    assert set(px[:2].flat) == {10}
    assert set(px[2:, :4].flat) == {20} and set(px[2:, 4:].flat) == {255}


def test_image_inside_form_xobject_reaches_scan_path():
    """A scanned page whose image is drawn INSIDE a Form XObject (stamp/
    letterhead structure) still routes to the OCR seam — _collect_images
    recurses through forms."""
    import zlib

    from gnosis_ocr_spark.functions.codec_png import encode_scan_pixels
    from gnosis_ocr_spark.operators.pdf_split import _scan_png

    text = "image behind a form"
    samples = zlib.compress(encode_scan_pixels(text, 64, 64), 6)
    objects = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Resources << /XObject << /Fm 4 0 R >> >> /Contents 5 0 R >>",
        b"<< /Type /XObject /Subtype /Form /BBox [0 0 612 792] "
        b"/Resources << /XObject << /Im 6 0 R >> >> /Length 31 >>\n"
        b"stream\nq 612 0 0 792 0 0 cm /Im Do Q\nendstream",
        b"<< /Length 9 >>\nstream\n/Fm Do \nendstream",
        b"<< /Type /XObject /Subtype /Image /Width 64 /Height 64 "
        b"/ColorSpace /DeviceGray /BitsPerComponent 8 /Filter /FlateDecode "
        b"/Length %d >>\nstream\n%s\nendstream" % (len(samples), samples),
    ]
    pdf = P._assemble_classic(objects)
    [(spans, imgs)] = P.extract_pages_with_images(pdf)
    assert spans == [] and len(imgs) == 1
    png = _scan_png(imgs)
    assert G.decode_scan_png_text(png) == text


# ---------------------------------------------------------------------------
# Embedded-font-program builtin encodings (/FontFile Type1, /FontFile2 sfnt)
# ---------------------------------------------------------------------------


def test_embedded_font_builtin_encoding_roundtrip():
    """A simple font with NO dict encoding info decodes through the
    embedded program's builtin encoding: Type1 cleartext /Encoding and
    symbolic-TrueType cmap(3,0)+post alike — every char remapped to an
    arbitrary code, so success certifies the program parse, not latin-1
    luck."""
    pages = ["Grüße Ω λx→x 42!\nsecond line here", "page two: ¿qué? ∑"]
    for kind in ("type1", "truetype"):
        pdf = P.build_pdf_embedded_font(pages, kind=kind)
        got = [P.page_text(s) for s in P.extract_pages(pdf)]
        assert got == pages, (kind, got)


def test_embedded_font_damaged_program_degrades_not_raises():
    """Crawl stance: a truncated/garbled font program must degrade to the
    latin-1 path (wrong text, no exception), never raise."""
    pages = ["plain ascii text"]
    for kind in ("type1", "truetype"):
        pdf = bytearray(P.build_pdf_embedded_font(pages, kind=kind))
        # wreck the program stream body: flip a run of bytes after the
        # last 'stream' keyword (the FontFile is the final stream object)
        at = bytes(pdf).rfind(b"stream\n") + 7
        pdf[at : at + 24] = b"\xff" * 24
        got = [P.page_text(s) for s in P.extract_pages(bytes(pdf))]
        assert len(got) == 1  # parsed, degraded or not — never raised


def test_dict_encoding_beats_builtin_program():
    """Precedence per PDF 9.6.6: /Encoding//ToUnicode in the font DICT
    override the program's builtin encoding."""
    code_of = {"Z": 0x41}  # program says 0x41 -> Z
    pgm, l1, l2, l3 = P._type1_program(code_of)
    objs = {
        5: (b"<< /Type /Font /Subtype /Type1 /FontDescriptor 6 0 R "
            b"/ToUnicode 8 0 R >>"),
        6: b"<< /Type /FontDescriptor /FontFile 7 0 R >>",
        7: b"<< /Length %d >>\nstream\n%s\nendstream" % (len(pgm), pgm),
        8: (b"<< /Length 99 >>\nstream\n"
            b"begincmap 1 beginbfchar <41> <0059> endbfchar endcmap\n"
            b"endstream"),
    }
    width, table = P._font_decode_table(objs, objs[5])
    assert width == 1 and table[0x41] == "Y"  # ToUnicode wins over builtin
    # without the ToUnicode the program's builtin encoding applies
    objs[5] = (b"<< /Type /Font /Subtype /Type1 /FontDescriptor 6 0 R >>")
    width, table = P._font_decode_table(objs, objs[5])
    assert width == 1 and table[0x41] == "Z"


def test_sfnt_checksum_adjustment_is_spec_conformant():
    """Sum of the whole font file as big-endian u32s must equal 0xB1B0AFBA
    once head.checkSumAdjustment is folded in (OpenType spec, 'head')."""
    import struct as _s

    font = P._sfnt_symbol_font({"a": 0x21, "b": 0x30})
    padded = font + b"\x00" * (-len(font) % 4)
    total = sum(_s.unpack(f">{len(padded) // 4}I", padded)) & 0xFFFFFFFF
    assert total == 0xB1B0AFBA


def test_tt_cmap_format4_gap_codes_stay_unmapped():
    """Codes inside the segment span but absent from the font (gid 0 in
    glyphIdArray) keep latin-1 identity — the degradation contract."""
    font = P._sfnt_symbol_font({"X": 0x21, "Y": 0x25})  # gap at 0x22-0x24
    table = P._truetype_builtin_table(font)
    assert table[0x21] == "X" and table[0x25] == "Y"
    assert table[0x23] == chr(0x23)


def test_tt_post_mac_standard_ascii_run():
    """'post' nameIndex 3..97 is the Mac standard order ASCII run: a gid
    whose index is 36 names 'A' (0x41 - 0x20 + 3) without Pascal strings."""
    import struct as _s

    post = (
        _s.pack(">IiHHIIIII", 0x00020000, 0, 0, 0, 0, 0, 0, 0, 0)
        + _s.pack(">H", 2)            # numGlyphs
        + _s.pack(">HH", 0, 36)       # gid0=.notdef, gid1=index 36 ('A')
    )
    assert P._tt_post_gid_chars(post) == {1: "A"}


def test_cff_builtin_encoding_roundtrip():
    """Bare-CFF (Type1C) /FontFile3: custom Encoding format 0 + charset
    format 0 + String INDEX uniXXXX names recover text remapped to
    arbitrary codes."""
    pages = ["Grüße Ω λx→x 42!\nsecond line here", "page two: ¿qué? ∑"]
    pdf = P.build_pdf_embedded_font(pages, kind="cff")
    got = [P.page_text(s) for s in P.extract_pages(pdf)]
    assert got == pages


def test_cff_opentype_wrapped_program():
    """/FontFile3 /OpenType (OTTO sfnt): the CFF table inside the wrapper
    decodes through the same chain when no cmap+post path exists."""
    import struct as _s

    code_of = {"Q": 0x21, "è": 0x22}
    cff = P._cff_font(code_of)
    hdr = _s.pack(">4sHHHH", b"OTTO", 1, 16, 0, 0)
    rec = _s.pack(">4sIII", b"CFF ", 0, 28, len(cff))
    table = P._fontfile3_table(hdr + rec + cff)
    assert table[0x21] == "Q" and table[0x22] == "è"


def test_cff_format1_ranges_and_supplements():
    """Encoding format 1 (ranges) and the supplement list (high bit of
    the format byte) both map; standard-SID ASCII run resolves without
    custom strings."""
    import struct as _s

    # glyphs: gid1 SID=34 ('A': 0x41-0x20+1), gid2 SID=35 ('B')
    header = b"\x01\x00\x04\x04"
    name_idx = P._mk_cff_index([b"T"])
    string_idx = _s.pack(">H", 0)
    gsubr_idx = _s.pack(">H", 0)
    top_dict_len = 3 * 6
    top_idx_len = 2 + 1 + 4 + top_dict_len
    # format 1 | 0x80 supplements: 1 range (first=0x30, nLeft=1) -> gid1,2
    encoding = bytes([0x81, 1, 0x30, 1, 1, 0x77]) + _s.pack(">H", 34)
    charset = b"\x00" + _s.pack(">HH", 34, 35)
    charstrings = P._mk_cff_index([b"\x0e"] * 3)
    enc_pos = 4 + len(name_idx) + top_idx_len + 2 + 2
    cs_pos = enc_pos + len(encoding)
    chs_pos = cs_pos + len(charset)
    top_dict = (P._cff_int5(cs_pos) + b"\x0f" + P._cff_int5(enc_pos)
                + b"\x10" + P._cff_int5(chs_pos) + b"\x11")
    top_idx = _s.pack(">HB", 1, 2) + _s.pack(">HH", 1, 1 + len(top_dict)) + top_dict
    cff = (header + name_idx + top_idx + string_idx + gsubr_idx
           + encoding + charset + charstrings)
    table = P._cff_builtin_table(cff)
    assert table[0x30] == "A" and table[0x31] == "B"   # range
    assert table[0x77] == "A"                           # supplement SID 34


def test_cff_standard_encoding_degrades():
    """A CFF declaring the predefined Standard encoding (offset 0) keeps
    the latin-1 path — no builtin table is synthesized."""
    pages = ["plain"]
    cff = bytearray(P._cff_font(P._builtin_code_map(pages)))
    # patch top DICT's Encoding operand (5-byte int after charset op) to 0
    at = cff.find(b"\x10", 4)  # 0x10 = Encoding operator
    cff[at - 5 : at] = b"\x1d\x00\x00\x00\x00"
    assert P._cff_builtin_table(bytes(cff)) is None


def test_incremental_update_latest_generation_wins():
    """Incrementally updated PDFs (appended replacement objects + /Prev
    xref chain — the signature/form-fill/edit shape) must extract the
    LATEST document version; the superseded original must not leak.
    Covers both the classic-append and the ObjStm-hybrid update shapes."""
    pages = ["real final text\nline two", "page two final"]
    for objstm in (False, True):
        pdf = P.build_pdf_incremental(pages, objstm=objstm)
        got = [P.page_text(s) for s in P.extract_pages(pdf)]
        assert got == pages, (objstm, got)
        assert all("SUPERSEDED" not in t for t in got)
        assert P.page_count(pdf) == 2


def test_incremental_update_chain_of_two():
    """Two stacked updates: the SECOND update wins over both the original
    and the first update (position-ordered generations compose)."""
    mid = P.build_pdf_incremental(["middle version"], decoy="ORIGINAL V0")
    # append another classic update on top of the updated file by
    # rebuilding with the mid bytes as base: emulate by concatenating a
    # second update section targeting the same content object
    stream = b"BT\n/F1 12 Tf\n72 720 Td\n(final version) Tj\nET"
    prev = int(mid.rsplit(b"startxref\n", 1)[1].split(b"\n", 1)[0])
    buf = bytearray(mid)
    off = len(buf)
    buf += b"4 0 obj\n<< /Length %d >>\nstream\n%s\nendstream\nendobj\n" % (
        len(stream), stream)
    xref_off = len(buf)
    buf += b"xref\n4 1\n%010d 00000 n \n" % off
    buf += (b"trailer\n<< /Size 6 /Root 1 0 R /Prev %d >>\nstartxref\n%d\n%%%%EOF\n"
            % (prev, xref_off))
    got = [P.page_text(s) for s in P.extract_pages(bytes(buf))]
    assert got == ["final version"]


def test_differences_high_frequency_glyph_names():
    """The expanded AGL subset: ligatures, legal/currency marks,
    guillemets, and Latin-1 symbols recover through a /Differences array
    (the names real subset fonts carry most)."""
    pages = ["ﬁnding ﬂaws © § ¶ « » ± ½ Œuvre ƒ † ‰ ¿why? Š"]
    pdf = P.build_pdf_tounicode(pages, mode="differences")
    got = [P.page_text(s) for s in P.extract_pages(pdf)]
    assert got == pages


def test_type3_font_roundtrip_and_charprocs_decoy():
    """/Subtype /Type3 glyph-procedure fonts (dvips/LaTeX bitmap shape,
    §9.6.5) decode through the same /Differences chain as simple fonts:
    every char remapped to an arbitrary code, so success certifies the
    subtype-agnostic encoding path. The decoy CharProcs stream contains
    legal text operators — glyph drawings, never page text."""
    pages = ["Grüße Ω λx→x 42!\nsecond line here", "page two: ¿qué? ∑"]
    pdf = P.build_pdf_type3(pages)
    got = [P.page_text(s) for s in P.extract_pages(pdf)]
    assert got == pages, got
    assert all("DECOYGLYPHTEXT" not in t for t in got)


def test_type3_font_mutation_degrades_not_raises():
    """Crawl stance: byte corruption anywhere in a Type3 file may change
    the text but must never raise out of the extractor."""
    import random

    pages = ["plain ascii text\nand a second line"]
    base = P.build_pdf_type3(pages)
    rnd = random.Random(7)
    for _ in range(40):
        buf = bytearray(base)
        at = rnd.randrange(len(buf))
        buf[at] = rnd.randrange(256)
        try:
            spans = P.extract_pages(bytes(buf))
            for s in spans:
                P.page_text(s)
        except ValueError:
            pass  # loud structured failure is allowed; crashes are not


def test_image_colorspace_variants_extract_exact_text():
    """Non-trivial image colorspaces (§8.6) reduce to the exact
    scan-matrix gray at decode: /Indexed identity-gray palette,
    [/ICCBased n 0 R] with /N 1, and raw /DeviceCMYK (0,0,0,255−v)."""
    from gnosis_ocr_spark.functions import codec_png as PNG
    from gnosis_ocr_spark.operators.pdf_split import _scan_png

    pages = ["indexed color page one\nline two", "page two body here"]
    for variant in ("indexed", "icc", "cmyk"):
        pdf = P.build_pdf_scanned(pages, image_filter=variant)
        win = P.extract_pages_with_images(pdf)
        assert [len(s) for s, _ in win] == [0, 0], variant
        for (spans, images), page in zip(win, pages):
            [img] = images
            assert (img.codec, img.colorspace, img.bits) == (
                "raw", "DeviceGray", 8), variant
            assert PNG.decode_scan_png_text(_scan_png(images)) == page, variant


def test_colorspace_resolution_forms():
    """_resolve_colorspace handles every operand form real writers emit:
    names + aliases, indirect colorspace objects, ICCBased by /N, Indexed
    palettes as hex / literal-with-escapes / stream, nested ICC base,
    and unsupported families degrading by name."""
    objs = {
        5: b"<< /N 3 /Length 4 >>\nstream\nxxxx\nendstream",
        6: b"<< /N 1 /Length 0 >>\nstream\n\nendstream",
        7: b"[/ICCBased 5 0 R]",
        8: b"/DeviceCMYK",
    }
    ob = objs.get
    rv = lambda n: b"\x00\x80\xff"  # decoded palette stream

    def cs(spec):
        return P._resolve_colorspace(spec, ob, rv)

    assert cs(b"/DeviceRGB") == ("DeviceRGB", None)
    assert cs(b"/CalRGB") == ("DeviceRGB", None)
    assert cs(b"/CalGray") == ("DeviceGray", None)
    assert cs(None) == ("DeviceGray", None)
    assert cs(b"/Lab")[0] == "Lab"  # unsupported family passes by name
    assert cs(b"[/Separation /Spot /DeviceRGB 9 0 R]")[0] == "Separation"
    assert cs(b"7 0 R") == ("DeviceRGB", None)  # indirect → ICC → /N 3
    assert cs(b"8 0 R") == ("DeviceCMYK", None)  # indirect name object
    assert cs(b"[/ICCBased 6 0 R]") == ("DeviceGray", None)
    # Indexed, hex palette over a NESTED ICC base (N=3 → RGB, 3 comps)
    name, lut = cs(b"[/Indexed [/ICCBased 5 0 R] 1 <000000FFFFFF>]")
    assert name == "Indexed" and lut[0] == 0 and lut[1] == 255
    assert len(lut) == 256 and lut[255] == 255  # clamp-pad
    # literal-string palette with octal + special escapes, gray base
    name, lut = cs(rb"[/I /G 2 (\000\200\377)]")
    assert name == "Indexed" and (lut[0], lut[1], lut[2]) == (0, 128, 255)
    # stream-ref palette
    name, lut = cs(b"[/Indexed /DeviceGray 2 12 0 R]")
    assert name == "Indexed" and (lut[0], lut[1], lut[2]) == (0, 128, 255)
    # CMYK palette entries gray through the naive reduction
    name, lut = cs(b"[/Indexed /DeviceCMYK 1 <00000000 000000FF>]")
    assert name == "Indexed" and (lut[0], lut[1]) == (255, 0)


def test_colorspace_mutation_degrades_not_raises():
    """Corrupt palettes / truncated ICC refs must degrade (image skipped
    or wrong pixels), never raise out of the extractor."""
    import random

    pages = ["plain ascii page"]
    for variant in ("indexed", "icc", "cmyk"):
        base = P.build_pdf_scanned(pages, image_filter=variant)
        rnd = random.Random(11)
        for _ in range(30):
            buf = bytearray(base)
            buf[rnd.randrange(len(buf))] = rnd.randrange(256)
            try:
                P.extract_pages_with_images(bytes(buf))
            except ValueError:
                pass


def test_16bit_samples_reduce_to_high_byte():
    """BitsPerComponent 16 (big-endian) reduces to the high byte at
    decode — gray, RGB, and CMYK alike — so downstream stays 8-bit."""
    import zlib as _z

    w, h = 4, 2
    gray16 = bytes(
        b for v in range(w * h) for b in ((v * 31) & 0xFF, 0x7F)
    )
    head = (b"/Width 4 /Height 2 /BitsPerComponent 16 "
            b"/ColorSpace /DeviceGray /Filter /FlateDecode")
    img = P._decode_image(head, _z.compress(gray16))
    assert (img.bits, img.colorspace) == (8, "DeviceGray")
    assert img.data == bytes((v * 31) & 0xFF for v in range(w * h))
    rgb16 = bytes(
        b for v in range(w * h) for b in
        ((v * 31) & 0xFF, 0, (v * 17) & 0xFF, 0, 0, 0)
    )
    head = (b"/Width 4 /Height 2 /BitsPerComponent 16 "
            b"/ColorSpace /DeviceRGB /Filter /FlateDecode")
    img = P._decode_image(head, _z.compress(rgb16))
    assert (img.bits, img.colorspace) == (8, "DeviceRGB")
    assert len(img.data) == 3 * w * h


def test_pdf_stream_filters_bound_decompression():
    """A crawl PDF can hide a deflate or LZW bomb in any stream; both
    filters must fail loudly at MAX_STREAM_BYTES instead of exhausting an
    executor (ADVICE-A2 rationale extended to the PDF filter chain)."""
    import zlib

    from gnosis_ocr_spark.functions.codec_pdf import (
        MAX_STREAM_BYTES,
        _apply_one_filter,
    )

    co = zlib.compressobj(9)
    blk = b"\x00" * (1 << 20)
    parts = [co.compress(blk) for _ in range((MAX_STREAM_BYTES >> 20) + 2)]
    parts.append(co.flush())
    bomb = b"".join(parts)
    assert len(bomb) < 2_000_000  # the whole point: tiny input, huge output
    with pytest.raises(ValueError, match="exceeds stream bound"):
        _apply_one_filter(b"FlateDecode", b"", bomb)
    # legitimate streams still decode exactly
    assert _apply_one_filter(b"FlateDecode", b"", zlib.compress(b"ok" * 10)) \
        == b"ok" * 10


def test_pdf_flate_bound_catches_stored_block_bombs_and_truncation(monkeypatch):
    """The inflate bound must hold for streams of STORED/incompressible
    deflate blocks (these pause at symbol boundaries, so a zero-length
    follow-up probe returns nothing — the excess sits in unconsumed_tail,
    which is what the guard must inspect), and a truncated Flate stream
    must still raise — the exact zlib.decompress semantics callers map to
    their failure sentinel. The cap is monkeypatched down so the stored
    stream stays test-sized."""
    import zlib

    import numpy as np

    from gnosis_ocr_spark.functions import codec_pdf as P

    monkeypatch.setattr(P, "MAX_STREAM_BYTES", 1 << 20)
    blk = np.random.default_rng(3).integers(
        0, 256, size=1 << 18, dtype="u1"
    ).tobytes()  # incompressible -> stored blocks at any level
    co = zlib.compressobj(9)
    parts = [co.compress(blk) for _ in range(9)]  # ~2.25 MiB vs the 1 MiB cap
    parts.append(co.flush())
    bomb = b"".join(parts)
    with pytest.raises(ValueError, match="exceeds stream bound"):
        P._apply_one_filter(b"FlateDecode", b"", bomb)
    with pytest.raises(ValueError, match="truncated"):
        P._apply_one_filter(b"FlateDecode", b"", zlib.compress(b"x" * 1000)[:-4])
    # trailing garbage after a complete stream stays tolerated (original
    # zlib.decompress semantics)
    assert P._apply_one_filter(b"FlateDecode", b"", zlib.compress(b"ok") + b"JUNK") == b"ok"


def test_unesc_spec_edge_escapes():
    """§7.3.4.2 edges review-found broken: \\8 and \\9 are bare chars (NOT
    octal — int(..,8) raised and sentineled whole documents), Unicode
    digits never start octal, \\777 wraps to one byte, and backslash-EOL
    line continuations elide entirely."""
    from gnosis_ocr_spark.functions.codec_pdf import _unesc

    assert _unesc(r"C:\98SE") == "C:98SE"
    assert _unesc("pre\\\u00b2post") == "pre\u00b2post"  # superscript two
    assert _unesc(r"\101") == "A"
    assert _unesc(r"\777") == "\xff"  # overflow wraps per spec
    assert _unesc("line\\\ncont") == "linecont"
    assert _unesc("line\\\r\ncont") == "linecont"
    assert _unesc("line\\\rcont") == "linecont"


def test_hostile_cmap_is_bounded_and_never_raises():
    """A ToUnicode CMap whose destination walks past U+10FFFF degrades
    (skip/replacement) instead of raising chr() ValueError, and repeated
    full-range bfranges stop at the 65536-mapping bound (~300 s/MB of
    hostile CPU otherwise)."""
    import time

    from gnosis_ocr_spark.functions.codec_pdf import _parse_cmap

    overflow = (b"1 beginbfrange <0000> <0005> <DBFFDFFF> endbfrange")
    t = _parse_cmap(overflow)  # must not raise
    assert t[0] == "\U0010ffff"
    assert 1 not in t  # past Unicode: skipped
    bomb = b"\n".join(
        b"1 beginbfrange <0000> <FFFF> <0041> endbfrange" for _ in range(200)
    )
    t0 = time.monotonic()
    t = _parse_cmap(bomb)
    assert time.monotonic() - t0 < 5.0
    assert len(t) == 0x10000


def test_deep_pages_chain_no_recursion_error():
    """A linear chain of thousands of nested /Pages nodes must not raise
    RecursionError (outside the ValueError contract) — the tree walk is
    an explicit stack now."""
    parts = [b"%PDF-1.4\n"]
    n_chain = 3000
    parts.append(b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    for i in range(2, 2 + n_chain):
        parts.append(
            b"%d 0 obj\n<< /Type /Pages /Count 1 /Kids [%d 0 R] >>\nendobj\n"
            % (i, i + 1)
        )
    leaf = 2 + n_chain
    parts.append(
        b"%d 0 obj\n<< /Type /Page /Parent %d 0 R >>\nendobj\n"
        % (leaf, leaf - 1)
    )
    parts.append(b"trailer\n<< /Root 1 0 R >>\n%%EOF\n")
    pdf = b"".join(parts)
    assert P.page_count(pdf) >= 1
    assert len(P.extract_pages(pdf)) >= 1


def test_encrypted_pdf_with_literal_string_id_decodes():
    """Trailer /ID written as LITERAL strings (§7.5.5 allows both forms;
    some generators emit them) must authenticate — the hex-only regex
    rejected such documents as password-locked."""
    pages = ["literal id page text"]
    blob = P.build_pdf_encrypted(pages)
    m = __import__("re").search(rb"/ID\s*\[\s*<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>\s*\]", blob)
    assert m is not None

    def lit(hexs: bytes) -> bytes:
        raw = bytes.fromhex(hexs.decode())
        out = bytearray(b"(")
        for b in raw:
            if b in b"\\()":
                out += b"\\" + bytes([b])
            elif b in (13,):  # \r would normalize: escape as octal
                out += b"\\015"
            else:
                out.append(b)
        return bytes(out) + b")"

    patched = (blob[: m.start()] + b"/ID [" + lit(m.group(1)) + b" "
               + lit(m.group(2)) + b"]" + blob[m.end():])
    spans = P.extract_pages(patched)
    assert P.page_text(spans[0]) == "literal id page text"
