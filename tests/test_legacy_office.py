"""Legacy binary office + email extraction (operators/legacy_office.py,
functions/codec_cfb.py).

The CFB container roundtrips through the by-construction writer (big
streams in regular sectors, small streams in a proper mini stream), the
DOC piece table covers both cp1252-compressed and UTF-16 pieces plus the
field-instruction / control-character semantics, the BIFF8 SST reader is
pinned on a hand-built Continue-spanning string table, and everything is
total under mutation fuzz."""

from __future__ import annotations

import random
import struct

import pytest

from gnosis_ocr_spark.functions.codec_cfb import CfbError, CfbView, build_cfb
from gnosis_ocr_spark.operators.legacy_office import (
    _parse_sst,
    build_doc,
    build_eml,
    build_ppt,
    build_xls,
    extract_cfb,
    extract_eml,
    looks_like_eml,
)
from gnosis_ocr_spark.operators.office_extract import extract_office

PARAS = ["Hello legacy world & friends.", "Second paragraph with    runs of ws."]
NORM = ["Hello legacy world & friends.", "Second paragraph with runs of ws."]
EXPECT = "\n\n".join(NORM)


# ---------------------------------------------------------------------------
# CFB container
# ---------------------------------------------------------------------------


def test_cfb_roundtrip_mini_and_regular_streams():
    streams = [
        ("WordDocument", b"W" * 5000),  # ≥4096 → regular sectors
        ("1Table", b"T" * 300),  # <4096 → mini stream
        ("\x05SummaryInformation", bytes(range(200))),
        ("Big2", bytes(range(256)) * 40),
    ]
    blob = build_cfb(streams)
    v = CfbView(blob)
    for name, payload in streams:
        assert v.read(name) == payload
    # name lookup is case-tolerant (crawl files disagree on case)
    assert v.read("worddocument") == b"W" * 5000


def test_cfb_truncated_tail_recovers():
    blob = build_cfb([("WordDocument", b"W" * 5000), ("1Table", b"T" * 100)])
    v = CfbView(blob[:-300])  # cut into the trailing sectors
    assert v.try_read("WordDocument") == b"W" * 5000


def test_cfb_rejects_non_cfb():
    with pytest.raises(CfbError):
        CfbView(b"PK\x03\x04" + b"\x00" * 600)


def test_cfb_cyclic_fat_terminates():
    blob = bytearray(build_cfb([("S", b"x" * 5000)]))
    # point the first FAT entry at itself: the chain walk must terminate
    fat_start = struct.unpack_from("<L", blob, 76)[0]
    struct.pack_into("<L", blob, 512 + fat_start * 512, 0)
    v = CfbView(bytes(blob))
    v.try_read("S")  # must return (possibly garbage), not hang


# ---------------------------------------------------------------------------
# format roundtrips
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "builder,subtype,n_pages",
    [
        (lambda: build_doc(PARAS), "doc", 1),
        (lambda: build_xls([[p] for p in PARAS]), "xls", 1),
        (lambda: build_ppt([[PARAS[0]], [PARAS[1]]]), "ppt", 2),
    ],
)
def test_cfb_format_roundtrip(builder, subtype, n_pages):
    text, np_, sub = extract_office(builder())
    assert sub == subtype
    assert np_ == n_pages
    assert text == EXPECT


def test_doc_unicode_piece():
    text, _, sub = extract_office(build_doc(["héllo wörld — ünïcode ψ"]))
    assert sub == "doc"
    assert text == "héllo wörld — ünïcode ψ"


def test_doc_control_chars_and_fields():
    # hand-assemble text with field codes: instruction dropped, result kept
    raw = (
        "before \x13HYPERLINK http://x.test\x14linked text\x15 after\r"
        "cell one\x07cell two\x07\rline one\x0bline two\r"
    )
    blob = build_doc([raw.replace("\r", "")])  # builder escapes nothing;
    # instead drive _doc_clean directly for the control semantics
    from gnosis_ocr_spark.operators.legacy_office import _doc_clean, _join_paras

    paras = _doc_clean(raw)
    assert _join_paras(paras) == (
        "before linked text after\n\ncell one cell two\n\nline one line two"
    )
    assert extract_office(blob)[2] == "doc"


def test_xls_numeric_cells_and_multisheet():
    # NUMBER / RK records decoded; rows round-robin across 2 sheets
    text, np_, sub = extract_office(build_xls([["alpha"], ["beta"]], n_sheets=2))
    assert sub == "xls"
    assert np_ == 2
    assert text == "alpha\n\nbeta"


def test_xls_rk_decoding():
    from gnosis_ocr_spark.operators.legacy_office import _rk_value

    assert _rk_value((42 << 2) | 0x02) == "42"  # int RK
    assert _rk_value((4250 << 2) | 0x03) == "42.5"  # int ÷ 100
    # float30: 1.0 → IEEE754 high dword 0x3FF00000, low 2 bits clear
    assert _rk_value(0x3FF00000) == "1"


def test_biff_sst_continue_spanning():
    # hand-built SST split across a Continue record INSIDE a string's
    # character data; the continuation restarts with its own grbit byte
    s1, s2a, s2b = "first", "secon", "dhalf"
    rec1 = struct.pack("<LL", 2, 2)
    rec1 += struct.pack("<HB", len(s1), 0) + s1.encode()
    rec1 += struct.pack("<HB", 10, 0) + s2a.encode()  # 5 of 10 chars
    # continuation: fresh grbit=1 (UTF-16) for the remaining 5 chars
    rec2 = b"\x01" + s2b.encode("utf-16-le")
    out = _parse_sst([rec1, rec2])
    assert out == ["first", "secondhalf"]


def test_ppt_utf16_atoms_and_slide_count():
    text, np_, sub = extract_office(build_ppt([["ünïcode slide ψ"], ["ascii slide"]]))
    assert sub == "ppt"
    assert np_ == 2
    assert text == "ünïcode slide ψ\n\nascii slide"


# ---------------------------------------------------------------------------
# EML
# ---------------------------------------------------------------------------


def test_eml_plain_and_html_alternative():
    assert extract_office(build_eml(PARAS))[0] == EXPECT
    t, np_, sub = extract_office(build_eml(PARAS, html_alternative=True))
    assert sub == "eml"
    assert t == EXPECT
    assert np_ == 1


def test_eml_quoted_printable_and_subject():
    msg = (
        b"From: a@b.test\r\n"
        b"Subject: The Heading\r\n"
        b"MIME-Version: 1.0\r\n"
        b'Content-Type: text/plain; charset="utf-8"\r\n'
        b"Content-Transfer-Encoding: quoted-printable\r\n"
        b"\r\n"
        b"caf=C3=A9 body text\r\n"
    )
    text, _ = extract_eml(msg)
    assert text == "The Heading\n\ncafé body text"


def test_eml_sniff_guards():
    assert looks_like_eml(b"From: x@y.z\nSubject: q\n\nbody")
    assert not looks_like_eml(b"<html>x: y\nFrom: z@w.v\n")  # leading '<'
    assert not looks_like_eml(b"just some plain text")
    assert not looks_like_eml(b"\xd0\xcf\x11\xe0" + b"\x00" * 32)


# ---------------------------------------------------------------------------
# totality / fuzz / routing
# ---------------------------------------------------------------------------


def test_mutation_fuzz_never_raises():
    rng = random.Random(4321)
    seeds = [
        build_doc(PARAS),
        build_xls([PARAS]),
        build_ppt([PARAS]),
        build_eml(PARAS),
        build_eml(PARAS, html_alternative=True),
    ]
    for seed in seeds:
        for _ in range(40):
            b = bytearray(seed)
            for _ in range(rng.randint(1, 8)):
                b[rng.randrange(len(b))] = rng.randrange(256)
            text, np_, sub = extract_office(bytes(b))
            assert isinstance(text, str) and isinstance(np_, int)
        for cut in (1, len(seed) // 3, len(seed) - 2):
            extract_office(bytes(seed[:cut]))


def test_legacy_routes_through_pipeline(spark):
    from gnosis_ocr_spark.plans.pipeline import extract_corpus

    rows = [
        ("u-doc", build_doc(PARAS)),
        ("u-xls", build_xls([[p] for p in PARAS])),
        ("u-ppt", build_ppt([[PARAS[0]], [PARAS[1]]])),
        ("u-eml", build_eml(PARAS)),
    ]
    df = spark.createDataFrame(
        [(u, None, b, None, "") for u, b in rows],
        schema="url string, warc_ts timestamp, html binary, text string, lang string",
    )
    out = {r["url"]: r for r in extract_corpus(df).collect()}
    for u in ("u-doc", "u-xls", "u-ppt", "u-eml"):
        assert out[u]["route"] == "office"
        assert out[u]["extracted_text"] == EXPECT
    assert out["u-ppt"]["n_pages"] == 2


def test_cfb_multi_fat_sector_archive_self_marks():
    """An archive big enough that the FAT spans multiple sectors: streams
    still roundtrip and every FAT sector is self-marked (_FATSECT at slot
    index == its own sector number — the spec invariant a misplaced
    padding entry would break)."""
    streams = [(f"S{i:03d}", bytes([i % 256]) * 5000) for i in range(20)]
    streams.append(("BIG", b"Z" * 400_000))
    blob = build_cfb(streams)
    v = CfbView(blob)
    for name, payload in streams:
        assert v.read(name) == payload
    n_fat = struct.unpack_from("<L", blob, 44)[0]
    fat_sectors = [
        struct.unpack_from("<L", blob, 76 + 4 * i)[0] for i in range(n_fat)
    ]
    fat: list[int] = []
    for fs in fat_sectors:
        fat.extend(struct.unpack_from("<128L", blob, 512 + fs * 512))
    assert all(fat[fs] == 0xFFFFFFFD for fs in fat_sectors)


def test_cfb_difat_bomb_is_bounded():
    """A crafted header declaring 2^32 DIFAT sectors with a self-cycling
    chain must fail fast (review: 127-1023x per-iteration amplification
    could OOM an executor through the old iteration-count-only cap)."""
    import struct
    import time

    from gnosis_ocr_spark.functions.codec_cfb import CfbError, CfbView

    hdr = bytearray(512 * 3)
    hdr[0:8] = bytes.fromhex("d0cf11e0a1b11ae1")
    struct.pack_into("<H", hdr, 30, 9)       # sector shift 512
    struct.pack_into("<H", hdr, 32, 6)       # mini shift
    struct.pack_into("<L", hdr, 48, 0xFFFFFFFE)  # no directory
    struct.pack_into("<L", hdr, 68, 0)       # first DIFAT = sector 0
    struct.pack_into("<L", hdr, 72, 0xFFFFFFFF)  # n_difat: hostile
    # sector 0 (at byte 512): all zeros -> next-DIFAT pointer = 0 (cycle)
    t0 = time.monotonic()
    try:
        CfbView(bytes(hdr))
    except CfbError:
        pass
    assert time.monotonic() - t0 < 5.0


def test_xls_infinite_and_rich_label_cells():
    """inf/NaN NUMBER payloads must not erase the workbook, and a rich
    (grbit 0x08) inline LABEL skips its cRun bytes before the chars."""
    import struct

    from gnosis_ocr_spark.operators.legacy_office import _fmt_num, extract_xls
    from gnosis_ocr_spark.functions.codec_cfb import CfbView, build_cfb

    assert _fmt_num(float("inf")) == "inf"
    assert _fmt_num(float("nan")) == "nan"

    def rec(rtype, payload):
        return struct.pack("<HH", rtype, len(payload)) + payload

    bof = rec(0x0809, struct.pack("<HH", 0x0600, 0x0005) + b"\x00" * 12)
    bof_ws = rec(0x0809, struct.pack("<HH", 0x0600, 0x0010) + b"\x00" * 12)
    inf_cell = rec(0x0203, struct.pack("<HHH", 0, 0, 0)
                   + struct.pack("<d", float("inf")))
    # rich inline LABEL at (0,1): cch=2, grbit=0x08, cRun=1, chars "ok",
    # then 4 bytes of run data (ignored)
    rich = rec(0x0204, struct.pack("<HHH", 0, 1, 0)
               + struct.pack("<HB", 2, 0x08) + struct.pack("<H", 1)
               + b"ok" + b"\x00" * 4)
    ok_cell = rec(0x0204, struct.pack("<HHH", 1, 0, 0)
                  + struct.pack("<HB", 2, 0x00) + b"hi")
    eof = rec(0x000A, b"")
    wb = bof + bof_ws + inf_cell + rich + ok_cell + eof + eof
    blob = build_cfb([("Workbook", wb)])
    text, np_ = extract_xls(CfbView(blob))
    assert "ok" in text and "hi" in text and "inf" in text
