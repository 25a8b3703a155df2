"""Deterministic synthetic Common-Crawl-style corpus (FIXTURES.md §1).

Generates the exact ``input_hint`` table
``(url STRING, warc_ts TIMESTAMP, html BINARY, text STRING, lang STRING)``
plus the golden table ``(url, extracted_text, n_pages)`` whose values are
known *by construction* — the generator composes documents from known main
content, so the expected extraction is computed from the same ingredients,
not by running the extractor (no circularity). Seed=42 convention; no
wall-clock, no external data.

Row mix (FIXTURES.md): ~60% HTML with boilerplate wrappers, ~30% short PDFs
(1–3 pages), ~5% skew PDFs (50–200 pages — exercises salted size-bucket
repartitioning), ~5% adversarial (empty, truncated PDF, non-UTF8 prefix,
misleading extension).
"""

from __future__ import annotations

import datetime as dt
import random
from dataclasses import dataclass

from gnosis_ocr_spark.functions.codec_pdf import build_pdf

_WORDS = (
    "analysis baseline corpus dataset engine extraction fixture golden heuristic "
    "inference journal kernel layout markup notebook operator pipeline query "
    "raster schema token union vector workload crawl archive render segment "
    "partition shuffle broadcast salted manifest lineage checkpoint replica"
).split()

_EPOCH = dt.datetime(2020, 1, 1, tzinfo=dt.timezone.utc)
_LANGS = ["en", "en", "en", "en", "en", "en", "en", "de", "fr", ""]


@dataclass(frozen=True)
class CorpusRow:
    url: str
    warc_ts: dt.datetime
    html: bytes
    text: str | None
    lang: str
    # golden
    expected_text: str
    n_pages: int


def _sentence(rng: random.Random, n: int) -> str:
    return " ".join(rng.choice(_WORDS) for _ in range(n))


def _paragraph(rng: random.Random) -> str:
    # single-space words: whitespace normalization is the identity, so the
    # expected extraction equals the raw paragraph
    return _sentence(rng, rng.randint(8, 30)).capitalize() + "."


def _html_doc(rng: random.Random, i: int) -> tuple[bytes, str]:
    heading = _sentence(rng, rng.randint(2, 5)).title()
    paras = [_paragraph(rng) for _ in range(rng.randint(2, 6))]
    nav_items = "".join(
        f'<li><a href="/{w}">{w}</a></li>' for w in rng.sample(_WORDS, 5)
    )
    related = "".join(
        f'<li><a href="/r/{w}">{_sentence(rng, 3)}</a></li>'
        for w in rng.sample(_WORDS, 4)
    )
    body_paras = "".join(f"<p>{p}</p>" for p in paras)
    html = (
        f"<!DOCTYPE html><html><head><title>doc {i}</title>"
        f'<meta charset="utf-8"></head><body>'
        f"<nav><ul>{nav_items}</ul></nav>"
        f'<div class="sidebar"><p>{_sentence(rng, 12)}</p></div>'
        f"<article><h1>{heading}</h1>{body_paras}"
        f"<div><ul>{related}</ul></div>"  # high link density → dropped
        f"</article>"
        f'<div class="ad"><p>{_sentence(rng, 10)}</p></div>'
        f"<footer><p>copyright {_sentence(rng, 6)}</p></footer>"
        f"</body></html>"
    )
    expected = "\n\n".join([heading] + paras)
    return html.encode("utf-8"), expected


# PDF file classes rotated by INDEX PARITY (never an rng draw, so goldens
# are untouched by rotation changes): every writer emits the identical
# 72/720 14-pt layout (property-tested byte-equal), so the golden depends
# only on `pages`, never on the writer class. The rotation covers the
# real-crawl file shapes the codec supports: plain / FlateDecode classic,
# PDF 1.5 (ObjStm + xref stream + split content streams + Tm/TL/'),
# LZWDecode, chained ASCII85+Flate with indirect /Length, kerning-only
# word breaks (TJ adjustments, zero 0x20 bytes in show strings),
# RC4-encrypted (standard handler, empty user password), and composite
# Type0/Identity-H (every char a 2-byte CID through a /ToUnicode CMap —
# meaningful even for ASCII text), and Form-XObject pages (first line
# drawn via /Fm Do with a /Matrix translation — letterhead/stamp shape),
# and AES-128 /V 4 /CFM /AESV2 encryption (Acrobat-7-era norm; AES-256
# /R 6 is supported but unit-tested only — its hardened password hash
# costs ~0.4 s/file in pure Python, too slow for a 500-doc rotation),
# and scanned/image-only pages (one DeviceGray image XObject per page,
# zero text operators — the raster goes through the OCR seam; the
# scan-matrix pixels make the expected text knowable by construction).
_PDF_WRITERS = (
    "flate", "plain", "pdf15", "lzw", "a85flate", "tj_kerned", "rc4",
    "type0", "form_xobj", "aes", "type0_cmap", "scanned",
)


def _pdf_doc(rng: random.Random, n_pages: int,
             writer: str = "plain") -> tuple[bytes, str]:
    from gnosis_ocr_spark.functions import codec_pdf as _cp

    pages = []
    for _ in range(n_pages):
        lines = [_sentence(rng, rng.randint(4, 8)) for _ in range(rng.randint(3, 8))]
        pages.append("\n".join(lines))
    expected = "\n\n".join(pages).strip()
    if writer == "pdf15":
        return _cp.build_pdf_15(pages), expected
    if writer == "flate":
        return build_pdf(pages, compress=True), expected
    if writer == "lzw":
        return _cp.build_pdf_filtered(pages, filters=("LZWDecode",)), expected
    if writer == "a85flate":
        return (
            _cp.build_pdf_filtered(
                pages, filters=("ASCII85Decode", "FlateDecode"),
                indirect_length=True,
            ),
            expected,
        )
    if writer == "tj_kerned":
        return _cp.build_pdf_tj_kerned(pages), expected
    if writer == "rc4":
        return _cp.build_pdf_encrypted(pages, revision=3), expected
    if writer == "type0":
        return _cp.build_pdf_type0(pages), expected
    if writer == "form_xobj":
        return _cp.build_pdf_form_xobject(pages), expected
    if writer == "aes":
        return _cp.build_pdf_encrypted(pages, revision=4), expected
    if writer == "type0_cmap":
        return _cp.build_pdf_type0(pages, custom_cmap=True), expected
    if writer == "scanned":
        return _cp.build_pdf_scanned(pages), expected
    return build_pdf(pages), expected


def generate_rows(n: int = 200, seed: int = 42, skew_max_pages: int = 120) -> list[CorpusRow]:
    rng = random.Random(seed)
    rows: list[CorpusRow] = []
    for i in range(n):
        ts = _EPOCH + dt.timedelta(minutes=i)
        lang = rng.choice(_LANGS)
        slot = i % 20  # 12 html, 6 pdf, 1 skew, 1 adversarial per 20 rows
        if slot < 12:
            html, expected = _html_doc(rng, i)
            # index-parity UTF-16 re-encoding (ASCII content, so the decoded
            # text — and the golden — is identical): exercises the BOM
            # charset path end-to-end, not just in units
            if i % 12 == 7:
                html = b"\xff\xfe" + html.decode("utf-8").encode("utf-16-le")
            elif i % 12 == 3:
                html = b"\xfe\xff" + html.decode("utf-8").encode("utf-16-be")
            url = f"https://example-{i:06d}.test/doc-{i}.html"
            raw_text = expected.replace("\n\n", "\n")  # WARC-ish rendering
            rows.append(CorpusRow(url, ts, html, raw_text, lang, expected, 1))
        elif slot < 18:
            n_pages = rng.randint(1, 3)
            pdf, expected = _pdf_doc(rng, n_pages, writer=_PDF_WRITERS[i % len(_PDF_WRITERS)])
            url = f"https://example-{i:06d}.test/paper-{i}.pdf"
            rows.append(CorpusRow(url, ts, pdf, None, lang, expected, n_pages))
        elif slot == 18:  # skew document
            n_pages = rng.randint(50, skew_max_pages)
            pdf, expected = _pdf_doc(rng, n_pages, writer=_PDF_WRITERS[i % len(_PDF_WRITERS)])
            url = f"https://example-{i:06d}.test/opus-{i}.pdf"
            rows.append(CorpusRow(url, ts, pdf, None, lang, expected, n_pages))
        else:  # adversarial, rotating
            kind = (i // 20) % 4
            if kind == 0:  # empty payload
                rows.append(
                    CorpusRow(
                        f"https://example-{i:06d}.test/empty-{i}.html",
                        ts, b"", None, lang, "", 0,
                    )
                )
            elif kind == 1:  # truncated PDF bytes
                rows.append(
                    CorpusRow(
                        f"https://example-{i:06d}.test/broken-{i}.pdf",
                        ts, b"%PDF-1.4\n1 0 obj\n<< truncated", None, lang, "", 0,
                    )
                )
            elif kind == 2:  # non-UTF8 prefix before valid HTML
                html, expected = _html_doc(rng, i)
                rows.append(
                    CorpusRow(
                        f"https://example-{i:06d}.test/mojibake-{i}.html",
                        ts, b"\xff\xfe" + html, None, lang, expected, 1,
                    )
                )
            else:  # .pdf extension but HTML bytes — router must trust magic bytes
                html, expected = _html_doc(rng, i)
                rows.append(
                    CorpusRow(
                        f"https://example-{i:06d}.test/mislabeled-{i}.pdf",
                        ts, html, None, lang, expected, 1,
                    )
                )
    return rows


INPUT_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"
GOLDEN_SCHEMA = "url string, extracted_text string, n_pages int"


def corpus_df(spark, n: int = 200, seed: int = 42, num_partitions: int | None = None):
    """Input table as a DataFrame (columns exactly per input_hint)."""
    rows = generate_rows(n, seed)
    data = [(r.url, r.warc_ts, r.html, r.text, r.lang) for r in rows]
    df = spark.createDataFrame(data, schema=INPUT_SCHEMA)
    if num_partitions:
        df = df.repartition(num_partitions)
    return df


def golden_df(spark, n: int = 200, seed: int = 42):
    rows = generate_rows(n, seed)
    data = [(r.url, r.expected_text, r.n_pages) for r in rows]
    return spark.createDataFrame(data, schema=GOLDEN_SCHEMA)


def write_corpus(spark, path: str, n: int = 200, seed: int = 42, num_partitions: int = 8) -> None:
    corpus_df(spark, n, seed, num_partitions).write.mode("overwrite").parquet(path)
