"""Head-level HTML metadata extraction: title/description/canonical/
OpenGraph/lang/published-time, first-occurrence-wins, body fields never
override head fields, charset-decoded input, and the Spark struct UDF."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from gnosis_ocr_spark.operators.html_extract import extract_html_meta

PAGE = b"""<!DOCTYPE html><html lang="en"><head>
<title>T1</title><title>T2 ignored</title>
<meta name="description" content="D1">
<meta name="description" content="D2 ignored">
<meta name="author" content="A. Author">
<meta property="og:title" content="OT">
<meta property="og:description" content="OD">
<meta property="og:type" content="article">
<meta property="og:url" content="https://e.com/x">
<meta property="og:site_name" content="E">
<meta property="article:published_time" content="2024-01-02T03:04:05Z">
<meta name="robots" content="NOINDEX, follow">
<link rel="canonical" href="https://e.com/canonical">
</head><body>
<title>body title</title>
<meta name="description" content="body d">
<link rel="canonical" href="https://evil.example/override">
</body></html>"""


def test_all_fields():
    m = extract_html_meta(PAGE)
    assert m == {
        "title": "T1",
        "description": "D1",
        "canonical": "https://e.com/canonical",
        "og_title": "OT",
        "og_description": "OD",
        "og_type": "article",
        "og_url": "https://e.com/x",
        "og_site_name": "E",
        "author": "A. Author",
        "lang": "en",
        "published_time": "2024-01-02T03:04:05Z",
        "robots": "NOINDEX, follow",
        "noindex": True,
    }


def test_robots_noindex_tokenization():
    # token-wise match: 'none' implies noindex; 'nofollow' alone does not;
    # a substring like 'noindexing' must not trigger
    for content, want in [
        ("noindex", True),
        ("none", True),
        ("NOFOLLOW, NOARCHIVE", False),
        ("noindexing", False),
        ("index, follow", False),
        ("nofollow noindex", True),
        ("", False),
    ]:
        page = f'<head><meta name="robots" content="{content}"></head>'
        m = extract_html_meta(page.encode())
        assert m["noindex"] is want, (content, m)
        assert m["robots"] == content


def test_robots_body_scoped_ignored():
    page = (
        b"<html><head><title>t</title></head>"
        b'<body><meta name="robots" content="noindex"></body></html>'
    )
    m = extract_html_meta(page)
    assert m["robots"] == "" and m["noindex"] is False


def test_unclosed_head_stops_at_body():
    # real crawls omit </head>; the first <body> must end metadata scope
    page = (
        b'<html><head><title>Good</title>'
        b'<body><meta name="description" content="bad">'
    )
    m = extract_html_meta(page)
    assert m["title"] == "Good" and m["description"] == ""


def test_entity_and_whitespace_normalization():
    m = extract_html_meta(b"<head><title> A &amp;\n  B </title></head>")
    assert m["title"] == "A & B"


def test_date_fallback():
    m = extract_html_meta(b'<head><meta name="date" content="2023-12-31"></head>')
    assert m["published_time"] == "2023-12-31"


def test_charset_decoded_title():
    body = '<head><meta charset="cp1252"><title>caf\xe9</title></head>'.encode(
        "cp1252"
    )
    assert extract_html_meta(body)["title"] == "café"


def test_empty_and_none():
    assert extract_html_meta(None)["title"] == ""
    assert extract_html_meta(b"")["title"] == ""
    assert extract_html_meta(b"<p>no head at all</p>")["title"] == ""


@settings(max_examples=150, deadline=None)
@given(st.binary(max_size=300))
def test_total_over_hostile_bytes(raw):
    m = extract_html_meta(raw)
    assert set(m) == {
        "title", "description", "canonical", "og_title", "og_description",
        "og_type", "og_url", "og_site_name", "author", "lang",
        "published_time", "robots", "noindex",
    }
    assert isinstance(m["noindex"], bool)
    assert all(
        isinstance(v, str) for k, v in m.items() if k != "noindex"
    )


def test_spark_struct_udf(spark):
    from pyspark.sql import functions as F

    from gnosis_ocr_spark.operators.html_extract import with_html_meta

    df = spark.createDataFrame(
        [("u1", bytearray(PAGE)), ("u2", bytearray(b"<p>plain</p>"))],
        "url string, html binary",
    )
    out = {
        r.url: r
        for r in with_html_meta(df)
        .select("url", F.col("meta.title").alias("t"), F.col("meta.lang").alias("lg"))
        .collect()
    }
    assert out["u1"].t == "T1" and out["u1"].lg == "en"
    assert out["u2"].t == ""
