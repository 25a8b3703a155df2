"""Unit tests for the U7 boilerplate stripper (pure function + UDF contract)."""

from __future__ import annotations

from gnosis_ocr_spark.operators.html_extract import extract_main_text

ARTICLE = (
    "<html><head><title>t</title></head><body>"
    "<nav><a href='/x'>Home</a><a href='/y'>About</a></nav>"
    "<article><h1>Headline Here</h1>"
    "<p>This is the first real paragraph with enough characters to keep.</p>"
    "<p>And a second paragraph, also comfortably above the length floor.</p>"
    "</article>"
    "<footer><p>copyright 2020 long enough footer text to test kill list</p></footer>"
    "</body></html>"
)


def test_keeps_main_drops_boilerplate():
    got = extract_main_text(ARTICLE.encode())
    assert got == (
        "Headline Here\n\n"
        "This is the first real paragraph with enough characters to keep.\n\n"
        "And a second paragraph, also comfortably above the length floor."
    )


def test_drops_high_link_density_blocks():
    html = (
        "<body><p>A real paragraph that is long enough to clear the floor.</p>"
        "<ul><li><a href='/a'>related story one with lots of text</a></li>"
        "<li><a href='/b'>related story two with lots of text</a></li></ul></body>"
    )
    assert extract_main_text(html) == (
        "A real paragraph that is long enough to clear the floor."
    )


def test_drops_boilerplate_class_names():
    html = (
        "<body><div class='sidebar'><p>sidebar text long enough to matter here</p></div>"
        "<div id='main'><p>kept paragraph body long enough to clear the floor.</p></div>"
        "<div class='ad-banner'><p>advertisement body long enough to be dropped</p></div>"
        "</body>"
    )
    assert extract_main_text(html) == (
        "kept paragraph body long enough to clear the floor."
    )


def test_whitespace_normalization():
    html = "<body><p>  spaced   \n\t out   words align to single   spaces now ok </p></body>"
    assert extract_main_text(html) == "spaced out words align to single spaces now ok"


def test_entities_decoded():
    html = "<body><p>fish &amp; chips cost &lt;5 euros which is rather cheap</p></body>"
    assert extract_main_text(html) == "fish & chips cost <5 euros which is rather cheap"


def test_short_blocks_dropped_headings_kept():
    html = "<body><h2>Hi there</h2><p>tiny</p><p>long enough paragraph to be kept by scoring</p></body>"
    assert extract_main_text(html) == (
        "Hi there\n\nlong enough paragraph to be kept by scoring"
    )


def test_degenerate_inputs():
    assert extract_main_text(None) == ""
    assert extract_main_text(b"") == ""
    assert extract_main_text(b"\xff\xfe<body><p>valid part long enough to keep around</p></body>") == (
        "valid part long enough to keep around"
    )
    assert extract_main_text(b"just plain text that is long enough to keep here") == (
        "just plain text that is long enough to keep here"
    )


def test_nested_same_tag_inside_boilerplate_stays_dropped():
    """Regression (round-2 advice): a nested plain <div> closing inside
    <div class='ad'> must not clear the boilerplate flag early."""
    html = (
        "<body>"
        "<div class='ad'><div>x</div>"
        "<p>advertisement text that is long enough to pass the length floor</p></div>"
        "<p>The real content paragraph which is comfortably long enough too.</p>"
        "</body>"
    )
    got = extract_main_text(html.encode())
    assert got == "The real content paragraph which is comfortably long enough too."


def test_void_boiler_element_does_not_poison_document():
    """A boiler-classed void element (<img class='ad'>) never gets an end tag
    and must not suppress the rest of the document."""
    html = (
        "<body><img class='ad' src='x.png'>"
        "<p>Real paragraph following a void ad image, long enough to keep.</p></body>"
    )
    got = extract_main_text(html.encode())
    assert got == "Real paragraph following a void ad image, long enough to keep."


def test_autoclosed_link_does_not_poison_document():
    """An unclosed <a> auto-closed by its parent's end tag must release the
    link flag — the rest of the document is not link text."""
    html = (
        "<body><div><a href='/x'>menu</a></div>"
        "<div><a href='/y'>unclosed menu link</div>"
        "<p>The real content paragraph which is comfortably long enough.</p>"
        "</body>"
    )
    got = extract_main_text(html.encode())
    assert got == "The real content paragraph which is comfortably long enough."


def test_autoclosed_kill_container_does_not_poison_document():
    """An unclosed <nav> auto-closed by an outer end tag must release the
    kill flag."""
    html = (
        "<body><div><nav><a href='/x'>home</a></div>"
        "<p>Real paragraph content that clears the minimum length floor.</p>"
        "</body>"
    )
    got = extract_main_text(html.encode())
    assert got == "Real paragraph content that clears the minimum length floor."


def test_many_unclosed_and_stray_tags_parse_quickly():
    """Per-tag index stacks keep sloppy-HTML parsing linear: thousands of
    unclosed opens plus thousands of stray closes must finish instantly."""
    import time

    html = (
        "<body>" + "<p>start" * 5000 + "</span>" * 5000
        + "<p>The surviving content paragraph, long enough to keep.</p></body>"
    )
    t0 = time.time()
    got = extract_main_text(html.encode())
    assert time.time() - t0 < 2.0
    assert "The surviving content paragraph, long enough to keep." in got
