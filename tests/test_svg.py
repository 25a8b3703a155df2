"""Standalone SVG: root detection, text extraction (document order,
defs/metadata skipped, per-shape tooltips skipped), dimension parsing
(width/height with absolute CSS units, viewBox fallback), and the
multimodal sniff/metadata wiring. Inline <svg> inside HTML must keep
being killed as boilerplate."""

from __future__ import annotations

import pytest

from gnosis_ocr_spark.functions.codec_media import build_svg, is_svg, svg_dimensions
from gnosis_ocr_spark.operators.html_extract import extract_main_text
from gnosis_ocr_spark.operators.multimodal import sniff_media_type


def test_is_svg_root_detection():
    assert is_svg(build_svg(10, 10))
    assert is_svg(b"<svg xmlns='x'><text>t</text></svg>")
    assert is_svg(b'<?xml version="1.0"?>\n<!-- c -->\n<!DOCTYPE svg>\n<svg>')
    assert not is_svg(b"<html><body><svg>")
    assert not is_svg(b'<?xml version="1.0"?><rss version="2.0">')
    assert not is_svg(b"plain text with <svg> later")


def test_extract_svg_text_order_and_skips():
    svg = b"""<?xml version="1.0"?>
<svg xmlns="http://www.w3.org/2000/svg" width="200" height="100">
  <title>Chart title</title>
  <desc>A description</desc>
  <defs><text>never extracted</text></defs>
  <style>.a{fill:red}</style>
  <rect width="1" height="1"><title>tooltip skipped</title></rect>
  <text>Q1 <tspan>$1.2M</tspan></text>
  <g><text>curve <textPath href="#p">label</textPath></text></g>
</svg>"""
    assert extract_main_text(svg) == (
        "Chart title\n\nA description\n\nQ1 $1.2M\n\ncurve label"
    )


def test_inline_svg_still_boilerplate():
    html = (
        b"<html><body><p>Real paragraph content that is long enough to keep "
        b"around here.</p><svg><text>decorative label</text></svg></body></html>"
    )
    out = extract_main_text(html)
    assert "decorative" not in out and "Real paragraph" in out


def test_svg_entities_and_whitespace():
    svg = b'<svg><text>a &amp; b\n   c</text></svg>'
    assert extract_main_text(svg) == "a & b c"


def test_svg_dimensions_units_and_viewbox():
    assert svg_dimensions(build_svg(640, 360)) == (640, 360)
    assert svg_dimensions(b'<svg width="2in" height="72pt">') == (192, 96)
    assert svg_dimensions(b'<svg width="2.54cm" height="25.4mm">') == (96, 96)
    # percentages are context-dependent → fall back to viewBox
    assert svg_dimensions(
        b'<svg width="100%" height="100%" viewBox="0 0 300.5 200">'
    ) == (300, 200)
    with pytest.raises(ValueError):
        svg_dimensions(b'<svg xmlns="http://www.w3.org/2000/svg">')


def test_sniff_and_fixture_row():
    b = build_svg(640, 360, ("axis label",))
    assert sniff_media_type(b) == "image/svg+xml"
    # document text never claims SVG
    assert sniff_media_type(b"the <svg> element is discussed") == (
        "application/octet-stream"
    )


def test_media_metadata_svg_row(spark):
    from gnosis_ocr_spark.operators.multimodal import media_metadata

    df = spark.createDataFrame(
        [("s1", bytearray(build_svg(320, 240)))], "url string, data binary"
    )
    row = media_metadata(df).collect()[0]
    assert row.media_type == "image/svg+xml"
    assert (row.width, row.height) == (320, 240)


def test_extract_office_svg_dispatch():
    from gnosis_ocr_spark.operators.office_extract import extract_office

    text, n_pages, sub = extract_office(
        build_svg(100, 100, ("label one", "label two"))
    )
    assert (sub, n_pages) == ("svg", 1)
    assert text == "label one\n\nlabel two"
