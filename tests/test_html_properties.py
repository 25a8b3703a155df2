"""Property-based tests for the U7 extractor: for ANY generated main content
wrapped in ANY boilerplate combination, extraction returns exactly the
normalized main content (hypothesis over the wrapper space)."""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from gnosis_ocr_spark.operators.html_extract import extract_main_text

_WORD = st.text(alphabet="abcdefghijklmnopqrstuvwxyz", min_size=2, max_size=10)
# paragraphs must clear the extractor's MIN_BLOCK_CHARS floor (25) — shorter
# blocks are dropped by design (covered in test_html_extract.py)
_SENTENCE = (
    st.lists(_WORD, min_size=8, max_size=25).map(" ".join).filter(lambda s: len(s) >= 30)
)

_NAV = '<nav><ul><li><a href="/a">alpha beta</a></li><li><a href="/b">gamma delta</a></li></ul></nav>'
_SIDEBAR = '<div class="sidebar"><p>sidebar words that are long enough to matter greatly</p></div>'
_FOOTER = "<footer><p>footer copyright words that are long enough to matter</p></footer>"
_AD = '<div class="ad-slot"><p>advert words that are long enough to matter here</p></div>'
_SCRIPT = "<script>var x = 'not content at all but plenty of characters';</script>"
_LINKLIST = (
    '<ul><li><a href="/x">related story one with quite a lot of text</a></li>'
    '<li><a href="/y">related story two with quite a lot of text</a></li></ul>'
)
_BOILER = [_NAV, _SIDEBAR, _FOOTER, _AD, _SCRIPT, _LINKLIST]


@given(
    paras=st.lists(_SENTENCE, min_size=1, max_size=4),
    before=st.lists(st.sampled_from(_BOILER), max_size=4),
    after=st.lists(st.sampled_from(_BOILER), max_size=4),
    messy_ws=st.booleans(),
)
@settings(max_examples=60, deadline=None)
def test_extraction_recovers_main_content(paras, before, after, messy_ws):
    body_paras = []
    for p in paras:
        raw = p.replace(" ", "   \n ") if messy_ws else p
        body_paras.append(f"<p>{raw}</p>")
    html = (
        "<html><head><title>t</title></head><body>"
        + "".join(before)
        + "<article>"
        + "".join(body_paras)
        + "</article>"
        + "".join(after)
        + "</body></html>"
    )
    got = extract_main_text(html.encode())
    expected = "\n\n".join(re.sub(r"\s+", " ", p).strip() for p in paras)
    assert got == expected


@given(junk=st.binary(max_size=500))
@settings(max_examples=60, deadline=None)
def test_never_crashes_on_garbage(junk):
    out = extract_main_text(junk)
    assert isinstance(out, str)


_TAGS = ["div", "p", "a", "nav", "span", "li", "ul", "footer", "img", "br"]


@given(
    soup=st.lists(
        st.tuples(st.sampled_from(["open", "close", "text"]), st.sampled_from(_TAGS)),
        max_size=60,
    ),
    paras=st.lists(_SENTENCE, min_size=1, max_size=2),
)
@settings(max_examples=60, deadline=None)
def test_tag_soup_never_poisons_following_content(soup, paras):
    """ANY sequence of unmatched opens/closes/text (tag soup) followed by a
    clean, fully-closed article must still extract the article: auto-close
    releases every kill/link/boiler flag, depths never go negative, and the
    parser never raises."""
    frags = []
    for kind, tag in soup:
        if kind == "open":
            frags.append(f"<{tag} class='x'>")
        elif kind == "close":
            frags.append(f"</{tag}>")
        else:
            frags.append("zz ")
    # wrap the soup in a tag the soup itself never uses: its end tag
    # auto-closes EVERY dangling soup element (incl. unclosed <a>/<nav>),
    # which must release all their flags
    html = (
        "<body><section>" + "".join(frags) + "</section>"
        + "<article>" + "".join(f"<p>{p}</p>" for p in paras) + "</article></body>"
    )
    got = extract_main_text(html.encode())
    expected = "\n\n".join(re.sub(r"\s+", " ", p).strip() for p in paras)
    assert got.endswith(expected) or got == expected
