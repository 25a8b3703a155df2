"""robots.txt (operators/robots.py): RFC 9309 parse + longest-match
evaluation pinned against the RFC's own examples, agent-group selection,
totality on hostile bytes, and the broadcast frontier-filter operator."""

from __future__ import annotations

import pytest

from gnosis_ocr_spark.operators.robots import (
    build_robots,
    parse_robots,
    robots_allowed,
    robots_filter,
    rules_for_agent,
)


def _group(txt: bytes, agent: str = "*") -> dict:
    return rules_for_agent(parse_robots(txt), agent)


def test_rfc9309_longest_match_examples():
    """The RFC §2.2.2/5.2 example table: longest-pattern-wins, tie → allow."""
    cases = [
        # (allow_pat, disallow_pat, path, expect_allowed)
        ("/p", "/", "/page", True),
        ("/folder/", "/folder", "/folder/page", True),
        ("/page", "/*.htm", "/page.htm", False),
        ("/$", "/", "/", True),
        ("/$", "/", "/page.htm", False),
    ]
    for allow_pat, dis_pat, path, expect in cases:
        txt = build_robots([(["*"], [(True, allow_pat), (False, dis_pat)])])
        assert robots_allowed(_group(txt), path) is expect, (
            allow_pat, dis_pat, path
        )


def test_wildcards_and_anchors():
    txt = build_robots([(["*"], [(False, "/private*"), (False, "/*.pdf$"),
                                 (True, "/private/ok")])])
    g = _group(txt)
    assert not robots_allowed(g, "/private/x")
    assert robots_allowed(g, "/private/ok")      # longer allow wins
    assert not robots_allowed(g, "/docs/file.pdf")
    assert robots_allowed(g, "/docs/file.pdf?x=1")  # $ anchors the end
    assert robots_allowed(g, "/public/page")


def test_agent_group_selection_longest_prefix():
    txt = build_robots([
        (["*"], [(False, "/")]),
        (["crawler"], [(False, "/a")]),
        (["crawler-news"], [(False, "/b")]),
    ])
    p = parse_robots(txt)
    assert rules_for_agent(p, "crawler-news-v2")["rules"] == [(False, "/b")]
    assert rules_for_agent(p, "crawler-x")["rules"] == [(False, "/a")]
    assert rules_for_agent(p, "otherbot")["rules"] == [(False, "/")]
    # no groups at all -> allow-all
    empty = rules_for_agent(parse_robots(b""), "bot")
    assert robots_allowed(empty, "/anything")


def test_parse_totality_and_directives():
    txt = (b"# comment\nUser-agent: *\nDisallow: /x # trailing\n"
           b"Crawl-delay: 2.5\nNoIdea: what\n"
           b"Sitemap: https://a.test/sitemap.xml.gz\n"
           b"\xff\xfe garbage bytes \x00\nDisallow:\n")
    p = parse_robots(txt)
    assert p["sitemaps"] == ["https://a.test/sitemap.xml.gz"]
    g = rules_for_agent(p, "any")
    assert g["crawl_delay"] == 2.5
    assert not robots_allowed(g, "/x/deep")
    assert robots_allowed(g, "/y")  # the empty Disallow adds no rule
    for hostile in (b"\x00" * 64, b"Disallow: /a\n", b":::\n:::", b""):
        parse_robots(hostile)  # never raises


def test_robots_filter_operator(spark):
    txt = build_robots(
        [(["*"], [(False, "/private*"), (True, "/private/pub")])],
        sitemaps=["https://h1.test/sm.xml"], crawl_delay=1.0,
    )
    urls = spark.createDataFrame(
        [("h1.test", "https://h1.test/page"),
         ("h1.test", "https://h1.test/private/x"),
         ("h1.test", "https://h1.test/private/pub?ok=1"),
         ("h2.test", "https://h2.test/anything")],
        "host string, url string",
    )
    robots = spark.createDataFrame(
        [("h1.test", bytearray(txt))], "host string, data binary"
    )
    got = {r["url"]: r for r in robots_filter(urls, robots).collect()}
    assert got["https://h1.test/page"]["allowed"]
    assert not got["https://h1.test/private/x"]["allowed"]
    assert got["https://h1.test/private/pub?ok=1"]["allowed"]
    assert got["https://h2.test/anything"]["allowed"]  # no robots row
    assert got["https://h1.test/page"]["crawl_delay"] == 1.0
    assert got["https://h2.test/anything"]["crawl_delay"] is None
    # the plan keeps the robots side broadcast (frontier never reshuffles)
    plan = robots_filter(urls, robots)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_frontier_composition_robots_to_sitemap_to_filter(spark):
    """The full polite-crawl frontier path composes: robots.txt advertises
    the sitemap (Sitemap directive), the sitemap explodes into URLs
    (feed_extract.sitemap_urls), and robots_filter prunes the disallowed
    ones — three operators, one coherent frontier plan."""
    from pyspark.sql import functions as F

    from gnosis_ocr_spark.operators.feed_extract import (
        build_sitemap,
        sitemap_urls,
    )

    txt = build_robots(
        [(["*"], [(False, "/draft*")])],
        sitemaps=["https://site.test/sitemap.xml.gz"],
    )
    # step 1: the robots parse surfaces the sitemap location
    assert parse_robots(txt)["sitemaps"] == ["https://site.test/sitemap.xml.gz"]
    # step 2: (fetched) sitemap blob explodes into frontier URLs
    sm = build_sitemap(
        [("https://site.test/a", None), ("https://site.test/draft/b", None),
         ("https://site.test/c", None)],
        gzip_out=True,
    )
    blobs = spark.createDataFrame(
        [("sitemap.xml.gz", bytearray(sm))], "name string, data binary"
    )
    frontier = sitemap_urls(blobs).select(
        F.lit("site.test").alias("host"), F.col("loc").alias("url")
    )
    # step 3: robots rules prune the frontier
    robots = spark.createDataFrame(
        [("site.test", bytearray(txt))], "host string, data binary"
    )
    verdicts = {r["url"]: r["allowed"]
                for r in robots_filter(frontier, robots).collect()}
    assert verdicts == {
        "https://site.test/a": True,
        "https://site.test/draft/b": False,
        "https://site.test/c": True,
    }


def test_bom_and_duplicate_agent_groups():
    """A UTF-8 BOM must not void the file (BOM'd robots.txt is common),
    and duplicate same-agent groups MUST combine (RFC 9309 §2.2.1)."""
    bom = b"\xef\xbb\xbfUser-agent: *\nDisallow: /secret\n"
    assert not robots_allowed(_group(bom), "/secret/x")
    dup = (b"User-agent: bot\nDisallow: /a\n\n"
           b"User-agent: bot\nDisallow: /b\n\n"
           b"User-agent: *\nDisallow: /c\n\n"
           b"User-agent: *\nDisallow: /d\n")
    g = rules_for_agent(parse_robots(dup), "bot")
    assert not robots_allowed(g, "/a/x") and not robots_allowed(g, "/b/x")
    star = rules_for_agent(parse_robots(dup), "other")
    assert not robots_allowed(star, "/c/x") and not robots_allowed(star, "/d/x")


def test_robots_filter_total_on_null_url(spark):
    urls = spark.createDataFrame(
        [("h1.test", "https://h1.test/x"), ("h1.test", None), (None, None)],
        "host string, url string",
    )
    robots = spark.createDataFrame(
        [("h1.test", bytearray(build_robots([(["*"], [(False, "/x")])])))],
        "host string, data binary",
    )
    rows = robots_filter(urls, robots).collect()
    assert len(rows) == 3  # no crash; junk rows carry allowed = NULL
    by_url = {r["url"]: r["allowed"] for r in rows}
    assert by_url["https://h1.test/x"] is False
    assert by_url[None] is None
