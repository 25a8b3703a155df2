"""URL canonicalization: Spark JVM expression ≡ Python reference, and the
DuckDB CTE mirror ≡ both (the three-way agreement the host_stats oracle
relies on)."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from gnosis_ocr_spark.functions.urls import (
    canon_cte_sql,
    canonicalize_url,
    canonicalize_url_py,
    url_host,
    url_path_depth,
)

URLS = [
    "https://example.com/a/b",
    "https://WWW.Example.COM/a/b",
    "https://example.com:443/a/b",
    "http://example.com:80/a",
    "http://example.com:8080/a",
    "https://example.com/a/b/",
    "https://example.com/a//b///c",
    "https://example.com",
    "https://example.com/",
    "https://example.com/a?utm_source=x&q=1&utm_medium=y",
    "https://example.com/a?fbclid=abc",
    "https://example.com/a?b=2&a=1",
    "https://example.com/a?z=9&utm_campaign=c&a=1#frag",
    "https://example.com/a#sec-2",
    "https://user@example.com/a",
    "HTTPS://example.com/CaseKeptInPath",
    "https://sub.www-like.example.com/x",
    "https://www.example.com/?gclid=1&msclkid=2",
    "https://example.com/a?empty=&q=1",
    "https://example.com/search?q=a+b&lang=en&utm_term=t",
]

EXPECTED = {
    "https://example.com/a/b": "https://example.com/a/b",
    "https://WWW.Example.COM/a/b": "https://example.com/a/b",
    "https://example.com:443/a/b": "https://example.com/a/b",
    "http://example.com:80/a": "http://example.com/a",
    "http://example.com:8080/a": "http://example.com:8080/a",
    "https://example.com/a/b/": "https://example.com/a/b",
    "https://example.com/a//b///c": "https://example.com/a/b/c",
    "https://example.com": "https://example.com/",
    "https://example.com/": "https://example.com/",
    "https://example.com/a?utm_source=x&q=1&utm_medium=y":
        "https://example.com/a?q=1",
    "https://example.com/a?fbclid=abc": "https://example.com/a",
    "https://example.com/a?b=2&a=1": "https://example.com/a?a=1&b=2",
    "https://example.com/a?z=9&utm_campaign=c&a=1#frag":
        "https://example.com/a?a=1&z=9",
    "https://example.com/a#sec-2": "https://example.com/a",
    "https://user@example.com/a": "https://user@example.com/a",
    "HTTPS://example.com/CaseKeptInPath":
        "https://example.com/CaseKeptInPath",
    "https://www.example.com/?gclid=1&msclkid=2": "https://example.com/",
    "https://example.com/a?empty=&q=1": "https://example.com/a?empty=&q=1",
    "https://example.com/search?q=a+b&lang=en&utm_term=t":
        "https://example.com/search?lang=en&q=a+b",
}


def test_python_reference_expected_values():
    for url, want in EXPECTED.items():
        assert canonicalize_url_py(url) == want, url


def test_spark_matches_python_reference(spark):
    df = spark.createDataFrame([(u,) for u in URLS], schema="url string")
    got = {
        r["url"]: r["curl"]
        for r in df.select("url", canonicalize_url("url").alias("curl")).collect()
    }
    for u in URLS:
        assert got[u] == canonicalize_url_py(u), u


def test_duckdb_cte_matches_python_reference():
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE urls AS SELECT * FROM (VALUES "
        + ", ".join("(?)" for _ in URLS)
        + ") t(url)",
        URLS,
    )
    sql = "WITH " + canon_cte_sql("url", "url", "urls") + " SELECT url, curl FROM _u3"
    for u, c in con.execute(sql).fetchall():
        assert c == canonicalize_url_py(u), u


def test_url_host_and_depth(spark):
    rows = [
        ("https://User@WWW.Example.com:8443/a/b/c?x=1", "www.example.com", 3),
        ("https://example.com", "example.com", 0),
        ("https://example.com/", "example.com", 0),
        ("https://example.com/a//b/", "example.com", 2),
    ]
    df = spark.createDataFrame([(u,) for u, _, _ in rows], schema="url string")
    got = {
        r["url"]: (r["h"], r["d"])
        for r in df.select(
            "url",
            url_host("url").alias("h"),
            url_path_depth("url").alias("d"),
        ).collect()
    }
    for u, h, d in rows:
        assert got[u] == (h, d), u


def test_url_host_ipv6_literal(spark):
    df = spark.createDataFrame(
        [("https://[2001:db8::1]:443/x",), ("https://user@[::1]/y",)],
        schema="url string",
    )
    got = [r["h"] for r in df.select(url_host("url").alias("h")).collect()]
    assert got == ["[2001:db8::1]", "[::1]"]


def test_canonicalize_py_mirrors_sql_off_happy_path(spark):
    """Scheme-less input: all three formulations must agree (the reference
    pins the SQL, so it must not diverge even on garbage)."""
    import duckdb
    urls = ["example.org/a?b=1&utm_source=x", "no scheme at all", "//proto-rel"]
    df = spark.createDataFrame([(u,) for u in urls], schema="url string")
    spark_got = {r["url"]: r["c"] for r in
                 df.select("url", canonicalize_url("url").alias("c")).collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE urls AS SELECT * FROM (VALUES "
                + ", ".join("(?)" for _ in urls) + ") t(url)", urls)
    sql = "WITH " + canon_cte_sql("url", "url", "urls") + " SELECT url, curl FROM _u3"
    duck_got = dict(con.execute(sql).fetchall())
    for u in urls:
        assert spark_got[u] == canonicalize_url_py(u) == duck_got[u], u


def test_newline_framed_url_identical_across_all_three_formulations(spark):
    """Java '$' matches before a trailing newline, RE2's does not — the
    entry trim keeps Spark, DuckDB, and the Python reference identical on
    whitespace-framed crawl URL fields (review repro)."""
    import duckdb
    import pandas as pd

    from gnosis_ocr_spark.functions.urls import (
        canon_cte_sql,
        canonicalize_url,
        canonicalize_url_py,
    )

    urls = ["http://a.test/p/\n", "  https://b.test:443/x//y/#frag \n",
            "http://www.c.test:80/q/?utm_source=z&k=1\n"]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got_spark = [r["c"] for r in
                 df.select(canonicalize_url(F.col("url")).alias("c")).collect()]
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"url": urls, "i": range(len(urls))}))
    sql = "WITH " + canon_cte_sql("url", "i", "t") + \
          " SELECT curl FROM _u3 ORDER BY i"
    got_sql = [r[0] for r in con.execute(sql).fetchall()]
    got_py = [canonicalize_url_py(u) for u in urls]
    assert got_spark == got_sql == got_py
    assert got_spark[0] == "http://a.test/p"
