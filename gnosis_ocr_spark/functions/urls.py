"""URL canonicalization — the first normalization step of every crawl
pipeline (the reference service keys blobs by user-supplied name and has no
URL handling, /root/reference/app/storage_service.py; this is part of the
brief's Common-Crawl-scale surface, not a port).

Everything is built from JVM-side ``pyspark.sql.functions`` expressions
(regexp/split/filter/array_join) so canonicalization participates in
whole-stage codegen — no Python in the hot path — and every step has an
exact DuckDB equivalent (see ``CANON_SQL`` below) so driver oracles can
mirror it value-for-value.

Canonical form (absolute http(s) URLs; bytes in, bytes out — no IDNA or
percent-decoding, which would need tables the JVM and DuckDB don't share):

1. strip the fragment;
2. lowercase scheme and authority; drop a leading ``www.``;
3. drop default ports (``:80`` for http, ``:443`` for https);
4. collapse duplicate path slashes, drop trailing slashes, empty path → /;
5. drop tracking params (utm_*, fbclid, gclid, msclkid), sort the rest;
6. drop an empty query.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.\-]*)://"
_AUTH_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]*)"
_PREFIX_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*"
TRACKING_PARAM_RE = r"^(utm_[A-Za-z]+|fbclid|gclid|msclkid)="


def url_host(url: Column | str) -> Column:
    """Lowercased host without port/userinfo (crawl-analytics group key).
    IPv6 literal authorities (``[2001:db8::1]:443``) yield the bracketed
    address — the colon-based port strip cannot apply to them."""
    auth = F.lower(F.regexp_extract(url, _AUTH_RE, 1))
    v6 = F.regexp_extract(auth, r"(\[[^\]]*\])", 1)
    return F.when(v6 != "", v6).otherwise(
        F.regexp_extract(auth, r"(?:^|@)([^@:]*)(?::\d*)?$", 1)
    )


def url_path_depth(url: Column | str) -> Column:
    """Number of path segments of the raw URL (``/a/b/c`` → 3)."""
    path = F.regexp_extract(
        F.regexp_replace(url, _PREFIX_RE, ""), r"^([^?#]*)", 1
    )
    trimmed = F.regexp_replace(
        F.regexp_replace(path, r"/{2,}", "/"), r"/+$", ""
    )
    return F.when(trimmed == "", F.lit(0)).otherwise(
        F.size(F.split(trimmed, "/")) - 1
    )


def canonicalize_url(url: Column | str) -> Column:
    """Canonical URL as a single JVM expression (steps in module docstring)."""
    # trim FIRST: crawl URL fields carry framing whitespace, and Java's
    # '$' matches before a final newline while RE2's does not — trimming
    # keeps the Spark and DuckDB formulations value-identical on exactly
    # the inputs where the anchor semantics diverge
    stripped = F.regexp_replace(
        F.regexp_replace(url, r"^\s+", ""), r"\s+$", ""
    )  # NOT F.trim — it strips only 0x20, and a trailing \n is exactly
    # where the Java-vs-RE2 '$' divergence bites
    u = F.regexp_replace(stripped, r"#.*$", "")
    scheme = F.lower(F.regexp_extract(u, _SCHEME_RE, 1))
    auth = F.lower(F.regexp_extract(u, _AUTH_RE, 1))
    auth = F.regexp_replace(auth, r"^www\.", "")
    auth = F.when(
        scheme == "http", F.regexp_replace(auth, r":80$", "")
    ).when(
        scheme == "https", F.regexp_replace(auth, r":443$", "")
    ).otherwise(auth)
    rest = F.regexp_replace(u, _PREFIX_RE, "")
    path = F.regexp_extract(rest, r"^([^?]*)", 1)
    path = F.regexp_replace(path, r"/{2,}", "/")
    path = F.regexp_replace(path, r"/+$", "")
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.regexp_extract(rest, r"\?(.*)$", 1)
    kept = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda kv: (kv != "") & ~kv.rlike(TRACKING_PARAM_RE),
        )
    )
    query = F.array_join(kept, "&")
    return F.concat(
        scheme,
        F.lit("://"),
        auth,
        path,
        F.when(query == "", F.lit("")).otherwise(F.concat(F.lit("?"), query)),
    )


def canon_cte_sql(url_expr: str, carry: str, source: str) -> str:
    """DuckDB mirror of :func:`canonicalize_url` as a chain of CTEs.

    ``url_expr`` is the SQL expression producing the raw URL, ``carry`` a
    comma-separated list of columns to thread through, ``source`` the input
    relation. Returns the text of CTE bodies ``_u0.._u3`` where ``_u3``
    exposes ``carry`` plus ``curl`` (the canonical URL). Kept adjacent to
    the Spark expression so the two formulations evolve together
    (validate_oracles.py enforces equality)."""
    return rf"""
_u0 AS (
  SELECT {carry}, regexp_replace(regexp_replace(regexp_replace(
           {url_expr}, '^\s+', ''), '\s+$', ''), '#.*$', '') AS nofrag
  FROM {source}
),
_u1 AS (
  SELECT {carry}, nofrag,
         lower(regexp_extract(nofrag,
           '^([A-Za-z][A-Za-z0-9+.\-]*)://', 1)) AS scheme,
         regexp_replace(lower(regexp_extract(nofrag,
           '^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]*)', 1)),
           '^www\.', '') AS auth,
         regexp_replace(nofrag,
           '^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*', '') AS rest
  FROM _u0
),
_u2 AS (
  SELECT {carry}, scheme,
         CASE WHEN scheme = 'http' THEN regexp_replace(auth, ':80$', '')
              WHEN scheme = 'https' THEN regexp_replace(auth, ':443$', '')
              ELSE auth END AS auth,
         regexp_replace(regexp_replace(
             regexp_extract(rest, '^([^?]*)', 1), '/{{2,}}', '/', 'g'),
           '/+$', '') AS path_t,
         coalesce(array_to_string(list_sort(list_filter(
             regexp_split_to_array(regexp_extract(rest, '\?(.*)$', 1), '&'),
             x -> x <> '' AND NOT regexp_matches(
                    x, '^(utm_[A-Za-z]+|fbclid|gclid|msclkid)='))), '&'),
           '') AS q2
  FROM _u1
),
_u3 AS (
  SELECT {carry},
         scheme || '://' || auth
           || CASE WHEN path_t = '' THEN '/' ELSE path_t END
           || CASE WHEN q2 = '' THEN '' ELSE '?' || q2 END AS curl
  FROM _u2
)"""


def canonicalize_url_py(url: str) -> str:
    """Pure-Python reference (tests only — pins both SQL formulations)."""
    import re

    u = re.sub(r"#.*$", "", url.strip())
    m = re.match(r"^([A-Za-z][A-Za-z0-9+.\-]*)://([^/?#]*)(.*)$", u)
    if m:
        scheme = m.group(1).lower()
        auth = m.group(2).lower()
        rest = m.group(3)
    else:
        # mirror the SQL formulations exactly off the happy path too:
        # regexp_extract misses → scheme/auth '', the prefix strip is a
        # no-op → rest is the whole (fragment-stripped) input
        scheme, auth, rest = "", "", u
    auth = re.sub(r"^www\.", "", auth)
    if scheme == "http":
        auth = re.sub(r":80$", "", auth)
    elif scheme == "https":
        auth = re.sub(r":443$", "", auth)
    qm = rest.find("?")
    path, query = (rest[:qm], rest[qm + 1:]) if qm >= 0 else (rest, "")
    path = re.sub(r"/{2,}", "/", path)
    path = re.sub(r"/+$", "", path) or "/"
    kept = sorted(
        kv for kv in query.split("&")
        if kv and not re.match(r"^(utm_[A-Za-z]+|fbclid|gclid|msclkid)=", kv)
    )
    q = "&".join(kept)
    return f"{scheme}://{auth}{path}" + (f"?{q}" if q else "")
