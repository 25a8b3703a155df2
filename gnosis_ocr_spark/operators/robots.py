"""robots.txt (RFC 9309 Robots Exclusion Protocol) — the other half of
the crawl-frontier contract next to sitemaps (feed_extract): a polite
pipeline at 100 TB scale must evaluate fetched URLs against each host's
robots rules before extraction, and the meta-robots noindex gate
(html_extract) only covers pages already fetched.

Semantics implemented per the RFC:

* groups = one or more ``User-agent`` lines followed by Allow/Disallow
  rules; a crawler obeys the group whose agent token is the LONGEST
  case-insensitive prefix match of its product token, falling back to
  the ``*`` group;
* rule matching is longest-pattern-wins over the URL path (+query),
  ties break to Allow; an empty ``Disallow:`` allows everything;
* ``*`` matches any octet sequence, ``$`` anchors the pattern end;
* unknown directives are ignored; ``#`` starts a comment; parsing is
  total on arbitrary crawl bytes (never raises);
* ``Sitemap:`` is a global directive (absolute URLs — these feed
  feed_extract.sitemap_urls); ``Crawl-delay`` is kept per group
  (non-standard but ubiquitous, drives fetch scheduling).

The Spark operator broadcast-joins parsed per-host rule tables against a
URL frontier and evaluates the match in one Arrow-batched pass — rules
tables are KB-scale per host, the frontier is the big side and never
reshuffles.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

MAX_ROBOTS_BYTES = 512 * 1024  # Google caps parse at 500 KiB — same bound
MAX_RULES = 5000


def parse_robots(data: bytes) -> dict:
    """robots.txt bytes → ``{"groups": [{"agents": [..], "rules":
    [(allow: bool, pattern: str), ...], "crawl_delay": float | None}],
    "sitemaps": [url, ...]}``. Total: undecodable/hostile input yields
    empty groups (= everything allowed)."""
    # utf-8-sig: a BOM'd robots.txt would otherwise turn its first line
    # into the unknown directive "﻿user-agent" and the whole file
    # into allow-all (Google's parser strips the BOM explicitly too)
    text = data[:MAX_ROBOTS_BYTES].decode("utf-8-sig", errors="replace")
    groups: list[dict] = []
    sitemaps: list[str] = []
    cur: dict | None = None
    rules_started = False
    n_rules = 0
    for raw_line in text.splitlines():
        line = raw_line.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, value = line.partition(":")
        key = key.strip().lower()
        value = value.strip()
        if key == "user-agent":
            if cur is None or rules_started:
                cur = {"agents": [], "rules": [], "crawl_delay": None}
                groups.append(cur)
                rules_started = False
            cur["agents"].append(value.lower())
        elif key in ("allow", "disallow"):
            if cur is None:  # rules before any user-agent: ignored per RFC
                continue
            rules_started = True
            if n_rules >= MAX_RULES:
                continue
            if value == "" and key == "disallow":
                continue  # empty Disallow allows all: no rule needed
            if value:
                cur["rules"].append((key == "allow", value))
                n_rules += 1
        elif key == "crawl-delay" and cur is not None:
            rules_started = True
            try:
                cur["crawl_delay"] = float(value)
            except ValueError:
                pass
        elif key == "sitemap" and value:
            sitemaps.append(value)
    return {"groups": groups, "sitemaps": sitemaps}


def rules_for_agent(parsed: dict, agent: str = "*") -> dict:
    """The combined rule set a crawler with product token ``agent`` obeys:
    the most specific (longest prefix-matching) agent token wins, and ALL
    groups carrying that token merge — RFC 9309 §2.2.1 requires combining
    matching groups (duplicate ``User-agent: x`` blocks are common in real
    robots.txt). ``*`` groups are the fallback, also merged."""
    agent = agent.lower()
    best_len = -1
    for g in parsed.get("groups", []):
        for a in g["agents"]:
            if a != "*" and agent.startswith(a) and len(a) > best_len:
                best_len = len(a)

    def merged(match) -> dict:
        out = {"agents": [agent], "rules": [], "crawl_delay": None}
        hit = False
        for g in parsed.get("groups", []):
            if any(match(a) for a in g["agents"]):
                hit = True
                out["rules"].extend(g["rules"])
                if out["crawl_delay"] is None:
                    out["crawl_delay"] = g["crawl_delay"]
        return out if hit else None

    if best_len >= 0:
        got = merged(
            lambda a: a != "*" and agent.startswith(a) and len(a) == best_len
        )
        if got is not None:
            return got
    got = merged(lambda a: a == "*")
    if got is not None:
        return got
    return {"agents": [agent], "rules": [], "crawl_delay": None}


def _pattern_re(pattern: str) -> re.Pattern:
    anchored = pattern.endswith("$")
    if anchored:
        pattern = pattern[:-1]
    body = ".*".join(re.escape(part) for part in pattern.split("*"))
    return re.compile("^" + body + (r"\Z" if anchored else ""))


def _compile_group(group: dict) -> dict:
    """Pre-compile a group's rule patterns once — the hot-path form the
    frontier filter caches per host (re.compile per rule per URL would
    thrash re's LRU on large real-world robots files)."""
    return {
        "rules": [
            (allow, len(p), _pattern_re(p)) for allow, p in group.get("rules", [])
        ],
        "crawl_delay": group.get("crawl_delay"),
    }


def _allowed_compiled(cgroup: dict, path: str) -> bool:
    if not path.startswith("/"):
        path = "/" + path
    best_len = -1
    verdict = True
    for allow, plen, rx in cgroup["rules"]:
        if rx.match(path):
            # longest pattern wins; the tie-to-Allow rule is the `allow and
            # not verdict` half of the condition
            if plen > best_len or (plen == best_len and allow and not verdict):
                best_len = plen
                verdict = allow
    return verdict


def robots_allowed(group: dict, path: str) -> bool:
    """Longest-pattern-wins evaluation of a URL path against a group's
    rules (ties → Allow; no match → allowed)."""
    return _allowed_compiled(_compile_group(group), path)


def robots_filter(urls_df, robots_df, agent: str = "*",
                  url_col: str = "url", host_col: str = "host",
                  data_col: str = "data"):
    """Frontier filter: ``urls_df (host, url)`` × ``robots_df (host,
    data: robots.txt bytes)`` → the frontier rows annotated with
    ``allowed`` and the host's ``crawl_delay``. Hosts with no robots row
    (or unparseable bytes) allow everything, per the protocol.

    Plan shape: the robots side is per-host KB-scale → broadcast join;
    the frontier is the 100 TB side and never reshuffles; evaluation is
    one Arrow-batched mapInPandas with a per-host compiled-rules cache."""
    import pandas as pd
    from pyspark.sql import functions as F
    from urllib.parse import urlsplit

    joined = urls_df.join(
        F.broadcast(
            robots_df.select(
                F.col(host_col).alias("_rhost"), F.col(data_col).alias("_robots")
            )
        ),
        urls_df[host_col] == F.col("_rhost"),
        "left",
    ).select(
        F.col(host_col).alias("host"), F.col(url_col).alias("url"), "_robots"
    )

    schema = "host string, url string, allowed boolean, crawl_delay double"

    _empty = _compile_group({"rules": [], "crawl_delay": None})

    def evaluate(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # keyed by HOST (the join key) — keying on the blob would copy and
        # hash up to 512 KB of robots bytes per frontier row
        cache: dict[str, dict] = {}
        for b in batches:
            hosts, urls, allowed, delays = [], [], [], []
            for host, url, blob in zip(b["host"], b["url"], b["_robots"]):
                hosts.append(host)
                urls.append(url)
                if url is None:  # junk frontier row: total, never a crash
                    allowed.append(None)
                    delays.append(None)
                    continue
                if blob is None:
                    cgroup = _empty
                else:
                    cgroup = cache.get(host)
                    if cgroup is None:
                        cgroup = _compile_group(
                            rules_for_agent(parse_robots(bytes(blob)), agent)
                        )
                        cache[host] = cgroup
                split = urlsplit(url if "://" in url else "http://h" + url)
                path = split.path or "/"
                if split.query:
                    path += "?" + split.query
                allowed.append(_allowed_compiled(cgroup, path))
                delays.append(cgroup.get("crawl_delay"))
            yield pd.DataFrame(
                {"host": hosts, "url": urls, "allowed": allowed,
                 "crawl_delay": delays}
            )

    return joined.mapInPandas(evaluate, schema=schema)


def build_robots(
    groups: list[tuple[list[str], list[tuple[bool, str]]]],
    sitemaps: list[str] = (),
    crawl_delay: float | None = None,
) -> bytes:
    """Fixture writer: [(agents, [(allow, pattern), ...]), ...] →
    protocol-valid robots.txt bytes."""
    lines: list[str] = []
    for agents, rules in groups:
        for a in agents:
            lines.append(f"User-agent: {a}")
        for allow, pattern in rules:
            lines.append(("Allow: " if allow else "Disallow: ") + pattern)
        if crawl_delay is not None:
            lines.append(f"Crawl-delay: {crawl_delay}")
        lines.append("")
    for sm in sitemaps:
        lines.append(f"Sitemap: {sm}")
    return "\n".join(lines).encode("utf-8")
