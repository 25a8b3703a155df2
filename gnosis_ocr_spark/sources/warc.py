"""WARC (ISO 28500) source — Common Crawl's native archive format, parsed
with the stdlib only. The engine's main input is an Iceberg/parquet table
(see ``sources/tables.py``), and this module is the ingest seam that gets
a raw crawl INTO that table: WARC files arrive as binary blobs (one row
per .warc/.warc.gz file), ``warc_records`` explodes them into the
``(url, warc_ts, html, …)`` shape the extraction pipeline scans.

Format notes (public spec + Common Crawl practice):
- records are ``WARC/1.x`` header blocks + Content-Length payload,
  separated by CRLF CRLF;
- real Common Crawl files are .warc.gz with ONE GZIP MEMBER PER RECORD
  (so byte-range fetches decompress independently) — zlib handles the
  concatenated-members stream;
- ``response`` records wrap an HTTP response; the body is everything
  after the first CRLF CRLF of the HTTP block, de-chunked when the
  server sent ``Transfer-Encoding: chunked`` and decompressed when it
  sent ``Content-Encoding: gzip/x-gzip/deflate`` (bounded output — a
  crafted bomb yields the raw bytes, never a MemoryError; failures keep
  the raw body, never raise).

Scale shape: one WARC file is one input row → ``mapInPandas`` explodes it
into record rows inside the executor (Arrow-batched, no per-row Python
UDF), so a 1000-file crawl shard parallelizes by file exactly like the
reference's per-blob jobs. Malformed records are skipped, counted, and
never raise — crawl archives contain garbage by construction."""

from __future__ import annotations

import zlib
from typing import Iterator

CRLF2 = b"\r\n\r\n"


def build_warc(
    records: list[tuple[str, str, bytes]],
    content_type: str = "text/html",
    gzip_per_record: bool = False,
) -> bytes:
    """Fixture writer: ``records`` = (target_uri, iso_date, http_body).
    Emits response records with a minimal HTTP/1.1 200 block; with
    ``gzip_per_record`` each record is its own gzip member (the Common
    Crawl layout)."""
    out = bytearray()
    for i, (uri, date, body) in enumerate(records):
        http = (
            b"HTTP/1.1 200 OK\r\nContent-Type: "
            + content_type.encode()
            + b"\r\nContent-Length: "
            + str(len(body)).encode()
            + CRLF2
            + body
        )
        rec_id = b"<urn:uuid:00000000-0000-0000-0000-%012d>" % i
        rec = (
            b"WARC/1.0\r\n"
            b"WARC-Type: response\r\n"
            b"WARC-Record-ID: " + rec_id + b"\r\n"
            b"WARC-Date: " + date.encode() + b"\r\n"
            b"WARC-Target-URI: " + uri.encode() + b"\r\n"
            b"Content-Type: application/http; msgtype=response\r\n"
            b"Content-Length: " + str(len(http)).encode() + CRLF2
            + http + CRLF2
        )
        if gzip_per_record:
            co = zlib.compressobj(6, zlib.DEFLATED, 16 + zlib.MAX_WBITS)
            out += co.compress(rec) + co.flush()
        else:
            out += rec
    return bytes(out)


def _gunzip_members(data: bytes) -> bytes:
    """Decompress a stream of concatenated gzip members (the per-record
    Common Crawl layout); plain data passes through."""
    if data[:2] != b"\x1f\x8b":
        return data
    # expansion bound: real WARC members compress ~3-10×; a crafted gzip
    # bomb expands orders of magnitude more. At 64× the compressed size
    # (floored at MAX_BODY_BYTES for tiny files) decompression STOPS and
    # the tail is dropped — the parser's totality contract (malformed →
    # records skipped, never raise, mutation-fuzz-pinned) holds while a
    # hostile file can no longer exhaust an executor.
    cap = max(64 * len(data), MAX_BODY_BYTES)
    out = bytearray()
    while data:
        d = zlib.decompressobj(16 + zlib.MAX_WBITS)
        try:
            out += d.decompress(data, max(cap - len(out), 1))
            if d.unconsumed_tail or len(out) >= cap:
                break  # bound hit mid-member: truncate, parser skips tail
            out += d.flush()
        except zlib.error:
            break
        data = d.unused_data
        if not data or data[:2] != b"\x1f\x8b":
            break
    return bytes(out)


def parse_warc_bytes(data: bytes) -> tuple[list[dict], int]:
    """Parse one WARC file (plain or per-record gzip) into a list of
    record dicts — see module docstring for the HTTP payload decoding."""
    return _parse_warc_impl(data)


# output ceiling per HTTP body (same executor-safety rationale as
# codec_zip.MAX_ENTRY_BYTES): a content-encoding bomb yields raw bytes
MAX_BODY_BYTES = 64 * 1024 * 1024


def _dechunk(body: bytes) -> bytes:
    """Decode Transfer-Encoding: chunked; on any malformation return the
    prefix decoded so far (crawl responses are routinely cut mid-chunk)."""
    out = bytearray()
    pos = 0
    while pos < len(body):
        eol = body.find(b"\r\n", pos)
        if eol < 0:
            break
        size_tok = body[pos:eol].split(b";", 1)[0].strip()
        try:
            size = int(size_tok, 16)
        except ValueError:
            break
        if size == 0:
            break
        out += body[eol + 2 : eol + 2 + size]
        pos = eol + 2 + size + 2  # skip the chunk's trailing CRLF
        if len(out) > MAX_BODY_BYTES:
            break
    return bytes(out)


def _content_decode(body: bytes, ce: str) -> bytes:
    """Content-Encoding: gzip / x-gzip / deflate (both the spec-correct
    zlib-wrapped form and the raw-deflate form real servers send)."""
    for wbits in (16 + zlib.MAX_WBITS,) if ce != "deflate" else (zlib.MAX_WBITS, -zlib.MAX_WBITS):
        d = zlib.decompressobj(wbits)
        try:
            out = d.decompress(body, MAX_BODY_BYTES)
        except zlib.error:
            continue
        if out:
            return out
    return body  # undecodable: keep raw (total, never raise)


def _parse_warc_impl(data: bytes):
    """Parse one WARC file (plain or per-record gzip) into a list of
    record dicts: ``{type, url, date, status, content_type, body}``.
    Returns ``(records, n_skipped)`` — malformed blocks are skipped."""
    data = _gunzip_members(data)
    records: list[dict] = []
    skipped = 0
    pos = 0
    while True:
        start = data.find(b"WARC/", pos)
        if start < 0:
            break
        hdr_end = data.find(CRLF2, start)
        if hdr_end < 0:
            skipped += 1
            break
        headers: dict[str, str] = {}
        for line in data[start:hdr_end].split(b"\r\n")[1:]:
            k, sep, v = line.partition(b":")
            if sep:
                headers[k.strip().lower().decode("latin-1")] = (
                    v.strip().decode("latin-1")
                )
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            skipped += 1
            pos = hdr_end + len(CRLF2)
            continue
        payload = data[hdr_end + len(CRLF2) : hdr_end + len(CRLF2) + length]
        pos = hdr_end + len(CRLF2) + length
        rec = {
            "type": headers.get("warc-type", ""),
            "url": headers.get("warc-target-uri", ""),
            "date": headers.get("warc-date", ""),
            "status": None,
            "content_type": None,
            "body": payload,
        }
        if "msgtype=response" in headers.get("content-type", ""):
            http_end = payload.find(CRLF2)
            if http_end >= 0:
                http_head, body = payload[:http_end], payload[http_end + 4 :]
                lines = http_head.split(b"\r\n")
                parts = lines[0].split()
                if len(parts) >= 2 and parts[1].isdigit():
                    rec["status"] = int(parts[1])
                te = ce = ""
                for line in lines[1:]:
                    k, sep, v = line.partition(b":")
                    key = k.strip().lower()
                    if sep and key == b"content-type":
                        rec["content_type"] = v.strip().decode("latin-1")
                    elif sep and key == b"transfer-encoding":
                        te = v.strip().lower().decode("latin-1")
                    elif sep and key == b"content-encoding":
                        ce = v.strip().lower().decode("latin-1")
                if "chunked" in te:
                    body = _dechunk(body)
                if ce in ("gzip", "x-gzip", "deflate"):
                    body = _content_decode(body, ce)
                rec["body"] = body
        records.append(rec)
    return records, skipped


def warc_records(df, name_col: str = "name", data_col: str = "data"):
    """Explode a DataFrame of WARC blobs ``(name, data:binary)`` into
    response-record rows ``(warc_name, url, warc_date, http_status,
    content_type, html)`` — the extraction pipeline's input shape."""
    import pandas as pd

    schema = (
        "warc_name string, url string, warc_date string, "
        "http_status int, content_type string, html binary"
    )

    def explode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows: dict[str, list] = {
                "warc_name": [], "url": [], "warc_date": [],
                "http_status": [], "content_type": [], "html": [],
            }
            for name, blob in zip(b[name_col], b[data_col]):
                recs, _ = parse_warc_bytes(bytes(blob))
                for r in recs:
                    if r["type"] != "response":
                        continue
                    rows["warc_name"].append(name)
                    rows["url"].append(r["url"])
                    rows["warc_date"].append(r["date"])
                    rows["http_status"].append(r["status"])
                    rows["content_type"].append(r["content_type"])
                    rows["html"].append(r["body"])
            yield pd.DataFrame(rows)

    return df.mapInPandas(explode, schema=schema)
