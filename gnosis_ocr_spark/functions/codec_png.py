"""Minimal stdlib-only PNG encoder/decoder (public PNG spec, RFC 2083).

The reference rasterizes PDF pages to PNG at dpi=150 via poppler
(/root/reference/app/jobs.py:386-390, fmt='PNG'). Poppler/PIL are not
available in this container, so the rasterize stage produces *real* (valid,
decodable) grayscale PNGs whose pixels are a deterministic function of the
page text, and embeds the ground-truth page text in an iTXt chunk. The
deterministic stub OCR engine (operators/ocr.py) reads that chunk back — a
clearly-marked CI stand-in for the Nanonets-OCR-s model; the Spark-side
plumbing (schemas, batching, partitioning) is real and benchmarked.
"""

from __future__ import annotations

import struct
import zlib

_MAGIC = b"\x89PNG\r\n\x1a\n"
_KEYWORD = b"gnosis-stub-text"


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def encode_page_png(text: str, width: int = 64, height: int = 64) -> bytes:
    """Render ``text`` to a deterministic grayscale PNG.

    Pixels are a seeded pattern of the text bytes (so distinct pages get
    distinct images); the exact text rides along in an iTXt chunk (UTF-8 per
    the PNG spec — tEXt is Latin-1 only).
    """
    payload = text.encode("utf-8")
    seed = zlib.crc32(payload)
    rows = bytearray()
    for y in range(height):
        rows.append(0)  # filter type 0 (None)
        for x in range(width):
            b = payload[(x + y * width) % len(payload)] if payload else 0
            rows.append((seed ^ (x * 31 + y * 17) ^ b) & 0xFF)
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)  # 8-bit gray
    itxt = _KEYWORD + b"\x00" + b"\x00\x00" + b"\x00" + b"\x00" + payload
    return (
        _MAGIC
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"iTXt", itxt)
        + _chunk(b"IDAT", zlib.compress(bytes(rows), 6))
        + _chunk(b"IEND", b"")
    )


def iter_chunks(png: bytes):
    """Yield ``(tag, data)`` for each chunk of a PNG byte string."""
    if png[:8] != _MAGIC:
        raise ValueError("not a PNG")
    off = 8
    while off + 8 <= len(png):
        (length,) = struct.unpack(">I", png[off : off + 4])
        tag = png[off + 4 : off + 8]
        data = png[off + 8 : off + 8 + length]
        yield tag, data
        off += 12 + length
        if tag == b"IEND":
            break


def decode_dimensions(png: bytes) -> tuple[int, int]:
    for tag, data in iter_chunks(png):
        if tag == b"IHDR":
            w, h = struct.unpack(">II", data[:8])
            return w, h
    raise ValueError("no IHDR")


def decode_pixels(png: bytes) -> bytes:
    """Return raw grayscale pixel bytes (filter-0 scanlines stripped)."""
    w, h = decode_dimensions(png)
    for tag, data in iter_chunks(png):
        if tag == b"IDAT":
            raw = zlib.decompress(data)
            out = bytearray()
            stride = w + 1
            for y in range(h):
                row = raw[y * stride : (y + 1) * stride]
                if row[0] != 0:
                    raise ValueError("only filter 0 supported")
                out += row[1:]
            return bytes(out)
    raise ValueError("no IDAT")


def decode_stub_text(png: bytes) -> str:
    """Read the ground-truth text embedded by :func:`encode_page_png`."""
    for tag, data in iter_chunks(png):
        if tag == b"iTXt" and data.startswith(_KEYWORD + b"\x00"):
            body = data[len(_KEYWORD) + 1 :]
            # compression flag, compression method, then lang\0 translated\0
            body = body[2:]
            body = body.split(b"\x00", 2)[2]
            return body.decode("utf-8")
    raise ValueError("no gnosis-stub-text iTXt chunk")
