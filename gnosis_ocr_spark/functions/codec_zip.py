"""From-scratch ZIP container codec (PKWARE APPNOTE.TXT / ISO 21320-1).

The container under every OOXML office document (docx/xlsx/pptx), ODF
document (odt) and EPUB e-book in a web crawl. Two halves:

* a **reader** built for hostile crawl bytes: central-directory driven
  (EOCD scan from the tail, so trailing garbage and self-extractor
  prefixes both work), with a local-header fallback scan when the central
  directory is truncated away (very common for interrupted crawl fetches
  — the front of the archive still carries whole entries). Decompressed
  output is hard-bounded per entry (zip-bomb guard, same rationale as
  codec_jpeg.MAX_PIXELS: hostile input must never MemoryError an
  executor).
* a deterministic **writer** used by the fixture builders (corpus office
  documents, tests): fixed DOS timestamp, stored or deflate members,
  correct CRCs — spec-valid archives that any unzip opens.

Only ``zlib`` is used for the DEFLATE bitstream itself (same stdlib-
primitive policy as the PNG/Flate codecs). No ``zipfile``: the stdlib
reader refuses archives crawls routinely produce (no EOCD, sizes in data
descriptors, garbage tails) and cannot express the recovery semantics we
need.

Reference behavior context: the gnosis-ocr service routes by file
extension and never opens containers (/root/reference/app/config.py:19);
at crawl scale the container walk is how office text becomes extractable
at all.
"""

from __future__ import annotations

import struct
import zlib
from dataclasses import dataclass

_EOCD_SIG = b"PK\x05\x06"
_CEN_SIG = b"PK\x01\x02"
_LOC_SIG = b"PK\x03\x04"

# Per-entry decompressed-size ceiling. Office XML parts in real documents
# are single-digit MB; 64 MiB leaves an order of magnitude of headroom
# while keeping a crafted 4 GB-declaring bomb from allocating.
MAX_ENTRY_BYTES = 64 * 1024 * 1024

STORED = 0
DEFLATED = 8

# fixed DOS date/time for deterministic writer output: 2020-01-01 00:00:00
_DOS_DATE = ((2020 - 1980) << 9) | (1 << 5) | 1
_DOS_TIME = 0


@dataclass(frozen=True)
class ZipEntry:
    name: str
    method: int
    crc32: int
    csize: int
    usize: int
    header_off: int  # local header offset within the archive bytes


class ZipError(ValueError):
    pass


def _decode_name(raw: bytes, flags: int) -> str:
    # general-purpose bit 11 = UTF-8 name; otherwise cp437 per APPNOTE,
    # which never fails (every byte maps)
    if flags & 0x800:
        try:
            return raw.decode("utf-8")
        except UnicodeDecodeError:
            return raw.decode("cp437")
    return raw.decode("cp437")


def _find_eocd(data: bytes) -> int | None:
    # EOCD is 22 bytes + comment (<= 64 KiB); scan backwards from the tail.
    # A bare rfind is wrong when the archive COMMENT (or trailing garbage)
    # happens to contain the 4-byte signature — validate each candidate
    # (comment length reaches the file end, or a plausible central dir)
    # and keep scanning backwards past impostors.
    lo = max(0, len(data) - 22 - 65536)
    pos = data.rfind(_EOCD_SIG, lo)
    while pos >= 0:
        if pos + 22 <= len(data):
            (clen,) = struct.unpack_from("<H", data, pos + 20)
            (cen_size, cen_off) = struct.unpack_from("<LL", data, pos + 12)
            comment_ok = pos + 22 + clen == len(data)
            cen_ok = (
                0 <= pos - cen_size and data.startswith(_CEN_SIG, pos - cen_size)
            ) or (
                0 <= cen_off < len(data) and data.startswith(_CEN_SIG, cen_off)
            )
            if comment_ok or cen_ok:
                return pos
        pos = data.rfind(_EOCD_SIG, lo, pos)
    return None


def _entries_from_central(data: bytes) -> list[ZipEntry] | None:
    eocd = _find_eocd(data)
    if eocd is None or eocd + 22 > len(data):
        return None
    (n_total, cen_size, cen_off) = struct.unpack_from("<HLL", data, eocd + 10)
    # tolerate self-extractor prefixes / re-based archives: the recorded
    # offset may be wrong by a constant shift; re-anchor on the signature
    start = eocd - cen_size
    if not (0 <= start <= eocd) or not data.startswith(_CEN_SIG, start):
        start = cen_off
        if not (0 <= start < len(data)) or not data.startswith(_CEN_SIG, start):
            return None
    shift = start - cen_off  # apply the same re-basing to local offsets
    out: list[ZipEntry] = []
    pos = start
    for _ in range(n_total):
        if not data.startswith(_CEN_SIG, pos) or pos + 46 > len(data):
            break  # truncated central directory: keep what parsed
        (flags, method, crc, csize, usize, nlen, elen, clen) = struct.unpack_from(
            "<4xHH4xLLLHHH", data, pos + 4
        )
        (loc_off,) = struct.unpack_from("<L", data, pos + 42)
        name = _decode_name(data[pos + 46 : pos + 46 + nlen], flags)
        out.append(ZipEntry(name, method, crc, csize, usize, loc_off + shift))
        pos += 46 + nlen + elen + clen
    return out if out else None


def _entries_from_local_scan(data: bytes) -> list[ZipEntry]:
    """Recovery path: walk local headers from the front (truncated archive
    with the central directory cut off). Entries whose sizes live only in
    a data descriptor (flag bit 3) get csize=0 and are decoded by streaming
    DEFLATE until stream end."""
    out: list[ZipEntry] = []
    pos = 0
    while True:
        pos = data.find(_LOC_SIG, pos)
        if pos < 0 or pos + 30 > len(data):
            break
        (flags, method, crc, csize, usize, nlen, elen) = struct.unpack_from(
            "<2xHH4xLLLHH", data, pos + 4
        )
        name = _decode_name(data[pos + 30 : pos + 30 + nlen], flags)
        out.append(ZipEntry(name, method, crc, csize, usize, pos))
        body = pos + 30 + nlen + elen
        if flags & 0x8 and csize == 0:
            # sizes deferred to the data descriptor: resync on the next
            # local-header signature (descriptor-spanning false positives
            # are possible but vanishingly rare in practice)
            pos = body
        else:
            pos = body + csize
    return out


def zip_entries(data: bytes) -> list[ZipEntry]:
    """All parseable entries, central-directory first, local-scan fallback."""
    if len(data) < 30 or not data.startswith(_LOC_SIG):
        # still allow prefixed archives if a central directory resolves
        cen = _entries_from_central(data) if len(data) >= 22 else None
        return cen or []
    return _entries_from_central(data) or _entries_from_local_scan(data)


def zip_read(data: bytes, entry: ZipEntry, verify_crc: bool = False) -> bytes:
    """Decompress one entry's bytes (bounded by MAX_ENTRY_BYTES)."""
    off = entry.header_off
    if off + 30 > len(data) or not data.startswith(_LOC_SIG, off):
        raise ZipError(f"bad local header for {entry.name!r}")
    (method, nlen, elen) = struct.unpack_from("<4xH16xHH", data, off + 4)
    body = off + 30 + nlen + elen
    limit = min(entry.usize or MAX_ENTRY_BYTES, MAX_ENTRY_BYTES)
    # the archive itself cut short mid-entry (interrupted crawl fetch):
    # return the partial bytes — truncated XML still yields most of the text
    input_cut = bool(entry.csize) and body + entry.csize > len(data)
    if method == STORED:
        csize = entry.csize or entry.usize
        out = data[body : body + csize]
        if len(out) < csize and not input_cut:
            raise ZipError(f"truncated stored entry {entry.name!r}")
    elif method == DEFLATED:
        end = body + entry.csize if entry.csize else len(data)
        dec = zlib.decompressobj(-15)
        try:
            out = dec.decompress(data[body:end], limit)
        except zlib.error as exc:
            raise ZipError(f"bad deflate stream in {entry.name!r}: {exc}") from exc
        if dec.unconsumed_tail and len(out) >= limit:
            raise ZipError(f"entry {entry.name!r} exceeds {limit} bytes")
        if not dec.eof and not input_cut and entry.csize:
            raise ZipError(f"truncated deflate stream in {entry.name!r}")
    else:
        raise ZipError(f"unsupported compression method {method} for {entry.name!r}")
    if entry.usize and len(out) != entry.usize and entry.csize and not input_cut:
        raise ZipError(
            f"size mismatch in {entry.name!r}: got {len(out)}, header says {entry.usize}"
        )
    if verify_crc and entry.crc32 and zlib.crc32(out) != entry.crc32:
        raise ZipError(f"crc mismatch in {entry.name!r}")
    return out


class ZipView:
    """Name-indexed read view over one in-memory archive."""

    def __init__(self, data: bytes):
        self._data = data
        self.entries: dict[str, ZipEntry] = {}
        for e in zip_entries(data):
            # last wins on duplicate names, matching every mainstream reader
            if not e.name.endswith("/"):
                self.entries[e.name] = e

    def names(self) -> list[str]:
        return list(self.entries)

    def __contains__(self, name: str) -> bool:
        return name in self.entries

    def read(self, name: str) -> bytes:
        return zip_read(self._data, self.entries[name])

    def try_read(self, name: str) -> bytes | None:
        e = self.entries.get(name)
        if e is None:
            return None
        try:
            return zip_read(self._data, e)
        except ZipError:
            return None


# ---------------------------------------------------------------------------
# writer (fixtures)
# ---------------------------------------------------------------------------


def build_zip(
    entries: list[tuple[str, bytes]],
    compress: bool = True,
    stored: frozenset[str] | set[str] = frozenset(),
) -> bytes:
    """Deterministic spec-valid archive. ``stored`` names are written with
    method 0 (EPUB/ODT require their ``mimetype`` member stored first)."""
    blobs: list[bytes] = []
    central: list[bytes] = []
    offset = 0
    for name, payload in entries:
        raw = name.encode("utf-8")
        flags = 0x800 if any(b > 0x7F for b in raw) else 0
        crc = zlib.crc32(payload)
        if compress and name not in stored:
            comp = zlib.compressobj(6, zlib.DEFLATED, -15)
            cdata = comp.compress(payload) + comp.flush()
            method = DEFLATED
        else:
            cdata, method = payload, STORED
        local = (
            _LOC_SIG
            + struct.pack(
                "<HHHHHLLLHH",
                20, flags, method, _DOS_TIME, _DOS_DATE,
                crc, len(cdata), len(payload), len(raw), 0,
            )
            + raw
        )
        blobs.append(local + cdata)
        central.append(
            _CEN_SIG
            + struct.pack(
                "<HHHHHHLLLHHHHHLL",
                20, 20, flags, method, _DOS_TIME, _DOS_DATE,
                crc, len(cdata), len(payload), len(raw), 0, 0, 0, 0, 0, offset,
            )
            + raw
        )
        offset += len(local) + len(cdata)
    cen = b"".join(central)
    eocd = _EOCD_SIG + struct.pack(
        "<HHHHLLH", 0, 0, len(entries), len(entries), len(cen), offset, 0
    )
    return b"".join(blobs) + cen + eocd
