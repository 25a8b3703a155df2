"""From-scratch Compound File Binary codec (MS-CFB — the OLE2 container).

The container under every legacy binary office document in a web crawl:
.doc (MS-DOC), .xls (MS-XLS/BIFF8), .ppt (MS-PPT). Same two halves as
codec_zip:

* a **reader** shaped for hostile crawl bytes: header-validated sector
  walk (FAT + DIFAT), directory scanned linearly (the red-black sibling
  tree in real crawl files is routinely corrupt — every mainstream
  reader falls back to a linear scan), mini-stream (<4096-byte streams
  in 64-byte mini sectors chained by the miniFAT) resolved through the
  root entry, chain-walk hard-capped so a crafted FAT cycle terminates
  instead of spinning an executor.
* a deterministic **writer** for fixture documents: proper mini-stream
  placement for small streams, DIFAT-in-header (109 FAT sectors is
  orders of magnitude beyond fixture sizes), degenerate-but-valid
  directory sibling chain in CFB name order.

Only stdlib ``struct`` is used. Reference behavior context: gnosis-ocr
allow-lists doc/xls/ppt extensions (/root/reference/app/config.py:19)
but never opens the container.
"""

from __future__ import annotations

import struct

MAGIC = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"

_FREESECT = 0xFFFFFFFF
_ENDOFCHAIN = 0xFFFFFFFE
_FATSECT = 0xFFFFFFFD
_DIFSECT = 0xFFFFFFFC

# chain-walk cap: no real office document approaches a million sectors at
# fixture/crawl-document sizes; a cyclic FAT must terminate, not spin
_MAX_CHAIN = 1 << 20


class CfbError(ValueError):
    pass


def _u16(b: bytes, off: int) -> int:
    return struct.unpack_from("<H", b, off)[0]


def _u32(b: bytes, off: int) -> int:
    return struct.unpack_from("<L", b, off)[0]


class CfbView:
    """Name-indexed stream reader over one in-memory compound file."""

    def __init__(self, data: bytes):
        if len(data) < 512 or not data.startswith(MAGIC):
            raise CfbError("not a compound file")
        self._data = data
        sector_shift = _u16(data, 30)
        if sector_shift not in (9, 12):
            raise CfbError(f"bad sector shift {sector_shift}")
        self._ssz = 1 << sector_shift
        self._mssz = 1 << _u16(data, 32)  # mini sector size (64)
        first_dir = _u32(data, 48)
        self._mini_cutoff = _u32(data, 56)
        first_minifat = _u32(data, 60)
        n_minifat = _u32(data, 64)
        first_difat = _u32(data, 68)
        n_difat = _u32(data, 72)

        # FAT sector list: 109 header DIFAT entries + DIFAT sector chain
        fat_sectors = [
            _u32(data, 76 + 4 * i) for i in range(109)
        ]
        # a file holds at most len(data)//sector_size real sectors — the
        # hard bound every chain walk below uses (a crafted n_difat or a
        # self-cycling next-pointer could otherwise amplify a ~1 KB file
        # into billions of FAT ids and OOM the executor)
        max_real = len(data) // self._ssz + 2
        sect = first_difat
        for _ in range(min(n_difat, max_real)):
            if sect in (_ENDOFCHAIN, _FREESECT):
                break
            raw = self._sector(sect)
            per = self._ssz // 4 - 1
            fat_sectors.extend(
                struct.unpack_from(f"<{per}L", raw, 0)
            )
            if len(fat_sectors) > max_real:
                fat_sectors = fat_sectors[:max_real]
                break
            sect = _u32(raw, self._ssz - 4)
        self._fat: list[int] = []
        for fs in fat_sectors:
            if fs in (_FREESECT, _ENDOFCHAIN):
                continue
            raw = self._sector(fs, allow_short=True)
            if raw is None:
                continue
            self._fat.extend(struct.unpack_from(f"<{len(raw) // 4}L", raw, 0))

        # directory entries (linear scan; 128 bytes each)
        dir_raw = self._read_chain(first_dir, None)
        self.entries: dict[str, tuple[int, int, int]] = {}  # name→(type,start,size)
        self._root_start = _ENDOFCHAIN
        self._root_size = 0
        for off in range(0, len(dir_raw) - 127, 128):
            name_len = _u16(dir_raw, off + 64)
            etype = dir_raw[off + 66]
            if etype == 0 or name_len < 2 or name_len > 64:
                continue
            name = dir_raw[off : off + name_len - 2].decode(
                "utf-16-le", errors="replace"
            )
            start = _u32(dir_raw, off + 116)
            size = struct.unpack_from("<Q", dir_raw, off + 120)[0]
            if etype == 5:  # root storage → mini stream location
                self._root_start = start
                self._root_size = size
            elif etype == 2:
                self.entries.setdefault(name, (etype, start, min(size, 1 << 31)))

        # miniFAT
        self._minifat: list[int] = []
        if n_minifat and first_minifat not in (_ENDOFCHAIN, _FREESECT):
            raw = self._read_chain(first_minifat, None)
            self._minifat = list(struct.unpack_from(f"<{len(raw) // 4}L", raw, 0))
        self._ministream: bytes | None = None

    # -- sector plumbing ----------------------------------------------------

    def _sector(self, n: int, allow_short: bool = False) -> bytes | None:
        off = 512 + n * self._ssz
        raw = self._data[off : off + self._ssz]
        if len(raw) < self._ssz:
            if allow_short:
                return raw if raw else None
            raw = raw + b"\x00" * (self._ssz - len(raw))  # truncated crawl tail
        return raw

    def _read_chain(self, start: int, size: int | None) -> bytes:
        out = []
        sect = start
        # a legal chain cannot be longer than the file's sector count; a
        # cyclic FAT entry would otherwise materialize _MAX_CHAIN sectors
        # (4 GiB at shift 12) before the size slice applies
        max_real = len(self._data) // self._ssz + 2
        for _ in range(min(_MAX_CHAIN, max_real)):
            if sect in (_ENDOFCHAIN, _FREESECT) or sect >= _FATSECT:
                break
            raw = self._sector(sect)
            if raw is None:
                break
            out.append(raw)
            sect = self._fat[sect] if sect < len(self._fat) else _ENDOFCHAIN
        data = b"".join(out)
        return data[:size] if size is not None else data

    def _mini(self) -> bytes:
        if self._ministream is None:
            self._ministream = self._read_chain(self._root_start, self._root_size)
        return self._ministream

    def _read_minichain(self, start: int, size: int) -> bytes:
        mini = self._mini()
        out = []
        sect = start
        max_mini = len(mini) // self._mssz + 2
        for _ in range(min(_MAX_CHAIN, max_mini)):
            if sect in (_ENDOFCHAIN, _FREESECT) or sect >= _FATSECT:
                break
            out.append(mini[sect * self._mssz : (sect + 1) * self._mssz])
            sect = self._minifat[sect] if sect < len(self._minifat) else _ENDOFCHAIN
        return b"".join(out)[:size]

    # -- public API ----------------------------------------------------------

    def names(self) -> list[str]:
        return list(self.entries)

    def __contains__(self, name: str) -> bool:
        return self._find(name) is not None

    def _find(self, name: str):
        hit = self.entries.get(name)
        if hit is not None:
            return hit
        low = name.lower()
        for n, e in self.entries.items():
            if n.lower() == low:
                return e
        return None

    def read(self, name: str) -> bytes:
        e = self._find(name)
        if e is None:
            raise CfbError(f"no stream {name!r}")
        _, start, size = e
        if size < self._mini_cutoff:
            return self._read_minichain(start, size)
        return self._read_chain(start, size)

    def try_read(self, name: str) -> bytes | None:
        try:
            return self.read(name)
        except Exception:
            return None


# ---------------------------------------------------------------------------
# writer (fixtures)
# ---------------------------------------------------------------------------


def _cfb_name_key(name: str) -> tuple[int, str]:
    # CFB directory order: shorter names first, then case-insensitive
    return (len(name), name.upper())


def build_cfb(streams: list[tuple[str, bytes]]) -> bytes:
    """Deterministic minimal compound file: 512-byte sectors, header-DIFAT
    only, small streams in a proper mini stream, degenerate right-sibling
    directory chain in CFB name order."""
    ssz, mssz, cutoff = 512, 64, 4096
    streams = sorted(streams, key=lambda kv: _cfb_name_key(kv[0]))

    # partition into mini and regular streams
    mini_parts: list[tuple[str, bytes]] = []
    big_parts: list[tuple[str, bytes]] = []
    for name, payload in streams:
        (mini_parts if len(payload) < cutoff else big_parts).append((name, payload))

    # build the mini stream + miniFAT
    ministream = bytearray()
    minifat: list[int] = []
    mini_start: dict[str, int] = {}
    for name, payload in mini_parts:
        n_ms = max(1, -(-len(payload) // mssz))
        first = len(minifat)
        mini_start[name] = first
        for k in range(n_ms):
            minifat.append(first + k + 1 if k + 1 < n_ms else _ENDOFCHAIN)
        ministream += payload + b"\x00" * (n_ms * mssz - len(payload))

    # lay out regular sectors: [big streams][ministream][miniFAT][dir][FAT]
    sectors: list[bytes] = []
    fat: list[int] = []

    def _append_stream(payload: bytes) -> int:
        if not payload:
            return _ENDOFCHAIN
        n = -(-len(payload) // ssz)
        first = len(sectors)
        for k in range(n):
            chunk = payload[k * ssz : (k + 1) * ssz]
            sectors.append(chunk + b"\x00" * (ssz - len(chunk)))
            fat.append(first + k + 1 if k + 1 < n else _ENDOFCHAIN)
        return first

    big_start = {name: _append_stream(p) for name, p in big_parts}
    ministream_start = _append_stream(bytes(ministream))
    minifat_blob = b"".join(struct.pack("<L", v) for v in minifat)
    minifat_start = _append_stream(minifat_blob)
    n_minifat_sectors = -(-len(minifat_blob) // ssz) if minifat_blob else 0

    # directory: root + one entry per stream, right-sibling chain
    order = [name for name, _ in streams]
    sizes = dict(streams)

    def _dir_entry(name: str, etype: int, start: int, size: int,
                   child: int, right: int) -> bytes:
        raw_name = name.encode("utf-16-le") + b"\x00\x00"
        e = bytearray(128)
        e[0 : len(raw_name)] = raw_name
        struct.pack_into("<H", e, 64, len(raw_name))
        e[66] = etype
        e[67] = 1  # black
        struct.pack_into("<lll", e, 68, -1, right, child)  # left, right, child
        struct.pack_into("<L", e, 116, start)
        struct.pack_into("<Q", e, 120, size)
        return bytes(e)

    entries = [
        _dir_entry(
            "Root Entry", 5, ministream_start, len(ministream),
            1 if order else -1, -1,
        )
    ]
    for i, name in enumerate(order):
        payload = sizes[name]
        start = (
            mini_start[name] if len(payload) < cutoff else big_start[name]
        )
        right = i + 2 if i + 1 < len(order) else -1
        entries.append(_dir_entry(name, 2, start, len(payload), -1, right))
    dir_blob = b"".join(entries)
    dir_start = _append_stream(dir_blob)

    # FAT sectors: the FAT must cover its own sectors too, and the
    # _FATSECT marks must land at slot index == their sector number, so
    # they go IMMEDIATELY after the data-sector entries (fat_start ==
    # len(sectors) == len(fat)); free-slot padding only ever follows them
    n_fat_sectors = 1
    while (len(fat) + n_fat_sectors) * 4 > n_fat_sectors * ssz:
        n_fat_sectors += 1
    fat_start = len(sectors)
    fat = fat + [_FATSECT] * n_fat_sectors
    fat_blob = b"".join(struct.pack("<L", v) for v in fat)
    fat_blob += struct.pack("<L", _FREESECT) * (
        (n_fat_sectors * ssz - len(fat_blob)) // 4
    )
    for k in range(n_fat_sectors):
        sectors.append(fat_blob[k * ssz : (k + 1) * ssz])

    header = bytearray(512)
    header[0:8] = MAGIC
    struct.pack_into("<H", header, 24, 0x003E)  # minor
    struct.pack_into("<H", header, 26, 0x0003)  # major (512-byte sectors)
    struct.pack_into("<H", header, 28, 0xFFFE)  # little-endian
    struct.pack_into("<H", header, 30, 9)  # sector shift
    struct.pack_into("<H", header, 32, 6)  # mini sector shift
    struct.pack_into("<L", header, 44, n_fat_sectors)
    struct.pack_into("<L", header, 48, dir_start)
    struct.pack_into("<L", header, 56, cutoff)
    struct.pack_into(
        "<L", header, 60, minifat_start if minifat else _ENDOFCHAIN
    )
    struct.pack_into("<L", header, 64, n_minifat_sectors)
    struct.pack_into("<L", header, 68, _ENDOFCHAIN)  # no DIFAT sectors
    struct.pack_into("<L", header, 72, 0)
    for i in range(109):
        struct.pack_into(
            "<L", header, 76 + 4 * i,
            fat_start + i if i < n_fat_sectors else _FREESECT,
        )
    return bytes(header) + b"".join(sectors)
