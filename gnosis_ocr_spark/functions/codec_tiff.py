"""TIFF 6.0 (Adobe, 1992 public spec) — container parse, strip decode, and
a fixture writer.

TIFF is the canonical scanned-document interchange container: real-crawl
scan archives ship 1-bit G3/G4 fax TIFFs, 8-bit gray/palette LZW TIFFs, and
RGB Deflate TIFFs. Everything a baseline-TIFF reader needs already exists
from scratch in this package — this module is deliberately thin
COMPOSITION, not new codec work:

- **CCITT G3/G4** strips (Compression 2/3/4) → :mod:`codec_ccitt`
  (``decode_g4`` / ``decode_g3_1d`` / ``decode_g3_2d``), with TIFF's
  T4Options/T6Options and FillOrder 2 (LSB-first) bit reversal handled
  here.
- **LZW** strips (Compression 5) → ``codec_pdf._lzw_decode`` (TIFF and PDF
  share the exact MSB-first early-change wire format; PDF §7.4.4 says so).
- **Deflate** strips (Compression 8 / legacy 32946) → zlib, output-bounded
  via ``decompressobj`` (same zip-bomb rationale as codec_png/codec_jpeg).
- **PackBits** (Compression 32773) → local 15-liner (PDF /RunLengthDecode
  minus the EOD byte; 0x80 is a no-op in TIFF).
- Predictor 2 (horizontal differencing) undone with a vectorized uint8
  ``np.add.accumulate`` (int64 temporaries are a measured multi-core
  scaling killer — see CLAUDE.md).

Supported shapes: stripped AND tiled (§15) baseline TIFF, bits 1/8/16
(16-bit folds to the high byte), SamplesPerPixel 1/3, Photometric 0/1
(gray), 2 (RGB → integer luma), 3 (palette → luma), FillOrder 1/2,
multi-strip, little- and big-endian, multi-page (first IFD decodes;
``tiff_num_pages`` counts the chain; ``split_tiff_pages`` rebuilds every
IFD as a still-compressed single-page file for the extraction pipeline),
new-style JPEG-in-TIFF (Compression 7, TechNote 2, incl. shared tag-347
JPEGTables → codec_jpeg). Out, loudly (ValueError → callers degrade to
their documented passthrough/stub path): old-style JPEG (Compression 6,
spec-deprecated), planar configuration 2.

The writer emits spec-valid files for every supported compression so
round-trip property tests certify real interop behavior in-container
(reference behavior to match: poppler/libtiff read these transparently,
/root/reference/app/jobs.py rasterizes scanned input via poppler).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

MAX_PIXELS = 50_000_000  # hostile-input bound, same as codec_ccitt/jpeg

# IFD entry types → byte widths (BYTE/ASCII/SHORT/LONG/RATIONAL plus
# SBYTE/UNDEFINED — tag 347 JPEGTables is type 7 UNDEFINED)
_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1}

_REV8 = np.array(
    [int(f"{i:08b}"[::-1], 2) for i in range(256)], dtype=np.uint8
)  # FillOrder 2: bit-reversal LUT


class TiffError(ValueError):
    pass


def _read_ifd(data: bytes, off: int, fmt: str) -> tuple[dict[int, list], int]:
    """One IFD at ``off`` → ({tag: values}, next_ifd_offset)."""
    if off + 2 > len(data):
        raise TiffError("TIFF: IFD offset out of range")
    (n_entries,) = struct.unpack_from(fmt + "H", data, off)
    if n_entries > 4096:
        raise TiffError("TIFF: implausible IFD entry count")
    entries: dict[int, list] = {}
    pos = off + 2
    if pos + 12 * n_entries + 4 > len(data):
        raise TiffError("TIFF: truncated IFD")
    for _ in range(n_entries):
        tag, typ, count = struct.unpack_from(fmt + "HHI", data, pos)
        size = _TYPE_SIZE.get(typ)
        if size is None or count > len(data):
            pos += 12
            continue  # unknown value type: skip, per spec guidance
        total = size * count
        if total <= 4:
            voff = pos + 8
        else:
            (voff,) = struct.unpack_from(fmt + "I", data, pos + 8)
            if voff + total > len(data):
                raise TiffError("TIFF: value offset out of range")
        if typ == 3:
            vals = list(struct.unpack_from(f"{fmt}{count}H", data, voff))
        elif typ == 4:
            vals = list(struct.unpack_from(f"{fmt}{count}I", data, voff))
        elif typ == 5:  # RATIONAL: keep as float
            raw = struct.unpack_from(f"{fmt}{2 * count}I", data, voff)
            vals = [raw[i] / raw[i + 1] if raw[i + 1] else 0.0
                    for i in range(0, 2 * count, 2)]
        else:  # BYTE/ASCII
            vals = list(data[voff : voff + count])
        entries[tag] = vals
        pos += 12
    (nxt,) = struct.unpack_from(fmt + "I", data, pos)
    return entries, nxt


def tiff_info(data: bytes) -> dict:
    """Parse header + first IFD → the decode-relevant tag values."""
    if len(data) < 8:
        raise TiffError("TIFF: short header")
    if data[:4] == b"II*\x00":
        fmt = "<"
    elif data[:4] == b"MM\x00*":
        fmt = ">"
    else:
        raise TiffError("TIFF: bad magic")
    (ifd_off,) = struct.unpack_from(fmt + "I", data, 4)
    tags, nxt = _read_ifd(data, ifd_off, fmt)

    def one(tag: int, default=None):
        v = tags.get(tag)
        return v[0] if v else default

    if one(284, 1) != 1:
        raise TiffError("TIFF: planar configuration 2 unsupported")
    w, h = one(256), one(257)
    if not w or not h:
        raise TiffError("TIFF: missing dimensions")
    if w * h > MAX_PIXELS:
        raise TiffError("TIFF: image exceeds pixel bound")
    spp = one(277, 1)
    bits_list = tags.get(258, [1])
    if len(set(bits_list)) != 1:
        raise TiffError("TIFF: mixed per-sample bit depths unsupported")
    jpeg_tables = tags.get(347)
    return {
        "fmt": fmt,
        "width": w,
        "height": h,
        "bits": bits_list[0],
        "spp": spp,
        "compression": one(259, 1),
        "photometric": one(262, 1),
        "fill_order": one(266, 1),
        "strip_offsets": tags.get(273, []),
        "strip_counts": tags.get(279, []),
        "rows_per_strip": one(278, h),
        "tiled": 322 in tags or 323 in tags or 324 in tags,
        "tile_width": one(322, 0),
        "tile_length": one(323, 0),
        "tile_offsets": tags.get(324, []),
        "tile_counts": tags.get(325, []),
        "predictor": one(317, 1),
        "orientation": one(274, 1),
        "t4_options": one(292, 0),
        "t6_options": one(293, 0),
        "colormap": tags.get(320),
        "jpeg_tables": bytes(jpeg_tables) if jpeg_tables else None,
        "next_ifd": nxt,
    }


def tiff_dimensions(data: bytes) -> tuple[int, int]:
    info = tiff_info(data)
    return info["width"], info["height"]


def tiff_num_pages(data: bytes, max_pages: int = 10_000) -> int:
    """Length of the IFD chain (multi-page scan TIFFs are common)."""
    info = tiff_info(data)
    fmt, nxt, n, seen = info["fmt"], info["next_ifd"], 1, set()
    while nxt and n < max_pages and nxt not in seen:
        seen.add(nxt)
        _, nxt = _read_ifd(data, nxt, fmt)
        n += 1
    return n


# ------------------------------------------------------------------ strips


def _packbits_decode(data: bytes, max_out: int) -> bytes:
    """TIFF PackBits: n in 0..127 copies n+1 literal bytes; n in 129..255
    repeats the next byte 257−n times; 128 is a no-op (unlike PDF
    /RunLengthDecode, where it is EOD)."""
    out = bytearray()
    i = 0
    while i < len(data) and len(out) < max_out:
        n = data[i]
        if n <= 127:
            out += data[i + 1 : i + 2 + n]
            i += 2 + n
        elif n == 128:
            i += 1
        else:
            out += data[i + 1 : i + 2] * (257 - n)
            i += 2
    return bytes(out)


def _packbits_encode(data: bytes) -> bytes:
    out = bytearray()
    i = 0
    lit_start = 0
    while i < len(data):
        run = 1
        while i + run < len(data) and data[i + run] == data[i] and run < 128:
            run += 1
        if run >= 3:
            while lit_start < i:
                n = min(128, i - lit_start)
                out += bytes([n - 1]) + data[lit_start : lit_start + n]
                lit_start += n
            out += bytes([257 - run, data[i]])
            i += run
            lit_start = i
        else:
            i += run
    while lit_start < len(data):
        n = min(128, len(data) - lit_start)
        out += bytes([n - 1]) + data[lit_start : lit_start + n]
        lit_start += n
    return bytes(out)


def _bounded_inflate(data: bytes, max_out: int) -> bytes:
    dec = zlib.decompressobj()
    out = dec.decompress(data, max_out)
    if dec.decompress(b"", 1):
        raise TiffError("TIFF: deflate strip exceeds declared size")
    return out


def _merge_jpeg_tables(raw: bytes, jpeg_tables: bytes | None) -> bytes:
    """New-style JPEG-in-TIFF (TechNote 2): when tag 347 carries the shared
    DQT/DHT tables as an abbreviated stream (SOI + table segments + EOI),
    prepend them to the block's datastream right after its SOI."""
    if (
        jpeg_tables
        and len(jpeg_tables) > 4
        and jpeg_tables[:2] == b"\xff\xd8"
        and raw[:2] == b"\xff\xd8"
    ):
        return b"\xff\xd8" + jpeg_tables[2:-2] + raw[2:]
    return raw


def _decode_block(raw: bytes, info: dict, rows: int, width: int) -> np.ndarray:
    """One strip or tile → uint8 array (rows, width) of VISUAL gray
    (0 = black, 255 = white), luma-folded for RGB/palette."""
    bits, spp = info["bits"], info["spp"]
    comp, photo = info["compression"], info["photometric"]
    if info["fill_order"] == 2 and comp in (2, 3, 4):
        # FillOrder 2 (LSB-first) appears in the fax world; the CCITT
        # decoder consumes MSB-first, so reverse each byte up front.
        raw = _REV8[np.frombuffer(raw, dtype=np.uint8)].tobytes()

    if comp == 6:
        raise TiffError("TIFF: old-style JPEG (6) is spec-deprecated")
    if comp == 7:  # new-style JPEG: each block is a JPEG datastream
        from gnosis_ocr_spark.functions.codec_jpeg import decode_jpeg

        jw, jh, _, luma = decode_jpeg(
            _merge_jpeg_tables(raw, info["jpeg_tables"])
        )
        if jw < width or jh < rows:
            raise TiffError("TIFF: JPEG block smaller than declared")
        arr = np.frombuffer(luma, dtype=np.uint8).reshape(jh, jw)
        gray = arr[:rows, :width]
        return (255 - gray) if photo == 0 else gray

    if comp in (2, 3, 4):  # fax: decodes straight to packed 1-bpp rows
        if bits != 1 or spp != 1:
            raise TiffError("TIFF: fax compression requires 1-bit gray")
        from gnosis_ocr_spark.functions.codec_ccitt import (
            decode_g3_1d,
            decode_g3_2d,
            decode_g4,
        )

        # black_is_1 chosen so decoded samples match the photometric tag:
        # min-is-white (0) stores black as 1, min-is-black (1) as 0.
        black1 = photo == 0
        if comp == 4:
            packed = decode_g4(raw, width, rows, black_is_1=black1)
        elif comp == 3 and info["t4_options"] & 1:
            packed = decode_g3_2d(raw, width, rows, black_is_1=black1)
        elif comp == 3:
            packed = decode_g3_1d(raw, width, rows, black_is_1=black1)
        else:  # 2: modified-Huffman RLE, every row byte-aligned, no EOLs
            packed = decode_g3_1d(
                raw, width, rows, black_is_1=black1, byte_align=True
            )
        bits_arr = np.unpackbits(
            np.frombuffer(packed, dtype=np.uint8).reshape(rows, -1),
            axis=1,
        )[:, :width]
        # 1-bit sample → visual gray under the photometric tag:
        # min-is-white: 1 = black; min-is-black: 1 = white
        if photo == 0:
            return np.where(bits_arr == 1, 0, 255).astype(np.uint8)
        return np.where(bits_arr == 1, 255, 0).astype(np.uint8)

    stride = (width * spp * bits + 7) // 8
    expected = stride * rows
    if comp == 1:
        out = raw[:expected]
    elif comp == 5:
        from gnosis_ocr_spark.functions.codec_pdf import _lzw_decode

        out = _lzw_decode(raw, early_change=1, max_out=expected)
    elif comp in (8, 32946):
        out = _bounded_inflate(raw, expected)
    elif comp == 32773:
        out = _packbits_decode(raw, expected)
    else:
        raise TiffError(f"TIFF: compression {comp} unsupported")
    if len(out) < expected:
        raise TiffError("TIFF: truncated strip")
    if bits == 1:
        arr = np.frombuffer(out[:expected], dtype=np.uint8).reshape(
            rows, stride
        )
        bits_arr = np.unpackbits(arr, axis=1)[:, :width]
        if photo == 0:
            return np.where(bits_arr == 1, 0, 255).astype(np.uint8)
        return np.where(bits_arr == 1, 255, 0).astype(np.uint8)
    if bits == 8:
        px = np.frombuffer(out[:expected], dtype=np.uint8).reshape(
            rows, width, spp
        )
        if info["predictor"] == 2:
            # horizontal differencing: per-row cumsum per channel,
            # uint8 accumulate (wraps mod 256 exactly like the spec)
            px = np.add.accumulate(px, axis=1, dtype=np.uint8)
    elif bits == 16:
        # 16-bit samples follow the FILE byte order; predictor 2
        # differences 16-bit values (wraps mod 65536), then fold the
        # high byte — visual gray stays 8-bit throughout the engine
        u16 = np.frombuffer(
            out[:expected], dtype=info["fmt"] + "u2"
        ).reshape(rows, width, spp)
        if info["predictor"] == 2:
            u16 = np.add.accumulate(u16, axis=1, dtype=np.uint16)
        px = (u16 >> 8).astype(np.uint8)
    else:
        raise TiffError(f"TIFF: {bits}-bit samples unsupported")
    if photo == 2:  # RGB → ITU-R 601 integer luma, uint16 math
        if spp < 3:
            raise TiffError("TIFF: RGB needs 3 samples/pixel")
        p16 = px.astype(np.uint16)
        return (
            (77 * p16[:, :, 0] + 150 * p16[:, :, 1] + 29 * p16[:, :, 2])
            >> 8
        ).astype(np.uint8)
    if photo == 3:  # palette → luma of the 16-bit colormap
        if bits != 8:
            raise TiffError("TIFF: palette requires 8-bit indices")
        cmap = info["colormap"]
        if not cmap or len(cmap) % 3:
            raise TiffError("TIFF: missing/odd colormap")
        n = len(cmap) // 3
        cm = np.asarray(cmap, dtype=np.uint32).reshape(3, n) >> 8
        luma = ((77 * cm[0] + 150 * cm[1] + 29 * cm[2]) >> 8).astype(
            np.uint8
        )
        idx = px[:, :, 0]
        if idx.max(initial=0) >= n:
            raise TiffError("TIFF: palette index out of range")
        return luma[idx]
    gray = px[:, :, 0]
    return (255 - gray) if photo == 0 else gray


def decode_tiff_gray(data: bytes) -> tuple[int, int, bytes]:
    """Decode the first IFD to visual 8-bit grayscale (0 = black). Strips
    stack vertically, exactly like the multi-strip PDF scanned path;
    tiles (§15) paste row-major with right/bottom edge padding cropped.
    Orientation (tag 274, common in scanner/fax output) is applied so
    the pixels come back upright — same 8-transform table as the EXIF
    path (codec_jpeg.orient_gray)."""
    info = tiff_info(data)
    w, h = info["width"], info["height"]
    if info["tiled"]:
        tw, th = info["tile_width"], info["tile_length"]
        offs, cnts = info["tile_offsets"], info["tile_counts"]
        if tw <= 0 or th <= 0 or tw * th > MAX_PIXELS:
            raise TiffError("TIFF: bad tile dimensions")
        if not offs or len(offs) != len(cnts):
            raise TiffError("TIFF: bad tile tables")
        across, down = -(-w // tw), -(-h // th)
        if len(offs) < across * down:
            raise TiffError("TIFF: missing tiles")
        out = np.empty((h, w), dtype=np.uint8)
        for ty in range(down):
            for tx in range(across):
                off, cnt = offs[ty * across + tx], cnts[ty * across + tx]
                if off + cnt > len(data):
                    raise TiffError("TIFF: tile out of range")
                block = _decode_block(data[off : off + cnt], info, th, tw)
                ys, xs = ty * th, tx * tw
                out[ys : min(ys + th, h), xs : min(xs + tw, w)] = block[
                    : h - ys, : w - xs
                ]
        return _oriented(out.tobytes(), w, h, info["orientation"])
    offs, cnts = info["strip_offsets"], info["strip_counts"]
    if not offs or len(offs) != len(cnts):
        raise TiffError("TIFF: bad strip tables")
    rps = max(1, info["rows_per_strip"])
    parts: list[np.ndarray] = []
    remaining = h
    for off, cnt in zip(offs, cnts):
        if remaining <= 0:
            break
        if off + cnt > len(data):
            raise TiffError("TIFF: strip out of range")
        strip_rows = min(rps, remaining)
        parts.append(
            _decode_block(data[off : off + cnt], info, strip_rows, w)
        )
        remaining -= strip_rows
    if remaining > 0:
        raise TiffError("TIFF: missing strips")
    return _oriented(np.vstack(parts).tobytes(), w, h, info["orientation"])


def _oriented(px: bytes, w: int, h: int, orientation: int) -> tuple[int, int, bytes]:
    from gnosis_ocr_spark.functions.codec_jpeg import orient_gray

    px, w, h = orient_gray(px, w, h, orientation)
    return w, h, px


# ------------------------------------------------------------------ writer

_SHORT, _LONG = 3, 4

_COMP_CODES = {
    "none": 1,
    "rle": 2,  # CCITT modified-Huffman, byte-aligned rows
    "g3": 3,
    "g3_2d": 3,
    "g4": 4,
    "lzw": 5,
    "deflate": 8,
    "packbits": 32773,
}


def _encode_strip(gray: np.ndarray, compression: str, photometric: int,
                  predictor: int) -> bytes:
    rows, w = gray.shape
    if compression in ("rle", "g3", "g3_2d", "g4"):
        from gnosis_ocr_spark.functions.codec_ccitt import (
            encode_g3_1d,
            encode_g3_2d,
            encode_g4,
        )

        black1 = photometric == 0
        black_bits = (gray < 128).astype(np.uint8)
        samples = black_bits if black1 else 1 - black_bits
        packed = np.packbits(samples, axis=1).tobytes()
        if compression == "g4":
            return encode_g4(packed, w, rows, black_is_1=black1)
        if compression == "g3_2d":
            return encode_g3_2d(packed, w, rows, black_is_1=black1)
        if compression == "g3":
            # compression=3 strips carry T.4 EOL codes (strict readers —
            # the JDK fax decoder — refuse EOL-less compression-3 data;
            # the EOL-less byte-aligned form is compression=2 below)
            return encode_g3_1d(packed, w, rows, black_is_1=black1,
                                eol=True)
        return encode_g3_1d(packed, w, rows, black_is_1=black1,
                            byte_align=True)
    samples = (255 - gray) if photometric == 0 else gray
    if predictor == 2:
        samples = np.concatenate(
            [samples[:, :1], np.diff(samples.astype(np.int16), axis=1)
             .astype(np.uint8)], axis=1)
    raw = samples.astype(np.uint8).tobytes()
    if compression == "none":
        return raw
    if compression == "packbits":
        return _packbits_encode(raw)
    if compression == "deflate":
        return zlib.compress(raw, 6)
    if compression == "lzw":
        from gnosis_ocr_spark.functions.codec_pdf import _lzw_encode

        return _lzw_encode(raw, early_change=1)
    raise TiffError(f"unknown compression {compression!r}")


def encode_tiff_gray(
    gray: bytes,
    width: int,
    height: int,
    compression: str = "none",
    rows_per_strip: int | None = None,
    photometric: int = 1,
    fill_order: int = 1,
    predictor: int = 1,
    big_endian: bool = False,
    orientation: int = 1,
) -> bytes:
    """Fixture writer: 8-bit grayscale pixels → a spec-valid stripped TIFF.
    Fax compressions threshold at 128 and write ``bits=1``; ``fill_order=2``
    bit-reverses fax strips (the LSB-first fax-world shape); ``predictor=2``
    applies horizontal differencing before lzw/deflate; ``orientation``
    writes tag 274 (the STORED pixels are given as-is — a decoder must
    transform them to display upright)."""
    return _assemble_tiff(
        *_gray_page_parts(gray, width, height, compression, rows_per_strip,
                          photometric, fill_order, predictor,
                          orientation=orientation),
        ">" if big_endian else "<",
    )


def _gray_page_parts(
    gray: bytes, width: int, height: int, compression: str,
    rows_per_strip: int | None, photometric: int, fill_order: int,
    predictor: int, orientation: int = 1,
) -> tuple[list[bytes], list[tuple[int, int, list[int]]]]:
    """One gray page → (strips, tags) for the assembler."""
    if compression not in _COMP_CODES:
        raise TiffError(f"unknown compression {compression!r}")
    if predictor == 2 and compression not in ("lzw", "deflate"):
        raise TiffError("predictor 2 is only meaningful for lzw/deflate")
    arr = np.frombuffer(gray, dtype=np.uint8).reshape(height, width)
    fax = compression in ("rle", "g3", "g3_2d", "g4")
    rps = rows_per_strip or height
    strips = []
    for y0 in range(0, height, rps):
        s = _encode_strip(arr[y0 : y0 + rps], compression, photometric,
                          predictor)
        if fax and fill_order == 2:
            s = _REV8[np.frombuffer(s, dtype=np.uint8)].tobytes()
        strips.append(s)

    tags: list[tuple[int, int, list[int]]] = [
        (256, _LONG, [width]),
        (257, _LONG, [height]),
        (258, _SHORT, [1 if fax else 8]),
        (259, _SHORT, [_COMP_CODES[compression]]),
        (262, _SHORT, [photometric]),
        (277, _SHORT, [1]),
        (278, _LONG, [rps]),
    ]
    if fill_order == 2 and fax:
        tags.append((266, _SHORT, [2]))
    if orientation != 1:
        tags.append((274, _SHORT, [orientation]))
    if compression == "g3_2d":
        tags.append((292, _LONG, [1]))
    elif compression == "g3":
        tags.append((292, _LONG, [0]))
    if predictor == 2:
        tags.append((317, _SHORT, [2]))
    return strips, tags


def encode_tiff_gray_pages(
    pages: list[tuple[bytes, int, int]],
    compression: str | list[str] = "g4",
    rows_per_strip: int | None = None,
    photometric: int = 0,
    fill_order: int = 1,
    big_endian: bool = False,
) -> bytes:
    """Fixture writer: [(gray, w, h), ...] → a multi-page TIFF (chained
    IFDs — the standard multi-page scan-archive shape). ``compression``
    may be one name or a per-page list; fax defaults (g4, min-is-white)
    match what real scanner output ships."""
    comps = (
        compression if isinstance(compression, list)
        else [compression] * len(pages)
    )
    if len(comps) != len(pages):
        raise TiffError("one compression per page required")
    parts = [
        _gray_page_parts(g, w, h, c, rows_per_strip, photometric,
                         fill_order, 1)
        for (g, w, h), c in zip(pages, comps)
    ]
    return _assemble_tiff_multi(parts, ">" if big_endian else "<")


def encode_tiff_gray_tiled(
    gray: bytes,
    width: int,
    height: int,
    tile_width: int = 64,
    tile_length: int = 64,
    compression: str = "none",
    photometric: int = 1,
    big_endian: bool = False,
) -> bytes:
    """Fixture writer: 8-bit grayscale → a TILED TIFF (§15). Edge tiles
    pad to the full tile size with white, exactly what libtiff emits."""
    if tile_width % 16 or tile_length % 16:
        raise TiffError("tile dims must be multiples of 16 (spec §15)")
    arr = np.frombuffer(gray, dtype=np.uint8).reshape(height, width)
    tiles = []
    for ty in range(0, height, tile_length):
        for tx in range(0, width, tile_width):
            block = arr[ty : ty + tile_length, tx : tx + tile_width]
            if block.shape != (tile_length, tile_width):
                block = np.pad(
                    block,
                    ((0, tile_length - block.shape[0]),
                     (0, tile_width - block.shape[1])),
                    constant_values=255,
                )
            tiles.append(_encode_strip(block, compression, photometric, 1))
    fax = compression in ("rle", "g3", "g3_2d", "g4")
    tags = [
        (256, _LONG, [width]),
        (257, _LONG, [height]),
        (258, _SHORT, [1 if fax else 8]),
        (259, _SHORT, [_COMP_CODES[compression]]),
        (262, _SHORT, [photometric]),
        (277, _SHORT, [1]),
        (322, _LONG, [tile_width]),
        (323, _LONG, [tile_length]),
    ]
    if compression == "g3_2d":
        tags.append((292, _LONG, [1]))
    elif compression == "g3":
        tags.append((292, _LONG, [0]))
    return _assemble_tiff_multi(
        [(tiles, tags, (324, 325))], ">" if big_endian else "<"
    )


def encode_tiff_gray16(
    gray: bytes,
    width: int,
    height: int,
    compression: str = "none",
    predictor: int = 1,
    big_endian: bool = False,
) -> bytes:
    """Fixture writer: 8-bit grayscale widened to 16-bit samples
    (v → v<<8 | v, so the decoder's high-byte fold round-trips exactly)."""
    if compression not in ("none", "deflate", "packbits", "lzw"):
        raise TiffError(f"16-bit writer: compression {compression!r}")
    fmt = ">" if big_endian else "<"
    g8 = np.frombuffer(gray, dtype=np.uint8).reshape(height, width)
    u16 = (g8.astype(np.uint16) << 8) | g8
    if predictor == 2:
        u16 = np.concatenate(
            [u16[:, :1], np.diff(u16.astype(np.int32), axis=1)
             .astype(np.uint16)], axis=1)
    raw = u16.astype(fmt + "u2").tobytes()
    if compression == "deflate":
        raw = zlib.compress(raw, 6)
    elif compression == "packbits":
        raw = _packbits_encode(raw)
    elif compression == "lzw":
        from gnosis_ocr_spark.functions.codec_pdf import _lzw_encode

        raw = _lzw_encode(raw, early_change=1)
    tags = [
        (256, _LONG, [width]),
        (257, _LONG, [height]),
        (258, _SHORT, [16]),
        (259, _SHORT, [_COMP_CODES[compression]]),
        (262, _SHORT, [1]),
        (277, _SHORT, [1]),
        (278, _LONG, [height]),
    ]
    if predictor == 2:
        tags.append((317, _SHORT, [2]))
    return _assemble_tiff_multi([([raw], tags)], fmt)


def _split_jpeg_datastream(jpeg: bytes) -> tuple[bytes, bytes]:
    """One standalone JPEG → (abbreviated tables stream, headerless
    stream): DQT/DHT segments move to the 347-style SOI+tables+EOI form,
    everything else (SOF, SOS + entropy data) stays."""
    if jpeg[:2] != b"\xff\xd8":
        raise TiffError("not a JPEG datastream")
    pos, tables, rest = 2, bytearray(), bytearray()
    while pos + 4 <= len(jpeg):
        if jpeg[pos] != 0xFF:
            raise TiffError("bad JPEG segment marker")
        marker = jpeg[pos + 1]
        if marker == 0xDA:  # SOS: entropy data through EOI stays
            rest += jpeg[pos:]
            break
        seg_len = int.from_bytes(jpeg[pos + 2 : pos + 4], "big")
        seg = jpeg[pos : pos + 2 + seg_len]
        (tables if marker in (0xDB, 0xC4) else rest).extend(seg)
        pos += 2 + seg_len
    return (
        b"\xff\xd8" + bytes(tables) + b"\xff\xd9",
        b"\xff\xd8" + bytes(rest),
    )


def encode_tiff_gray_jpeg(
    gray: bytes,
    width: int,
    height: int,
    rows_per_strip: int | None = None,
    shared_tables: bool = False,
) -> bytes:
    """Fixture writer: 8-bit grayscale → new-style JPEG-in-TIFF
    (Compression 7, TechNote 2) via the in-repo baseline JPEG encoder.
    ``shared_tables`` moves the DQT/DHT segments into tag 347 JPEGTables
    (the libtiff default for multi-strip files) — strips then carry
    abbreviated streams."""
    from gnosis_ocr_spark.functions.codec_jpeg import encode_gray_jpeg

    arr = np.frombuffer(gray, dtype=np.uint8).reshape(height, width)
    rps = rows_per_strip or height
    strips = [
        encode_gray_jpeg(
            arr[y0 : y0 + rps].tobytes(), width, min(rps, height - y0)
        )
        for y0 in range(0, height, rps)
    ]
    tags = [
        (256, _LONG, [width]),
        (257, _LONG, [height]),
        (258, _SHORT, [8]),
        (259, _SHORT, [7]),
        (262, _SHORT, [1]),
        (277, _SHORT, [1]),
        (278, _LONG, [rps]),
    ]
    if shared_tables:
        tables, _ = _split_jpeg_datastream(strips[0])
        strips = [_split_jpeg_datastream(s)[1] for s in strips]
        tags.append((347, 7, list(tables)))
    return _assemble_tiff_multi([(strips, tags)], "<")


# ---------------------------------------------------------------- splitting

# decode-relevant tags copied (with canonical types) into each rebuilt
# single-page file; everything else (resolution, software, EXIF…) is
# irrelevant to pixel decode and dropped
_PAGE_TAGS: list[tuple[int, int]] = [
    (256, _LONG), (257, _LONG), (258, _SHORT), (259, _SHORT),
    (262, _SHORT), (266, _SHORT), (277, _SHORT), (278, _LONG),
    (284, _SHORT), (292, _LONG), (293, _LONG), (317, _SHORT),
    (320, _SHORT), (322, _LONG), (323, _LONG), (347, 7),
]


def _rebuild_single_page(
    data: bytes, tags: dict[int, list], fmt: str
) -> tuple[bytes | None, int, int, int]:
    """One parsed IFD → (single-page TIFF bytes | None, w, h, bits).

    Block payloads (strips OR tiles) are SLICED, never decoded —
    rebuilding a page is pure memcpy, so the split stage stays cheap and
    ships still-compressed bytes (same design as pdf_split._pack_images).
    Returns None bytes for shapes that can't be rebuilt block-wise
    (missing/broken block tables); the caller emits those pages as
    undecodable → empty text, the same honest degradation the PDF
    scanned path uses."""

    def one(tag: int, default=0):
        v = tags.get(tag)
        return v[0] if v else default

    w, h = one(256), one(257)
    bits = one(258, 1)
    if not w or not h:
        return None, 0, 0, 1
    tiled = 322 in tags or 323 in tags or 324 in tags
    offs, cnts = (
        (tags.get(324), tags.get(325)) if tiled
        else (tags.get(273), tags.get(279))
    )
    if not offs or not cnts or len(offs) != len(cnts):
        return None, w, h, bits
    blocks = []
    for off, cnt in zip(offs, cnts):
        if off < 0 or cnt < 0 or off + cnt > len(data):
            return None, w, h, bits
        blocks.append(data[off : off + cnt])
    out_tags = [
        (tag, typ, list(tags[tag]))
        for tag, typ in _PAGE_TAGS
        if tags.get(tag)
    ]
    # the SOURCE byte order is preserved: 16-bit sample payloads inside
    # the sliced blocks follow it, and slices are never transcoded
    page = _assemble_tiff_multi(
        [(blocks, out_tags, (324, 325) if tiled else (273, 279))], fmt
    )
    return page, w, h, bits


def split_tiff_pages(
    data: bytes, max_pages: int = 10_000
) -> list[tuple[bytes | None, int, int, int]]:
    """Multi-page TIFF → [(single-page TIFF | None, w, h, bits), ...], one
    entry per IFD in the chain (cycle-safe, capped). Rebuilt pages keep
    the source byte order (16-bit sample payloads inside the sliced
    blocks follow it; slices are never transcoded)."""
    if len(data) < 8:
        raise TiffError("TIFF: short header")
    if data[:4] == b"II*\x00":
        fmt = "<"
    elif data[:4] == b"MM\x00*":
        fmt = ">"
    else:
        raise TiffError("TIFF: bad magic")
    (ifd_off,) = struct.unpack_from(fmt + "I", data, 4)
    pages: list[tuple[bytes | None, int, int, int]] = []
    seen: set[int] = set()
    while ifd_off and len(pages) < max_pages and ifd_off not in seen:
        seen.add(ifd_off)
        tags, ifd_off = _read_ifd(data, ifd_off, fmt)
        pages.append(_rebuild_single_page(data, tags, fmt))
    if not pages:
        raise TiffError("TIFF: empty IFD chain")
    return pages


def _assemble_tiff_multi(
    pages: list[tuple],
    fmt: str,
) -> bytes:
    """[(blocks, tags[, (offsets_tag, counts_tag)]), ...] → a complete
    (possibly multi-page) file. Per-page layout: block data | IFD |
    external values; each IFD's next-IFD pointer links forward through
    the chain. Blocks are strips by default (tags 273/279); tiled pages
    pass (324, 325). Tag value types: SHORT/LONG packed per the byte
    order; BYTE/UNDEFINED (1/7) written raw."""
    body = bytearray(
        struct.pack(fmt + "2sHI", b"II" if fmt == "<" else b"MM", 42, 0)
    )
    link_pos = 4  # header's first-IFD-offset field
    for page in pages:
        blocks, page_tags = page[0], page[1]
        offs_tag, cnts_tag = page[2] if len(page) > 2 else (273, 279)
        block_offs = []
        for s in blocks:
            block_offs.append(len(body))
            body += s
            if len(body) & 1:
                body += b"\x00"  # word-align values, per spec
        tags = page_tags + [(offs_tag, _LONG, block_offs),
                            (cnts_tag, _LONG, [len(s) for s in blocks])]
        tags.sort(key=lambda t: t[0])

        ifd_off = len(body)
        struct.pack_into(fmt + "I", body, link_pos, ifd_off)
        n = len(tags)
        ifd = bytearray(struct.pack(fmt + "H", n))
        ext = bytearray()
        ext_base = ifd_off + 2 + 12 * n + 4
        for tag, typ, vals in tags:
            size = _TYPE_SIZE[typ] * len(vals)
            if typ in (1, 7):  # BYTE / UNDEFINED: raw bytes
                packed = bytes(vals)
            else:
                code = "H" if typ == _SHORT else "I"
                packed = struct.pack(f"{fmt}{len(vals)}{code}", *vals)
            if size <= 4:
                val_field = packed + b"\x00" * (4 - size)
            else:
                val_field = struct.pack(fmt + "I", ext_base + len(ext))
                ext += packed
                if len(ext) & 1:
                    ext += b"\x00"
            ifd += struct.pack(fmt + "HHI", tag, typ, len(vals)) + val_field
        link_pos = len(body) + len(ifd)  # this IFD's next-IFD field
        ifd += struct.pack(fmt + "I", 0)  # patched if another page follows
        body += ifd + ext
    return bytes(body)


def _assemble_tiff(strips: list[bytes],
                   tags: list[tuple[int, int, list[int]]], fmt: str) -> bytes:
    return _assemble_tiff_multi([(strips, tags)], fmt)


def encode_tiff_rgb(
    rgb: bytes,
    width: int,
    height: int,
    compression: str = "none",
    rows_per_strip: int | None = None,
    predictor: int = 1,
) -> bytes:
    """Fixture writer: interleaved 8-bit RGB → stripped TIFF
    (none/packbits/deflate/lzw; predictor 2 differences per channel)."""
    if compression not in ("none", "packbits", "deflate", "lzw"):
        raise TiffError(f"RGB writer: compression {compression!r}")
    arr = np.frombuffer(rgb, dtype=np.uint8).reshape(height, width, 3)
    rps = rows_per_strip or height
    strips = []
    for y0 in range(0, height, rps):
        block = arr[y0 : y0 + rps]
        if predictor == 2:
            block = np.concatenate(
                [block[:, :1], np.diff(block.astype(np.int16), axis=1)
                 .astype(np.uint8)], axis=1)
        raw = block.astype(np.uint8).tobytes()
        if compression == "packbits":
            raw = _packbits_encode(raw)
        elif compression == "deflate":
            raw = zlib.compress(raw, 6)
        elif compression == "lzw":
            from gnosis_ocr_spark.functions.codec_pdf import _lzw_encode

            raw = _lzw_encode(raw, early_change=1)
        strips.append(raw)
    tags = [
        (256, _LONG, [width]),
        (257, _LONG, [height]),
        (258, _SHORT, [8, 8, 8]),
        (259, _SHORT, [_COMP_CODES[compression]]),
        (262, _SHORT, [2]),
        (277, _SHORT, [3]),
        (278, _LONG, [rps]),
        (284, _SHORT, [1]),
    ]
    if predictor == 2:
        tags.append((317, _SHORT, [2]))
    return _assemble_tiff(strips, tags, "<")


def encode_tiff_palette(
    indices: bytes,
    width: int,
    height: int,
    colormap: list[tuple[int, int, int]],
    rows_per_strip: int | None = None,
) -> bytes:
    """Fixture writer: 8-bit palette indices + an RGB888 colormap →
    uncompressed palette TIFF (ColorMap stores 16-bit channels, v << 8)."""
    arr = np.frombuffer(indices, dtype=np.uint8).reshape(height, width)
    if arr.max(initial=0) >= len(colormap):
        raise TiffError("palette writer: index out of colormap range")
    n = 256  # baseline: colormap sized to 2**bits
    cm = list(colormap) + [(0, 0, 0)] * (n - len(colormap))
    rps = rows_per_strip or height
    strips = [arr[y0 : y0 + rps].tobytes() for y0 in range(0, height, rps)]
    cmap_vals = [c[ch] << 8 for ch in range(3) for c in cm]
    tags = [
        (256, _LONG, [width]),
        (257, _LONG, [height]),
        (258, _SHORT, [8]),
        (259, _SHORT, [1]),
        (262, _SHORT, [3]),
        (277, _SHORT, [1]),
        (278, _LONG, [rps]),
        (320, _SHORT, cmap_vals),
    ]
    return _assemble_tiff(strips, tags, "<")
