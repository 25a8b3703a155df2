"""Minimal stdlib-only PDF writer + text parser (public PDF 1.4 spec subset).

Poppler (used by the reference via pdf2image/pdfinfo,
/root/reference/app/jobs.py:375-390) is not available in this container, so:

- :func:`build_pdf` writes small, valid, *uncompressed* PDF files for the
  synthetic corpus and tests (one ``BT … Tj … ET`` text run per line, Helvetica,
  12 pt, top-left origin at (72, 720), 14 pt leading — fixed fonts/text so
  page count and per-page text are known by construction, FIXTURES.md §1).
- :func:`page_count` is the U1 "PDF probe" (reference: ``pdfinfo_from_bytes``).
- :func:`extract_pages` is the text half of the U2 page split: it returns
  positioned text spans per page in /Kids order, which the rasterize stage
  turns into PNGs and the layout stage (U8) orders by reading order.

The parser handles the subset this writer emits plus simple variations
(``TJ`` arrays, ``TD``/``Td`` moves, escaped strings). Real-world compressed
PDFs would need poppler; that seam is isolated here on purpose.
"""

from __future__ import annotations

import functools
import re
import struct
from dataclasses import dataclass


@dataclass(frozen=True)
class Span:
    """One positioned text run: PDF user-space coords (y grows upward)."""

    x: float
    y: float
    text: str


# 2-D affine matrices as (a, b, c, d, e, f) in the PDF row-vector
# convention (PDF 32000-1 §8.3.3): [x y 1]·M, so
# x' = a·x + c·y + e and y' = b·x + d·y + f.
_MAT_ID = (1.0, 0.0, 0.0, 1.0, 0.0, 0.0)


def _mat_mul(
    m1: tuple[float, ...], m2: tuple[float, ...]
) -> tuple[float, ...]:
    """Compose two affines: apply ``m1`` first, then ``m2`` (= m1·m2)."""
    a1, b1, c1, d1, e1, f1 = m1
    a2, b2, c2, d2, e2, f2 = m2
    return (
        a1 * a2 + b1 * c2,
        a1 * b2 + b1 * d2,
        c1 * a2 + d1 * c2,
        c1 * b2 + d1 * d2,
        e1 * a2 + f1 * c2 + e2,
        e1 * b2 + f1 * d2 + f2,
    )


def _mat_apply(
    m: tuple[float, ...], x: float, y: float
) -> tuple[float, float]:
    a, b, c, d, e, f = m
    return (a * x + c * y + e, b * x + d * y + f)


def _esc(s: str) -> str:
    return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


def _unesc(s: str) -> str:
    out = []
    i = 0
    while i < len(s):
        c = s[i]
        if c == "\\" and i + 1 < len(s):
            n = s[i + 1]
            mapped = {"n": "\n", "r": "\r", "t": "\t", "b": "\b", "f": "\f"}.get(n)
            if mapped is not None:
                out.append(mapped)
            elif n in "\\()":
                out.append(n)
            elif n in "01234567":  # octal escape \ddd — ASCII octal ONLY
                # (str.isdigit() also matches \8, \9 and Unicode digits,
                # which must decode as the bare character per §7.3.4.2 —
                # int(.., 8) raised and sentineled whole documents)
                j = i + 1
                oct_digits = ""
                while j < len(s) and s[j] in "01234567" and len(oct_digits) < 3:
                    oct_digits += s[j]
                    j += 1
                out.append(chr(int(oct_digits, 8) & 0xFF))  # \777 wraps
                i = j
                continue
            elif n == "\r":  # backslash-EOL: line continuation, elide both
                i += 3 if s[i + 2 : i + 3] == "\n" else 2
                continue
            elif n == "\n":
                i += 2
                continue
            else:
                out.append(n)
            i += 2
        else:
            out.append(c)
            i += 1
    return "".join(out)


def build_pdf(pages: list[str], compress: bool = False) -> bytes:
    """Write a valid single-font PDF, one string per page.

    Newlines in a page string become separate 14pt-leading lines, mirroring
    how a rendered page would stack them top-to-bottom. With ``compress``,
    content streams are FlateDecode-compressed (the dominant real-world
    encoding; zlib is stdlib).
    """
    objects: list[bytes] = []  # 1-indexed by position+1

    n_pages = len(pages)
    font_obj_no = 3 + 2 * n_pages
    kids = " ".join(f"{3 + 2 * i} 0 R" for i in range(n_pages))
    objects.append(b"<< /Type /Catalog /Pages 2 0 R >>")  # obj 1
    objects.append(
        f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode()
    )  # obj 2
    for i, page_text in enumerate(pages):
        page_no = 3 + 2 * i
        content_no = page_no + 1
        objects.append(
            (
                f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                f"/Resources << /Font << /F1 {font_obj_no} 0 R >> >> "
                f"/Contents {content_no} 0 R >>"
            ).encode()
        )
        lines = page_text.split("\n")
        ops = ["BT", "/F1 12 Tf", "72 720 Td"]
        for j, line in enumerate(lines):
            if j > 0:
                ops.append("0 -14 Td")
            ops.append(f"({_esc(line)}) Tj")
        ops.append("ET")
        stream = "\n".join(ops).encode("latin-1", "replace")
        if compress:
            import zlib

            stream = zlib.compress(stream, 6)
            objects.append(
                b"<< /Length %d /Filter /FlateDecode >>\nstream\n%s\nendstream"
                % (len(stream), stream)
            )
        else:
            objects.append(
                b"<< /Length %d >>\nstream\n%s\nendstream" % (len(stream), stream)
            )
    objects.append(
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
    )  # font obj

    return _assemble_classic(objects)


def _assemble_classic(objects: list[bytes], trailer_extra: bytes = b"") -> bytes:
    """Serialize 1-indexed object bodies + classic xref table + trailer."""
    buf = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets = [0]
    for idx, body in enumerate(objects, start=1):
        offsets.append(len(buf))
        buf += b"%d 0 obj\n" % idx + body + b"\nendobj\n"
    xref_off = len(buf)
    buf += b"xref\n0 %d\n" % (len(objects) + 1)
    buf += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        buf += b"%010d 00000 n \n" % off
    buf += (
        b"trailer\n<< /Size %d /Root 1 0 R %s>>\nstartxref\n%d\n%%%%EOF\n"
        % (len(objects) + 1, trailer_extra, xref_off)
    )
    return bytes(buf)


def build_pdf_encrypted(
    pages: list[str], owner_password: bytes = b"owner", revision: int = 3
) -> bytes:
    """Fixture writer for ENCRYPTED PDFs — standard security handler, owner
    password set, EMPTY user password (the dominant crawl shape: files any
    reader opens silently but whose streams are byte-encrypted). Content
    streams encrypt with per-object keys; the trailer carries /Encrypt +
    /ID. revision 2 = 40-bit RC4 /V 1, revision 3 = 128-bit RC4 /V 2,
    revision 4 = AES-128-CBC /V 4 /CFM /AESV2 (Acrobat-7-era norm),
    revision 6 = AES-256-CBC /V 5 /CFM /AESV3 (PDF 2.0). IVs are
    deterministic (md5 of the object number) so fixtures are reproducible.
    Layout matches :func:`build_pdf`, so expected text is known by
    construction and a parser without the security handler sees only
    ciphertext."""
    import hashlib

    assert revision in (2, 3, 4, 6)
    p = -4  # all permissions denied except viewing — typical owner-lock
    file_id = hashlib.md5("\n\n".join(pages).encode()).digest()

    if revision == 6:
        from gnosis_ocr_spark.functions.aes import _encrypt_block, _expand_key, cbc_encrypt

        keylen = 32
        file_key = (hashlib.md5(file_id).digest()
                    + hashlib.md5(file_id + b"2").digest())
        vsalt = hashlib.md5(b"vs" + file_id).digest()[:8]
        ksalt = hashlib.md5(b"ks" + file_id).digest()[:8]
        u = _hash_r6(b"", vsalt) + vsalt + ksalt
        ue = cbc_encrypt(_hash_r6(b"", ksalt), b"\x00" * 16, file_key)[:32]
        ovsalt = hashlib.md5(b"ovs" + file_id).digest()[:8]
        oksalt = hashlib.md5(b"oks" + file_id).digest()[:8]
        o = _hash_r6(owner_password, ovsalt, u) + ovsalt + oksalt
        oe = cbc_encrypt(_hash_r6(owner_password, oksalt, u),
                         b"\x00" * 16, file_key)[:32]
        perms = ((p & 0xFFFFFFFF).to_bytes(4, "little") + b"\xff\xff\xff\xff"
                 + b"Tadb" + b"\x00" * 4)
        perms_enc = _encrypt_block(perms, _expand_key(file_key))

        def enc_obj(num: int, data: bytes) -> bytes:
            iv = hashlib.md5(b"iv" + num.to_bytes(4, "little")).digest()
            return iv + cbc_encrypt(file_key, iv, data)

        enc_dict = (
            f"<< /Filter /Standard /V 5 /R 6 /Length 256 "
            f"/CF << /StdCF << /CFM /AESV3 /AuthEvent /DocOpen /Length 32 >> >> "
            f"/StmF /StdCF /StrF /StdCF /P {p} "
            f"/O <{o.hex().upper()}> /U <{u.hex().upper()}> "
            f"/OE <{oe.hex().upper()}> /UE <{ue.hex().upper()}> "
            f"/Perms <{perms_enc.hex().upper()}> >>"
        ).encode()
        return _assemble_encrypted(pages, enc_obj, enc_dict, file_id)

    keylen = 5 if revision == 2 else 16
    v = {2: 1, 3: 2, 4: 4}[revision]
    # Algorithm 3: /O from the owner password (user pw empty)
    opad = (owner_password + _PAD)[:32]
    h = hashlib.md5(opad).digest()
    if revision >= 3:
        for _ in range(50):
            h = hashlib.md5(h[:keylen]).digest()
    okey = h[:keylen]
    o = _rc4(okey, _PAD)  # padded EMPTY user password == _PAD
    if revision >= 3:
        for i in range(1, 20):
            o = _rc4(bytes(b ^ i for b in okey), o)

    key = _std_file_key(b"", o, p, file_id, revision, keylen)

    # Algorithms 4/5: /U for the empty user password
    if revision == 2:
        u = _rc4(key, _PAD)
    else:
        x = _rc4(key, hashlib.md5(_PAD + file_id).digest())
        for i in range(1, 20):
            x = _rc4(bytes(b ^ i for b in key), x)
        u = x + b"\x00" * 16

    def enc_obj(num: int, data: bytes) -> bytes:
        okey_ = hashlib.md5(
            key + num.to_bytes(3, "little") + (0).to_bytes(2, "little")
            + (_AES_SALT if revision == 4 else b"")
        ).digest()[: min(keylen + 5, 16)]
        if revision == 4:
            from gnosis_ocr_spark.functions.aes import cbc_encrypt

            iv = hashlib.md5(b"iv" + num.to_bytes(4, "little")).digest()
            return iv + cbc_encrypt(okey_, iv, data)
        return _rc4(okey_, data)

    if revision == 4:
        enc_dict = (
            f"<< /Filter /Standard /V 4 /R 4 /Length 128 "
            f"/CF << /StdCF << /CFM /AESV2 /AuthEvent /DocOpen /Length 16 >> >> "
            f"/StmF /StdCF /StrF /StdCF /P {p} "
            f"/O <{o.hex().upper()}> /U <{u.hex().upper()}> >>"
        ).encode()
    else:
        enc_dict = (
            f"<< /Filter /Standard /V {v} /R {revision} /Length {keylen * 8} "
            f"/P {p} /O <{o.hex().upper()}> /U <{u.hex().upper()}> >>"
        ).encode()
    return _assemble_encrypted(pages, enc_obj, enc_dict, file_id)


def _assemble_encrypted(pages, enc_obj, enc_dict: bytes, file_id: bytes) -> bytes:
    """Shared page/object assembly for every encrypted-fixture revision:
    standard build_pdf layout with each content stream run through
    ``enc_obj(num, data)``."""
    n_pages = len(pages)
    font_obj_no = 3 + 2 * n_pages
    encrypt_no = font_obj_no + 1
    kids = " ".join(f"{3 + 2 * i} 0 R" for i in range(n_pages))
    objects: list[bytes] = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode(),
    ]
    for i, page_text_ in enumerate(pages):
        page_no = 3 + 2 * i
        objects.append(
            (
                f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                f"/Resources << /Font << /F1 {font_obj_no} 0 R >> >> "
                f"/Contents {page_no + 1} 0 R >>"
            ).encode()
        )
        ops = ["BT", "/F1 12 Tf", "72 720 Td"]
        for j, line in enumerate(page_text_.split("\n")):
            if j > 0:
                ops.append("0 -14 Td")
            ops.append(f"({_esc(line)}) Tj")
        ops.append("ET")
        payload = enc_obj(page_no + 1, "\n".join(ops).encode("latin-1", "replace"))
        objects.append(
            b"<< /Length %d >>\nstream\n%s\nendstream" % (len(payload), payload)
        )
    objects.append(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    objects.append(enc_dict)
    trailer_extra = (
        f"/Encrypt {encrypt_no} 0 R /ID [<{file_id.hex().upper()}> "
        f"<{file_id.hex().upper()}>] "
    ).encode()
    return _assemble_classic(objects, trailer_extra)


# a tiny 4×4 inline image (BI…ID…EI) whose binary payload deliberately
# contains text-operator look-alikes — what the tokenizer must skip
_INLINE_IMG_OP = (
    b"BI /W 4 /H 4 /BPC 8 /CS /G ID \xff(fake) Tj\x00 99 99 Td <41>Tj\x01 EI"
)


def build_pdf_tounicode(
    pages: list[str], mode: str = "tounicode", inline_images: bool = False
) -> bytes:
    """Fixture writer for NON-WinAnsi text — the first real-crawl failure
    mode a naive latin-1 parser hits (VERDICT r2 "What's missing #3").

    Every non-ASCII character in the input is assigned a custom byte code
    from 0x80 up; page content streams show those CUSTOM bytes, so the
    original text is recoverable ONLY through the font's mapping tables —
    which this writer emits in one of two public-spec forms:

    - ``mode='tounicode'``: a /ToUnicode CMap stream (bfchar pairs,
      UTF-16BE destinations) — works for ANY unicode char;
    - ``mode='differences'``: an /Encoding dict with /Differences glyph
      names (chars must exist in the AGL subset _GLYPH_NAMES).

    With ``inline_images`` a BI…ID…EI inline image whose binary payload
    contains fake text operators is spliced between text runs — extracted
    text must be unaffected. Layout matches :func:`build_pdf` (72/720
    origin, 14 pt leading), so expected text is known by construction."""
    charset = sorted({c for p in pages for c in p if not (ord(c) < 128)})
    if len(charset) > 0x7F:
        raise ValueError("too many distinct non-ASCII chars for 1-byte codes")
    code_of = {c: 0x80 + i for i, c in enumerate(charset)}
    if mode == "differences":
        name_of_char = {v: k for k, v in _GLYPH_NAMES.items()}
        missing = [c for c in charset if c not in name_of_char]
        if missing:
            raise ValueError(f"no glyph names for {missing!r}; use mode='tounicode'")

    def enc(line: str) -> bytes:
        return bytes(code_of.get(c, ord(c)) if ord(c) >= 128 or ord(c) < 0x20
                     else ord(c) for c in line)

    n_pages = len(pages)
    font_obj_no = 3 + 2 * n_pages
    enc_obj_no = font_obj_no + 1  # ToUnicode stream or Encoding dict
    kids = " ".join(f"{3 + 2 * i} 0 R" for i in range(n_pages))
    objects: list[bytes] = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode(),
    ]
    for i, page_text_ in enumerate(pages):
        page_no = 3 + 2 * i
        content_no = page_no + 1
        objects.append(
            (
                f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                f"/Resources << /Font << /F1 {font_obj_no} 0 R >> >> "
                f"/Contents {content_no} 0 R >>"
            ).encode()
        )
        lines = page_text_.split("\n")
        ops: list[bytes] = [b"BT", b"/F1 12 Tf", b"72 720 Td"]
        for j, line in enumerate(lines):
            if j > 0:
                ops.append(b"0 -14 Td")
            if inline_images and j % 2 == 1:
                ops.append(_INLINE_IMG_OP)
            raw = enc(line)
            esc = (
                raw.replace(b"\\", rb"\\")
                .replace(b"(", rb"\(")
                .replace(b")", rb"\)")
            )
            ops.append(b"(" + esc + b") Tj")
        ops.append(b"ET")
        stream = b"\n".join(ops)
        objects.append(
            b"<< /Length %d >>\nstream\n%s\nendstream" % (len(stream), stream)
        )
    if mode == "tounicode":
        objects.append(
            (
                f"<< /Type /Font /Subtype /Type1 /BaseFont /Custom "
                f"/ToUnicode {enc_obj_no} 0 R >>"
            ).encode()
        )
        bfchars = "\n".join(
            f"<{code:02X}> <{_utf16be_hex(ch)}>" for ch, code in code_of.items()
        )
        cmap = (
            "/CIDInit /ProcSet findresource begin\n"
            "begincmap\n1 begincodespacerange\n<00> <FF>\nendcodespacerange\n"
            f"{len(code_of)} beginbfchar\n{bfchars}\nendbfchar\n"
            "endcmap\nend\n"
        ).encode("ascii")
        objects.append(
            b"<< /Length %d >>\nstream\n%s\nendstream" % (len(cmap), cmap)
        )
    else:
        objects.append(
            (
                f"<< /Type /Font /Subtype /Type1 /BaseFont /Custom "
                f"/Encoding {enc_obj_no} 0 R >>"
            ).encode()
        )
        diffs = " ".join(
            f"{code} /{name_of_char[ch]}" for ch, code in code_of.items()
        )
        objects.append(
            (
                f"<< /Type /Encoding /BaseEncoding /WinAnsiEncoding "
                f"/Differences [ {diffs} ] >>"
            ).encode()
        )
    return _assemble_classic(objects)


def _utf16be_hex(ch: str) -> str:
    return ch.encode("utf-16-be").hex().upper()


def _uni_glyph_name(ch: str) -> str:
    """AGL algorithmic glyph name (uniXXXX for BMP, uXXXXX beyond)."""
    cp = ord(ch)
    return f"uni{cp:04X}" if cp <= 0xFFFF else f"u{cp:05X}"


# byte codes safe to emit raw inside literal show strings (printable,
# non-delimiter): remapping EVERY char — ASCII included — to these makes
# the original text recoverable ONLY through the font program's builtin
# encoding, which is exactly the property the fixtures must certify.
_SAFE_CODES = tuple(
    c for c in range(0x21, 0xFF) if c not in (0x28, 0x29, 0x5C)
)


def _builtin_code_map(pages: list[str]) -> dict[str, int]:
    charset = sorted({c for p in pages for c in p if c != "\n"})
    if len(charset) > len(_SAFE_CODES):
        raise ValueError("too many distinct chars for 1-byte builtin codes")
    return {ch: _SAFE_CODES[i] for i, ch in enumerate(charset)}


def _type1_program(code_of: dict[str, int]) -> tuple[bytes, int, int, int]:
    """Minimal Adobe Type 1 font program whose CLEARTEXT section carries a
    custom builtin /Encoding (dup <code> /<name> put) — the part a text
    extractor (this codec, poppler, FreeType alike) reads; the eexec
    section is deterministic filler since no fixture rasterizes glyphs."""
    entries = "".join(
        f"dup {code} /{_uni_glyph_name(ch)} put\n"
        for ch, code in sorted(code_of.items(), key=lambda kv: kv[1])
    )
    clear = (
        "%!FontType1-1.0: CustomBuiltin 001.001\n"
        "11 dict begin\n"
        "/FontName /CustomBuiltin def\n"
        "/FontType 1 def\n"
        "/FontMatrix [0.001 0 0 0.001 0 0] readonly def\n"
        "/Encoding 256 array\n"
        "0 1 255 {1 index exch /.notdef put} for\n"
        f"{entries}"
        "readonly def\n"
        "currentdict end\n"
        "currentfile eexec\n"
    ).encode("ascii")
    eexec = bytes((i * 37 + 11) & 0xFF for i in range(64))
    trailer = (b"0" * 64 + b"\n") * 8 + b"cleartomark\n"
    return clear + eexec + trailer, len(clear), len(eexec), len(trailer)


def _sfnt_symbol_font(code_of: dict[str, int]) -> bytes:
    """Minimal TrueType (sfnt) program for a SYMBOLIC subset font: a
    (3,0) cmap format-4 subtable maps 0xF000+code → glyph id through the
    general idRangeOffset/glyphIdArray path, and a 'post' format-2.0
    table names every glyph uniXXXX — the shape real symbolic subsets
    carry. Table checksums and head.checkSumAdjustment are computed per
    spec so any conformant sfnt reader accepts the file."""
    items = sorted(code_of.items(), key=lambda kv: kv[1])  # (char, code)
    n = len(items)
    minc, maxc = items[0][1], items[-1][1]
    gid_of_code = {code: i + 1 for i, (_, code) in enumerate(items)}

    # cmap: one mapped segment [0xF000+minc .. 0xF000+maxc] + sentinel
    span = maxc - minc + 1
    glyph_ids = [gid_of_code.get(minc + i, 0) for i in range(span)]
    seg_count = 2
    sub = struct.pack(
        ">HHHHHHH",
        4,                       # format
        16 + seg_count * 8 + 2 * span,  # length
        0,                       # language
        seg_count * 2,
        4,                       # searchRange = 2*2^floor(log2(2))
        1,                       # entrySelector
        0,                       # rangeShift
    )
    sub += struct.pack(">HH", 0xF000 + maxc, 0xFFFF)      # endCode
    sub += struct.pack(">H", 0)                            # reservedPad
    sub += struct.pack(">HH", 0xF000 + minc, 0xFFFF)      # startCode
    sub += struct.pack(">hh", 0, 1)                        # idDelta
    # idRangeOffset[0] → start of glyphIdArray (2 entries ahead = 4 bytes)
    sub += struct.pack(">HH", 4, 0)
    sub += struct.pack(f">{span}H", *glyph_ids)
    cmap = struct.pack(">HH", 0, 1) + struct.pack(">HHI", 3, 0, 12) + sub

    # post 2.0: gid 0 = standard .notdef (index 0); gid i+1 = name 258+i
    names = b"".join(
        bytes([len(_uni_glyph_name(ch))]) + _uni_glyph_name(ch).encode("ascii")
        for ch, _ in items
    )
    post = (
        struct.pack(">IiHHIIIII", 0x00020000, 0, 0, 0, 0, 0, 0, 0, 0)
        + struct.pack(">H", n + 1)
        + struct.pack(f">{n + 1}H", 0, *(258 + i for i in range(n)))
        + names
    )

    head = struct.pack(
        ">IIIIHHQQhhhhHHhhh",
        0x00010000, 0x00010000, 0, 0x5F0F3CF5, 0, 1000,
        0, 0, 0, 0, 1000, 1000, 0, 8, 2, 0, 0,
    )
    maxp = struct.pack(">IH", 0x00010000, n + 1) + b"\x00" * 26

    def cksum(b: bytes) -> int:
        b = b + b"\x00" * (-len(b) % 4)
        return sum(struct.unpack(f">{len(b) // 4}I", b)) & 0xFFFFFFFF

    tables = [(b"cmap", cmap), (b"head", head), (b"maxp", maxp), (b"post", post)]
    header = struct.pack(">IHHHH", 0x00010000, 4, 64, 2, 0)
    offset = len(header) + 16 * len(tables)
    directory, body = b"", b""
    head_off = None
    for tag, data in tables:
        if tag == b"head":
            head_off = offset + len(body)
        directory += struct.pack(">4sIII", tag, cksum(data), offset + len(body), len(data))
        body += data + b"\x00" * (-len(data) % 4)
    font = header + directory + body
    adj = (0xB1B0AFBA - cksum(font)) & 0xFFFFFFFF
    return font[: head_off + 8] + struct.pack(">I", adj) + font[head_off + 12 :]


def build_pdf_incremental(
    pages: list[str], decoy: str = "SUPERSEDED DRAFT TEXT", objstm: bool = False
) -> bytes:
    """Incrementally UPDATED PDF (ISO 32000-1 §7.5.6): the original
    revision shows decoy text; an appended update section redefines every
    page's content stream with the real text, followed by its own xref
    section whose trailer carries /Prev — byte-for-byte how Acrobat
    writes signatures, form fills, and edits (the original bytes are
    never touched). A conforming reader walks the /Prev chain and shows
    only the update; extraction must do the same (latest generation
    wins). With ``objstm`` the replacement objects ride inside an
    appended /ObjStm container indexed by an xref STREAM — the hybrid
    shape modern writers append onto classic files."""
    base = build_pdf([decoy for _ in pages])
    buf = bytearray(base)
    prev_xref = int(base.rsplit(b"startxref\n", 1)[1].split(b"\n", 1)[0])
    offsets: dict[int, int] = {}
    replacements: list[tuple[int, bytes]] = []
    for i, page_text in enumerate(pages):
        content_no = 4 + 2 * i
        ops = ["BT", "/F1 12 Tf", "72 720 Td"]
        for j, line in enumerate(page_text.split("\n")):
            if j > 0:
                ops.append("0 -14 Td")
            ops.append(f"({_esc(line)}) Tj")
        ops.append("ET")
        stream = "\n".join(ops).encode("latin-1", "replace")
        replacements.append((content_no, stream))
    size = 3 + 2 * len(pages) + 1  # base /Size (objects + obj 0)
    if not objstm:
        for num, stream in replacements:
            offsets[num] = len(buf)
            buf += b"%d 0 obj\n<< /Length %d >>\nstream\n%s\nendstream\nendobj\n" % (
                num, len(stream), stream
            )
        xref_off = len(buf)
        buf += b"xref\n"
        for num in sorted(offsets):
            buf += b"%d 1\n%010d 00000 n \n" % (num, offsets[num])
        buf += (
            b"trailer\n<< /Size %d /Root 1 0 R /Prev %d >>\nstartxref\n%d\n%%%%EOF\n"
            % (size, prev_xref, xref_off)
        )
        return bytes(buf)
    # hybrid update: replacements inside one /ObjStm + an xref STREAM.
    # Content streams may not live in an ObjStm per spec — ship the page
    # DICTS there instead, pointing at new top-level content objects.
    import zlib as _z

    new_content_base = size  # fresh object numbers for the new streams
    parts, header = [], []
    off = 0
    for i, (num, _) in enumerate(replacements):
        page_no = 3 + 2 * i
        body = (
            f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            f"/Resources << /Font << /F1 {3 + 2 * len(pages)} 0 R >> >> "
            f"/Contents {new_content_base + i} 0 R >>"
        ).encode()
        header.append(b"%d %d" % (page_no, off))
        parts.append(body)
        off += len(body) + 1
    payload = b" ".join(header) + b"\n" + b"\n".join(parts) + b"\n"
    first = len(b" ".join(header)) + 1
    for i, (_, stream) in enumerate(replacements):
        num = new_content_base + i
        offsets[num] = len(buf)
        buf += b"%d 0 obj\n<< /Length %d >>\nstream\n%s\nendstream\nendobj\n" % (
            num, len(stream), stream
        )
    objstm_no = new_content_base + len(replacements)
    offsets[objstm_no] = len(buf)
    zpayload = _z.compress(payload, 6)
    buf += (
        b"%d 0 obj\n<< /Type /ObjStm /N %d /First %d /Filter /FlateDecode "
        b"/Length %d >>\nstream\n%s\nendstream\nendobj\n"
        % (objstm_no, len(replacements), first, len(zpayload), zpayload)
    )
    xref_no = objstm_no + 1
    rows = []
    # type-2 rows for the ObjStm members, type-1 for new top-level objects
    for i in range(len(replacements)):
        rows.append((3 + 2 * i, struct.pack(">BIH", 2, objstm_no, i)))
    for num in sorted(offsets):
        rows.append((num, struct.pack(">BIH", 1, offsets[num], 0)))
    xref_off = len(buf)
    rows.append((xref_no, struct.pack(">BIH", 1, xref_off, 0)))
    rows.sort()
    index = b" ".join(b"%d 1" % n for n, _ in rows)
    data = b"".join(r for _, r in rows)
    buf += (
        b"%d 0 obj\n<< /Type /XRef /W [1 4 2] /Index [%s] /Size %d "
        b"/Root 1 0 R /Prev %d /Length %d >>\nstream\n%s\nendstream\nendobj\n"
        % (xref_no, index, xref_no + 1, prev_xref, len(data), data)
    )
    buf += b"startxref\n%d\n%%%%EOF\n" % xref_off
    return bytes(buf)


def _mk_cff_index(items: list[bytes]) -> bytes:
    """CFF INDEX with offSize 2 (enough for fixture-scale data)."""
    if not items:
        return struct.pack(">H", 0)
    offs = [1]
    for it in items:
        offs.append(offs[-1] + len(it))
    return (
        struct.pack(">HB", len(items), 2)
        + b"".join(struct.pack(">H", o) for o in offs)
        + b"".join(items)
    )


def _cff_int5(v: int) -> bytes:
    return b"\x1d" + struct.pack(">i", v)  # 29: 5-byte int (fixed width)


def _cff_font(code_of: dict[str, int]) -> bytes:
    """Minimal bare-CFF (Type1C) program with a CUSTOM builtin encoding:
    Encoding format 0 maps each glyph's code, charset format 0 assigns
    custom SIDs, and the String INDEX names every glyph uniXXXX — the
    compact-font equivalent of the Type1 fixture. CharStrings are single
    endchar ops (no fixture rasterizes glyphs)."""
    items = sorted(code_of.items(), key=lambda kv: kv[1])  # (char, code)
    n = len(items)
    header = b"\x01\x00\x04\x04"
    name_idx = _mk_cff_index([b"CustomCFF"])
    string_idx = _mk_cff_index(
        [_uni_glyph_name(ch).encode("ascii") for ch, _ in items]
    )
    gsubr_idx = struct.pack(">H", 0)
    # top DICT: charset(15), Encoding(16), CharStrings(17) — fixed-width
    # 5-byte operands so the DICT size is known before offsets are
    top_dict_len = 3 * 6
    top_idx_len = 2 + 1 + 2 * 2 + top_dict_len  # count,offSize,2 offs,data
    encoding = bytes([0, n]) + bytes(code for _, code in items)
    charset = b"\x00" + b"".join(
        struct.pack(">H", 391 + i) for i in range(n)
    )
    charstrings = _mk_cff_index([b"\x0e"] * (n + 1))
    enc_pos = len(header) + len(name_idx) + top_idx_len + len(string_idx) + len(gsubr_idx)
    cs_pos = enc_pos + len(encoding)
    chs_pos = cs_pos + len(charset)
    top_dict = (
        _cff_int5(cs_pos) + b"\x0f"        # charset
        + _cff_int5(enc_pos) + b"\x10"     # Encoding
        + _cff_int5(chs_pos) + b"\x11"     # CharStrings
    )
    top_idx = (
        struct.pack(">HB", 1, 2)
        + struct.pack(">HH", 1, 1 + len(top_dict))
        + top_dict
    )
    assert len(top_idx) == top_idx_len
    return (
        header + name_idx + top_idx + string_idx + gsubr_idx
        + encoding + charset + charstrings
    )


def build_pdf_embedded_font(pages: list[str], kind: str = "type1") -> bytes:
    """Fixture writer for fonts whose ONLY encoding lives in the embedded
    font PROGRAM — no /Encoding, no /ToUnicode, no /Differences in the
    PDF dict (the real-crawl subset-font shape; the reference reads these
    through poppler's builtin-encoding chain, app/jobs.py:386-390).

    Every char (ASCII included) is remapped to an arbitrary safe byte
    code, so extraction that ignores the font program yields garbage —
    recovery certifies the program parse. ``kind='type1'`` embeds a
    /FontFile Type1 program (cleartext /Encoding dup/put entries);
    ``kind='truetype'`` embeds a /FontFile2 symbolic sfnt (cmap (3,0)
    format 4 + post 2.0 uniXXXX names); ``kind='cff'`` embeds a
    /FontFile3 /Type1C bare-CFF program (custom Encoding + charset +
    String INDEX names). Layout matches :func:`build_pdf` (72/720
    origin, 14 pt leading)."""
    code_of = _builtin_code_map(pages)

    def enc(line: str) -> bytes:
        return bytes(code_of[c] for c in line)

    n_pages = len(pages)
    font_no = 3 + 2 * n_pages
    fd_no, ff_no = font_no + 1, font_no + 2
    kids = " ".join(f"{3 + 2 * i} 0 R" for i in range(n_pages))
    objects: list[bytes] = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode(),
    ]
    for i, page_text_ in enumerate(pages):
        page_no = 3 + 2 * i
        objects.append(
            (
                f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                f"/Resources << /Font << /F1 {font_no} 0 R >> >> "
                f"/Contents {page_no + 1} 0 R >>"
            ).encode()
        )
        ops: list[bytes] = [b"BT", b"/F1 12 Tf", b"72 720 Td"]
        for j, line in enumerate(page_text_.split("\n")):
            if j > 0:
                ops.append(b"0 -14 Td")
            ops.append(b"(" + enc(line) + b") Tj")
        ops.append(b"ET")
        stream = b"\n".join(ops)
        objects.append(
            b"<< /Length %d >>\nstream\n%s\nendstream" % (len(stream), stream)
        )
    codes = sorted(code_of.values())
    widths = " ".join("500" for _ in range(codes[0], codes[-1] + 1))
    if kind == "type1":
        pgm, l1, l2, l3 = _type1_program(code_of)
        subtype, ff_key = "Type1", "FontFile"
        ff_dict = f"<< /Length {len(pgm)} /Length1 {l1} /Length2 {l2} /Length3 {l3} >>"
    elif kind == "truetype":
        pgm = _sfnt_symbol_font(code_of)
        subtype, ff_key = "TrueType", "FontFile2"
        ff_dict = f"<< /Length {len(pgm)} /Length1 {len(pgm)} >>"
    elif kind == "cff":
        pgm = _cff_font(code_of)
        subtype, ff_key = "Type1", "FontFile3"
        ff_dict = f"<< /Length {len(pgm)} /Subtype /Type1C >>"
    else:
        raise ValueError(kind)
    objects.append(
        (
            f"<< /Type /Font /Subtype /{subtype} /BaseFont /CustomBuiltin "
            f"/FirstChar {codes[0]} /LastChar {codes[-1]} "
            f"/Widths [ {widths} ] /FontDescriptor {fd_no} 0 R >>"
        ).encode()
    )
    objects.append(
        (
            f"<< /Type /FontDescriptor /FontName /CustomBuiltin /Flags 4 "
            f"/FontBBox [0 0 1000 1000] /ItalicAngle 0 /Ascent 800 "
            f"/Descent -200 /CapHeight 700 /StemV 80 "
            f"/{ff_key} {ff_no} 0 R >>"
        ).encode()
    )
    objects.append(
        ff_dict.encode() + b"\nstream\n" + pgm + b"\nendstream"
    )
    return _assemble_classic(objects)


def build_pdf_type3(pages: list[str]) -> bytes:
    """Fixture writer for /Subtype /Type3 glyph-procedure fonts — the
    dvips/LaTeX bitmap-font and form-stamp shape (PDF 1.7 §9.6.5).

    Type3 fonts carry NO font program: glyphs are content-stream
    procedures under /CharProcs, selected through the font's REQUIRED
    /Encoding /Differences array scaled by /FontMatrix. Text extraction
    therefore flows through exactly the same /Differences chain as
    simple fonts (poppler's Gfx/TextOutputDev path; the reference
    extracts these via poppler, app/jobs.py:386-390) — this writer
    certifies that chain stays subtype-agnostic. Every char (ASCII
    included) is remapped to an arbitrary safe byte code, so extraction
    that ignores the Differences array yields garbage; glyph names are
    AGL-algorithmic (uniXXXX). Each glyph procedure is a d1 + filled
    rect, and one DECOY procedure contains text-show operators
    (BT..Tj..ET — legal inside a Type3 proc) that a conforming extractor
    must NOT surface as page text: CharProcs streams are glyph drawings,
    not page content. Layout matches :func:`build_pdf` (72/720 origin,
    14 pt leading)."""
    code_of = _builtin_code_map(pages)

    def enc(line: str) -> bytes:
        return bytes(code_of[c] for c in line)

    n_pages = len(pages)
    font_no = 3 + 2 * n_pages
    enc_no, cp_no = font_no + 1, font_no + 2
    # glyph procedures: one per mapped char + one decoy, numbered after
    # the CharProcs dict
    names = [
        _uni_glyph_name(ch)
        for ch, _ in sorted(code_of.items(), key=lambda kv: kv[1])
    ]
    first_proc_no = cp_no + 1
    kids = " ".join(f"{3 + 2 * i} 0 R" for i in range(n_pages))
    objects: list[bytes] = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode(),
    ]
    for i, page_text_ in enumerate(pages):
        page_no = 3 + 2 * i
        objects.append(
            (
                f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                f"/Resources << /Font << /F1 {font_no} 0 R >> >> "
                f"/Contents {page_no + 1} 0 R >>"
            ).encode()
        )
        ops: list[bytes] = [b"BT", b"/F1 12 Tf", b"72 720 Td"]
        for j, line in enumerate(page_text_.split("\n")):
            if j > 0:
                ops.append(b"0 -14 Td")
            ops.append(b"(" + enc(line) + b") Tj")
        ops.append(b"ET")
        stream = b"\n".join(ops)
        objects.append(
            b"<< /Length %d >>\nstream\n%s\nendstream" % (len(stream), stream)
        )
    codes = sorted(code_of.values())
    widths = " ".join(
        "100" if c in codes else "0" for c in range(codes[0], codes[-1] + 1)
    )
    objects.append(
        (
            f"<< /Type /Font /Subtype /Type3 /FontBBox [0 0 100 100] "
            f"/FontMatrix [0.01 0 0 0.01 0 0] /CharProcs {cp_no} 0 R "
            f"/Encoding {enc_no} 0 R /FirstChar {codes[0]} "
            f"/LastChar {codes[-1]} /Widths [ {widths} ] >>"
        ).encode()
    )
    diffs = " ".join(
        f"{code} /{_uni_glyph_name(ch)}"
        for ch, code in sorted(code_of.items(), key=lambda kv: kv[1])
    )
    objects.append(
        f"<< /Type /Encoding /Differences [ {diffs} ] >>".encode()
    )
    charprocs = " ".join(
        f"/{name} {first_proc_no + k} 0 R" for k, name in enumerate(names)
    )
    decoy_no = first_proc_no + len(names)
    objects.append(
        (f"<< {charprocs} /decoy {decoy_no} 0 R >>").encode()
    )
    for _ in names:
        proc = b"100 0 0 0 100 100 d1\n10 10 80 80 re f"
        objects.append(
            b"<< /Length %d >>\nstream\n%s\nendstream" % (len(proc), proc)
        )
    # unreferenced-by-any-show decoy glyph: text operators inside a
    # CharProcs stream are glyph drawing, never page text
    decoy = b"100 0 d0\nBT /F1 12 Tf 72 720 Td (DECOYGLYPHTEXT) Tj ET"
    objects.append(
        b"<< /Length %d >>\nstream\n%s\nendstream" % (len(decoy), decoy)
    )
    return _assemble_classic(objects)


def build_pdf_type0(
    pages: list[str],
    custom_cmap: bool = False,
    predefined: str | None = None,
    charset: str | None = None,
) -> bytes:
    """Fixture writer for COMPOSITE fonts — /Subtype /Type0 with a
    2-byte-CID /ToUnicode CMap, the embedded-subset-TrueType shape that
    dominates modern real-world PDFs. Every distinct character (ASCII
    included) gets a CID from 1 up, so the show strings are hex 2-byte
    sequences recoverable ONLY through the CMap(s) — a latin-1 or
    1-byte-table parse produces garbage, proving the composite path is
    genuinely exercised. Layout matches :func:`build_pdf`.

    Default: /Encoding /Identity-H (codes ARE CIDs). With ``custom_cmap``
    the /Encoding is an EMBEDDED CMap stream mapping codes → CID = code +
    100 (half the charset via one begincidrange run, the rest via
    begincidchar singletons) and the /ToUnicode is keyed by those shifted
    CIDs — an Identity assumption would look up the wrong CIDs and decode
    nothing.

    With ``predefined`` (e.g. ``"UniGB-UCS2-H"``) the /Encoding is that
    PREDEFINED CMap name, show strings are the UTF-16BE code units of the
    text, and NO /ToUnicode ships — what real CJK crawl PDFs reference
    (poppler resolves the name from its CMap resources,
    /root/reference/app/jobs.py:386 via poppler). Extraction must decode
    the codes directly as UTF-16BE (the Uni*-UCS2/UTF16 families define
    their codespace AS Unicode code units, public Adobe CMap spec).

    With ``charset`` too (e.g. ``predefined="GBK-EUC-H", charset="gbk"``)
    the show strings are the LEGACY charset bytes of the text — the
    byte-oriented predefined-CMap shape (GBK/Shift-JIS/UHC/Big5-era
    documents). Extraction decodes via the matching stdlib codec
    (_PREDEF_CHARSET_CODECS)."""
    if predefined is not None:
        return _build_pdf_type0_predefined(pages, predefined, charset)
    charset = sorted({c for p in pages for c in p if c != "\n"})
    if len(charset) > 0xFFFE:
        raise ValueError("too many distinct chars")
    code_of = {c: i + 1 for i, c in enumerate(charset)}
    shift = 100 if custom_cmap else 0
    cid_of = {c: code + shift for c, code in code_of.items()}

    n_pages = len(pages)
    font_obj_no = 3 + 2 * n_pages
    cmap_no = font_obj_no + 1
    enc_no = cmap_no + 1
    kids = " ".join(f"{3 + 2 * i} 0 R" for i in range(n_pages))
    objects: list[bytes] = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode(),
    ]
    for i, page_text_ in enumerate(pages):
        page_no = 3 + 2 * i
        objects.append(
            (
                f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                f"/Resources << /Font << /F1 {font_obj_no} 0 R >> >> "
                f"/Contents {page_no + 1} 0 R >>"
            ).encode()
        )
        ops: list[bytes] = [b"BT", b"/F1 12 Tf", b"72 720 Td"]
        for j, line in enumerate(page_text_.split("\n")):
            if j > 0:
                ops.append(b"0 -14 Td")
            hexstr = "".join(f"{code_of[c]:04X}" for c in line)
            ops.append(b"<" + hexstr.encode("ascii") + b"> Tj")
        ops.append(b"ET")
        stream = b"\n".join(ops)
        objects.append(
            b"<< /Length %d >>\nstream\n%s\nendstream" % (len(stream), stream)
        )
    encoding = f"{enc_no} 0 R" if custom_cmap else "/Identity-H"
    objects.append(
        (
            f"<< /Type /Font /Subtype /Type0 /BaseFont /Subset-Font "
            f"/Encoding {encoding} /ToUnicode {cmap_no} 0 R >>"
        ).encode()
    )
    bfchars = "\n".join(
        f"<{cid:04X}> <{_utf16be_hex(ch)}>" for ch, cid in cid_of.items()
    )
    cmap = (
        "/CIDInit /ProcSet findresource begin\nbegincmap\n"
        "1 begincodespacerange\n<0000> <FFFF>\nendcodespacerange\n"
        f"{len(cid_of)} beginbfchar\n{bfchars}\nendbfchar\n"
        "endcmap\nend\n"
    ).encode("ascii")
    objects.append(b"<< /Length %d >>\nstream\n%s\nendstream" % (len(cmap), cmap))
    if custom_cmap:
        half = max(1, len(charset) // 2)
        lines = [
            "/CIDInit /ProcSet findresource begin", "begincmap",
            "/CMapName /Custom-H def", "/CMapType 1 def",
            "1 begincodespacerange", "<0000> <FFFF>", "endcodespacerange",
            "1 begincidrange",
            f"<0001> <{half:04X}> {1 + shift}",
            "endcidrange",
        ]
        singles = [
            f"<{code:04X}> {code + shift}"
            for code in range(half + 1, len(charset) + 1)
        ]
        if singles:
            lines += [f"{len(singles)} begincidchar", *singles, "endcidchar"]
        lines += ["endcmap", "end"]
        enc = "\n".join(lines).encode("ascii")
        objects.append(
            b"<< /Length %d >>\nstream\n%s\nendstream" % (len(enc), enc)
        )
    return _assemble_classic(objects)


def _build_pdf_type0_predefined(
    pages: list[str], predefined: str, charset: str | None = None
) -> bytes:
    """Type0 font referencing a predefined CMap by NAME (no ToUnicode, no
    embedded encoding stream): show strings are UTF-16BE code-unit hex
    (Uni* families) or — with ``charset`` — the legacy charset's bytes.
    See :func:`build_pdf_type0`; layout matches :func:`build_pdf`."""
    n_pages = len(pages)
    font_obj_no = 3 + 2 * n_pages
    kids = " ".join(f"{3 + 2 * i} 0 R" for i in range(n_pages))
    objects: list[bytes] = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode(),
    ]
    for i, page_text_ in enumerate(pages):
        page_no = 3 + 2 * i
        objects.append(
            (
                f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                f"/Resources << /Font << /F1 {font_obj_no} 0 R >> >> "
                f"/Contents {page_no + 1} 0 R >>"
            ).encode()
        )
        ops: list[bytes] = [b"BT", b"/F1 12 Tf", b"72 720 Td"]
        for j, line in enumerate(page_text_.split("\n")):
            if j > 0:
                ops.append(b"0 -14 Td")
            if charset is not None:
                hexstr = line.encode(charset).hex().upper()
            else:
                hexstr = "".join(_utf16be_hex(c) for c in line)
            ops.append(b"<" + hexstr.encode("ascii") + b"> Tj")
        ops.append(b"ET")
        stream = b"\n".join(ops)
        objects.append(
            b"<< /Length %d >>\nstream\n%s\nendstream" % (len(stream), stream)
        )
    objects.append(
        (
            f"<< /Type /Font /Subtype /Type0 /BaseFont /CJK-Font "
            f"/Encoding /{predefined} >>"
        ).encode()
    )
    return _assemble_classic(objects)


def build_pdf_15(pages: list[str]) -> bytes:
    """PDF 1.5-style fixture writer (public-spec features a real crawl hits
    that the classic writer above does not emit):

    - the page tree (catalog/pages/page dicts/font) lives compressed inside
      an /ObjStm OBJECT STREAM — invisible to a naive obj..endobj scan;
    - the cross-reference is an /XRef STREAM (no classic ``xref`` table);
    - every page has TWO content streams (``/Contents [a 0 R b 0 R]``) whose
      text state carries across the boundary;
    - text is positioned with ``Tm`` + ``TL``/``'`` (next-line-show) instead
      of ``Td`` chains.

    Layout is identical to :func:`build_pdf` (72/720 origin, 14 pt leading),
    so extracted text must be byte-identical between the two writers."""
    import zlib

    n = len(pages)
    font_no = 3 + n
    first_content = 4 + n
    objstm_no = first_content + 2 * n
    xref_no = objstm_no + 1

    packed: list[tuple[int, bytes]] = [(1, b"<< /Type /Catalog /Pages 2 0 R >>")]
    kids = " ".join(f"{3 + i} 0 R" for i in range(n))
    packed.append((2, f"<< /Type /Pages /Kids [{kids}] /Count {n} >>".encode()))
    for i in range(n):
        c1 = first_content + 2 * i
        packed.append(
            (
                3 + i,
                (
                    f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                    f"/Resources << /Font << /F1 {font_no} 0 R >> >> "
                    f"/Contents [{c1} 0 R {c1 + 1} 0 R] >>"
                ).encode(),
            )
        )
    packed.append((font_no, b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"))

    buf = bytearray(b"%PDF-1.5\n%\xe2\xe3\xcf\xd3\n")
    offsets: dict[int, int] = {}

    def emit_stream(num: int, dict_extra: bytes, payload: bytes) -> None:
        offsets[num] = len(buf)
        data = zlib.compress(payload, 6)
        buf.extend(
            b"%d 0 obj\n<< %s /Filter /FlateDecode /Length %d >>\nstream\n"
            % (num, dict_extra, len(data))
        )
        buf.extend(data)
        buf.extend(b"\nendstream\nendobj\n")

    for i, page_text in enumerate(pages):
        lines = page_text.split("\n")
        half = (len(lines) + 1) // 2
        ops1 = ["BT", "/F1 12 Tf", "14 TL", "1 0 0 1 72 720 Tm",
                f"({_esc(lines[0])}) Tj"]
        ops1 += [f"({_esc(ln)}) '" for ln in lines[1:half]]
        ops2 = [f"({_esc(ln)}) '" for ln in lines[half:]] + ["ET"]
        c1 = first_content + 2 * i
        emit_stream(c1, b"", "\n".join(ops1).encode("latin-1", "replace"))
        emit_stream(c1 + 1, b"", "\n".join(ops2).encode("latin-1", "replace"))

    # object stream: "num off num off ...\n" header, bodies at /First
    parts: list[bytes] = []
    offs: list[tuple[int, int]] = []
    pos = 0
    for num, body in packed:
        offs.append((num, pos))
        parts.append(body + b"\n")
        pos += len(body) + 1
    header = " ".join(f"{num} {off}" for num, off in offs).encode() + b"\n"
    emit_stream(
        objstm_no,
        b"/Type /ObjStm /N %d /First %d" % (len(packed), len(header)),
        header + b"".join(parts),
    )

    # xref stream: W [1 4 2] = 1-byte type, 4-byte offset/objstm, 2-byte idx
    xref_off = len(buf)
    offsets[xref_no] = xref_off
    packed_idx = {num: i for i, (num, _) in enumerate(packed)}
    rows = bytearray()
    for num in range(xref_no + 1):
        if num == 0:
            rows += bytes([0]) + (0).to_bytes(4, "big") + (65535).to_bytes(2, "big")
        elif num in packed_idx:
            rows += bytes([2]) + objstm_no.to_bytes(4, "big") + packed_idx[
                num
            ].to_bytes(2, "big")
        else:
            rows += bytes([1]) + offsets[num].to_bytes(4, "big") + (0).to_bytes(
                2, "big"
            )
    data = zlib.compress(bytes(rows), 6)
    buf.extend(
        b"%d 0 obj\n<< /Type /XRef /Size %d /W [1 4 2] /Root 1 0 R "
        b"/Filter /FlateDecode /Length %d >>\nstream\n"
        % (xref_no, xref_no + 1, len(data))
    )
    buf.extend(data)
    buf.extend(b"\nendstream\nendobj\n")
    buf.extend(b"startxref\n%d\n%%%%EOF\n" % xref_off)
    return bytes(buf)


def _lzw_encode(data: bytes, early_change: int = 1) -> bytes:
    """Forward /LZWDecode coder (test fixtures only): MSB-first 9→12-bit
    codes, leading clear code, EOD terminator, table reset near 4094 —
    bit-compatible with :func:`_lzw_decode`'s width schedule."""
    out = bytearray()
    acc = nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            nbits -= 8
            out.append((acc >> nbits) & 0xFF)

    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = 258
    width = 9
    emit(256, width)
    w = b""
    for byte in data:
        wc = w + bytes([byte])
        if wc in table:
            w = wc
            continue
        emit(table[w], width)
        table[wc] = next_code
        next_code += 1
        if next_code + early_change - 1 >= (1 << width) and width < 12:
            width += 1
        if next_code >= 4094:
            emit(256, width)
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            width = 9
        w = bytes([byte])
    if w:
        emit(table[w], width)
        # the decoder adds a table entry for every decoded data code —
        # including this final one — and re-checks the width BEFORE
        # reading the next code, so EOI must be written at the width the
        # decoder will read it at (libtiff does the same: free_ent++ and
        # a width re-check between the last data code and CODE_EOI).
        # Without this, a stream whose table lands exactly on the
        # early-change boundary at EOF mis-frames the EOI.
        next_code += 1
        if next_code + early_change - 1 >= (1 << width) and width < 12:
            width += 1
    emit(257, width)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def _rle_encode(data: bytes) -> bytes:
    """Forward /RunLengthDecode coder (fixtures only): repeat runs ≥ 3 as
    (257−n, byte), the rest as ≤128-byte literal runs, EOD 128."""
    out = bytearray()
    i = 0
    lit_start = i
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
    out.append(128)
    return bytes(out)


_ENCODERS = {
    "FlateDecode": lambda d: __import__("zlib").compress(d, 6),
    "LZWDecode": _lzw_encode,
    "ASCIIHexDecode": lambda d: d.hex().upper().encode("ascii") + b">",
    "ASCII85Decode": lambda d: __import__("base64").a85encode(d) + b"~>",
    "RunLengthDecode": _rle_encode,
}


def build_pdf_filtered(
    pages: list[str],
    filters: tuple[str, ...] = ("ASCII85Decode", "FlateDecode"),
    indirect_length: bool = False,
) -> bytes:
    """Fixture writer exercising the full /Filter pipeline: content streams
    encoded through ``filters`` — the array as a DECODE chain (left-to-right),
    so encoding applies right-to-left — optionally with the /Length written
    as an indirect reference (``/Length n 0 R``), the extremely common
    generator shape where the length object follows the stream. Layout
    matches :func:`build_pdf`, so expected text is known by construction."""
    n_pages = len(pages)
    font_obj_no = 3 + 2 * n_pages
    first_len_no = font_obj_no + 1
    kids = " ".join(f"{3 + 2 * i} 0 R" for i in range(n_pages))
    objects: list[bytes] = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode(),
    ]
    filter_spec = (
        f"/{filters[0]}" if len(filters) == 1
        else "[ " + " ".join(f"/{f}" for f in filters) + " ]"
    )
    length_objs: list[bytes] = []
    for i, page_text_ in enumerate(pages):
        page_no = 3 + 2 * i
        objects.append(
            (
                f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                f"/Resources << /Font << /F1 {font_obj_no} 0 R >> >> "
                f"/Contents {page_no + 1} 0 R >>"
            ).encode()
        )
        ops = ["BT", "/F1 12 Tf", "72 720 Td"]
        for j, line in enumerate(page_text_.split("\n")):
            if j > 0:
                ops.append("0 -14 Td")
            ops.append(f"({_esc(line)}) Tj")
        ops.append("ET")
        payload = "\n".join(ops).encode("latin-1", "replace")
        for name in reversed(filters):
            payload = _ENCODERS[name](payload)
        if indirect_length:
            length_ref = f"{first_len_no + i} 0 R"
            length_objs.append(b"%d" % len(payload))
        else:
            length_ref = str(len(payload))
        objects.append(
            b"<< /Length %s /Filter %s >>\nstream\n%s\nendstream"
            % (length_ref.encode(), filter_spec.encode(), payload)
        )
    objects.append(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    objects.extend(length_objs)
    return _assemble_classic(objects)


def build_pdf_tj_kerned(pages: list[str]) -> bytes:
    """Fixture writer for kerning-only word breaks: every line is shown as
    ONE ``TJ`` array whose words are separate strings joined by a −250
    adjustment and whose intra-word letters split on a −20 adjustment —
    no space character appears anywhere in the content stream, so the
    original text (with spaces) is recoverable ONLY through the
    TJ_SPACE_KERN gap heuristic. Layout matches :func:`build_pdf`."""
    n_pages = len(pages)
    font_obj_no = 3 + 2 * n_pages
    kids = " ".join(f"{3 + 2 * i} 0 R" for i in range(n_pages))
    objects: list[bytes] = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode(),
    ]
    for i, page_text_ in enumerate(pages):
        page_no = 3 + 2 * i
        objects.append(
            (
                f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                f"/Resources << /Font << /F1 {font_obj_no} 0 R >> >> "
                f"/Contents {page_no + 1} 0 R >>"
            ).encode()
        )
        ops = ["BT", "/F1 12 Tf", "72 720 Td"]
        for j, line in enumerate(page_text_.split("\n")):
            if j > 0:
                ops.append("0 -14 Td")
            items: list[str] = []
            for wi, word in enumerate(line.split(" ")):
                if wi > 0:
                    items.append("-250")
                # inside a TJ array the tokenizer treats an unescaped ']' as
                # the array terminator, so escape it too (PDF: a backslash
                # before an unrecognized char is simply dropped on decode)
                esc_tj = lambda s: _esc(s).replace("]", "\\]")  # noqa: E731
                if len(word) > 1:
                    items.append(f"({esc_tj(word[:1])}) -20 ({esc_tj(word[1:])})")
                elif word:
                    items.append(f"({esc_tj(word)})")
            ops.append("[" + " ".join(items) + "] TJ")
        ops.append("ET")
        stream = "\n".join(ops).encode("latin-1", "replace")
        objects.append(
            b"<< /Length %d >>\nstream\n%s\nendstream" % (len(stream), stream)
        )
    objects.append(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    return _assemble_classic(objects)


def build_pdf_matrix(pages: list[str]) -> bytes:
    """Fixture writer for FULL text/CTM affine composition — the shapes the
    LibreOffice/InDesign generator family emits and poppler resolves through
    the text rendering matrix Trm = Tm·CTM (the reference rasterizes via
    poppler, ref app/jobs.py:386-390; naive extractors that track only Tm's
    translation garble all three):

    line k (k mod 4) is positioned by
      0. a plain absolute ``Tm`` (the control shape);
      1. ``q … cm`` CTM translation around an untranslated ``BT`` block,
         with a DECOY scaled ``q 3 0 0 3 … cm Q`` pushed and popped first
         (certifies the q/Q stack restore);
      2. a 90°-rotated ``Tm`` whose following ``Td`` advance must compose
         THROUGH the rotation (the margin-stamp shape): Td(50,0) under
         ``0 -1 1 0`` moves 50pt DOWN the page, not right;
      3. a 90°-rotated ``Tm`` with ``TL`` + ``T*`` line advance (same
         composition through the leading).

    All four land on the standard 72/720 14-pt grid, so the extracted text
    is byte-identical to :func:`build_pdf` — the golden certifies the
    affine math, because an untransformed reading places shapes 1-3 at
    wrong rows/columns and the reconstruction order changes."""
    n_pages = len(pages)
    font_obj_no = 3 + 2 * n_pages
    kids = " ".join(f"{3 + 2 * i} 0 R" for i in range(n_pages))
    objects: list[bytes] = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode(),
    ]
    for i, page_text_ in enumerate(pages):
        page_no = 3 + 2 * i
        objects.append(
            (
                f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                f"/Resources << /Font << /F1 {font_obj_no} 0 R >> >> "
                f"/Contents {page_no + 1} 0 R >>"
            ).encode()
        )
        ops = ["q 3 0 0 3 100 100 cm Q"]  # decoy scale: push + pop
        for k, line in enumerate(page_text_.split("\n")):
            y = 720 - 14 * k
            text = f"({_esc(line)}) Tj"
            if k % 4 == 0:
                ops += ["BT", "/F1 12 Tf", f"1 0 0 1 72 {y} Tm", text, "ET"]
            elif k % 4 == 1:
                ops += [
                    "q", f"1 0 0 1 72 {y} cm",
                    "BT", "/F1 12 Tf", text, "ET", "Q",
                ]
            elif k % 4 == 2:
                ops += [
                    "BT", "/F1 12 Tf",
                    f"0 -1 1 0 72 {y + 50} Tm", "50 0 Td", text, "ET",
                ]
            else:
                ops += [
                    "BT", "/F1 12 Tf", "14 TL",
                    f"0 -1 1 0 86 {y} Tm", "T*", text, "ET",
                ]
        stream = "\n".join(ops).encode("latin-1", "replace")
        objects.append(
            b"<< /Length %d >>\nstream\n%s\nendstream" % (len(stream), stream)
        )
    objects.append(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    return _assemble_classic(objects)


def build_pdf_actualtext(pages: list[str]) -> bytes:
    """Fixture writer for /ActualText marked content (PDF 32000-1
    §14.9.4) — the tagged-PDF replacement-text mechanism real writers use
    for ligatures, end-of-line hyphenation, and drop caps; poppler's text
    extraction substitutes it for the enclosed show text. Line k (mod 3):

      0. plain ``Tj`` (control);
      1. a ``/Span << /ActualText (line) >> BDC … EMC`` region whose
         enclosed shows are a DECOY (the reversed line, split across two
         show ops hyphenation-style) — extraction must emit the
         ActualText at the first show's position;
      2. the same with the ActualText as a UTF-16BE hex text string
         (BOM-led, §7.9.2.2) and a nested ``/P BMC … EMC`` inside the
         region (the outermost region's replacement wins).

    Layout stays on the canonical 72/720 grid, so extraction is
    byte-identical to :func:`build_pdf` — without ActualText support the
    decoys leak and the golden breaks."""
    n_pages = len(pages)
    font_obj_no = 3 + 2 * n_pages
    kids = " ".join(f"{3 + 2 * i} 0 R" for i in range(n_pages))
    objects: list[bytes] = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode(),
    ]
    for i, page_text_ in enumerate(pages):
        page_no = 3 + 2 * i
        objects.append(
            (
                f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                f"/Resources << /Font << /F1 {font_obj_no} 0 R >> >> "
                f"/Contents {page_no + 1} 0 R >>"
            ).encode()
        )
        ops = ["BT", "/F1 12 Tf", "72 720 Td"]
        for k, line in enumerate(page_text_.split("\n")):
            if k > 0:
                ops.append("0 -14 Td")
            decoy = line[::-1]
            half = max(1, len(decoy) // 2)
            if k % 3 == 1:
                ops += [
                    f"/Span << /ActualText ({_esc(line)}) >> BDC",
                    f"({_esc(decoy[:half])}-) Tj",
                    f"2 0 Td ({_esc(decoy[half:])}) Tj -2 0 Td",
                    "EMC",
                ]
            elif k % 3 == 2:
                hx = (b"\xfe\xff" + line.encode("utf-16-be")).hex().upper()
                ops += [
                    f"/Span << /ActualText <{hx}> >> BDC",
                    f"/P BMC ({_esc(decoy)}) Tj EMC",
                    "EMC",
                ]
            else:
                ops.append(f"({_esc(line)}) Tj")
        ops.append("ET")
        stream = "\n".join(ops).encode("latin-1", "replace")
        objects.append(
            b"<< /Length %d >>\nstream\n%s\nendstream" % (len(stream), stream)
        )
    objects.append(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    return _assemble_classic(objects)


def build_pdf_ocg(pages: list[str]) -> bytes:
    """Fixture writer for optional content groups (PDF 32000-1 §8.11) —
    the layers shape of CAD exports, map overlays, and watermark/draft
    stamps. Two OCGs: a visible content layer and a watermark layer the
    catalog's default configuration turns OFF (``/OCProperties /D /OFF``).
    Odd lines render inside ``/OC /vis BDC … EMC`` (must extract —
    ON-by-default groups stay visible); every line is chased by a DECOY
    inside ``/OC /wm BDC … EMC`` on its own grid row, plus one nested
    visible-inside-hidden decoy per page (an enclosing hidden region
    hides everything, §8.11.3.2). A conforming viewer — and poppler's
    rasterization, which the reference OCRs — never draws the OFF layer,
    so extraction must not either; if any decoy leaked the golden would
    gain rows."""
    n_pages = len(pages)
    font_obj_no = 3 + 2 * n_pages
    vis_no, wm_no = font_obj_no + 1, font_obj_no + 2
    kids = " ".join(f"{3 + 2 * i} 0 R" for i in range(n_pages))
    objects: list[bytes] = [
        (
            f"<< /Type /Catalog /Pages 2 0 R /OCProperties "
            f"<< /OCGs [{vis_no} 0 R {wm_no} 0 R] "
            f"/D << /Order [] /OFF [{wm_no} 0 R] >> >> >>"
        ).encode(),
        f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode(),
    ]
    for i, page_text_ in enumerate(pages):
        page_no = 3 + 2 * i
        objects.append(
            (
                f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                f"/Resources << /Font << /F1 {font_obj_no} 0 R >> "
                f"/Properties << /vis {vis_no} 0 R /wm {wm_no} 0 R >> >> "
                f"/Contents {page_no + 1} 0 R >>"
            ).encode()
        )
        ops = ["BT", "/F1 12 Tf", "72 720 Td"]
        for k, line in enumerate(page_text_.split("\n")):
            if k > 0:
                ops.append("0 -14 Td")
            shown = f"({_esc(line)}) Tj"
            if k % 2 == 1:
                ops += ["/OC /vis BDC", shown, "EMC"]
            else:
                ops.append(shown)
            # watermark decoy on its own row (y−7): leaks = extra rows
            ops += [
                "/OC /wm BDC",
                f"0 -7 Td (DRAFT WATERMARK {k}) Tj 0 7 Td",
                "EMC",
            ]
        # nested visible-inside-hidden: the enclosing OFF layer wins
        ops += [
            "/OC /wm BDC", "/OC /vis BDC",
            "0 -7 Td (NESTED DECOY) Tj 0 7 Td",
            "EMC", "EMC",
        ]
        ops.append("ET")
        stream = "\n".join(ops).encode("latin-1", "replace")
        objects.append(
            b"<< /Length %d >>\nstream\n%s\nendstream" % (len(stream), stream)
        )
    objects.append(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    objects.append(b"<< /Type /OCG /Name (Content) >>")
    objects.append(b"<< /Type /OCG /Name (Watermark) >>")
    return _assemble_classic(objects)


def build_pdf_rotate(pages: list[str], inherit: bool = False) -> bytes:
    """Fixture writer for /Rotate pages — the landscape-scan / fax-import
    shape: every page's text is AUTHORED IN ROTATED SPACE (one rotated
    ``Tm`` then ``TL``+``T*`` line advances composing through the
    rotation) and the page carries a /Rotate of 90/180/270 (chosen by
    page count) that a conforming viewer undoes at display time. poppler
    renders the rotated view, so the reference OCRs upright text
    (ref app/jobs.py:386-390); extraction must normalize spans into
    display space or every line of a 90°/270° page collapses into one
    row. With ``inherit`` the /Rotate lives on the /Pages ROOT and
    reaches the leaves through §7.7.3.4 attribute inheritance."""
    n_pages = len(pages)
    rot = (90, 180, 270)[n_pages % 3]
    font_obj_no = 3 + 2 * n_pages
    kids = " ".join(f"{3 + 2 * i} 0 R" for i in range(n_pages))
    pages_extra = f" /Rotate {rot}" if inherit else ""
    page_extra = "" if inherit else f" /Rotate {rot}"
    objects: list[bytes] = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        (
            f"<< /Type /Pages /Kids [{kids}] /Count {n_pages}"
            f"{pages_extra} >>"
        ).encode(),
    ]
    # line 0's Tm per rotation; T* then advances THROUGH the rotation
    # (90: +x page direction, 180: +y, 270: −x), landing each display
    # line 14pt below the last — the canonical grid after normalization
    tm0 = {
        90: "0 1 -1 0 52 72 Tm",
        180: "-1 0 0 -1 540 72 Tm",
        270: "0 -1 1 0 560 720 Tm",
    }[rot]
    for i, page_text_ in enumerate(pages):
        page_no = 3 + 2 * i
        objects.append(
            (
                f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                f"/Resources << /Font << /F1 {font_obj_no} 0 R >> >> "
                f"/Contents {page_no + 1} 0 R{page_extra} >>"
            ).encode()
        )
        ops = ["BT", "/F1 12 Tf", "14 TL", tm0]
        for j, line in enumerate(page_text_.split("\n")):
            if j > 0:
                ops.append("T*")
            ops.append(f"({_esc(line)}) Tj")
        ops.append("ET")
        stream = "\n".join(ops).encode("latin-1", "replace")
        objects.append(
            b"<< /Length %d >>\nstream\n%s\nendstream" % (len(stream), stream)
        )
    objects.append(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    return _assemble_classic(objects)


def build_pdf_form_xobject(pages: list[str]) -> bytes:
    """Fixture writer for Form XObjects (the letterhead/stamp/generated-PDF
    shape poppler handles and naive parsers drop): each page's FIRST line
    lives inside a ``/Subtype /Form`` XObject invoked by ``/Fm Do`` and
    positioned through the form's ``/Matrix`` translation (text inside the
    form sits at y=0 and the matrix lifts it to 720); remaining lines render
    in the page content stream. Layout matches :func:`build_pdf`, so the
    extracted text is identical across writers."""
    n_pages = len(pages)
    font_obj_no = 3 + 3 * n_pages
    kids = " ".join(f"{3 + 3 * i} 0 R" for i in range(n_pages))
    objects: list[bytes] = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode(),
    ]
    for i, page_text_ in enumerate(pages):
        page_no = 3 + 3 * i
        content_no, form_no = page_no + 1, page_no + 2
        objects.append(
            (
                f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                f"/Resources << /Font << /F1 {font_obj_no} 0 R >> "
                f"/XObject << /Fm {form_no} 0 R >> >> "
                f"/Contents {content_no} 0 R >>"
            ).encode()
        )
        lines = page_text_.split("\n")
        # Do is a page-description operator: legal outside BT..ET only
        ops = ["/Fm Do"]
        if len(lines) > 1:
            ops += ["BT", "/F1 12 Tf", "72 706 Td"]
            for j, line in enumerate(lines[1:]):
                if j > 0:
                    ops.append("0 -14 Td")
                ops.append(f"({_esc(line)}) Tj")
            ops.append("ET")
        stream = "\n".join(ops).encode("latin-1", "replace")
        objects.append(
            b"<< /Length %d >>\nstream\n%s\nendstream" % (len(stream), stream)
        )
        fops = f"BT\n/F1 12 Tf\n72 0 Td\n({_esc(lines[0])}) Tj\nET"
        fstream = fops.encode("latin-1", "replace")
        objects.append(
            (
                b"<< /Type /XObject /Subtype /Form /BBox [0 0 612 792] "
                b"/Matrix [1 0 0 1 0 720] "
                b"/Resources << /Font << /F1 %d 0 R >> >> /Length %d >>\n"
                b"stream\n%s\nendstream" % (font_obj_no, len(fstream), fstream)
            )
        )
    objects.append(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    return _assemble_classic(objects)


def build_pdf_annots(pages: list[str], state_dict: bool = False) -> bytes:
    """Fixture writer for annotation appearance streams (PDF 32000-1
    §12.5.5) — the FreeText/stamp/widget text poppler renders and the
    reference therefore OCRs, which content-stream-only extractors drop.

    Each page's LAST line lives in a visible /FreeText annotation's
    /AP /N Form XObject (Rect at the page bottom so reading order keeps
    it last); the remaining lines render in the page content stream, so
    the extracted text matches :func:`build_pdf` exactly. Every page
    also carries a HIDDEN annotation (/F 2) whose appearance text must
    NOT extract, and a bare /Link annotation with no /AP (nothing
    rendered). With ``state_dict=True`` the visible /N is a state
    subdictionary << /On .. /Off .. >> selected by /AS /On, and the /Off
    stream holds decoy text — the checkbox/radio shape."""
    n_pages = len(pages)
    stride = 8
    font_obj_no = 3 + stride * n_pages
    kids = " ".join(f"{3 + stride * i} 0 R" for i in range(n_pages))
    objects: list[bytes] = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode(),
    ]

    def ap_form(text: str, width: int = 468) -> bytes:
        s = f"BT\n/F1 12 Tf\n0 6 Td\n({_esc(text)}) Tj\nET".encode(
            "latin-1", "replace"
        )
        return (
            b"<< /Type /XObject /Subtype /Form /BBox [0 0 %d 20] "
            b"/Resources << /Font << /F1 %d 0 R >> >> /Length %d >>\n"
            b"stream\n%s\nendstream" % (width, font_obj_no, len(s), s)
        )

    for i, page_text_ in enumerate(pages):
        page_no = 3 + stride * i
        content_no = page_no + 1
        annot_vis, ap_vis = page_no + 2, page_no + 3
        annot_hid, ap_hid = page_no + 4, page_no + 5
        annot_link, ap_off = page_no + 6, page_no + 7
        objects.append(
            (
                f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                f"/Resources << /Font << /F1 {font_obj_no} 0 R >> >> "
                f"/Annots [{annot_vis} 0 R {annot_hid} 0 R {annot_link} 0 R] "
                f"/Contents {content_no} 0 R >>"
            ).encode()
        )
        lines = page_text_.split("\n")
        ops = []
        if len(lines) > 1:
            ops += ["BT", "/F1 12 Tf", "72 706 Td"]
            for j, line in enumerate(lines[:-1]):
                if j > 0:
                    ops.append("0 -14 Td")
                ops.append(f"({_esc(line)}) Tj")
            ops.append("ET")
        stream = "\n".join(ops).encode("latin-1", "replace")
        objects.append(
            b"<< /Length %d >>\nstream\n%s\nendstream" % (len(stream), stream)
        )
        if state_dict:
            n_entry = f"<< /On {ap_vis} 0 R /Off {ap_off} 0 R >> >> /AS /On"
        else:
            n_entry = f"{ap_vis} 0 R >>"
        objects.append(
            (
                f"<< /Type /Annot /Subtype /FreeText "
                f"/Rect [72 90 540 110] /Contents (sticky-note fallback "
                f"text a renderer never draws) /AP << /N {n_entry} >>"
            ).encode()
        )
        objects.append(ap_form(lines[-1]))
        objects.append(
            (
                f"<< /Type /Annot /Subtype /FreeText /F 2 "
                f"/Rect [72 400 540 420] /AP << /N {ap_hid} 0 R >> >>"
            ).encode()
        )
        objects.append(ap_form("HIDDEN ANNOTATION TEXT"))
        objects.append(
            b"<< /Type /Annot /Subtype /Link /Rect [72 600 540 620] "
            b"/A << /S /URI /URI (https://example.org) >> >>"
        )
        objects.append(ap_form("OFF-STATE DECOY TEXT"))
    objects.append(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    return _assemble_classic(objects)


def build_pdf_scanned(
    pages: list[str],
    width: int = 64,
    height: int = 64,
    image_filter: str = "flate",
    rotate: int = 0,
) -> bytes:
    """Fixture writer for scanned/image-only pages — the shape the reference
    hits constantly on real crawls (a page that is ONE raster image, zero
    text operators; poppler rasterizes it and the OCR model reads the
    pixels, /root/reference/app/jobs.py:386-390 + app/ocr_service.py:160-215).

    Each page's content stream is ``q 612 0 0 792 0 0 cm /Im Do Q`` drawing a
    DeviceGray 8-bit image XObject whose samples are the scan-matrix encoding
    of the page text (codec_png.encode_scan_pixels) — so the stub OCR
    recovers the exact page text from the pixels, and the golden stays a pure
    function of ``pages``. ``image_filter='flate'`` (default) FlateDecode-
    compresses the samples; ``'jpeg'`` writes a REAL baseline JPEG
    (/DCTDecode, codec_jpeg) of the JPEG-survivable robust scan matrix —
    the scanned-fax/photo shape a crawl actually carries, decoded
    in-engine; ``'dct'`` wraps a deliberately-undecodable payload in
    /DCTDecode to exercise the opaque carry (extraction then yields empty
    text — the honest degradation for codecs outside the baseline subset).

    Bilevel variants (the dominant real-crawl scanned-B/W shapes, carried
    as the 1-bpp scan-bits matrix, codec_png.encode_scan_bits — use
    width/height >= 128 so page text fits): ``'g4'`` = /CCITTFaxDecode
    /K -1 (ITU-T T.6 via codec_ccitt); ``'g4_black1'`` = G4 with
    /BlackIs1 true plus the matching /Decode [1 0] normalization;
    ``'g4_align'`` = G4 with /EncodedByteAlign true; ``'g3_2d'`` =
    /K 4 mixed two-dimensional G3 (T.4 §4.2.1, EOL+tag-bit lines — the
    fax-originated shape); ``'jbig2'`` = /JBIG2Decode embedded stream
    with one arithmetic (MQ) generic region, TPGDON on (ITU-T T.88 via
    codec_jbig2 — the other dominant scanned-B/W codec); ``'jbig2_mmr'``
    = the same region MMR-coded; ``'jbig2_sym'`` = symbol-coded (symbol
    dictionary + text region, the jbig2enc shape); ``'jbig2_globals'`` =
    symbol-coded with the dictionary in a shared /JBIG2Globals stream
    referenced from /DecodeParms; ``'jpx'`` = /JPXDecode raw JPEG 2000
    codestream (lossless 5/3 via codec_jpx); ``'jpx_jp2'`` = /JPXDecode
    JP2-boxed lossy 9/7 codestream of the noise-tolerant scan matrix;
    ``'raw1'`` = FlateDecode-compressed raw
    1-bit DeviceGray samples; ``'raw1_mask'`` = the same samples as an
    /ImageMask stencil (no ColorSpace).

    Function-driven colorspaces (§7.10 tint transforms, print-originated
    scans — see functions/pdf_function.py): ``'separation'`` =
    [/Separation /Black /DeviceGray fn] with a Type 4 calculator
    ``{1 exch sub}`` over inverted samples; ``'devicen'`` =
    single-colorant [/DeviceN [/Ink] /DeviceRGB fn] with a Type 0
    sampled identity ramp; ``'separation_t3'`` = a Type 3 stitching of
    two Type 2 halves as INLINE dicts; ``'lab'`` = [/Lab <<...>>] with
    the L* channel carrying the gray. Each maps back to exactly the
    scan matrix, so recovery certifies the function evaluation.

    ``rotate`` (90/180/270, default-flate filter only) emits the
    LANDSCAPE-SCAN shape: the stored samples are the upright scan matrix
    rotated counterclockwise (the sheet fed sideways) and the page
    carries /Rotate — a conforming rasterizer (poppler for the
    reference) turns the raster clockwise back upright before OCR, and
    so must the engine's scanned path.
    """
    if rotate and image_filter != "flate":
        raise ValueError("rotate is supported for the flate filter only")
    import zlib

    from gnosis_ocr_spark.functions.codec_ccitt import encode_g4
    from gnosis_ocr_spark.functions.codec_jpeg import encode_gray_jpeg
    from gnosis_ocr_spark.functions.codec_png import (
        encode_scan_bits,
        encode_scan_pixels,
        encode_scan_pixels_robust,
    )

    n_pages = len(pages)
    kids = " ".join(f"{3 + 3 * i} 0 R" for i in range(n_pages))
    objects: list[bytes] = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode(),
    ]
    trailing: list[bytes] = []  # /JBIG2Globals streams, after the page objs
    for i, page_text_ in enumerate(pages):
        page_no = 3 + 3 * i
        content_no, img_no = page_no + 1, page_no + 2
        sw, sh = width, height  # stored dims (swap under rotate)
        if image_filter == "inline":
            # BI/ID/EI inline image (PDF §8.9.7, abbreviated keys) drawn
            # straight in the content stream — no XObject, no /Resources;
            # the img object slot holds a placeholder to keep numbering
            import zlib as _z

            payload = _z.compress(
                encode_scan_pixels(page_text_, width, height), 6
            )
            objects.append(
                (
                    f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                    f"/Contents {content_no} 0 R >>"
                ).encode()
            )
            content = (
                b"q 612 0 0 792 0 0 cm\n"
                b"BI /W %d /H %d /CS /G /BPC 8 /F /Fl ID\n%s\nEI Q"
                % (width, height, payload)
            )
            objects.append(
                b"<< /Length %d >>\nstream\n%s\nendstream"
                % (len(content), content)
            )
            objects.append(b"null")
            continue
        rot_extra = f" /Rotate {rotate}" if rotate else ""
        objects.append(
            (
                f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                f"/Resources << /XObject << /Im {img_no} 0 R >> >> "
                f"/Contents {content_no} 0 R{rot_extra} >>"
            ).encode()
        )
        content = b"q 612 0 0 792 0 0 cm /Im Do Q"
        objects.append(
            b"<< /Length %d >>\nstream\n%s\nendstream" % (len(content), content)
        )
        bpc = 8
        extra = b"/ColorSpace /DeviceGray "
        if image_filter == "jpeg":
            # real baseline JPEG of the robust (noise-tolerant) scan matrix
            data = encode_gray_jpeg(
                encode_scan_pixels_robust(page_text_, width, height),
                width, height,
            )
            filt = b"/DCTDecode"
        elif image_filter == "jpeg_prog":
            # real PROGRESSIVE (SOF2) JPEG — common in web crawls
            from gnosis_ocr_spark.functions.codec_jpeg import (
                encode_gray_jpeg_progressive,
            )

            data = encode_gray_jpeg_progressive(
                encode_scan_pixels_robust(page_text_, width, height),
                width, height,
            )
            filt = b"/DCTDecode"
        elif image_filter == "dct":
            # opaque carry: SOI marker + non-JPEG payload, undecodable
            data = b"\xff\xd8\xff\xe0" + encode_scan_pixels(
                page_text_, width, height
            )
            filt = b"/DCTDecode"
        elif image_filter in ("jpx", "jpx_jp2"):
            # JPEG 2000 scanned page via codec_jpx: raw codestream
            # (lossless 5/3) or JP2-boxed lossy 9/7 of the robust matrix
            import numpy as _np

            from gnosis_ocr_spark.functions.codec_jpx import (
                encode_jp2,
                encode_jpx,
            )

            if image_filter == "jpx":
                px = encode_scan_pixels(page_text_, width, height)
                arr = _np.frombuffer(px, dtype=_np.uint8).reshape(
                    height, width
                )
                data = encode_jpx([arr], lossless=True)
            else:
                px = encode_scan_pixels_robust(page_text_, width, height)
                arr = _np.frombuffer(px, dtype=_np.uint8).reshape(
                    height, width
                )
                data = encode_jp2(
                    [arr], lossless=False, quality_step=1.0 / 8
                )
            filt = b"/JPXDecode"
        elif image_filter in ("g4", "g4_black1", "g4_align"):
            packed = encode_scan_bits(page_text_, width, height)
            black_is_1 = image_filter == "g4_black1"
            align = image_filter == "g4_align"
            if black_is_1:
                # CCITT output then has 1 = black; /Decode [1 0] maps it
                # back to DeviceGray polarity (spec-literal pairing)
                packed = packed.translate(_INVERT_TABLE)
                extra += b"/Decode [1 0] "
            data = encode_g4(
                packed, width, height,
                black_is_1=black_is_1, byte_align=align,
            )
            bpc = 1
            parms = (
                b"/K -1 /Columns %d /Rows %d" % (width, height)
                + (b" /BlackIs1 true" if black_is_1 else b"")
                + (b" /EncodedByteAlign true" if align else b"")
            )
            extra += b"/DecodeParms << %s >> " % parms
            filt = b"/CCITTFaxDecode"
        elif image_filter == "g3_2d":
            from gnosis_ocr_spark.functions.codec_ccitt import encode_g3_2d

            packed = encode_scan_bits(page_text_, width, height)
            data = encode_g3_2d(packed, width, height, k=4)
            bpc = 1
            extra += (
                b"/DecodeParms << /K 4 /Columns %d /Rows %d >> "
                % (width, height)
            )
            filt = b"/CCITTFaxDecode"
        elif image_filter in ("jbig2", "jbig2_mmr"):
            from gnosis_ocr_spark.functions.codec_jbig2 import (
                encode_jbig2_generic,
            )

            packed = encode_scan_bits(page_text_, width, height)
            data = encode_jbig2_generic(
                packed, width, height,
                tpgdon=True, mmr=image_filter == "jbig2_mmr",
            )
            bpc = 1
            filt = b"/JBIG2Decode"
        elif image_filter in ("jbig2_sym", "jbig2_globals"):
            # symbol-coded JBIG2 (symbol dictionary + text region — the
            # jbig2enc shape real scanned-text PDFs carry); the _globals
            # variant moves the dictionary into a shared /JBIG2Globals
            # stream object referenced from /DecodeParms
            from gnosis_ocr_spark.functions.codec_jbig2 import (
                encode_jbig2_symbol,
            )

            packed = encode_scan_bits(page_text_, width, height)
            data, glob = encode_jbig2_symbol(
                packed, width, height,
                use_globals=image_filter == "jbig2_globals",
            )
            if glob:
                glob_no = 3 + 3 * n_pages + len(trailing)
                trailing.append(
                    b"<< /Length %d >>\nstream\n%s\nendstream"
                    % (len(glob), glob)
                )
                extra += (
                    b"/DecodeParms << /JBIG2Globals %d 0 R >> " % glob_no
                )
            bpc = 1
            filt = b"/JBIG2Decode"
        elif image_filter in ("raw1", "raw1_mask"):
            packed = encode_scan_bits(page_text_, width, height)
            data = zlib.compress(packed, 6)
            bpc = 1
            filt = b"/FlateDecode"
            if image_filter == "raw1_mask":
                extra = b"/ImageMask true "
        elif image_filter == "indexed":
            # /Indexed palette image (screenshot/graphics shape): indices
            # ARE the gray values through an identity-gray RGB palette
            # ((v,v,v) lumas to exactly v), so the mapped image equals the
            # scan matrix — recovery certifies the palette resolution
            px = encode_scan_pixels(page_text_, width, height)
            pal = b"".join(bytes((v, v, v)) for v in range(256))
            extra = (
                b"/ColorSpace [/Indexed /DeviceRGB 255 <%s>] "
                % pal.hex().encode("ascii")
            )
            data = zlib.compress(px, 6)
            filt = b"/FlateDecode"
        elif image_filter == "icc":
            # [/ICCBased n 0 R] with /N 1 — the color-managed-PDF norm;
            # the profile payload is opaque (only /N is load-bearing for
            # un-color-managed extraction, poppler's stance too)
            px = encode_scan_pixels(page_text_, width, height)
            icc_no = 3 + 3 * n_pages + len(trailing)
            profile = b"\x00" * 128  # placeholder profile bytes
            trailing.append(
                b"<< /N 1 /Length %d >>\nstream\n%s\nendstream"
                % (len(profile), profile)
            )
            extra = b"/ColorSpace [/ICCBased %d 0 R] " % icc_no
            data = zlib.compress(px, 6)
            filt = b"/FlateDecode"
        elif image_filter == "cmyk":
            # raw 8-bit DeviceCMYK samples: (0,0,0,255−v) grays back to
            # exactly v under the naive un-color-managed reduction
            px = encode_scan_pixels(page_text_, width, height)
            cmyk = bytearray()
            for v in px:
                cmyk += bytes((0, 0, 0, 255 - v))
            extra = b"/ColorSpace /DeviceCMYK "
            data = zlib.compress(bytes(cmyk), 6)
            filt = b"/FlateDecode"
        elif image_filter == "separation":
            # [/Separation /Black /DeviceGray fn] with a Type 4
            # PostScript-calculator tint transform {1 exch sub}: stored
            # sample v → tint v/255 → alternate gray 1−v/255 → LUT byte
            # 255−v, so storing the INVERTED scan matrix maps back to
            # exactly the scan matrix — recovery certifies the
            # calculator evaluation (functions/pdf_function.py)
            px = encode_scan_pixels(page_text_, width, height)
            fn_no = 3 + 3 * n_pages + len(trailing)
            prog = b"{ 1 exch sub }"
            trailing.append(
                b"<< /FunctionType 4 /Domain [0 1] /Range [0 1] "
                b"/Length %d >>\nstream\n%s\nendstream"
                % (len(prog), prog)
            )
            extra = (
                b"/ColorSpace [/Separation /Black /DeviceGray %d 0 R] "
                % fn_no
            )
            data = zlib.compress(bytes(255 - b for b in px), 6)
            filt = b"/FlateDecode"
        elif image_filter == "devicen":
            # single-colorant [/DeviceN [/Ink] /DeviceRGB fn] with a
            # Type 0 sampled identity ramp (256 gray RGB samples):
            # tint v/255 → (v,v,v)/255 → luma v — certifies sampled-
            # function decode with interpolation at the sample points
            px = encode_scan_pixels(page_text_, width, height)
            fn_no = 3 + 3 * n_pages + len(trailing)
            ramp = bytes(v for v in range(256) for _ in range(3))
            trailing.append(
                b"<< /FunctionType 0 /Domain [0 1] /Range [0 1 0 1 0 1] "
                b"/Size [256] /BitsPerSample 8 /Length %d >>"
                b"\nstream\n%s\nendstream" % (len(ramp), ramp)
            )
            extra = (
                b"/ColorSpace [/DeviceN [/Ink] /DeviceRGB %d 0 R] " % fn_no
            )
            data = zlib.compress(px, 6)
            filt = b"/FlateDecode"
        elif image_filter == "separation_t3":
            # Type 3 stitching of two Type 2 exponential halves composing
            # the identity, as INLINE dicts (the other legal function
            # shape), over a DeviceGray alternate: certifies stitching
            # bounds/encode + exponential interpolation
            px = encode_scan_pixels(page_text_, width, height)
            fndict = (
                b"<< /FunctionType 3 /Domain [0 1] /Range [0 1] "
                b"/Functions [ "
                b"<< /FunctionType 2 /Domain [0 1] /C0 [0] /C1 [0.5] /N 1 >> "
                b"<< /FunctionType 2 /Domain [0 1] /C0 [0.5] /C1 [1] /N 1 >> "
                b"] /Bounds [0.5] /Encode [0 1 0 1] >>"
            )
            extra = (
                b"/ColorSpace [/Separation /Spot /DeviceGray "
                + fndict + b"] "
            )
            data = zlib.compress(px, 6)
            filt = b"/FlateDecode"
        elif image_filter == "lab":
            # [/Lab <<...>>] 3-component samples: channel 0 is the 8-bit
            # L* sample, reduced un-color-managed to exactly the gray
            # byte (a*/b* at the 128 neutral point)
            px = encode_scan_pixels(page_text_, width, height)
            lab = bytearray()
            for v in px:
                lab += bytes((v, 128, 128))
            extra = b"/ColorSpace [/Lab << /WhitePoint [0.9505 1 1.089] >>] "
            data = zlib.compress(bytes(lab), 6)
            filt = b"/FlateDecode"
        else:
            px = encode_scan_pixels(page_text_, width, height)
            if rotate:
                import numpy as _np

                arr = _np.frombuffer(px, dtype=_np.uint8).reshape(
                    height, width
                )
                # stored sideways (CCW); /Rotate turns it back CW upright
                arr = _np.ascontiguousarray(_np.rot90(arr, k=rotate // 90))
                px = arr.tobytes()
                sh_r, sw_r = arr.shape
                sw, sh = sw_r, sh_r
            data = zlib.compress(px, 6)
            filt = b"/FlateDecode"
        objects.append(
            b"<< /Type /XObject /Subtype /Image /Width %d /Height %d "
            b"%s/BitsPerComponent %d /Filter %s "
            b"/Length %d >>\nstream\n%s\nendstream"
            % (sw, sh, extra, bpc, filt, len(data), data)
        )
    objects.extend(trailing)
    return _assemble_classic(objects)


def is_pdf(data: bytes | None) -> bool:
    """Magic-byte sniff — the content-trusting replacement for the reference's
    extension allow-list (/root/reference/app/config.py:19,92-95)."""
    return bool(data) and data[:5] == b"%PDF-"


_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b(.*?)endobj", re.S)
_PAGE_TYPE_RE = re.compile(rb"/Type\s*/Page\b")
_PAGES_TYPE_RE = re.compile(rb"/Type\s*/Pages\b")
_OBJSTM_RE = re.compile(rb"/Type\s*/ObjStm\b")
_KIDS_RE = re.compile(rb"/Kids\s*\[((?:\s*\d+\s+\d+\s+R)+)\s*\]")
# /Contents: either one indirect ref or an ARRAY of refs (multiple content
# streams per page — common in real-world files; they concatenate in order)
_CONTENTS_ONE_RE = re.compile(rb"/Contents\s+(\d+)\s+\d+\s+R")
_CONTENTS_ARR_RE = re.compile(rb"/Contents\s*\[((?:\s*\d+\s+\d+\s+R)+)\s*\]")
_STREAM_RE = re.compile(rb"stream\r?\n(.*?)\r?\nendstream", re.S)
_N_RE = re.compile(rb"/N\s+(\d+)\b")
_FIRST_RE = re.compile(rb"/First\s+(\d+)\b")
# a well-formed PDF numeric operand: digits with optional fraction, or a
# leading-dot fraction — deliberately NOT [\d.]+, which also matches lone
# '.' / '1.2.3' garbage that float() rejects (a stray token must skip one
# operator, never throw and sentinel the whole document)
_NUM = rb"-?(?:\d+(?:\.\d*)?|\.\d+)"
# content-stream tokens we understand: x y Td|TD, a b c d e f Tm, n TL,
# T*, (s)|<hex> Tj, (s)|<hex> ', aw ac (s)|<hex> ", [(s) n (s)] TJ, BT,
# /F n Tf, a b c d e f cm, q, Q — operands in NAMED groups. q/Q are
# single-letter operators, so they anchor on stream start or a preceding
# delimiter (whitespace, `>`, `)`, `]`) and a following boundary — the
# same residual string-operand exposure the multi-letter tokens have.
_TOK_RE = re.compile(
    rb"(?P<tm>(?P<tm_a>" + _NUM + rb")\s+(?P<tm_b>" + _NUM
    + rb")\s+(?P<tm_c>" + _NUM + rb")\s+(?P<tm_d>"
    + _NUM + rb")\s+(?P<tm_e>" + _NUM + rb")\s+(?P<tm_f>" + _NUM
    + rb")\s+Tm\b)"
    rb"|(?P<cm>(?P<cm_a>" + _NUM + rb")\s+(?P<cm_b>" + _NUM
    + rb")\s+(?P<cm_c>" + _NUM + rb")\s+(?P<cm_d>" + _NUM
    + rb")\s+(?P<cm_e>" + _NUM + rb")\s+(?P<cm_f>" + _NUM
    + rb")\s+cm\b)"
    rb"|(?P<push>(?:^|(?<=[\s>\)\]]))q(?=\s|$|%))"
    rb"|(?P<pop>(?:^|(?<=[\s>\)\]]))Q(?=\s|$|%))"
    rb"|(?P<bdc>/(?P<bdc_tag>[^\s/<>\[\]()]+)\s+(?:(?P<bdc_dict><<.*?>>)"
    rb"|/(?P<bdc_prop>[^\s/<>\[\]()]+))\s+BDC\b)"
    rb"|(?P<bmc>/[^\s/<>\[\]()]+\s+BMC\b)"
    rb"|(?P<emc>EMC\b)"
    rb"|(?P<td>(?P<td_x>" + _NUM + rb")\s+(?P<td_y>" + _NUM
    + rb")\s+(?P<td_op>T[dD]))"
    rb"|(?P<tl>(?P<tl_v>" + _NUM + rb")\s+TL\b)"
    rb"|(?P<tstar>T\*)"
    rb"|(?P<tj>\((?P<tj_s>(?:[^()\\]|\\.)*)\)\s*Tj)"
    rb"|(?P<tjx><(?P<tjx_s>[0-9A-Fa-f\s]*)>\s*Tj)"
    rb"|(?P<quote>\((?P<quote_s>(?:[^()\\]|\\.)*)\)\s*')"
    rb"|(?P<quotex><(?P<quotex_s>[0-9A-Fa-f\s]*)>\s*')"
    rb"|(?P<dquote>(" + _NUM + rb")\s+(" + _NUM
    + rb")\s+\((?P<dquote_s>(?:[^()\\]|\\.)*)\)\s*\")"
    rb"|(?P<dquotex>(" + _NUM + rb")\s+(" + _NUM
    + rb")\s+<(?P<dquotex_s>[0-9A-Fa-f\s]*)>\s*\")"
    rb"|(?P<tja>\[(?P<tja_s>(?:[^\]\\]|\\.)*)\]\s*TJ)"
    rb"|(?P<bt>BT\b)"
    rb"|(?P<tf>/(?P<tf_f>[^\s/<>\[\]()]+)\s+" + _NUM + rb"\s+Tf\b)"
    rb"|(?P<do>/(?P<do_name>[^\s/<>\[\]()]+)\s+Do\b)",
    re.S,
)
# inline images (BI <dict> ID <binary> EI): the binary payload is not
# content-stream syntax and routinely contains bytes that look like text
# operators — strip before tokenizing. The EI delimiter must follow
# whitespace (standard heuristic for parsers without per-filter image
# decoders; poppler does the same scan, ref app/jobs.py:386-390 relies on
# poppler here).
# TJ array items: literal string, hex string, or a numeric kern adjustment
# (_NUM, not [\d.]+ — a stray '.' token must be skipped, not float()-crash)
_TJA_ITEM_RE = re.compile(
    rb"\(((?:[^()\\]|\\.)*)\)|<([0-9A-Fa-f\s]*)>|(" + _NUM + rb")"
)
# a negative TJ adjustment at least this large (thousandths of text space)
# reads as an inter-word gap and becomes one space — the poppler/pdfminer
# heuristic for PDFs that encode word breaks purely as kerning. Typical
# space glyphs are 200-600/1000 wide; intra-word kerns are tens.
TJ_SPACE_KERN = 180.0

# /ActualText value inside a BDC property dict: literal or hex string
_ACTUALTEXT_RE = re.compile(
    rb"/ActualText\s*(?:\((?P<lit>(?:[^()\\]|\\.)*)\)"
    rb"|<(?P<hex>[0-9A-Fa-f\s]*)>)"
)


def _pdf_text_string(s: str) -> str:
    """A PDF *text string* (§7.9.2.2): UTF-16BE when it leads with the
    BOM, PDFDocEncoding otherwise (≈ latin-1 for the common range)."""
    if s[:2] == "\xfe\xff":
        return s[2:].encode("latin-1", "replace").decode(
            "utf-16-be", "replace"
        )
    return s


def _unhex_str(h: bytes) -> str:
    """PDF hex string <48656C6C6F> → text; whitespace ignored, odd length
    padded with trailing 0 (PDF 32000-1 §7.3.4.3)."""
    hx = re.sub(rb"\s+", b"", h)
    if len(hx) % 2:
        hx += b"0"
    return bytes.fromhex(hx.decode("ascii")).decode("latin-1")


# ------------------------------------------------------------- encryption
# Standard security handler (PDF 32000-1 §7.6.3), RC4 V1/V2, revisions 2-3,
# EMPTY user password — the dominant "encrypted" shape in web crawls is
# owner-password-only files that any reader opens silently. MD5 via hashlib,
# RC4 implemented inline (stdlib-only constraint); AES comes from the
# pure-stdlib FIPS-197 implementation in functions/aes.py, covering
# /V 4 /CFM /AESV2 (AES-128-CBC, the Acrobat-7-era norm) and
# /V 5 /R 6 /CFM /AESV3 (AES-256, the PDF-2.0 norm).

_PAD = bytes.fromhex(
    "28BF4E5E4E758A4164004E56FFFA01082E2E00B6D0683E802F0CA9FE6453697A"
)
_ENCRYPT_REF_RE = re.compile(rb"/Encrypt\s+(\d+)\s+\d+\s+R")
_ID_RE = re.compile(rb"/ID\s*\[\s*<([0-9A-Fa-f]+)>")
# some generators write the trailer /ID as LITERAL strings (§7.5.5 allows
# both); missing them derived a wrong file key and rejected documents any
# reader opens — the literal form is parsed by _file_id_from below
_ID_LIT_RE = re.compile(rb"/ID\s*\[\s*\(")
_R_RE = re.compile(rb"/R\s+(\d+)\b")
_V_RE = re.compile(rb"/V\s+(\d+)\b")
_P_RE = re.compile(rb"/P\s+(-?\d+)\b")
_KEYLEN_RE = re.compile(rb"/Length\s+(\d+)\b")
_O_RE = re.compile(rb"/O\s*<([0-9A-Fa-f]+)>")
_U_RE = re.compile(rb"/U\s*<([0-9A-Fa-f]+)>")


def _rc4(key: bytes, data: bytes) -> bytes:
    if not data:
        return b""
    s = list(range(256))
    j = 0
    klen = len(key)  # hoisted: the KSA runs 256 iterations per call
    for i in range(256):
        j = (j + s[i] + key[i % klen]) & 0xFF
        s[i], s[j] = s[j], s[i]
    # generate the keystream alone (state updates are inherently sequential),
    # then XOR in ONE wide int op — measurably cheaper than per-byte xor
    ks = bytearray(len(data))
    i = j = 0
    for idx in range(len(data)):
        i = (i + 1) & 0xFF
        sj = j = (j + s[i]) & 0xFF
        si = s[i]
        s[i] = s[sj]
        s[sj] = si
        ks[idx] = s[(s[i] + si) & 0xFF]
    n = len(data)
    return (
        int.from_bytes(data, "big") ^ int.from_bytes(ks, "big")
    ).to_bytes(n, "big")


def _std_file_key(
    user_pw: bytes, o: bytes, p: int, file_id: bytes, r: int, keylen: int
) -> bytes:
    """Algorithm 2: the file encryption key from a (possibly empty) user
    password."""
    import hashlib

    padded = (user_pw + _PAD)[:32]
    h = hashlib.md5(
        padded + o[:32] + (p & 0xFFFFFFFF).to_bytes(4, "little") + file_id
    ).digest()
    if r >= 3:
        for _ in range(50):
            h = hashlib.md5(h[:keylen]).digest()
    return h[:keylen]


_CFM_RE = re.compile(rb"/CFM\s*/(AESV2|AESV3|V2)\b")
_AES_SALT = b"\x73\x41\x6c\x54"  # "sAlT" — ISO 32000 Algorithm 1 AES suffix


def _hash_r6(pw: bytes, salt: bytes, udata: bytes = b"") -> bytes:
    """ISO 32000-2 Algorithm 2.B: the hardened SHA-2 hash for /R 6."""
    import hashlib

    from gnosis_ocr_spark.functions.aes import cbc_encrypt

    k = hashlib.sha256(pw + salt + udata).digest()
    i = 0
    while True:
        k1 = (pw + k + udata) * 64
        # AES-128-CBC, no padding (input is already a multiple of 16)
        e = cbc_encrypt(k[:16], k[16:32], k1)[: len(k1)]
        mod = sum(e[:16]) % 3
        k = (
            hashlib.sha256(e) if mod == 0
            else hashlib.sha384(e) if mod == 1
            else hashlib.sha512(e)
        ).digest()
        i += 1
        if i >= 64 and e[-1] <= i - 32:
            return k[:32]


class _StdDecryptor:
    """Per-object decryption for the standard handler, empty user password:
    RC4 (/V 1/2), AES-128-CBC (/V 4 /CFM /AESV2), AES-256-CBC
    (/V 5 /R 6 /CFM /AESV3)."""

    def __init__(self, enc_body: bytes, file_id: bytes):
        import hashlib

        self.ok = False
        v = int(m.group(1)) if (m := _V_RE.search(enc_body)) else 0
        self.r = int(m.group(1)) if (m := _R_RE.search(enc_body)) else 2
        self.cfm = b"V2"  # RC4 unless a crypt filter says otherwise
        if v in (4, 5):
            cm = _CFM_RE.search(enc_body)
            self.cfm = cm.group(1) if cm else (b"AESV3" if v == 5 else b"V2")
        elif v not in (1, 2):
            self.reason = f"unsupported /V {v}"
            return
        o = bytes.fromhex(m.group(1).decode()) if (m := _O_RE.search(enc_body)) else b""
        u = bytes.fromhex(m.group(1).decode()) if (m := _U_RE.search(enc_body)) else b""
        p = int(m.group(1)) if (m := _P_RE.search(enc_body)) else -1

        if v == 5:
            # R6: validate the empty USER password and unwrap the file key
            from gnosis_ocr_spark.functions.aes import cbc_decrypt

            ue_m = re.search(rb"/UE\s*<([0-9A-Fa-f]+)>", enc_body)
            if self.r != 6 or len(u) < 48 or not ue_m:
                self.reason = f"unsupported /V 5 variant (/R {self.r})"
                return
            vsalt, ksalt = u[32:40], u[40:48]
            if _hash_r6(b"", vsalt) != u[:32]:
                self.reason = "user password required (empty password rejected)"
                return
            ik = _hash_r6(b"", ksalt)
            ue = bytes.fromhex(ue_m.group(1).decode())
            self.key = cbc_decrypt(ik, b"\x00" * 16, ue, unpad=False)[:32]
            self.keylen = 32
            self.ok = True
            return

        bits = int(m.group(1)) if (m := _KEYLEN_RE.search(enc_body)) else 40
        if v == 4:
            bits = 128  # /V 4 crypt filters are 128-bit
        self.keylen = max(5, min(16, bits // 8))
        self.key = _std_file_key(b"", o, p, file_id, self.r, self.keylen)
        # verify the EMPTY user password against /U (algorithms 4/5)
        if self.r == 2:
            expect = _rc4(self.key, _PAD)
            self.ok = expect == u[:32]
        else:
            h = hashlib.md5(_PAD + file_id).digest()
            x = _rc4(self.key, h)
            for i in range(1, 20):
                x = _rc4(bytes(b ^ i for b in self.key), x)
            self.ok = x == u[:16]
        if not self.ok:
            self.reason = "user password required (empty password rejected)"

    def decrypt_obj(self, num: int, data: bytes, gen: int = 0) -> bytes:
        import hashlib

        if self.cfm == b"AESV3":
            from gnosis_ocr_spark.functions.aes import cbc_decrypt

            # AES-256 uses the FILE key for every object; data = IV ‖ ct
            if len(data) < 16:
                return b""
            return cbc_decrypt(self.key, data[:16], data[16:])
        okey = hashlib.md5(
            self.key
            + num.to_bytes(3, "little")
            + gen.to_bytes(2, "little")
            + (_AES_SALT if self.cfm == b"AESV2" else b"")
        ).digest()[: min(self.keylen + 5, 16)]
        if self.cfm == b"AESV2":
            from gnosis_ocr_spark.functions.aes import cbc_decrypt

            if len(data) < 16:
                return b""
            return cbc_decrypt(okey, data[:16], data[16:])
        return _rc4(okey, data)


@functools.lru_cache(maxsize=4)
def _decryptor_for(pdf: bytes) -> "_StdDecryptor | None":
    """Build a decryptor if the trailer references /Encrypt; None for
    unencrypted files. Raises ValueError for unsupported/locked encryption
    (callers surface that as the standard parse-failure sentinel).

    Memoized on the pdf bytes: the R≥3 password verification costs ~20
    RC4 key schedules (profiled at 80% of an encrypted doc's decode), and
    pdf_split calls page_count + one extract_pages per 10-page window on
    the SAME bytes object — CPython caches a bytes object's hash, so
    repeat lookups are O(1) and a 500-page document authenticates once
    instead of 51 times. maxsize=4 bounds retained bytes to less than the
    Arrow batch already in memory (a Python worker walks one document at a
    time); lru_cache does not cache exceptions, so a locked file's
    ValueError raises on every call exactly as before."""
    em = _ENCRYPT_REF_RE.search(pdf)
    if not em:
        return None
    enc_no = int(em.group(1))
    enc_body = b""
    for m in _OBJ_RE.finditer(pdf):
        if int(m.group(1)) == enc_no:
            enc_body = m.group(3)
            break
    idm = _ID_RE.search(pdf)
    if idm:
        file_id = bytes.fromhex(idm.group(1).decode())
    else:
        # literal-string /ID [(..) (..)] — legal (§7.5.5) and emitted by
        # some generators; parse the first element with the standard
        # escape rules (bytes via latin-1 round-trip)
        file_id = b""
        litm = _ID_LIT_RE.search(pdf)
        if litm:
            start = litm.end()
            depth, j = 1, start
            while j < len(pdf) and depth:
                ch = pdf[j : j + 1]
                if ch == b"\\":
                    j += 2
                    continue
                if ch == b"(":
                    depth += 1
                elif ch == b")":
                    depth -= 1
                j += 1
            file_id = _unesc(
                pdf[start : j - 1].decode("latin-1")
            ).encode("latin-1", "ignore")
    dec = _StdDecryptor(enc_body, file_id)
    if not dec.ok:
        raise ValueError(f"encrypted PDF: {dec.reason}")
    return dec


# ------------------------------------------------------------------ fonts
# Simple-font byte decoding: /ToUnicode CMaps and /Encoding /Differences.
# Real crawls hit non-WinAnsi text constantly (ref extracts via poppler,
# app/jobs.py:386-390, which consults exactly these tables); without them
# accented/Greek text comes out as the wrong latin-1 bytes. Composite
# (CID/Identity-H multi-byte) fonts are out of scope for this stdlib parser
# and documented as such — their strings fall back to latin-1.

# public Adobe Glyph List subset (glyph name → unicode) covering Latin-1
# accents, common punctuation and Greek — the names /Differences arrays use
_GLYPH_NAMES: dict[str, str] = {
    "zero": "0", "one": "1", "two": "2", "three": "3", "four": "4",
    "five": "5", "six": "6", "seven": "7", "eight": "8", "nine": "9",
    "space": " ", "exclam": "!", "quotedbl": '"', "numbersign": "#",
    "dollar": "$", "percent": "%", "ampersand": "&", "quotesingle": "'",
    "parenleft": "(", "parenright": ")", "asterisk": "*", "plus": "+",
    "comma": ",", "hyphen": "-", "period": ".", "slash": "/",
    "colon": ":", "semicolon": ";", "less": "<", "equal": "=",
    "greater": ">", "question": "?", "at": "@", "bracketleft": "[",
    "backslash": "\\", "bracketright": "]", "underscore": "_",
    "quoteleft": "‘", "quoteright": "’",
    "quotedblleft": "“", "quotedblright": "”",
    "endash": "–", "emdash": "—", "bullet": "•",
    "ellipsis": "…", "Euro": "€", "degree": "°",
    "agrave": "à", "aacute": "á", "acircumflex": "â", "adieresis": "ä",
    "aring": "å", "ae": "æ", "ccedilla": "ç", "egrave": "è",
    "eacute": "é", "ecircumflex": "ê", "edieresis": "ë", "igrave": "ì",
    "iacute": "í", "icircumflex": "î", "idieresis": "ï", "ntilde": "ñ",
    "ograve": "ò", "oacute": "ó", "ocircumflex": "ô", "odieresis": "ö",
    "oslash": "ø", "ugrave": "ù", "uacute": "ú", "ucircumflex": "û",
    "udieresis": "ü", "yacute": "ý", "germandbls": "ß", "thorn": "þ",
    "eth": "ð", "Agrave": "À", "Aacute": "Á", "Adieresis": "Ä",
    "Ccedilla": "Ç", "Eacute": "É", "Egrave": "È", "Ntilde": "Ñ",
    "Odieresis": "Ö", "Udieresis": "Ü", "alpha": "α", "beta": "β",
    "gamma": "γ", "delta": "δ", "epsilon": "ε", "zeta": "ζ", "eta": "η",
    "theta": "θ", "iota": "ι", "kappa": "κ", "lambda": "λ", "mu": "μ",
    "nu": "ν", "xi": "ξ", "omicron": "ο", "pi": "π", "rho": "ρ",
    "sigma": "σ", "tau": "τ", "upsilon": "υ", "phi": "φ", "chi": "χ",
    "psi": "ψ", "omega": "ω", "Alpha": "Α", "Beta": "Β", "Gamma": "Γ",
    "Delta": "Δ", "Omega": "Ω", "Sigma": "Σ", "Pi": "Π", "Phi": "Φ",
    "Lambda": "Λ", "Theta": "Θ",
    # high-frequency names real /Differences arrays and subset font
    # programs carry (AGL): ligatures, legal/currency marks, guillemets,
    # Latin-1 punctuation/symbols, superiors/fractions, spacing accents
    "braceleft": "{", "bar": "|", "braceright": "}", "asciitilde": "~",
    "asciicircum": "^", "grave": "`",
    "fi": "ﬁ", "fl": "ﬂ",
    "copyright": "©", "registered": "®", "trademark": "™",
    "section": "§", "paragraph": "¶", "periodcentered": "·",
    "cent": "¢", "sterling": "£", "yen": "¥", "currency": "¤",
    "florin": "ƒ", "fraction": "⁄", "perthousand": "‰",
    "dagger": "†", "daggerdbl": "‡", "minus": "−",
    "guillemotleft": "«", "guillemotright": "»",
    "guilsinglleft": "‹", "guilsinglright": "›",
    "quotesinglbase": "‚", "quotedblbase": "„",
    "exclamdown": "¡", "questiondown": "¿",
    "multiply": "×", "divide": "÷", "plusminus": "±",
    "logicalnot": "¬", "brokenbar": "¦",
    "onequarter": "¼", "onehalf": "½", "threequarters": "¾",
    "onesuperior": "¹", "twosuperior": "²", "threesuperior": "³",
    "ordfeminine": "ª", "ordmasculine": "º",
    "dotlessi": "ı", "OE": "Œ", "oe": "œ", "AE": "Æ", "Aring": "Å",
    "Scaron": "Š", "scaron": "š", "Zcaron": "Ž", "zcaron": "ž",
    "Ydieresis": "Ÿ", "ydieresis": "ÿ", "Thorn": "Þ", "Eth": "Ð",
    "Oslash": "Ø", "Atilde": "Ã", "atilde": "ã", "Otilde": "Õ",
    "otilde": "õ", "Acircumflex": "Â", "Ecircumflex": "Ê",
    "Icircumflex": "Î", "Ocircumflex": "Ô", "Ucircumflex": "Û",
    "Igrave": "Ì", "Iacute": "Í", "Idieresis": "Ï", "Ograve": "Ò",
    "Oacute": "Ó", "Ugrave": "Ù", "Uacute": "Ú", "Yacute": "Ý",
    "macron": "¯", "acute": "´", "cedilla": "¸", "dieresis": "¨",
    "circumflex": "ˆ", "tilde": "˜",
}


def _glyph_to_char(name: str) -> str | None:
    """Glyph name → unicode: the AGL subset above, plus the algorithmic
    uniXXXX / uXXXX(XX) forms, plus single-char names mapping to themselves."""
    if name in _GLYPH_NAMES:
        return _GLYPH_NAMES[name]
    if name.startswith("uni") and len(name) >= 7:
        try:
            return chr(int(name[3:7], 16))
        except ValueError:
            return None
    if name.startswith("u") and 5 <= len(name) <= 7:
        try:
            return chr(int(name[1:], 16))
        except ValueError:
            return None
    if len(name) == 1:
        return name
    return None


_BFCHAR_RE = re.compile(rb"beginbfchar(.*?)endbfchar", re.S)
_BFRANGE_RE = re.compile(rb"beginbfrange(.*?)endbfrange", re.S)
_HEXPAIR_RE = re.compile(rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>")
_HEXRANGE_RE = re.compile(
    rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>\s*(?:<([0-9A-Fa-f]+)>|\[((?:\s*<[0-9A-Fa-f]+>)+)\s*\])"
)


def _utf16be_hex_to_str(h: bytes) -> str:
    hx = h.decode("ascii")
    if len(hx) % 4:  # pad odd/short forms defensively
        hx = hx.zfill((len(hx) + 3) // 4 * 4)
    return bytes.fromhex(hx).decode("utf-16-be", "replace")


def _parse_cmap(data: bytes) -> dict[int, str]:
    """/ToUnicode CMap → {code: unicode string}. Handles bfchar pairs and
    bfrange (both the contiguous-destination and array-destination forms).
    Codes up to 0xFFFF are kept: 1-byte simple fonts use the ≤ 0xFF slice,
    composite (Type0/Identity-H) fonts consume the full 2-byte space."""
    table: dict[int, str] = {}
    # hostile-input bound: the 2-byte codespace holds at most 65536 codes,
    # so no CMap legitimately emits more mappings — a hostile stream of
    # repeated full-range bfranges (~300 s CPU per MB measured) stops here
    cap = 0x10000
    for block in _BFRANGE_RE.finditer(data):
        for m in _HEXRANGE_RE.finditer(block.group(1)):
            if len(table) >= cap:
                return table
            lo, hi = int(m.group(1), 16), int(m.group(2), 16)
            if m.group(3) is not None:
                dst = _utf16be_hex_to_str(m.group(3))
                if dst:
                    base = ord(dst[-1])
                    prefix = dst[:-1]
                    for c in range(lo, min(hi, 0xFFFF) + 1):
                        cp = base + (c - lo)
                        if cp > 0x10FFFF:  # past Unicode: skip, never raise
                            break
                        if 0xD800 <= cp <= 0xDFFF:  # lone surrogate: not
                            # Arrow/UTF-8 serializable — replacement char
                            table[c] = prefix + "�"
                        else:
                            table[c] = prefix + chr(cp)
            else:
                dsts = re.findall(rb"<([0-9A-Fa-f]+)>", m.group(4))
                for c, d in zip(range(lo, hi + 1), dsts):
                    if c <= 0xFFFF:
                        table[c] = _utf16be_hex_to_str(d)
    for block in _BFCHAR_RE.finditer(data):
        for m in _HEXPAIR_RE.finditer(block.group(1)):
            if len(table) >= cap:
                return table
            code = int(m.group(1), 16)
            if code <= 0xFFFF:
                table[code] = _utf16be_hex_to_str(m.group(2))
    return table


_CIDRANGE_RE = re.compile(rb"begincidrange(.*?)endcidrange", re.S)
_CIDCHAR_RE = re.compile(rb"begincidchar(.*?)endcidchar", re.S)
_CIDRANGE_ENTRY_RE = re.compile(rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>\s+(\d+)")
_CIDCHAR_ENTRY_RE = re.compile(rb"<([0-9A-Fa-f]+)>\s+(\d+)")


def _parse_cid_cmap(data: bytes) -> dict[int, int]:
    """Embedded /Encoding CMap → {show-string code: CID}. Handles
    begincidrange (contiguous CID runs) and begincidchar (singletons);
    2-byte codespace (codes ≤ 0xFFFF)."""
    table: dict[int, int] = {}
    for block in _CIDRANGE_RE.finditer(data):
        for m in _CIDRANGE_ENTRY_RE.finditer(block.group(1)):
            if len(table) >= 0x10000:  # same hostile-stream bound as bfrange
                return table
            lo, hi = int(m.group(1), 16), int(m.group(2), 16)
            cid0 = int(m.group(3))
            for c in range(lo, min(hi, 0xFFFF) + 1):
                table[c] = cid0 + (c - lo)
    for block in _CIDCHAR_RE.finditer(data):
        for m in _CIDCHAR_ENTRY_RE.finditer(block.group(1)):
            code = int(m.group(1), 16)
            if code <= 0xFFFF:
                table[code] = int(m.group(2))
    return table


_DIFFS_RE = re.compile(rb"/Differences\s*\[(.*?)\]", re.S)
_DIFF_TOK_RE = re.compile(rb"(\d+)|/([^\s/<>\[\]()]+)")
_BASEENC_RE = re.compile(rb"/(?:Base)?Encoding\s*/(WinAnsiEncoding|MacRomanEncoding)")
_TOUNICODE_REF_RE = re.compile(rb"/ToUnicode\s+(\d+)\s+\d+\s+R")
_ENCODING_REF_RE = re.compile(rb"/Encoding\s+(\d+)\s+\d+\s+R")


def _base_encoding_table(name: bytes | None) -> list[str]:
    """256-entry base table: WinAnsi ≈ cp1252 (undefined bytes fall back to
    latin-1 so behavior is a superset of the old parser), MacRoman via the
    stdlib codec, default latin-1 (identity)."""
    table = [chr(i) for i in range(256)]
    codec = {b"WinAnsiEncoding": "cp1252", b"MacRomanEncoding": "mac_roman"}.get(
        name or b""
    )
    if codec:
        for i in range(128, 256):  # 0-127 is ASCII in all three
            try:
                table[i] = bytes([i]).decode(codec)
            except UnicodeDecodeError:
                pass
    return table


_TYPE0_RE = re.compile(rb"/Subtype\s*/Type0\b")
_IDENTITY_H_RE = re.compile(rb"/Encoding\s*/Identity-[HV]\b")
# the predefined Unicode CMap families (public Adobe CMap resources): their
# 2-byte codespace IS UCS-2 / UTF-16BE code units, so extraction decodes the
# show-string bytes directly — no CID table needed. Covers the GB (Simplified
# Chinese), JIS (Japanese, incl. -HW half-width), KS (Korean) and CNS
# (Traditional Chinese) registries, H and V writing modes.
_PREDEF_UNICODE_RE = re.compile(
    rb"/Encoding\s*/Uni(?:GB|JIS|JIS2004|JISX0213|JISX02132004|KS|CNS)"
    rb"-(?:UCS2|UTF16)(?:-HW)?-[HV]\b"
)

# legacy byte-oriented predefined CMaps (public Adobe CMap resources): their
# CODESPACE is a legacy charset encoding — the CMap maps charset byte
# sequences to registry CIDs, and the registry's ToUnicode direction maps
# those CIDs back to the charset's Unicode repertoire, so the composition
# is exactly "decode the show-string bytes as that charset". Python ships
# these codecs, so no CID tables are needed; variable-width (1/2-byte)
# code consumption comes from the codec itself. Only exact charset↔CMap
# pairs are listed; Mac (pc/pv) variants and rarer registries keep the
# honest unmapped degradation.
_PREDEF_CHARSET_CODECS = {
    b"GBK-EUC": "gbk",           # Adobe-GB1, GBK bytes
    b"GBK2K": "gb18030",         # Adobe-GB1, GB18030 bytes
    b"GB-EUC": "gb2312",         # Adobe-GB1, EUC-CN bytes
    b"90ms-RKSJ": "cp932",       # Adobe-Japan1, Microsoft Shift-JIS
    b"90msp-RKSJ": "cp932",      # proportional variant, same encoding
    b"EUC": "euc_jp",            # Adobe-Japan1, EUC-JP
    b"KSCms-UHC": "cp949",       # Adobe-Korea1, Microsoft UHC
    b"KSC-EUC": "euc_kr",        # Adobe-Korea1, EUC-KR
    b"ETen-B5": "cp950",         # Adobe-CNS1, Big5 + ETen extensions
}
_PREDEF_NAME_RE = re.compile(
    rb"/Encoding\s*/([0-9A-Za-z\-]+?)(?:-HW)?-[HV]\b"
)


_FONTDESC_REF_RE = re.compile(rb"/FontDescriptor\s+(\d+)\s+\d+\s+R")
_FONTFILE_REF_RE = re.compile(rb"/FontFile([23]?)\s+(\d+)\s+\d+\s+R")
_T1_ENC_ENTRY_RE = re.compile(rb"dup\s+(\d+)\s*/([^\s/<>\[\]()]+)\s+put")


def _type1_builtin_table(pgm: bytes) -> list[str] | None:
    """Builtin encoding of an embedded Type1 font program (ISO 9541 /
    Adobe Type 1 spec §2.3): the cleartext portion (everything before
    ``eexec``; charstrings/Subrs are encrypted so their dup/put pairs
    can't false-match) declares ``/Encoding 256 array`` followed by
    ``dup <code> /<glyphname> put`` entries. Returns a 256-entry table
    (latin-1 identity for unmapped codes, matching the repo's degradation
    stance) or None when the program declares no custom entries (e.g.
    ``/Encoding StandardEncoding def``)."""
    clear = pgm.split(b"eexec", 1)[0]
    pos = clear.find(b"/Encoding")
    if pos < 0:
        return None
    table = [chr(i) for i in range(256)]
    mapped = False
    for m in _T1_ENC_ENTRY_RE.finditer(clear, pos):
        code = int(m.group(1))
        ch = _glyph_to_char(m.group(2).decode("latin-1"))
        if ch is not None and code <= 0xFF:
            table[code] = ch
            mapped = True
    return table if mapped else None


def _sfnt_tables(pgm: bytes) -> dict[bytes, bytes]:
    """TrueType/OpenType table directory → {tag: table bytes}."""
    if len(pgm) < 12:
        return {}
    (num_tables,) = struct.unpack(">H", pgm[4:6])
    tables: dict[bytes, bytes] = {}
    for i in range(min(num_tables, 64)):
        rec = pgm[12 + 16 * i : 28 + 16 * i]
        if len(rec) < 16:
            break
        tag = rec[0:4]
        off, length = struct.unpack(">II", rec[8:16])
        if off + length <= len(pgm):
            tables[tag] = pgm[off : off + length]
    return tables


def _tt_post_gid_chars(post: bytes) -> dict[int, str]:
    """'post' table format 2.0 → {glyph id: unicode char}. Indices < 258
    are the standard Macintosh glyph order — the run 3..97 is exactly
    ASCII 0x20..0x7E (plus .notdef/.null/nonmarkingreturn below), the
    only segment of that table used here; accented tail indices degrade
    to unmapped. Indices >= 258 name via the trailing Pascal strings
    (subsetters emit uniXXXX / AGL names there)."""
    if len(post) < 34 or struct.unpack(">I", post[0:4])[0] != 0x00020000:
        return {}
    (n_glyphs,) = struct.unpack(">H", post[32:34])
    if 34 + 2 * n_glyphs > len(post):
        return {}
    idx = struct.unpack(f">{n_glyphs}H", post[34 : 34 + 2 * n_glyphs])
    names: list[str] = []
    p = 34 + 2 * n_glyphs
    while p < len(post) and len(names) < n_glyphs:
        ln = post[p]
        names.append(post[p + 1 : p + 1 + ln].decode("latin-1"))
        p += 1 + ln
    out: dict[int, str] = {}
    for gid, ni in enumerate(idx):
        if 3 <= ni <= 97:  # Mac standard order ASCII run
            out[gid] = chr(0x20 + ni - 3)
        elif ni >= 258 and ni - 258 < len(names):
            ch = _glyph_to_char(names[ni - 258])
            if ch is not None:
                out[gid] = ch
    return out


def _tt_cmap_lookup(cmap: bytes):
    """Best byte-code→glyph-id lookup from a 'cmap' table, or None.
    Subtable preference mirrors poppler's symbolic-TrueType chain:
    (3,0) Microsoft Symbol (codes live at 0xF000+c or c), then (1,0)
    Macintosh Roman (codes direct). Formats 0, 4 and 6 supported; a
    unicode-keyed (3,1)-only font gives no code→GID path and returns
    None (the dict-encoding/latin-1 fallback applies)."""
    if len(cmap) < 4:
        return None
    (n_sub,) = struct.unpack(">H", cmap[2:4])
    subs: dict[tuple[int, int], bytes] = {}
    for i in range(min(n_sub, 32)):
        rec = cmap[4 + 8 * i : 12 + 8 * i]
        if len(rec) < 8:
            break
        pid, eid, off = struct.unpack(">HHI", rec)
        if off < len(cmap):
            subs[(pid, eid)] = cmap[off:]
    for key, high in (((3, 0), True), ((1, 0), False)):
        sub = subs.get(key)
        if sub is None:
            continue
        fn = _tt_subtable_fn(sub)
        if fn is None:
            continue
        if high:
            return lambda c, fn=fn: fn(0xF000 + c) or fn(c)
        return fn
    return None


def _tt_subtable_fn(sub: bytes):
    """One cmap subtable → callable(code)->gid (0 = unmapped), or None."""
    if len(sub) < 2:
        return None
    (fmt,) = struct.unpack(">H", sub[0:2])
    if fmt == 0 and len(sub) >= 262:
        arr = sub[6:262]
        return lambda c: arr[c] if 0 <= c < 256 else 0
    if fmt == 6 and len(sub) >= 10:
        first, count = struct.unpack(">HH", sub[6:10])
        if 10 + 2 * count > len(sub):
            return None
        ids = struct.unpack(f">{count}H", sub[10 : 10 + 2 * count])
        return lambda c: ids[c - first] if first <= c < first + count else 0
    if fmt == 4 and len(sub) >= 14:
        (seg_x2,) = struct.unpack(">H", sub[6:8])
        segs = seg_x2 // 2
        base = 14
        need = base + seg_x2 * 4 + 2
        if segs == 0 or need > len(sub):
            return None
        end = struct.unpack(f">{segs}H", sub[base : base + seg_x2])
        s2 = base + seg_x2 + 2  # +2: reservedPad
        start = struct.unpack(f">{segs}H", sub[s2 : s2 + seg_x2])
        s3 = s2 + seg_x2
        delta = struct.unpack(f">{segs}h", sub[s3 : s3 + seg_x2])
        s4 = s3 + seg_x2

        def lookup(c: int) -> int:
            for i in range(segs):
                if c <= end[i]:
                    if c < start[i]:
                        return 0
                    (ro,) = struct.unpack(
                        ">H", sub[s4 + 2 * i : s4 + 2 * i + 2]
                    )
                    if ro == 0:
                        return (c + delta[i]) & 0xFFFF
                    gpos = s4 + 2 * i + ro + 2 * (c - start[i])
                    if gpos + 2 > len(sub):
                        return 0
                    (g,) = struct.unpack(">H", sub[gpos : gpos + 2])
                    return (g + delta[i]) & 0xFFFF if g else 0
            return 0

        return lookup
    return None


def _truetype_builtin_table(pgm: bytes) -> list[str] | None:
    """Builtin encoding of an embedded TrueType program: byte code →
    glyph id via the font's own cmap, glyph id → unicode via 'post'
    glyph names. The (3,0)-symbol + post shape is how real subsetted
    symbolic fonts (no /Encoding, no /ToUnicode) stay decodable."""
    tables = _sfnt_tables(pgm)
    cmap, post = tables.get(b"cmap"), tables.get(b"post")
    if cmap is None or post is None:
        return None
    lookup = _tt_cmap_lookup(cmap)
    gid_chars = _tt_post_gid_chars(post)
    if lookup is None or not gid_chars:
        return None
    table = [chr(i) for i in range(256)]
    mapped = False
    for c in range(256):
        gid = lookup(c)
        ch = gid_chars.get(gid) if gid else None
        if ch is not None:
            table[c] = ch
            mapped = True
    return table if mapped else None


# CFF standard strings 0..95 (Adobe TN #5176 Appendix A): the run 1..95
# is exactly ASCII 0x20..0x7E in order — the only standard-SID segment
# used here; accented standard SIDs (96..390) degrade to unmapped.
def _cff_sid_char(sid: int, strings: list[bytes]) -> str | None:
    if sid == 0:
        return None  # .notdef
    if 1 <= sid <= 95:
        return chr(0x20 + sid - 1)
    if sid >= 391 and sid - 391 < len(strings):
        return _glyph_to_char(strings[sid - 391].decode("latin-1"))
    return None


def _cff_index(data: bytes, pos: int) -> tuple[list[bytes], int]:
    """One CFF INDEX at ``pos`` → (items, position after)."""
    (count,) = struct.unpack(">H", data[pos : pos + 2])
    if count == 0:
        return [], pos + 2
    off_size = data[pos + 2]
    if not 1 <= off_size <= 4:
        raise ValueError("CFF offSize")
    obase = pos + 3
    offs = []
    for i in range(count + 1):
        v = 0
        for b in data[obase + i * off_size : obase + (i + 1) * off_size]:
            v = (v << 8) | b
        offs.append(v)
    dbase = obase + (count + 1) * off_size - 1  # offsets are 1-based
    items = [data[dbase + offs[i] : dbase + offs[i + 1]] for i in range(count)]
    return items, dbase + offs[count]


def _cff_dict(data: bytes) -> dict[int, list[int]]:
    """CFF DICT → {operator: operands} (integer operands only; reals are
    consumed and dropped — none of the offsets read here are reals).
    Two-byte operators key as 1200+op2."""
    out: dict[int, list[int]] = {}
    operands: list[int] = []
    i, n = 0, len(data)
    while i < n:
        b0 = data[i]
        if 32 <= b0 <= 246:
            operands.append(b0 - 139)
            i += 1
        elif 247 <= b0 <= 250:
            operands.append((b0 - 247) * 256 + data[i + 1] + 108)
            i += 2
        elif 251 <= b0 <= 254:
            operands.append(-(b0 - 251) * 256 - data[i + 1] - 108)
            i += 2
        elif b0 == 28:
            operands.append(struct.unpack(">h", data[i + 1 : i + 3])[0])
            i += 3
        elif b0 == 29:
            operands.append(struct.unpack(">i", data[i + 1 : i + 5])[0])
            i += 5
        elif b0 == 30:  # real: nibbles until 0xF terminator
            i += 1
            while i < n and (data[i] & 0x0F) != 0x0F and (data[i] >> 4) != 0x0F:
                i += 1
            i += 1
            operands.append(0)
        elif b0 == 12:
            out[1200 + data[i + 1]] = operands
            operands = []
            i += 2
        elif b0 <= 21:
            out[b0] = operands
            operands = []
            i += 1
        else:
            raise ValueError(f"CFF DICT byte {b0}")
    return out


def _cff_builtin_table(pgm: bytes) -> list[str] | None:
    """Builtin encoding of a bare CFF (Type1C) font program: code → glyph
    via the CFF Encoding (formats 0/1 + supplements), glyph → SID via the
    charset (formats 0/1/2), SID → name via standard/custom strings.
    Fonts using the predefined Standard/Expert encodings return None —
    their codes are already latin-1-adjacent and the dict/default path
    applies (poppler's degradation without AGL coverage is the same)."""
    if len(pgm) < 4 or pgm[0] != 1:
        return None
    hdr_size = pgm[2]
    _, p = _cff_index(pgm, hdr_size)              # Name INDEX
    top_dicts, p = _cff_index(pgm, p)             # Top DICT INDEX
    strings, p = _cff_index(pgm, p)               # String INDEX
    if not top_dicts:
        return None
    top = _cff_dict(top_dicts[0])
    enc_off = top.get(16, [0])[0]
    if enc_off in (0, 1):                          # Standard/Expert
        return None
    cs_off = top.get(17, [0])[0]
    charset_off = top.get(15, [0])[0]
    if not cs_off:
        return None
    charstrings, _ = _cff_index(pgm, cs_off)
    n_glyphs = len(charstrings)

    # charset: gid -> SID (gid 0 is .notdef, implicit)
    sids = [0]
    if charset_off in (0, 1, 2):
        sids += list(range(1, n_glyphs))  # ISOAdobe identity degradation
    else:
        fmt = pgm[charset_off]
        q = charset_off + 1
        if fmt == 0:
            for _ in range(n_glyphs - 1):
                sids.append(struct.unpack(">H", pgm[q : q + 2])[0])
                q += 2
        elif fmt in (1, 2):
            step = 3 if fmt == 1 else 4
            while len(sids) < n_glyphs:
                first = struct.unpack(">H", pgm[q : q + 2])[0]
                n_left = (
                    pgm[q + 2] if fmt == 1
                    else struct.unpack(">H", pgm[q + 2 : q + 4])[0]
                )
                sids += list(range(first, first + n_left + 1))
                q += step
            sids = sids[:n_glyphs]
        else:
            return None

    table = [chr(i) for i in range(256)]
    mapped = False

    def put(code: int, sid: int) -> None:
        nonlocal mapped
        ch = _cff_sid_char(sid, strings)
        if ch is not None and code <= 0xFF:
            table[code] = ch
            mapped = True

    fmt = pgm[enc_off]
    q = enc_off + 1
    if fmt & 0x7F == 0:
        n_codes = pgm[q]
        q += 1
        for gid in range(1, min(n_codes + 1, n_glyphs)):
            put(pgm[q + gid - 1], sids[gid])
        q += n_codes
    elif fmt & 0x7F == 1:
        n_ranges = pgm[q]
        q += 1
        gid = 1
        for _ in range(n_ranges):
            first, n_left = pgm[q], pgm[q + 1]
            for k in range(n_left + 1):
                if gid < n_glyphs:
                    put(first + k, sids[gid])
                gid += 1
            q += 2
    else:
        return None
    if fmt & 0x80:  # supplements: code -> SID directly
        n_sups = pgm[q]
        q += 1
        for _ in range(n_sups):
            put(pgm[q], struct.unpack(">H", pgm[q + 1 : q + 3])[0])
            q += 3
    return table if mapped else None


def _fontfile3_table(pgm: bytes) -> list[str] | None:
    """/FontFile3 program: bare CFF (Type1C) or OpenType-wrapped (OTTO
    sfnt — try the cmap+post chain first, then the embedded CFF table)."""
    if pgm[:4] == b"OTTO":
        table = _truetype_builtin_table(pgm)
        if table is not None:
            return table
        cff = _sfnt_tables(pgm).get(b"CFF ")
        return _cff_builtin_table(cff) if cff else None
    return _cff_builtin_table(pgm)


def _embedded_program_table(
    objs: dict[int, bytes], font_body: bytes, dec=None
) -> list[str] | None:
    """Resolve /FontDescriptor → /FontFile (Type1), /FontFile2 (TrueType)
    or /FontFile3 (CFF/Type1C/OpenType) and extract the program's builtin
    encoding. Any parse failure degrades to None (latin-1 path) — crawl
    bytes never raise."""
    fd = _FONTDESC_REF_RE.search(font_body)
    if not fd:
        return None
    desc = objs.get(int(fd.group(1)), b"")
    ff = _FONTFILE_REF_RE.search(desc)
    if not ff:
        return None
    num = int(ff.group(2))
    try:
        pgm = _stream_bytes(objs.get(num, b""), _obj_dec(dec, num), objs)
        if not pgm:
            return None
        if ff.group(1) == b"2":
            return _truetype_builtin_table(pgm)
        if ff.group(1) == b"3":
            return _fontfile3_table(pgm)
        return _type1_builtin_table(pgm)
    except Exception:
        return None


def _font_decode_table(
    objs: dict[int, bytes], font_body: bytes, dec=None
) -> tuple[int, list[str] | dict[int, str]] | None:
    """Per-font decode spec ``(code_width_bytes, mapping)``, or None when the
    font carries no encoding info at all (the fast path: strings decode
    latin-1 exactly as before).

    Simple fonts → (1, 256-entry list). Precedence (highest wins):
    /ToUnicode CMap > /Encoding /Differences glyph names > /BaseEncoding
    (WinAnsi/MacRoman) > latin-1 identity.

    Composite fonts (/Subtype /Type0 with /Encoding /Identity-H|V — the
    embedded-subset TrueType norm in modern crawls) → (2, cmap dict): show
    strings are sequences of 2-byte CIDs meaningful ONLY through the
    /ToUnicode CMap; unmapped CIDs decode to U+FFFD (same stance poppler
    takes when a subset font ships no usable map).

    Composite fonts with an EMBEDDED CMap /Encoding stream (the custom/CJK
    subset shape: show-string codes map through begincidchar/begincidrange
    to CIDs first) compose that code→CID map with the CID-keyed /ToUnicode;
    2-byte codespaces supported (the dominant layout)."""
    if _TYPE0_RE.search(font_body):
        tm = _TOUNICODE_REF_RE.search(font_body)
        cmap: dict[int, str] = {}
        if tm:
            stream = _stream_bytes(
                objs.get(int(tm.group(1)), b""),
                _obj_dec(dec, int(tm.group(1))),
                objs,
            )
            if stream is not None:
                cmap = _parse_cmap(stream)
        if _IDENTITY_H_RE.search(font_body):
            return (2, cmap)
        if _PREDEF_UNICODE_RE.search(font_body):
            # predefined Uni*-UCS2/UTF16 CMap: the 2-byte codes ARE Unicode
            # code units by that family's public definition, so decode them
            # directly (UTF-16BE handles the UCS2 subset and UTF16 surrogate
            # pairs alike). A /ToUnicode, if present, is deliberately NOT
            # composed: without the registry's code→CID table the CID keys
            # are unreachable, while the direct reading is exact — the same
            # text poppler derives from these CMaps' toUnicode direction.
            return (2, "utf16be")
        pm = _PREDEF_NAME_RE.search(font_body)
        if pm:
            codec = _PREDEF_CHARSET_CODECS.get(pm.group(1))
            if codec is not None:
                # legacy byte-oriented predefined CMap: show-string bytes
                # ARE that charset's encoding (see _PREDEF_CHARSET_CODECS)
                return (2, ("charset", codec))
        em = _ENCODING_REF_RE.search(font_body)
        if em:
            enc_stream = _stream_bytes(
                objs.get(int(em.group(1)), b""),
                _obj_dec(dec, int(em.group(1))),
                objs,
            )
            if enc_stream and b"begincid" in enc_stream:
                cid_of = _parse_cid_cmap(enc_stream)
                return (
                    2,
                    {
                        code: cmap.get(cid, "�")
                        for code, cid in cid_of.items()
                    },
                )
        # unknown composite encoding (e.g. a predefined CMap name we don't
        # ship): 2-byte consumption with everything unmapped — poppler
        # without CMap resources degrades the same way
        return (2, {})
    enc_body = font_body
    em = _ENCODING_REF_RE.search(font_body)
    if em:
        enc_body = objs.get(int(em.group(1)), b"")
    base = _BASEENC_RE.search(font_body) or _BASEENC_RE.search(enc_body)
    dm = _DIFFS_RE.search(enc_body)
    tm = _TOUNICODE_REF_RE.search(font_body)
    if not base and not dm and not tm:
        # No encoding info in the font DICT at all: consult the embedded
        # font PROGRAM's builtin encoding — exactly what poppler does for
        # subset fonts that ship neither /Encoding nor /ToUnicode (a
        # dominant real-crawl shape; ref extracts these via poppler,
        # app/jobs.py:386-390). Type1 programs carry a cleartext
        # /Encoding array before eexec; symbolic TrueType programs carry
        # a cmap (3,0)/(1,0) subtable plus 'post' glyph names.
        table = _embedded_program_table(objs, font_body, dec)
        return (1, table) if table is not None else None
    table = _base_encoding_table(base.group(1) if base else None)
    if dm:
        code = 0
        for num, name in _DIFF_TOK_RE.findall(dm.group(1)):
            if num:
                code = int(num)
            else:
                ch = _glyph_to_char(name.decode("latin-1"))
                if ch is not None and code <= 0xFF:
                    table[code] = ch
                code += 1
    if tm:
        stream = _stream_bytes(
            objs.get(int(tm.group(1)), b""),
            _obj_dec(dec, int(tm.group(1))),
            objs,
        )
        if stream is not None:
            for code, dst in _parse_cmap(stream).items():
                if code <= 0xFF:
                    table[code] = dst
    return (1, table)


_RESOURCES_REF_RE = re.compile(rb"/Resources\s+(\d+)\s+\d+\s+R")
_FONT_DICT_RE = re.compile(rb"/Font\s*<<(.*?)>>", re.S)
_FONT_ENTRY_RE = re.compile(rb"/([^\s/<>\[\]()]+)\s+(\d+)\s+\d+\s+R")


def _obj_dec(dec, num: int):
    """Per-object decrypt closure for _stream_bytes, or None."""
    return (lambda raw: dec.decrypt_obj(num, raw)) if dec else None


def _resources_body(objs: dict[int, bytes], body: bytes) -> bytes:
    """The /Resources dict bytes for a page or form body — inline dict or
    indirect ref (real writers use both)."""
    rm = _RESOURCES_REF_RE.search(body)
    if rm:
        return objs.get(int(rm.group(1)), b"")
    return body


def _page_fonts(
    objs: dict[int, bytes], page_body: bytes, dec=None,
    cache: dict | None = None,
) -> dict[bytes, tuple[int, list[str] | dict[int, str]]]:
    """Font name → (code width, decode mapping) for one page's /Resources
    (inline dict or indirect ref). Fonts with no encoding info are omitted
    (latin-1 path); a font whose tables fail to PARSE degrades the same
    way — one hostile/corrupt CMap must not sentinel the whole document.
    ``cache`` (per-document, keyed by font object number) avoids
    re-parsing a shared font's ToUnicode/embedded program on every page
    of a window — a 100-page CJK doc parses its 100 KB CMap once."""
    res = _resources_body(objs, page_body)
    fm = _FONT_DICT_RE.search(res)
    fonts: dict[bytes, tuple[int, list[str] | dict[int, str]]] = {}
    if fm:
        for name, ref in _FONT_ENTRY_RE.findall(fm.group(1)):
            fno = int(ref)
            if cache is not None and fno in cache:
                spec = cache[fno]
            else:
                try:
                    spec = _font_decode_table(objs, objs.get(fno, b""), dec)
                except ValueError:
                    spec = None  # corrupt font tables: latin-1 fallback
                if cache is not None:
                    cache[fno] = spec
            if spec is not None:
                fonts[name] = spec
    return fonts


_XOBJ_DICT_RE = re.compile(rb"/XObject\s*<<(.*?)>>", re.S)
_FORM_SUBTYPE_RE = re.compile(rb"/Subtype\s*/Form\b")
_CATALOG_TYPE_RE = re.compile(rb"/Type\s*/Catalog\b")
_OCPROPS_REF_RE = re.compile(rb"/OCProperties\s+(\d+)\s+\d+\s+R")
_OFF_ARR_RE = re.compile(rb"/OFF\s*\[((?:\s*\d+\s+\d+\s+R)*)\s*\]")
_PROPERTIES_DICT_RE = re.compile(rb"/Properties\s*<<(.*?)>>", re.S)
_PROPERTIES_REF_RE = re.compile(rb"/Properties\s+(\d+)\s+\d+\s+R")


def _hidden_ocgs(objs: dict[int, bytes]) -> frozenset[int]:
    """Object numbers of optional content groups turned OFF by the
    document's default configuration (PDF 32000-1 §8.11.4.3, catalog
    /OCProperties /D /OFF) — the layers a conforming viewer hides, so
    poppler's rasterization (and hence the reference's OCR) never sees
    their content. Groups not listed default to ON."""
    hidden: set[int] = set()
    # deterministic over multi-catalog files (incremental updates can
    # leave a superseded catalog object alive): union every catalog's
    # OFF set — conservative, and identical when there is one catalog
    for no in sorted(objs):
        body = objs[no]
        if not _CATALOG_TYPE_RE.search(body):
            continue
        oc_at = body.find(b"/OCProperties")
        if oc_at < 0:
            continue
        rm = _OCPROPS_REF_RE.search(body)
        oc = (
            objs.get(int(rm.group(1)), b"")
            if rm is not None
            else (_balanced_dict(body, oc_at) or b"")
        )
        off = _OFF_ARR_RE.search(oc)
        if off is not None:
            hidden.update(
                int(n) for n in re.findall(rb"(\d+)\s+\d+\s+R", off.group(1))
            )
    return frozenset(hidden)


def _hidden_prop_names(
    objs: dict[int, bytes], body: bytes, hidden_nos: frozenset[int]
) -> frozenset[bytes]:
    """/Resources /Properties names (inline dict or indirect ref) that
    resolve to a hidden OCG — the names an `/OC /name BDC` region uses."""
    if not hidden_nos:
        return frozenset()
    res = _resources_body(objs, body)
    pm = _PROPERTIES_DICT_RE.search(res)
    if pm:
        entries = pm.group(1)
    else:
        rm = _PROPERTIES_REF_RE.search(res)
        if rm is None:
            return frozenset()
        pd = objs.get(int(rm.group(1)), b"")
        dm = _balanced_dict(pd, 0)
        entries = dm[2:-2] if dm else b""
    return frozenset(
        name
        for name, ref in _FONT_ENTRY_RE.findall(entries)
        if int(ref) in hidden_nos
    )
_MATRIX_RE = re.compile(
    rb"/Matrix\s*\[\s*(" + _NUM + rb")\s+(" + _NUM + rb")\s+(" + _NUM
    + rb")\s+(" + _NUM + rb")\s+(" + _NUM + rb")\s+(" + _NUM + rb")\s*\]"
)
_FORM_MAX_DEPTH = 8


def _xobject_map(objs: dict[int, bytes], body: bytes) -> dict[bytes, int]:
    """XObject name → object number from a page/form /Resources."""
    res = _resources_body(objs, body)
    xm = _XOBJ_DICT_RE.search(res)
    if not xm:
        return {}
    return {
        name: int(ref) for name, ref in _FONT_ENTRY_RE.findall(xm.group(1))
    }


def _form_spans(
    objs: dict[int, bytes],
    no: int | None,
    dec,
    parent_fonts: dict,
    depth: int,
    active: frozenset[int],
    hidden_nos: frozenset[int] = frozenset(),
    parent_hidden: frozenset[bytes] = frozenset(),
) -> list["Span"]:
    """Execute a ``name Do`` target: if the XObject is a /Subtype /Form,
    recursively parse its content stream (image XObjects contribute no
    text). Spans map through the FULL form /Matrix affine (rotation and
    scale included, PDF 32000-1 §8.10.1); the caller's CTM at the Do is
    applied by ``_parse_content``. The form's own /Resources override the
    caller's (PDF inheritance); forms may nest, so recursion is
    depth-capped and cycle-guarded (a self-referencing form must degrade
    to dropped content, not a RecursionError)."""
    if no is None or no in active or depth > _FORM_MAX_DEPTH:
        return []
    body = objs.get(no, b"")
    if not _FORM_SUBTYPE_RE.search(body):
        return []
    stream = _stream_bytes(body, _obj_dec(dec, no), objs)
    if stream is None:
        return []
    fonts = dict(parent_fonts)
    fonts.update(_page_fonts(objs, body, dec))
    xmap = _xobject_map(objs, body)
    nested = active | {no}
    # hidden optional-content names: the form's own /Properties union the
    # caller's (a form-local name shadowing a hidden parent name stays
    # conservative-hidden — the rare-shadowing tradeoff is documented)
    hidden = parent_hidden | _hidden_prop_names(objs, body, hidden_nos)

    def resolver(name: bytes) -> list[Span]:
        return _form_spans(
            objs, xmap.get(name), dec, fonts, depth + 1, nested,
            hidden_nos, hidden,
        )

    mat = _MAT_ID
    mm = _MATRIX_RE.search(body)
    if mm:
        try:
            mat = tuple(float(mm.group(i)) for i in range(1, 7))
        except ValueError:
            pass
    spans = _parse_content(stream, fonts, resolver, hidden)
    if mat == _MAT_ID:
        return spans
    return [Span(*_mat_apply(mat, s.x, s.y), s.text) for s in spans]


# ---------------------------------------------------------------------------
# annotation appearance streams — visible widget/stamp/FreeText text
#
# poppler RENDERS annotation normal appearances when rasterizing (the
# reference therefore OCRs their text, /root/reference/app/jobs.py:386-390);
# a text extractor that reads only the page content stream silently drops
# them. The /AP /N appearance is a Form XObject (PDF 32000-1 §12.5.5), so
# extraction reuses the form machinery; the appearance-to-Rect mapping is
# honored at the engine's established fidelity class (translation only,
# like Tm and the form /Matrix): the BBox lower-left lands on the Rect
# lower-left, under which the form /Matrix translation cancels exactly.
# ---------------------------------------------------------------------------

_ANNOTS_INLINE_RE = re.compile(rb"/Annots\s*\[(.*?)\]", re.S)
_ANNOTS_REF_RE = re.compile(rb"/Annots\s+(\d+)\s+\d+\s+R\b")
_ANNOT_F_RE = re.compile(rb"/F\s+(\d+)\b")
_ANNOT_AS_RE = re.compile(rb"/AS\s*/([^\s/<>\[\]()]+)")
_RECT_RE = re.compile(
    rb"/Rect\s*\[\s*(" + _NUM + rb")\s+(" + _NUM + rb")\s+(" + _NUM
    + rb")\s+(" + _NUM + rb")\s*\]"
)
_BBOX_RE = re.compile(
    rb"/BBox\s*\[\s*(" + _NUM + rb")\s+(" + _NUM + rb")\s+(" + _NUM
    + rb")\s+(" + _NUM + rb")\s*\]"
)
_REF_RE = re.compile(rb"(\d+)\s+\d+\s+R\b")
# annotation flags (PDF 32000-1 Table 165): bit 2 Hidden, bit 6 NoView —
# poppler's renderer skips both, so extraction must too
_ANNOT_INVISIBLE = 0x02 | 0x20


def _balanced_dict(body: bytes, start: int) -> bytes | None:
    """The bytes of the << ... >> dict beginning at/after ``start``
    (balanced nesting; None when unterminated)."""
    open_at = body.find(b"<<", start)
    if open_at < 0:
        return None
    depth = 0
    i = open_at
    while i < len(body) - 1:
        two = body[i : i + 2]
        if two == b"<<":
            depth += 1
            i += 2
        elif two == b">>":
            depth -= 1
            i += 2
            if depth == 0:
                return body[open_at:i]
        else:
            i += 1
    return None


def _annot_n_stream(objs: dict[int, bytes], annot: bytes) -> int | None:
    """Object number of the annotation's selected normal appearance: /AP /N
    as a direct stream ref, or a state subdictionary picked by /AS
    (first state when /AS is absent/unmatched — the visible default)."""
    ap_at = annot.find(b"/AP")
    if ap_at < 0:
        return None
    ap = _balanced_dict(annot, ap_at)
    if ap is None:
        return None
    n_at = ap.find(b"/N")
    if n_at < 0:
        return None
    m = re.match(rb"/N\s+(\d+)\s+\d+\s+R", ap[n_at:])
    if m:
        return int(m.group(1))
    states = _balanced_dict(ap, n_at)
    if states is None:
        return None
    asm = _ANNOT_AS_RE.search(annot)
    if asm:
        sm = re.search(
            rb"/" + re.escape(asm.group(1)) + rb"\s+(\d+)\s+\d+\s+R", states
        )
        if sm:
            return int(sm.group(1))
    first = _REF_RE.search(states)
    return int(first.group(1)) if first else None


def _page_annot_spans(
    objs: dict[int, bytes],
    page_body: bytes,
    dec,
    page_fonts: dict,
    hidden_nos: frozenset[int] = frozenset(),
) -> list["Span"]:
    """Text spans of a page's visible annotation normal appearances, placed
    at their /Rect (reading order then interleaves them with the content
    text by position, exactly like rendered output)."""
    am = _ANNOTS_INLINE_RE.search(page_body)
    if am:
        arr = am.group(1)
    else:
        rm = _ANNOTS_REF_RE.search(page_body)
        if not rm:
            return []
        arr = objs.get(int(rm.group(1)), b"")
    out: list[Span] = []
    for ref in _REF_RE.finditer(arr):
        annot = objs.get(int(ref.group(1)), b"")
        fm = _ANNOT_F_RE.search(annot)
        if fm and int(fm.group(1)) & _ANNOT_INVISIBLE:
            continue
        rm2 = _RECT_RE.search(annot)
        n_no = _annot_n_stream(objs, annot)
        if rm2 is None or n_no is None:
            continue  # no appearance (bare /Link etc.) — nothing rendered
        body = objs.get(n_no, b"")
        bm = _BBOX_RE.search(body)
        if bm is None:
            continue  # appearance streams are form XObjects (require BBox)
        stream = _stream_bytes(body, _obj_dec(dec, n_no), objs)
        if stream is None:
            continue
        fonts = dict(page_fonts)
        fonts.update(_page_fonts(objs, body, dec))
        xmap = _xobject_map(objs, body)
        hidden = _hidden_prop_names(objs, body, hidden_nos)

        def resolver(
            name: bytes, _xmap=xmap, _fonts=fonts, _no=n_no, _h=hidden
        ):
            return _form_spans(
                objs, _xmap.get(name), dec, _fonts, 2, frozenset({_no}),
                hidden_nos, _h,
            )

        try:
            rx1 = min(float(rm2.group(1)), float(rm2.group(3)))
            rx2 = max(float(rm2.group(1)), float(rm2.group(3)))
            ry1 = min(float(rm2.group(2)), float(rm2.group(4)))
            ry2 = max(float(rm2.group(2)), float(rm2.group(4)))
            bx1 = min(float(bm.group(1)), float(bm.group(3)))
            bx2 = max(float(bm.group(1)), float(bm.group(3)))
            by1 = min(float(bm.group(2)), float(bm.group(4)))
            by2 = max(float(bm.group(2)), float(bm.group(4)))
        except ValueError:
            continue
        # appearance-to-Rect mapping (PDF 32000-1 §12.5.5, algorithm 8.1):
        # the BBox corners map through the appearance /Matrix, their
        # bounding box scales + translates onto /Rect. With an identity
        # matrix and equal sizes this is the pure translation it replaces.
        mat = _MAT_ID
        mm2 = _MATRIX_RE.search(body)
        if mm2:
            try:
                mat = tuple(float(mm2.group(i)) for i in range(1, 7))
            except ValueError:
                pass
        corners = [
            _mat_apply(mat, cx, cy)
            for cx in (bx1, bx2)
            for cy in (by1, by2)
        ]
        ax1 = min(p[0] for p in corners)
        ax2 = max(p[0] for p in corners)
        ay1 = min(p[1] for p in corners)
        ay2 = max(p[1] for p in corners)
        sx = (rx2 - rx1) / (ax2 - ax1) if ax2 > ax1 else 1.0
        sy = (ry2 - ry1) / (ay2 - ay1) if ay2 > ay1 else 1.0
        for s in _parse_content(stream, fonts, resolver, hidden):
            px, py = _mat_apply(mat, s.x, s.y)
            out.append(
                Span(rx1 + (px - ax1) * sx, ry1 + (py - ay1) * sy, s.text)
            )
    return out


# ---------------------------------------------------------------------------
# image XObjects — the scanned-page path
#
# The reference's poppler rasterizes EVERY page (text layer or not,
# /root/reference/app/jobs.py:386-390) and the OCR model reads the pixels
# (app/ocr_service.py:160-215); a crawl's scanned PDFs are pages whose only
# content is one big raster image. Here the text layer stays authoritative
# when present (cheaper + byte-exact); pages with NO text operators fall
# back to their drawn image XObjects, which route into the raster/OCR stage
# as pixel pages (operators/pdf_split.py).
# ---------------------------------------------------------------------------

_IMAGE_SUBTYPE_RE = re.compile(rb"/Subtype\s*/Image\b")
_WIDTH_RE = re.compile(rb"/Width\s+(\d+)\b")
_HEIGHT_RE = re.compile(rb"/Height\s+(\d+)\b")
_CSPACE_RE = re.compile(rb"/ColorSpace\s*/([A-Za-z0-9]+)")
# Full /ColorSpace resolution (names, indirect refs, array families —
# §8.6): ICCBased reduces by its /N (poppler's stance when no color
# management is wired), CalGray/CalRGB alias the device spaces, Indexed
# resolves its palette to a 256-entry GRAY lookup at decode time,
# Separation and single-colorant DeviceN evaluate their tint transform
# (functions/pdf_function.py — all four §7.10 function types) into the
# alternate space as a 256-tint gray LUT, and Lab reduces to the L*
# lightness channel — so downstream only ever sees plain DeviceGray
# samples. What remains out (multi-colorant DeviceN, Pattern, an
# unevaluable function) passes through by name and degrades exactly as
# before (image skipped, page extracts what it can).
_CS_NAME_CANON = {
    b"DeviceGray": "DeviceGray", b"G": "DeviceGray",
    b"CalGray": "DeviceGray",
    b"DeviceRGB": "DeviceRGB", b"RGB": "DeviceRGB",
    b"CalRGB": "DeviceRGB",
    b"DeviceCMYK": "DeviceCMYK", b"CMYK": "DeviceCMYK",
    b"I": "Indexed", b"Indexed": "Indexed",
}
_CS_KEY_RE = re.compile(rb"/ColorSpace\s*")
_ICC_N_RE = re.compile(rb"/N\s+(\d+)\b")
_CS_REF_RE = re.compile(rb"^(\d+)\s+\d+\s+R")


def _balanced_array(b: bytes, start: int) -> bytes | None:
    """The balanced ``[...]`` token starting at ``b[start]``."""
    depth = 0
    for j in range(start, len(b)):
        c = b[j : j + 1]
        if c == b"[":
            depth += 1
        elif c == b"]":
            depth -= 1
            if depth == 0:
                return b[start : j + 1]
    return None


def _cs_spec(head: bytes) -> bytes | None:
    """The /ColorSpace value token of an image dict: a name, an indirect
    ref, or a balanced array; None when absent."""
    m = _CS_KEY_RE.search(head)
    if not m:
        return None
    i = m.end()
    if head[i : i + 1] == b"[":
        return _balanced_array(head, i)
    mm = re.match(rb"/[A-Za-z0-9]+|\d+\s+\d+\s+R", head[i:])
    return mm.group(0) if mm else None


def _fn_operand(b: bytes) -> bytes | None:
    """A tint-transform operand: an indirect ref or an inline
    ``<< ... >>`` dict (Types 2/3 are legal inline)."""
    b = b.lstrip()
    m = re.match(rb"\d+\s+\d+\s+R", b)
    if m:
        return m.group(0)
    if b.startswith(b"<<"):
        depth, j = 0, 0
        while j < len(b) - 1:
            if b[j : j + 2] == b"<<":
                depth += 1
                j += 2
            elif b[j : j + 2] == b">>":
                depth -= 1
                j += 2
                if depth == 0:
                    return b[:j]
            else:
                j += 1
    return None


def _next_cs_item(b: bytes) -> tuple[bytes | None, bytes]:
    """(next colorspace-array item token, remainder): a name, a nested
    array, or an indirect ref."""
    b = b.lstrip()
    if b.startswith(b"["):
        tok = _balanced_array(b, 0)
        return (tok, b[len(tok):]) if tok else (None, b"")
    m = re.match(rb"\d+\s+\d+\s+R|/[A-Za-z0-9]+", b)
    if m:
        return m.group(0), b[m.end():]
    return None, b""


def _palette_bytes(b: bytes, resolve) -> bytes | None:
    """An Indexed lookup-table operand: hex string, literal string (with
    PDF escapes), or an indirect stream ref resolved to decoded bytes."""
    b = b.strip()
    if b.startswith(b"<") and not b.startswith(b"<<"):
        j = b.find(b">")
        if j < 0:
            return None
        hx = re.sub(rb"\s+", b"", b[1:j])
        if len(hx) % 2:
            hx += b"0"
        try:
            return bytes.fromhex(hx.decode("ascii"))
        except (ValueError, UnicodeDecodeError):
            return None
    if b.startswith(b"("):
        out = bytearray()
        i, depth = 1, 1
        esc = {0x6E: 10, 0x72: 13, 0x74: 9, 0x62: 8, 0x66: 12}
        while i < len(b) and depth:
            c = b[i]
            if c == 0x5C and i + 1 < len(b):
                nxt = b[i + 1]
                if nxt in esc:
                    out.append(esc[nxt])
                    i += 2
                    continue
                if 0x30 <= nxt <= 0x37:
                    k, val = i + 1, 0
                    while k < len(b) and k < i + 4 and 0x30 <= b[k] <= 0x37:
                        val = val * 8 + (b[k] - 0x30)
                        k += 1
                    out.append(val & 0xFF)
                    i = k
                    continue
                out.append(nxt)
                i += 2
                continue
            if c == 0x28:
                depth += 1
            elif c == 0x29:
                depth -= 1
                if depth == 0:
                    break
            out.append(c)
            i += 1
        return bytes(out)
    m = re.match(rb"(\d+)\s+\d+\s+R", b)
    if m and resolve is not None:
        return resolve(int(m.group(1)))
    return None


def _cmyk_rows_to_gray(raw: bytes, ncomp: int) -> bytes:
    """Per-entry gray reduction: 1 comp identity, 3 comps integer luma,
    4 comps naive CMYK (gray = 255 − min(255, luma(c,m,y) + k) — the
    un-color-managed reduction poppler uses without an ICC engine)."""
    import numpy as np

    a = np.frombuffer(raw, dtype=np.uint8).reshape(-1, ncomp)
    a32 = a.astype(np.uint32)
    if ncomp == 1:
        g = a32[:, 0]
    elif ncomp == 3:
        g = (a32[:, 0] * 299 + a32[:, 1] * 587 + a32[:, 2] * 114) // 1000
    else:
        luma = (a32[:, 0] * 299 + a32[:, 1] * 587 + a32[:, 2] * 114) // 1000
        g = 255 - np.minimum(255, luma + a32[:, 3])
    return g.astype(np.uint8).tobytes()


def _resolve_colorspace(
    spec: bytes | None, obj_body, resolve, depth: int = 0
) -> tuple[str, bytes | None]:
    """→ (canonical colorspace name, gray palette LUT or None). The LUT
    is 256 gray bytes (Indexed palettes reduced through their base and
    padded by repetition) so any sample value maps."""
    if spec is None:
        return "DeviceGray", None
    if depth > 3:
        return "?", None
    spec = spec.strip()
    m = _CS_REF_RE.match(spec)
    if m:
        if obj_body is None:
            return "?", None
        body = obj_body(int(m.group(1))) or b""
        k = body.find(b"[")
        if k != -1:
            arr = _balanced_array(body, k)
            if arr is not None:
                return _resolve_colorspace(arr, obj_body, resolve, depth + 1)
        nm = re.search(rb"/([A-Za-z0-9]+)", body)
        if nm:
            return _resolve_colorspace(
                b"/" + nm.group(1), obj_body, resolve, depth + 1
            )
        return "?", None
    if spec.startswith(b"["):
        inner = spec[1:-1].strip()
        fm = re.match(rb"/([A-Za-z0-9]+)\s*", inner)
        if not fm:
            return "?", None
        fam, rest = fm.group(1), inner[fm.end():]
        if fam == b"ICCBased":
            n = 3
            rm = re.match(rb"(\d+)\s+\d+\s+R", rest.strip())
            if rm and obj_body is not None:
                nm2 = _ICC_N_RE.search(obj_body(int(rm.group(1))) or b"")
                if nm2:
                    n = int(nm2.group(1))
            return (
                {1: "DeviceGray", 3: "DeviceRGB", 4: "DeviceCMYK"}.get(
                    n, "?"
                ),
                None,
            )
        if fam == b"CalRGB":
            return "DeviceRGB", None
        if fam == b"CalGray":
            return "DeviceGray", None
        if fam in (b"Indexed", b"I"):
            base_tok, rest2 = _next_cs_item(rest)
            base, _ = _resolve_colorspace(
                base_tok, obj_body, resolve, depth + 1
            )
            hm = re.match(rb"\s*(\d+)\s*", rest2)
            ncomp = {"DeviceGray": 1, "DeviceRGB": 3, "DeviceCMYK": 4}.get(
                base
            )
            if not hm or ncomp is None:
                return "Indexed", None
            hival = int(hm.group(1))
            if hival > 255:
                return "Indexed", None
            lut_raw = _palette_bytes(rest2[hm.end():], resolve)
            if lut_raw is None:
                return "Indexed", None
            need = (hival + 1) * ncomp
            if len(lut_raw) < need:
                lut_raw = lut_raw + bytes(need - len(lut_raw))
            gray = _cmyk_rows_to_gray(lut_raw[:need], ncomp)
            if len(gray) < 256:  # out-of-range indices clamp to the last
                gray = gray + gray[-1:] * (256 - len(gray))
            return "Indexed", gray
        if fam in (b"Separation", b"DeviceN"):
            # [/Separation /name alt tintFn] — tint samples map through
            # the function into the alternate space (§8.6.6.4), exactly
            # what poppler renders; single-colorant /DeviceN is the same
            # shape. The 256-point tint→gray LUT reduces the alternate
            # components with the same un-color-managed formulas the
            # device spaces use. Multi-colorant DeviceN or an
            # unevaluable function → (name, None) = the old degradation.
            name = fam.decode("latin-1")
            first_tok, rest2 = _next_cs_item(rest)
            if first_tok is None:
                return name, None
            if fam == b"DeviceN":
                if not first_tok.startswith(b"[") or len(
                    re.findall(rb"/[^\s/\[\]<>()]+", first_tok)
                ) != 1:
                    return name, None
            alt_tok, rest3 = _next_cs_item(rest2)
            if alt_tok is None:
                return name, None
            alt, _ = _resolve_colorspace(alt_tok, obj_body, resolve,
                                         depth + 1)
            ncomp = {"DeviceGray": 1, "DeviceRGB": 3,
                     "DeviceCMYK": 4}.get(alt)
            fn_tok = _fn_operand(rest3)
            if ncomp is None or fn_tok is None:
                return name, None
            from gnosis_ocr_spark.functions.pdf_function import (
                eval_table,
                parse_function,
            )

            fn = parse_function(fn_tok, obj_body, resolve)
            tbl = eval_table(fn, 256) if fn is not None else None
            if tbl is None:
                return name, None
            lut = bytearray()
            for outs in tbl:
                if len(outs) < ncomp:
                    return name, None
                lut += bytes(
                    min(255, max(0, round(v * 255))) for v in outs[:ncomp]
                )
            return "Separation", _cmyk_rows_to_gray(bytes(lut), ncomp)
        if fam == b"Lab":
            return "Lab", None
        return fam.decode("latin-1"), None
    if spec.startswith(b"/"):
        nm3 = spec[1:]
        return _CS_NAME_CANON.get(nm3, nm3.decode("latin-1")), None
    return "?", None


def _indexed_to_gray(
    raw: bytes, width: int, height: int, bits: int, lut: bytes
) -> bytes | None:
    """Map packed 1/2/4/8-bit palette indices through the 256-entry gray
    LUT → 8-bit DeviceGray samples; None when the payload is short."""
    import numpy as np

    stride = (width * bits + 7) // 8
    if len(raw) < stride * height:
        return None
    a = np.frombuffer(raw[: stride * height], dtype=np.uint8).reshape(
        height, stride
    )
    if bits == 8:
        idx = a[:, :width]
    else:
        bitsarr = np.unpackbits(a, axis=1)
        d = bits
        vals = bitsarr[:, : width * d].reshape(height, width, d)
        weights = (1 << np.arange(d - 1, -1, -1)).astype(np.uint16)
        idx = (vals.astype(np.uint16) * weights).sum(axis=2)
    lutarr = np.frombuffer(lut, dtype=np.uint8)
    return lutarr[idx].astype(np.uint8).tobytes()
_IMAGEMASK_RE = re.compile(rb"/ImageMask\s+true\b")
# /Decode [1 0] (optionally fractional literals) inverts gray/bilevel
# samples; [0 1] is the identity default
_DECODE_INV_RE = re.compile(
    rb"/Decode\s*\[\s*1(?:\.0*)?\s+0(?:\.0*)?\s*\]"
)
_CCITT_K_RE = re.compile(rb"/K\s+(-?\d+)\b")
_CCITT_COLUMNS_RE = re.compile(rb"/Columns\s+(\d+)\b")
_CCITT_ROWS_RE = re.compile(rb"/Rows\s+(\d+)\b")
_CCITT_BLACKIS1_RE = re.compile(rb"/BlackIs1\s+(true|false)")
_CCITT_ALIGN_RE = re.compile(rb"/EncodedByteAlign\s+(true|false)")
_JBIG2_GLOBALS_RE = re.compile(rb"/JBIG2Globals\s+(\d+)\s+\d+\s+R")
# XOR-0xFF table: inverts every packed field for bits 1/2/4/8 gray
# ((2^n - 1) - v per field == bitwise NOT of the byte)
_INVERT_TABLE = bytes(255 - i for i in range(256))


@dataclass(frozen=True)
class PdfImage:
    """One drawn image XObject. ``codec == 'raw'`` means ``data`` holds fully
    decoded samples (row-major, ``bits``-deep, ``colorspace``); any other
    value names the first opaque filter met (``'dct'`` = DCTDecode/JPEG,
    ``'jpx'``, ``'ccittfax'`` …) and ``data`` is the still-compressed payload
    after the decodable prefix of the chain — opaque bytes + typed metadata.
    Downstream, ``operators/pdf_split._gray_pixels`` decodes ``'dct'``
    payloads in-engine via :mod:`codec_jpeg` (baseline sequential +
    progressive); CCITT G4 / G3 1-D / K>0 mixed 2-D all decode right here
    in the filter chain via :mod:`codec_ccitt`, and JBIG2 — generic
    regions (arithmetic + MMR) AND symbol-coded streams incl. indirect
    /JBIG2Globals — via :mod:`codec_jbig2` (so those arrive as
    ``codec='raw'`` 1-bit); ``'jpx'`` payloads decode downstream via
    :mod:`codec_jpx` (JPEG 2000 — raw or JP2-boxed, multi-tile,
    subsampled, all six code-block styles incl. selective arithmetic
    bypass, POC progression changes, ROI max-shift). Only the JBIG2
    halftone/refinement/Huffman subsets stay opaque."""

    width: int
    height: int
    bits: int
    colorspace: str
    codec: str
    data: bytes


def _decode_image(
    head: bytes, raw: bytes, resolve=None, obj_body=None,
    defer_heavy: bool = False,
) -> PdfImage | None:
    """Shared image-decode core (XObject + inline): dimensions + sample
    metadata from the dict ``head``, filter chain applied to ``raw``
    (opaque codecs carried), /ImageMask + /Decode [1 0] normalized.
    ``resolve`` forwards to :func:`_apply_one_filter` for indirect
    /JBIG2Globals streams and Indexed palette streams; ``obj_body``
    returns raw object bodies for indirect /ColorSpace resolution
    (ICCBased /N, colorspace objects) — both XObject-path only.
    Indexed palettes and raw DeviceCMYK samples reduce to plain 8-bit
    DeviceGray right here, so downstream sees only device spaces."""
    wm, hm = _WIDTH_RE.search(head), _HEIGHT_RE.search(head)
    if not wm or not hm:
        return None
    width, height = int(wm.group(1)), int(hm.group(1))
    bm = _BPC_RE.search(head)
    bits = int(bm.group(1)) if bm else 8
    cspace, pal_gray = _resolve_colorspace(_cs_spec(head), obj_body, resolve)
    if _IMAGEMASK_RE.search(head):
        # stencil mask: 1-bit, no ColorSpace; default /Decode [0 1] paints
        # on 0 samples (≈ black on white) — exactly 1-bit DeviceGray
        bits, cspace = 1, "DeviceGray"
    names, parms = _filter_chain(head)
    for i, (name, parm) in enumerate(zip(names, parms)):
        # r6 (guide §2.5/§8 — heavy work after the respread): when the
        # bilevel entropy codec is the FINAL filter of a plain-DeviceGray
        # XObject, carry it STILL-COMPRESSED with its parms folded into
        # the codec tag — decode happens page-parallel in the fused
        # raster+OCR stage (operators/pdf_split._gray_pixels), exactly
        # like DCT/JPX always did. Previously CCITT/JBIG2 decoded here,
        # i.e. in the SPLIT stage, serializing a skew document's whole
        # fax decode on one task (measured: G3-2D was the single largest
        # split-stage cost). The inline-image path keeps decode-in-place
        # (defer_heavy=False): its EI end-resolution depends on the
        # try-decode, and exotic colorspaces keep the inline reductions.
        if (
            defer_heavy
            and i == len(names) - 1
            and cspace == "DeviceGray"
            and bits == 1  # spec-conformant bilevel only; degenerate
            # heads (e.g. BPC 8 over CCITT) keep the old inline path
            and name in (b"CCITTFaxDecode", b"JBIG2Decode")
            and b"Predictor" not in parm  # predictors post-process the
            # decoded bytes in the old path; don't defer that shape
        ):
            inv = 1 if _DECODE_INV_RE.search(head) else 0
            if name == b"CCITTFaxDecode":
                km = _CCITT_K_RE.search(parm)
                cm = _CCITT_COLUMNS_RE.search(parm)
                rm = _CCITT_ROWS_RE.search(parm)
                bm2 = _CCITT_BLACKIS1_RE.search(parm)
                am = _CCITT_ALIGN_RE.search(parm)
                tag = (
                    f"ccitt;k={int(km.group(1)) if km else 0}"
                    f";c={int(cm.group(1)) if cm else 1728}"
                    f";r={int(rm.group(1)) if rm else 0}"
                    f";b={1 if (bm2 and bm2.group(1) == b'true') else 0}"
                    f";a={1 if (am and am.group(1) == b'true') else 0}"
                    f";i={inv}"
                )
                return PdfImage(width, height, 1, cspace, tag, raw)
            gm = _JBIG2_GLOBALS_RE.search(parm)
            gdata = b""
            if gm:
                if resolve is None:
                    return None  # matches the non-deferred opaque carry
                gdata = resolve(int(gm.group(1)))
                if gdata is None:
                    return None
            payload = (
                struct.pack(">I", len(gdata)) + gdata + raw
            )
            return PdfImage(
                width, height, 1, cspace, f"jbig2;i={inv}", payload
            )
        try:
            decoded = _apply_one_filter(name, parm, raw, resolve)
            if decoded is None:  # opaque image codec: carry bytes + metadata
                codec = name.decode("latin-1")
                if codec.endswith("Decode"):
                    codec = codec[:-6]
                return PdfImage(width, height, bits, cspace, codec.lower(), raw)
            raw = _apply_predictor(parm, decoded)
        except Exception:
            return None
    # /Decode [1 0] sample inversion, normalized here so downstream always
    # sees plain DeviceGray polarity (0 = black); per-field inversion for
    # packed bits 1/2/4/8 is a bytewise NOT
    if cspace == "DeviceGray" and _DECODE_INV_RE.search(head):
        raw = raw.translate(_INVERT_TABLE)
    if cspace == "Indexed" and pal_gray is not None and bits in (1, 2, 4, 8):
        gray = _indexed_to_gray(raw, width, height, bits, pal_gray)
        if gray is not None:
            return PdfImage(width, height, 8, "DeviceGray", "raw", gray)
    if cspace == "Separation" and pal_gray is not None and bits in (1, 2, 4, 8):
        # tint samples span the FULL code range (a 1-bit separation's
        # sample 1 is tint 1.0 — unlike a palette index): pre-expand the
        # 256-tint LUT onto the 2^bits code points, then map like Indexed
        maxc = (1 << bits) - 1
        lut_b = bytes(pal_gray[(i * 255) // maxc] for i in range(maxc + 1))
        lut_b = lut_b + lut_b[-1:] * (256 - len(lut_b))
        gray = _indexed_to_gray(raw, width, height, bits, lut_b)
        if gray is not None:
            return PdfImage(width, height, 8, "DeviceGray", "raw", gray)
    if cspace == "Lab" and bits == 8 and len(raw) >= 3 * width * height:
        # un-color-managed lightness reduction: the 8-bit L* sample under
        # the default /Decode [0 100 ...] maps s → L* = s·100/255 and
        # gray = round(L*·255/100) = s, so channel 0 IS the gray byte
        # (a*/b* chroma dropped — the same stance as the CMYK reduction)
        return PdfImage(
            width, height, 8, "DeviceGray", "raw",
            bytes(raw[: 3 * width * height : 3]),
        )
    if (
        cspace == "DeviceCMYK"
        and bits == 8
        and len(raw) >= 4 * width * height
    ):
        gray = _cmyk_rows_to_gray(raw[: 4 * width * height], 4)
        return PdfImage(width, height, 8, "DeviceGray", "raw", gray)
    if bits == 16 and cspace in ("DeviceGray", "DeviceRGB", "DeviceCMYK"):
        # 16-bit samples (big-endian per §7.4.4.4 conventions): the high
        # byte is the 8-bit reduction — lab-equipment and PNG-derived
        # scans; downstream stays 8-bit only
        ncomp = {"DeviceGray": 1, "DeviceRGB": 3, "DeviceCMYK": 4}[cspace]
        need = 2 * ncomp * width * height
        if len(raw) >= need:
            hi = raw[:need:2]
            if ncomp == 4:
                hi = _cmyk_rows_to_gray(hi, 4)
                return PdfImage(width, height, 8, "DeviceGray", "raw", hi)
            return PdfImage(width, height, 8, cspace, "raw", hi)
    return PdfImage(width, height, bits, cspace, "raw", raw)


def _image_from_obj(
    objs: dict[int, bytes], no: int, dec
) -> PdfImage | None:
    """Decode one /Subtype /Image XObject; None when not an image or the
    decodable part of its filter chain fails."""
    body = objs.get(no, b"")
    if not _IMAGE_SUBTYPE_RE.search(body):
        return None
    sliced = _raw_stream_payload(body, objs)
    if sliced is None:
        return None
    head, raw = sliced
    decrypt = _obj_dec(dec, no)
    if decrypt is not None:
        raw = decrypt(raw)

    def resolve(num: int) -> bytes | None:
        # decoded /JBIG2Globals stream (own object key when encrypted)
        body = objs.get(num)
        if body is None:
            return None
        return _stream_bytes(body, _obj_dec(dec, num), objs)

    return _decode_image(
        head, raw, resolve, lambda n: objs.get(n), defer_heavy=True
    )


# inline images (BI <dict> ID <data> EI — PDF spec §8.9.7): the dict uses
# ABBREVIATED keys/values; normalize to the full names so the shared
# image regexes apply. Order matters where one abbreviation prefixes
# another (/Fl before /F is handled by \b).
_INLINE_ABBREV = (
    (re.compile(rb"/BPC\b"), b"/BitsPerComponent"),
    (re.compile(rb"/CS\b"), b"/ColorSpace"),
    (re.compile(rb"/DP\b"), b"/DecodeParms"),
    (re.compile(rb"/IM\b"), b"/ImageMask"),
    (re.compile(rb"/W\b"), b"/Width"),
    (re.compile(rb"/H\b"), b"/Height"),
    (re.compile(rb"/D\b"), b"/Decode"),
    (re.compile(rb"/F\b"), b"/Filter"),
    (re.compile(rb"/G\b"), b"/DeviceGray"),
    (re.compile(rb"/RGB\b"), b"/DeviceRGB"),
    (re.compile(rb"/CMYK\b"), b"/DeviceCMYK"),
    (re.compile(rb"/AHx\b"), b"/ASCIIHexDecode"),
    (re.compile(rb"/A85\b"), b"/ASCII85Decode"),
    (re.compile(rb"/LZW\b"), b"/LZWDecode"),
    (re.compile(rb"/Fl\b"), b"/FlateDecode"),
    (re.compile(rb"/RL\b"), b"/RunLengthDecode"),
    (re.compile(rb"/CCF\b"), b"/CCITTFaxDecode"),
    (re.compile(rb"/DCT\b"), b"/DCTDecode"),
)
_INLINE_BI_RE = re.compile(rb"\bBI\b")
_INLINE_ID_RE = re.compile(rb"\bID[ \t\r\n]")
_INLINE_EI_RE = re.compile(rb"\s+EI(?=\s|$)")
_INLINE_EI_TOK_RE = re.compile(rb"EI(?=\s|$)")
_INLINE_EI_AFTER_RE = re.compile(rb"\s*EI(?=\s|$)")
_INLINE_WS = b" \t\r\n\x0c\x00"
_CHANNELS_OF = {b"DeviceGray": 1, b"DeviceRGB": 3, b"DeviceCMYK": 4}


@functools.lru_cache(maxsize=4)
def _scan_inline_images(stream: bytes) -> list[tuple[int, int, PdfImage | None]]:
    """Locate every BI..ID..EI inline image; returns (start, end, image).
    Memoized: image-only pages run this scan (which DECODES payloads to
    resolve EI — ~230 ms per JPX image) from both _blank_inline_images and
    _collect_images on the same stream bytes; the cache halves that.
    Consumers treat the returned list as read-only.

    The data's end is NOT regex-delimitable: compressed payloads legally
    contain ``\\s+EI`` byte runs (observed in practice — a naive
    non-greedy match truncates them). Resolution: raw (unfiltered)
    samples have an EXACT length from the dict (W×H×BPC×channels);
    filtered payloads try each candidate ``EI`` position and accept the
    first whose filter chain actually decodes (a truncated Flate/LZW/
    CCITT stream raises; a truncated JPEG is rejected by the missing EOI
    marker). The content stream is already decrypted here."""
    out: list[tuple[int, int, PdfImage | None]] = []
    pos = 0
    while True:
        bi = _INLINE_BI_RE.search(stream, pos)
        if bi is None:
            return out
        idm = _INLINE_ID_RE.search(stream, bi.end())
        if idm is None:
            return out
        head = stream[bi.end() : idm.start()]
        for pat, full in _INLINE_ABBREV:
            head = pat.sub(full, head)
        data_start = idm.end()
        img: PdfImage | None = None
        end = data_start
        names, _ = _filter_chain(head)
        if not names:  # raw samples: exact byte length from the dict
            wm, hm = _WIDTH_RE.search(head), _HEIGHT_RE.search(head)
            bm = _BPC_RE.search(head)
            bits = int(bm.group(1)) if bm else 8
            cm = _CSPACE_RE.search(head)
            ch = _CHANNELS_OF.get(cm.group(1) if cm else b"DeviceGray", 1)
            if _IMAGEMASK_RE.search(head):
                bits = ch = 1
            if wm and hm:
                w_, h_ = int(wm.group(1)), int(hm.group(1))
                if 0 < w_ * h_ <= 50_000_000:
                    need = h_ * ((w_ * bits * ch + 7) // 8)
                    data = stream[data_start : data_start + need]
                    em = _INLINE_EI_AFTER_RE.match(stream, data_start + need)
                    if len(data) == need and em:
                        # dict-exact length confirmed by the EI right after
                        img = _decode_image(head, data)
                        end = em.end()
            if img is None:
                # dict unreliable (length not followed by EI, or missing
                # W/H): skip to the next EI token without trusting data
                em = _INLINE_EI_RE.search(stream, data_start)
                end = em.end() if em else len(stream)
        else:
            # candidate 'EI' tokens (preceded by a whitespace delimiter).
            # Two ambiguities resolved by try-decode: a '\s+EI' byte run
            # INSIDE the payload (false positive), and a payload whose
            # LAST bytes are whitespace-valued (the delimiter run before
            # the real EI then over-trims — so try 1..4 delimiter widths,
            # widest data first).
            first_end = None
            for em in _INLINE_EI_TOK_RE.finditer(stream, data_start + 1):
                if stream[em.start() - 1] not in _INLINE_WS:
                    continue  # 'EI' bytes inside binary data, not a token
                if first_end is None:
                    first_end = em.end()
                de = em.start() - 1
                for _ in range(4):
                    data = stream[data_start:de]
                    cand = _decode_image(head, data)
                    if cand is not None and not (
                        cand.codec == "dct"
                        and not data.endswith(b"\xff\xd9")
                    ):
                        img, end = cand, em.end()
                        break
                    if de - 1 <= data_start or stream[de - 1] not in _INLINE_WS:
                        break
                    de -= 1
                if img is not None:
                    break
            if img is None:
                end = first_end if first_end is not None else len(stream)
        out.append((bi.start(), end, img))
        pos = end


def _blank_inline_images(stream: bytes) -> bytes:
    """Length-preservingly blank BI..EI regions so token scans never read
    image payload bytes as operators (offsets stay valid)."""
    spans = _scan_inline_images(stream)
    if not spans:
        return stream
    buf = bytearray(stream)
    for start, end, _ in spans:
        buf[start:end] = b" " * (end - start)
    return bytes(buf)


def _collect_images(
    objs: dict[int, bytes],
    stream: bytes,
    xmap: dict[bytes, int],
    dec,
    depth: int,
    active: frozenset[int],
) -> list[PdfImage]:
    """Images drawn by ``Do`` (XObjects) AND inline ``BI..ID..EI`` images
    in one content stream, merged in draw order, recursing through Form
    XObjects (depth-capped + cycle-guarded exactly like
    :func:`_form_spans`)."""
    out: list[PdfImage] = []
    if depth > _FORM_MAX_DEPTH:
        return out
    # blank inline-image regions LENGTH-PRESERVINGLY so Do-token offsets
    # still index the original stream, then merge both event kinds by
    # position (draw order matters for strip stacking)
    inline = _scan_inline_images(stream)
    if inline:
        buf = bytearray(stream)
        for start, end, _ in inline:
            buf[start:end] = b" " * (end - start)
        cleaned = bytes(buf)
    else:
        cleaned = stream
    events: list[tuple[int, str, object]] = [
        (start, "inline", img) for start, _, img in inline
    ]
    events += [
        (m.start(), "do", m)
        for m in _TOK_RE.finditer(cleaned)
        if m.group("do")
    ]
    events.sort(key=lambda e: e[0])
    for _, kind, m in events:
        if kind == "inline":
            if m is not None:
                out.append(m)
            continue
        no = xmap.get(m.group("do_name"))
        if no is None or no in active:
            continue
        img = _image_from_obj(objs, no, dec)
        if img is not None:
            out.append(img)
            continue
        body = objs.get(no, b"")
        if not _FORM_SUBTYPE_RE.search(body):
            continue
        fstream = _stream_bytes(body, _obj_dec(dec, no), objs)
        if fstream is None:
            continue
        out.extend(
            _collect_images(
                objs, fstream, _xobject_map(objs, body), dec,
                depth + 1, active | {no},
            )
        )
    return out


def _objects(pdf: bytes, dec: "_StdDecryptor | None" = None) -> dict[int, bytes]:
    """Scan all indirect objects, including those packed inside /ObjStm
    object streams (PDF 1.5 xref-stream era: catalogs/page dicts routinely
    live compressed inside object streams, invisible to a plain obj..endobj
    scan). Number collisions resolve by BYTE POSITION — the later
    definition wins, with ObjStm members adopting their container's
    position. Incrementally updated files (the everywhere real-crawl
    shape: signatures, form fills, Acrobat edits append new object
    versions plus an xref section with /Prev) therefore extract the
    LATEST document version without trusting the xref chain at all —
    the same last-generation semantics a conforming reader derives from
    walking /Prev, but robust to damaged/truncated xrefs. ``dec``
    decrypts ObjStm payloads on encrypted files (objects INSIDE an
    object stream are not separately encrypted, per spec)."""
    pos_of: dict[int, int] = {}
    objs: dict[int, bytes] = {}
    for m in _OBJ_RE.finditer(pdf):
        num = int(m.group(1))
        pos_of[num] = m.start()
        objs[num] = m.group(3)
    for num, body in list(objs.items()):
        if not _OBJSTM_RE.search(body):
            continue
        data = _stream_bytes(
            body,
            (lambda raw, n=num: dec.decrypt_obj(n, raw)) if dec else None,
            objs,
        )
        nm, fm = _N_RE.search(body), _FIRST_RE.search(body)
        if data is None or not nm or not fm:
            continue
        n, first = int(nm.group(1)), int(fm.group(1))
        header = data[:first].split()
        if len(header) < 2 * n:
            continue
        nums = [int(x) for x in header[0 : 2 * n : 2]]
        offs = [int(x) for x in header[1 : 2 * n : 2]]
        bounds = offs[1:] + [len(data) - first]
        stm_pos = pos_of.get(num, 0)
        for mnum, off, end in zip(nums, offs, bounds):
            if pos_of.get(mnum, -1) < stm_pos:
                pos_of[mnum] = stm_pos
                objs[mnum] = data[first + off : first + end]
    return objs


_CATALOG_PAGES_RE = re.compile(rb"/Type\s*/Catalog\b.*?/Pages\s+(\d+)\s+\d+\s+R", re.S)


def _leaf_page_order(objs: dict[int, bytes]) -> list[int]:
    """Ordered leaf /Page object numbers via a DFS of the page TREE — real
    PDFs nest intermediate /Pages nodes (balanced trees for large docs), so
    a flat read of the root /Kids would return internal nodes, not pages.
    Cycle-guarded; root = the catalog's /Pages ref, falling back to the
    first /Pages object, then to bare /Type /Page objects in number order."""
    root = None
    for body in objs.values():
        m = _CATALOG_PAGES_RE.search(body)
        if m:
            root = int(m.group(1))
            break
    if root is None:
        for no, body in objs.items():
            if _PAGES_TYPE_RE.search(body):
                root = no
                break
    leaves: list[int] = []
    seen: set[int] = set()

    # explicit stack: a crafted linear chain of thousands of nested /Pages
    # nodes blew Python's recursion limit (RecursionError is outside the
    # ValueError contract and uncatchable as a parse failure); real trees
    # are shallow but depth must not be attacker-controlled
    stack: list[int] = [root] if root is not None else []
    while stack:
        no = stack.pop()
        if no in seen:
            continue
        seen.add(no)
        body = objs.get(no, b"")
        if _PAGES_TYPE_RE.search(body):
            m = _KIDS_RE.search(body)
            if m:
                kids = [
                    int(k) for k in re.findall(rb"(\d+)\s+\d+\s+R", m.group(1))
                ]
                stack.extend(reversed(kids))  # preserve DFS left-to-right
        elif _PAGE_TYPE_RE.search(body):
            leaves.append(no)
    if not leaves:  # no usable tree: /Type /Page objects in file order
        leaves = sorted(no for no, b in objs.items() if _PAGE_TYPE_RE.search(b))
    return leaves


_COUNT_RE = re.compile(rb"/Count\s+(\d+)\b")


def page_count(pdf: bytes) -> int:
    """U1 PDF probe: number of pages (reference analog: pdfinfo 'Pages').

    Counts DFS leaves of the page tree; for damaged/truncated files whose
    /Kids reference missing objects (the walk then yields FEWER leaves than
    the document declares) the root /Pages node's /Count acts as a floor —
    max(leaves, root /Count) — so partial trees don't silently under-report
    (round-3 advice)."""
    if not is_pdf(pdf):
        raise ValueError("not a PDF")
    objs = _objects(pdf, _decryptor_for(pdf))
    leaves = len(_leaf_page_order(objs))
    root_count = 0
    for body in objs.values():
        m = _CATALOG_PAGES_RE.search(body)
        if m:
            cm = _COUNT_RE.search(objs.get(int(m.group(1)), b""))
            if cm:
                root_count = int(cm.group(1))
            break
    return max(leaves, root_count)


def extract_pages(
    pdf: bytes, first_page: int = 1, last_page: int | None = None
) -> list[list[Span]]:
    """Return positioned text spans for pages [first_page, last_page] (1-based).

    The page-range pushdown mirrors the reference's poppler call
    (first_page/last_page, /root/reference/app/jobs.py:386-390) — only the
    requested window is parsed, bounding memory exactly like its 10-page jobs.
    """
    return [spans for spans, _ in extract_pages_with_images(pdf, first_page, last_page)]


_ROTATE_RE = re.compile(rb"/Rotate\s+(-?\d+)\b")
_PARENT_RE = re.compile(rb"/Parent\s+(\d+)\s+\d+\s+R")


def _page_rotation(objs: dict[int, bytes], page_body: bytes) -> int:
    """Effective /Rotate for a page (PDF 32000-1 §7.7.3.3/.4: an
    INHERITABLE page attribute — absent on the page, the /Parent chain
    supplies it). Returns 0/90/180/270; non-multiples degrade to 0."""
    body = page_body
    for _ in range(8):  # depth-capped parent walk (cycle-safe)
        m = _ROTATE_RE.search(body)
        if m:
            rot = int(m.group(1)) % 360
            return rot if rot in (90, 180, 270) else 0
        pm = _PARENT_RE.search(body)
        if not pm:
            return 0
        body = objs.get(int(pm.group(1)), b"")
    return 0


def _rotate_spans(spans: list[Span], rot: int) -> list[Span]:
    """Map spans from page space into DISPLAY space for a /Rotate page —
    the orientation poppler renders (and the reference OCRs,
    ref app/jobs.py:386-390), so reading-order reconstruction sees the
    text the way a human does. Only relative order matters downstream,
    so the constant MediaBox offset of the spec transform is dropped:
    90° (clockwise display) maps (x, y) → (y, −x); 180 → (−x, −y);
    270 → (−y, x)."""
    if rot == 90:
        return [Span(s.y, -s.x, s.text) for s in spans]
    if rot == 180:
        return [Span(-s.x, -s.y, s.text) for s in spans]
    if rot == 270:
        return [Span(-s.y, s.x, s.text) for s in spans]
    return spans


def extract_pages_with_images(
    pdf: bytes,
    first_page: int = 1,
    last_page: int | None = None,
    with_rotation: bool = False,
):
    """(spans, images) per page in the window — (spans, images, rotate)
    triples with ``with_rotation`` (the split stage needs the page's
    effective /Rotate to orient image-only pages for OCR; text spans are
    already normalized into display space here). The text layer is
    authoritative: images are collected ONLY for pages with zero text spans
    (the scanned-page shape), so text documents pay no image-parse cost. The
    reference rasterizes every page regardless (poppler,
    /root/reference/app/jobs.py:386-390); here the rendered-text path covers
    that case byte-exactly and this fallback covers image-only pages."""
    if not is_pdf(pdf):
        raise ValueError("not a PDF")
    dec = _decryptor_for(pdf)
    objs = _objects(pdf, dec)
    kid_order = _leaf_page_order(objs)
    if last_page is None:
        last_page = len(kid_order)
    hidden_nos = _hidden_ocgs(objs)
    font_cache: dict = {}  # per-document: shared fonts parse once, not per page
    pages: list = []
    for page_obj_no in kid_order[first_page - 1 : last_page]:
        body = objs.get(page_obj_no, b"")
        content_nos: list[int] = []
        am = _CONTENTS_ARR_RE.search(body)
        if am:
            content_nos = [
                int(x) for x in re.findall(rb"(\d+)\s+\d+\s+R", am.group(1))
            ]
        else:
            cm = _CONTENTS_ONE_RE.search(body)
            if cm:
                content_nos = [int(cm.group(1))]
        # multiple content streams concatenate in array order (PDF spec:
        # they form ONE logical stream — graphics state carries across)
        parts = []
        for no in content_nos:
            stream = _stream_bytes(
                objs.get(no, b""),
                (lambda raw, n=no: dec.decrypt_obj(n, raw)) if dec else None,
                objs,
            )
            if stream is not None:
                parts.append(stream)
        fonts = _page_fonts(objs, body, dec, cache=font_cache)
        xmap = _xobject_map(objs, body)
        hidden = _hidden_prop_names(objs, body, hidden_nos)

        def resolver(
            name: bytes, _xmap=xmap, _fonts=fonts, _h=hidden
        ) -> list[Span]:
            return _form_spans(
                objs, _xmap.get(name), dec, _fonts, 1, frozenset(),
                hidden_nos, _h,
            )

        spans = (
            _parse_content(b"\n".join(parts), fonts, resolver, hidden)
            if parts
            else []
        )
        # visible annotation appearances render on top of the page (poppler
        # draws them before the reference OCRs the raster) — their text
        # joins the span set and sorts into reading order by position
        spans = spans + _page_annot_spans(objs, body, dec, fonts, hidden_nos)
        # /Rotate pages (landscape scans, fax imports) read in DISPLAY
        # orientation; annots rotate with the page, so transform after merge
        rot = _page_rotation(objs, body)
        if rot and spans:
            spans = _rotate_spans(spans, rot)
        images: list[PdfImage] = []
        if not spans and parts:
            images = _collect_images(
                objs, b"\n".join(parts), xmap, dec, 1, frozenset()
            )
        pages.append((spans, images, rot) if with_rotation else (spans, images))
    return pages


_LENGTH_DIRECT_RE = re.compile(rb"/Length\s+(\d+)(?!\s+\d+\s+R)\b")
_LENGTH_INDIRECT_RE = re.compile(rb"/Length\s+(\d+)\s+\d+\s+R")
# /Filter: one name or an array of names (chains apply left-to-right);
# /DecodeParms: one dict, or an array of dicts/nulls parallel to the chain
_FILTER_RE = re.compile(rb"/Filter\s*(\[[^\]]*\]|/[A-Za-z0-9]+)")
_FILTER_NAME_RE = re.compile(rb"/([A-Za-z0-9]+)")
_DECODEPARMS_RE = re.compile(
    rb"/DecodeParms\s*(\[(?:[^\[\]]|<<[^>]*>>)*\]|<<[^>]*>>|null)", re.S
)
_PARMS_ENTRY_RE = re.compile(rb"<<[^>]*>>|null")
_PREDICTOR_RE = re.compile(rb"/Predictor\s+(\d+)\b")
_COLUMNS_RE = re.compile(rb"/Columns\s+(\d+)\b")
_COLORS_RE = re.compile(rb"/Colors\s+(\d+)\b")
_BPC_RE = re.compile(rb"/BitsPerComponent\s+(\d+)\b")
_EARLYCHANGE_RE = re.compile(rb"/EarlyChange\s+(\d+)\b")

# hostile-input bound for any single decoded PDF stream (content, image,
# ObjStm, …): far above every legitimate stream at this engine's page and
# MAX_PIXELS bounds, low enough that a crafted deflate/LZW bomb fails
# loudly instead of exhausting an executor.
MAX_STREAM_BYTES = 1 << 28  # 256 MiB


def _png_unpredict(data: bytes, columns: int, colors: int, bpc: int) -> bytes:
    """Undo PNG row predictors (PDF 32000-1 §7.4.4.4, /Predictor ≥ 10): each
    row is one filter-type byte + filtered bytes; filters 0-4 = None, Sub,
    Up, Average, Paeth. Xref streams are near-universally Predictor-12-coded
    in the wild; ObjStm/content streams occasionally too."""
    bpp = max(1, (colors * bpc + 7) // 8)
    rowlen = (colors * bpc * columns + 7) // 8
    out = bytearray()
    prev = bytearray(rowlen)
    pos = 0
    while pos + 1 <= len(data):
        ftype = data[pos]
        row = bytearray(data[pos + 1 : pos + 1 + rowlen])
        pos += 1 + rowlen
        if ftype == 1:  # Sub
            for i in range(bpp, len(row)):
                row[i] = (row[i] + row[i - bpp]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(len(row)):
                row[i] = (row[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(len(row)):
                left = row[i - bpp] if i >= bpp else 0
                row[i] = (row[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(len(row)):
                a = row[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                row[i] = (row[i] + pred) & 0xFF
        out += row
        prev = row
    return bytes(out)


def _ascii_hex_decode(data: bytes) -> bytes:
    """/ASCIIHexDecode (PDF 32000-1 §7.4.2): hex pairs up to the '>' EOD,
    whitespace ignored, odd final digit padded with 0."""
    end = data.find(b">")
    if end >= 0:
        data = data[:end]
    hx = re.sub(rb"\s+", b"", data)
    if re.search(rb"[^0-9A-Fa-f]", hx):
        raise ValueError("non-hex byte in ASCIIHexDecode data")
    if len(hx) % 2:
        hx += b"0"
    return bytes.fromhex(hx.decode("ascii"))


def _ascii85_decode(data: bytes) -> bytes:
    """/ASCII85Decode (§7.4.3): base-85 groups of 5 chars → 4 bytes, 'z' =
    four zero bytes, '~>' EOD, partial final group allowed, optional '<~'
    lead-in (Adobe framing)."""
    end = data.find(b"~>")
    if end >= 0:
        data = data[:end]
    data = re.sub(rb"\s+", b"", data)
    if data.startswith(b"<~"):
        data = data[2:]
    out = bytearray()
    group: list[int] = []
    for b in data:
        if b == 0x7A:  # 'z'
            if group:
                raise ValueError("'z' inside an ASCII85 group")
            out += b"\x00\x00\x00\x00"
            continue
        if not (0x21 <= b <= 0x75):
            raise ValueError(f"byte {b:#x} out of ASCII85 range")
        group.append(b - 0x21)
        if len(group) == 5:
            n = 0
            for d in group:
                n = n * 85 + d
            out += n.to_bytes(4, "big")
            group = []
    if group:
        if len(group) == 1:
            raise ValueError("1-char final ASCII85 group")
        pad = 5 - len(group)
        n = 0
        for d in group + [84] * pad:  # pad with 'u' (84)
            n = n * 85 + d
        out += n.to_bytes(4, "big")[: 4 - pad]
    return bytes(out)


def _rle_decode(data: bytes) -> bytes:
    """/RunLengthDecode (§7.4.5): length byte L — L ≤ 127 copies the next
    L+1 bytes literally; L ≥ 129 repeats the next byte 257−L times; 128 =
    EOD."""
    out = bytearray()
    i = 0
    while i < len(data):
        length = data[i]
        if length == 128:
            break
        if length <= 127:
            out += data[i + 1 : i + 2 + length]
            i += 2 + length
        else:
            out += data[i + 1 : i + 2] * (257 - length)
            i += 2
    return bytes(out)


def _lzw_decode(
    data: bytes, early_change: int = 1, max_out: int | None = None
) -> bytes:
    """/LZWDecode (§7.4.4): MSB-first variable-width codes 9→12 bits,
    256 = clear table, 257 = EOD; PDF's /EarlyChange (default 1) widens the
    code size one entry before the table fills (TIFF-style). ``max_out``
    bounds the decoded size (LZW expands up to O(codes²), so a small
    hostile payload can otherwise allocate unbounded memory — same
    rationale as codec_jpeg.MAX_PIXELS); callers that know the expected
    size (TIFF strips) pass it."""
    out = bytearray()
    table: list[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    width = 9
    prev: bytes | None = None
    acc = nbits = 0
    for byte in data:
        acc = (acc << 8) | byte
        nbits += 8
        while nbits >= width:
            nbits -= width
            code = (acc >> nbits) & ((1 << width) - 1)
            if code == 256:
                table = [bytes([i]) for i in range(256)] + [b"", b""]
                width = 9
                prev = None
                continue
            if code == 257:
                return bytes(out)
            if prev is None:
                if code >= len(table):
                    raise ValueError("bad first LZW code")
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            elif code == len(table):
                entry = prev + prev[:1]
                table.append(entry)
            else:
                raise ValueError("LZW code beyond table")
            out += entry
            prev = entry
            if max_out is not None and len(out) > max_out:
                raise ValueError("LZW output exceeds declared bound")
            if len(table) + early_change >= (1 << width) and width < 12:
                width += 1
    return bytes(out)


def _apply_predictor(parms: bytes, data: bytes) -> bytes:
    """Undo /DecodeParms predictors after Flate/LZW: PNG filters
    (/Predictor ≥ 10, the xref-stream norm) via :func:`_png_unpredict`;
    TIFF horizontal differencing (/Predictor 2, 8-bit components only —
    other depths are vanishingly rare in crawl PDFs and raise)."""
    pm = _PREDICTOR_RE.search(parms)
    if not pm:
        return data
    pred = int(pm.group(1))
    if pred <= 1:
        return data
    cm = _COLUMNS_RE.search(parms)
    clm = _COLORS_RE.search(parms)
    bm = _BPC_RE.search(parms)
    columns = int(cm.group(1)) if cm else 1
    colors = int(clm.group(1)) if clm else 1
    bpc = int(bm.group(1)) if bm else 8
    if pred >= 10:
        return _png_unpredict(data, columns, colors, bpc)
    if pred == 2:
        if bpc != 8:
            raise ValueError(f"TIFF predictor with {bpc}-bit components")
        rowlen = columns * colors
        row_buf = bytearray(data)
        for r0 in range(0, len(row_buf), rowlen):
            row_end = min(r0 + rowlen, len(row_buf))
            for i in range(r0 + colors, row_end):
                row_buf[i] = (row_buf[i] + row_buf[i - colors]) & 0xFF
        return bytes(row_buf)
    raise ValueError(f"unknown /Predictor {pred}")


def _filter_chain(head: bytes) -> tuple[list[bytes], list[bytes]]:
    """Parse the stream dict head: ordered /Filter names + parallel
    /DecodeParms entries ('' where the entry is null/absent)."""
    fm = _FILTER_RE.search(head)
    if not fm:
        return [], []
    spec = fm.group(1)
    names = [m.group(1) for m in _FILTER_NAME_RE.finditer(spec)]
    parms: list[bytes] = []
    pmatch = _DECODEPARMS_RE.search(head)
    if pmatch:
        pspec = pmatch.group(1)
        if pspec.startswith(b"["):
            parms = [
                b"" if e == b"null" else e
                for e in _PARMS_ENTRY_RE.findall(pspec)
            ]
        elif pspec != b"null":
            parms = [pspec]
    parms += [b""] * (len(names) - len(parms))
    return names, parms


def _stream_bytes(
    content_body: bytes, decrypt=None, objs: dict[int, bytes] | None = None
) -> bytes | None:
    """Extract and decode one stream through its full /Filter chain.

    /Length slices the exact byte span (compressed data can contain the
    literal 'endstream'); indirect /Length refs (``/Length 5 0 R`` — very
    common in generator output) resolve through ``objs`` when provided,
    else fall back to the endstream regex. ``decrypt`` (per-object RC4,
    encrypted files) applies to the raw span BEFORE filters. Filters apply
    in declaration order — FlateDecode, LZWDecode (with /EarlyChange),
    ASCIIHexDecode, ASCII85Decode, RunLengthDecode — each with its parallel
    /DecodeParms entry (PNG + TIFF predictors). Unknown filters (DCTDecode,
    CCITTFaxDecode … = image codecs that never carry text operators) and any
    decode failure return None, the standard parse-failure sentinel."""
    sliced = _raw_stream_payload(content_body, objs)
    if sliced is None:
        return None
    head, raw = sliced
    if decrypt is not None:
        raw = decrypt(raw)
    names, parms = _filter_chain(head)
    for name, parm in zip(names, parms):
        try:
            decoded = _apply_one_filter(name, parm, raw)
            if decoded is None:  # unknown filter (image codec)
                return None
            raw = _apply_predictor(parm, decoded)
        except Exception:
            return None
    return raw


def _raw_stream_payload(
    content_body: bytes, objs: dict[int, bytes] | None = None
) -> tuple[bytes, bytes] | None:
    """(dict head, exact raw stream span) before decryption/filters — the
    slicing half of :func:`_stream_bytes`, shared with the image-XObject
    path (which must stop at opaque filters instead of bailing)."""
    marker = content_body.find(b"stream")
    if marker < 0:
        return None
    start = marker + len(b"stream")
    if content_body[start : start + 2] == b"\r\n":
        start += 2
    elif content_body[start : start + 1] == b"\n":
        start += 1
    head = content_body[:marker]
    raw: bytes | None = None
    lm = _LENGTH_DIRECT_RE.search(head)
    if lm:
        raw = content_body[start : start + int(lm.group(1))]
    else:
        im = _LENGTH_INDIRECT_RE.search(head)
        if im and objs is not None:
            ref_body = objs.get(int(im.group(1)), b"")
            nm = re.match(rb"\s*(\d+)\s*$", ref_body)
            if nm:
                raw = content_body[start : start + int(nm.group(1))]
    if raw is None:
        sm = _STREAM_RE.search(content_body)
        if not sm:
            return None
        raw = sm.group(1)
    return head, raw


def _apply_one_filter(
    name: bytes, parm: bytes, raw: bytes, resolve=None
) -> bytes | None:
    """Decode one /Filter step; None marks an unknown (opaque image) codec.
    Raises on malformed data — callers map that to their failure sentinel.
    ``resolve`` (object number → decoded stream bytes or None) lets
    /JBIG2Decode fetch its indirect /JBIG2Globals stream — only the image
    path supplies it; content streams never carry image codecs."""
    if name == b"FlateDecode":
        import zlib

        # bounded inflate: a crawl PDF can hide a deflate bomb in any
        # stream (tiny /Length, GB expansion). MAX_STREAM_BYTES is far
        # above any legitimate content/image stream at this engine's
        # page/pixel bounds; past it we fail loudly instead of letting
        # a hostile doc MemoryError the executor (codec_jpeg.MAX_PIXELS
        # rationale). Semantics otherwise preserved exactly from
        # zlib.decompress: truncated stream raises (not dec.eof —
        # unconsumed_tail alone misses bombs that pause at a symbol
        # boundary, e.g. stored blocks); trailing garbage is tolerated.
        dec = zlib.decompressobj()
        out = dec.decompress(raw, MAX_STREAM_BYTES)
        if dec.unconsumed_tail:
            raise ValueError("FlateDecode output exceeds stream bound")
        if not dec.eof:
            raise ValueError("FlateDecode stream truncated")
        return out
    if name == b"LZWDecode":
        em = _EARLYCHANGE_RE.search(parm)
        return _lzw_decode(
            raw, int(em.group(1)) if em else 1, max_out=MAX_STREAM_BYTES
        )
    if name == b"ASCIIHexDecode":
        return _ascii_hex_decode(raw)
    if name == b"ASCII85Decode":
        return _ascii85_decode(raw)
    if name == b"RunLengthDecode":
        return _rle_decode(raw)
    if name == b"Crypt":  # identity /Crypt only; else unknown
        return raw
    if name == b"CCITTFaxDecode":
        km = _CCITT_K_RE.search(parm)
        k = int(km.group(1)) if km else 0
        cm = _CCITT_COLUMNS_RE.search(parm)
        columns = int(cm.group(1)) if cm else 1728
        rm = _CCITT_ROWS_RE.search(parm)
        rows = int(rm.group(1)) if rm else 0
        bm = _CCITT_BLACKIS1_RE.search(parm)
        black_is_1 = bool(bm) and bm.group(1) == b"true"
        am = _CCITT_ALIGN_RE.search(parm)
        align = bool(am) and am.group(1) == b"true"
        from gnosis_ocr_spark.functions.codec_ccitt import (
            decode_g3_1d,
            decode_g3_2d,
            decode_g4,
        )

        if k < 0:  # pure 2-D MMR (ITU-T T.6) — the dominant PDF case
            return decode_g4(raw, columns, rows, black_is_1, align)
        if k == 0:  # 1-D MH (ITU-T T.4)
            return decode_g3_1d(raw, columns, rows, black_is_1, align)
        # mixed 2-D G3 (K>0, T.4 §4.2.1): EOL+tag-bit per line
        return decode_g3_2d(raw, columns, rows, black_is_1, align)
    if name == b"JBIG2Decode":
        globals_data = b""
        gm = _JBIG2_GLOBALS_RE.search(parm)
        if gm:
            # symbol state shared across pages lives in an indirect
            # /JBIG2Globals stream; resolvable only from the image path
            # (which supplies ``resolve``) — else carry opaque
            if resolve is None:
                return None
            globals_data = resolve(int(gm.group(1)))
            if globals_data is None:
                return None
        from gnosis_ocr_spark.functions.codec_jbig2 import decode_jbig2

        try:
            # generic regions (arithmetic + MMR) AND symbol-coded streams
            # (symbol dictionary + text region, the jbig2enc shape) decode
            # in-engine (ITU-T T.88); halftone/refinement/Huffman subsets
            # and malformed segment structure raise → opaque carry
            return decode_jbig2(raw, globals_data)[2]
        except Exception:
            return None
    return None


def _parse_content(
    stream: bytes,
    fonts: dict[bytes, tuple[int, list[str] | dict[int, str]]] | None = None,
    xobj=None,
    hidden: frozenset[bytes] = frozenset(),
) -> list[Span]:
    stream = _blank_inline_images(stream)
    fonts = fonts or {}
    cur: tuple[int, list[str] | dict[int, str]] | None = None  # Tf-selected

    def dec(s: str) -> str:
        if cur is None:
            return s
        width, mapping = cur
        if width == 2:
            if mapping == "utf16be":
                # predefined Uni*-UCS2/UTF16 CMap: codes are Unicode code
                # units (surrogate pairs decode; odd tail → U+FFFD)
                return s.encode("latin-1", "replace").decode(
                    "utf-16-be", "replace"
                )
            if isinstance(mapping, tuple) and mapping[0] == "charset":
                # legacy predefined CMap (GBK-EUC-H, 90ms-RKSJ-H, …): the
                # bytes are the legacy charset; its codec handles the
                # 1/2-byte code structure (malformed sequences → U+FFFD)
                return s.encode("latin-1", "replace").decode(
                    mapping[1], "replace"
                )
            # composite Identity-H: consume 2-byte CIDs (odd tail ignored)
            out = []
            for i in range(0, len(s) - 1, 2):
                cid = (ord(s[i]) << 8) | ord(s[i + 1])
                out.append(mapping.get(cid, "�"))
            return "".join(out)
        return "".join(mapping[ord(c)] if ord(c) < 256 else c for c in s)

    # Full affine tracking (PDF 32000-1 §9.4.2): the text LINE matrix Tlm
    # composes Tm/Td/TD/T* and the CTM composes q/Q/cm, so rotated or
    # scaled text blocks (landscape scans, margin stamps, cm-positioned
    # layout — the LibreOffice/InDesign shape) land at their TRUE page
    # coordinates instead of collapsing onto untransformed offsets.
    # Glyph-level advances (Tz/Ts/per-glyph widths) stay out of scope:
    # spans are positioned at their line origin, the established fidelity.
    tlm = _MAT_ID
    ctm = _MAT_ID
    ctm_stack: list[tuple[float, ...]] = []
    leading = 0.0
    spans: list[Span] = []
    # /ActualText marked content (§14.9.4): the OUTERMOST region's
    # replacement text substitutes for everything it encloses — poppler's
    # TextOutputDev behavior for ligatures/hyphenation/dropcaps. State:
    # nesting depth of open marked-content regions, the depth at which
    # the active ActualText region opened, its text, and the position of
    # the first suppressed show (where the replacement lands).
    mc_depth = 0
    at_depth: int | None = None
    at_text = ""
    at_pos: tuple[float, float] | None = None
    # optional content (§8.11): an `/OC /name BDC` region whose name
    # resolves to an OFF-by-default OCG is invisible — a conforming
    # viewer (and poppler's rasterizer) never draws it, so it must not
    # extract. ``hide_depth`` marks the outermost hidden region.
    hide_depth: int | None = None

    def origin() -> tuple[float, float]:
        m = _mat_mul(tlm, ctm)
        return (m[4], m[5])

    def emit(text: str) -> None:
        nonlocal at_pos
        if hide_depth is not None:
            return  # inside a hidden optional-content layer
        ox, oy = origin()
        if at_depth is not None:
            if at_pos is None:
                at_pos = (ox, oy)
            return  # enclosed content is replaced by the ActualText
        spans.append(Span(ox, oy, text))

    for m in _TOK_RE.finditer(stream):
        if m.group("bt"):
            # BT resets the text matrix to identity
            tlm = _MAT_ID
        elif m.group("tf"):
            cur = fonts.get(m.group("tf_f"))
        elif m.group("tm"):
            # a b c d e f Tm: absolute text (line) matrix
            try:
                tlm = (
                    float(m.group("tm_a")),
                    float(m.group("tm_b")),
                    float(m.group("tm_c")),
                    float(m.group("tm_d")),
                    float(m.group("tm_e")),
                    float(m.group("tm_f")),
                )
            except ValueError:
                pass
        elif m.group("cm"):
            # a b c d e f cm: premultiplies the CTM
            try:
                ctm = _mat_mul(
                    (
                        float(m.group("cm_a")),
                        float(m.group("cm_b")),
                        float(m.group("cm_c")),
                        float(m.group("cm_d")),
                        float(m.group("cm_e")),
                        float(m.group("cm_f")),
                    ),
                    ctm,
                )
            except ValueError:
                pass
        elif m.group("push"):
            ctm_stack.append(ctm)
        elif m.group("pop"):
            # unbalanced Q degrades to the initial state, never raises
            ctm = ctm_stack.pop() if ctm_stack else _MAT_ID
        elif m.group("bdc") or m.group("bmc"):
            mc_depth += 1
            prop = m.group("bdc_prop") if m.group("bdc") else None
            if (
                hide_depth is None
                and prop is not None
                and m.group("bdc_tag") == b"OC"
                and prop in hidden
            ):
                hide_depth = mc_depth
            pd = m.group("bdc_dict") if m.group("bdc") else None
            if pd is not None and at_depth is None and hide_depth is None:
                am = _ACTUALTEXT_RE.search(pd)
                if am:
                    raw = (
                        _unesc(am.group("lit").decode("latin-1"))
                        if am.group("lit") is not None
                        else _unhex_str(am.group("hex"))
                    )
                    at_depth, at_text, at_pos = (
                        mc_depth, _pdf_text_string(raw), None,
                    )
        elif m.group("emc"):
            if hide_depth is not None:
                if mc_depth == hide_depth:
                    hide_depth = None
            elif at_depth is not None and mc_depth == at_depth:
                ox, oy = at_pos if at_pos is not None else origin()
                at_depth = None
                spans.append(Span(ox, oy, at_text))
            mc_depth = max(0, mc_depth - 1)
        elif m.group("td"):
            # Td/TD move the line origin IN TEXT SPACE (they compose with
            # any rotation/scale in Tlm); TD also sets the leading to -ty
            tx, ty = float(m.group("td_x")), float(m.group("td_y"))
            tlm = _mat_mul((1.0, 0.0, 0.0, 1.0, tx, ty), tlm)
            if m.group("td_op") == b"TD":
                leading = -ty
        elif m.group("tl"):
            leading = float(m.group("tl_v"))
        elif m.group("tstar"):
            tlm = _mat_mul((1.0, 0.0, 0.0, 1.0, 0.0, -leading), tlm)
        elif m.group("tj"):
            emit(dec(_unesc(m.group("tj_s").decode("latin-1"))))
        elif m.group("tjx"):
            emit(dec(_unhex_str(m.group("tjx_s"))))
        elif m.group("quote"):
            # ' = T* then show
            tlm = _mat_mul((1.0, 0.0, 0.0, 1.0, 0.0, -leading), tlm)
            emit(dec(_unesc(m.group("quote_s").decode("latin-1"))))
        elif m.group("quotex"):
            tlm = _mat_mul((1.0, 0.0, 0.0, 1.0, 0.0, -leading), tlm)
            emit(dec(_unhex_str(m.group("quotex_s"))))
        elif m.group("dquote"):
            # aw ac (s) " = set word/char spacing (no positional effect on
            # span extraction), T*, then show
            tlm = _mat_mul((1.0, 0.0, 0.0, 1.0, 0.0, -leading), tlm)
            emit(dec(_unesc(m.group("dquote_s").decode("latin-1"))))
        elif m.group("dquotex"):
            tlm = _mat_mul((1.0, 0.0, 0.0, 1.0, 0.0, -leading), tlm)
            emit(dec(_unhex_str(m.group("dquotex_s"))))
        elif m.group("tja"):
            # strings decode per-item (2-byte CID alignment is per string);
            # numeric adjustments ≤ -TJ_SPACE_KERN read as word gaps
            parts = []
            for sm in _TJA_ITEM_RE.finditer(m.group("tja_s")):
                if sm.group(1) is not None:
                    parts.append(dec(_unesc(sm.group(1).decode("latin-1"))))
                elif sm.group(2) is not None:
                    parts.append(dec(_unhex_str(sm.group(2))))
                elif float(sm.group(3)) <= -TJ_SPACE_KERN:
                    parts.append(" ")
            emit("".join(parts))
        elif m.group("do") and xobj is not None:
            if hide_depth is not None:
                continue  # whole invocation sits in a hidden layer
            # form XObject invocation — spans come back in FORM space (the
            # form /Matrix already applied by the resolver); the CTM in
            # effect at the Do maps them into page space
            got = xobj(m.group("do_name"))
            if ctm != _MAT_ID:
                got = [
                    Span(*_mat_apply(ctm, s.x, s.y), s.text) for s in got
                ]
            if at_depth is not None:
                # enclosed by an ActualText region: replaced content
                if at_pos is None and got:
                    at_pos = (got[0].x, got[0].y)
            else:
                spans.extend(got)
    return spans


def page_text(spans: list[Span], row_quantum: float = 4.0) -> str:
    """Reading-order reconstruction of one page (U8 core, pure function).

    Spans are grouped into rows by quantized ``y`` (PDF y grows upward, so
    reading order is descending y), rows sorted top-to-bottom, spans within a
    row left-to-right by ``x``; rows join with \\n, same-row spans with a space.
    """
    if not spans:
        return ""
    keyed = sorted(
        spans, key=lambda s: (-round(s.y / row_quantum), s.x)
    )
    rows: list[list[Span]] = []
    last_row_key: float | None = None
    for s in keyed:
        rk = round(s.y / row_quantum)
        if last_row_key is None or rk != last_row_key:
            rows.append([])
            last_row_key = rk
        rows[-1].append(s)
    return "\n".join(" ".join(s.text for s in row) for row in rows)
