"""PDF function objects (ISO 32000-1 §7.10) — pdf_function unit battery:
all four function types against hand-computed values, the full Type 4
calculator operator set, hostile-input bounds, and the Separation /
DeviceN / Lab colorspace reductions they feed (codec_pdf)."""

from __future__ import annotations

import math

import pytest

from gnosis_ocr_spark.functions.pdf_function import (
    PdfFunction,
    eval_function,
    eval_table,
    parse_function,
)


def _mk(spec: bytes, objs: dict[int, bytes] | None = None,
        streams: dict[int, bytes] | None = None):
    ob = (objs or {}).get
    rv = (streams or {}).get
    return parse_function(spec, ob, rv)


# ---------------------------------------------------------------- Type 2


def test_type2_exponential_values():
    fn = _mk(b"<< /FunctionType 2 /Domain [0 1] /C0 [0] /C1 [1] /N 2 >>")
    assert fn is not None and fn.ftype == 2
    assert eval_function(fn, 0.0) == (0.0,)
    assert eval_function(fn, 0.5) == (0.25,)
    assert eval_function(fn, 1.0) == (1.0,)
    # multi-output + default C0/C1 lengths must agree
    fn = _mk(b"<< /FunctionType 2 /Domain [0 1] /C0 [1 0] /C1 [0 1] /N 1 >>")
    assert eval_function(fn, 0.25) == (0.75, 0.25)


def test_type2_domain_clip_and_range_clip():
    fn = _mk(
        b"<< /FunctionType 2 /Domain [0 1] /Range [0 0.5] "
        b"/C0 [0] /C1 [1] /N 1 >>"
    )
    assert eval_function(fn, 2.0) == (0.5,)   # domain→1.0, range→0.5
    assert eval_function(fn, -3.0) == (0.0,)


def test_type2_mismatched_c0_c1_rejected():
    assert _mk(
        b"<< /FunctionType 2 /Domain [0 1] /C0 [0] /C1 [1 1] /N 1 >>"
    ) is None


# ---------------------------------------------------------------- Type 3


def test_type3_stitching_identity_and_reversal():
    # two linear halves composing the identity over [0,1]
    ident = (
        b"<< /FunctionType 3 /Domain [0 1] /Functions [ "
        b"<< /FunctionType 2 /Domain [0 1] /C0 [0] /C1 [0.5] /N 1 >> "
        b"<< /FunctionType 2 /Domain [0 1] /C0 [0.5] /C1 [1] /N 1 >> "
        b"] /Bounds [0.5] /Encode [0 1 0 1] >>"
    )
    fn = _mk(ident)
    for x in (0.0, 0.2, 0.5, 0.77, 1.0):
        assert eval_function(fn, x) == pytest.approx((x,))
    # Encode can REVERSE a subdomain (spec example): [1 0] flips
    rev = ident.replace(b"/Encode [0 1 0 1]", b"/Encode [1 0 0 1]")
    fn = _mk(rev)
    assert eval_function(fn, 0.0) == pytest.approx((0.5,))
    assert eval_function(fn, 0.5) == pytest.approx((0.5,))  # sub1 start


def test_type3_bad_arity_rejected():
    assert _mk(
        b"<< /FunctionType 3 /Domain [0 1] /Functions [ "
        b"<< /FunctionType 2 /Domain [0 1] /C0 [0] /C1 [1] /N 1 >> ] "
        b"/Bounds [0.5] /Encode [0 1] >>"
    ) is None  # bounds count != len(functions)-1


# ---------------------------------------------------------------- Type 0


def _sampled(bps: int, data: bytes, size: int, n_out: int = 1,
             extra: bytes = b""):
    rng = b" ".join(b"0 1" for _ in range(n_out))
    body = (
        b"<< /FunctionType 0 /Domain [0 1] /Range [%s] /Size [%d] "
        b"/BitsPerSample %d %s/Length %d >>\nstream\nX\nendstream"
        % (rng, size, bps, extra, len(data))
    )
    return _mk(b"9 0 R", objs={9: body}, streams={9: data})


def test_type0_8bit_interpolation():
    fn = _sampled(8, bytes([0, 255]), 2)
    assert eval_function(fn, 0.0) == (0.0,)
    assert eval_function(fn, 1.0) == (1.0,)
    assert eval_function(fn, 0.5) == pytest.approx((0.5,), abs=1e-9)


def test_type0_subbyte_and_wide_samples():
    # 4-bit: samples 0,15 → identity over [0,1]
    fn = _sampled(4, bytes([0x0F]), 2)
    assert eval_function(fn, 1.0) == (1.0,)
    assert eval_function(fn, 0.5) == pytest.approx((0.5,))
    # 1-bit: 8 samples 10110000 (packed MSB-first)
    fn = _sampled(1, bytes([0b10110000]), 8)
    assert eval_function(fn, 0.0) == (1.0,)
    assert eval_function(fn, 2 / 7) == (1.0,)
    assert eval_function(fn, 1.0) == (0.0,)
    # 16-bit big-endian: 0x0000, 0xFFFF
    fn = _sampled(16, bytes([0, 0, 0xFF, 0xFF]), 2)
    assert eval_function(fn, 0.75) == pytest.approx((0.75,))


def test_type0_decode_maps_output_range():
    # Decode [1 0] inverts
    fn = _sampled(8, bytes([0, 255]), 2, extra=b"/Decode [1 0] ")
    assert eval_function(fn, 0.0) == (1.0,)
    assert eval_function(fn, 1.0) == (0.0,)


def test_type0_truncated_stream_rejected():
    assert _sampled(8, b"\x00", 2) is None


def test_type0_multi_output():
    # 2 outputs per point: (0,1) then (1,0)
    fn = _sampled(8, bytes([0, 255, 255, 0]), 2, n_out=2)
    assert eval_function(fn, 0.0) == (0.0, 1.0)
    assert eval_function(fn, 1.0) == (1.0, 0.0)


# ---------------------------------------------------------------- Type 4


def _calc(prog: bytes, rng: bytes = b"[0 1]", dom: bytes = b"[0 1]"):
    body = (
        b"<< /FunctionType 4 /Domain %s /Range %s /Length %d >>"
        b"\nstream\nX\nendstream" % (dom, rng, len(prog))
    )
    return _mk(b"4 0 R", objs={4: body}, streams={4: prog})


def test_type4_tint_inversion():
    fn = _calc(b"{ 1 exch sub }")
    assert eval_function(fn, 0.25) == (0.75,)


def test_type4_arithmetic_operators():
    fn = _calc(b"{ pop 2 3 add 4 mul 10 sub 2 div }", rng=b"[-100 100]")
    assert eval_function(fn, 0.0) == (5.0,)
    fn = _calc(b"{ pop 7 2 idiv 7 2 mod add }", rng=b"[-100 100]")
    assert eval_function(fn, 0.0) == (4.0,)   # 3 + 1
    fn = _calc(b"{ pop -7 2 idiv }", rng=b"[-100 100]")
    assert eval_function(fn, 0.0) == (-3.0,)  # idiv truncates toward zero
    fn = _calc(b"{ pop -7 2 mod }", rng=b"[-100 100]")
    assert eval_function(fn, 0.0) == (-1.0,)  # mod keeps dividend sign
    fn = _calc(b"{ neg abs sqrt }", rng=b"[0 10]", dom=b"[-4 4]")
    assert eval_function(fn, -4.0) == (2.0,)


def test_type4_rounding_family():
    fn = _calc(b"{ pop 2.5 round 2.5 truncate add -2.5 round add }",
               rng=b"[-100 100]")
    # PS round: ties toward +inf → 3; truncate → 2; round(-2.5) → -2
    assert eval_function(fn, 0.0) == (3.0,)
    fn = _calc(b"{ pop -1.5 ceiling -1.5 floor add }", rng=b"[-100 100]")
    assert eval_function(fn, 0.0) == (-3.0,)


def test_type4_transcendental():
    fn = _calc(b"{ pop 90 sin 0 cos add }", rng=b"[-10 10]")
    assert eval_function(fn, 0.0) == pytest.approx((2.0,))
    fn = _calc(b"{ pop 1 1 atan }", rng=b"[0 360]")
    assert eval_function(fn, 0.0) == pytest.approx((45.0,))
    fn = _calc(b"{ pop -1 -1 atan }", rng=b"[0 360]")
    assert eval_function(fn, 0.0) == pytest.approx((225.0,))
    fn = _calc(b"{ pop 2 10 exp }", rng=b"[0 2000]")
    assert eval_function(fn, 0.0) == (1024.0,)
    fn = _calc(b"{ pop 100 log }", rng=b"[0 10]")
    assert eval_function(fn, 0.0) == pytest.approx((2.0,))
    e = _calc(b"{ pop 2.718281828459045 ln }", rng=b"[0 10]")
    assert eval_function(e, 0.0) == pytest.approx((1.0,))


def test_type4_comparison_boolean_bitwise():
    fn = _calc(b"{ pop 3 4 lt { 1 } { 0 } ifelse }")
    assert eval_function(fn, 0.0) == (1.0,)
    fn = _calc(b"{ pop 5 5 ge 4 5 eq or { 1 } { 0 } ifelse }")
    assert eval_function(fn, 0.0) == (1.0,)
    fn = _calc(b"{ pop 12 10 and 12 10 or add 12 10 xor add }",
               rng=b"[0 100]")
    assert eval_function(fn, 0.0) == (28.0,)  # 8 + 14 + 6
    fn = _calc(b"{ pop 1 3 bitshift 16 -2 bitshift add }", rng=b"[0 100]")
    assert eval_function(fn, 0.0) == (12.0,)  # 8 + 4
    fn = _calc(b"{ pop true not { 9 } { 7 } ifelse }", rng=b"[0 100]")
    assert eval_function(fn, 0.0) == (7.0,)
    fn = _calc(b"{ pop 5 not }", rng=b"[-100 100]")
    assert eval_function(fn, 0.0) == (-6.0,)  # bitwise ~5


def test_type4_stack_operators():
    fn = _calc(b"{ pop 1 2 3 2 copy add add add add }", rng=b"[0 100]")
    assert eval_function(fn, 0.0) == (11.0,)  # 1+2+3+2+3
    fn = _calc(b"{ pop 10 20 30 2 index }", rng=b"[0 100]")
    # stack: 10 20 30 10 — top 1 result
    assert eval_function(fn, 0.0) == (10.0,)
    fn = _calc(b"{ pop 1 2 3 3 1 roll }", rng=b"[0 100]")
    assert eval_function(fn, 0.0) == (2.0,)   # 3 1 2 → top 2
    fn = _calc(b"{ pop 1 2 3 3 -1 roll }", rng=b"[0 100]")
    assert eval_function(fn, 0.0) == (1.0,)   # 2 3 1 → top 1
    fn = _calc(b"{ dup mul }", dom=b"[0 3]", rng=b"[0 9]")
    assert eval_function(fn, 3.0) == (9.0,)
    fn = _calc(b"{ pop 1 2 exch }", rng=b"[0 100]")
    assert eval_function(fn, 0.0) == (1.0,)
    fn = _calc(b"{ pop 3 4 cvr pop cvi }", rng=b"[0 100]")
    assert eval_function(fn, 0.0) == (3.0,)


def test_type4_nested_if():
    fn = _calc(
        b"{ 0.5 lt { 0.1 0.2 lt { 1 } { 2 } ifelse } { 3 } ifelse }",
        rng=b"[0 10]",
    )
    assert eval_function(fn, 0.2) == (1.0,)
    assert eval_function(fn, 0.9) == (3.0,)


def test_type4_errors_raise_valueerror():
    for prog in (
        b"{ add }",                       # stack underflow
        b"{ pop 1 0 div }",               # division by zero
        b"{ pop 1 0 idiv }",
        b"{ pop 1 0 mod }",
        b"{ pop -1 sqrt }",
        b"{ pop 0 ln }",
        b"{ pop -2 0.5 exp }",            # complex guard
        b"{ pop 1 2 frobnicate }",        # unknown operator
        b"{ pop 5 copy }",                # copy more than present
        b"{ pop 3 index }",               # index past bottom
        b"{ pop true 1 add }",            # bool into arithmetic
        b"{ pop { 1 } 2 eq }",            # procedure comparison
    ):
        fn = _calc(prog, rng=b"[-10 10]")
        assert fn is not None, prog
        with pytest.raises(ValueError):
            eval_function(fn, 0.0)


def test_type4_hostile_bounds():
    # unbalanced braces → parse returns None
    assert _calc(b"{ 1 exch sub ") is None
    assert _calc(b"no procedure here") is None
    # stack bomb: dup chains bounded by the 100-entry limit
    fn = _calc(b"{ " + b"dup " * 200 + b"}")
    with pytest.raises(ValueError):
        eval_function(fn, 0.5)
    # copy bomb: 99 copy of a near-full stack trips the limit
    fn = _calc(b"{ " + b"dup " * 50 + b"50 copy }")
    with pytest.raises(ValueError):
        eval_function(fn, 0.5)


def test_type4_too_few_results():
    fn = _calc(b"{ pop }")
    with pytest.raises(ValueError):
        eval_function(fn, 0.3)


# ------------------------------------------------------- parse + table


def test_parse_rejects_unsupported_shapes():
    # two-input functions are out of scope
    assert _mk(
        b"<< /FunctionType 2 /Domain [0 1 0 1] /C0 [0] /C1 [1] /N 1 >>"
    ) is None
    # missing /FunctionType
    assert _mk(b"<< /Domain [0 1] >>") is None
    # unknown type id
    assert _mk(b"<< /FunctionType 7 /Domain [0 1] >>") is None
    # ref to a missing object
    assert _mk(b"99 0 R") is None


def test_eval_table_degrades_on_error():
    fn = _calc(b"{ pop 1 0 div }", rng=b"[-10 10]")
    assert eval_table(fn, 16) is None
    fn = _calc(b"{ 1 exch sub }")
    tbl = eval_table(fn, 256)
    assert tbl is not None and len(tbl) == 256
    assert tbl[0] == (1.0,) and tbl[-1] == (0.0,)


# ------------------------------------- colorspace reductions (codec_pdf)


def test_separation_lut_through_resolver():
    from gnosis_ocr_spark.functions.codec_pdf import _resolve_colorspace

    objs = {
        4: (
            b"<< /FunctionType 4 /Domain [0 1] /Range [0 1] /Length 14 >>"
            b"\nstream\nX\nendstream"
        ),
    }
    streams = {4: b"{ 1 exch sub }"}
    name, lut = _resolve_colorspace(
        b"[/Separation /Black /DeviceGray 4 0 R]", objs.get, streams.get
    )
    assert name == "Separation" and lut is not None and len(lut) == 256
    assert lut[0] == 255 and lut[255] == 0 and lut[128] == 127

    # single-colorant DeviceN over an RGB alternate: inline Type 2 ramp
    name, lut = _resolve_colorspace(
        b"[/DeviceN [/Ink] /DeviceRGB "
        b"<< /FunctionType 2 /Domain [0 1] /C0 [0 0 0] /C1 [1 1 1] /N 1 >>]",
        objs.get, streams.get,
    )
    assert name == "Separation" and lut is not None
    assert lut[0] == 0 and lut[255] == 255

    # multi-colorant DeviceN degrades to (name, None)
    name, lut = _resolve_colorspace(
        b"[/DeviceN [/Cyan /Magenta] /DeviceRGB 4 0 R]",
        objs.get, streams.get,
    )
    assert (name, lut) == ("DeviceN", None)

    # unevaluable function degrades
    name, lut = _resolve_colorspace(
        b"[/Separation /Spot /DeviceGray 99 0 R]", objs.get, streams.get
    )
    assert (name, lut) == ("Separation", None)


def test_separation_subbyte_tint_scaling():
    """A 1-bit separation sample 1 is tint 1.0 (full code range), not
    palette index 1 — the decode path must pre-scale."""
    import zlib

    from gnosis_ocr_spark.functions.codec_pdf import _decode_image

    objs = {
        4: (
            b"<< /FunctionType 4 /Domain [0 1] /Range [0 1] /Length 14 >>"
            b"\nstream\nX\nendstream"
        ),
    }
    streams = {4: b"{ 1 exch sub }"}
    # 8x1, bits=1, samples 10110000 → tints 1,0,1,1,0,0,0,0
    raw = zlib.compress(bytes([0b10110000]))
    head = (
        b"<< /Subtype /Image /Width 8 /Height 1 /BitsPerComponent 1 "
        b"/ColorSpace [/Separation /Black /DeviceGray 4 0 R] "
        b"/Filter /FlateDecode >>"
    )
    img = _decode_image(head, raw, streams.get, objs.get)
    assert img is not None and img.colorspace == "DeviceGray"
    assert img.data == bytes([0, 255, 0, 0, 255, 255, 255, 255])


def test_scanned_function_colorspace_variants_extract_exact_text():
    """The four function-driven writers extract byte-exact text through
    the real image path: Type 4 Separation, Type 0 DeviceN, Type 3
    inline-stitched Separation, and Lab lightness."""
    from gnosis_ocr_spark.functions import codec_pdf as P
    from gnosis_ocr_spark.functions import codec_png as PNG
    from gnosis_ocr_spark.operators.pdf_split import _scan_png

    pages = ["separation page one\nline two", "page two body here"]
    for variant in ("separation", "devicen", "separation_t3", "lab"):
        pdf = P.build_pdf_scanned(pages, image_filter=variant)
        win = P.extract_pages_with_images(pdf)
        assert [len(s) for s, _ in win] == [0, 0], variant
        for (spans, images), page in zip(win, pages):
            [img] = images
            assert (img.codec, img.colorspace, img.bits) == (
                "raw", "DeviceGray", 8), variant
            assert PNG.decode_scan_png_text(_scan_png(images)) == page, variant


def test_function_colorspace_mutation_degrades_not_raises():
    import random

    from gnosis_ocr_spark.functions import codec_pdf as P

    pages = ["plain ascii page"]
    for variant in ("separation", "devicen", "separation_t3", "lab"):
        base = P.build_pdf_scanned(pages, image_filter=variant)
        rnd = random.Random(13)
        for _ in range(40):
            buf = bytearray(base)
            buf[rnd.randrange(len(buf))] = rnd.randrange(256)
            try:
                P.extract_pages_with_images(bytes(buf))
            except ValueError:
                pass  # loud structured failure allowed; crashes are not
