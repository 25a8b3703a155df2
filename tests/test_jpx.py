"""JPEG 2000 (ITU-T T.800) codec + the scanned-PDF path: /JPXDecode was
the last image codec in the pipeline that carried opaque — the reference
rasterizes those pages transparently via poppler
(/root/reference/app/jobs.py:386-390); here they decode through the
from-scratch Tier-2/Tier-1/DWT stack in functions/codec_jpx.py (the MQ
arithmetic coder is codec_jbig2's — T.800 Annex C and T.88 Annex E
specify the identical coder) into the same OCR seam as every other
scanned shape."""

from __future__ import annotations

import hashlib
import random
from pathlib import Path

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from gnosis_ocr_spark.functions import codec_jpx as X
from gnosis_ocr_spark.functions import codec_pdf as P
from gnosis_ocr_spark.functions import codec_png as G
from gnosis_ocr_spark.operators.pdf_split import _scan_png

GOLDEN = Path(__file__).parent / "golden"


# ----------------------------------------------------------------- DWT


@given(st.integers(0, 10_000))
@settings(max_examples=60, deadline=None)
def test_dwt53_roundtrip_property(seed):
    """5/3 reversible lifting is the exact identity for any integer
    signal, every length parity, both axes."""
    rng = np.random.default_rng(seed)
    h = int(rng.integers(1, 40))
    w = int(rng.integers(1, 40))
    x = rng.integers(-(2**20), 2**20, size=(h, w)).astype(np.int64)
    for axis in (0, 1):
        s, d = X._fdwt53_1d(x, axis)
        assert np.array_equal(X._idwt53_1d(s, d, axis), x)


@given(st.integers(0, 10_000))
@settings(max_examples=40, deadline=None)
def test_dwt97_roundtrip_property(seed):
    """9/7 irreversible lifting inverts to float precision."""
    rng = np.random.default_rng(seed)
    n = int(rng.integers(1, 200))
    x = rng.normal(0, 1000, size=(n,))
    s, d = X._fdwt97_1d(x, 0)
    assert np.allclose(X._idwt97_1d(s, d, 0), x, atol=1e-8)


def test_multilevel_dwt_geometry_matches_band_table():
    """_band_geometry's subband sizes equal what the recursive split
    actually produces — the packet walk and the coefficients must agree
    on every dimension, including degenerate 1-px edges."""
    rng = np.random.default_rng(4)
    for (h, w, levels) in ((37, 61, 3), (8, 8, 2), (5, 200, 4), (1, 17, 2)):
        x = rng.integers(-100, 100, size=(h, w)).astype(np.int64)
        geom = X._band_geometry(w, h, levels)
        cur = x
        sizes = {}
        for l in range(1, levels + 1):
            s_l, s_h = X._fdwt53_1d(cur, 1)
            ll, lh = X._fdwt53_1d(s_l, 0)
            hl, hh = X._fdwt53_1d(s_h, 0)
            sizes[("HL", l)] = hl.shape
            sizes[("LH", l)] = lh.shape
            sizes[("HH", l)] = hh.shape
            cur = ll
        sizes[("LL", levels)] = cur.shape
        for bands in geom:
            for name, level, bw_, bh_ in bands:
                assert sizes[(name, level)] == (bh_, bw_), (name, level)


# ------------------------------------------------------------ block coder


@given(st.integers(0, 10_000))
@settings(max_examples=30, deadline=None)
def test_block_coder_roundtrip_property(seed):
    """EBCOT encode → decode identity over all four band context tables,
    sparse through dense blocks, including full 64-wide stripes."""
    rng = np.random.default_rng(seed)
    h = int(rng.integers(1, 64))
    w = int(rng.integers(1, 64))
    band = int(rng.integers(0, 4))
    density = float(rng.choice([0.01, 0.2, 0.7, 1.0]))
    mags = rng.integers(0, 1 << int(rng.integers(1, 12)), size=(h, w))
    mask = rng.random((h, w)) < density
    signs = rng.choice([-1, 1], size=(h, w))
    coeffs = (mags * mask * signs).astype(np.int64)
    n_planes = max(1, int(np.abs(coeffs).max()).bit_length())
    seg, n_passes = X.encode_block(coeffs, band, n_planes)
    got = X.decode_block(seg, h, w, band, n_planes, n_passes)
    assert np.array_equal(got, coeffs)


def test_block_truncated_passes_degrade_not_crash():
    """Decoding fewer passes than encoded (a truncated quality layer)
    yields coarser magnitudes, never an exception — the progressive
    contract real streams rely on."""
    rng = np.random.default_rng(9)
    coeffs = (rng.integers(0, 200, size=(32, 32))
              * (rng.random((32, 32)) < 0.3)).astype(np.int64)
    n_planes = max(1, int(np.abs(coeffs).max()).bit_length())
    seg, n_passes = X.encode_block(coeffs, 0, n_planes)
    for keep in range(1, n_passes + 1):
        got = X.decode_block(seg, 32, 32, 0, n_planes, keep)
        assert got.shape == (32, 32)
    assert np.array_equal(
        X.decode_block(seg, 32, 32, 0, n_planes, n_passes), coeffs
    )


# -------------------------------------------------------- full codestream


@given(st.integers(0, 10_000))
@settings(max_examples=15, deadline=None)
def test_lossless_roundtrip_property(seed):
    """encode_jpx(lossless) → decode_jpx is the identity for arbitrary
    gray and RGB images across sizes, levels, and the RCT."""
    rng = np.random.default_rng(seed)
    h = int(rng.integers(1, 80))
    w = int(rng.integers(1, 80))
    n_comp = int(rng.choice([1, 3]))
    levels = int(rng.integers(0, 4))
    comps = [
        rng.integers(0, 256, size=(h, w)).astype(np.uint8)
        for _ in range(n_comp)
    ]
    cs = X.encode_jpx(comps, lossless=True, levels=levels)
    gw, gh, got, precs = X.decode_jpx(cs)
    assert (gw, gh) == (w, h) and precs == [8] * n_comp
    for a, b in zip(got, comps):
        assert np.array_equal(a, b)


def test_lossy_97_bounded_error_and_rate_distortion():
    """9/7 + scalar-expounded quantization: reconstruction error is
    bounded by the step, and a coarser step yields a smaller stream —
    the codec actually trades rate for distortion rather than hiding a
    lossless path behind the lossy flag."""
    yy, xx = np.mgrid[0:100, 0:120]
    img = (128 + 100 * np.sin(xx / 15.0) * np.cos(yy / 18.0)).astype(np.uint8)
    sizes = []
    for step, tol in ((1 / 32, 2), (1.0, 4), (4.0, 12)):
        cs = X.encode_jpx([img], lossless=False, levels=3, quality_step=step)
        w, h, comps, _ = X.decode_jpx(cs)
        err = np.abs(comps[0].astype(int) - img.astype(int))
        assert err.max() <= tol, (step, err.max())
        sizes.append(len(cs))
    assert sizes[0] > sizes[1] > sizes[2]


def test_jp2_container_and_gray_seam():
    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, size=(50, 70)).astype(np.uint8)
    jp2 = X.encode_jp2([img], lossless=True)
    w, h, comps, _ = X.decode_jpx(jp2)
    assert np.array_equal(comps[0], img)
    w, h, gray = X.decode_jpx_gray(jp2)
    assert np.array_equal(np.frombuffer(gray, np.uint8).reshape(h, w), img)
    # RGB luma reduction in the gray seam
    rgb = [rng.integers(0, 256, size=(20, 30)).astype(np.uint8) for _ in range(3)]
    w, h, gray = X.decode_jpx_gray(X.encode_jpx(rgb, lossless=True))
    r_, g_, b_ = (c.astype(np.int64) for c in rgb)
    expect = ((r_ * 299 + g_ * 587 + b_ * 114) // 1000).astype(np.uint8)
    assert np.array_equal(np.frombuffer(gray, np.uint8).reshape(h, w), expect)


def test_all_progression_orders_roundtrip():
    """Packets physically emitted in each of the five progression orders
    (LRCP/RLCP/RPCL/PCRL/CPRL) decode identically — the decoder's packet
    walk follows the COD order, not a fixed sequence."""
    rng = np.random.default_rng(5)
    comps = [rng.integers(0, 256, size=(40, 40)).astype(np.uint8)
             for _ in range(3)]
    streams = set()
    for prog in (0, 1, 2, 3, 4):
        cs = X.encode_jpx(comps, lossless=True, levels=2, progression=prog)
        streams.add(cs)
        w, h, got, _ = X.decode_jpx(cs)
        for a, b in zip(got, comps):
            assert np.array_equal(a, b), prog
    # PCRL/CPRL really reorder the packet bytes vs the R-major orders
    assert len(streams) >= 2


def test_hostile_dimensions_and_truncation_rejected():
    """Crafted SIZ dimensions must raise before allocation; truncations
    of a valid stream raise ValueError (never MemoryError/hangs)."""
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, size=(32, 32)).astype(np.uint8)
    cs = bytearray(X.encode_jpx([img], lossless=True))
    # blow up Xsiz/Ysiz in SIZ (offsets 4: Lsiz(2)+Rsiz(2) → Xsiz at +6)
    siz_at = bytes(cs).find(b"\xff\x51")
    evil = bytearray(cs)
    evil[siz_at + 6 : siz_at + 14] = (0x7FFFFFFF).to_bytes(4, "big") * 2
    with pytest.raises(ValueError):
        X.decode_jpx(bytes(evil))
    for cut in (3, 10, len(cs) // 2, len(cs) - 3):
        with pytest.raises(ValueError):
            X.decode_jpx(bytes(cs[:cut]))


@given(st.integers(0, 10_000), st.binary(max_size=200))
@settings(max_examples=60, deadline=None)
def test_mutated_stream_never_escapes_exception_contract(seed, junk):
    """Arbitrary bytes and random mutations of a valid codestream:
    ValueError or a clean decode only — never RecursionError/MemoryError
    (the executor-killing classes)."""
    rng = random.Random(seed)
    base = bytearray(
        X.encode_jpx(
            [np.full((16, 16), seed % 256, dtype=np.uint8)], lossless=True
        )
    )
    for _ in range(rng.randint(1, 6)):
        base[rng.randrange(len(base))] = rng.randrange(256)
    for data in (junk, bytes(base)):
        try:
            X.decode_jpx(data)
        except (RecursionError, MemoryError):
            raise
        except ValueError:
            pass


def test_unsupported_subsets_raise_for_opaque_carry():
    """POC/RGN markers, subsampled components, and non-default
    code-block styles raise — codec_pdf/pdf_split map that to the
    opaque carry."""
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(16, 16)).astype(np.uint8)
    cs = bytearray(X.encode_jpx([img], lossless=True))
    cod_at = bytes(cs).find(b"\xff\x52")
    evil = bytearray(cs)
    evil[cod_at + 12] = 0x40  # cbstyle: a bit T.800 does not define
    with pytest.raises(ValueError, match="code-block style"):
        X.decode_jpx(bytes(evil))
    siz_at = bytes(cs).find(b"\xff\x51")
    evil = bytearray(cs)
    evil[siz_at + 41] = 3  # XRsiz = 3: only 1/2/4 sampling supported
    with pytest.raises(ValueError, match="sampling factor"):
        X.decode_jpx(bytes(evil))


# ------------------------------------------------- PDF image-XObject path


PAGES = ["jpx scanned page one\nline two", "page two body"]


@pytest.mark.parametrize("variant", ["jpx", "jpx_jp2"])
def test_jpx_scanned_variants_extract_exact_text(variant):
    """Both /JPXDecode writer shapes — raw lossless 5/3 codestream and
    JP2-boxed lossy 9/7 — decode through extract_pages_with_images into
    pixels whose scan matrix recovers the exact page text."""
    pdf = P.build_pdf_scanned(
        PAGES, width=128, height=128, image_filter=variant
    )
    win = P.extract_pages_with_images(pdf)
    assert [len(spans) for spans, _ in win] == [0, 0]
    for (spans, images), page in zip(win, PAGES):
        [img] = images
        assert img.codec == "jpx"
        assert G.decode_scan_png_text(_scan_png(images)) == page


def test_frozen_jpx_golden_extracts_end_to_end(spark):
    """Byte-frozen JPX-only PDF (sha256-pinned) through the production
    fused split→OCR Spark path extracts byte-pinned text."""
    from gnosis_ocr_spark.operators.layout import assemble_documents
    from gnosis_ocr_spark.operators.pdf_split import (
        raster_ocr_pages,
        split_pdf_text_pages,
    )

    pdf = (GOLDEN / "scanned_jpx.pdf").read_bytes()
    assert hashlib.sha256(pdf).hexdigest() == (
        "1ec494dde2b033a32414e534fd926c6c3633aa26656101871f5078a33096a55f"
    )
    pages = ["jpx wavelet page\nline two here", "second scanned page"]
    df = spark.createDataFrame(
        [("jpx", bytearray(pdf))], schema="url string, html binary"
    )
    out = assemble_documents(
        raster_ocr_pages(split_pdf_text_pages(df), ocr_engine="stub")
    ).collect()
    assert out[0]["extracted_text"] == "\n\n".join(pages)
    assert out[0]["n_pages"] == 2


# --------------------------------------------- tiles + subsampling


@given(st.integers(0, 10_000))
@settings(max_examples=10, deadline=None)
def test_multi_tile_lossless_roundtrip_property(seed):
    """Tiled codestreams (independent SOT..SOD tile-parts on an aligned
    grid, incl. ragged right/bottom edge tiles) reassemble bit-exactly."""
    rng = np.random.default_rng(seed)
    h = int(rng.integers(40, 150))
    w = int(rng.integers(40, 150))
    levels = int(rng.integers(0, 3))
    ts = int(rng.choice([32, 64])) if levels <= 3 else 64
    n_comp = int(rng.choice([1, 3]))
    comps = [
        rng.integers(0, 256, size=(h, w)).astype(np.uint8)
        for _ in range(n_comp)
    ]
    cs = X.encode_jpx(comps, lossless=True, levels=levels, tile_size=(ts, ts))
    gw, gh, got, _ = X.decode_jpx(cs)
    assert (gw, gh) == (w, h)
    for a, b in zip(got, comps):
        assert np.array_equal(a, b)


def test_subsampled_420_roundtrip_and_upsample_contract():
    """4:2:0 chroma subsampling: planes are coded at their own grid, the
    decoder returns every component at FULL image resolution (nearest
    upsample), and the coded samples survive exactly (lossless)."""
    rng = np.random.default_rng(8)
    yp = rng.integers(0, 256, size=(60, 90)).astype(np.uint8)
    cb = rng.integers(0, 256, size=(30, 45)).astype(np.uint8)
    cr = rng.integers(0, 256, size=(30, 45)).astype(np.uint8)
    cs = X.encode_jpx(
        [yp, cb, cr], lossless=True, levels=2,
        sampling=[(1, 1), (2, 2), (2, 2)],
    )
    w, h, comps, _ = X.decode_jpx(cs)
    assert all(c.shape == (60, 90) for c in comps)
    assert np.array_equal(comps[0], yp)
    assert np.array_equal(comps[1][::2, ::2], cb)
    assert np.array_equal(comps[2][::2, ::2], cr)
    # gray seam consumes the upsampled planes without error
    gw, gh, gray = X.decode_jpx_gray(cs)
    assert (gw, gh) == (90, 60) and len(gray) == 90 * 60


def test_tiled_subsampled_lossy_combination():
    rng = np.random.default_rng(4)
    yp = rng.integers(0, 256, size=(64, 96)).astype(np.uint8)
    cb = rng.integers(0, 256, size=(32, 48)).astype(np.uint8)
    cr = rng.integers(0, 256, size=(32, 48)).astype(np.uint8)
    cs = X.encode_jpx(
        [yp, cb, cr], lossless=False, levels=1, quality_step=0.5,
        sampling=[(1, 1), (2, 2), (2, 2)], tile_size=(32, 32),
    )
    w, h, comps, _ = X.decode_jpx(cs)
    assert np.abs(comps[0].astype(int) - yp.astype(int)).max() <= 4


def test_unaligned_tile_grid_rejected():
    """A tile size whose origins go odd at some DWT level raises (the
    lifting here assumes even-parity starts; real encoders emit aligned
    power-of-two tile sizes)."""
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, size=(100, 100)).astype(np.uint8)
    with pytest.raises(ValueError, match="align"):
        X.encode_jpx([img], lossless=True, levels=3, tile_size=(36, 36))
    # and the decoder rejects the same grid in a crafted SIZ: a valid
    # single-tile stream whose XTsiz/YTsiz are patched to 36 declares
    # 36-px tile origins that go odd at level 3
    cs = bytearray(X.encode_jpx([img[:64, :64]], lossless=True, levels=3))
    siz_at = bytes(cs).find(b"\xff\x51")
    import struct as _st

    _st.pack_into(">II", cs, siz_at + 22, 36, 36)  # XTsiz, YTsiz
    with pytest.raises(ValueError):
        X.decode_jpx(bytes(cs))


# ------------------------------------------------------------- precincts


@given(st.integers(0, 10_000))
@settings(max_examples=10, deadline=None)
def test_precinct_roundtrip_property(seed):
    """User-defined precinct grids (per-precinct tag trees,
    precinct-capped code-blocks, one packet per precinct) reassemble
    bit-exactly across sizes, levels, and both L-major orders."""
    rng = np.random.default_rng(seed)
    h = int(rng.integers(30, 140))
    w = int(rng.integers(30, 140))
    levels = int(rng.integers(0, 3))
    pp = int(rng.choice([4, 5, 6]))
    prog = int(rng.integers(0, 2))
    n_comp = int(rng.choice([1, 3]))
    comps = [
        rng.integers(0, 256, size=(h, w)).astype(np.uint8)
        for _ in range(n_comp)
    ]
    cs = X.encode_jpx(
        comps, lossless=True, levels=levels, precincts=(pp, pp),
        progression=prog,
    )
    gw, gh, got, _ = X.decode_jpx(cs)
    assert (gw, gh) == (w, h)
    for a, b in zip(got, comps):
        assert np.array_equal(a, b)


def test_precincts_with_tiles_and_lossy():
    rng = np.random.default_rng(6)
    img = rng.integers(0, 256, size=(100, 130)).astype(np.uint8)
    cs = X.encode_jpx(
        [img], lossless=True, levels=1, precincts=(5, 5),
        tile_size=(64, 64),
    )
    w, h, comps, _ = X.decode_jpx(cs)
    assert np.array_equal(comps[0], img)
    cs = X.encode_jpx(
        [img], lossless=False, levels=2, precincts=(5, 6), quality_step=0.5
    )
    w, h, comps, _ = X.decode_jpx(cs)
    assert np.abs(comps[0].astype(int) - img.astype(int)).max() <= 4


def test_position_major_with_precincts_roundtrip():
    """RPCL/PCRL/CPRL over multiple precincts (Kakadu's streaming
    defaults) decode: packets are physically emitted in the T.800
    B.12.1.3-5 position interleave — per-resolution precinct strides in
    reference-grid coordinates — and every order yields a DIFFERENT
    byte stream that decodes identically."""
    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, size=(100, 100)).astype(np.uint8)
    rgb = [rng.integers(0, 256, size=(64, 64)).astype(np.uint8)
           for _ in range(3)]
    streams = set()
    for prog in (2, 3, 4):
        cs = X.encode_jpx(
            [img], lossless=True, levels=2, precincts=(5, 5),
            progression=prog,
        )
        streams.add(cs)
        _, _, got, _ = X.decode_jpx(cs)
        assert np.array_equal(got[0], img), prog
        cs = X.encode_jpx(
            rgb, lossless=True, levels=2, precincts=(4, 5),
            progression=prog,
        )
        streams.add(cs)
        _, _, got, _ = X.decode_jpx(cs)
        for a, b in zip(got, rgb):
            assert np.array_equal(a, b), prog
    assert len(streams) == 6  # the interleaves genuinely differ
    # composes with bypass and tiles
    big = rng.integers(0, 256, size=(128, 128)).astype(np.uint8)
    for kw in ({"bypass": True}, {"tile_size": (64, 64)}):
        cs = X.encode_jpx(
            [big], lossless=True, levels=2, precincts=(5, 5),
            progression=2, **kw,
        )
        _, _, got, _ = X.decode_jpx(cs)
        assert np.array_equal(got[0], big), kw


# ----------------------------------------- selective arithmetic bypass


@given(st.integers(0, 10_000))
@settings(max_examples=15, deadline=None)
def test_bypass_block_roundtrip_property(seed):
    """encode_block_bypass → decode_block(bypass) is the identity:
    raw SPP/MRP segments from the fifth bit-plane, MQ cleanup segments,
    context states persisting across terminations (T.800 D.6)."""
    rng = np.random.default_rng(seed)
    h = int(rng.integers(1, 48))
    w = int(rng.integers(1, 48))
    band = int(rng.integers(0, 3))
    n_planes = int(rng.integers(1, 13))
    mags = rng.integers(0, 1 << n_planes, size=(h, w))
    signs = rng.choice([-1, 1], size=(h, w))
    coeffs = (mags * signs).astype(np.int64)
    segs, n_passes = X.encode_block_bypass(coeffs, band, n_planes)
    pieces = X._bypass_pieces(0, n_passes)
    assert len(pieces) == len(segs)
    assert all(not s.endswith(b"\xff") for s in segs)  # D.4.2
    data, ends, off = b"", [], 0
    for (npp, term), s in zip(pieces, segs):
        data += s
        off += len(s)
        if term:
            ends.append(off)
    got = X.decode_block(
        data, h, w, band, n_planes, n_passes,
        bypass=True, seg_ends=tuple(ends),
    )
    assert np.array_equal(got, coeffs)


def test_bypass_termination_pattern():
    """The T.800 Table D.9 pattern: MQ through pass 9, then raw SPP+MRP
    / MQ CUP alternation, terminated at every transition."""
    assert [X._pass_is_raw(k) for k in range(14)] == [
        False] * 10 + [True, True, False, True]
    assert [X._terminates_after(k) for k in range(9)] == [False] * 9
    assert [X._terminates_after(k) for k in (9, 10, 11, 12, 13, 14, 15)] \
        == [True, False, True, True, False, True, True]
    # pieces of a 16-pass single-layer contribution
    assert X._bypass_pieces(0, 16) == [
        (10, True), (2, True), (1, True), (2, True), (1, True),
    ]
    # a contribution starting mid-stream (multi-layer shape)
    assert X._bypass_pieces(10, 3) == [(2, True), (1, True)]
    assert X._bypass_pieces(8, 1) == [(1, False)]


@given(st.integers(0, 10_000))
@settings(max_examples=10, deadline=None)
def test_bypass_codestream_roundtrip_property(seed):
    """encode_jpx(bypass) → decode_jpx is the identity for lossless
    gray/RGB across sizes and levels; the COD cbstyle byte signals the
    style and the per-segment packet lengths reconstruct exactly."""
    rng = np.random.default_rng(seed)
    h = int(rng.integers(1, 80))
    w = int(rng.integers(1, 80))
    n_comp = int(rng.choice([1, 3]))
    levels = int(rng.integers(0, 4))
    comps = [
        rng.integers(0, 256, size=(h, w)).astype(np.uint8)
        for _ in range(n_comp)
    ]
    cs = X.encode_jpx(comps, lossless=True, levels=levels, bypass=True)
    gw, gh, got, _ = X.decode_jpx(cs)
    assert (gw, gh) == (w, h)
    for a, b in zip(got, comps):
        assert np.array_equal(a, b)


def test_bypass_combinations_and_raw_segments_fire():
    """Bypass composes with tiles, precincts, subsampling, lossy 9/7,
    and the JP2 container; at realistic depths blocks really do emit
    multiple terminated segments (raw passes fire — not vacuous)."""
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, size=(128, 128)).astype(np.uint8)
    multi = {"n": 0}
    orig = X.encode_block_styled

    def spy(c, b, n, **kw):
        segs, np_ = orig(c, b, n, **kw)
        if len(segs) > 1:
            multi["n"] += 1
        return segs, np_

    X.encode_block_styled = spy
    try:
        cs = X.encode_jpx([img], lossless=True, levels=3, bypass=True)
    finally:
        X.encode_block_styled = orig
    assert multi["n"] > 0
    _, _, got, _ = X.decode_jpx(cs)
    assert np.array_equal(got[0], img)
    for kw in (
        {"tile_size": (64, 64)},
        {"precincts": (5, 5)},
        {"lossless": False},
    ):
        cs = X.encode_jpx([img], levels=2, bypass=True,
                          **{"lossless": True, **kw})
        _, _, got, _ = X.decode_jpx(cs)
        if kw.get("lossless", True):
            assert np.array_equal(got[0], img)
        else:
            assert np.abs(got[0].astype(int) - img.astype(int)).max() <= 4
    jp2 = X.encode_jp2([img], lossless=True, levels=2, bypass=True)
    _, _, got, _ = X.decode_jpx(jp2)
    assert np.array_equal(got[0], img)


@given(st.integers(0, 10_000), st.binary(min_size=1, max_size=6))
@settings(max_examples=25, deadline=None)
def test_mutated_bypass_stream_exception_contract(seed, junk):
    """Byte corruption of a bypass codestream decodes wrong or raises
    ValueError — never crashes, hangs, or escapes the contract."""
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(40, 40)).astype(np.uint8)
    cs = bytearray(X.encode_jpx([img], lossless=True, bypass=True))
    rnd = random.Random(seed)
    for b in junk:
        cs[rnd.randrange(len(cs))] = b
    try:
        X.decode_jpx(bytes(cs))
    except ValueError:
        pass


@given(st.integers(0, 10_000))
@settings(max_examples=12, deadline=None)
def test_all_codeblock_styles_roundtrip_property(seed):
    """Every T.800 Table A-19 code-block style bit (and dense combos)
    decodes losslessly: bypass, per-pass reset, per-pass termination,
    vertically-causal contexts, segmentation symbols — alone and ORed.
    0x10 (predictable termination) is accepted and encoder-silent."""
    rng = np.random.default_rng(seed)
    h = int(rng.integers(1, 70))
    w = int(rng.integers(1, 70))
    style = int(rng.choice([0x01, 0x02, 0x04, 0x08, 0x20,
                            0x03, 0x0D, 0x29, 0x3F, 0x10]))
    comps = [rng.integers(0, 256, size=(h, w)).astype(np.uint8)
             for _ in range(int(rng.choice([1, 3])))]
    levels = int(rng.integers(0, 4))
    cs = X.encode_jpx(comps, lossless=True, levels=levels, cb_style=style)
    cod_at = cs.find(b"\xff\x52")
    assert cs[cod_at + 12] == style  # signalled in SPcod
    _, _, got, _ = X.decode_jpx(cs)
    for a, b in zip(got, comps):
        assert np.array_equal(a, b)


def test_segmentation_symbol_detects_corruption():
    """The 1010 marker after each cleanup pass is load-bearing: a
    corrupted MQ stream that would silently mis-decode without segsym
    raises ValueError (or still raises structurally) with it."""
    grad = (np.add.outer(np.arange(64), np.arange(64)) % 256).astype(np.uint8)
    coeffs = (grad.astype(np.int64) - 128)
    n_planes = 8
    segs, n_passes = X.encode_block_styled(
        coeffs, 0, n_planes, segsym=True
    )
    [seg] = segs
    # decode intact: identity
    got = X.decode_block(seg, 64, 64, 0, n_planes, n_passes, segsym=True)
    assert np.array_equal(got, coeffs)
    # corrupt a mid-stream byte: the marker check must catch at least
    # some corruptions a plain decode would swallow silently
    caught = 0
    for at in range(10, min(len(seg), 60)):
        bad = bytearray(seg)
        bad[at] ^= 0x5A
        try:
            X.decode_block(
                bytes(bad), 64, 64, 0, n_planes, n_passes, segsym=True
            )
        except ValueError:
            caught += 1
    assert caught > 0


def test_restart_per_pass_segments():
    """Per-pass termination (0x04): every coding pass is its own
    terminated segment and the packet header signals one length each."""
    rng = np.random.default_rng(6)
    coeffs = rng.integers(-127, 128, size=(32, 32)).astype(np.int64)
    n_planes = max(1, int(np.abs(coeffs).max()).bit_length())
    segs, n_passes = X.encode_block_styled(coeffs, 0, n_planes, restart=True)
    assert len(segs) == n_passes
    assert X._bypass_pieces(0, n_passes, restart=True) == \
        [(1, True)] * n_passes
    data, ends, off = b"", [], 0
    for s in segs:
        data += s
        off += len(s)
        ends.append(off)
    got = X.decode_block(
        data, 32, 32, 0, n_planes, n_passes,
        seg_ends=tuple(ends), restart=True,
    )
    assert np.array_equal(got, coeffs)


def test_poc_progression_volumes_roundtrip():
    """POC progression-order changes (A.6.6 / B.12.2): volumes with
    different orders — including a position-major volume over precincts
    and a component-split — reorder the physical packets and decode
    identically; a non-covering POC falls back to the COD order for the
    remainder (lenient stance, shared encoder/decoder)."""
    rng = np.random.default_rng(41)
    img = rng.integers(0, 256, size=(100, 100)).astype(np.uint8)
    rgb = [rng.integers(0, 256, size=(64, 64)).astype(np.uint8)
           for _ in range(3)]
    poc = [(0, 0, 1, 2, 1, 1), (2, 0, 1, 4, 1, 0)]
    cs = X.encode_jpx([img], lossless=True, levels=3, poc=poc)
    assert b"\xff\x5f" in cs  # the marker is physically present
    assert cs != X.encode_jpx([img], lossless=True, levels=3)
    _, _, got, _ = X.decode_jpx(cs)
    assert np.array_equal(got[0], img)
    # component-split volumes: comp 0 CPRL first, comps 1-2 RLCP after
    cs3 = X.encode_jpx(
        rgb, lossless=True, levels=2,
        poc=[(0, 0, 1, 3, 1, 4), (0, 1, 1, 3, 3, 1)],
    )
    _, _, got, _ = X.decode_jpx(cs3)
    for a, b in zip(got, rgb):
        assert np.array_equal(a, b)
    # POC over multiple precincts with a position-major volume
    csp = X.encode_jpx(
        [img], lossless=True, levels=2, precincts=(5, 5),
        poc=[(0, 0, 1, 2, 1, 2), (2, 0, 1, 3, 1, 0)],
    )
    _, _, got, _ = X.decode_jpx(csp)
    assert np.array_equal(got[0], img)
    # non-covering POC: the remainder rides the COD order
    csn = X.encode_jpx(
        [img], lossless=True, levels=3, poc=[(1, 0, 1, 2, 1, 1)]
    )
    _, _, got, _ = X.decode_jpx(csn)
    assert np.array_equal(got[0], img)
    # malformed POC bodies raise, never crash
    evil = bytearray(cs)
    at = bytes(evil).find(b"\xff\x5f")
    evil[at + 4] = 7  # RSpoc=7 > REpoc
    with pytest.raises(ValueError):
        X.decode_jpx(bytes(evil))


def test_rgn_roi_max_shift_roundtrip():
    """RGN ROI max-shift (T.800 H): per-component RGN markers carry the
    shift s; the decoder's |q| ≥ 2^s magnitude rule downscales ROI
    coefficients and the lossless roundtrip is exact — gray, RGB, and
    composed with bypass + precincts. Lossy/multi-tile ROI encode is
    refused loudly (the decoder rule itself is path-independent)."""
    rng = np.random.default_rng(51)
    img = rng.integers(0, 256, size=(96, 80)).astype(np.uint8)
    cs = X.encode_jpx([img], lossless=True, levels=3, roi=(10, 20, 50, 60))
    assert b"\xff\x5e" in cs
    _, _, got, _ = X.decode_jpx(cs)
    assert np.array_equal(got[0], img)
    rgb = [rng.integers(0, 256, size=(64, 64)).astype(np.uint8)
           for _ in range(3)]
    cs = X.encode_jpx(rgb, lossless=True, levels=2, roi=(0, 0, 32, 32))
    _, _, got, _ = X.decode_jpx(cs)
    for a, b in zip(got, rgb):
        assert np.array_equal(a, b)
    cs = X.encode_jpx(
        [img], lossless=True, levels=2, roi=(8, 8, 40, 40),
        bypass=True, precincts=(5, 5),
    )
    _, _, got, _ = X.decode_jpx(cs)
    assert np.array_equal(got[0], img)
    with pytest.raises(ValueError, match="roi"):
        X.encode_jpx([img], lossless=False, roi=(0, 0, 8, 8))
    # RGN with a non-max-shift style raises (crawl stance: loud)
    evil = bytearray(cs)
    at = bytes(evil).find(b"\xff\x5e")
    evil[at + 5] = 1  # Srgn != 0
    with pytest.raises(ValueError, match="RGN"):
        X.decode_jpx(bytes(evil))


def test_decode_contract_holds_for_crafted_marker_sequences():
    """Review-found contract escapes: tile-header POC before SIZ and
    mixed-dtype RCT raised TypeError instead of ValueError; both now
    degrade loudly. A zero-bit-plane included block decodes to zeros."""
    import struct as _s

    import numpy as np

    from gnosis_ocr_spark.functions.codec_jpx import decode_block, decode_jpx

    # SOC, then SOT whose tile-part header carries POC with no SIZ seen
    sot = b"\xff\x90" + _s.pack(">HHIBB", 10, 0, 14, 0, 1)
    poc = b"\xff\x5f" + _s.pack(">H", 9) + bytes(7)
    with pytest.raises(ValueError):
        decode_jpx(b"\xff\x4f" + sot + poc + b"\xff\x93")
    # n_planes == 0 included block: all-zero coefficients, no error
    out = decode_block(b"", 4, 4, 0, n_planes=0, n_passes=1)
    assert out.shape == (4, 4) and not out.any()
    # pass count past 3*Mb-2 is the loud structured error, not a shift crash
    with pytest.raises(ValueError, match="passes"):
        decode_block(b"\x00\x00", 4, 4, 0, n_planes=1, n_passes=2)
