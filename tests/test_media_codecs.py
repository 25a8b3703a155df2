"""WAV/MP4/GIF codec tests (functions/codec_media.py) and the real
multimodal metadata/feature/resize paths they unlock (round 4)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from gnosis_ocr_spark.functions import codec_media as M


def test_wav_roundtrip_info_and_samples():
    t = np.linspace(0, 2, 32000, endpoint=False)
    sig = (0.25 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    wav = M.build_wav(sig, 16000)
    ch, rate, bits, dur = M.wav_info(wav)
    assert (ch, rate, bits) == (1, 16000, 16)
    assert abs(dur - 2.0) < 1e-9
    s = M.wav_samples(wav)
    assert len(s) == 32000 and float(np.abs(s - sig).max()) < 1e-3
    with pytest.raises(ValueError):
        M.wav_info(b"RIFF\x00\x00\x00\x00WAVEjunk")
    with pytest.raises(ValueError):
        M.wav_info(b"not a wav")


def test_mp4_duration_box_walk():
    assert abs(M.mp4_duration(M.build_mp4(12.345)) - 12.345) < 1e-3
    assert abs(M.mp4_duration(M.build_mp4(0.5, timescale=90000)) - 0.5) < 1e-6
    with pytest.raises(ValueError):
        M.mp4_duration(b"\x00\x00\x00\x10ftypisom\x00\x00\x02\x00")  # no moov
    with pytest.raises(ValueError):
        M.mp4_duration(b"RIFFxxxx")


def test_gif_gray_roundtrip_exact():
    px = bytes((x * 7 + 13) % 256 for x in range(40 * 25))
    gif = M.encode_gray_gif(px, 40, 25)
    assert M.gif_dimensions(gif) == (40, 25)
    w, h, out = M.decode_gif_gray(gif)
    # identity gray palette → the roundtrip is EXACT
    assert (w, h) == (40, 25) and out == px
    with pytest.raises(ValueError):
        M.decode_gif_gray(b"GIF8 garbage")


def test_gif_interlaced_decode():
    """Interlace pass reordering: rows land where the 4-pass schedule puts
    them, verified against a straight (non-interlaced) encode."""
    px = bytes((y * 16 + x) % 256 for y in range(16) for x in range(8))
    # image descriptor sits right after header(6) + LSD(7) + 256-entry
    # palette(768) — computed structurally, NOT via index() (0x2C occurs
    # inside the gray palette)
    desc = 6 + 7 + 768
    rows = [px[y * 8 : (y + 1) * 8] for y in range(16)]
    order = (
        list(range(0, 16, 8)) + list(range(4, 16, 8))
        + list(range(2, 16, 4)) + list(range(1, 16, 2))
    )
    stored = b"".join(rows[r] for r in order)
    inter = M.encode_gray_gif(stored, 8, 16)
    inter = bytearray(inter)
    inter[desc + 9] |= 0x40
    w, h, out = M.decode_gif_gray(bytes(inter))
    assert out == px


def test_multimodal_metadata_is_real_for_all_sniffed_types(spark):
    from gnosis_ocr_spark.functions.codec_jpeg import encode_gray_jpeg
    from gnosis_ocr_spark.functions.codec_png import encode_page_png
    from gnosis_ocr_spark.operators.multimodal import media_metadata

    from gnosis_ocr_spark.functions.codec_jpx import encode_jp2, encode_jpx

    wav = M.build_wav(np.zeros(8000, dtype=np.float32), 16000)
    j2arr = np.zeros((20, 35), dtype=np.uint8)
    rows = [
        ("png", bytearray(encode_page_png("x", 30, 20))),
        ("jpg", bytearray(encode_gray_jpeg(bytes(50 * 40), 50, 40))),
        ("gif", bytearray(M.encode_gray_gif(bytes(25 * 10), 25, 10))),
        ("wav", bytearray(wav)),
        ("mp4", bytearray(M.build_mp4(3.25))),
        ("jp2", bytearray(encode_jp2([j2arr]))),
        ("j2c", bytearray(encode_jpx([j2arr]))),  # raw codestream form
    ]
    df = spark.createDataFrame(rows, schema="url string, data binary")
    got = {r["url"]: r.asDict() for r in media_metadata(df).collect()}
    assert (got["png"]["width"], got["png"]["height"]) == (30, 20)
    assert (got["jpg"]["width"], got["jpg"]["height"]) == (50, 40)
    assert (got["gif"]["width"], got["gif"]["height"]) == (25, 10)
    assert got["wav"]["duration_sec"] == 0.5
    assert got["mp4"]["duration_sec"] == 3.25
    for k in ("jp2", "j2c"):
        assert got[k]["media_type"] == "image/jp2"
        assert (got[k]["width"], got[k]["height"]) == (35, 20)


def test_multimodal_features_real_for_decodable_media(spark):
    """JPEG/GIF features come from DECODED pixels (identical content ⇒
    near-identical histograms even across formats); WAV features are real
    amplitude statistics (silence → all mass in bin 0)."""
    from gnosis_ocr_spark.functions.codec_jpeg import encode_gray_jpeg
    from gnosis_ocr_spark.operators.multimodal import media_features

    from gnosis_ocr_spark.functions.codec_jpx import encode_jp2

    px = bytes((x * 11 + 5) % 256 for x in range(48 * 48))
    jp2 = encode_jp2([np.frombuffer(px, np.uint8).reshape(48, 48)])
    rows = [
        ("jpg", bytearray(encode_gray_jpeg(px, 48, 48))),
        ("gif", bytearray(M.encode_gray_gif(px, 48, 48))),
        ("jp2", bytearray(jp2)),
        ("silence", bytearray(M.build_wav(np.zeros(4000, dtype=np.float32)))),
    ]
    df = spark.createDataFrame(rows, schema="url string, data binary")
    got = {r["url"]: np.array(r["feature"]) for r in media_features(df, dim=8).collect()}
    # same pixels through two real decoders → same histogram (±jpeg noise)
    assert float(np.abs(got["jpg"] - got["gif"]).max()) < 0.02
    # lossless wavelet decode → histogram EXACTLY equals the GIF''s
    assert float(np.abs(got["jp2"] - got["gif"]).max()) == 0.0
    assert got["silence"][0] == pytest.approx(1.0)
    assert float(got["silence"][1:].sum()) == 0.0


def test_resize_real_for_jpeg_gif_and_jp2(spark):
    from gnosis_ocr_spark.functions.codec_jpeg import encode_gray_jpeg
    from gnosis_ocr_spark.functions.codec_png import decode_dimensions
    from gnosis_ocr_spark.operators.multimodal import resize_images

    from gnosis_ocr_spark.functions.codec_jpx import encode_jp2

    big = bytes((x * 3 + 1) % 256 for x in range(300 * 120))
    jp2 = encode_jp2([np.frombuffer(big, np.uint8).reshape(120, 300)])
    rows = [
        ("jpg", bytearray(encode_gray_jpeg(big, 300, 120))),
        ("gif", bytearray(M.encode_gray_gif(big, 300, 120))),
        ("jp2", bytearray(jp2)),
        ("badjpg", bytearray(b"\xff\xd8\xff\xe0junkjunkjunk")),
    ]
    df = spark.createDataFrame(rows, schema="url string, data binary")
    got = {r["url"]: r.asDict() for r in resize_images(df, max_dim=64).collect()}
    for u in ("jpg", "gif", "jp2"):
        assert got[u]["status"] == "resized"
        assert max(got[u]["width"], got[u]["height"]) <= 64
        # output is a REAL decodable PNG of the resized pixels
        assert decode_dimensions(bytes(got[u]["data"])) == (
            got[u]["width"], got[u]["height"],
        )
    assert got["badjpg"]["status"] == "passthrough"
    assert got["badjpg"]["width"] is None


def _foreign_png(w, h, depth, ctype, rows_raw, plte=None):
    """Hand-built PNG in a shape OUR writers never emit (foreign-crawl
    simulation): arbitrary filter types / color types / palettes."""
    import struct as _s
    import zlib as _z

    from gnosis_ocr_spark.functions import codec_png as G

    ihdr = _s.pack(">IIBBBBB", w, h, depth, ctype, 0, 0, 0)
    out = G._MAGIC + G._chunk(b"IHDR", ihdr)
    if plte:
        out += G._chunk(b"PLTE", plte)
    # split the IDAT in two — multi-IDAT files are common in the wild
    z = _z.compress(rows_raw)
    return (out + G._chunk(b"IDAT", z[: len(z) // 2])
            + G._chunk(b"IDAT", z[len(z) // 2 :]) + G._chunk(b"IEND", b""))


def test_general_png_decoder_rgb_paeth_and_palette(spark):
    """Real-crawl PNG shapes (RGB + Paeth filter, 1-bit palette, split
    IDATs) decode through codec_png.decode_png_gray, and the multimodal
    resize path consumes them instead of passing through."""
    from gnosis_ocr_spark.functions.codec_png import decode_png_gray
    from gnosis_ocr_spark.operators.multimodal import resize_images

    w, h = 6, 4
    rgb = np.arange(w * h * 3, dtype=np.uint8).reshape(h, w * 3)
    rows = bytearray()
    for y in range(h):
        rows.append(0)  # None filter keeps expected values trivial
        rows += rgb[y].tobytes()
    png = _foreign_png(w, h, 8, 2, bytes(rows))
    w2, h2, gray = decode_png_gray(png)
    lum = rgb.reshape(h, w, 3).astype(np.uint32)
    exp = ((lum[:, :, 0] * 299 + lum[:, :, 1] * 587 + lum[:, :, 2] * 114)
           // 1000).astype(np.uint8)
    assert (w2, h2) == (w, h) and gray == exp.tobytes()

    # Paeth-filtered grayscale roundtrip: filter math vs the spec formula
    gw, gh = 9, 5
    src = np.arange(gw * gh, dtype=np.uint8).reshape(gh, gw)
    rows = bytearray()
    prev = np.zeros(gw, dtype=int)
    for y in range(gh):
        rows.append(4)  # Paeth
        row = src[y].astype(int)
        enc = []
        for i in range(gw):
            a = row[i - 1] if i else 0
            b = prev[i]
            c = prev[i - 1] if i else 0
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            enc.append((row[i] - pred) & 0xFF)
        rows += bytes(enc)
        prev = row
    png = _foreign_png(gw, gh, 8, 0, bytes(rows))
    assert decode_png_gray(png)[2] == src.tobytes()

    # big foreign RGB PNG flows through resize (status=resized, real PNG out)
    big_w, big_h = 120, 90
    body = bytearray()
    for y in range(big_h):
        body.append(0)
        body += bytes((x * 3 + y) % 256 for x in range(big_w * 3))
    foreign = _foreign_png(big_w, big_h, 8, 2, bytes(body))
    df = spark.createDataFrame(
        [("f", bytearray(foreign))], schema="url string, data binary"
    )
    [row] = resize_images(df, max_dim=40).collect()
    assert row["status"] == "resized" and max(row["width"], row["height"]) <= 40


def _adam7_png(src: np.ndarray) -> bytes:
    """Interlaced grayscale PNG of ``src`` (h, w) built BY HAND from the
    spec's pass geometry (filter-0 rows per sub-image) — an independent
    writer so the decoder isn't graded against itself."""
    import struct as _s
    import zlib as _z

    from gnosis_ocr_spark.functions import codec_png as G

    h, w = src.shape
    raw = bytearray()
    for x0, dx, y0, dy in ((0, 8, 0, 8), (4, 8, 0, 8), (0, 4, 4, 8),
                           (2, 4, 0, 4), (0, 2, 2, 4), (1, 2, 0, 2),
                           (0, 1, 1, 2)):
        sub = src[y0::dy, x0::dx]
        if sub.size == 0:
            continue
        for row in sub:
            raw.append(0)  # filter None
            raw += row.tobytes()
    ihdr = _s.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 1)  # interlace=1
    return (G._MAGIC + G._chunk(b"IHDR", ihdr)
            + G._chunk(b"IDAT", _z.compress(bytes(raw)))
            + G._chunk(b"IEND", b""))


def test_general_png_decoder_adam7_interlace():
    """Adam7-interlaced crawl PNGs (round-4 VERDICT task #6) decode to the
    same pixels as the straight encoding — exercised at sizes that produce
    empty passes (w or h < 5) and partial final passes."""
    from gnosis_ocr_spark.functions.codec_png import decode_png_gray

    for w, h in ((1, 1), (3, 2), (8, 8), (13, 7), (33, 17)):
        src = ((np.arange(h)[:, None] * 31 + np.arange(w) * 7) % 251).astype(
            np.uint8
        )
        got_w, got_h, gray = decode_png_gray(_adam7_png(src))
        assert (got_w, got_h) == (w, h)
        assert gray == src.tobytes(), (w, h)


def test_general_png_decoder_rejects_bombs():
    import struct as _s

    from gnosis_ocr_spark.functions import codec_png as G
    from gnosis_ocr_spark.functions.codec_png import decode_png_gray

    ihdr = _s.pack(">IIBBBBB", 60000, 60000, 8, 0, 0, 0, 0)  # 3.6 GPix bomb
    png = G._MAGIC + G._chunk(b"IHDR", ihdr) + G._chunk(b"IDAT", b"x") + G._chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="unreasonable"):
        decode_png_gray(png)
    # zip-bomb IDAT: small dims, stream decompressing far past the need
    import zlib as _z

    ihdr = _s.pack(">IIBBBBB", 4, 4, 8, 0, 0, 0, 0)
    bomb = _z.compress(b"\x00" * 10_000_000)
    png = (G._MAGIC + G._chunk(b"IHDR", ihdr) + G._chunk(b"IDAT", bomb)
           + G._chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="past expected size"):
        decode_png_gray(png)


def test_cross_format_near_dup_via_media_features(spark):
    """The claimed composition media_features → similarity actually works:
    the SAME image stored as PNG, JPEG and GIF (three real decoders) lands
    in one near-dup cluster on feature-cosine, while a different image
    stays out. This is the cross-modal dedup path a crawl pipeline runs
    over image payloads."""
    from gnosis_ocr_spark.functions.codec_jpeg import encode_gray_jpeg
    from gnosis_ocr_spark.functions.codec_png import encode_gray_png
    from gnosis_ocr_spark.functions.similarity import cosine_topk_bruteforce
    from gnosis_ocr_spark.operators.multimodal import media_features

    px_a = bytes((x * 11 + 5) % 256 for x in range(64 * 64))
    px_b = bytes(255 - ((x * 13) % 97) for x in range(64 * 64))  # skewed hist
    rows = [
        ("a-png", bytearray(encode_gray_png(px_a, 64, 64))),
        ("a-jpg", bytearray(encode_gray_jpeg(px_a, 64, 64))),
        ("a-gif", bytearray(M.encode_gray_gif(px_a, 64, 64))),
        ("b-gif", bytearray(M.encode_gray_gif(px_b, 64, 64))),
    ]
    df = spark.createDataFrame(rows, schema="url string, data binary")
    feats = media_features(df, dim=16).select(
        F.col("url").alias("vec_id"),
        F.col("feature").cast("array<double>").alias("embedding"),
    )
    queries = feats.select(F.col("vec_id").alias("query_id"), "embedding")
    top = cosine_topk_bruteforce(feats, queries, k=3)
    by_query = {}
    for r in top.collect():
        by_query.setdefault(r["query_id"], []).append((r["vec_id"], r["cos"]))
    # each format of image A ranks the other two formats above image B
    a_all = {"a-png", "a-jpg", "a-gif"}
    for q in sorted(a_all):
        ranked = [v for v, _ in sorted(by_query[q], key=lambda t: -t[1])
                  if v != q]
        assert set(ranked[:2]) == a_all - {q}, (q, by_query[q])
        sims = dict(by_query[q])
        assert all(sims[o] > 0.99 for o in a_all - {q}), by_query[q]


def test_mp4_video_sample_table_roundtrip():
    """build_mp4_video writes full stsd/stts/stss/stsz/stsc/stco tables;
    mp4_video_samples recovers every sample's exact bytes, true decode
    timestamp, and sync flag — the container-level keyframe map a 100 TB
    frame sampler needs before any codec runs."""
    from gnosis_ocr_spark.functions.codec_media import (
        build_mp4_video,
        mp4_duration,
        mp4_video_samples,
    )

    payloads = [bytes([i]) * (20 + 3 * i) for i in range(12)]
    mp4 = build_mp4_video(payloads, fps=10, width=64, height=48, sync_every=5)
    info = mp4_video_samples(mp4)
    assert info["codec"] == "avc1"
    assert (info["width"], info["height"]) == (64, 48)
    assert len(info["samples"]) == len(payloads)
    for i, (off, size, ts, sync) in enumerate(info["samples"]):
        assert mp4[off : off + size] == payloads[i]
        assert abs(ts - i * 0.1) < 1e-9
        assert sync == (i % 5 == 0)
    # mvhd duration agrees with the track's sample count / fps
    assert abs(mp4_duration(mp4) - 1.2) < 1e-9
    # no-stss variant: every sample is sync (ISO 14496-12 §8.6.2)
    import re as _re

    no_stss = _re.sub(
        rb"(....)stss", rb"\1free", mp4, count=1, flags=_re.DOTALL
    )
    info2 = mp4_video_samples(no_stss)
    assert all(s[3] for s in info2["samples"])


def test_mp4_video_samples_hostile_and_absent():
    from gnosis_ocr_spark.functions.codec_media import (
        build_mp4,
        mp4_video_samples,
    )

    import pytest as _pytest

    with _pytest.raises(ValueError):
        mp4_video_samples(b"\x00\x00\x00\x18ftypmp42" + b"\x00" * 32)
    with _pytest.raises(ValueError):  # audio-only / no video trak
        mp4_video_samples(build_mp4(3.0))
    with _pytest.raises(ValueError):
        mp4_video_samples(b"not a video at all")


def test_sample_frames_real_keyframe_payloads(spark):
    """sample_frames over a sample-table MP4 emits the ACTUAL encoded
    keyframe bytes with true timestamps and codec fourcc; the table-less
    MP4 falls back to the stub path with payload null."""
    from gnosis_ocr_spark.functions.codec_media import build_mp4, build_mp4_video
    from gnosis_ocr_spark.operators.multimodal import sample_frames

    payloads = [bytes([0x65, i]) * 30 for i in range(20)]
    real = build_mp4_video(payloads, fps=10, sync_every=5)  # syncs at 0,5,10,15
    legacy = build_mp4(2.0)
    df = spark.createDataFrame(
        [("real", bytearray(real)), ("legacy", bytearray(legacy))],
        schema="url string, data binary",
    )
    rows = sample_frames(df, every_sec=0.25, max_frames=3).collect()
    got = {}
    for r in rows:
        got.setdefault(r["url"], []).append(r)
    real_rows = sorted(got["real"], key=lambda r: r["frame_no"])
    # sync samples are 0.1 s apart in sync index steps of 5 -> 0.0, 0.5, 1.0
    assert [r["ts_sec"] for r in real_rows] == [0.0, 0.5, 1.0]
    assert [bytes(r["payload"]) for r in real_rows] == [
        payloads[0], payloads[5], payloads[10]
    ]
    assert all(r["is_sync"] and r["codec"] == "avc1" for r in real_rows)
    legacy_rows = got["legacy"]
    assert all(r["payload"] is None and r["codec"] == "stub" for r in legacy_rows)


def test_sample_frames_mjpeg_real_pixel_decode(spark):
    """A motion-JPEG MP4 ('jpeg' visual sample entry, samples = plain JFIF
    images): sample_frames decodes ACTUAL pixels through the in-repo JPEG
    decoder — the frame column equals the JPEG-decode of each payload,
    not the payload-hash stub."""
    import numpy as np

    from gnosis_ocr_spark.functions.codec_jpeg import decode_jpeg, encode_gray_jpeg
    from gnosis_ocr_spark.functions.codec_media import build_mp4_video
    from gnosis_ocr_spark.functions.codec_png import decode_pixels
    from gnosis_ocr_spark.operators.multimodal import sample_frames

    w, h = 48, 32
    payloads = [
        encode_gray_jpeg(
            bytes(((x * 7 + 13 * i) % 256) for x in range(w * h)), w, h
        )
        for i in range(3)
    ]
    mjpeg = build_mp4_video(
        payloads, fps=1, timescale=10, sync_every=1, width=w, height=h,
        codec_fourcc=b"jpeg",
    )
    df = spark.createDataFrame(
        [("mj", bytearray(mjpeg))], schema="url string, data binary"
    )
    rows = sorted(
        sample_frames(df, every_sec=0.0, max_frames=8).collect(),
        key=lambda r: r["frame_no"],
    )
    assert len(rows) == 3
    for r, payload in zip(rows, payloads):
        assert r["codec"] == "jpeg" and r["is_sync"]
        assert bytes(r["payload"]) == payload
        fw, fh, _nc, want = decode_jpeg(payload)
        got = np.frombuffer(decode_pixels(bytes(r["frame"])), dtype=np.uint8)
        assert (fw, fh) == (w, h)
        assert np.array_equal(got, np.frombuffer(want, dtype=np.uint8))


def test_fast_path_png_decoder_rejects_bombs():
    """decode_pixels (the filter-0 fast path media_features tries FIRST on
    raw crawl bytes) bounds its inflate to the declared geometry — a zlib
    bomb behind a 4x4 IHDR raises instead of allocating 10 MB."""
    import struct as _s
    import zlib as _z

    from gnosis_ocr_spark.functions import codec_png as G
    from gnosis_ocr_spark.functions.codec_png import decode_pixels

    ihdr = _s.pack(">IIBBBBB", 4, 4, 8, 0, 0, 0, 0)
    bomb = _z.compress(b"\x00" * 10_000_000)
    png = (G._MAGIC + G._chunk(b"IHDR", ihdr) + G._chunk(b"IDAT", bomb)
           + G._chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="past expected size"):
        decode_pixels(png)


def test_fast_path_png_rejects_huge_dims_and_short_idat():
    """The fast path's geometry bound cannot be defeated by declaring huge
    dimensions (50 MPix gate, same as the general decoder), and a first
    IDAT that inflates SHORT (multi-IDAT/truncated PNGs) raises so callers
    fall back to decode_png_gray's all-chunk path — never a silently short
    pixel buffer."""
    import struct as _s
    import zlib as _z

    from gnosis_ocr_spark.functions import codec_png as G
    from gnosis_ocr_spark.functions.codec_png import decode_pixels, decode_png_gray

    ihdr = _s.pack(">IIBBBBB", 65535, 65535, 8, 0, 0, 0, 0)
    png = (G._MAGIC + G._chunk(b"IHDR", ihdr)
           + G._chunk(b"IDAT", _z.compress(b"\x00" * 1000)) + G._chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="unreasonable"):
        decode_pixels(png)
    # split-IDAT: valid 4x4 image, scanlines split across two IDAT chunks
    w = h = 4
    raw = b"".join(b"\x00" + bytes(range(i * w, (i + 1) * w)) for i in range(h))
    z = _z.compress(raw)
    ihdr = _s.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    split = (G._MAGIC + G._chunk(b"IHDR", ihdr)
             + G._chunk(b"IDAT", z[:6]) + G._chunk(b"IDAT", z[6:])
             + G._chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="truncated IDAT"):
        decode_pixels(split)
    gw, gh, gray = decode_png_gray(split)  # the fallback reads all chunks
    assert (gw, gh) == (w, h) and gray == bytes(range(16))


def test_features_and_resize_handle_progressive_jpeg(spark):
    """Progressive (SOF2) JPEGs — common in web crawls — get REAL decoded
    features and a real resize, not the bytes-histogram stub / passthrough
    (the branches previously used the baseline-only decoder)."""
    import numpy as np

    from gnosis_ocr_spark.functions.codec_jpeg import (
        decode_jpeg,
        encode_gray_jpeg_progressive,
    )
    from gnosis_ocr_spark.operators.multimodal import media_features, resize_images

    px = bytes((x * 5 + 3) % 256 for x in range(300 * 40))
    prog = encode_gray_jpeg_progressive(px, 300, 40)
    base_luma = np.frombuffer(decode_jpeg(prog)[3], dtype=np.uint8)
    df = spark.createDataFrame([("p", bytearray(prog))], "url string, data binary")
    feat = np.array(media_features(df, dim=8).collect()[0]["feature"])
    want, _ = np.histogram(base_luma, bins=8, range=(0, 256))
    assert np.allclose(feat, want / len(base_luma))
    r = resize_images(df, max_dim=64).collect()[0]
    assert r["status"] == "resized" and max(r["width"], r["height"]) <= 64


def test_zero_width_png_is_rejected_and_resize_stays_total(spark):
    """A hostile IHDR declaring w=0 passes a bare-pixel-count gate (0*h=0);
    decode_pixels must reject it and resize_images must emit a loud
    passthrough row, not crash the task on an empty array."""
    import struct as _s
    import zlib as _z

    from gnosis_ocr_spark.functions import codec_png as G
    from gnosis_ocr_spark.functions.codec_png import decode_pixels
    from gnosis_ocr_spark.operators.multimodal import resize_images

    ihdr = _s.pack(">IIBBBBB", 0, 300, 8, 0, 0, 0, 0)
    png = (G._MAGIC + G._chunk(b"IHDR", ihdr)
           + G._chunk(b"IDAT", _z.compress(b"\x00" * 300))
           + G._chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="unreasonable"):
        decode_pixels(png)
    df = spark.createDataFrame([("z", bytearray(png))], "url string, data binary")
    rows = resize_images(df, max_dim=64).collect()
    assert len(rows) == 1 and rows[0]["status"] == "passthrough"


def test_ico_codec_and_multimodal_surface(spark):
    """ICO (favicons — every crawl fetches them): directory parse, PNG and
    8/24/32-bpp DIB entry decode, largest-entry selection, sniff refined
    by structure (the weak 00 00 01 00 magic alone never claims the type),
    and real metadata/features/resize through the multimodal operators."""
    import numpy as np

    from gnosis_ocr_spark.functions.codec_media import (
        build_ico,
        decode_ico_gray,
        ico_info,
        is_ico,
    )
    from gnosis_ocr_spark.operators.multimodal import (
        media_features,
        media_metadata,
        resize_images,
        sniff_media_type,
    )

    g16 = ((np.arange(256).reshape(16, 16) * 7) % 256).astype(np.uint8)
    g48 = ((np.arange(48 * 48).reshape(48, 48) * 3) % 256).astype(np.uint8)
    for kind in ("png", "dib32", "dib24", "dib8"):
        ico = build_ico([(g16, "dib24"), (g48, kind)])
        assert is_ico(ico) and ico_info(ico)["count"] == 2
        w, h, gray = decode_ico_gray(ico)
        assert (w, h) == (48, 48)
        assert np.array_equal(
            np.frombuffer(gray, np.uint8).reshape(48, 48), g48
        ), kind
    # structure-refined sniff: magic alone is not enough
    assert sniff_media_type(build_ico([(g16, "png")])) == "image/x-icon"
    assert sniff_media_type(b"\x00\x00\x01\x00\xff\xff" + b"x" * 64) \
        == "application/octet-stream"
    # hostile: truncated directory / payload raise loudly in the codec
    full = build_ico([(g48, "dib32")])
    with pytest.raises(ValueError):
        ico_info(full[:10])
    df = spark.createDataFrame(
        [("fav", bytearray(build_ico([(g16, "dib24"), (g48, "png")])))],
        "url string, data binary",
    )
    meta = media_metadata(df).collect()[0]
    assert meta["media_type"] == "image/x-icon"
    assert (meta["width"], meta["height"]) == (48, 48)
    feat = np.array(media_features(df, dim=8).collect()[0]["feature"])
    want, _ = np.histogram(g48, bins=8, range=(0, 256))
    assert np.allclose(feat, want / g48.size)
    r = resize_images(df, max_dim=24).collect()[0]
    assert r["status"] == "resized" and max(r["width"], r["height"]) <= 24


def test_ico_topdown_dib_decodes_unmirrored():
    """A nonstandard top-down DIB (negative biHeight) must not be
    vertically mirrored by the bottom-up row flip."""
    import struct as _s

    import numpy as np

    from gnosis_ocr_spark.functions.codec_media import build_ico, decode_ico_gray

    g = ((np.arange(8 * 8).reshape(8, 8) * 5) % 256).astype(np.uint8)
    ico = bytearray(build_ico([(g, "dib32")]))
    # flip biHeight's sign in the DIB header (entry payload starts at 6+16)
    off = 6 + 16
    (bh2,) = _s.unpack_from("<i", ico, off + 8)
    _s.pack_into("<i", ico, off + 8, -bh2)
    # rows were written bottom-up by the builder; a top-down reader must
    # interpret them as-is (so the image comes back vertically flipped
    # RELATIVE TO the original, matching what the bytes now declare)
    w, h, gray = decode_ico_gray(bytes(ico))
    got = np.frombuffer(gray, np.uint8).reshape(h, w)
    assert np.array_equal(got, g[::-1])


def test_corrupt_idat_raises_valueerror_not_zlib_error():
    """Corrupt deflate bytes inside IDAT keep the codec's ValueError
    contract (callers distinguish decode failure from bugs by it) —
    found by fuzz: a PNG-entry ICO with flipped payload bytes leaked a
    raw zlib.error through decode_ico_gray."""
    import struct as _s
    import zlib as _z

    from gnosis_ocr_spark.functions import codec_png as G
    from gnosis_ocr_spark.functions.codec_png import decode_pixels, decode_png_gray

    good = _z.compress(b"\x00" * (5 * 5 + 5))
    corrupt = good[:8] + bytes([good[8] ^ 0xFF]) + good[9:]
    ihdr = _s.pack(">IIBBBBB", 5, 5, 8, 0, 0, 0, 0)
    png = (G._MAGIC + G._chunk(b"IHDR", ihdr) + G._chunk(b"IDAT", corrupt)
           + G._chunk(b"IEND", b""))
    with pytest.raises(ValueError):
        decode_png_gray(png)
    with pytest.raises(ValueError):
        decode_pixels(png)
