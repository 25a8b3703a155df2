"""Multimodal columns: image/audio/video as opaque ``binary`` + typed
metadata.

The Spark-side plumbing (schemas, Arrow batching, ``mapInPandas`` signatures,
partitioning) is real and tested; the codec work that needs PIL/ffmpeg —
absent from this container — is stubbed behind ``DECODERS`` with deterministic
fakes, clearly marked. Swapping in real decoders changes only the inner
function bodies, not the Spark plan.

Sniffing is real: magic-byte dispatch for PNG/JPEG/GIF/TIFF/BMP/WebP/
WAV/MP4/JP2 (weak magics — RIFF, "BM" — are refined by structure checks
before a type is claimed). The metadata layer is REAL for every sniffed
type (image dimensions incl. TIFF IFD / BMP DIB / WebP VP8-header parses,
WAV/MP4 duration — functions/codec_media.py, codec_jpeg.py,
codec_tiff.py), pixel decode is real for PNG/baseline-JPEG/GIF/JP2 and
for TIFF (stripped AND tiled, 1/8/16-bit, CCITT fax, LZW/deflate/
PackBits, new-style JPEG-in-TIFF — codec_tiff composes the in-repo
decoders) and BMP, and
audio features are real DSP over 16-bit PCM (WAV) and over full FLAC
frame decode (functions/codec_flac.py: rice/fixed/LPC subframes, stereo
decorrelation, CRC-8/16 + STREAMINFO-MD5 verified — the built-in
integrity oracle every FLAC stream carries). WebP pixel decode is REAL
for BOTH lossless (VP8L — the full prefix-code/LZ77/transform stack in
functions/codec_vp8l.py) and lossy payloads (VP8 key frames in
functions/codec_vp8.py, conformance-verified byte-for-byte against the
system libwebp). Video keyframe SAMPLING is real at the
container level (round 5): sample_frames walks the MP4 sample tables
(codec_media.mp4_video_samples) and emits actual encoded keyframe bytes
+ true timestamps, and pixel decode of those payloads is REAL for
I_PCM-coded H.264 (codec_h264 via the track's avcC). Entropy-coded
(CAVLC/CABAC) frames keep a deterministic fake — the honest boundary
documented in codec_h264's header.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gnosis_ocr_spark.functions.codec_png import decode_dimensions, decode_pixels

MEDIA_META_SCHEMA = (
    "url string, media_type string, byte_len long, width int, height int, "
    "duration_sec double"
)
FEATURE_SCHEMA = "url string, media_type string, feature array<float>"

_MAGIC = [
    (b"\x89PNG\r\n\x1a\n", "image/png"),
    (b"\xff\xd8\xff", "image/jpeg"),
    (b"GIF8", "image/gif"),
    (b"RIFF", "audio/wav"),  # refined below: WAVE → wav, WEBP → webp
    (b"%PDF-", "application/pdf"),
    (b"\x00\x00\x00\x0cjP  \r\n\x87\n", "image/jp2"),  # JP2 signature box
    (b"\xff\x4f\xff\x51", "image/jp2"),  # raw JPEG 2000 codestream (SOC+SIZ)
    (b"II*\x00", "image/tiff"),  # little-endian TIFF
    (b"MM\x00*", "image/tiff"),  # big-endian TIFF
    (b"fLaC", "audio/flac"),  # FLAC stream marker
    (b"OggS", "audio/ogg"),  # Ogg container (Vorbis/Opus)
    (b"BM", "image/bmp"),  # refined below: 2-byte magic needs a DIB check
]


def sniff_media_type(data: bytes | None) -> str:
    if not data:
        return "empty"
    for magic, mtype in _MAGIC:
        if data[: len(magic)] == magic:
            if mtype == "audio/wav":
                if data[8:12] == b"WAVE":
                    return "audio/wav"
                if data[8:12] == b"WEBP":
                    return "image/webp"
                return "application/octet-stream"
            if mtype == "image/bmp":
                # "BM" alone matches text too; require a known DIB header
                # size word at offset 14 before claiming BMP
                if len(data) < 26 or data[14] not in (12, 40, 52, 56, 108, 124) \
                        or data[15:18] != b"\x00\x00\x00":
                    return "application/octet-stream"
                return "image/bmp"
            return mtype
    if len(data) > 11 and data[4:8] == b"ftyp":
        # ISO-BMFF: brand dispatch separates HEIF/AVIF stills from video
        from gnosis_ocr_spark.functions.codec_media import bmff_media_type

        return bmff_media_type(data)
    if data[:1] in (b"<", b"\xef") and data[:5] != b"<html":
        # text-rooted payload: standalone SVG has no magic, only its root tag
        from gnosis_ocr_spark.functions.codec_media import is_svg

        if is_svg(data):
            return "image/svg+xml"
    if data[:3] == b"ID3" or (len(data) > 3 and data[0] == 0xFF and (data[1] & 0xE0) == 0xE0):
        # MPEG audio: ID3v2 tag, or a frame sync that must chain to a
        # second frame (is_mp3) — a lone 0xFFEx matches random binary
        from gnosis_ocr_spark.functions.codec_media import is_mp3

        if is_mp3(data):
            return "audio/mpeg"
    if data[:4] == b"\x00\x00\x01\x00":
        # ICO (favicons — every crawl fetches them): weak 4-byte magic,
        # refined by the directory-structure check before a type is claimed
        from gnosis_ocr_spark.functions.codec_media import is_ico

        if is_ico(data):
            return "image/x-icon"
    return "application/octet-stream"


_IMAGE_TYPES = frozenset(
    {"image/png", "image/jpeg", "image/gif", "image/bmp", "image/webp", "image/jp2"}
)


def is_raster_image(data: bytes | None) -> bool:
    """True for standalone raster payloads the OCR pipeline can rasterize
    (TIFF excluded — it has its own multi-page route)."""
    return sniff_media_type(data) in _IMAGE_TYPES


def decode_image_gray(data: bytes) -> tuple[int, int, bytes] | None:
    """One standalone raster image → (w, h, 8-bit gray pixels), or None
    when undecodable (arithmetic JPEG, corrupt bytes). The
    shared decode dispatch for the pipeline's standalone-image OCR route."""
    try:
        mtype = sniff_media_type(data)
        if mtype == "image/png":
            from gnosis_ocr_spark.functions.codec_png import decode_png_gray

            return decode_png_gray(data)
        if mtype == "image/jpeg":
            from gnosis_ocr_spark.functions.codec_jpeg import (
                decode_jpeg,
                exif_orientation,
                orient_gray,
            )

            w, h, _, luma = decode_jpeg(data)
            # crawl JPEGs carry EXIF orientation that conformant viewers
            # (and thus the reference's poppler rendering) apply before
            # display — OCR must see the upright pixels
            luma, w, h = orient_gray(luma, w, h, exif_orientation(data))
            return w, h, luma
        if mtype == "image/gif":
            from gnosis_ocr_spark.functions.codec_media import decode_gif_gray

            return decode_gif_gray(data)
        if mtype == "image/bmp":
            from gnosis_ocr_spark.functions.codec_media import decode_bmp_gray

            return decode_bmp_gray(data)
        if mtype == "image/webp":
            from gnosis_ocr_spark.functions.codec_vp8l import decode_webp_gray

            return decode_webp_gray(data)
        if mtype == "image/jp2":
            from gnosis_ocr_spark.functions.codec_jpx import decode_jpx_gray

            return decode_jpx_gray(data)
    except Exception:
        return None
    return None


def _decode_png_meta(data: bytes) -> tuple[int | None, int | None, float | None]:
    w, h = decode_dimensions(data)
    return w, h, None


def _decode_jpeg_meta(data: bytes) -> tuple[int | None, int | None, float | None]:
    """REAL JPEG dimensions from the SOF marker (codec_jpeg; any DCT-family
    SOF — the pixel decode path additionally handles the baseline subset).
    EXIF orientations 5-8 swap the reported w/h — the upright dimensions
    a browser shows, consistent with the OCR/resize paths."""
    from gnosis_ocr_spark.functions.codec_jpeg import (
        decode_jpeg_dimensions,
        exif_orientation,
    )

    w, h, _ = decode_jpeg_dimensions(data)
    if exif_orientation(data) >= 5:
        w, h = h, w
    return w, h, None


def _decode_gif_meta(data: bytes) -> tuple[int | None, int | None, float | None]:
    """REAL GIF logical-screen dimensions (codec_media)."""
    from gnosis_ocr_spark.functions.codec_media import gif_dimensions

    w, h = gif_dimensions(data)
    return w, h, None


def _decode_wav_meta(data: bytes) -> tuple[int | None, int | None, float | None]:
    """REAL WAV duration from the RIFF fmt/data chunks (codec_media)."""
    from gnosis_ocr_spark.functions.codec_media import wav_info

    _, _, _, dur = wav_info(data)
    return None, None, round(dur, 3)


def _decode_mp4_meta(data: bytes) -> tuple[int | None, int | None, float | None]:
    """REAL MP4 duration from the moov/mvhd box (codec_media); frame
    pixel decode lives in sample_frames (real for I_PCM H.264)."""
    from gnosis_ocr_spark.functions.codec_media import mp4_duration

    return None, None, round(mp4_duration(data), 3)


def _decode_jp2_meta(data: bytes) -> tuple[int | None, int | None, float | None]:
    """REAL JPEG 2000 dimensions from the SIZ marker (codec_jpx)."""
    from gnosis_ocr_spark.functions.codec_jpx import decode_jpx_dimensions

    w, h, _ = decode_jpx_dimensions(data)
    return w, h, None


def _decode_tiff_meta(data: bytes) -> tuple[int | None, int | None, float | None]:
    """REAL TIFF dimensions from the first IFD (codec_tiff). Orientations
    5-8 (tag 274) swap the reported w/h — the upright dimensions, matching
    what decode_tiff_gray/resize return for the same bytes (the same
    consistency contract as the JPEG EXIF path)."""
    from gnosis_ocr_spark.functions.codec_tiff import tiff_info

    info = tiff_info(data)
    w, h = info["width"], info["height"]
    o = info["orientation"]
    if isinstance(o, int) and o >= 5:
        w, h = h, w
    return w, h, None


def _decode_bmp_meta(data: bytes) -> tuple[int | None, int | None, float | None]:
    """REAL BMP dimensions from the DIB header (codec_media)."""
    from gnosis_ocr_spark.functions.codec_media import bmp_dimensions

    w, h = bmp_dimensions(data)
    return w, h, None


def _decode_webp_meta(data: bytes) -> tuple[int | None, int | None, float | None]:
    """REAL WebP canvas dimensions (VP8/VP8L/VP8X headers, codec_media)."""
    from gnosis_ocr_spark.functions.codec_media import webp_dimensions

    w, h = webp_dimensions(data)
    return w, h, None


def _decode_heif_meta(data: bytes) -> tuple[int | None, int | None, float | None]:
    """REAL HEIF/AVIF dimensions from the meta→ispe walk (codec_media);
    pixel decode stays out (HEVC/AV1 — codec_media HEIF header for why)."""
    from gnosis_ocr_spark.functions.codec_media import heif_info

    info = heif_info(data)
    return info["width"], info["height"], None


def _decode_svg_meta(data: bytes) -> tuple[int | None, int | None, float | None]:
    """REAL SVG dimensions from the root tag's width/height attributes
    (absolute CSS units converted) or the viewBox extent (codec_media)."""
    from gnosis_ocr_spark.functions.codec_media import svg_dimensions

    w, h = svg_dimensions(data)
    return w, h, None


def _decode_ico_meta(data: bytes) -> tuple[int | None, int | None, float | None]:
    """REAL ICO dimensions: the largest directory entry (favicons ship
    multiple sizes; the largest is what consumers render)."""
    from gnosis_ocr_spark.functions.codec_media import ico_info

    w, h, _, _ = max(ico_info(data)["images"], key=lambda e: e[0] * e[1])
    return w, h, None


def _decode_mp3_meta(data: bytes) -> tuple[int | None, int | None, float | None]:
    """REAL MPEG-audio duration from the frame-header walk / Xing count
    (codec_media); the entropy-coded audio payload stays out."""
    from gnosis_ocr_spark.functions.codec_media import mp3_info

    return None, None, round(mp3_info(data)["duration_sec"], 3)


def _decode_flac_meta(data: bytes) -> tuple[int | None, int | None, float | None]:
    """REAL FLAC duration from the STREAMINFO block (codec_media)."""
    from gnosis_ocr_spark.functions.codec_media import flac_info

    return None, None, round(flac_info(data)["duration_sec"], 3)


def _decode_ogg_meta(data: bytes) -> tuple[int | None, int | None, float | None]:
    """REAL Ogg Vorbis/Opus duration from the last page's granule position
    (codec_media)."""
    from gnosis_ocr_spark.functions.codec_media import ogg_info

    return None, None, round(ogg_info(data)["duration_sec"], 3)


def _decode_stub_meta(data: bytes) -> tuple[int | None, int | None, float | None]:
    """Deterministic fake for formats whose decoders aren't in this container.

    STUB: a real deployment plugs PIL/ffmpeg here; shapes derive from content
    hash so tests exercise realistic variety."""
    import zlib

    h = zlib.crc32(data)
    return 16 + h % 512, 16 + (h >> 9) % 512, round((h % 6000) / 100.0, 2)


DECODERS = {
    "image/png": _decode_png_meta,  # real (stdlib codec)
    "image/jpeg": _decode_jpeg_meta,  # real (codec_jpeg SOF parse)
    "image/gif": _decode_gif_meta,  # real (codec_media LSD parse)
    "audio/wav": _decode_wav_meta,  # real (RIFF fmt/data duration)
    "video/mp4": _decode_mp4_meta,  # real (mvhd duration; no frame decode)
    "image/jp2": _decode_jp2_meta,  # real (codec_jpx SIZ parse)
    "image/tiff": _decode_tiff_meta,  # real (codec_tiff IFD parse)
    "image/bmp": _decode_bmp_meta,  # real (codec_media DIB parse)
    "image/webp": _decode_webp_meta,  # real (codec_media VP8* headers)
    "image/heif": _decode_heif_meta,  # real (meta→ispe walk; no HEVC decode)
    "image/avif": _decode_heif_meta,  # real (meta→ispe walk; no AV1 decode)
    "image/svg+xml": _decode_svg_meta,  # real (root-tag width/height/viewBox)
    "audio/mpeg": _decode_mp3_meta,  # real (frame-header walk / Xing count)
    "audio/flac": _decode_flac_meta,  # real (STREAMINFO totals)
    "audio/ogg": _decode_ogg_meta,  # real (last-page granule position)
    "image/x-icon": _decode_ico_meta,  # real (largest ICONDIR entry)
}


def _meta_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for b in batches:
        rows = {k: [] for k in ("url", "media_type", "byte_len", "width", "height", "duration_sec")}
        for url, blob in zip(b["url"], b["data"]):
            data = bytes(blob) if blob is not None else b""
            mtype = sniff_media_type(data)
            w = h = dur = None
            dec = DECODERS.get(mtype)
            if dec is not None:
                try:
                    w, h, dur = dec(data)
                except Exception:
                    pass
            rows["url"].append(url)
            rows["media_type"].append(mtype)
            rows["byte_len"].append(len(data))
            rows["width"].append(w)
            rows["height"].append(h)
            rows["duration_sec"].append(dur)
        yield pd.DataFrame(rows)


def media_metadata(df: DataFrame, url_col: str = "url", data_col: str = "data") -> DataFrame:
    """(url, data BINARY) → typed media metadata via one ``mapInPandas``."""
    slim = df.select(F.col(url_col).alias("url"), F.col(data_col).alias("data"))
    return slim.mapInPandas(_meta_batches, schema=MEDIA_META_SCHEMA)


def _feature_batches(dim: int):
    def inner(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            urls, types, feats = [], [], []
            for url, blob in zip(b["url"], b["data"]):
                data = bytes(blob) if blob is not None else b""
                mtype = sniff_media_type(data)
                px = None
                if mtype == "image/png":
                    # real pixel statistics: fast filter-0-gray path first,
                    # then the general decoder (all filters/color types —
                    # real crawl PNGs)
                    try:
                        px = np.frombuffer(decode_pixels(data), dtype=np.uint8)
                    except Exception:
                        try:
                            from gnosis_ocr_spark.functions.codec_png import (
                                decode_png_gray,
                            )

                            _, _, gray = decode_png_gray(data)
                            px = np.frombuffer(gray, dtype=np.uint8)
                        except Exception:
                            px = None
                elif mtype == "image/jpeg":
                    # real luma statistics (codec_jpeg: baseline AND
                    # progressive SOF2 — common in web crawls)
                    try:
                        from gnosis_ocr_spark.functions.codec_jpeg import (
                            decode_jpeg,
                        )

                        _, _, _, luma = decode_jpeg(data)
                        px = np.frombuffer(luma, dtype=np.uint8)
                    except Exception:
                        px = None
                elif mtype == "image/gif":
                    try:
                        from gnosis_ocr_spark.functions.codec_media import (
                            decode_gif_gray,
                        )

                        _, _, gray = decode_gif_gray(data)
                        px = np.frombuffer(gray, dtype=np.uint8)
                    except Exception:
                        px = None
                elif mtype == "image/jp2":
                    # real wavelet decode to gray/luma (codec_jpx)
                    try:
                        from gnosis_ocr_spark.functions.codec_jpx import (
                            decode_jpx_gray,
                        )

                        _, _, gray = decode_jpx_gray(data)
                        px = np.frombuffer(gray, dtype=np.uint8)
                    except Exception:
                        px = None
                elif mtype == "image/tiff":
                    # real strip decode (fax/LZW/deflate/packbits → luma)
                    try:
                        from gnosis_ocr_spark.functions.codec_tiff import (
                            decode_tiff_gray,
                        )

                        _, _, gray = decode_tiff_gray(data)
                        px = np.frombuffer(gray, dtype=np.uint8)
                    except Exception:
                        px = None
                elif mtype == "image/bmp":
                    try:
                        from gnosis_ocr_spark.functions.codec_media import (
                            decode_bmp_gray,
                        )

                        _, _, gray = decode_bmp_gray(data)
                        px = np.frombuffer(gray, dtype=np.uint8)
                    except Exception:
                        px = None
                elif mtype == "image/webp":
                    # real for BOTH lossless (VP8L, codec_vp8l) and
                    # lossy (VP8 key frames, codec_vp8) payloads
                    try:
                        from gnosis_ocr_spark.functions.codec_vp8l import (
                            decode_webp_gray,
                        )

                        _, _, gray = decode_webp_gray(data)
                        px = np.frombuffer(gray, dtype=np.uint8)
                    except Exception:
                        px = None
                elif mtype == "image/x-icon":
                    # real: largest favicon image (PNG or DIB entry)
                    try:
                        from gnosis_ocr_spark.functions.codec_media import (
                            decode_ico_gray,
                        )

                        _, _, gray = decode_ico_gray(data)
                        px = np.frombuffer(gray, dtype=np.uint8)
                    except Exception:
                        px = None
                elif mtype in ("audio/wav", "audio/flac"):
                    # real DSP: one shared amplitude-histogram feature —
                    # only the PCM source differs (16-bit WAV samples, or
                    # full FLAC frame decode via codec_flac: rice/LPC/
                    # stereo reconstruction, CRC + MD5 verified), so the
                    # WAV-vs-FLAC parity the tests assert holds by
                    # construction, not by keeping two copies in sync
                    try:
                        if mtype == "audio/wav":
                            from gnosis_ocr_spark.functions.codec_media import (
                                wav_samples,
                            )

                            amp = np.abs(wav_samples(data))
                        else:
                            from gnosis_ocr_spark.functions.codec_flac import (
                                decode_flac_pcm16,
                            )

                            _, mono = decode_flac_pcm16(data)
                            amp = np.abs(mono.astype(np.float64) / 32768.0)
                        hist, _ = np.histogram(amp, bins=dim, range=(0.0, 1.0))
                        v = (hist / max(len(amp), 1)).astype(np.float32)
                        urls.append(url)
                        types.append(mtype)
                        feats.append(v.tolist())
                        continue
                    except Exception:
                        px = None
                if px is not None:
                    # fixed-dim feature: histogram of decoded pixel bytes
                    hist, _ = np.histogram(px, bins=dim, range=(0, 256))
                    v = (hist / max(len(px), 1)).astype(np.float32)
                else:
                    # STUB feature for undecodable/other payloads:
                    # deterministic bytes-histogram (decoder-free)
                    arr = np.frombuffer(data[:4096], dtype=np.uint8)
                    if len(arr) == 0:
                        v = np.zeros(dim, dtype=np.float32)
                    else:
                        hist, _ = np.histogram(arr, bins=dim, range=(0, 256))
                        v = (hist / len(arr)).astype(np.float32)
                urls.append(url)
                types.append(mtype)
                feats.append(v.tolist())
            yield pd.DataFrame({"url": urls, "media_type": types, "feature": feats})

    return inner


def media_features(df: DataFrame, dim: int = 16, url_col: str = "url",
                   data_col: str = "data") -> DataFrame:
    """Binary media → fixed-dim float features (Arrow-batched, vectorized
    inner loop). Output feeds functions.similarity for cross-modal dedup."""
    slim = df.select(F.col(url_col).alias("url"), F.col(data_col).alias("data"))
    return slim.mapInPandas(_feature_batches(dim), schema=FEATURE_SCHEMA)


RESIZED_SCHEMA = (
    "url string, media_type string, width int, height int, data binary, "
    "status string"
)
FRAME_SCHEMA = (
    "url string, frame_no int, ts_sec double, frame binary, "
    "payload binary, is_sync boolean, codec string"
)


def _resize_gray_nn(px: bytes, w: int, h: int, max_dim: int) -> tuple[bytes, int, int]:
    """Nearest-neighbor downsample of raw grayscale pixels so the longest
    side is ≤ max_dim (numpy strided indexing; uint8 throughout)."""
    if max(w, h) <= max_dim:
        return px, w, h
    scale = max(w, h) / max_dim
    nw, nh = max(1, int(w / scale)), max(1, int(h / scale))
    arr = np.frombuffer(px, dtype=np.uint8).reshape(h, w)
    ys = (np.arange(nh) * (h / nh)).astype(np.int64)
    xs = (np.arange(nw) * (w / nw)).astype(np.int64)
    return arr[ys][:, xs].tobytes(), nw, nh


def resize_images(df: DataFrame, max_dim: int = 256, url_col: str = "url",
                  data_col: str = "data") -> DataFrame:
    """Bound every image's longest side to ``max_dim`` — the standard
    pre-inference normalization step of a multimodal training pipeline.

    PNG path is REAL: stdlib decode → nearest-neighbor downsample →
    re-encode. Other formats pass through unchanged with a claimed size from
    the stub metadata decoder (STUB: PIL/ffmpeg absent from this container;
    swapping real decoders in changes only the inner branch, not the plan).

    The ``status`` column makes passthrough rows explicit (round-3 advice:
    a consumer trusting ``data`` must not silently receive oversized bytes):

    - ``resized`` — pixels really were downsampled and re-encoded
    - ``in_bounds`` — already ≤ max_dim, bytes unchanged
    - ``passthrough`` — ORIGINAL bytes, possibly > max_dim (undecodable PNG
      or a format whose real decoder isn't in this container); consumers that
      require the bound must filter ``status != 'passthrough'``."""
    from gnosis_ocr_spark.functions.codec_png import encode_gray_png

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in it:
            rows = {
                k: []
                for k in ("url", "media_type", "width", "height", "data", "status")
            }
            for url, blob in zip(b["url"], b["data"]):
                data = bytes(blob) if blob is not None else b""
                mtype = sniff_media_type(data)
                w = h = None
                out = data
                status = "passthrough"
                decoded = None  # (pixels, w, h) when a real decoder applies
                if mtype == "image/png":
                    try:
                        dw, dh = decode_dimensions(data)
                        if max(dw, dh) <= max_dim:
                            # already in bounds: header check only, skip the
                            # full inflate+unfilter pixel decode
                            w, h = dw, dh
                            status = "in_bounds"
                        else:
                            decoded = (decode_pixels(data), dw, dh)
                    except Exception:
                        # non-filter-0 / color / split-IDAT / Adam7 PNG:
                        # the general decoder (codec_png.decode_png_gray)
                        # handles the full baseline incl. interlacing; only
                        # genuinely malformed files fall to the honest
                        # unknown-size passthrough
                        try:
                            from gnosis_ocr_spark.functions.codec_png import (
                                decode_png_gray,
                            )

                            dw, dh, gray = decode_png_gray(data)
                            decoded = (gray, dw, dh)
                        except Exception:
                            w = h = None
                elif mtype == "image/jpeg":
                    # real decode (baseline + progressive) → EXIF
                    # orientation → grayscale luma resize → PNG out
                    try:
                        from gnosis_ocr_spark.functions.codec_jpeg import (
                            decode_jpeg,
                            exif_orientation,
                            orient_gray,
                        )

                        dw, dh, _, luma = decode_jpeg(data)
                        luma, dw, dh = orient_gray(
                            luma, dw, dh, exif_orientation(data)
                        )
                        decoded = (luma, dw, dh)
                    except Exception:
                        w = h = None  # arithmetic/lossless: passthrough
                elif mtype == "image/gif":
                    try:
                        from gnosis_ocr_spark.functions.codec_media import (
                            decode_gif_gray,
                        )

                        dw, dh, gray = decode_gif_gray(data)
                        decoded = (gray, dw, dh)
                    except Exception:
                        w = h = None
                elif mtype == "image/jp2":
                    # real wavelet decode → gray/luma resize → PNG out
                    try:
                        from gnosis_ocr_spark.functions.codec_jpx import (
                            decode_jpx_gray,
                        )

                        dw, dh, gray = decode_jpx_gray(data)
                        decoded = (gray, dw, dh)
                    except Exception:
                        w = h = None  # unsupported JPX subset: passthrough
                elif mtype == "image/tiff":
                    # real strip decode (fax/LZW/deflate/packbits → luma)
                    try:
                        from gnosis_ocr_spark.functions.codec_tiff import (
                            decode_tiff_gray,
                        )

                        dw, dh, gray = decode_tiff_gray(data)
                        decoded = (gray, dw, dh)
                    except Exception:
                        w = h = None  # old-JPEG/planar-2 TIFF: passthrough
                elif mtype == "image/bmp":
                    try:
                        from gnosis_ocr_spark.functions.codec_media import (
                            decode_bmp_gray,
                        )

                        dw, dh, gray = decode_bmp_gray(data)
                        decoded = (gray, dw, dh)
                    except Exception:
                        w = h = None  # RLE/bitfields BMP: passthrough
                elif mtype == "image/webp":
                    try:
                        from gnosis_ocr_spark.functions.codec_vp8l import (
                            decode_webp_gray,
                        )

                        dw, dh, gray = decode_webp_gray(data)
                        decoded = (gray, dw, dh)
                    except Exception:
                        w = h = None  # corrupt/hostile webp: passthrough
                elif mtype == "image/x-icon":
                    try:
                        from gnosis_ocr_spark.functions.codec_media import (
                            decode_ico_gray,
                        )

                        dw, dh, gray = decode_ico_gray(data)
                        decoded = (gray, dw, dh)
                    except Exception:
                        w = h = None  # 4/1-bpp DIB etc.: passthrough
                if decoded is not None:
                    px, dw, dh = decoded
                    if max(dw, dh) <= max_dim:
                        w, h = dw, dh
                        if mtype == "image/png":
                            status = "in_bounds"
                        else:  # decoded formats re-encode as grayscale PNG
                            out = encode_gray_png(px, dw, dh)
                            status = "resized"
                    else:
                        px2, w2, h2 = _resize_gray_nn(px, dw, dh, max_dim)
                        out = encode_gray_png(px2, w2, h2)
                        w, h = w2, h2
                        status = "resized"
                rows["url"].append(url)
                rows["media_type"].append(mtype)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["data"].append(out)
                rows["status"].append(status)
            yield pd.DataFrame(rows)

    slim = df.select(F.col(url_col).alias("url"), F.col(data_col).alias("data"))
    return slim.mapInPandas(batches, schema=RESIZED_SCHEMA)


def sample_frames(df: DataFrame, every_sec: float = 1.0, max_frames: int = 8,
                  url_col: str = "url", data_col: str = "data") -> DataFrame:
    """Video → sampled frames, one output ROW per frame (the flat-map shape a
    real ffmpeg-backed sampler uses: rows multiply inside the partition, no
    driver involvement, downstream image ops consume the frame column).

    Container-level sampling is REAL: when the MP4 carries a parseable
    video track (codec_media.mp4_video_samples), the sampler walks the
    stss/stsz/stsc/stco tables and emits the actual encoded keyframe bytes
    (``payload``), true timestamps, and the codec fourcc — selecting sync
    samples at >= every_sec spacing, exactly what a 100 TB pipeline does
    before shipping keyframes to GPU decoders. Pixel DECODE is real for
    I_PCM-coded H.264 keyframes (codec_h264 + the track's avcC record —
    the ``frame`` column is then the decoded luma as a gray PNG) and for
    motion-JPEG tracks (``jpeg``/``mjpa`` sample entries whose samples
    are plain JFIF images — codec_jpeg decodes baseline AND progressive);
    entropy-coded (CAVLC/CABAC) H.264 frames keep the deterministic stub
    PNG derived from the payload bytes, the documented boundary in
    codec_h264's header. Table-less MP4s fall back to mvhd-duration
    pacing with ``payload`` null / ``codec`` 'stub'. Non-video rows emit
    nothing."""
    from gnosis_ocr_spark.functions.codec_png import encode_page_png

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import zlib

        cols = ("url", "frame_no", "ts_sec", "frame", "payload", "is_sync",
                "codec")
        for b in it:
            rows = {k: [] for k in cols}
            for url, blob in zip(b["url"], b["data"]):
                data = bytes(blob) if blob is not None else b""
                if sniff_media_type(data) != "video/mp4":
                    continue
                sig = zlib.crc32(data)
                try:
                    from gnosis_ocr_spark.functions.codec_media import (
                        mp4_video_samples,
                    )

                    info = mp4_video_samples(data)
                except Exception:
                    info = None
                if info is not None:
                    picked: list[tuple[int, int, float, bool]] = []
                    next_ts = 0.0
                    for off, size, ts, sync in info["samples"]:
                        if not sync or ts < next_ts:
                            continue
                        picked.append((off, size, ts, sync))
                        next_ts = ts + every_sec
                        if len(picked) >= max_frames:
                            break
                    for i, (off, size, ts, sync) in enumerate(picked):
                        rows["url"].append(url)
                        rows["frame_no"].append(i)
                        rows["ts_sec"].append(round(ts, 3))
                        rows["payload"].append(data[off : off + size])
                        rows["is_sync"].append(sync)
                        rows["codec"].append(info["codec"])
                        frame = None
                        if info.get("avcc"):
                            # REAL decode: I_PCM H.264 keyframes → luma PNG
                            try:
                                from gnosis_ocr_spark.functions.codec_h264 import (
                                    decode_h264_gray,
                                )
                                from gnosis_ocr_spark.functions.codec_png import (
                                    encode_gray_png,
                                )

                                fw, fh, gray = decode_h264_gray(
                                    data[off : off + size], info["avcc"]
                                )
                                frame = encode_gray_png(gray, fw, fh)
                            except Exception:
                                frame = None  # entropy-coded → stub below
                        elif info["codec"] in ("jpeg", "mjpa", "MJPG"):
                            # REAL decode: motion-JPEG samples are plain
                            # JFIF images — the in-repo (and ImageIO-
                            # conformance-tested) JPEG decoder applies
                            try:
                                from gnosis_ocr_spark.functions.codec_jpeg import (
                                    decode_jpeg,
                                )
                                from gnosis_ocr_spark.functions.codec_png import (
                                    encode_gray_png,
                                )

                                fw, fh, _nc, gray = decode_jpeg(
                                    data[off : off + size]
                                )
                                frame = encode_gray_png(gray, fw, fh)
                            except Exception:
                                frame = None  # undecodable → stub below
                        rows["frame"].append(
                            frame
                            or encode_page_png(f"frame:{sig}:{i}", 32, 32)
                        )
                    continue
                try:  # REAL duration from the mvhd box when parseable
                    from gnosis_ocr_spark.functions.codec_media import (
                        mp4_duration,
                    )

                    dur = mp4_duration(data)
                except Exception:
                    _, _, dur = _decode_stub_meta(data)
                n = min(max_frames, max(1, int((dur or 0) / every_sec)))
                for i in range(n):
                    ts = round(i * every_sec, 3)
                    rows["url"].append(url)
                    rows["frame_no"].append(i)
                    rows["ts_sec"].append(ts)
                    rows["payload"].append(None)
                    rows["is_sync"].append(None)
                    rows["codec"].append("stub")
                    # STUB frame: deterministic, decodable PNG
                    rows["frame"].append(encode_page_png(f"frame:{sig}:{i}", 32, 32))
            yield pd.DataFrame(rows)

    slim = df.select(F.col(url_col).alias("url"), F.col(data_col).alias("data"))
    return slim.mapInPandas(batches, schema=FRAME_SCHEMA)


def media_fixture_rows() -> list[tuple[str, bytes, str, int | None, int | None, int | None]]:
    """Deterministic one-per-format media payloads with BY-CONSTRUCTION
    expected metadata: (url, payload, media_type, width, height,
    duration_ms). Expected values come from the builder ARGUMENTS (the
    dimensions/durations the fixtures were constructed with), never from
    running this module's parsers — so the driver row that certifies
    ``media_metadata`` over these payloads is non-circular evidence, the
    same discipline as the corpus goldens (corpus.py header). Builders are
    conformance-checked externally where a system reference exists
    (libheif: test_heif.py; libwebp: test_conformance_webp.py; ImageIO:
    test_conformance_imageio.py)."""
    import numpy as np

    from gnosis_ocr_spark.functions.codec_jpeg import encode_gray_jpeg
    from gnosis_ocr_spark.functions.codec_jpx import encode_jp2
    from gnosis_ocr_spark.functions.codec_media import (
        build_flac,
        build_heif,
        build_mp3,
        build_mp4,
        build_ogg_opus,
        build_ogg_vorbis,
        build_wav,
        build_svg,
        build_webp_lossless_header,
        encode_gray_bmp,
        encode_gray_gif,
    )
    from gnosis_ocr_spark.functions.codec_png import encode_gray_png
    from gnosis_ocr_spark.functions.codec_tiff import encode_tiff_gray

    def px(w: int, h: int) -> bytes:
        return bytes((i * 7 + 13) % 256 for i in range(w * h))

    # 8000 samples at 16 kHz = exactly 0.5 s
    samples = np.sin(np.linspace(0.0, 40.0, 8000))
    rows = [
        ("fixture:png", encode_gray_png(px(20, 12), 20, 12), "image/png", 20, 12, None),
        ("fixture:jpeg", encode_gray_jpeg(px(24, 16), 24, 16), "image/jpeg", 24, 16, None),
        ("fixture:gif", encode_gray_gif(px(18, 10), 18, 10), "image/gif", 18, 10, None),
        ("fixture:bmp", encode_gray_bmp(px(22, 14), 22, 14), "image/bmp", 22, 14, None),
        ("fixture:webp", build_webp_lossless_header(30, 20), "image/webp", 30, 20, None),
        ("fixture:tiff", encode_tiff_gray(px(26, 18), 26, 18), "image/tiff", 26, 18, None),
        (
            "fixture:jp2",
            encode_jp2([np.frombuffer(px(16, 16), np.uint8).reshape(16, 16).astype(np.int32)]),
            "image/jp2", 16, 16, None,
        ),
        ("fixture:wav", build_wav(samples, 16000), "audio/wav", None, None, 500),
        ("fixture:mp4", build_mp4(2.5), "video/mp4", None, None, 2500),
        ("fixture:heif", build_heif(320, 200), "image/heif", 320, 200, None),
        (
            "fixture:avif",
            build_heif(100, 50, brand=b"avif", codec=b"av01"),
            "image/avif", 100, 50, None,
        ),
        (
            "fixture:svg",
            build_svg(640, 360, ("axis label",)),
            "image/svg+xml", 640, 360, None,
        ),
        # 25 frames x 1152/32000 s = exactly 900 ms
        ("fixture:mp3", build_mp3(25), "audio/mpeg", None, None, 900),
        (
            "fixture:mp3_id3",
            build_mp3(50, id3=b"TALB\x00\x00\x00\x04\x00\x00\x00alb"),
            "audio/mpeg", None, None, 1800,
        ),
        # 12000 samples at 16 kHz = exactly 750 ms
        ("fixture:flac", build_flac(12000), "audio/flac", None, None, 750),
        ("fixture:opus", build_ogg_opus(640), "audio/ogg", None, None, 640),
        # 2000 samples at 8 kHz = exactly 250 ms
        ("fixture:vorbis", build_ogg_vorbis(2000), "audio/ogg", None, None, 250),
    ]
    return rows
