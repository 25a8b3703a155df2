"""Multimodal columns: image/audio/video as opaque ``binary`` + typed
metadata.

The Spark-side plumbing (schemas, Arrow batching, ``mapInPandas`` signatures,
partitioning) is real and tested; the codec work that needs PIL/ffmpeg —
absent from this container — is stubbed behind ``DECODERS`` with deterministic
fakes, clearly marked. Swapping in real decoders changes only the inner
function bodies, not the Spark plan.

Sniffing is real: magic-byte dispatch for PNG/JPEG/GIF/WAV/MP4. PNG metadata
extraction is real too (our stdlib codec). Feature extraction / resize /
frame-sample are deterministic fakes with the correct shapes.
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
    (b"RIFF", "audio/wav"),  # refined below via 'WAVE' at offset 8
    (b"%PDF-", "application/pdf"),
]


def sniff_media_type(data: bytes | None) -> str:
    if not data:
        return "empty"
    for magic, mtype in _MAGIC:
        if data[: len(magic)] == magic:
            if mtype == "audio/wav" and data[8:12] != b"WAVE":
                return "application/octet-stream"
            return mtype
    if len(data) > 11 and data[4:8] == b"ftyp":
        return "video/mp4"
    return "application/octet-stream"


def _decode_png_meta(data: bytes) -> tuple[int | None, int | None, float | None]:
    w, h = decode_dimensions(data)
    return w, h, None


def _decode_stub_meta(data: bytes) -> tuple[int | None, int | None, float | None]:
    """Deterministic fake for formats whose decoders aren't in this container.

    STUB: a real deployment plugs PIL/ffmpeg here; shapes derive from content
    hash so tests exercise realistic variety."""
    import zlib

    h = zlib.crc32(data)
    return 16 + h % 512, 16 + (h >> 9) % 512, round((h % 6000) / 100.0, 2)


DECODERS = {
    "image/png": _decode_png_meta,  # real (stdlib codec)
    "image/jpeg": _decode_stub_meta,  # STUB (no PIL in container)
    "image/gif": _decode_stub_meta,  # STUB
    "audio/wav": _decode_stub_meta,  # STUB
    "video/mp4": _decode_stub_meta,  # STUB
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
                if mtype == "image/png":
                    # real pixel statistics from the stdlib decoder, folded
                    # into a fixed-dim feature (histogram of pixel bytes)
                    try:
                        px = np.frombuffer(decode_pixels(data), dtype=np.uint8)
                        hist, _ = np.histogram(px, bins=dim, range=(0, 256))
                        v = (hist / max(len(px), 1)).astype(np.float32)
                    except Exception:
                        v = np.zeros(dim, dtype=np.float32)
                else:
                    # STUB feature: deterministic bytes-histogram (decoder-free)
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
