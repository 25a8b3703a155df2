"""FLAC + Ogg (Vorbis/Opus) metadata layer: STREAMINFO totals, last-page
granule durations, the RFC 3533 (non-reflected) page CRC in the fixture
writer, sniff wiring, and hostile-input behavior. Audio payload decode
stays out (same boundary as MP3/MP4)."""

from __future__ import annotations

import struct

import pytest

from gnosis_ocr_spark.functions.codec_media import (
    _ogg_pages,
    build_flac,
    build_ogg_opus,
    build_ogg_vorbis,
    flac_info,
    ogg_info,
)
from gnosis_ocr_spark.operators.multimodal import sniff_media_type


def test_flac_streaminfo_roundtrip():
    info = flac_info(build_flac(12000, sample_rate=16000))
    assert info == {
        "sample_rate": 16000,
        "channels": 1,
        "bits": 16,
        "total_samples": 12000,
        "duration_sec": 0.75,
    }


def test_flac_36bit_total():
    # > 2^32 samples exercises the 36-bit split across si[13]/si[14:18]
    total = (1 << 33) + 5
    assert flac_info(build_flac(total))["total_samples"] == total


def test_flac_hostile():
    with pytest.raises(ValueError):
        flac_info(b"fLaC")  # truncated
    with pytest.raises(ValueError):
        flac_info(b"not flac at all and long enough to index safely......")
    bad = bytearray(build_flac(100))
    bad[4] = 0x84  # first block claims VORBIS_COMMENT, not STREAMINFO
    with pytest.raises(ValueError):
        flac_info(bytes(bad))


def test_ogg_opus_duration_and_preskip():
    info = ogg_info(build_ogg_opus(640, pre_skip=312))
    assert info == {"codec": "opus", "sample_rate": 48000, "duration_sec": 0.64}


def test_ogg_vorbis_duration():
    info = ogg_info(build_ogg_vorbis(2000, sample_rate=8000))
    assert info == {"codec": "vorbis", "sample_rate": 8000, "duration_sec": 0.25}


def test_ogg_page_walk_skips_garbage():
    v = build_ogg_vorbis(4000)
    # garbage between pages must not derail the scan (find-resync path)
    first_len = None
    for _, _, bs, be in _ogg_pages(v):
        first_len = be
        break
    frankenstein = v[:first_len] + b"JUNKJUNK" + v[first_len:]
    assert ogg_info(frankenstein)["duration_sec"] == 0.5


def test_ogg_crc_is_rfc3533():
    # the page CRC must be the NON-reflected 0x04c11db7 variant computed
    # over the page with a zeroed CRC field — and must differ from zlib's
    # reflected crc32 (the classic wrong-variant mistake)
    import zlib

    raw = build_ogg_opus(100)
    bos_len = 27 + raw[26] + sum(raw[27 : 27 + raw[26]])  # header+segs+body
    page = bytearray(raw[:bos_len])
    stored = bytes(page[22:26])
    page[22:26] = b"\x00" * 4
    reg = 0
    for byte in bytes(page):
        reg ^= byte << 24
        for _ in range(8):
            reg = ((reg << 1) ^ 0x04C11DB7) & 0xFFFFFFFF if reg & 0x80000000 \
                else (reg << 1) & 0xFFFFFFFF
    assert stored == struct.pack("<I", reg)
    assert stored != struct.pack("<I", zlib.crc32(bytes(page)))


def test_ogg_hostile():
    with pytest.raises(ValueError):
        ogg_info(b"OggS")  # truncated
    with pytest.raises(ValueError):
        ogg_info(b"zzzz not ogg")
    # BOS page with unknown codec
    from gnosis_ocr_spark.functions.codec_media import _ogg_page

    page = _ogg_page(1, 0, 2, 0, b"WEIRDCODEC")
    with pytest.raises(ValueError):
        ogg_info(page)


def test_sniff():
    assert sniff_media_type(build_flac(10)) == "audio/flac"
    assert sniff_media_type(build_ogg_opus(10)) == "audio/ogg"
    assert sniff_media_type(build_ogg_vorbis(10)) == "audio/ogg"


def test_media_metadata_rows(spark):
    from gnosis_ocr_spark.operators.multimodal import media_metadata

    df = spark.createDataFrame(
        [
            ("f1", bytearray(build_flac(8000))),
            ("o1", bytearray(build_ogg_opus(250))),
        ],
        "url string, data binary",
    )
    out = {r.url: r for r in media_metadata(df).collect()}
    assert out["f1"].media_type == "audio/flac" and out["f1"].duration_sec == 0.5
    assert out["o1"].media_type == "audio/ogg" and out["o1"].duration_sec == 0.25
