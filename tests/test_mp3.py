"""MPEG-audio (MP3) metadata layer: ID3v2 skip, frame-header walk,
Xing/Info VBR frame count, sniff wiring, and the exact-millisecond
fixture writer. Only headers are parsed — the entropy-coded audio
payload stays out (codec_media MP3 section header)."""

from __future__ import annotations

import struct

import pytest

from gnosis_ocr_spark.functions.codec_media import (
    MAX_MP3_FRAMES,
    _id3v2_size,
    build_mp3,
    is_mp3,
    mp3_info,
)
from gnosis_ocr_spark.operators.multimodal import sniff_media_type


def test_cbr_duration_exact():
    info = mp3_info(build_mp3(25))
    assert info == {
        "sample_rate": 32000,
        "bitrate_kbps": 128,
        "layer": 3,
        "mpeg1": True,
        "n_frames": 25,
        "duration_sec": 0.9,
    }


def test_id3v2_skip():
    tag_body = b"TALB\x00\x00\x00\x04\x00\x00\x00alb"
    data = build_mp3(50, id3=tag_body)
    assert _id3v2_size(data) == 10 + len(tag_body)
    assert is_mp3(data)
    assert mp3_info(data)["n_frames"] == 50


def test_44100_padding_free_frames_walk():
    # 144*128000/44100 is not integral — parser and writer must agree on
    # the truncated frame length for the walk to chain
    info = mp3_info(build_mp3(10, sample_rate=44100))
    assert info["n_frames"] == 10 and info["sample_rate"] == 44100


def test_xing_vbr_frame_count():
    b = bytearray(build_mp3(3))
    xo = 4 + 17  # MPEG-1 mono side-info size
    b[xo : xo + 4] = b"Xing"
    b[xo + 4 : xo + 8] = struct.pack(">I", 1)  # flags: frames present
    b[xo + 8 : xo + 12] = struct.pack(">I", 1000)
    info = mp3_info(bytes(b))
    assert info["n_frames"] == 1000
    assert info["duration_sec"] == 1000 * 1152 / 32000


def test_lone_sync_is_not_mp3():
    assert not is_mp3(bytes([0xFF, 0xFB, 0x98, 0xC0]) + b"garbage follows")
    assert not is_mp3(b"plain text")
    assert not is_mp3(b"")
    assert sniff_media_type(bytes([0xFF, 0xFB]) + b"xx") == (
        "application/octet-stream"
    )


def test_hostile_free_format_and_bad_headers():
    with pytest.raises(ValueError):
        mp3_info(b"\xff\xfb\x08\xc0" + b"\x00" * 64)  # free-format bitrate 0
    with pytest.raises(ValueError):
        mp3_info(b"not audio at all")
    assert MAX_MP3_FRAMES <= 1_000_000  # walk bound stays sane


def test_sniff_and_jpeg_nonconflict():
    assert sniff_media_type(build_mp3(25)) == "audio/mpeg"
    assert sniff_media_type(build_mp3(2, id3=b"x" * 4)) == "audio/mpeg"
    # JPEG also starts 0xFF — must keep winning its magic
    from gnosis_ocr_spark.functions.codec_jpeg import encode_gray_jpeg

    assert sniff_media_type(encode_gray_jpeg(bytes(64), 8, 8)) == "image/jpeg"


def test_media_metadata_mp3_row(spark):
    from gnosis_ocr_spark.operators.multimodal import media_metadata

    df = spark.createDataFrame(
        [("m1", bytearray(build_mp3(25)))], "url string, data binary"
    )
    row = media_metadata(df).collect()[0]
    assert row.media_type == "audio/mpeg"
    assert row.duration_sec == 0.9
    assert row.width is None
