"""H.264/AVC NAL + I_PCM layer (functions/codec_h264.py): the subset of
ITU-T H.264 that decodes video-frame pixels without entropy tables —
NAL framing (Annex B + avcC length-prefixed), SPS/PPS Exp-Golomb
parsing, and I_PCM macroblock reconstruction. The fixture encoder emits
legal constrained-baseline all-I_PCM streams (the shape x264 produces at
its lossless corner), so round-trips certify interop behavior; the
entropy-coded boundary raises loudly (see the module header)."""

from __future__ import annotations

import random

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from gnosis_ocr_spark.functions import codec_h264 as H
from gnosis_ocr_spark.functions import codec_media as M


@given(st.integers(0, 10_000))
@settings(max_examples=40, deadline=None)
def test_ipcm_roundtrip_property(seed):
    """encode (all-I_PCM IDR) → decode identity: arbitrary even frame
    dims incl. non-multiple-of-16 (SPS cropping), full 4:2:0 chroma."""
    rng = np.random.default_rng(seed)
    h = 2 * int(rng.integers(1, 40))
    w = 2 * int(rng.integers(1, 40))
    y = rng.integers(0, 256, size=(h, w)).astype(np.uint8)
    cb = rng.integers(0, 256, size=(h // 2, w // 2)).astype(np.uint8)
    cr = rng.integers(0, 256, size=(h // 2, w // 2)).astype(np.uint8)
    sps, pps, idr = H.encode_h264_ipcm(y, cb, cr)
    stream = b"".join(b"\x00\x00\x00\x01" + n for n in (sps, pps, idr))
    gw, gh, gy, gcb, gcr = H.decode_h264_frame(stream)
    assert (gw, gh) == (w, h)
    assert np.array_equal(gy, y)
    assert np.array_equal(gcb, cb)
    assert np.array_equal(gcr, cr)


def test_exp_golomb_and_emulation_prevention_roundtrip():
    """ue/se bit I/O and the 0x000003 escaping are exact inverses —
    including payloads that force emulation sequences."""
    rng = random.Random(3)
    vals = [rng.randrange(0, 1 << 16) for _ in range(500)]
    bw = H._BitWriter()
    for v in vals:
        bw.ue(v)
        bw.se(v - (1 << 15))
    rbsp = bw.trailing()
    br = H._BitReader(rbsp)
    for v in vals:
        assert br.ue() == v
        assert br.se() == v - (1 << 15)
    # emulation: a zero-heavy RBSP survives escape + strip
    zeros = bytes(64) + b"\x01\x00\x00\x02\x00\x00\x03\x00\x00\x00"
    assert H._strip_emulation(H._insert_emulation(zeros)) == zeros
    # the escaped form never contains 00 00 00/01/02 (00 00 03 IS the
    # emulation-prevention escape itself and is the legal encoding)
    esc = H._insert_emulation(zeros)
    for i in range(len(esc) - 2):
        assert not (esc[i] == 0 and esc[i + 1] == 0 and esc[i + 2] <= 2)


def test_avcc_record_roundtrip_and_length_prefixed_decode():
    rng = np.random.default_rng(7)
    y = rng.integers(0, 256, size=(48, 64)).astype(np.uint8)
    sps, pps, idr = H.encode_h264_ipcm(y)
    avcc = H.build_avcc(sps, pps)
    sps_l, pps_l, lsize = H.parse_avcc(avcc)
    assert sps_l == [sps] and pps_l == [pps] and lsize == 4
    sample = len(idr).to_bytes(4, "big") + idr
    w, h, gray = H.decode_h264_gray(sample, avcc)
    assert (w, h) == (64, 48)
    assert np.array_equal(np.frombuffer(gray, np.uint8).reshape(48, 64), y)


def test_entropy_coded_macroblocks_raise_the_documented_boundary():
    """A CAVLC-coded mb_type (anything but I_PCM's 25) raises — the
    loud boundary callers map to their stub path. A CABAC PPS raises at
    the slice, before any macroblock parsing."""
    rng = np.random.default_rng(1)
    y = rng.integers(0, 256, size=(16, 16)).astype(np.uint8)
    sps, pps, idr = H.encode_h264_ipcm(y)
    # corrupt the first mb_type ue(25)='000011010' into ue(0)='1'
    stream = b"".join(b"\x00\x00\x00\x01" + n for n in (sps, pps))
    bw = H._BitWriter()
    bw.ue(0); bw.ue(7); bw.ue(0); bw.u(0, 4); bw.ue(0); bw.se(0)
    bw.ue(0)  # mb_type 0 = I_4x4 (entropy-coded)
    bad_idr = b"\x65" + H._insert_emulation(bw.trailing())
    with pytest.raises(ValueError, match="entropy-coded"):
        H.decode_h264_frame(stream + b"\x00\x00\x00\x01" + bad_idr)


@given(st.integers(0, 10_000), st.binary(max_size=200))
@settings(max_examples=60, deadline=None)
def test_mutated_stream_never_escapes_exception_contract(seed, junk):
    rng = random.Random(seed)
    y = np.full((16, 16), seed % 256, dtype=np.uint8)
    sps, pps, idr = H.encode_h264_ipcm(y)
    base = bytearray(
        b"".join(b"\x00\x00\x00\x01" + n for n in (sps, pps, idr))
    )
    for _ in range(rng.randint(1, 6)):
        base[rng.randrange(len(base))] = rng.randrange(256)
    for data in (junk, bytes(base)):
        try:
            H.decode_h264_frame(data)
        except (RecursionError, MemoryError):
            raise
        except ValueError:
            pass


def test_mp4_h264_fixture_and_real_frame_sampling(spark):
    """An MP4 whose samples are real I_PCM H.264: sample_frames decodes
    ACTUAL pixels (the frame column is the true luma PNG, not the
    payload-hash stub), while a fake-payload MP4 still gets the stub."""
    from gnosis_ocr_spark.functions.codec_png import decode_pixels
    from gnosis_ocr_spark.operators.multimodal import sample_frames

    rng = np.random.default_rng(5)
    frames = [
        rng.integers(0, 256, size=(32, 48)).astype(np.uint8)
        for _ in range(3)
    ]
    real = M.build_mp4_h264(frames, fps=1, timescale=10)
    fake = M.build_mp4_video([b"notnal" * 20] * 3, fps=1, timescale=10)
    df = spark.createDataFrame(
        [("real", bytearray(real)), ("fake", bytearray(fake))],
        schema="url string, data binary",
    )
    rows = sample_frames(df, every_sec=0.0, max_frames=8).collect()
    got = {}
    for r in rows:
        got.setdefault(r["url"], []).append(r)
    assert len(got["real"]) == 3
    for r, expect in zip(sorted(got["real"], key=lambda r: r["frame_no"]), frames):
        px = np.frombuffer(decode_pixels(bytes(r["frame"])), dtype=np.uint8)
        assert np.array_equal(px.reshape(32, 48), expect)
        assert r["codec"] == "avc1" and r["is_sync"]
    # fake payloads: still one row per sync sample, stub frame present
    assert all(r["frame"] is not None for r in got["fake"])
