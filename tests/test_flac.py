"""FLAC frame codec (functions/codec_flac.py): encode→decode roundtrips
over every subframe type / stereo mode / partition shape, the in-stream
MD5 integrity chain, CRC mutation fuzz, and the PCM-16 feature seam.

No system FLAC implementation exists in this container (checked:
flac/sox/ffmpeg/GStreamer codec plugins all absent), so conformance
rests on the codec_jpx/codec_ccitt discipline: spec-pinned structure,
roundtrips over hypothesis-generated PCM, and loud-failure fuzz. The
MD5 chain is the strongest link: the encoder hashes its INPUT PCM into
STREAMINFO and the decoder independently hashes its OUTPUT — equality
certifies exact reconstruction through the full coding stack.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from gnosis_ocr_spark.functions import codec_flac as FL
from gnosis_ocr_spark.functions.codec_media import flac_info


def _sine(n: int, amp: int = 12000, rate: int = 16000, freq: float = 220.0):
    t = np.arange(n) / rate
    return np.round(amp * np.sin(2 * np.pi * freq * t)).astype(np.int64)


def _roundtrip(pcm, **kw):
    blob = FL.encode_flac(pcm, **kw)
    info = FL.decode_flac(blob)
    got = info["samples"]
    want = np.asarray(pcm, dtype=np.int64)
    if want.ndim == 1:
        want = want[:, None]
    assert got.shape == want.shape
    assert np.array_equal(got.astype(np.int64), want)
    assert info["md5_checked"] is True
    return blob, info


def test_mono_sine_roundtrip_exact():
    blob, info = _roundtrip(_sine(10000), sample_rate=16000)
    assert info["sample_rate"] == 16000
    assert info["channels"] == 1 and info["bits"] == 16
    assert info["total_samples"] == 10000
    # the existing metadata seam agrees with the new decoder
    meta = flac_info(blob)
    assert meta["total_samples"] == 10000
    assert abs(meta["duration_sec"] - 10000 / 16000) < 1e-9


def test_stereo_rotates_all_decorrelation_modes():
    n = 4096 * 4 + 513  # >= 5 blocks: indep, ls, rs, ms, partial indep
    left = _sine(n, amp=9000)
    right = _sine(n, amp=7000, freq=330.0) + 13
    pcm = np.stack([left, right], axis=1)
    _roundtrip(pcm, block_size=4096)


def test_stereo_independent_pinned():
    pcm = np.stack([_sine(3000), _sine(3000, freq=550.0)], axis=1)
    _roundtrip(pcm, stereo_mode="indep")


@pytest.mark.parametrize("strategy", ["verbatim", "lpc", "wasted", "auto"])
def test_strategies_roundtrip(strategy):
    pcm = _sine(5000)
    if strategy == "wasted":
        pcm = (pcm >> 2) << 2  # every sample shares 2 trailing zero bits
    _roundtrip(pcm, strategy=strategy)


@pytest.mark.parametrize("bits", [8, 12, 16, 20, 24])
def test_bit_depths_roundtrip(bits):
    amp = (1 << (bits - 1)) - 7
    pcm = np.round(amp * np.sin(np.linspace(0, 29.0, 4000))).astype(np.int64)
    blob, info = _roundtrip(pcm, bits=bits)
    assert info["bits"] == bits


def test_odd_block_size_uses_explicit_header_field():
    # 1000 is none of the spec's implied sizes -> 16-bit end-of-header form
    _roundtrip(_sine(3500), block_size=1000)


def test_constant_blocks():
    pcm = np.full(6000, -1234, dtype=np.int64)
    _roundtrip(pcm)


def test_escape_partition_roundtrip():
    # alternating full-scale samples make every fixed-order residual huge,
    # forcing the rice parameter past 14 -> escaped raw partitions
    pcm = np.where(np.arange(6000) % 2 == 0, 32700, -32700).astype(np.int64)
    _roundtrip(pcm)


def test_empty_stream():
    blob = FL.encode_flac(np.empty((0,), dtype=np.int64))
    info = FL.decode_flac(blob)
    assert info["total_samples"] == 0
    assert info["samples"].shape == (0, 1)


def test_wasted_bits_with_zero_runs():
    pcm = np.zeros(4000, dtype=np.int64)
    pcm[::7] = 1024  # nonzero share 10 trailing zeros; zeros stay zero
    _roundtrip(pcm, strategy="wasted")


def test_mutation_fuzz_is_loud():
    """Flipping any byte must either raise (CRC-8/CRC-16/MD5/sync) or —
    for the few uncovered STREAMINFO bytes like min/max block size —
    leave the decoded PCM bit-identical. Silent corruption is the one
    outcome that must never happen."""
    pcm = _sine(5000)
    blob = bytearray(FL.encode_flac(pcm))
    want = FL.decode_flac(bytes(blob))["samples"]
    rng = np.random.default_rng(7)
    positions = sorted(
        set(rng.integers(0, len(blob), size=60).tolist()) | {0, 5, 9, 45, len(blob) - 1}
    )
    silent = 0
    for p in positions:
        mutated = bytearray(blob)
        mutated[p] ^= 0x41
        try:
            got = FL.decode_flac(bytes(mutated))["samples"]
        except ValueError:
            continue
        assert np.array_equal(got, want), f"silent corruption at byte {p}"
        silent += 1
    # nearly every byte is covered by a checksum; allow only a handful of
    # benign (value-identical) survivals
    assert silent <= 6


def test_truncation_raises():
    blob = FL.encode_flac(_sine(4000))
    for cut in (10, 40, 50, len(blob) // 2, len(blob) - 1):
        with pytest.raises(ValueError):
            FL.decode_flac(blob[:cut])


def test_hostile_declared_total_bounded():
    blob = bytearray(FL.encode_flac(_sine(100)))
    # STREAMINFO total-samples field: high nibble of byte 21, bytes 22-25
    blob[21] |= 0x0F
    blob[22:26] = b"\xff\xff\xff\xff"
    with pytest.raises(ValueError):
        FL.decode_flac(bytes(blob))


def test_pcm16_seam_mono_mix_and_rescale():
    n = 3000
    left = _sine(n, amp=8000)
    pcm24 = np.stack([left << 8, (left + 4) << 8], axis=1)  # 24-bit stereo
    blob = FL.encode_flac(pcm24, bits=24, sample_rate=22050)
    rate, mono = FL.decode_flac_pcm16(blob)
    assert rate == 22050
    assert mono.dtype == np.int16 and mono.shape == (n,)
    # 24->16 rescale then L/R average: within rounding of the source
    assert int(np.abs(mono.astype(np.int64) - (left + 2)).max()) <= 2


@settings(max_examples=12, deadline=None)
@given(
    data=st.data(),
    n=st.integers(min_value=0, max_value=2500),
    channels=st.sampled_from([1, 2]),
    block=st.sampled_from([192, 256, 576, 1000, 4096]),
    strategy=st.sampled_from(["auto", "verbatim", "lpc", "wasted"]),
)
def test_property_roundtrip(data, n, channels, block, strategy):
    rng = np.random.default_rng(
        data.draw(st.integers(min_value=0, max_value=2**32 - 1))
    )
    shape = (n, channels) if channels > 1 else (n,)
    kind = data.draw(st.sampled_from(["noise", "walk", "quiet"]))
    if kind == "noise":
        pcm = rng.integers(-32768, 32768, size=shape, dtype=np.int64)
    elif kind == "walk":
        steps = rng.integers(-300, 301, size=shape)
        pcm = np.clip(np.cumsum(steps, axis=0), -32768, 32767).astype(np.int64)
    else:
        pcm = np.zeros(shape, dtype=np.int64)
    _roundtrip(pcm, block_size=block, strategy=strategy)


def test_media_features_flac_equals_wav(spark):
    """The SAME PCM content shipped as WAV and as FLAC produces the SAME
    real-DSP feature vector (both decoders are lossless and normalize
    identically) — and a frameless metadata-only FLAC falls back to the
    stub path without erroring."""
    from gnosis_ocr_spark.functions.codec_media import build_flac, build_wav
    from gnosis_ocr_spark.operators.multimodal import media_features

    pcm = _sine(8000, amp=21000)
    wav = build_wav(pcm.astype(np.float64) / 32767.0)
    # build_wav rescales by 32767 with rounding; re-derive the exact int16
    # it wrote so the FLAC stream carries bit-identical content
    exact = np.clip(np.rint(pcm.astype(np.float64)), -32768, 32767).astype(np.int64)
    flac = FL.encode_flac(exact, sample_rate=16000)
    rows = [
        ("wav", bytearray(wav)),
        ("flac", bytearray(flac)),
        ("metaonly", bytearray(build_flac(12000))),
    ]
    df = spark.createDataFrame(rows, schema="url string, data binary")
    got = {
        r["url"]: np.array(r["feature"])
        for r in media_features(df, dim=8).collect()
    }
    assert np.array_equal(got["wav"], got["flac"])
    assert got["flac"].sum() > 0
    assert len(got["metaonly"]) == 8  # stub fallback, no error


def test_truncation_raises_valueerror_at_every_cut():
    """EVERY truncation point must raise ValueError (the documented loud
    contract) — never IndexError or silent partial PCM. Catches the
    frame-header-CRC byte edge among all others."""
    blob = FL.encode_flac(_sine(700), block_size=256)
    for cut in range(4, len(blob)):
        with pytest.raises(ValueError):
            FL.decode_flac(blob[:cut])


def test_channel_count_cannot_multiply_memory_bound():
    """An 8-channel header must not 8x the decode allocation: the bound is
    samples x channels, so a declared total that would pass mono is
    rejected when the stream claims 8 channels."""
    per_ch = (FL.MAX_TOTAL_SAMPLES // 8) + 1
    blob = bytearray(FL.encode_flac(np.zeros(16, dtype=np.int64)))
    # patch STREAMINFO (body starts at byte 8): channels-1=7 into si[12]
    # bits 3-1, the 36-bit total into si[13] low nibble + si[14:18]
    blob[8 + 12] = (blob[8 + 12] & ~0x0E) | (7 << 1)
    blob[8 + 13] = (blob[8 + 13] & 0xF0) | ((per_ch >> 32) & 0x0F)
    blob[8 + 14 : 8 + 18] = (per_ch & 0xFFFFFFFF).to_bytes(4, "big")
    with pytest.raises(ValueError, match="exceeds bound"):
        FL.decode_flac(bytes(blob))
    # the same declared total passes as MONO (proves the gate multiplies
    # by channels rather than just having a smaller constant): it then
    # fails later, loudly, because the stream lacks the declared frames
    mono = bytearray(FL.encode_flac(np.zeros(16, dtype=np.int64)))
    mono[8 + 13] = (mono[8 + 13] & 0xF0) | ((per_ch >> 32) & 0x0F)
    mono[8 + 14 : 8 + 18] = (per_ch & 0xFFFFFFFF).to_bytes(4, "big")
    with pytest.raises(ValueError, match="ends before declared"):
        FL.decode_flac(bytes(mono), verify_md5=False)
