"""FLAC (xiph.org format / RFC 9639) — full frame decode to PCM plus a
fixture encoder, extending the real audio path beyond 16-bit PCM WAV.
Speech/audio training corpora overwhelmingly ship FLAC (LibriSpeech,
Common Voice exports), so a multimodal curation pipeline that can only
read WAV leaves the dominant audio container opaque.

What is REAL and spec-conformant here:

- Metadata-block walk (STREAMINFO stays `codec_media.flac_info`'s seam;
  this module re-reads it for the decode parameters and the PCM MD5).
- Frame headers (§9.1): 14-bit sync, blocking strategy, all block-size /
  sample-rate / sample-size / channel-assignment codes including the
  end-of-header 8/16-bit forms, UTF-8-style coded frame/sample numbers,
  and the CRC-8 (poly 0x07) header check.
- Subframes (§9.2): CONSTANT, VERBATIM, FIXED orders 0-4, LPC orders
  1-32 (signed quantized coefficients, arithmetic-shift prediction in
  exact integer arithmetic), and wasted-bits-per-sample.
- Rice-coded residual (§9.2.7): both coding methods (4- and 5-bit
  parameters), partition orders, and escaped (raw two's-complement)
  partitions.
- Inter-channel decorrelation: left-side, right-side, and mid-side
  reconstruction.
- Frame CRC-16 (poly 0x8005) and the STREAMINFO MD5 of the decoded PCM
  (little-endian, channel-interleaved, ceil(bits/8) bytes per sample) —
  FLAC's built-in end-to-end integrity oracle, verified on every decode
  when the encoder populated it.

The fixture encoder emits legal streams exercising every decoder path
(subframe types, stereo modes, partition orders, escapes, wasted bits,
partial tail blocks) with by-construction STREAMINFO totals and MD5.
No system FLAC implementation exists in this container, so conformance
rests on the same discipline as codec_jpx/codec_ccitt: spec-pinned
structure tests, encode→decode roundtrips over hypothesis-generated PCM,
mutation fuzz (CRCs must catch corruption loudly), and the MD5 chain
(encoder hashes its INPUT, decoder hashes its OUTPUT — equality proves
exact reconstruction through the full coding stack).

Throughput honesty (same class as codec_jpeg's note): rice decode is
bit-serial Python (~1-3 µs/residual) and LPC reconstruction is a
per-sample Python loop; FIXED-predictor reconstruction is vectorized
(numpy cumulative-sum integration). Linear, Arrow-batch parallel across
documents — a libFLAC swap seam applies where wall-clock matters.

Reference parity: the reference service (/root/reference, FastAPI blob
store) has no audio path at all; this extends the multimodal curation
surface the driver mandates.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

MAX_TOTAL_SAMPLES = 1 << 26  # hostile-input bound on samples × channels
# (~512 MiB of int64 working state at the cap, regardless of channel count
# — the bound multiplies by channels so an 8-channel header can't 8× it)
MAX_BLOCK = 65536

_FIXED_RATES = {
    1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
    7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000,
}
_SAMPLE_SIZES = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}


def _crc_table(poly: int, width: int) -> list[int]:
    top = 1 << (width - 1)
    mask = (1 << width) - 1
    table = []
    for b in range(256):
        r = b << (width - 8)
        for _ in range(8):
            r = ((r << 1) ^ poly) & mask if r & top else (r << 1) & mask
        table.append(r)
    return table


_CRC8 = _crc_table(0x07, 8)
_CRC16 = _crc_table(0x8005, 16)


def _crc8(data: bytes | memoryview) -> int:
    r = 0
    for b in data:
        r = _CRC8[r ^ b]
    return r


def _crc16(data: bytes | memoryview) -> int:
    r = 0
    for b in data:
        r = _CRC16[((r >> 8) ^ b) & 0xFF] ^ ((r << 8) & 0xFFFF)
    return r


# ---------------------------------------------------------------------------
# Bit I/O (MSB-first, as everywhere in FLAC)
# ---------------------------------------------------------------------------


class _Bits:
    __slots__ = ("d", "pos", "n")

    def __init__(self, data: bytes, bytepos: int = 0) -> None:
        self.d = data
        self.pos = bytepos * 8
        self.n = len(data) * 8

    def u(self, nbits: int) -> int:
        pos = self.pos
        end = pos + nbits
        if end > self.n:
            raise ValueError("FLAC: bitstream truncated")
        v = int.from_bytes(self.d[pos >> 3 : (end + 7) >> 3], "big")
        v >>= (-end) & 7
        self.pos = end
        return v & ((1 << nbits) - 1)

    def s(self, nbits: int) -> int:
        v = self.u(nbits)
        return v - (1 << nbits) if v >> (nbits - 1) else v

    def unary(self) -> int:
        """Count of 0 bits before the terminating 1 bit."""
        d, pos, n = self.d, self.pos, self.n
        count = 0
        # fast path: skip whole zero bytes once aligned
        while pos < n:
            if not pos & 7:
                while pos + 8 <= n and d[pos >> 3] == 0:
                    pos += 8
                    count += 8
                    if count > 1 << 20:
                        raise ValueError("FLAC: runaway unary code")
            if pos >= n:
                break
            bit = (d[pos >> 3] >> (7 - (pos & 7))) & 1
            pos += 1
            if bit:
                self.pos = pos
                return count
            count += 1
        raise ValueError("FLAC: bitstream truncated in unary code")

    def byte_align(self) -> None:
        self.pos = (self.pos + 7) & ~7


class _BitW:
    __slots__ = ("out", "buf", "nbits")

    def __init__(self) -> None:
        self.out = bytearray()
        self.buf = 0
        self.nbits = 0

    def u(self, v: int, nbits: int) -> None:
        buf = (self.buf << nbits) | (v & ((1 << nbits) - 1))
        nb = self.nbits + nbits
        while nb >= 8:
            nb -= 8
            self.out.append((buf >> nb) & 0xFF)
        self.buf = buf & ((1 << nb) - 1)
        self.nbits = nb

    def s(self, v: int, nbits: int) -> None:
        self.u(v & ((1 << nbits) - 1), nbits)

    def unary(self, q: int) -> None:
        while q >= 32:
            self.u(0, 32)
            q -= 32
        self.u(1, q + 1)

    def byte_align(self) -> None:
        if self.nbits:
            self.u(0, 8 - self.nbits)


# ---------------------------------------------------------------------------
# Shared pieces
# ---------------------------------------------------------------------------


def _read_coded_number(br: _Bits) -> int:
    """UTF-8-style variable-length number (frame/sample index, §9.1.5)."""
    b0 = br.u(8)
    if b0 < 0x80:
        return b0
    ones = 0
    m = b0
    while m & 0x80:
        ones += 1
        m = (m << 1) & 0xFF
    if ones < 2 or ones > 7:
        raise ValueError("FLAC: bad coded-number lead byte")
    val = b0 & (0x7F >> ones)
    for _ in range(ones - 1):
        c = br.u(8)
        if c & 0xC0 != 0x80:
            raise ValueError("FLAC: bad coded-number continuation")
        val = (val << 6) | (c & 0x3F)
    return val


def _write_coded_number(bw: _BitW, val: int) -> None:
    if val < 0x80:
        bw.u(val, 8)
        return
    # choose the shortest form with n lead ones, n-1 continuations
    for nbytes in range(2, 8):
        payload_bits = (7 - nbytes) + 6 * (nbytes - 1)
        if val < (1 << payload_bits):
            break
    else:
        raise ValueError("FLAC: coded number too large")
    cont = [(val >> (6 * i)) & 0x3F for i in range(nbytes - 1)]
    lead_payload = val >> (6 * (nbytes - 1))
    lead = ((0xFF << (8 - nbytes)) & 0xFF) | lead_payload
    bw.u(lead, 8)
    for c in reversed(cont):
        bw.u(0x80 | c, 8)


_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _pcm_bytes(arr: np.ndarray, bits: int) -> bytes:
    """FLAC's MD5 byte layout: channel-interleaved samples, little-endian,
    the smallest whole number of bytes per sample, two's complement —
    shared by the encoder (hashes its INPUT) and decoder (hashes its
    OUTPUT) so the integrity chain can't drift between the two."""
    channels = arr.shape[1]
    nbytes = (bits + 7) // 8
    inter = np.empty(arr.size, dtype=np.int64)
    for c in range(channels):
        inter[c::channels] = arr[:, c]
    masked = inter & ((1 << (8 * nbytes)) - 1)
    if nbytes == 1:
        return masked.astype(np.uint8).tobytes()
    if nbytes == 2:
        return masked.astype("<u2").tobytes()
    if nbytes == 3:
        a32 = masked.astype(np.uint32)
        b3 = np.empty((arr.size, 3), dtype=np.uint8)
        b3[:, 0] = a32 & 0xFF
        b3[:, 1] = (a32 >> 8) & 0xFF
        b3[:, 2] = (a32 >> 16) & 0xFF
        return b3.tobytes()
    return masked.astype("<u4").tobytes()


def _integrate_fixed(warmup: list[int], resid: np.ndarray, order: int) -> np.ndarray:
    """Reconstruct a FIXED-predictor subframe by repeated prefix-sum
    integration (Δ^order a = residual on the tail) — vectorized, exact in
    int64 for all legal sample widths and orders."""
    n_tail = len(resid)
    if order == 0:
        return resid.astype(np.int64)
    pyr = [np.asarray(warmup, dtype=np.int64)]
    for _ in range(order):
        pyr.append(np.diff(pyr[-1]))
    cur = resid.astype(np.int64)
    for k in range(order - 1, -1, -1):
        if n_tail:
            cur = pyr[k][-1] + np.cumsum(cur)
        else:
            cur = np.empty(0, dtype=np.int64)
    return np.concatenate([pyr[0], cur])


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


def _decode_residual(br: _Bits, blocksize: int, order: int) -> np.ndarray:
    method = br.u(2)
    if method > 1:
        raise ValueError("FLAC: reserved residual coding method")
    pbits = 4 + method
    escape = (1 << pbits) - 1
    part_order = br.u(4)
    nparts = 1 << part_order
    if blocksize % nparts:
        raise ValueError("FLAC: partition order does not divide block")
    out = np.empty(blocksize - order, dtype=np.int64)
    w = 0
    for p in range(nparts):
        count = (blocksize >> part_order) - (order if p == 0 else 0)
        if count < 0:
            raise ValueError("FLAC: partition smaller than predictor order")
        param = br.u(pbits)
        if param == escape:
            nb = br.u(5)
            if nb == 0:
                out[w : w + count] = 0
            else:
                for i in range(count):
                    out[w + i] = br.s(nb)
            w += count
            continue
        for i in range(count):
            q = br.unary()
            u = (q << param) | (br.u(param) if param else 0)
            out[w + i] = (u >> 1) ^ -(u & 1)
        w += count
    return out


def _decode_subframe(br: _Bits, blocksize: int, bps: int) -> np.ndarray:
    if br.u(1):
        raise ValueError("FLAC: subframe padding bit set")
    stype = br.u(6)
    wasted = 0
    if br.u(1):
        wasted = br.unary() + 1
    eff = bps - wasted
    if eff <= 0:
        raise ValueError("FLAC: wasted bits exceed sample size")
    if stype == 0:  # CONSTANT
        v = br.s(eff)
        out = np.full(blocksize, v, dtype=np.int64)
    elif stype == 1:  # VERBATIM
        out = np.empty(blocksize, dtype=np.int64)
        for i in range(blocksize):
            out[i] = br.s(eff)
    elif 8 <= stype <= 12:  # FIXED order 0-4
        order = stype - 8
        if order > blocksize:
            raise ValueError("FLAC: predictor order exceeds block size")
        warm = [br.s(eff) for _ in range(order)]
        resid = _decode_residual(br, blocksize, order)
        out = _integrate_fixed(warm, resid, order)
    elif stype >= 32:  # LPC order 1-32
        order = stype - 31
        if order > blocksize:
            raise ValueError("FLAC: predictor order exceeds block size")
        warm = [br.s(eff) for _ in range(order)]
        prec = br.u(4)
        if prec == 15:
            raise ValueError("FLAC: invalid LPC precision")
        prec += 1
        shift = br.s(5)
        if shift < 0:
            raise ValueError("FLAC: negative LPC shift")
        coefs = [br.s(prec) for _ in range(order)]
        resid = _decode_residual(br, blocksize, order)
        # exact integer feedback loop (python ints: no overflow at any width)
        hist = list(warm)
        rl = resid.tolist()
        for i in range(blocksize - order):
            acc = 0
            for j in range(order):
                acc += coefs[j] * hist[i + order - 1 - j]
            hist.append(rl[i] + (acc >> shift))
        out = np.array(hist, dtype=np.int64)
    else:
        raise ValueError("FLAC: reserved subframe type %d" % stype)
    if wasted:
        out <<= wasted
    return out


def decode_flac(data: bytes, verify_md5: bool = True) -> dict:
    """Decode a full FLAC stream → ``{"sample_rate", "channels", "bits",
    "total_samples", "samples", "md5_checked"}`` with ``samples`` an
    int32 (n, channels) array. Verifies every frame's CRC-8/CRC-16 and,
    when STREAMINFO carries a nonzero MD5 and ``verify_md5``, the decoded
    PCM's MD5 — raising loud ``ValueError`` on any mismatch."""
    if data[:4] != b"fLaC" or len(data) < 42:
        raise ValueError("not a FLAC stream")
    if data[4] & 0x7F != 0:
        raise ValueError("FLAC: first metadata block is not STREAMINFO")
    si = data[8:42]
    rate = (si[10] << 12) | (si[11] << 4) | (si[12] >> 4)
    channels = ((si[12] >> 1) & 7) + 1
    bits = (((si[12] & 1) << 4) | (si[13] >> 4)) + 1
    total = ((si[13] & 0x0F) << 32) | struct.unpack(">I", si[14:18])[0]
    md5 = si[18:34]
    if rate == 0:
        raise ValueError("FLAC: zero sample rate")
    if total * channels > MAX_TOTAL_SAMPLES:
        raise ValueError("FLAC: declared sample count exceeds bound")
    # walk metadata blocks to the audio frames
    pos = 4
    while True:
        if pos + 4 > len(data):
            raise ValueError("FLAC: truncated metadata")
        hdr = data[pos]
        (blen,) = struct.unpack(">I", b"\x00" + data[pos + 1 : pos + 4])
        pos += 4 + blen
        if pos > len(data):
            raise ValueError("FLAC: truncated metadata block")
        if hdr & 0x80:
            break

    chans: list[list[np.ndarray]] = [[] for _ in range(channels)]
    got = 0
    while pos < len(data) and (total == 0 or got < total):
        if pos + 2 > len(data):
            raise ValueError("FLAC: truncated frame header")
        if data[pos] != 0xFF or (data[pos + 1] & 0xFC) != 0xF8:
            raise ValueError("FLAC: lost frame sync at byte %d" % pos)
        br = _Bits(data, pos)
        br.u(14)  # sync
        br.u(1)  # reserved
        br.u(1)  # blocking strategy (coded number read generically below)
        bs_code = br.u(4)
        sr_code = br.u(4)
        ch_code = br.u(4)
        ss_code = br.u(3)
        if br.u(1):
            raise ValueError("FLAC: frame header reserved bit set")
        _read_coded_number(br)
        if bs_code == 0:
            raise ValueError("FLAC: reserved block size code")
        if bs_code == 1:
            blocksize = 192
        elif bs_code <= 5:
            blocksize = 576 << (bs_code - 2)
        elif bs_code == 6:
            blocksize = br.u(8) + 1
        elif bs_code == 7:
            blocksize = br.u(16) + 1
        else:
            blocksize = 256 << (bs_code - 8)
        if blocksize > MAX_BLOCK:
            raise ValueError("FLAC: block size exceeds bound")
        if sr_code == 0:
            frate = rate
        elif sr_code in _FIXED_RATES:
            frate = _FIXED_RATES[sr_code]
        elif sr_code == 12:
            frate = br.u(8) * 1000
        elif sr_code == 13:
            frate = br.u(16)
        elif sr_code == 14:
            frate = br.u(16) * 10
        else:
            raise ValueError("FLAC: invalid sample rate code")
        if frate != rate:
            raise ValueError("FLAC: frame sample rate contradicts STREAMINFO")
        if ss_code == 0:
            fbits = bits
        elif ss_code in _SAMPLE_SIZES:
            fbits = _SAMPLE_SIZES[ss_code]
        else:
            raise ValueError("FLAC: reserved sample size code")
        if fbits != bits:
            raise ValueError("FLAC: frame sample size contradicts STREAMINFO")
        if ch_code <= 7:
            nch = ch_code + 1
            mode = "indep"
        elif ch_code in (8, 9, 10):
            nch = 2
            mode = {8: "ls", 9: "rs", 10: "ms"}[ch_code]
        else:
            raise ValueError("FLAC: reserved channel assignment")
        if nch != channels:
            raise ValueError("FLAC: frame channel count contradicts STREAMINFO")
        hdr_end = (br.pos + 7) >> 3  # header is byte-aligned before CRC-8
        if hdr_end + 1 > len(data):
            raise ValueError("FLAC: truncated frame header")
        if _crc8(memoryview(data)[pos:hdr_end]) != data[hdr_end]:
            raise ValueError("FLAC: frame header CRC-8 mismatch")
        br.pos = (hdr_end + 1) * 8

        subs = []
        for c in range(nch):
            bps = bits
            if (mode == "ls" and c == 1) or (mode == "rs" and c == 0) or (
                mode == "ms" and c == 1
            ):
                bps += 1  # the side channel carries one extra bit
            subs.append(_decode_subframe(br, blocksize, bps))
        br.byte_align()
        frame_end = br.pos >> 3
        if frame_end + 2 > len(data):
            raise ValueError("FLAC: truncated frame footer")
        want = struct.unpack(">H", data[frame_end : frame_end + 2])[0]
        if _crc16(memoryview(data)[pos:frame_end]) != want:
            raise ValueError("FLAC: frame CRC-16 mismatch")
        pos = frame_end + 2

        if mode == "ls":
            left, side = subs
            subs = [left, left - side]
        elif mode == "rs":
            side, right = subs
            subs = [right + side, right]
        elif mode == "ms":
            mid, side = subs
            m2 = (mid << 1) | (side & 1)
            subs = [(m2 + side) >> 1, (m2 - side) >> 1]
        got += blocksize
        if got * channels > MAX_TOTAL_SAMPLES:
            raise ValueError("FLAC: decoded sample count exceeds bound")
        for c in range(channels):
            chans[c].append(subs[c])

    if total and got < total:
        raise ValueError("FLAC: stream ends before declared sample count")
    if chans[0]:
        planes = [np.concatenate(p) for p in chans]
    else:
        planes = [np.empty(0, dtype=np.int64) for _ in range(channels)]
    if total:
        planes = [p[:total] for p in planes]
    out = np.stack(planes, axis=1).astype(np.int32)
    md5_checked = False
    if verify_md5 and md5 != b"\x00" * 16:
        if hashlib.md5(_pcm_bytes(out, bits)).digest() != md5:
            raise ValueError("FLAC: decoded PCM MD5 mismatch")
        md5_checked = True
    return {
        "sample_rate": rate,
        "channels": channels,
        "bits": bits,
        "total_samples": total or int(out.shape[0]),
        "samples": out,
        "md5_checked": md5_checked,
    }


def decode_flac_pcm16(data: bytes) -> tuple[int, np.ndarray]:
    """(sample_rate, mono int16 samples) — the audio-features seam.
    Multi-channel input is averaged; widths re-scale to 16-bit."""
    info = decode_flac(data)
    s = info["samples"].astype(np.int64)
    mono = s.mean(axis=1).astype(np.int64) if s.shape[1] > 1 else s[:, 0]
    shift = info["bits"] - 16
    if shift > 0:
        mono = mono >> shift
    elif shift < 0:
        mono = mono << -shift
    return info["sample_rate"], np.clip(mono, -32768, 32767).astype(np.int16)


# ---------------------------------------------------------------------------
# Fixture encoder
# ---------------------------------------------------------------------------


def _encode_residual(
    bw: _BitW, resid: np.ndarray, order: int, blocksize: int, part_order: int
) -> None:
    if blocksize % (1 << part_order):
        raise ValueError("FLAC: partition order does not divide block")
    # zigzag fold: v>=0 -> 2v, v<0 -> -2v-1
    folded = np.abs(resid.astype(np.int64) * 2) - (resid < 0).astype(np.int64)
    bw.u(0, 2)  # rice method 0 (4-bit params)
    bw.u(part_order, 4)
    w = 0
    for p in range(1 << part_order):
        count = (blocksize >> part_order) - (order if p == 0 else 0)
        if count < 0:
            raise ValueError("FLAC: partition smaller than predictor order")
        part = folded[w : w + count]
        raw = resid[w : w + count]
        w += count
        if len(part):
            mean = int(part.mean())
            param = max(0, mean.bit_length() - 1)
        else:
            param = 0
        if param > 14:  # escape: raw two's-complement residuals
            nb = 1 + max(
                int(np.max(raw)).bit_length() if len(raw) else 0,
                (int(-np.min(raw)) - 1).bit_length() if len(raw) and raw.min() < 0 else 0,
            )
            nb = min(max(nb, 1), 31)
            bw.u(15, 4)
            bw.u(nb, 5)
            for v in raw.tolist():
                bw.s(v, nb)
            continue
        bw.u(param, 4)
        for u in part.tolist():
            bw.unary(u >> param)
            if param:
                bw.u(u & ((1 << param) - 1), param)


_LPC_COEFS = [48, -16]  # 1.5·a[i-1] − 0.5·a[i-2] at shift 5 — deterministic
_LPC_SHIFT = 5
_LPC_PREC = 7  # bits per coefficient (covers ±48 with sign)


def _encode_subframe(
    bw: _BitW, samples: np.ndarray, bps: int, strategy: str, part_order: int
) -> None:
    n = len(samples)
    arr = samples.astype(np.int64)
    wasted = 0
    if strategy == "wasted" and n and np.any(arr):
        nz = arr[arr != 0]
        wasted = min(
            int(min((int(v) & -int(v)).bit_length() - 1 for v in nz)), bps - 1
        )
        if wasted:
            arr = arr >> wasted
    eff = bps - wasted

    def header(stype: int) -> None:
        bw.u(0, 1)
        bw.u(stype, 6)
        if wasted:
            bw.u(1, 1)
            bw.unary(wasted - 1)
        else:
            bw.u(0, 1)

    if n and np.all(arr == arr[0]) and strategy not in ("verbatim",):
        header(0)
        bw.s(int(arr[0]), eff)
        return
    if strategy == "verbatim" or n < 8:
        header(1)
        for v in arr.tolist():
            bw.s(v, eff)
        return
    if strategy == "lpc":
        order = len(_LPC_COEFS)
        header(32 + order - 1)
        for v in arr[:order].tolist():
            bw.s(v, eff)
        bw.u(_LPC_PREC - 1, 4)
        bw.s(_LPC_SHIFT, 5)
        for c in _LPC_COEFS:
            bw.s(c, _LPC_PREC)
        hist = arr.tolist()
        resid = np.empty(n - order, dtype=np.int64)
        for i in range(order, n):
            acc = 0
            for j in range(order):
                acc += _LPC_COEFS[j] * hist[i - 1 - j]
            resid[i - order] = hist[i] - (acc >> _LPC_SHIFT)
        _encode_residual(bw, resid, order, n, part_order)
        return
    # fixed: pick the order with the smallest absolute residual sum
    best_order, best_resid, best_cost = 0, arr, None
    cur = arr
    for order in range(5):
        resid = cur[order:] if order == 0 else None
        if order:
            cur = np.diff(cur)
            resid = cur
        cost = int(np.abs(resid).sum()) if len(resid) else 0
        if best_cost is None or cost < best_cost:
            best_order, best_resid, best_cost = order, resid, cost
        if order >= n:
            break
    order = best_order
    header(8 + order)
    for v in arr[:order].tolist():
        bw.s(v, eff)
    _encode_residual(bw, np.asarray(best_resid), order, n, part_order)


def encode_flac(
    samples: np.ndarray,
    sample_rate: int = 16000,
    bits: int = 16,
    block_size: int = 4096,
    strategy: str = "auto",
    stereo_mode: str = "rotate",
) -> bytes:
    """Fixture writer: a complete, decodable FLAC stream. ``samples`` is
    (n,) or (n, channels) int; ``strategy`` one of auto|verbatim|lpc|
    wasted (auto = constant/fixed per block); stereo pairs rotate through
    independent/left-side/right-side/mid-side per block (``stereo_mode``
    'indep' pins plain stereo). STREAMINFO carries exact totals and the
    PCM MD5, so any conformant decoder can certify reconstruction."""
    arr = np.asarray(samples, dtype=np.int64)
    if arr.ndim == 1:
        arr = arr[:, None]
    n, channels = arr.shape
    if channels < 1 or channels > 8:
        raise ValueError("FLAC: 1-8 channels")
    if bits not in (8, 12, 16, 20, 24):
        raise ValueError("FLAC: unsupported fixture bit depth")
    lo, hi = -(1 << (bits - 1)), (1 << (bits - 1)) - 1
    if arr.size and (arr.min() < lo or arr.max() > hi):
        raise ValueError("FLAC: samples exceed declared bit depth")
    if arr.size > MAX_TOTAL_SAMPLES:
        raise ValueError("FLAC: too many samples")

    md5 = hashlib.md5(_pcm_bytes(arr, bits)).digest()

    si = bytearray(34)
    struct.pack_into(">H", si, 0, min(max(block_size, 16), 65535))
    struct.pack_into(">H", si, 2, min(max(block_size, 16), 65535))
    si[10] = (sample_rate >> 12) & 0xFF
    si[11] = (sample_rate >> 4) & 0xFF
    si[12] = ((sample_rate & 0xF) << 4) | ((channels - 1) << 1) | ((bits - 1) >> 4)
    si[13] = (((bits - 1) & 0xF) << 4) | ((n >> 32) & 0x0F)
    struct.pack_into(">I", si, 14, n & 0xFFFFFFFF)
    si[18:34] = md5
    out = bytearray(b"fLaC")
    out += bytes((0x80,)) + b"\x00\x00\x22" + bytes(si)

    ss_code = {8: 1, 12: 2, 16: 4, 20: 5, 24: 6}[bits]
    frame_no = 0
    for start in range(0, max(n, 1), block_size) if n else []:
        blk = arr[start : start + block_size]
        bs = len(blk)
        modes = ["indep"]
        if channels == 2:
            modes = (
                ["indep"]
                if stereo_mode == "indep"
                else ["indep", "ls", "rs", "ms"]
            )
        mode = modes[frame_no % len(modes)]
        bw = _BitW()
        bw.u(0x3FFE, 14)
        bw.u(0, 1)
        bw.u(0, 1)  # fixed-blocksize stream
        # block size code: exact power forms when available, else 16-bit
        if bs == 192:
            bs_code, bs_extra = 1, None
        elif bs in (576, 1152, 2304, 4608):
            bs_code, bs_extra = 2 + (bs // 576).bit_length() - 1, None
        elif bs in (256, 512, 1024, 2048, 4096, 8192, 16384, 32768):
            bs_code, bs_extra = 8 + (bs // 256).bit_length() - 1, None
        else:
            bs_code, bs_extra = 7, bs - 1
        bw.u(bs_code, 4)
        bw.u(0, 4)  # sample rate: from STREAMINFO
        if mode == "indep":
            bw.u(channels - 1, 4)
        else:
            bw.u({"ls": 8, "rs": 9, "ms": 10}[mode], 4)
        bw.u(ss_code, 3)
        bw.u(0, 1)
        _write_coded_number(bw, frame_no)
        if bs_extra is not None:
            bw.u(bs_extra, 16)
        bw.byte_align()
        hdr = bytes(bw.out)
        bw.u(_crc8(hdr), 8)

        part_order = 0
        if bs >= 512 and bs % 4 == 0:
            part_order = (frame_no % 3)
            while bs % (1 << part_order) or (bs >> part_order) <= 4:
                part_order -= 1
        if mode == "indep":
            for c in range(channels):
                _encode_subframe(bw, blk[:, c], bits, strategy, part_order)
        else:
            left, right = blk[:, 0], blk[:, 1]
            side = left - right
            if mode == "ls":
                chans_out = [(left, bits), (side, bits + 1)]
            elif mode == "rs":
                chans_out = [(side, bits + 1), (right, bits)]
            else:
                mid = (left + right) >> 1
                chans_out = [(mid, bits), (side, bits + 1)]
            for cdata, bps in chans_out:
                _encode_subframe(bw, cdata, bps, strategy, part_order)
        bw.byte_align()
        frame = bytes(bw.out)
        out += frame + struct.pack(">H", _crc16(frame))
        frame_no += 1
    return bytes(out)
