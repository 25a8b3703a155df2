"""Minimal pure-Python AES (FIPS-197) + CBC, for PDF standard-security
AES crypt filters (/CFM /AESV2 = AES-128-CBC, /AESV3 = AES-256-CBC).

The container ships no crypto library beyond hashlib, and the PDF corpus
work needs both directions (decrypt for parsing, encrypt for fixture
writers), so the block cipher is implemented from the public FIPS-197
specification using the classic 32-bit T-table formulation (SubBytes ∘
ShiftRows ∘ MixColumns folded into four 256-entry word tables) — the
/R 6 password hash runs thousands of block operations per file, and the
naive per-byte GF(2^8) form is ~20× too slow for tests.
"""

from __future__ import annotations

_SBOX = [0] * 256
_INV_SBOX = [0] * 256


def _mul(a: int, b: int) -> int:
    out = 0
    while b:
        if b & 1:
            out ^= a
        a = (a << 1) ^ (0x11B if a & 0x80 else 0)
        a &= 0xFF
        b >>= 1
    return out


def _init_tables() -> None:
    exp, log = [0] * 512, [0] * 256
    x = 1
    for i in range(255):
        exp[i] = x
        log[x] = i
        x ^= (x << 1) ^ (0x11B if x & 0x80 else 0)
        x &= 0xFF
    for i in range(255, 512):
        exp[i] = exp[i - 255]
    for i in range(256):
        inv = 0 if i == 0 else exp[255 - log[i]]
        s = inv
        r = inv
        for _ in range(4):
            r = ((r << 1) | (r >> 7)) & 0xFF
            s ^= r
        s ^= 0x63
        _SBOX[i] = s
        _INV_SBOX[s] = i


_init_tables()

# encryption T-tables: T0[x] = (2s, s, s, 3s) as a big-endian 32-bit word
# for column word (a0,a1,a2,a3) -> MixColumns(SubBytes(...)); T1..T3 are
# byte rotations of T0. Decryption tables likewise from InvSubBytes +
# InvMixColumns.
_T0 = [0] * 256
_D0 = [0] * 256
for _i in range(256):
    _s = _SBOX[_i]
    _T0[_i] = (_mul(_s, 2) << 24) | (_s << 16) | (_s << 8) | _mul(_s, 3)
    _v = _INV_SBOX[_i]
    _D0[_i] = (
        (_mul(_v, 14) << 24) | (_mul(_v, 9) << 16)
        | (_mul(_v, 13) << 8) | _mul(_v, 11)
    )


def _rot(t: list[int], n: int) -> list[int]:
    return [((w >> (8 * n)) | (w << (32 - 8 * n))) & 0xFFFFFFFF for w in t]


_T1, _T2, _T3 = _rot(_T0, 1), _rot(_T0, 2), _rot(_T0, 3)
_D1, _D2, _D3 = _rot(_D0, 1), _rot(_D0, 2), _rot(_D0, 3)


def _expand_key(key: bytes) -> list[int]:
    """Round keys as a flat list of big-endian 32-bit words."""
    nk = len(key) // 4
    assert nk in (4, 8), "AES-128 or AES-256 keys only"
    nr = nk + 6
    w = [int.from_bytes(key[4 * i : 4 * i + 4], "big") for i in range(nk)]
    rcon = 1
    for i in range(nk, 4 * (nr + 1)):
        t = w[i - 1]
        if i % nk == 0:
            t = ((t << 8) | (t >> 24)) & 0xFFFFFFFF  # RotWord
            t = (
                (_SBOX[(t >> 24) & 0xFF] << 24) | (_SBOX[(t >> 16) & 0xFF] << 16)
                | (_SBOX[(t >> 8) & 0xFF] << 8) | _SBOX[t & 0xFF]
            )
            t ^= rcon << 24
            rcon = _mul(rcon, 2)
        elif nk == 8 and i % nk == 4:
            t = (
                (_SBOX[(t >> 24) & 0xFF] << 24) | (_SBOX[(t >> 16) & 0xFF] << 16)
                | (_SBOX[(t >> 8) & 0xFF] << 8) | _SBOX[t & 0xFF]
            )
        w.append(w[i - nk] ^ t)
    return w


def _inv_expand_key(rk: list[int]) -> list[int]:
    """Equivalent-inverse-cipher round keys: reversed round order with
    InvMixColumns applied to the middle rounds (the standard trick that
    lets decryption use the same T-table loop shape)."""
    nr = len(rk) // 4 - 1
    out: list[int] = []
    for r in range(nr, -1, -1):
        for c in range(4):
            w = rk[4 * r + c]
            if 0 < r < nr:
                # InvMixColumns on the round-key word: D-tables compose
                # InvSubBytes∘InvMixColumns, so feed SubBytes(w) through
                b = [(w >> 24) & 0xFF, (w >> 16) & 0xFF, (w >> 8) & 0xFF, w & 0xFF]
                w = (
                    _D0[_SBOX[b[0]]] ^ _D1[_SBOX[b[1]]]
                    ^ _D2[_SBOX[b[2]]] ^ _D3[_SBOX[b[3]]]
                )
            out.append(w)
    return out


def _encrypt_words(s0: int, s1: int, s2: int, s3: int, rk: list[int]) -> tuple:
    nr = len(rk) // 4 - 1
    s0 ^= rk[0]; s1 ^= rk[1]; s2 ^= rk[2]; s3 ^= rk[3]  # noqa: E702
    k = 4
    for _ in range(nr - 1):
        t0 = _T0[(s0 >> 24) & 0xFF] ^ _T1[(s1 >> 16) & 0xFF] ^ _T2[(s2 >> 8) & 0xFF] ^ _T3[s3 & 0xFF] ^ rk[k]
        t1 = _T0[(s1 >> 24) & 0xFF] ^ _T1[(s2 >> 16) & 0xFF] ^ _T2[(s3 >> 8) & 0xFF] ^ _T3[s0 & 0xFF] ^ rk[k + 1]
        t2 = _T0[(s2 >> 24) & 0xFF] ^ _T1[(s3 >> 16) & 0xFF] ^ _T2[(s0 >> 8) & 0xFF] ^ _T3[s1 & 0xFF] ^ rk[k + 2]
        t3 = _T0[(s3 >> 24) & 0xFF] ^ _T1[(s0 >> 16) & 0xFF] ^ _T2[(s1 >> 8) & 0xFF] ^ _T3[s2 & 0xFF] ^ rk[k + 3]
        s0, s1, s2, s3 = t0, t1, t2, t3
        k += 4
    # final round: SubBytes + ShiftRows only
    t0 = ((_SBOX[(s0 >> 24) & 0xFF] << 24) | (_SBOX[(s1 >> 16) & 0xFF] << 16)
          | (_SBOX[(s2 >> 8) & 0xFF] << 8) | _SBOX[s3 & 0xFF]) ^ rk[k]
    t1 = ((_SBOX[(s1 >> 24) & 0xFF] << 24) | (_SBOX[(s2 >> 16) & 0xFF] << 16)
          | (_SBOX[(s3 >> 8) & 0xFF] << 8) | _SBOX[s0 & 0xFF]) ^ rk[k + 1]
    t2 = ((_SBOX[(s2 >> 24) & 0xFF] << 24) | (_SBOX[(s3 >> 16) & 0xFF] << 16)
          | (_SBOX[(s0 >> 8) & 0xFF] << 8) | _SBOX[s1 & 0xFF]) ^ rk[k + 2]
    t3 = ((_SBOX[(s3 >> 24) & 0xFF] << 24) | (_SBOX[(s0 >> 16) & 0xFF] << 16)
          | (_SBOX[(s1 >> 8) & 0xFF] << 8) | _SBOX[s2 & 0xFF]) ^ rk[k + 3]
    return t0, t1, t2, t3


def _decrypt_words(s0: int, s1: int, s2: int, s3: int, dk: list[int]) -> tuple:
    nr = len(dk) // 4 - 1
    s0 ^= dk[0]; s1 ^= dk[1]; s2 ^= dk[2]; s3 ^= dk[3]  # noqa: E702
    k = 4
    for _ in range(nr - 1):
        t0 = _D0[(s0 >> 24) & 0xFF] ^ _D1[(s3 >> 16) & 0xFF] ^ _D2[(s2 >> 8) & 0xFF] ^ _D3[s1 & 0xFF] ^ dk[k]
        t1 = _D0[(s1 >> 24) & 0xFF] ^ _D1[(s0 >> 16) & 0xFF] ^ _D2[(s3 >> 8) & 0xFF] ^ _D3[s2 & 0xFF] ^ dk[k + 1]
        t2 = _D0[(s2 >> 24) & 0xFF] ^ _D1[(s1 >> 16) & 0xFF] ^ _D2[(s0 >> 8) & 0xFF] ^ _D3[s3 & 0xFF] ^ dk[k + 2]
        t3 = _D0[(s3 >> 24) & 0xFF] ^ _D1[(s2 >> 16) & 0xFF] ^ _D2[(s1 >> 8) & 0xFF] ^ _D3[s0 & 0xFF] ^ dk[k + 3]
        s0, s1, s2, s3 = t0, t1, t2, t3
        k += 4
    t0 = ((_INV_SBOX[(s0 >> 24) & 0xFF] << 24) | (_INV_SBOX[(s3 >> 16) & 0xFF] << 16)
          | (_INV_SBOX[(s2 >> 8) & 0xFF] << 8) | _INV_SBOX[s1 & 0xFF]) ^ dk[k]
    t1 = ((_INV_SBOX[(s1 >> 24) & 0xFF] << 24) | (_INV_SBOX[(s0 >> 16) & 0xFF] << 16)
          | (_INV_SBOX[(s3 >> 8) & 0xFF] << 8) | _INV_SBOX[s2 & 0xFF]) ^ dk[k + 1]
    t2 = ((_INV_SBOX[(s2 >> 24) & 0xFF] << 24) | (_INV_SBOX[(s1 >> 16) & 0xFF] << 16)
          | (_INV_SBOX[(s0 >> 8) & 0xFF] << 8) | _INV_SBOX[s3 & 0xFF]) ^ dk[k + 2]
    t3 = ((_INV_SBOX[(s3 >> 24) & 0xFF] << 24) | (_INV_SBOX[(s2 >> 16) & 0xFF] << 16)
          | (_INV_SBOX[(s1 >> 8) & 0xFF] << 8) | _INV_SBOX[s0 & 0xFF]) ^ dk[k + 3]
    return t0, t1, t2, t3


def _encrypt_block(block: bytes, rk: list[int]) -> bytes:
    s = _encrypt_words(
        int.from_bytes(block[0:4], "big"), int.from_bytes(block[4:8], "big"),
        int.from_bytes(block[8:12], "big"), int.from_bytes(block[12:16], "big"),
        rk,
    )
    return b"".join(w.to_bytes(4, "big") for w in s)


def _decrypt_block(block: bytes, rk: list[int]) -> bytes:
    dk = _inv_expand_key(rk)
    s = _decrypt_words(
        int.from_bytes(block[0:4], "big"), int.from_bytes(block[4:8], "big"),
        int.from_bytes(block[8:12], "big"), int.from_bytes(block[12:16], "big"),
        dk,
    )
    return b"".join(w.to_bytes(4, "big") for w in s)


def cbc_encrypt(key: bytes, iv: bytes, plaintext: bytes) -> bytes:
    """AES-CBC with PKCS#7 padding; returns ciphertext WITHOUT the IV.

    CBC encryption chains (c_i feeds block i+1) so unlike decryption it
    cannot vectorize across blocks; the loop instead keeps the whole
    message as unpacked 32-bit words (one struct.unpack in, one pack out)
    — measured ~2× over per-block bytes slicing, which is what made the
    R6 password hash (64+ chained CBC passes) cost ~0.26 s."""
    import struct

    rk = _expand_key(key)
    pad = 16 - (len(plaintext) % 16)
    data = plaintext + bytes([pad]) * pad
    n = len(data) // 4
    words = struct.unpack(f">{n}I", data)
    out = [0] * n
    p0, p1, p2, p3 = struct.unpack(">4I", iv[:16])
    enc = _encrypt_words
    for i in range(0, n, 4):
        p0, p1, p2, p3 = enc(
            p0 ^ words[i], p1 ^ words[i + 1],
            p2 ^ words[i + 2], p3 ^ words[i + 3], rk,
        )
        out[i] = p0
        out[i + 1] = p1
        out[i + 2] = p2
        out[i + 3] = p3
    return struct.pack(f">{n}I", *out)


try:  # vectorized decrypt tables (numpy ships in this container; the
    # scalar loop below remains the stdlib-only fallback)
    import numpy as _np

    _D0_NP = _np.array(_D0, dtype=_np.uint32)
    _D1_NP = _np.array(_D1, dtype=_np.uint32)
    _D2_NP = _np.array(_D2, dtype=_np.uint32)
    _D3_NP = _np.array(_D3, dtype=_np.uint32)
    _INV_SBOX_NP = _np.array(_INV_SBOX, dtype=_np.uint32)
except ImportError:  # pragma: no cover - numpy is in this container
    _np = None

# below this many blocks the numpy fancy-index constant cost beats the win
# (measured crossover ≈ 40 blocks on this box: 16 blocks → 0.3×,
# 64 → 1.5×, 4096 → 24×; tiny fixture streams stay on the scalar loop)
_NP_MIN_BLOCKS = 48


def _ecb_decrypt_blocks_np(ciphertext: bytes, dk: list[int]) -> bytes:
    """Raw-AES-decrypt EVERY 16-byte block simultaneously (one vectorized
    T-table round loop over an (N,) lane per state word). CBC *decryption*
    is embarrassingly parallel — P_i = D(C_i) ⊕ C_{i-1} — unlike CBC
    encryption, which chains; this is the 'batch the CBC loop' fix for the
    per-block Python overhead that made AES/RC4 the dominant decode cost in
    the writer-class profile (scripts/profile_pdf_decode.py)."""
    n = len(ciphertext) // 16
    dkn = _np.array(dk, dtype=_np.uint32)
    w = _np.frombuffer(ciphertext, dtype=">u4").astype(_np.uint32).reshape(n, 4)
    s0 = w[:, 0] ^ dkn[0]
    s1 = w[:, 1] ^ dkn[1]
    s2 = w[:, 2] ^ dkn[2]
    s3 = w[:, 3] ^ dkn[3]
    nr = len(dk) // 4 - 1
    k = 4
    for _ in range(nr - 1):
        t0 = _D0_NP[(s0 >> 24) & 0xFF] ^ _D1_NP[(s3 >> 16) & 0xFF] ^ _D2_NP[(s2 >> 8) & 0xFF] ^ _D3_NP[s1 & 0xFF] ^ dkn[k]
        t1 = _D0_NP[(s1 >> 24) & 0xFF] ^ _D1_NP[(s0 >> 16) & 0xFF] ^ _D2_NP[(s3 >> 8) & 0xFF] ^ _D3_NP[s2 & 0xFF] ^ dkn[k + 1]
        t2 = _D0_NP[(s2 >> 24) & 0xFF] ^ _D1_NP[(s1 >> 16) & 0xFF] ^ _D2_NP[(s0 >> 8) & 0xFF] ^ _D3_NP[s3 & 0xFF] ^ dkn[k + 2]
        t3 = _D0_NP[(s3 >> 24) & 0xFF] ^ _D1_NP[(s2 >> 16) & 0xFF] ^ _D2_NP[(s1 >> 8) & 0xFF] ^ _D3_NP[s0 & 0xFF] ^ dkn[k + 3]
        s0, s1, s2, s3 = t0, t1, t2, t3
        k += 4
    t0 = ((_INV_SBOX_NP[(s0 >> 24) & 0xFF] << 24) | (_INV_SBOX_NP[(s3 >> 16) & 0xFF] << 16)
          | (_INV_SBOX_NP[(s2 >> 8) & 0xFF] << 8) | _INV_SBOX_NP[s1 & 0xFF]) ^ dkn[k]
    t1 = ((_INV_SBOX_NP[(s1 >> 24) & 0xFF] << 24) | (_INV_SBOX_NP[(s0 >> 16) & 0xFF] << 16)
          | (_INV_SBOX_NP[(s3 >> 8) & 0xFF] << 8) | _INV_SBOX_NP[s2 & 0xFF]) ^ dkn[k + 1]
    t2 = ((_INV_SBOX_NP[(s2 >> 24) & 0xFF] << 24) | (_INV_SBOX_NP[(s1 >> 16) & 0xFF] << 16)
          | (_INV_SBOX_NP[(s0 >> 8) & 0xFF] << 8) | _INV_SBOX_NP[s3 & 0xFF]) ^ dkn[k + 2]
    t3 = ((_INV_SBOX_NP[(s3 >> 24) & 0xFF] << 24) | (_INV_SBOX_NP[(s2 >> 16) & 0xFF] << 16)
          | (_INV_SBOX_NP[(s1 >> 8) & 0xFF] << 8) | _INV_SBOX_NP[s0 & 0xFF]) ^ dkn[k + 3]
    return (
        _np.stack([t0, t1, t2, t3], axis=1).astype(">u4").tobytes()
    )


def cbc_decrypt(key: bytes, iv: bytes, ciphertext: bytes, unpad: bool = True) -> bytes:
    """AES-CBC decrypt; strips PKCS#7 padding when ``unpad`` (tolerant of
    malformed padding — crawl PDFs contain corrupt streams and the parser
    must degrade, not raise). Blocks decrypt in one vectorized pass when
    numpy is present (property-tested equal to the scalar loop)."""
    if len(ciphertext) % 16:
        ciphertext = ciphertext[: len(ciphertext) - (len(ciphertext) % 16)]
    dk = _inv_expand_key(_expand_key(key))
    if _np is not None and len(ciphertext) >= 16 * _NP_MIN_BLOCKS:
        ecb = _ecb_decrypt_blocks_np(ciphertext, dk)
        prev = _np.frombuffer(iv + ciphertext[:-16], dtype=_np.uint8)
        out = bytearray(
            (_np.frombuffer(ecb, dtype=_np.uint8) ^ prev).tobytes()
        )
    else:
        out = bytearray()
        c_prev = (
            int.from_bytes(iv[0:4], "big"), int.from_bytes(iv[4:8], "big"),
            int.from_bytes(iv[8:12], "big"), int.from_bytes(iv[12:16], "big"),
        )
        for i in range(0, len(ciphertext), 16):
            c = (
                int.from_bytes(ciphertext[i : i + 4], "big"),
                int.from_bytes(ciphertext[i + 4 : i + 8], "big"),
                int.from_bytes(ciphertext[i + 8 : i + 12], "big"),
                int.from_bytes(ciphertext[i + 12 : i + 16], "big"),
            )
            p = _decrypt_words(*c, dk)
            for w, cp in zip(p, c_prev):
                out += (w ^ cp).to_bytes(4, "big")
            c_prev = c
    if unpad and out:
        pad = out[-1]
        if 1 <= pad <= 16 and len(out) >= pad:
            out = out[:-pad]
    return bytes(out)
