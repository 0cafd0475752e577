"""Dependency-free AES (FIPS-197) for the PDF standard security
handler's AESV2/AESV3 crypt filters.

Every table is GENERATED from the field math at import time — the
S-box is GF(2^8) inversion (mod x^8+x^4+x^3+x+1) followed by the
affine transform with 0x63; the MixColumns matrices are the {02,03}
and {0e,0b,0d,09} GF multiplications — so there is nothing to
mistranscribe. Correctness is pinned three ways in tests: the
FIPS-197 Appendix B/C known-answer vectors, encrypt↔decrypt round
trips over random data, and the PDF fixture round trips.

Shape: CBC DECRYPTION is embarrassingly parallel (each plaintext
block = InvCipher(ct_i) XOR ct_{i-1}), so the inverse cipher runs
numpy-vectorized across ALL blocks of a stream at once — table
lookups via fancy indexing, one pass per round. CBC encryption (the
fixture writer) is inherently sequential per block and stays a plain
loop. Both are driver/executor-local kernels for the media tier — no
Spark surface of their own.
"""

from __future__ import annotations

import numpy as np

_POLY = 0x11B  # x^8 + x^4 + x^3 + x + 1


def _gf_mul(a: int, b: int) -> int:
    out = 0
    while b:
        if b & 1:
            out ^= a
        a <<= 1
        if a & 0x100:
            a ^= _POLY
        b >>= 1
    return out


def _build_tables():
    # GF(2^8) inverse via exp/log tables over generator 3
    exp = [0] * 510
    log = [0] * 256
    x = 1
    for i in range(255):
        exp[i] = x
        log[x] = i
        x = _gf_mul(x, 3)
    for i in range(255, 510):
        exp[i] = exp[i - 255]

    def inv(b: int) -> int:
        return 0 if b == 0 else exp[255 - log[b]]

    sbox = np.zeros(256, dtype=np.uint8)
    for b in range(256):
        v = inv(b)
        r = 0x63
        for i in range(8):
            bit = (
                (v >> i) ^ (v >> ((i + 4) % 8)) ^ (v >> ((i + 5) % 8))
                ^ (v >> ((i + 6) % 8)) ^ (v >> ((i + 7) % 8))
            ) & 1
            r ^= bit << i
        sbox[b] = r
    inv_sbox = np.zeros(256, dtype=np.uint8)
    inv_sbox[sbox] = np.arange(256, dtype=np.uint8)
    mul = {
        c: np.array([_gf_mul(b, c) for b in range(256)], dtype=np.uint8)
        for c in (2, 3, 9, 11, 13, 14)
    }
    return sbox, inv_sbox, mul


_SBOX, _INV_SBOX, _MUL = _build_tables()

# ShiftRows/InvShiftRows as flat-index permutations of the 16-byte
# column-major state (byte i of the block is state[row=i%4][col=i//4])
_SHIFT = np.array([(i + 4 * (i % 4)) % 16 for i in range(16)])
_INV_SHIFT = np.zeros(16, dtype=int)
_INV_SHIFT[_SHIFT] = np.arange(16)


def _key_expansion(key: bytes) -> np.ndarray:
    """Round keys as an ((rounds+1)*16,) uint8 array (AES-128/192/256)."""
    nk = len(key) // 4
    if nk not in (4, 6, 8):
        raise ValueError(f"AES key must be 16/24/32 bytes, got {len(key)}")
    rounds = nk + 6
    words = [list(key[4 * i : 4 * i + 4]) for i in range(nk)]
    rcon = 1
    for i in range(nk, 4 * (rounds + 1)):
        t = list(words[i - 1])
        if i % nk == 0:
            t = t[1:] + t[:1]
            t = [int(_SBOX[b]) for b in t]
            t[0] ^= rcon
            rcon = _gf_mul(rcon, 2)
        elif nk == 8 and i % nk == 4:
            t = [int(_SBOX[b]) for b in t]
        words.append([a ^ b for a, b in zip(words[i - nk], t)])
    return np.array([b for w in words for b in w], dtype=np.uint8)


def _decrypt_blocks(key: bytes, blocks: np.ndarray) -> np.ndarray:
    """Inverse cipher over an (n, 16) uint8 array, vectorized across n."""
    rk = _key_expansion(key)
    rounds = len(rk) // 16 - 1
    st = blocks ^ rk[rounds * 16 :]
    for rnd in range(rounds - 1, 0, -1):
        st = st[:, _INV_SHIFT]
        st = _INV_SBOX[st]
        st = st ^ rk[rnd * 16 : rnd * 16 + 16]
        # InvMixColumns on each 4-byte column
        s = st.reshape(-1, 4, 4)  # (n, col, row)
        a, b, c, d = s[:, :, 0], s[:, :, 1], s[:, :, 2], s[:, :, 3]
        st = np.stack(
            [
                _MUL[14][a] ^ _MUL[11][b] ^ _MUL[13][c] ^ _MUL[9][d],
                _MUL[9][a] ^ _MUL[14][b] ^ _MUL[11][c] ^ _MUL[13][d],
                _MUL[13][a] ^ _MUL[9][b] ^ _MUL[14][c] ^ _MUL[11][d],
                _MUL[11][a] ^ _MUL[13][b] ^ _MUL[9][c] ^ _MUL[14][d],
            ],
            axis=2,
        ).reshape(-1, 16)
    st = st[:, _INV_SHIFT]
    st = _INV_SBOX[st]
    return st ^ rk[:16]


# Forward cipher as classic T-tables over Python ints: the hardened
# AESV3 key-derivation hash (pdf._hash_2b) sequentially encrypts tens
# of thousands of blocks, and numpy ops on 16-byte arrays cost more in
# dispatch than the math — int table lookups are ~40x faster there.
# T_k holds the MixColumns contribution of shifted-row byte k, packed
# big-endian: T0=(2S,S,S,3S), T1=(3S,2S,S,S), T2=(S,3S,2S,S),
# T3=(S,S,3S,2S) — all derived from the generated S-box/GF tables.
def _build_ttables():
    t = []
    for coeffs in ((2, 1, 1, 3), (3, 2, 1, 1), (1, 3, 2, 1), (1, 1, 3, 2)):
        tab = []
        for x in range(256):
            sx = int(_SBOX[x])
            word = 0
            for c in coeffs:
                word = (word << 8) | (sx if c == 1 else int(_MUL[c][sx]))
            tab.append(word)
        t.append(tuple(tab))
    return t


_T0, _T1, _T2, _T3 = _build_ttables()
_SBOX_I = tuple(int(b) for b in _SBOX)


def _rk_words(rk: np.ndarray) -> tuple[tuple[int, ...], int]:
    rkb = rk.tobytes()
    words = tuple(
        int.from_bytes(rkb[i : i + 4], "big") for i in range(0, len(rkb), 4)
    )
    return words, len(rk) // 16 - 1


def _encrypt_block_int(
    rkw: tuple[int, ...], rounds: int, b: bytes
) -> bytes:
    c0 = int.from_bytes(b[0:4], "big") ^ rkw[0]
    c1 = int.from_bytes(b[4:8], "big") ^ rkw[1]
    c2 = int.from_bytes(b[8:12], "big") ^ rkw[2]
    c3 = int.from_bytes(b[12:16], "big") ^ rkw[3]
    k = 4
    for _ in range(rounds - 1):
        n0 = (_T0[c0 >> 24] ^ _T1[(c1 >> 16) & 0xFF] ^ _T2[(c2 >> 8) & 0xFF]
              ^ _T3[c3 & 0xFF] ^ rkw[k])
        n1 = (_T0[c1 >> 24] ^ _T1[(c2 >> 16) & 0xFF] ^ _T2[(c3 >> 8) & 0xFF]
              ^ _T3[c0 & 0xFF] ^ rkw[k + 1])
        n2 = (_T0[c2 >> 24] ^ _T1[(c3 >> 16) & 0xFF] ^ _T2[(c0 >> 8) & 0xFF]
              ^ _T3[c1 & 0xFF] ^ rkw[k + 2])
        n3 = (_T0[c3 >> 24] ^ _T1[(c0 >> 16) & 0xFF] ^ _T2[(c1 >> 8) & 0xFF]
              ^ _T3[c2 & 0xFF] ^ rkw[k + 3])
        c0, c1, c2, c3 = n0, n1, n2, n3
        k += 4
    s = _SBOX_I
    o0 = ((s[c0 >> 24] << 24) | (s[(c1 >> 16) & 0xFF] << 16)
          | (s[(c2 >> 8) & 0xFF] << 8) | s[c3 & 0xFF]) ^ rkw[k]
    o1 = ((s[c1 >> 24] << 24) | (s[(c2 >> 16) & 0xFF] << 16)
          | (s[(c3 >> 8) & 0xFF] << 8) | s[c0 & 0xFF]) ^ rkw[k + 1]
    o2 = ((s[c2 >> 24] << 24) | (s[(c3 >> 16) & 0xFF] << 16)
          | (s[(c0 >> 8) & 0xFF] << 8) | s[c1 & 0xFF]) ^ rkw[k + 2]
    o3 = ((s[c3 >> 24] << 24) | (s[(c0 >> 16) & 0xFF] << 16)
          | (s[(c1 >> 8) & 0xFF] << 8) | s[c2 & 0xFF]) ^ rkw[k + 3]
    return (
        o0.to_bytes(4, "big") + o1.to_bytes(4, "big")
        + o2.to_bytes(4, "big") + o3.to_bytes(4, "big")
    )


def aes_encrypt_block(key: bytes, block: bytes) -> bytes:
    """Single-block ECB encrypt (FIPS-197 forward cipher) — the
    known-answer-vector surface and the CBC encryptor's core."""
    rkw, rounds = _rk_words(_key_expansion(key))
    return _encrypt_block_int(rkw, rounds, bytes(block))


def aes_decrypt_block(key: bytes, block: bytes) -> bytes:
    return bytes(
        _decrypt_blocks(key, np.frombuffer(block, dtype=np.uint8)[None, :])[0]
    )


def cbc_decrypt(key: bytes, data: bytes, unpad: bool = True) -> bytes:
    """AES-CBC decrypt where ``data`` is IV || ciphertext (the PDF
    AESV2/AESV3 stream layout). Vectorized across blocks. ``unpad``
    strips and VALIDATES PKCS#7 padding (raises on malformed padding —
    the wrong-key signal)."""
    if len(data) < 32 or len(data) % 16:
        raise ValueError(f"AES-CBC data must be IV + k*16 bytes, got {len(data)}")
    arr = np.frombuffer(data, dtype=np.uint8).reshape(-1, 16)
    plain = _decrypt_blocks(key, arr[1:]) ^ arr[:-1]
    out = plain.tobytes()
    if not unpad:
        return out
    pad = out[-1]
    if not 1 <= pad <= 16 or out[-pad:] != bytes([pad]) * pad:
        raise ValueError("AES-CBC padding invalid (wrong key or corrupt data)")
    return out[:-pad]


def cbc_encrypt(key: bytes, iv: bytes, data: bytes, pad: bool = True) -> bytes:
    """AES-CBC encrypt returning IV || ciphertext; PKCS#7 pads by
    default (``pad=False`` requires block-aligned input — the AESV3
    /UE//OE layout). Sequential by nature: fixture-writer side only."""
    if pad:
        n = 16 - len(data) % 16
        data = data + bytes([n]) * n
    elif len(data) % 16:
        raise ValueError("pad=False needs block-aligned input")
    rkw, rounds = _rk_words(_key_expansion(key))
    prev = bytes(iv)
    out = bytearray(iv)
    for i in range(0, len(data), 16):
        blk = bytes(a ^ b for a, b in zip(data[i : i + 16], prev))
        prev = _encrypt_block_int(rkw, rounds, blk)
        out += prev
    return bytes(out)
