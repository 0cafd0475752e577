"""Dependency-free AES (functions/aes.py): FIPS-197 known-answer
vectors (the tables are GENERATED from GF(2^8) math — these vectors
pin the generation), CBC round trips, and padding validation."""

from __future__ import annotations

import random

import pytest

from pg2kinesis_spark.functions.aes import (
    aes_decrypt_block,
    aes_encrypt_block,
    cbc_decrypt,
    cbc_encrypt,
)

PT = bytes.fromhex("00112233445566778899aabbccddeeff")


def test_fips197_known_answer_vectors():
    k128 = bytes.fromhex("000102030405060708090a0b0c0d0e0f")
    assert aes_encrypt_block(k128, PT).hex() == "69c4e0d86a7b0430d8cdb78070b4c55a"
    k192 = bytes(range(24))
    assert aes_encrypt_block(k192, PT).hex() == "dda97ca4864cdfe06eaf70a0ec0d7191"
    k256 = bytes(range(32))
    assert aes_encrypt_block(k256, PT).hex() == "8ea2b7ca516745bfeafc49904b496089"
    for k in (k128, k192, k256):
        assert aes_decrypt_block(k, aes_encrypt_block(k, PT)) == PT


def test_cbc_round_trips_and_padding():
    rng = random.Random(9)
    for n in (0, 1, 15, 16, 17, 333, 4096):
        data = bytes(rng.randrange(256) for _ in range(n))
        key = bytes(rng.randrange(256) for _ in range(32 if n % 2 else 16))
        iv = bytes(rng.randrange(256) for _ in range(16))
        blob = cbc_encrypt(key, iv, data)
        assert blob[:16] == iv and len(blob) % 16 == 0
        assert cbc_decrypt(key, blob) == data
    # block-aligned no-pad mode (the AESV3 /UE layout)
    k = bytes(range(16))
    d32 = bytes(range(32))
    assert cbc_decrypt(k, cbc_encrypt(k, bytes(16), d32, pad=False), unpad=False) == d32
    with pytest.raises(ValueError, match="block-aligned"):
        cbc_encrypt(k, bytes(16), b"short", pad=False)
    with pytest.raises(ValueError, match="IV"):
        cbc_decrypt(k, b"too short")


def test_cbc_wrong_key_raises_padding_error():
    k1, k2 = bytes(range(16)), bytes(range(1, 17))
    # deterministic case where the wrong key's final byte is not valid
    # padding (seeded so the 1/256 false-accept doesn't flake)
    for seed in range(10):
        data = bytes([seed]) * 20
        blob = cbc_encrypt(k1, bytes(16), data)
        try:
            out = cbc_decrypt(k2, blob)
        except ValueError:
            return  # at least one wrong-key decrypt must fail loudly
        assert out != data  # false-accept still never returns the truth
    raise AssertionError("no wrong-key decrypt raised across 10 seeds")
