"""FLAC frame decode: bit-exact lossless round trips across the whole
subframe matrix, a hand-packed spec-form decode oracle (independent of
the encoder), the MD5 self-check contract, and the WAV↔FLAC
fingerprint-identity property (lossless means the SAME track
fingerprints IDENTICALLY in both containers, not merely nearby).

Spec: RFC 9639 (also the xiph FLAC format document). The encoder
(`encode_flac`) and decoder (`decode_flac`) were written from the spec
independently of each other — they share only the generated CRC tables
— so a round trip pins both sides.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pytest

from pg2kinesis_spark.functions import codecs as C
from pg2kinesis_spark.functions.codecs import decode_flac, encode_flac, flac_info


def _track(n=9000, seed=3, nch=2, amp=3000):
    rng = np.random.RandomState(seed)
    t = np.arange(n)
    base = amp * np.sin(2 * np.pi * 440 * t / 44100) + rng.randint(-amp // 8, amp // 8, n)
    cols = [np.roll(base, 13 * c) * (1.0 - 0.2 * c) for c in range(nch)]
    return np.stack(cols, axis=1).astype(np.int64)


# --- round-trip matrix ------------------------------------------------------


@pytest.mark.parametrize("subframe", ["verbatim", "fixed0", "fixed1", "fixed2", "lpc", "auto"])
def test_roundtrip_subframe_types(subframe):
    pcm = _track()
    enc = encode_flac(pcm, 44100, subframe=subframe)
    dec, rate = decode_flac(enc)
    assert rate == 44100
    assert (dec == pcm).all()


@pytest.mark.parametrize("stereo", ["independent", "mid", "left", "right"])
def test_roundtrip_stereo_decorrelation(stereo):
    pcm = _track()
    dec, _ = decode_flac(encode_flac(pcm, 44100, stereo=stereo))
    assert (dec == pcm).all()


@pytest.mark.parametrize("po", [0, 1, 2])
def test_roundtrip_rice_partitions(po):
    pcm = _track(n=4096 * 2 + 501)  # short tail frame forces the po fallback
    dec, _ = decode_flac(encode_flac(pcm, 44100, partition_order=po))
    assert (dec == pcm).all()
    # tail block of EXACTLY the predictor order: the first partition
    # legally holds zero residual samples (po fallback edge)
    edge = _track(n=4096 + 2)
    dec, _ = decode_flac(encode_flac(edge, 44100, subframe="fixed2",
                                     partition_order=po))
    assert (dec == edge).all()


def test_roundtrip_escape_partitions():
    pcm = _track()
    enc = encode_flac(pcm, 44100, subframe="fixed2", escape=True)
    dec, _ = decode_flac(enc)
    assert (dec == pcm).all()


@pytest.mark.parametrize("bits,amp", [(8, 100), (16, 3000), (24, 700000), (32, 200000000)])
def test_roundtrip_bit_depths(bits, amp):
    pcm = _track(n=3000, amp=amp)
    dec, _ = decode_flac(encode_flac(pcm, 48000, bits=bits))
    assert (dec == pcm).all()


def test_roundtrip_constant_and_wasted_bits():
    # constant channels and deliberately shifted samples (wasted bits)
    pcm = np.full((2500, 2), -1234, dtype=np.int64)
    dec, _ = decode_flac(encode_flac(pcm, 44100, subframe="constant"))
    assert (dec == pcm).all()
    shifted = _track(n=2500, amp=1500) * 16  # every sample has 4 low zero bits
    enc = encode_flac(shifted, 44100)
    dec, _ = decode_flac(enc)
    assert (dec == shifted).all()


def test_roundtrip_mono_and_multichannel():
    mono = _track(nch=1)[:, 0]  # 1-D input
    dec, _ = decode_flac(encode_flac(mono, 22050))
    assert (dec[:, 0] == mono).all()
    five = _track(nch=5, n=2000)
    dec, _ = decode_flac(encode_flac(five, 44100))
    assert (dec == five).all()


def test_streaminfo_agrees_with_decode():
    pcm = _track(n=7777)
    enc = encode_flac(pcm, 32000)
    info = flac_info(enc)
    dec, rate = decode_flac(enc)
    assert (info["sample_rate"], info["n_channels"], info["bits"]) == (32000, 2, 16)
    assert info["n_samples"] == dec.shape[0] == 7777
    assert rate == 32000


# --- spec-form decode oracle (hand-packed, encoder NOT involved) ------------


def _crc8_bitwise(data: bytes) -> int:
    """Independent bit-at-a-time CRC-8 poly 0x07 (no shared tables)."""
    r = 0
    for b in data:
        r ^= b
        for _ in range(8):
            r = ((r << 1) ^ 0x07) & 0xFF if r & 0x80 else (r << 1) & 0xFF
    return r


def _crc16_bitwise(data: bytes) -> int:
    r = 0
    for b in data:
        r ^= b << 8
        for _ in range(8):
            r = ((r << 1) ^ 0x8005) & 0xFFFF if r & 0x8000 else (r << 1) & 0xFFFF
    return r


def _hand_flac_constant(value: int, block: int = 192, rate: int = 44100) -> bytes:
    """A one-frame mono 16-bit FLAC packed field by field from RFC 9639
    §9.1/§9.2.2: bs_code 1 (=192), rate from STREAMINFO, constant
    subframe. MD5 left zero (unset) so only structure is checked."""
    si = struct.pack(">HH", block, block) + bytes(6)
    si += (((rate << 44) | (0 << 41) | (15 << 36) | block)).to_bytes(8, "big")
    si += bytes(16)
    out = bytearray(b"fLaC\x80" + len(si).to_bytes(3, "big") + si)
    # header: sync(14)=0x3FFE, resv 0, fixed-block 0, bs=1, sr=0, ch=0,
    # bits=4 (16), resv 0 -> 4 bytes; frame number 0 -> 1 byte
    hdr = bytes([0xFF, 0xF8, 0b0001_0000, 0b0000_100_0, 0x00])
    hdr += bytes([_crc8_bitwise(hdr)])
    # constant subframe: pad 0, type 000000, wasted-flag 0 -> byte 0x00,
    # then the 16-bit constant; frame is byte-aligned already
    body = hdr + bytes([0x00]) + struct.pack(">h", value)
    out += body + struct.pack(">H", _crc16_bitwise(body))
    return bytes(out)


def test_hand_packed_constant_frame_decodes():
    enc = _hand_flac_constant(-777)
    dec, rate = decode_flac(enc)
    assert rate == 44100
    assert dec.shape == (192, 1)
    assert (dec == -777).all()


def test_hand_packed_corrupt_refuses():
    enc = bytearray(_hand_flac_constant(5))
    enc[-4] ^= 0x01  # the constant's high byte: frame CRC-16 now wrong
    with pytest.raises(ValueError, match="CRC-16"):
        decode_flac(bytes(enc))
    enc = bytearray(_hand_flac_constant(5))
    si_end = 4 + 4 + 34
    enc[si_end + 4] ^= 0x01  # frame-number byte: header CRC-8 now wrong
    with pytest.raises(ValueError, match="CRC-8"):
        decode_flac(bytes(enc))


# --- the MD5 self-check contract --------------------------------------------


def test_md5_self_check_catches_wrong_pcm():
    """Flip a sample AND repair both CRCs: the only guard left is the
    STREAMINFO MD5 — the decode must still refuse (a wrong decode can
    never return quietly)."""
    pcm = _track(n=4096, seed=11)
    enc = bytearray(encode_flac(pcm, 44100, subframe="verbatim"))
    frame_start = 4 + 4 + 34
    # verbatim 16-bit: flip one sample byte inside the first subframe
    enc[frame_start + 10] ^= 0x40
    body = bytes(enc[frame_start:-2])
    # repair the frame CRC-16 (header CRC-8 spans only the header and
    # is untouched by a subframe flip)
    enc[-2:] = struct.pack(">H", _crc16_bitwise(body))
    with pytest.raises(ValueError, match="MD5"):
        decode_flac(bytes(enc))
    dec, _ = decode_flac(bytes(enc), verify_md5=False)  # opt-out decodes
    assert dec.shape == pcm.shape and not (dec == pcm).all()


def test_md5_digest_matches_hashlib_of_input():
    pcm = _track(n=3000)
    enc = encode_flac(pcm, 44100)
    want = hashlib.md5(pcm.astype("<i2").tobytes()).digest()
    assert bytes(enc[8 + 18 : 8 + 34]) == want


# --- refusal contract --------------------------------------------------------


def test_truncated_stream_refuses():
    enc = encode_flac(_track(), 44100)
    with pytest.raises(ValueError):
        decode_flac(enc[: len(enc) // 2])
    with pytest.raises(ValueError):
        decode_flac(b"fLaC")
    with pytest.raises(ValueError, match="magic"):
        decode_flac(b"not a flac at all")


def test_streaminfo_only_refuses_no_frames():
    with pytest.raises(ValueError, match="no audio frames"):
        decode_flac(C.encode_flac_streaminfo(n_samples=0))


# --- Spark integration: features + fingerprint identity ----------------------


def test_flac_audio_features_match_wav(spark):
    from pg2kinesis_spark.functions.multimodal import (
        MEDIA_SCHEMA,
        extract_audio_features,
    )

    pcm16 = _track(n=20000).astype(np.int16)
    wav = C.encode_wav(pcm16, 44100)
    flac = encode_flac(pcm16.astype(np.int64), 44100)
    rows = [
        (0, bytearray(wav), ("audio/wav", len(wav), "mem://w")),
        (1, bytearray(flac), ("audio/flac", len(flac), "mem://f")),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r.media_id: r for r in extract_audio_features(media).collect()}
    for mid in (0, 1):
        assert got[mid].decode_error is None
        assert got[mid].sample_rate == 44100
        assert got[mid].n_channels == 2
        assert got[mid].n_samples == 20000
    # lossless: the RMS is not merely close, it is the same number
    assert got[0].rms == got[1].rms


def test_flac_wav_fingerprint_identity_and_pairing(spark):
    """The same track as WAV and FLAC must fingerprint IDENTICALLY
    (hamming 0) and pair in media_near_dup_pairs(signature='audio');
    an independent track separates."""
    from pg2kinesis_spark.functions.multimodal import (
        MEDIA_SCHEMA,
        audio_fingerprint,
        media_near_dup_pairs,
    )

    pcm = _track(n=44100, seed=5).astype(np.int16)  # 1 s stereo
    other = _track(n=44100, seed=99, amp=2500).astype(np.int16)
    rows = [
        (0, bytearray(C.encode_wav(pcm, 44100)), ("audio/wav", 0, "mem://w")),
        (1, bytearray(encode_flac(pcm.astype(np.int64), 44100)), ("audio/flac", 0, "mem://f")),
        (2, bytearray(encode_flac(other.astype(np.int64), 44100)), ("audio/flac", 0, "mem://o")),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    fps = {r.media_id: r.afp for r in audio_fingerprint(media).collect()}
    assert fps[0] is not None and fps[0] == fps[1]  # losslessness, end to end
    assert fps[0] != fps[2]
    got = {
        tuple(sorted((p.media_id1, p.media_id2)))
        for p in media_near_dup_pairs(media, max_hamming=0, signature="audio").collect()
    }
    assert (0, 1) in got
    assert (0, 2) not in got and (1, 2) not in got


def test_property_roundtrip_hypothesis():
    """Property-based: ANY int PCM within range survives encode->decode
    bit-exactly across randomized subframe/stereo/partition/escape
    choices (hypothesis drives the corners the matrix misses: tiny
    tracks, constant runs, extreme amplitudes, odd block tails)."""
    from hypothesis import given, settings, strategies as st

    bits_amp = {8: 127, 16: 32767}

    @settings(max_examples=60, deadline=None)
    @given(
        data=st.data(),
        n=st.integers(min_value=1, max_value=700),
        nch=st.integers(min_value=1, max_value=3),
        bits=st.sampled_from([8, 16]),
        subframe=st.sampled_from(["auto", "verbatim", "fixed0", "fixed1",
                                  "fixed2", "lpc"]),
        po=st.integers(min_value=0, max_value=2),
        escape=st.booleans(),
        block=st.sampled_from([192, 256, 577]),
    )
    def run(data, n, nch, bits, subframe, po, escape, block):
        amp = bits_amp[bits]
        kind = data.draw(st.sampled_from(["random", "constant", "ramp"]))
        if kind == "constant":
            v = data.draw(st.integers(min_value=-amp, max_value=amp))
            pcm = np.full((n, nch), v, dtype=np.int64)
        elif kind == "ramp":
            pcm = (np.arange(n * nch).reshape(n, nch) % (2 * amp)) - amp
        else:
            seed = data.draw(st.integers(min_value=0, max_value=2**31 - 1))
            pcm = np.random.RandomState(seed).randint(
                -amp, amp + 1, (n, nch)
            ).astype(np.int64)
        stereo = "independent"
        if nch == 2:
            stereo = data.draw(
                st.sampled_from(["independent", "mid", "left", "right"])
            )
        if subframe == "constant" and kind != "constant":
            subframe_eff = "auto"
        else:
            subframe_eff = subframe
        enc = encode_flac(pcm, 44100, bits=bits, subframe=subframe_eff,
                          stereo=stereo, partition_order=po,
                          block_size=block, escape=escape)
        dec, rate = decode_flac(enc)
        assert rate == 44100
        assert dec.shape == pcm.shape
        assert (dec == pcm).all()

    run()


def test_hostile_cells_bound_fires_before_allocation():
    """Review finding (round 7): the hostile bound prices CELLS
    (samples x channels), so a tiny crafted 8-channel file trips the
    cap per frame instead of accumulating gigabytes of decoded data.
    A legal long mono track under the cap still decodes."""
    import pg2kinesis_spark.functions.codecs as C_

    # 8-channel constant frames at block 4096: each frame adds 32768
    # cells for ~30 bytes of input; the cap must fire LONG before the
    # frame count exhausts the input
    n_frames = 800  # 800 * 4096 * 8 = 26M cells if allowed to run
    pcm = np.zeros((4096, 8), dtype=np.int64)
    one = encode_flac(pcm, 44100, subframe="constant")
    head = one[: 4 + 4 + 34]
    frame = one[4 + 4 + 34 :]
    # STREAMINFO with unknown total samples (0) and zero MD5 so the
    # walk can't stop early or self-check
    si = bytearray(head)
    packed = (44100 << 44) | (7 << 41) | (15 << 36) | 0
    si[8 + 10 : 8 + 18] = packed.to_bytes(8, "big")
    si[8 + 18 : 8 + 34] = bytes(16)
    blob = bytes(si) + frame * n_frames
    old = C_._FLAC_MAX_CELLS
    C_._FLAC_MAX_CELLS = 1_000_000
    try:
        with pytest.raises(ValueError, match="cells bound"):
            decode_flac(blob)
    finally:
        C_._FLAC_MAX_CELLS = old


# --- Ogg-encapsulated FLAC (round 9) ------------------------------------------


def test_ogg_flac_native_reassembly_and_identity(spark):
    """The FLAC-to-Ogg mapping is a pure re-framing: the native stream
    reassembles BYTE-EXACT, so decode (with its STREAMINFO-MD5
    self-check), pcm_md5 lossless identity, the audio fingerprint, and
    ogg_info all cover .oga files; a WAV, a FLAC, and the Ogg-FLAC of
    one track are ONE identity class."""
    import numpy as np

    from pg2kinesis_spark.functions import codecs as C
    from pg2kinesis_spark.functions.multimodal import (
        MEDIA_SCHEMA,
        audio_fingerprint,
        extract_audio_pcm,
    )

    rng = np.random.default_rng(8)
    t = np.arange(12000) / 11.0
    pcm = (
        (np.sin(t) * (4000 + 3000 * np.sin(t / 40)) + rng.normal(0, 30, len(t)))
        .astype(np.int16)
        .reshape(-1, 2)
    )
    native = C.encode_flac(pcm, rate=16000, tags={"title": "Oga"})
    oga = C.encode_ogg_flac(native)
    assert C.ogg_flac_native(oga) == native  # byte-exact
    info = C.ogg_info(oga)
    assert (info["codec"], info["sample_rate"], info["n_channels"]) == (
        "flac", 16000, 2,
    )
    assert info["duration_ms"] == 1000.0 * 6000 / 16000
    wav = C.encode_wav(pcm, 16000)
    rows = [
        (0, bytearray(wav), ("audio/wav", len(wav), "m://a.wav")),
        (1, bytearray(native), ("audio/flac", len(native), "m://a.flac")),
        (2, bytearray(oga), ("audio/ogg", len(oga), "m://a.oga")),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    md5s = {r["media_id"]: r["pcm_md5"] for r in extract_audio_pcm(media).collect()}
    assert md5s[0] == md5s[1] == md5s[2] and md5s[0]
    fps = {r["media_id"]: r["afp"] for r in audio_fingerprint(media).collect()}
    assert fps[0] == fps[1] == fps[2] and fps[0] is not None


def test_ogg_flac_refusals():
    import numpy as np

    from pg2kinesis_spark.functions import codecs as C

    with pytest.raises(ValueError, match="native FLAC"):
        C.encode_ogg_flac(b"not flac")
    with pytest.raises(ValueError, match="Ogg FLAC"):
        C.ogg_flac_native(
            C.encode_ogg_pages(codec="vorbis", rate=22050, channels=1,
                               n_samples=100)
        )
    # corrupt frame bytes: the STREAMINFO-MD5 self-check still fires
    pcm = (np.sin(np.arange(4000) / 7.0) * 5000).astype(np.int16).reshape(-1, 1)
    oga = bytearray(C.encode_ogg_flac(C.encode_flac(pcm, rate=8000)))
    # flip a byte in the LAST page's body (frame data)
    oga[-3] ^= 0x55
    import struct as _s

    # fix that page's CRC so the reassembly sees the corrupt frame
    pos = 0
    pages = []
    while pos + 27 <= len(oga):
        nsegs = oga[pos + 26]
        body = pos + 27 + nsegs
        size = sum(oga[pos + 27 : pos + 27 + nsegs])
        pages.append((pos, body, size))
        pos = body + size
    p0, body, size = pages[-1]
    oga[p0 + 22 : p0 + 26] = bytes(4)
    raw = bytes(oga[p0 : body + size])
    oga[p0 + 22 : p0 + 26] = _s.pack("<I", C._ogg_page_crc(raw))
    with pytest.raises(ValueError):
        C.decode_flac(C.ogg_flac_native(bytes(oga)))
