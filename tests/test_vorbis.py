"""Ogg Vorbis floor-envelope tier (functions/vorbis.py): canonical
codeword assignment (hypothesis round trips), codebook/setup parsing,
floor1 packet decode incl. the step-2 prediction render, envelope
round trips against the quantizer mirror, amplitude-scale invariance,
the planted-pair truth through audio_fingerprint, honest refusals
(floor 0, setup-less skeletons, hostile codebooks), and the
corruption hammer."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pg2kinesis_spark.functions import vorbis as V


# --- codewords ---------------------------------------------------------------


def _kraft_ok(lengths):
    return sum(2.0 ** -l for l in lengths if l > 0) <= 1.0 + 1e-12


@settings(max_examples=80, deadline=None)
@given(st.lists(st.integers(1, 12), min_size=1, max_size=40))
def test_codeword_assignment_round_trips(lens):
    """Any Kraft-satisfiable length list yields a prefix-free code
    where every entry decodes back from its own codeword."""
    if not _kraft_ok(lens):
        lens = sorted(lens)
        while lens and not _kraft_ok(lens):
            lens.pop()
        if not lens:
            return
    table = V._codewords(list(lens))
    assert len(table) == len(lens)
    # prefix-freeness: no codeword is a prefix of another
    codes = sorted(((l, c) for (l, c) in table), key=lambda t: t[0])
    for i, (l1, c1) in enumerate(codes):
        for l2, c2 in codes[i + 1 :]:
            assert not (l2 > l1 and (c2 >> (l2 - l1)) == c1)
    # bit-level decode round trip for every entry
    for (l, c), entry in table.items():
        bits = [(c >> (l - 1 - i)) & 1 for i in range(l)]
        w = V._VBitWriter()
        for b in bits:
            w.put(b, 1)
        assert V._huff_decode(V._VBits(w.done()), table) == entry


def test_overspecified_codebook_refuses():
    with pytest.raises(ValueError, match="overspecified"):
        V._codewords([1, 1, 1])


# --- envelope round trips ----------------------------------------------------


def test_envelope_round_trip_and_mirror():
    rng = np.random.default_rng(4)
    env = 2.0 ** rng.uniform(-20, -2, size=60)
    got = V.vorbis_floor_envelope(V.encode_ogg_vorbis_envelope(env))
    assert np.array_equal(got, V.vorbis_quantize_envelope(env))
    assert np.allclose(got, env, rtol=0.04)  # half a 0.547 dB step
    # zero energy = silent channel (nonzero flag clear) = exact 0
    z = V.vorbis_floor_envelope(
        V.encode_ogg_vorbis_envelope([0.25, 0.0, 0.5])
    )
    assert z[1] == 0.0 and z[0] > 0


def test_amplitude_scale_invariance():
    """-6.02 dB is -11.01 floor steps: every packet shifts by the same
    11 quantizer notches, so the ratio is uniform to float precision."""
    rng = np.random.default_rng(9)
    env = 2.0 ** rng.uniform(-20, -2, size=50)
    a = V.vorbis_floor_envelope(V.encode_ogg_vorbis_envelope(env))
    b = V.vorbis_floor_envelope(V.encode_ogg_vorbis_envelope(env * 0.5))
    r = b / a
    assert r.max() / r.min() < 1.0 + 1e-9
    assert abs(r[0] - 0.5) < 0.01


def test_floor1_prediction_render():
    """The step-2 render: a nonzero middle value folds around the
    prediction with the room rule; zero rides the prediction."""
    f = V._Floor1()
    f.partition_classes = [0]
    f.class_dims = [2]
    f.class_subclasses = [0]
    f.masterbooks = [-1]
    f.subclass_books = [[0]]
    f.multiplier = 1
    f.x_list = [0, 256, 64, 128]
    books = [(1, V._codewords([8] * 256))]  # (dims, table)
    w = V._VBitWriter()
    w.put(1, 1)  # nonzero
    w.put(100, 8)  # y0
    w.put(200, 8)  # y1 → prediction at x=64 is 125
    # codeword for entry 4 (even → predicted + 2 = 127), then entry 0:
    # x=128 then predicts from the DECODED x=64 point (127) and the
    # x=256 endpoint: 127 + (73*64)//192 = 151
    for bit_i in range(8):
        w.put((4 >> (7 - bit_i)) & 1, 1)
    w.put(0, 8)
    final = V._floor1_decode(V._VBits(w.done()), f, books)
    assert final == [100, 200, 127, 151]


# --- refusals + hostile inputs ----------------------------------------------


def test_refusals():
    from pg2kinesis_spark.functions import codecs as C

    # header-only skeleton (no setup header) refuses
    skel = C.encode_ogg_pages(codec="vorbis", rate=22050, channels=1,
                              n_samples=4410)
    with pytest.raises((NotImplementedError, ValueError)):
        V.vorbis_floor_envelope(skel)
    # non-Vorbis Ogg refuses
    from pg2kinesis_spark.functions import opus as O

    with pytest.raises(NotImplementedError, match="Vorbis"):
        V.vorbis_floor_envelope(
            O.encode_ogg_opus_envelope([4.0], mode="silk")
        )
    # truncated stream
    good = V.encode_ogg_vorbis_envelope([0.25, 0.5])
    with pytest.raises(ValueError):
        V.vorbis_floor_envelope(good[: len(good) // 2])


def test_fuzz_vorbis_floor_walk():
    from tests.test_codec_fuzz import _hammer

    rng = np.random.default_rng(5)
    corpus = [
        V.encode_ogg_vorbis_envelope(2.0 ** rng.uniform(-20, -2, size=40)),
        V.encode_ogg_vorbis_envelope([0.25, 0.0, 0.5], rate=48000),
    ]
    _hammer(V.vorbis_floor_envelope, corpus, seed=13)


# --- fingerprint integration -------------------------------------------------


def test_vorbis_fingerprint_planted_pairs(spark):
    """A half-volume copy and a jittered re-encode pair with the
    original through audio_fingerprint + media_near_dup_pairs; an
    unrelated track separates; the three Ogg tiers (Vorbis floor,
    Opus SILK) coexist in one batch."""
    from pg2kinesis_spark.functions import opus as O
    from pg2kinesis_spark.functions.multimodal import (
        MEDIA_SCHEMA,
        audio_fingerprint,
        media_near_dup_pairs,
    )

    rng = np.random.default_rng(11)
    env = 2.0 ** rng.uniform(-20, -2, size=80)
    other = 2.0 ** rng.uniform(-20, -2, size=80)
    jitter = env * rng.uniform(0.93, 1.07, size=80)
    blobs = [
        V.encode_ogg_vorbis_envelope(env),          # 0
        V.encode_ogg_vorbis_envelope(env * 0.5),    # 1 half volume
        V.encode_ogg_vorbis_envelope(jitter),       # 2 re-encode
        V.encode_ogg_vorbis_envelope(other),        # 3 different
        O.encode_ogg_opus_envelope(                 # 4 opus, same scale
            2.0 ** rng.uniform(3, 11, size=80), mode="silk"
        ),
    ]
    rows = [
        (i, bytearray(b), ("audio/ogg", len(b), f"mem://{i}.ogg"))
        for i, b in enumerate(blobs)
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    fps = {r["media_id"]: r for r in audio_fingerprint(media).collect()}
    assert all(fps[i]["afp"] is not None for i in range(5))
    mask = (1 << 64) - 1

    def ham(a, b):
        return bin((fps[a]["afp"] ^ fps[b]["afp"]) & mask).count("1")

    assert ham(0, 1) == 0  # exact: every sample shifts 11 notches
    assert ham(0, 2) <= 4
    assert ham(0, 3) > 8
    pairs = media_near_dup_pairs(media, max_hamming=4, signature="audio")
    got = {(r["media_id1"], r["media_id2"]) for r in pairs.collect()}
    assert (0, 1) in got and (0, 2) in got
    assert not any(3 in p for p in got)


def test_floor0_amplitude_envelope():
    """Floor-0 (LSP) streams decode their leading amplitude field as
    the envelope; the LSP coefficients are consumed through the book's
    dims to keep the cursor honest; amplitude 0 = unused floor = 0."""
    env = np.array([0.1, 0.5, 0.0, 0.9])
    got = V.vorbis_floor_envelope(
        V.encode_ogg_vorbis_envelope(env, floor_type=0)
    )
    assert np.array_equal(got, V.vorbis_quantize_envelope(env, floor_type=0))
    assert got[2] == 0.0
    assert np.allclose(got[[0, 1, 3]], env[[0, 1, 3]], atol=1 / 255.0)


def test_multiplexed_ogg_selects_the_audio_stream():
    """A Theora+Vorbis-style mux (video BOS first, interleaved data
    pages): ogg_packets follows the audio BOS serial, so the floor
    walk sees exactly the Vorbis stream's packets."""
    import struct

    from pg2kinesis_spark.functions import codecs as C
    from pg2kinesis_spark.functions import opus as O

    rng = np.random.default_rng(2)
    env = 2.0 ** rng.uniform(-18, -3, size=12)
    vogg = V.encode_ogg_vorbis_envelope(env, serial=9)

    def page(serial, seq, payload, header_type=0):
        segs, rest = [], len(payload)
        while rest >= 255:
            segs.append(255)
            rest -= 255
        segs.append(rest)
        hdr = (
            b"OggS" + bytes([0, header_type]) + struct.pack("<q", 0)
            + struct.pack("<II", serial, seq) + bytes(4)
            + bytes([len(segs)]) + bytes(segs)
        )
        raw = bytearray(hdr + payload)
        raw[22:26] = struct.pack("<I", C._ogg_page_crc(bytes(raw)))
        return bytes(raw)

    vpages = []
    pos = 0
    while pos + 27 <= len(vogg):
        nsegs = vogg[pos + 26]
        body = pos + 27 + nsegs
        size = sum(vogg[pos + 27 : pos + 27 + nsegs])
        vpages.append(vogg[pos : body + size])
        pos = body + size
    theora_bos = page(5, 0, b"\x80theora-fake-header", header_type=2)
    tdata = [page(5, i + 1, b"\x00video-frame" * 3) for i in range(4)]
    mux = theora_bos + vpages[0] + tdata[0] + vpages[1] + vpages[2]
    for i, vp in enumerate(vpages[3:]):
        mux += vp + tdata[(i + 1) % 4]
    got = V.vorbis_floor_envelope(mux)
    assert np.array_equal(got, V.vorbis_quantize_envelope(env))
    # explicit serial selection returns the OTHER stream's packets
    other = O.ogg_packets(mux, serial=5)
    assert other and other[0].startswith(b"\x80theora")


# --- WebM-contained Vorbis ----------------------------------------------------


def test_webm_vorbis_matches_ogg_remux():
    """An Ogg Vorbis stream and its WebM remux (headers Xiph-laced in
    CodecPrivate, packets in Cluster SimpleBlocks) decode to IDENTICAL
    envelopes — for both floor types."""
    rng = np.random.default_rng(7)
    env = 2.0 ** rng.uniform(-18, -3, size=30)
    for ft in (1, 0):
        e = env if ft == 1 else np.clip(env * 8, 0, 1)
        a = V.vorbis_floor_envelope(
            V.encode_ogg_vorbis_envelope(e, floor_type=ft)
        )
        b = V.webm_vorbis_floor_envelope(
            V.encode_webm_vorbis_envelope(e, floor_type=ft)
        )
        assert np.array_equal(a, b), ft


def test_webm_vorbis_fingerprint_identity(spark):
    from pg2kinesis_spark.functions.multimodal import (
        MEDIA_SCHEMA,
        audio_fingerprint,
    )

    rng = np.random.default_rng(15)
    env = 2.0 ** rng.uniform(-18, -3, size=80)
    ogg = V.encode_ogg_vorbis_envelope(env)
    webm = V.encode_webm_vorbis_envelope(env)
    rows = [
        (0, bytearray(ogg), ("audio/ogg", len(ogg), "mem://0.ogg")),
        (1, bytearray(webm), ("audio/webm", len(webm), "mem://1.webm")),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    fps = {r["media_id"]: r["afp"] for r in audio_fingerprint(media).collect()}
    assert fps[0] == fps[1] and fps[0] is not None


def test_webm_vorbis_refusals_and_lacing():
    from pg2kinesis_spark.functions import codecs as C

    webm = bytearray(V.encode_webm_vorbis_envelope([0.25, 0.5]))
    at = webm.index(b"A_VORBIS")
    webm[at : at + 8] = b"A_SPEEXX"
    with pytest.raises(NotImplementedError, match="A_VORBIS"):
        V.webm_vorbis_floor_envelope(bytes(webm))
    # xiph lacing splitter: 255-continued sizes and bounds
    assert C.xiph_lacing_split(bytes([2, 1, 2]) + b"a" + b"bc" + b"rest") == [
        b"a", b"bc", b"rest"
    ]
    big = bytes([2, 255, 0, 1]) + b"x" * 255 + b"y" + b"z"
    assert C.xiph_lacing_split(big) == [b"x" * 255, b"y", b"z"]
    with pytest.raises(ValueError, match="lacing"):
        C.xiph_lacing_split(bytes([2, 255]))


def test_fuzz_webm_vorbis_walk():
    from tests.test_codec_fuzz import _hammer

    rng = np.random.default_rng(3)
    corpus = [
        V.encode_webm_vorbis_envelope(2.0 ** rng.uniform(-18, -3, size=20)),
    ]
    _hammer(V.webm_vorbis_floor_envelope, corpus, seed=31)
