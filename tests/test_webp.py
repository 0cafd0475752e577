"""VP8L lossless WebP decode (functions/vp8l.py, round 10): lossless
round trips through the real-stream encoder twin across every decode
path (literals, LZ77 runs, color cache, simple + full prefix codes
with 16/17/18 repeats, subtract-green, all 14 predictor modes,
delta-coded palettes at every bundling width), the GENERATED
120-entry near-distance map pinned against known entries, strict
prefix-code validation (over/under-subscription), the WEBP≡PNG dHash
identity (the TIFF precedent), and the corruption hammer. The PIL
equality oracle in tests/test_bmp.py::test_webp_pil_seam_upgrades_
refusal doubles as the external-encoder proof where PIL exists."""

from __future__ import annotations

import numpy as np
import pytest

from pg2kinesis_spark.functions import codecs as C
from pg2kinesis_spark.functions import vp8l as V


def _rgb(seed=3, h=13, w=17):
    return np.random.default_rng(seed).integers(0, 256, (h, w, 3), dtype=np.uint8)


def test_round_trip_plain_and_transforms():
    img = _rgb()
    for kw in (
        {},
        {"subtract_green": True},
        {"cache_bits": 6},
        {"subtract_green": True, "cache_bits": 4},
    ):
        out = V.decode_vp8l(V.encode_vp8l(img, **kw))
        assert out.shape == img.shape and np.array_equal(out, img), kw


def test_round_trip_all_predictor_modes():
    img = _rgb(5, 19, 21)
    for mode in range(14):
        out = V.decode_vp8l(V.encode_vp8l(img, predictor=mode))
        assert np.array_equal(out, img), f"predictor {mode}"
    # predictor composes with subtract-green (reverse-order inverse)
    out = V.decode_vp8l(V.encode_vp8l(img, predictor=11, subtract_green=True))
    assert np.array_equal(out, img)


def test_round_trip_palette_every_bundling_width():
    rng = np.random.default_rng(11)
    for n in (2, 3, 4, 9, 16, 17, 200, 256):
        cols = rng.integers(0, 256, (n, 3), dtype=np.uint8)
        idx = rng.integers(0, n, (11, 23))
        img = cols[idx]
        out = V.decode_vp8l(V.encode_vp8l(img, palette=True))
        assert np.array_equal(out, img), f"palette {n}"


def test_round_trip_alpha_and_gray():
    rng = np.random.default_rng(13)
    rgba = rng.integers(0, 256, (9, 9, 4), dtype=np.uint8)
    out = V.decode_vp8l(V.encode_vp8l(rgba))
    assert out.shape == (9, 9, 4) and np.array_equal(out, rgba)
    # opaque alpha folds to 3 channels
    rgba[:, :, 3] = 255
    out = V.decode_vp8l(V.encode_vp8l(rgba))
    assert out.shape == (9, 9, 3)
    gray = rng.integers(0, 256, (7, 5), dtype=np.uint8)
    out = V.decode_vp8l(V.encode_vp8l(gray))
    assert np.array_equal(out[:, :, 0], gray) and out.shape == (7, 5, 3)


def test_lz77_runs_and_cache_hits():
    flat = np.full((32, 40, 3), 77, dtype=np.uint8)
    flat[5:9, :] = (1, 2, 3)
    blob = V.encode_vp8l(flat)
    assert len(blob) < 60  # runs actually engaged
    assert np.array_equal(V.decode_vp8l(blob), flat)
    # alternating pixels: cache symbols engage (no runs >= 4)
    alt = np.zeros((8, 32, 3), dtype=np.uint8)
    alt[:, 1::2] = (200, 10, 30)
    blob_nc = V.encode_vp8l(alt, use_runs=False)
    blob_cc = V.encode_vp8l(alt, use_runs=False, cache_bits=8)
    assert len(blob_cc) < len(blob_nc)  # cache really fired
    assert np.array_equal(V.decode_vp8l(blob_cc), alt)


def test_distance_map_is_the_spec_neighborhood():
    """The map is GENERATED (sorted neighborhood), not transcribed —
    pin it against known entries and its defining invariants."""
    m = V._DISTANCE_MAP
    assert len(m) == 120 and len(set(m)) == 120
    # the spec's first eight and last two entries
    assert m[:8] == (
        (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    )
    assert m[118] == (8, 6) and m[119] == (8, 7)
    # ordered by distance, every pair in the window
    d2 = [x * x + y * y for x, y in m]
    assert d2 == sorted(d2)
    assert all(0 <= y <= 7 and -7 <= x <= 8 for x, y in m)
    assert all(y > 0 or x >= 1 for x, y in m)
    # plane mapping: code 1 -> one row up (dist = width), >120 direct
    assert V._plane_to_distance(1, 100) == 100
    assert V._plane_to_distance(2, 100) == 1
    assert V._plane_to_distance(121, 100) == 1
    assert V._plane_to_distance(300, 100) == 180


def test_prefix_code_validation_is_strict():
    """Real-world robustness: over- and under-subscribed codes raise
    instead of decoding garbage; the 15-bit walk is bounded."""
    with pytest.raises(ValueError, match="subscribed"):
        V._Prefix([1, 1, 1])  # over
    with pytest.raises(ValueError, match="subscribed"):
        V._Prefix([2, 2, 2])  # under
    with pytest.raises(ValueError, match="no symbols"):
        V._Prefix([0, 0])
    p = V._Prefix([1, 2, 2])
    br = V._Bits(bytes([0b00000110]))  # LSB-first: 0,1,1 -> syms 0,2
    assert p.read(br) == 0
    assert p.read(br) == 2
    # trivial single-symbol code consumes zero bits
    t = V._Prefix([0, 0, 5, 0])
    assert t.read(V._Bits(b"")) == 2


def test_decode_rejects_hostile_structure():
    img = _rgb(17, 6, 6)
    blob = bytearray(V.encode_vp8l(img))
    # bad signature
    with pytest.raises(ValueError, match="signature"):
        V.decode_vp8l(b"\x30" + bytes(blob[1:]))
    # nonzero version bits
    bad = bytearray(blob)
    bad[4] |= 0xE0
    with pytest.raises(ValueError, match="version"):
        V.decode_vp8l(bytes(bad))
    # truncation always raises, never hangs or garbles silently
    for cut in (5, 7, len(blob) // 2):
        with pytest.raises(ValueError):
            V.decode_vp8l(bytes(blob[:cut]))


def test_webp_riff_front_door_and_dhash_identity(spark):
    """The 'Done' bar from VERDICT r10 task 4: lossless WebP joins the
    dHash identity class — a WEBP and the PNG of the same pixels pair
    at hamming 0 through the standard media walk."""
    from pg2kinesis_spark.functions.multimodal import (
        MEDIA_SCHEMA,
        media_dhash,
        sniff_mime,
    )

    img = _rgb(29, 24, 24)
    webp = V.encode_webp_lossless(img, subtract_green=True, cache_bits=5)
    png = C.encode_png(img)
    assert np.array_equal(C.decode_webp(webp), img)
    assert np.array_equal(C.decode_image(webp), img)
    rows = [
        (0, bytearray(webp), ("image/webp", len(webp), "m://a.webp")),
        (1, bytearray(png), ("image/png", len(png), "m://a.png")),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    assert media.select(sniff_mime("content")).first()[0] == "image/webp"
    sigs = {r["media_id"]: r["dhash"] for r in media_dhash(media).collect()}
    assert sigs[0] is not None and sigs[0] == sigs[1]  # hamming 0


def test_lossy_and_animated_keep_refusing():
    with pytest.raises(NotImplementedError, match="VP8"):
        C.decode_webp(C.encode_webp_skeleton(9, 9, lossless=False))
    img = _rgb(31, 8, 8)
    anim = bytearray(V.encode_webp_lossless(img))
    # splice an ANMF chunk so webp_info reports animated
    anmf = b"ANMF" + (16).to_bytes(4, "little") + bytes(16)
    anim = bytes(anim[:12]) + anmf + bytes(anim[12:])
    anim = b"RIFF" + (len(anim) - 8 + len(anmf)).to_bytes(4, "little") + anim[8:]
    with pytest.raises(NotImplementedError, match="animated"):
        C.decode_webp(anim)


def test_fuzz_vp8l_walk():
    from tests.test_codec_fuzz import _hammer

    img = _rgb(41, 10, 12)
    corpus = [
        V.encode_webp_lossless(img),
        V.encode_webp_lossless(img, subtract_green=True, cache_bits=4),
        V.encode_webp_lossless(img, predictor=12),
        V.encode_webp_lossless(
            np.repeat(np.arange(4, dtype=np.uint8)[None, :, None], 3, 2)
            .repeat(6, 0)
            .repeat(5, 1),
            palette=True,
        ),
    ]
    _hammer(C.decode_webp, corpus, seed=55)
