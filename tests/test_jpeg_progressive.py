"""Progressive (SOF2) JPEG: decode correctness pinned by the
definition-form oracle — a progressive stream carries exactly the same
quantized coefficients as its sequential sibling (the encoder computes
them once), so decode must be PIXEL-IDENTICAL to the sequential
decode. Exercises spectral selection, successive approximation (DC and
AC refinement), EOB-run accumulation, restart markers, subsampling,
and the end-to-end Spark media path over progressive bytes."""

from __future__ import annotations

import numpy as np
import pytest

from pg2kinesis_spark.functions.codecs import (
    decode_jpeg,
    encode_jpeg,
    encode_jpeg_progressive,
)


def _smooth_img(h, w, seed=0):
    rng = np.random.RandomState(seed)
    base = rng.randint(0, 256, (h // 8 + 2, w // 8 + 2, 3)).astype(float)
    return np.clip(np.kron(base, np.ones((8, 8, 1)))[:h, :w], 0, 255).astype(np.uint8)


def _assert_prog_identical(img, quality=85, subsample=False, restart_interval=0, scans=None):
    base = decode_jpeg(encode_jpeg(img, quality=quality, subsample=subsample))
    prog = decode_jpeg(
        encode_jpeg_progressive(
            img, quality=quality, subsample=subsample,
            restart_interval=restart_interval, scans=scans,
        )
    )
    np.testing.assert_array_equal(base, prog)


def test_progressive_gray_identical_to_sequential():
    rng = np.random.RandomState(1)
    _assert_prog_identical(rng.randint(0, 256, (16, 16)).astype(np.uint8))
    _assert_prog_identical(rng.randint(0, 256, (17, 13)).astype(np.uint8))


def test_progressive_rgb_444_identical():
    rng = np.random.RandomState(2)
    _assert_prog_identical(rng.randint(0, 256, (24, 24, 3)).astype(np.uint8))


@pytest.mark.parametrize("subsample", [True, "422"])
def test_progressive_subsampled_identical(subsample):
    rng = np.random.RandomState(3)
    _assert_prog_identical(
        rng.randint(0, 256, (24, 32, 3)).astype(np.uint8), subsample=subsample
    )


def test_progressive_restart_markers_identical():
    # restarts reset DC predictors AND the AC EOB run mid-scan
    _assert_prog_identical(_smooth_img(40, 24, seed=4), restart_interval=2)
    rng = np.random.RandomState(4)
    _assert_prog_identical(
        rng.randint(0, 256, (40, 24, 3)).astype(np.uint8),
        subsample=True,
        restart_interval=1,
    )


def test_progressive_smooth_images_long_eob_runs():
    # smooth blocks quantize to almost-all-zero AC bands: the encoder
    # accumulates multi-block EOB runs and the decoder must skip
    # exactly that many band instances (plus refinement correction
    # sweeps on later scans)
    _assert_prog_identical(_smooth_img(64, 64, seed=5))
    _assert_prog_identical(np.full((48, 48, 3), 200, dtype=np.uint8))


def test_progressive_spectral_only_script():
    # spectral selection without successive approximation (Al=0
    # everywhere) — a legal, commonly emitted script
    rng = np.random.RandomState(6)
    img = rng.randint(0, 256, (24, 16, 3)).astype(np.uint8)
    scans = [
        ([1, 2, 3], 0, 0, 0, 0),
        ([1], 1, 63, 0, 0),
        ([2], 1, 63, 0, 0),
        ([3], 1, 63, 0, 0),
    ]
    _assert_prog_identical(img, scans=scans)


def test_progressive_band_split_script():
    # many narrow bands: every band boundary is an independent EOBRUN
    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, (16, 16)).astype(np.uint8)
    scans = [
        ([1], 0, 0, 0, 1),
        ([1], 1, 2, 0, 0),
        ([1], 3, 9, 0, 0),
        ([1], 10, 35, 0, 0),
        ([1], 36, 63, 0, 0),
        ([1], 0, 0, 1, 0),
    ]
    _assert_prog_identical(img, scans=scans)


def test_progressive_deep_refinement():
    # three successive-approximation levels on the full AC band
    rng = np.random.RandomState(8)
    img = rng.randint(0, 256, (16, 16)).astype(np.uint8)
    scans = [
        ([1], 0, 0, 0, 3),
        ([1], 1, 63, 0, 3),
        ([1], 0, 0, 3, 2),
        ([1], 1, 63, 3, 2),
        ([1], 0, 0, 2, 1),
        ([1], 1, 63, 2, 1),
        ([1], 0, 0, 1, 0),
        ([1], 1, 63, 1, 0),
    ]
    _assert_prog_identical(img, scans=scans)


def test_progressive_fuzz_roundtrip():
    rng = np.random.RandomState(9)
    for i in range(12):
        h, w = int(rng.randint(8, 40)), int(rng.randint(8, 40))
        gray = bool(rng.randint(2))
        shape = (h, w) if gray else (h, w, 3)
        img = rng.randint(0, 256, shape).astype(np.uint8)
        sub = bool(rng.randint(2)) and not gray
        _assert_prog_identical(img, quality=int(rng.choice([50, 85, 95])), subsample=sub)


def test_progressive_truncated_raises():
    img = _smooth_img(24, 32, seed=10)
    data = encode_jpeg_progressive(img, quality=90)
    with pytest.raises(ValueError):
        decode_jpeg(data[: len(data) // 2])
    with pytest.raises(ValueError):
        decode_jpeg(data[:-10])


def _dht_seg(defs):
    """A DHT marker segment defining [(tc, th, (bits, vals)), ...]."""
    import struct

    body = b""
    for tc, th, (bits, vals) in defs:
        body += bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)
    return b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body


def _split_prog_stream(data):
    """(head bytes WITHOUT the upfront DHT, [(sos_seg, entropy), ...])."""
    import struct

    pos = 2
    head = bytearray(data[:2])
    scans = []
    while pos < len(data):
        assert data[pos] == 0xFF
        marker = data[pos + 1]
        if marker == 0xD9:
            break
        (seglen,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        seg = data[pos : pos + 2 + seglen]
        pos += 2 + seglen
        if marker == 0xDA:
            start = pos
            while pos < len(data):
                ff = data.find(b"\xff", pos)
                nxt = data[ff + 1]
                if nxt == 0x00 or 0xD0 <= nxt <= 0xD7:
                    pos = ff + 2
                    continue
                pos = ff
                break
            scans.append((bytearray(seg), data[start:pos]))
        elif marker != 0xC4:  # drop the upfront DHT; keep everything else
            head += seg
    return head, scans


def test_progressive_per_scan_dht_redefinition():
    """The cjpeg -progressive shape: a fresh DHT REUSING the same table
    slots before every scan. Each scan must decode against the DHT
    state at ITS OWN SOS, not the final state — the rewritten stream
    alternates slots 0/1 per scan and poisons the other slot with the
    (different) Annex-K tables, so final-state decoding would misread
    every earlier scan."""
    import struct

    from pg2kinesis_spark.functions import codecs as C

    rng = np.random.RandomState(21)
    img = rng.randint(0, 256, (24, 16)).astype(np.uint8)
    original = encode_jpeg_progressive(img, quality=85)
    head, scans = _split_prog_stream(original)
    assert len(scans) >= 3
    out = bytearray(head)
    for i, (sos, ent) in enumerate(scans):
        slot, other = i % 2, 1 - (i % 2)
        out += _dht_seg(
            [
                (0, slot, C._H_DC_FLAT),
                (1, slot, C._H_AC_FLAT),
                (0, other, C._H_DC_LUMA),  # poison: different code lengths
                (1, other, C._H_AC_LUMA),
            ]
        )
        sos[6] = (slot << 4) | slot  # td/ta byte of the single component
        out += bytes(sos) + ent
    out += b"\xff\xd9"
    np.testing.assert_array_equal(decode_jpeg(bytes(out)), decode_jpeg(original))


def test_progressive_refinement_overflow_raises_valueerror():
    """A hostile AC-refinement scan whose (15,1) symbol claims more
    zero-history positions than remain in the band must raise the
    module's ValueError (not IndexError / silent cross-band write)."""
    import struct

    from pg2kinesis_spark.functions import codecs as C

    img = np.zeros((8, 8), dtype=np.uint8)
    base = encode_jpeg_progressive(
        img, quality=85, scans=[([1], 0, 0, 0, 0), ([1], 1, 49, 0, 0)]
    )
    assert base.endswith(b"\xff\xd9")
    ac_codes = C._huff_codes(*C._H_AC_FLAT)
    wtr = C._BitWriter()
    code, ln = ac_codes[0xF1]  # r=15, s=1: run past the 14-coef band
    wtr.write(code, ln)
    wtr.write(1, 1)  # the pending newval's sign bit
    wtr.flush()
    sos = b"\xff\xda" + struct.pack(">H", 8) + bytes([1, 1, 0x00, 50, 63, 0x10])
    data = base[:-2] + sos + bytes(wtr.out) + b"\xff\xd9"
    with pytest.raises(ValueError):
        decode_jpeg(data)


def test_huffman_lut_cache_bounded():
    """Distinct per-image tables (the cjpeg -optimize corpus shape) must
    not pin unbounded LUT memory: the cache stays ≤ its cap and keeps
    recently used tables resident."""
    from pg2kinesis_spark.functions import codecs as C

    C._LUT_CACHE.clear()
    try:
        for n in range(2, 30):
            # n distinct valid 1-symbol tables: symbol n at depth 2
            C._huff_lut([0, 1] + [0] * 14, [n])
        assert len(C._LUT_CACHE) <= C._LUT_CACHE_MAX
        key = bytes([0, 1] + [0] * 14) + bytes([29])
        assert key in C._LUT_CACHE  # most recent entries survive FIFO
    finally:
        C._LUT_CACHE.clear()


def test_progressive_through_spark_media_path(spark):
    """The round-5 contract: progressive web JPEGs flow through
    features + dHash end-to-end, and a progressive re-encode of the
    same image near-dups with its baseline sibling."""
    from pg2kinesis_spark.functions.multimodal import (
        MEDIA_SCHEMA,
        extract_image_features,
        media_near_dup_pairs,
    )

    img = _smooth_img(32, 32, seed=11)
    other = _smooth_img(32, 32, seed=12)
    rows = [
        (0, bytearray(encode_jpeg(img, quality=90)), ("image/jpeg", 0, "a.jpg")),
        (1, bytearray(encode_jpeg_progressive(img, quality=90)), ("image/jpeg", 0, "b.jpg")),
        (2, bytearray(encode_jpeg_progressive(other, quality=90)), ("image/jpeg", 0, "c.jpg")),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    feats = {r.media_id: r for r in extract_image_features(media).collect()}
    assert all(r.decode_error is None for r in feats.values())
    assert (feats[1].width, feats[1].height) == (32, 32)
    # identical coefficients -> identical pixels -> identical luma
    assert feats[0].mean_luma == feats[1].mean_luma
    pairs = {
        (r.media_id1, r.media_id2)
        for r in media_near_dup_pairs(media, signature="dhash", max_hamming=2).collect()
    }
    assert (0, 1) in pairs
