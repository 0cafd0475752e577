"""Optional PIL-accelerated image decode behind the decode_image seam:
the knob, the fallback contract, and (when PIL is importable) equality
vs the pure-Python kernels over the fuzz corpus formats."""

from __future__ import annotations

import numpy as np
import pytest

from pg2kinesis_spark.functions import codecs as C

_HAS_PIL = False
try:  # the container usually lacks PIL; equality tests skip-gate on it
    import PIL.Image  # noqa: F401

    _HAS_PIL = True
except Exception:
    pass


@pytest.fixture
def reset_seam(monkeypatch):
    """The resolver is a once-per-process singleton; tests reset it."""
    C._FAST_DECODER.clear()
    yield monkeypatch
    C._FAST_DECODER.clear()


def test_seam_resolves_off_without_pil_or_with_knob(reset_seam):
    reset_seam.setenv("SPARK_GRAFT_NO_PIL", "1")
    assert C.fast_image_decoder() is None  # knob wins even with PIL


def test_decode_image_pure_path_unchanged(reset_seam):
    """With the fast path off, decode_image is the pure dispatch —
    the configuration every existing codec test already pins."""
    reset_seam.setenv("SPARK_GRAFT_NO_PIL", "1")
    img = np.random.RandomState(3).randint(0, 256, (12, 9, 3), dtype=np.uint8)
    png = C.encode_png(img)
    assert np.array_equal(C.decode_image(png), C.decode_png(png))
    with pytest.raises(NotImplementedError, match="PNG"):
        C.decode_image(b"not an image")


def test_sixteen_bit_png_stays_on_pure_path():
    """The high-byte 16-bit reduction is this module's rule — PIL's
    I;16 handling differs, so eligibility must exclude depth-16 PNGs
    regardless of PIL availability."""
    img = np.random.RandomState(4).randint(0, 256, (6, 5, 3), dtype=np.uint8)
    png16 = bytearray(C.encode_png(img))
    # encode_png writes depth 8; check the eligibility gate directly on
    # a synthetic header byte
    assert C._fast_eligible(bytes(png16))
    png16[24] = 16
    assert not C._fast_eligible(bytes(png16))


@pytest.mark.skipif(not _HAS_PIL, reason="PIL not installed in this container")
def test_fast_path_equality_when_pil_present(reset_seam):
    """PNG/GIF exact, JPEG within IDCT rounding (|Δ| ≤ 3, ≥99.9% of
    pixels within 1) — the oracle that gates the fast path anywhere
    PIL exists."""
    reset_seam.delenv("SPARK_GRAFT_NO_PIL", raising=False)
    rng = np.random.RandomState(5)
    img = rng.randint(0, 256, (33, 47, 3), dtype=np.uint8)
    gray = rng.randint(0, 256, (21, 17, 1), dtype=np.uint8)

    png = C.encode_png(img)
    assert np.array_equal(C._fast_decode_image(png), C.decode_png(png))

    gif = C.encode_gif_frames([img], delay_cs=10)
    assert np.array_equal(C._fast_decode_image(gif), C.decode_gif(gif))

    for src in (img, gray):
        jpg = C.encode_jpeg(src, quality=90)
        a = C._fast_decode_image(jpg).astype(np.int16)
        b = C.decode_jpeg(jpg).astype(np.int16)
        assert a.shape == b.shape
        d = np.abs(a - b)
        assert d.max() <= 3
        assert (d <= 1).mean() >= 0.999


@pytest.mark.skipif(not _HAS_PIL, reason="PIL not installed in this container")
def test_fast_path_hostile_falls_back_to_pure_errors(reset_seam):
    reset_seam.delenv("SPARK_GRAFT_NO_PIL", raising=False)
    img = np.random.RandomState(6).randint(0, 256, (8, 8, 3), dtype=np.uint8)
    png = bytearray(C.encode_png(img))
    png[40] ^= 0xFF  # corrupt IDAT: PIL raises, pure path owns the error
    with pytest.raises(Exception):
        C.decode_image(bytes(png))


@pytest.mark.skipif(not _HAS_PIL, reason="PIL not installed in this container")
def test_image_features_luma_pure_when_pil_present(spark):
    """extract_image_features decodes with deterministic=True, so on a
    PIL-equipped host mean_luma must equal the PURE decoder's luma
    bit-for-bit — luma is joinable across hosts like the dHash path."""
    from pg2kinesis_spark.functions.multimodal import (
        MEDIA_SCHEMA,
        extract_image_features,
    )

    rng = np.random.RandomState(11)
    img = rng.randint(0, 256, (24, 16, 3), dtype=np.uint8)
    jpg = C.encode_jpeg(img, quality=90)
    media = spark.createDataFrame(
        [(0, bytearray(jpg), ("image/jpeg", len(jpg), "mem://0"))], MEDIA_SCHEMA
    )
    row = extract_image_features(media).collect()[0]
    px = C.decode_jpeg(jpg).astype("float64")
    want = float(
        (0.299 * px[:, :, 0] + 0.587 * px[:, :, 1] + 0.114 * px[:, :, 2]).mean()
    )
    assert row["mean_luma"] == want


def test_deterministic_jpeg_bypasses_fast_path(reset_seam):
    """decode_image(deterministic=True) must return the PURE decoder's
    JPEG pixels regardless of PIL availability — dHash fingerprints are
    join keys across hosts. Pinned by planting a marker fast decoder;
    PNG (bit-exact either way) still takes the fast path."""
    rng = np.random.default_rng(7)
    img = rng.integers(0, 255, (24, 24, 3), dtype=np.uint8)
    jpg = C.encode_jpeg(img)
    png = C.encode_png(img)
    marker = np.zeros((1, 1, 3), dtype=np.uint8)
    C._FAST_DECODER.clear()
    C._FAST_DECODER.append(lambda b: marker)
    try:
        assert C.decode_image(jpg).shape == (1, 1, 3)  # fast path active
        out = C.decode_image(jpg, deterministic=True)
        assert np.array_equal(out, C.decode_jpeg(jpg))  # pure, not marker
        assert C.decode_image(png, deterministic=True).shape == (1, 1, 3)
    finally:
        C._FAST_DECODER.clear()
