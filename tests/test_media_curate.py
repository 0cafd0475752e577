"""curate_media: the media twin of curate_corpus, composed from the
verified tier pieces. Oracles are construction-side: every row is
built to hit exactly one fate (kept / a named gate / a dedup rule /
quarantine), and the test asserts the full (media_id -> reason)
partition, not just counts."""

from __future__ import annotations

import numpy as np
import pytest

from pg2kinesis_spark.functions import codecs as C
from pg2kinesis_spark.functions.multimodal import MEDIA_SCHEMA, curate_media


def _media_df(spark, rows):
    return spark.createDataFrame(
        [(i, bytearray(c), ("x/x", len(c), f"m{i}")) for i, c in rows],
        MEDIA_SCHEMA,
    )


def _img(seed, h=24, w=24):
    rng = np.random.default_rng(seed)
    return C.resize_nearest(rng.integers(30, 226, (3, 4, 3), dtype=np.uint8), w, h)


def test_curate_media_images(spark):
    base = _img(1)
    png = C.encode_png(base)
    rows = [
        (0, png),                                # survivor (min id of its group)
        (1, png),                                # exact byte duplicate
        (2, C.encode_bmp(base)),                 # same pixels, new bytes: perceptual
        (3, C.encode_png(_img(2))),              # unrelated: kept
        (4, C.encode_png(_img(3, h=4, w=4))),    # 16 px: min_pixels gate
        (5, b"not an image at all"),             # quarantine
    ]
    clean, rejected = curate_media(
        _media_df(spark, rows), kind="image", min_pixels=100
    )
    kept = sorted(r["media_id"] for r in clean.collect())
    reasons = {r["media_id"]: r["reason"] for r in rejected.collect()}
    assert kept == [0, 3]
    assert reasons[1] == "duplicate:exact"
    assert reasons[2] == "duplicate:perceptual"
    assert reasons[4] == "gate:min_pixels"
    assert 5 in reasons and "only PNG" in reasons[5]
    assert set(reasons) == {1, 2, 4, 5}
    # clean keeps the ORIGINAL media rows (schema + content intact)
    row0 = clean.filter("media_id = 0").first()
    assert bytes(row0["content"]) == png and row0["meta"]["source_uri"] == "m0"


def _tone(seconds=2.0, amp=0.5, rate=8000, freq=440):
    t = np.arange(int(seconds * rate))
    x = amp * np.sin(2 * np.pi * freq * t / rate)
    return np.round(x * 32767).astype(np.int16).reshape(-1, 1)


def test_curate_media_audio(spark):
    rate = 8000
    tone = _tone(rate=rate)
    wav = C.encode_wav(tone, rate)
    rows = [
        (0, wav),                                          # survivor
        (1, wav),                                          # exact duplicate
        (2, C.encode_flac(tone, rate)),                    # same PCM: perceptual
        (3, C.encode_wav(_tone(freq=3130, amp=0.3, rate=rate), rate)),  # kept
        (4, C.encode_wav(_tone(seconds=0.2, rate=rate), rate)),  # duration gate
        (5, C.encode_wav(np.zeros((2 * rate, 1), np.int16), rate)),  # silence gate
        (6, b"\x00\x01garbage"),                           # quarantine
    ]
    clean, rejected = curate_media(
        _media_df(spark, rows),
        kind="audio",
        min_duration_ms=500,
        max_silence_ratio=0.5,
        min_lufs=-40.0,
        max_hamming=4,
    )
    kept = sorted(r["media_id"] for r in clean.collect())
    reasons = {r["media_id"]: r["reason"] for r in rejected.collect()}
    assert kept == [0, 3]
    assert reasons[1] == "duplicate:exact"
    assert reasons[2] == "duplicate:perceptual"
    assert reasons[4] == "gate:min_duration_ms"
    assert reasons[5] in ("gate:max_silence_ratio", "gate:min_lufs")
    assert 6 in reasons and reasons[6]  # metadata walk's own error text
    assert set(reasons) == {1, 2, 4, 5, 6}


def test_curate_media_lossy_content_gate_rejects_not_passes(spark):
    """A content gate the corpus can't evaluate REJECTS, never
    silently keeps. Round 11: MPEG-1 Layer III decodes for real (the
    zeroed-granule stream is silence, so it faces the lufs gate as a
    true gate fate); round 12: MPEG-2 (LSF) decodes too, so its
    zeroed stream faces the same gate instead of refusing."""
    mp3 = C.encode_mp3_frames(n_frames=40, kbps=128, rate=44100)
    lsf = C.encode_mp3_frames(n_frames=40, kbps=64, rate=22050,
                              mpeg2=True, layer=3)
    rows = [(0, C.encode_wav(_tone(), 8000)), (1, mp3), (2, lsf)]
    clean, rejected = curate_media(
        _media_df(spark, rows), kind="audio", min_lufs=-40.0, max_hamming=None
    )
    assert [r["media_id"] for r in clean.collect()] == [0]
    reasons = {r["media_id"]: r["reason"] for r in rejected.collect()}
    assert reasons[1] == "gate:min_lufs"  # silence: nothing to gate on
    assert reasons[2] == "gate:min_lufs"  # LSF silence: same fate (r12)
    # without content gates all three sail through on header truth
    clean2, rejected2 = curate_media(
        _media_df(spark, rows), kind="audio", max_hamming=None
    )
    assert sorted(r["media_id"] for r in clean2.collect()) == [0, 1, 2]
    assert rejected2.count() == 0


def test_curate_media_transitive_and_validation(spark):
    base = _img(7)
    # chain: 0 ~ 1 (same pixels), 1 ~ 2 (same pixels) — one survivor
    rows = [
        (0, C.encode_png(base)),
        (1, C.encode_bmp(base)),
        (2, C.encode_bmp(base, top_down=True)),
        (3, C.encode_png(_img(9))),  # seed 9: hamming 18 from seed 7
    ]
    clean, rejected = curate_media(
        _media_df(spark, rows), kind="image", transitive=True
    )
    assert sorted(r["media_id"] for r in clean.collect()) == [0, 3]
    assert {r["media_id"] for r in rejected.collect()} == {1, 2}
    with pytest.raises(ValueError, match="kind"):
        curate_media(_media_df(spark, rows), kind="video")


def test_fused_kernel_matches_separate_kernels(spark):
    """image_features_sig (the round-10 one-decode fusion) is
    BIT-IDENTICAL to extract_image_features + media_dhash run
    separately — same features, same checksum, same signature, same
    quarantine verdicts — for both dhash and phash."""
    from pg2kinesis_spark.functions.multimodal import (
        extract_image_features,
        image_features_sig,
        media_dhash,
    )

    base = _img(7)
    rows = [
        (0, C.encode_png(base)),
        (1, C.encode_bmp(base)),
        (2, C.encode_png(_img(8, h=9, w=31))),
        (3, b"junk bytes"),
    ]
    media = _media_df(spark, rows)
    for algo in ("dhash", "phash"):
        fused = {
            r["media_id"]: r.asDict()
            for r in image_features_sig(media, algo=algo).collect()
        }
        feats = {
            r["media_id"]: r.asDict()
            for r in extract_image_features(media).collect()
        }
        sigs = {
            r["media_id"]: r.asDict()
            for r in media_dhash(media, algo=algo).collect()
        }
        for mid in (0, 1, 2, 3):
            f = fused[mid]
            assert f["sig"] == sigs[mid]["dhash"]
            for col in ("width", "height", "n_channels", "checksum"):
                assert f[col] == feats[mid][col], (algo, mid, col)
            if feats[mid]["mean_luma"] is None:
                assert f["mean_luma"] is None
                assert f["decode_error"] and feats[mid]["decode_error"]
            else:
                assert f["mean_luma"] == feats[mid]["mean_luma"]  # bit-equal
