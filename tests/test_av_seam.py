"""PyAV (ffmpeg) cross-decoder oracles for the Layer III tier —
VERDICT r11 items 2(c) and 6.

These are the INDEPENDENT-decoder receipts for the round-12 Huffman
table transcriptions: our encoder twin emits a stream restricted to
one table; ffmpeg — a fully independent implementation carrying the
printed ISO 11172-3/13818-3 tables — decodes the same bytes; the two
PCMs must agree after codec-delay alignment. A same-length symbol
permutation inside a transcribed table round-trips cleanly through
our own encoder/decoder pair (they share the table) but produces
DIFFERENT spectra under ffmpeg — exactly the residual class the
in-sandbox structural checks (Kraft-exact tiling, part2_3_length
landing) cannot catch.

The binding is absent in the build container, so everything here
skips cleanly; docker/docker-compose.av.yml is the twin environment
that has it (the docker-compose.pg.yml precedent)."""

from __future__ import annotations

import io

import numpy as np
import pytest

from pg2kinesis_spark.functions import mp3_l3 as L3

av = pytest.importorskip("av")

RATE = 44100


def _melody(seed, seconds=2.0, rate=RATE, amp=0.5):
    rng = np.random.default_rng(seed)
    seg = int(0.25 * rate)
    notes = rng.integers(300, 3200, int(seconds / 0.25))
    t = np.arange(seg)
    return np.concatenate(
        [amp * np.sin(2 * np.pi * f * t / rate) for f in notes]
    )


def _av_decode(blob: bytes):
    from pg2kinesis_spark.functions.codecs import _pyav_decode_pcm

    return _pyav_decode_pcm(blob)


def _aligned_agreement(a: np.ndarray, b: np.ndarray, n: int = 30000):
    """Best-lag correlation + RMS ratio between two mono decodes of
    the same stream (decoders disagree on codec-delay trimming)."""
    a = np.asarray(a, dtype=float)[:, 0] if a.ndim == 2 else a
    b = np.asarray(b, dtype=float)[:, 0] if b.ndim == 2 else b
    n = min(n, len(a) - 2400, len(b) - 2400)
    ref = a[2400 : 2400 + n]
    best = max(
        range(0, 4800),
        key=lambda l: float(np.dot(b[l : l + n], ref)),
    )
    seg = b[best : best + n]
    corr = float(np.corrcoef(seg, ref)[0, 1])
    rms = float(
        np.sqrt((seg**2).mean()) / max(np.sqrt((ref**2).mean()), 1e-30)
    )
    return corr, rms


@pytest.mark.parametrize("tab", [1, 2, 3, 5, 6, 7, 8, 9])
def test_cross_decoder_agrees_per_table(tab):
    pcm = _melody(3)
    blob = L3.encode_mp3_layer3(pcm, RATE, table_select=tab)
    ours, r_ours = L3.decode_mp3_layer3(blob)
    theirs, r_av = _av_decode(blob)
    assert r_ours == r_av == RATE
    corr, rms = _aligned_agreement(ours, theirs)
    assert corr > 0.99, (tab, corr)
    assert abs(20 * np.log10(rms)) < 0.5, (tab, rms)


@pytest.mark.parametrize(
    "kw",
    [
        {"count1_table": "A"},
        {"ms": True},
        {"short_blocks": True},
        {"scalefac_pattern": 1},
    ],
)
def test_cross_decoder_agrees_on_options(kw):
    pcm = _melody(5)
    if kw.get("ms"):
        pcm = np.stack([pcm, _melody(6)], 1)
    blob = L3.encode_mp3_layer3(pcm, RATE, **kw)
    ours, _ = L3.decode_mp3_layer3(blob)
    theirs, _ = _av_decode(blob)
    corr, rms = _aligned_agreement(ours, theirs)
    assert corr > 0.98, (kw, corr)
    assert abs(20 * np.log10(rms)) < 0.75, (kw, rms)


@pytest.mark.parametrize(
    "kw",
    [{}, {"lsf_sfc": 101}, {"lsf_sfc": 508}, {"count1_table": "A"}],
)
def test_cross_decoder_agrees_on_lsf(kw):
    rate = 22050
    pcm = _melody(7, rate=rate)
    blob = L3.encode_mp3_layer3(pcm, rate, kbps=64, version=2, **kw)
    ours, _ = L3.decode_mp3_layer3(blob)
    theirs, r_av = _av_decode(blob)
    assert r_av == rate
    corr, rms = _aligned_agreement(ours, theirs)
    assert corr > 0.98, (kw, corr)
    assert abs(20 * np.log10(rms)) < 0.75, (kw, rms)


# --- the real-world direction: ffmpeg-ENCODED streams -------------------------


def _av_encode(pcm: np.ndarray, rate: int, fmt: str, codec: str,
               codec_rate: int | None = None) -> bytes:
    buf = io.BytesIO()
    out = av.open(buf, "w", format=fmt)
    stream = out.add_stream(codec, rate=codec_rate or rate)
    frame_pcm = (np.clip(pcm, -1, 1) * 32767).astype(np.int16)
    frame = av.AudioFrame.from_ndarray(
        frame_pcm[None, :], format="s16", layout="mono"
    )
    frame.sample_rate = rate
    for packet in stream.encode(frame):
        out.mux(packet)
    for packet in stream.encode(None):
        out.mux(packet)
    out.close()
    return buf.getvalue()


def test_real_encoder_mp3_reaches_pcm_through_the_seam(spark):
    """A LAME-encoded MP3 (big Huffman tables): our decoder refuses by
    table name, and extract_audio_analysis upgrades the refusal into a
    real decode through fast_audio_decoder — VERDICT r11 item 6."""
    from pg2kinesis_spark.functions.multimodal import (
        MEDIA_SCHEMA,
        extract_audio_analysis,
    )

    pcm = _melody(11)
    try:
        blob = _av_encode(pcm, RATE, "mp3", "libmp3lame")
    except Exception as exc:  # pragma: no cover — lame not in build
        pytest.skip(f"libmp3lame unavailable: {exc}")
    # the honest-refusal side: a real encoder picks untranscribed
    # tables somewhere in two seconds of music
    with pytest.raises(NotImplementedError, match="table|intensity"):
        L3.decode_mp3_layer3(blob)
    media = spark.createDataFrame(
        [(0, bytearray(blob), ("a/x", len(blob), "m0"))], MEDIA_SCHEMA
    )
    row = extract_audio_analysis(media).collect()[0]
    assert row["decode_error"] is None
    assert row["silence_ratio"] < 0.2
    assert row["lufs"] is not None and -30 < row["lufs"] < -6


@pytest.mark.parametrize(
    "fmt,codec",
    [("adts", "aac"), ("ogg", "libopus"), ("ogg", "libvorbis")],
)
def test_lossy_families_reach_pcm_through_the_seam(spark, fmt, codec):
    from pg2kinesis_spark.functions.multimodal import (
        MEDIA_SCHEMA,
        extract_audio_analysis,
    )

    rate = 48000 if codec == "libopus" else RATE
    pcm = _melody(13, rate=rate)
    try:
        blob = _av_encode(pcm, rate, fmt, codec)
    except Exception as exc:  # pragma: no cover — codec not in build
        pytest.skip(f"{codec} unavailable: {exc}")
    media = spark.createDataFrame(
        [(0, bytearray(blob), ("a/x", len(blob), "m0"))], MEDIA_SCHEMA
    )
    row = extract_audio_analysis(media).collect()[0]
    assert row["decode_error"] is None, row["decode_error"]
    assert row["silence_ratio"] < 0.2
