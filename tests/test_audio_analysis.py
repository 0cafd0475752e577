"""Audio content analysis: the oracles here are ANALYTIC, not
reimplementations — BS.1770-4's own conformance anchor (a 0 dBFS
1 kHz sine reads -3.01 LKFS), exact dB linearity, the energy-sum
channel law (+3.01 LU for dual mono), and closed-form spectral truths
of pure tones (centroid = f, ZCR = 2f/rate, flatness → 0) and
deterministic-LCG noise (flatness ≫ tone's). The 48 kHz K-weighting
coefficients are pinned byte-for-byte to the tables printed in the
spec, and the any-rate derivation must round-trip them exactly."""

from __future__ import annotations

import numpy as np
import pytest

from pg2kinesis_spark.functions import audio_analysis as aa
from pg2kinesis_spark.functions.codecs import (
    encode_flac,
    encode_mp3_frames,
    encode_wav,
)

RATE = 48000


def sine(freq: float, seconds: float, rate: int = RATE, amp: float = 1.0) -> np.ndarray:
    t = np.arange(int(seconds * rate))
    return amp * np.sin(2 * np.pi * freq * t / rate)


def as_i16(x: np.ndarray) -> np.ndarray:
    # scale so that amp 1.0 maps to a full-scale-ish 32767 (keeps
    # float amp semantics to ~1e-4 after the int round trip)
    return np.round(x * 32767.0).astype(np.int16).reshape(-1, 1)


# --- K-weighting filter -------------------------------------------------


def test_coeffs_at_48k_are_the_itu_tables():
    b1, a1, b2, a2 = aa.k_weighting_coeffs(48000)
    assert b1.tolist() == [1.53512485958697, -2.69169618940638, 1.19839281085285]
    assert a1.tolist() == [1.0, -1.69065929318241, 0.73248077421585]
    assert b2.tolist() == [1.0, -2.0, 1.0]
    assert a2.tolist() == [1.0, -1.99004745483398, 0.99007225036621]


def test_analog_round_trip_is_exact_at_48k():
    for coeffs in (
        aa._ITU48_SHELF_B,
        aa._ITU48_SHELF_A,
        aa._ITU48_HPF_A,
    ):
        back = aa._analog_to_digital(aa._digital_to_analog(coeffs, 48000), 48000)
        back = back / back[0] * coeffs[0]
        assert np.abs(back - np.array(coeffs)).max() < 1e-12


def test_derived_rates_preserve_the_shelf_shape():
    # High-shelf: ~0 dB gain deep in the passband, ~+4 dB at the top.
    for rate in (44100, 96000, 32000):
        b1, a1, _, _ = aa.k_weighting_coeffs(rate)

        def gain_db(f):
            w = 2 * np.pi * f / rate
            z = np.exp(-1j * w)
            h = (b1[0] + b1[1] * z + b1[2] * z**2) / (a1[0] + a1[1] * z + a1[2] * z**2)
            return 20 * np.log10(abs(h))

        assert gain_db(100) == pytest.approx(0.0, abs=0.05)
        assert gain_db(rate * 0.45) == pytest.approx(4.0, abs=0.15)


# --- Integrated loudness (BS.1770-4) ------------------------------------


@pytest.mark.parametrize("rate", [48000, 44100, 32000, 96000])
def test_conformance_anchor_full_scale_1k_sine(rate):
    # BS.1770: a 0 dBFS 1 kHz sine on one channel reads -3.01 LKFS.
    x = sine(1000, 5.0, rate=rate)
    assert aa.integrated_lufs(x, rate) == pytest.approx(-3.01, abs=0.05)


def test_loudness_linearity_exact():
    ref = aa.integrated_lufs(sine(1000, 5.0), RATE)
    quarter = aa.integrated_lufs(sine(1000, 5.0, amp=0.25), RATE)
    assert ref - quarter == pytest.approx(20 * np.log10(4.0), abs=0.01)


def test_dual_mono_reads_plus_3LU():
    x = sine(1000, 5.0, amp=0.5)
    mono = aa.integrated_lufs(x, RATE)
    stereo = aa.integrated_lufs(np.stack([x, x], axis=1), RATE)
    assert stereo - mono == pytest.approx(10 * np.log10(2.0), abs=0.01)


def test_silence_and_short_input_are_none():
    assert aa.integrated_lufs(np.zeros(2 * RATE), RATE) is None
    # shorter than one 400 ms block
    assert aa.integrated_lufs(sine(1000, 0.3), RATE) is None


def test_gating_drops_the_quiet_tail():
    loud = sine(1000, 3.0, amp=0.5)
    quiet = sine(1000, 5.0, amp=1e-5)  # ~ -97 dBFS, below the -70 gate
    gated = aa.integrated_lufs(np.concatenate([loud, quiet]), RATE)
    loud_only = aa.integrated_lufs(loud, RATE)
    # blocks straddling the boundary may survive, but the 5 s of
    # near-silence must not drag the integrated value down
    assert gated == pytest.approx(loud_only, abs=0.5)
    # ungated energy mean over 8 s would sit ~4.3 dB lower
    assert gated > loud_only - 1.0


# --- Simple content measures --------------------------------------------


def test_peak_and_rms_dbfs_exact():
    # 1 kHz at 48 kHz has 48 samples/cycle and hits the exact peak.
    d = aa.analyze_pcm(as_i16(sine(1000, 1.0, amp=0.5)) * 2, RATE, 17)
    # amp 0.5 scaled by 2 in a 17-bit domain == amp 0.5 full scale
    assert d["peak_dbfs"] == pytest.approx(20 * np.log10(0.5), abs=1e-3)
    assert d["rms_dbfs"] == pytest.approx(20 * np.log10(0.5 / np.sqrt(2)), abs=1e-3)


def test_silence_ratio_exact_on_frame_aligned_halves():
    frame = RATE // 10
    loud = sine(1000, 1.0, amp=0.5)[: 10 * frame]
    silent = np.zeros(10 * frame)
    r = aa.silence_ratio(np.concatenate([loud, silent]), RATE)
    assert r == pytest.approx(0.5)
    assert aa.silence_ratio(np.zeros(10), RATE) is None


def test_zcr_of_pure_tone():
    assert aa.zero_crossing_rate(sine(1000, 2.0)) == pytest.approx(
        2 * 1000 / RATE, abs=1e-3
    )
    assert aa.zero_crossing_rate(sine(4000, 2.0)) == pytest.approx(
        2 * 4000 / RATE, abs=1e-3
    )


def test_spectral_truths_of_tone_and_noise():
    c, r, flat = aa.spectral_features(sine(1000, 2.0), RATE)
    bin_hz = RATE / 2048
    assert c == pytest.approx(1000, abs=2 * bin_hz)
    assert r == pytest.approx(1000, abs=2 * bin_hz)
    assert flat < 0.02
    # deterministic LCG noise: broadband, flatness well above a tone's
    state = 12345
    vals = []
    for _ in range(2 * RATE):
        state = (state * 6364136223846793005 + 1442695040888963407) & (2**64 - 1)
        vals.append(state >> 40)
    noise = (np.array(vals, dtype=np.float64) / 2**23) * 2 - 1
    cn, rn, flat_n = aa.spectral_features(noise, RATE)
    assert flat_n > 0.2
    assert rn > 0.5 * (RATE / 2) * 0.85  # energy spread across the band
    assert aa.spectral_features(np.zeros(100), RATE) is None


def test_analyze_pcm_stereo_and_empty():
    x = as_i16(sine(1000, 1.0, amp=0.25))
    stereo = np.concatenate([x, x], axis=1)
    d = aa.analyze_pcm(stereo, RATE, 16)
    assert d["peak_dbfs"] == pytest.approx(20 * np.log10(0.25), abs=1e-3)
    empty = aa.analyze_pcm(np.zeros((0, 1), dtype=np.int16), RATE, 16)
    assert all(v is None for v in empty.values())


# --- Spark wiring --------------------------------------------------------


def _media_df(spark, rows):
    from pg2kinesis_spark.functions.multimodal import MEDIA_SCHEMA

    return spark.createDataFrame(
        [(i, bytearray(c), ("audio/x", len(c), f"m{i}")) for i, c in enumerate(rows)],
        MEDIA_SCHEMA,
    )


def test_extract_audio_analysis_matches_pure_function(spark):
    from pg2kinesis_spark.functions.multimodal import extract_audio_analysis

    pcm = as_i16(sine(1000, 2.0, amp=0.5))
    wav = encode_wav(pcm, RATE)
    flac = encode_flac(pcm, RATE, bits=16)
    mp3 = encode_mp3_frames(n_frames=4, kbps=128, rate=44100)

    out = extract_audio_analysis(_media_df(spark, [wav, flac, mp3]))
    got = {r["media_id"]: r.asDict() for r in out.collect()}

    want = aa.analyze_pcm(pcm, RATE, 16)
    for mid in (0, 1):  # WAV and its FLAC transcode: identical PCM
        row = got[mid]
        assert row["decode_error"] is None
        for k, v in want.items():
            assert row[k] == pytest.approx(v, rel=1e-12), (mid, k)
    # round 11: MPEG-1 Layer III decodes for real — the zeroed-granule
    # stream is exact digital silence (lufs None: nothing passes the
    # absolute gate), not a refusal
    assert got[2]["decode_error"] is None
    assert got[2]["lufs"] is None and got[2]["silence_ratio"] == 1.0
    # round 12: LSF Layer III decodes too — the zeroed LSF stream is
    # exact silence; the refusal pin moves to MPEG-2.5 (vbits 0)
    lsf = encode_mp3_frames(4, kbps=64, rate=22050, mpeg2=True, layer=3)
    out = extract_audio_analysis(_media_df(spark, [lsf]))
    row = out.collect()[0]
    assert row["decode_error"] is None and row["silence_ratio"] == 1.0
    m25 = bytearray(lsf)
    m25[1] &= ~0x18  # version bits 2 (MPEG-2) -> 0 (MPEG-2.5)
    out = extract_audio_analysis(_media_df(spark, [bytes(m25)]))
    err = out.collect()[0]["decode_error"]
    assert err is not None and "MPEG-2.5" in err


def test_extract_audio_analysis_raise_mode(spark):
    from pg2kinesis_spark.functions.multimodal import extract_audio_analysis

    df = _media_df(spark, [b"not audio at all"])
    with pytest.raises(Exception):
        extract_audio_analysis(df, errors="raise").collect()


# --- Landmark (constellation) fingerprint ---------------------------------


def melody(seed, seconds=3.0, rate=8000, amp=0.5):
    """A random tone sequence (0.25 s notes) — non-stationary, so the
    constellation is informative and offset votes are unambiguous."""
    rng = np.random.default_rng(seed)
    seg = int(0.25 * rate)
    notes = rng.integers(300, 3200, int(seconds / 0.25))
    t = np.arange(seg)
    return np.concatenate([amp * np.sin(2 * np.pi * f * t / rate) for f in notes])


def test_peaks_land_on_tone_bins_and_are_volume_invariant():
    rate = 8000
    t = np.arange(2 * rate)
    x = np.sin(2 * np.pi * 440 * t / rate) + 0.5 * np.sin(2 * np.pi * 1250 * t / rate)
    peaks = aa.spectral_peaks(x, rate)
    bins = {b for _, b in peaks}
    assert round(440 * 1024 / rate) in bins and round(1250 * 1024 / rate) in bins
    assert aa.spectral_peaks(0.25 * x, rate) == peaks  # pure scaling


def test_landmark_offset_voting_recovers_the_shift():
    rate = 8000
    x = melody(5, rate=rate)
    shift_hops = 4
    xs = np.concatenate([np.zeros(shift_hops * 512), x])
    h1 = aa.landmark_hashes(aa.spectral_peaks(x, rate))
    h2 = aa.landmark_hashes(aa.spectral_peaks(xs, rate))
    from collections import Counter, defaultdict

    by_hash = defaultdict(list)
    for h, t1 in h1:
        by_hash[h].append(t1)
    votes = Counter()
    for h, t1 in h2:
        for t0 in by_hash.get(h, ()):
            votes[t1 - t0] += 1
    (best, n), *rest = votes.most_common(2) or [((None, 0))]
    assert best == shift_hops and n >= 20
    # an unrelated melody gathers no consistent offset
    h3 = aa.landmark_hashes(aa.spectral_peaks(melody(6, rate=rate), rate))
    votes = Counter()
    for h, t1 in h3:
        for t0 in by_hash.get(h, ()):
            votes[t1 - t0] += 1
    assert not votes or votes.most_common(1)[0][1] < 8


def test_audio_landmark_match_spark(spark):
    from pg2kinesis_spark.functions.codecs import encode_flac, encode_wav
    from pg2kinesis_spark.functions.multimodal import (
        MEDIA_SCHEMA,
        audio_landmark_match,
    )

    rate = 8000
    base = melody(7, rate=rate)
    shifted = np.concatenate([np.zeros(4 * 512), base])
    as_i16_ = lambda x: np.round(x * 32767).astype(np.int16).reshape(-1, 1)
    rows = [
        (0, encode_wav(as_i16_(base), rate)),
        (1, encode_wav(as_i16_(shifted), rate)),        # padded copy
        (2, encode_flac(as_i16_(0.5 * base), rate)),    # half-volume transcode
        (3, encode_wav(as_i16_(melody(8, rate=rate)), rate)),  # unrelated
        (4, b"not audio"),                               # quarantine
    ]
    media = spark.createDataFrame(
        [(i, bytearray(c), ("a/x", len(c), f"m{i}")) for i, c in rows],
        MEDIA_SCHEMA,
    )
    got = {
        (r["media_id1"], r["media_id2"]): (r["votes"], r["dt_frames"])
        for r in audio_landmark_match(media, min_votes=8).collect()
    }
    # dt = t1(media_id1) - t1(media_id2): the padded copy's events sit
    # 4 hops LATER, so (base, padded) votes dt = -4
    assert (0, 1) in got and got[(0, 1)][1] == -4
    assert (0, 2) in got and got[(0, 2)][1] == 0   # volume change: aligned
    assert (1, 2) in got and got[(1, 2)][1] == 4
    assert not any(3 in pair for pair in got)
    assert not any(4 in pair for pair in got)


def test_bs1770_channel_weights_exclude_lfe():
    """BS.1770-4 weights by layout (ADVICE r9): in 5.1+ WAV order,
    channel index 3 is the LFE and is EXCLUDED from the measure
    (weight 0), surrounds weigh 1.41. A loud LFE must not move
    integrated loudness: dual-mono 5.1 (sine on FL/FR, garbage on
    LFE) reads the same as without the LFE content."""
    assert aa.channel_weights(1) == [1.0]
    assert aa.channel_weights(2) == [1.0, 1.0]
    assert aa.channel_weights(6) == [1.0, 1.0, 1.0, 0.0, 1.41, 1.41]
    assert aa.channel_weights(8) == [1.0, 1.0, 1.0, 0.0, 1.41, 1.41, 1.41, 1.41]
    x = sine(1000, 3.0)
    zeros = np.zeros_like(x)
    lfe_noise = sine(50, 3.0)  # loud LFE rumble
    quiet = np.zeros((len(x), 6))
    quiet[:, 0] = x
    quiet[:, 1] = x
    loud_lfe = quiet.copy()
    loud_lfe[:, 3] = lfe_noise
    a = aa.integrated_lufs(quiet, RATE)
    b = aa.integrated_lufs(loud_lfe, RATE)
    assert a is not None and b == a
    # and the surrounds DO count: adding content at index 4 raises it
    with_surround = quiet.copy()
    with_surround[:, 4] = x
    c = aa.integrated_lufs(with_surround, RATE)
    assert c > a


# --- MPEG-1 Layer I/II synthesis -> content analysis (round 10) -----------

def _l2_mp3_of(pcm_float, rate=44100, kbps=192):
    """Real Layer II stream of mono float PCM through the module's own
    analysis twin + the spec-packed encoder."""
    from pg2kinesis_spark.functions import codecs as C

    S = aa.l12_analysis(pcm_float)
    n_frames = S.shape[0] // 36
    sb = S[: n_frames * 36].reshape(n_frames, 36, 32).transpose(0, 2, 1)
    sblimit, _classes = C._l2_table(rate, kbps)
    sb[:, sblimit:, :] = 0.0  # the table's sblimit contract
    return C.encode_mp3_layer2(sb, rate=rate, kbps=kbps)


def test_l12_synthesis_near_perfect_reconstruction():
    """The derived-prototype pseudo-QMF pair: analysis -> synthesis of
    a multi-tone reconstructs at > 38 dB SNR with gain within 0.5 %
    (the documented near-PR bar; LUFS needs ~2 orders less)."""
    t = np.arange(3 * RATE)
    x = (
        0.5 * np.sin(2 * np.pi * 997 * t / RATE)
        + 0.2 * np.sin(2 * np.pi * 3170 * t / RATE)
        + 0.1 * np.sin(2 * np.pi * 9000 * t / RATE)
    )
    y = aa.l12_synthesis(aa.l12_analysis(x))
    d = 511  # analysis + synthesis group delay
    seg, ref = y[d : d + 2 * RATE], x[: 2 * RATE]
    g = np.dot(seg, ref) / np.dot(ref, ref)
    snr = 10 * np.log10((ref**2).sum() / ((seg - ref) ** 2).sum())
    assert abs(g - 1.0) < 0.005
    assert snr > 38.0


def test_l2_mp3_loudness_matches_wav_twin():
    """The round-10 'Done' bar: analyze through a REAL Layer II stream
    (subband-encode of the analysis twin's output, full requantization
    on the wire) and the LUFS/RMS/silence numbers match the WAV twin
    within tolerance."""
    from pg2kinesis_spark.functions import codecs as C

    rate = 44100
    t = np.arange(2 * rate)
    x = 0.4 * np.sin(2 * np.pi * 997 * t / rate)
    mp3 = _l2_mp3_of(x, rate)
    sb, got_rate = C.mp3_l12_subband_samples(mp3)
    assert got_rate == rate
    pcm = aa.l12_synthesis(sb)  # (n, 1): sb carries a channel axis
    ref = aa.analyze_pcm(as_i16(x), rate, 16)
    got = aa.analyze_pcm(pcm * 32768.0, rate, 16)
    assert got["lufs"] == pytest.approx(ref["lufs"], abs=0.3)
    assert got["rms_dbfs"] == pytest.approx(ref["rms_dbfs"], abs=0.3)
    assert got["silence_ratio"] == pytest.approx(ref["silence_ratio"], abs=0.05)
    assert got["spectral_centroid_hz"] == pytest.approx(
        ref["spectral_centroid_hz"], rel=0.05
    )


def test_l1_mp3_subband_samples_round_trip():
    """Layer I: planted subband blocks survive the wire (the encoder
    packs them; the new sample walk reads them back through the same
    quantizer) and synthesize to the planted tone's loudness."""
    from pg2kinesis_spark.functions import codecs as C

    rate = 44100
    t = np.arange(2 * rate)
    x = 0.3 * np.sin(2 * np.pi * 1500 * t / rate)
    S = aa.l12_analysis(x)
    n_frames = S.shape[0] // 12
    sb = S[: n_frames * 12].reshape(n_frames, 12, 32).transpose(0, 2, 1)
    mp3 = C.encode_mp3_layer1(sb, rate=rate, kbps=256)
    dec, got_rate = C.mp3_l12_subband_samples(mp3)
    assert got_rate == rate and dec.shape == (n_frames * 12, 32, 1)
    # quantization at 256 kbps: samples near their planted values
    planted = S[: n_frames * 12]
    assert float(np.abs(dec[:, :, 0] - planted).max()) < 0.05
    pcm = aa.l12_synthesis(dec[:, :, 0])
    ref_lufs = aa.integrated_lufs(x, rate)
    got_lufs = aa.integrated_lufs(pcm, rate)
    assert got_lufs == pytest.approx(ref_lufs, abs=0.4)


def test_l12_analysis_spark_front_door(spark):
    """extract_audio_analysis: a Layer II MP3 yields real content
    numbers (lufs within 0.3 dB of its WAV twin through Spark); a
    zeroed-granule Layer III stream decodes as silence (round 11)."""
    from pg2kinesis_spark.functions.codecs import encode_mp3_frames, encode_wav
    from pg2kinesis_spark.functions.multimodal import (
        MEDIA_SCHEMA,
        extract_audio_analysis,
    )

    rate = 44100
    t = np.arange(2 * rate)
    x = 0.4 * np.sin(2 * np.pi * 997 * t / rate)
    wav = encode_wav(as_i16(x), rate)
    mp3_l2 = _l2_mp3_of(x, rate)
    mp3_l3 = encode_mp3_frames(40, kbps=128, rate=rate)
    rows = [
        (0, bytearray(wav), ("audio/wav", len(wav), "m0")),
        (1, bytearray(mp3_l2), ("audio/mpeg", len(mp3_l2), "m1")),
        (2, bytearray(mp3_l3), ("audio/mpeg", len(mp3_l3), "m2")),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r["media_id"]: r for r in extract_audio_analysis(media).collect()}
    assert got[0]["decode_error"] is None
    assert got[1]["decode_error"] is None
    assert got[1]["lufs"] == pytest.approx(got[0]["lufs"], abs=0.3)
    # round 11: the zeroed-granule Layer III stream decodes (silence)
    assert got[2]["decode_error"] is None
    assert got[2]["lufs"] is None and got[2]["silence_ratio"] == 1.0


def test_landmarks_match_through_l2_transcode(spark):
    """The constellation survives the Layer II wire: a WAV melody and
    its L2 MP3 transcode (analysis twin + spec-packed encoder) match
    with dt = 0 in audio_landmark_match; an unrelated melody doesn't."""
    from pg2kinesis_spark.functions.codecs import encode_wav
    from pg2kinesis_spark.functions.multimodal import (
        MEDIA_SCHEMA,
        audio_landmark_match,
    )

    rate = 44100
    base = melody(7, rate=rate, seconds=4.0)
    # the unrelated track lives in a DISJOINT frequency band — two
    # 16-note melodies drawn from one 300-3200 Hz vocabulary can
    # share enough (bin1, bin2, dt) geometry to gather chance votes
    rng = np.random.default_rng(9)
    seg = int(0.25 * rate)
    notes = rng.integers(4500, 9000, 16)
    t = np.arange(seg)
    other = np.concatenate(
        [0.5 * np.sin(2 * np.pi * f * t / rate) for f in notes]
    )
    wav = encode_wav(np.round(base * 32767).astype(np.int16).reshape(-1, 1), rate)
    mp3 = _l2_mp3_of(base * 0.9, rate)
    wav_o = encode_wav(np.round(other * 32767).astype(np.int16).reshape(-1, 1), rate)
    rows = [
        (0, bytearray(wav), ("audio/wav", len(wav), "m0")),
        (1, bytearray(mp3), ("audio/mpeg", len(mp3), "m1")),
        (2, bytearray(wav_o), ("audio/wav", len(wav_o), "m2")),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {
        (r["media_id1"], r["media_id2"]): r["dt_frames"]
        for r in audio_landmark_match(media, min_votes=8).collect()
    }
    assert (0, 1) in got and abs(got[(0, 1)]) <= 1  # 511-sample delay < 1 hop
    assert not any(2 in p for p in got)
