"""Audio content analysis over truly-decoded PCM.

The audio tier so far answers identity questions (pcm_md5, energy
envelopes, tags); this module answers CONTENT questions a corpus
curator asks before training on audio: how loud is it, is it mostly
silence, is it tonal or noise-like, where does its energy live. Every
measure here is computed on real decoded samples — the callers feed it
the losslessly decodable containers (WAV/FLAC/AIFF/Ogg-FLAC, the same
front door as ``extract_audio_pcm``) plus, since round 10, MPEG-1
Layer I/II PCM through the subband synthesis at the bottom of this
module; everything else quarantines, so there are no proxy numbers
pretending to be content truth.

Measures:

* **Integrated loudness (LUFS)** per ITU-R BS.1770-4: per-channel
  K-weighting (two cascaded biquads), 400 ms blocks at 75 % overlap,
  the -0.691 dB offset, -70 LUFS absolute gate, then the -10 LU
  relative gate. At 48 kHz the K-filter coefficients are the tables
  printed in the spec itself, VERBATIM; at any other rate they are
  derived from those tables by mapping the published filter back to
  its analog prototype (inverse bilinear transform) and
  re-discretizing — no remembered shelf parameters anywhere, and the
  48 kHz round trip is exact by construction (pinned in tests). The
  spec's own conformance anchor — a 0 dBFS 997/1000 Hz sine reads
  -3.01 LKFS — is the analytic oracle, and it holds at 44.1/32/96 kHz
  through the derivation.
* **peak_dbfs / rms_dbfs**: sample peak and whole-file RMS in dB
  relative to full scale.
* **silence_ratio**: fraction of complete 100 ms frames whose RMS is
  below -60 dBFS.
* **zcr**: zero-crossing fraction of the mono mix (a pure f Hz tone
  measures 2f/rate).
* **spectral centroid / 85 % rolloff (Hz) / flatness**: Hann-windowed
  rFFT frames (N = 2048, hop N/2) on the mono mix; centroid and
  rolloff of a pure tone land on the tone's frequency to within a bin,
  flatness separates tones (→0) from broadband noise (→1).

Scale posture: this is a bounded per-file kernel like the rest of the
media tier — the Spark wiring (``multimodal.extract_audio_analysis``)
ships bytes to an Arrow batch once, emits a fixed-width feature row,
and nothing but features ever shuffles. The biquads run as an exact
direct-form-II-transposed recursion (documented slow path, same class
as full FLAC decode); everything else is vectorized numpy.

The reference has no audio surface at all (it is 507 LoC of CDC
plumbing); this module is beyond-reference corpus capability, public
knowledge only (ITU-R BS.1770-4, the RBJ cookbook, standard DSP).
"""

from __future__ import annotations

import math

import numpy as np

# The BS.1770-4 K-weighting stages as printed in the spec itself
# (Tables 1 and 2): digital biquad coefficients at 48 kHz. Other rates
# are derived from these below by mapping the published filter back to
# its analog prototype (inverse bilinear transform at 48 kHz) and
# re-discretizing at the stream's rate — exact at 48 kHz by
# construction, and the corner frequencies (<= ~1.7 kHz) sit far below
# Nyquist at any audio rate, so the unwarped mapping error is
# negligible (the 1 kHz conformance anchor holds at 44.1/32/96 kHz,
# pinned in tests).
_ITU48_SHELF_B = (1.53512485958697, -2.69169618940638, 1.19839281085285)
_ITU48_SHELF_A = (1.0, -1.69065929318241, 0.73248077421585)
_ITU48_HPF_B = (1.0, -2.0, 1.0)
_ITU48_HPF_A = (1.0, -1.99004745483398, 0.99007225036621)
_ITU_RATE = 48000

_ABS_GATE_LUFS = -70.0
_REL_GATE_LU = -10.0
_BLOCK_S = 0.400
_STEP_S = 0.100
# BS.1770-4 Table 3 channel weights: L, R, C at 1.0; Ls, Rs at 1.41;
# the LFE channel is EXCLUDED from the loudness measure. Channel
# meaning depends on position, which depends on the layout — mapped
# per channel COUNT below using the standard WAVE channel-mask
# orderings (ADVICE r9: a flat tuple put 1.41 on index 3, which in
# 5.1 WAV order is the LFE, inflating integrated LUFS for >=6-ch
# files).
_SURROUND_W = 1.41


def channel_weights(ch: int) -> list[float]:
    """BS.1770-4 per-channel weights for a ``ch``-channel stream in
    standard WAVE channel-mask order. Mono/stereo (the overwhelmingly
    common case) is exact per the spec; multichannel assumes the
    default mask for the count — 4: FL FR BL BR (quad), 5: FL FR FC
    BL BR, 6+: FL FR FC LFE BL BR [+ extra surrounds] — with LFE
    weighted 0.0 (excluded) and every surround at 1.41."""
    if ch <= 3:
        return [1.0] * ch  # L, R, C
    if ch == 4:
        return [1.0, 1.0, _SURROUND_W, _SURROUND_W]
    if ch == 5:
        return [1.0, 1.0, 1.0, _SURROUND_W, _SURROUND_W]
    return [1.0, 1.0, 1.0, 0.0, _SURROUND_W, _SURROUND_W] + [
        _SURROUND_W
    ] * (ch - 6)

_SILENCE_FRAME_S = 0.100
_SILENCE_RMS_DBFS = -60.0
_SPECTRAL_N = 2048
_SPECTRAL_MIN = 256


def _digital_to_analog(coeffs, fs: float) -> tuple[float, float, float]:
    """Quadratic (s^2, s^1, s^0) analog coefficients of a biquad's
    inverse bilinear image at sampling rate ``fs`` (z^-1 =
    (1 - s/K)/(1 + s/K), K = 2 fs; numerator and denominator map
    independently)."""
    c0, c1, c2 = coeffs
    k = 2.0 * fs
    return (c0 - c1 + c2) / (k * k), 2.0 * (c0 - c2) / k, c0 + c1 + c2


def _analog_to_digital(analog, fs: float) -> np.ndarray:
    """Forward bilinear transform of a quadratic (s^2, s^1, s^0) at
    rate ``fs`` back to (c0, c1, c2) digital form (unnormalized)."""
    s2, s1, s0 = analog
    k = 2.0 * fs
    return np.array(
        [
            s2 * k * k + s1 * k + s0,
            -2.0 * s2 * k * k + 2.0 * s0,
            s2 * k * k - s1 * k + s0,
        ]
    )


def k_weighting_coeffs(rate: int) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """(b1, a1, b2, a2) for the shelving and high-pass stages at
    ``rate``, a0-normalized. At 48 kHz these are the spec's own tables
    verbatim; elsewhere the published filter's analog prototype is
    re-discretized at ``rate`` (round trip at 48 kHz is exact, pinned
    in tests)."""
    if rate == _ITU_RATE:
        return (
            np.array(_ITU48_SHELF_B),
            np.array(_ITU48_SHELF_A),
            np.array(_ITU48_HPF_B),
            np.array(_ITU48_HPF_A),
        )
    out = []
    for b, a in ((_ITU48_SHELF_B, _ITU48_SHELF_A), (_ITU48_HPF_B, _ITU48_HPF_A)):
        bd = _analog_to_digital(_digital_to_analog(b, _ITU_RATE), rate)
        ad = _analog_to_digital(_digital_to_analog(a, _ITU_RATE), rate)
        out.append(bd / ad[0])
        out.append(ad / ad[0])
    return out[0], out[1], out[2], out[3]


def _biquad(x: np.ndarray, b: np.ndarray, a: np.ndarray) -> np.ndarray:
    """Exact direct-form-II-transposed second-order section (causal,
    zero initial state). Python recursion — the one loop this module
    keeps, because the IIR recurrence does not vectorize and the
    callers' inputs are bounded media files."""
    b0, b1v, b2v = float(b[0]), float(b[1]), float(b[2])
    a1v, a2v = float(a[1]), float(a[2])
    z1 = 0.0
    z2 = 0.0
    xl = x.tolist()
    yl = [0.0] * len(xl)
    for i, xi in enumerate(xl):
        yi = b0 * xi + z1
        z1 = b1v * xi - a1v * yi + z2
        z2 = b2v * xi - a2v * yi
        yl[i] = yi
    return np.asarray(yl, dtype=np.float64)


def k_weight(x: np.ndarray, rate: int) -> np.ndarray:
    """K-weighted copy of a mono float signal."""
    b1, a1, b2, a2 = k_weighting_coeffs(rate)
    return _biquad(_biquad(np.asarray(x, dtype=np.float64), b1, a1), b2, a2)


def integrated_lufs(x: np.ndarray, rate: int) -> float | None:
    """BS.1770-4 gated integrated loudness of ``x`` (n, ch) in float
    full-scale units. None when no 400 ms block survives the absolute
    gate (silence / sub-block-length input)."""
    x = np.asarray(x, dtype=np.float64)
    if x.ndim == 1:
        x = x[:, None]
    n, ch = x.shape
    block = int(round(_BLOCK_S * rate))
    step = int(round(_STEP_S * rate))
    if block <= 0 or n < block:
        return None
    weights = channel_weights(ch)
    # Per-channel K-weighting, then per-block mean squares via a
    # cumulative sum (one pass, every 75 %-overlapped block).
    n_blocks = (n - block) // step + 1
    weighted = np.zeros(n_blocks, dtype=np.float64)
    for c in range(ch):
        if weights[c] == 0.0:
            continue  # LFE: excluded from the measure, skip the filter
        y2 = k_weight(x[:, c], rate) ** 2
        cs = np.concatenate(([0.0], np.cumsum(y2)))
        starts = np.arange(n_blocks) * step
        zs = (cs[starts + block] - cs[starts]) / block
        weighted += weights[c] * zs
    with np.errstate(divide="ignore"):
        l_blocks = -0.691 + 10.0 * np.log10(weighted)
    keep = l_blocks > _ABS_GATE_LUFS
    if not keep.any():
        return None
    rel_thresh = -0.691 + 10.0 * math.log10(weighted[keep].mean()) + _REL_GATE_LU
    keep &= l_blocks > rel_thresh
    if not keep.any():
        return None
    return -0.691 + 10.0 * math.log10(weighted[keep].mean())


def _dbfs(v: float) -> float | None:
    return 20.0 * math.log10(v) if v > 0.0 else None


def silence_ratio(x: np.ndarray, rate: int) -> float | None:
    """Fraction of complete 100 ms frames with RMS below -60 dBFS
    (RMS over all channels). None when the input is shorter than one
    frame."""
    x = np.asarray(x, dtype=np.float64)
    if x.ndim == 1:
        x = x[:, None]
    frame = int(round(_SILENCE_FRAME_S * rate))
    n_frames = x.shape[0] // frame if frame > 0 else 0
    if n_frames == 0:
        return None
    trimmed = x[: n_frames * frame] ** 2
    per_frame = trimmed.reshape(n_frames, frame, x.shape[1]).mean(axis=(1, 2))
    thresh = (10.0 ** (_SILENCE_RMS_DBFS / 20.0)) ** 2
    return float((per_frame < thresh).mean())


def zero_crossing_rate(x: np.ndarray) -> float | None:
    """Sign-transition fraction of the mono mix (>= 0 counts as
    positive): a pure f Hz tone at ``rate`` measures 2f/rate."""
    x = np.asarray(x, dtype=np.float64)
    m = x.mean(axis=1) if x.ndim == 2 else x
    if m.shape[0] < 2:
        return None
    pos = m >= 0.0
    return float((pos[1:] != pos[:-1]).mean())


def spectral_features(x: np.ndarray, rate: int) -> tuple[float, float, float] | None:
    """(centroid_hz, rolloff85_hz, flatness) over Hann-windowed rFFT
    frames of the mono mix. None for inputs shorter than 256 samples."""
    x = np.asarray(x, dtype=np.float64)
    m = x.mean(axis=1) if x.ndim == 2 else x
    n = m.shape[0]
    if n < _SPECTRAL_MIN:
        return None
    size = min(_SPECTRAL_N, 1 << (n.bit_length() - 1))
    hop = size // 2
    window = np.hanning(size)
    n_frames = (n - size) // hop + 1
    starts = np.arange(n_frames) * hop
    frames = m[starts[:, None] + np.arange(size)] * window
    power = np.abs(np.fft.rfft(frames, axis=1)) ** 2
    freqs = np.fft.rfftfreq(size, 1.0 / rate)

    total = power.sum()
    if total <= 0.0:
        return None
    agg = power.sum(axis=0)
    centroid = float((freqs * agg).sum() / agg.sum())
    cum = np.cumsum(agg)
    rolloff = float(freqs[np.searchsorted(cum, 0.85 * cum[-1])])
    # Per-frame flatness (geometric / arithmetic mean of the power
    # spectrum), averaged over frames with any energy.
    eps = 1e-30
    fr_total = power.sum(axis=1)
    live = fr_total > 0.0
    p = power[live] + eps
    flat = float(np.mean(np.exp(np.mean(np.log(p), axis=1)) / np.mean(p, axis=1)))
    return centroid, rolloff, flat


def analyze_pcm(samples: np.ndarray, rate: int, bits: int) -> dict:
    """All content measures for integer PCM ``samples`` (n, ch) at
    ``bits`` depth. Keys match multimodal.AUDIO_ANALYSIS_SCHEMA."""
    samples = np.asarray(samples)
    if samples.ndim == 1:
        samples = samples[:, None]
    x = samples.astype(np.float64) / float(1 << (bits - 1))
    n = x.shape[0]
    peak = _dbfs(float(np.abs(x).max())) if n else None
    rms = _dbfs(float(np.sqrt((x**2).mean()))) if n else None
    spec = spectral_features(x, rate) if n else None
    return {
        "lufs": integrated_lufs(x, rate) if n else None,
        "peak_dbfs": peak,
        "rms_dbfs": rms,
        "silence_ratio": silence_ratio(x, rate) if n else None,
        "zcr": zero_crossing_rate(x) if n else None,
        "spectral_centroid_hz": spec[0] if spec else None,
        "spectral_rolloff_hz": spec[1] if spec else None,
        "spectral_flatness": spec[2] if spec else None,
    }


# --- Landmark (constellation) fingerprint ---------------------------------
#
# The spectral-peak pairing scheme of Wang's landmark paper (the
# public "industrial-strength audio search" design): constellation
# peaks survive volume changes, codec noise, and — unlike the
# envelope fingerprints in opus.py/multimodal.audio_fingerprint —
# TIME SHIFTS, because matches vote on a consistent offset rather
# than comparing aligned windows. Peaks and hashes are pure numpy;
# the Spark side joins (hash) longs and votes on (pair, dt) — audio
# bytes never cross the wire.

_LM_NFFT = 1024
_LM_HOP = 512
_LM_PEAKS_PER_FRAME = 3
_LM_FAN_OUT = 5
_LM_MAX_DT = 64  # frames an anchor may pair ahead


def spectral_peaks(
    x: np.ndarray,
    rate: int,
    n_fft: int = _LM_NFFT,
    hop: int = _LM_HOP,
    peaks_per_frame: int = _LM_PEAKS_PER_FRAME,
) -> list[tuple[int, int]]:
    """(frame_idx, bin) constellation: per Hann-windowed frame, the
    top-k bins that are LOCAL maxima (greater than both neighbors),
    excluding DC. Amplitude-invariant by construction — scaling the
    signal scales every magnitude equally."""
    x = np.asarray(x, dtype=np.float64)
    m = x.mean(axis=1) if x.ndim == 2 else x
    n = m.shape[0]
    if n < n_fft:
        return []
    window = np.hanning(n_fft)
    n_frames = (n - n_fft) // hop + 1
    starts = np.arange(n_frames) * hop
    frames = m[starts[:, None] + np.arange(n_fft)] * window
    mag = np.abs(np.fft.rfft(frames, axis=1))
    # local-maximum mask over the bin axis (exclude DC and Nyquist)
    inner = mag[:, 1:-1]
    is_peak = (inner > mag[:, :-2]) & (inner >= mag[:, 2:]) & (inner > 0)
    out: list[tuple[int, int]] = []
    for t in range(n_frames):
        bins = np.nonzero(is_peak[t])[0] + 1
        if bins.size == 0:
            continue
        top = bins[np.argsort(mag[t, bins])[::-1][:peaks_per_frame]]
        out.extend((t, int(b)) for b in np.sort(top))
    return out


def landmark_hashes(
    peaks: list[tuple[int, int]],
    fan_out: int = _LM_FAN_OUT,
    max_dt: int = _LM_MAX_DT,
) -> list[tuple[int, int]]:
    """(hash, t1) landmarks: each anchor peak pairs with up to
    ``fan_out`` later peaks within ``max_dt`` frames; the hash packs
    (bin1, bin2, dt) — fully describing the local geometry, so a
    matching hash at offset dt in another clip is strong evidence."""
    out: list[tuple[int, int]] = []
    n = len(peaks)
    for i, (t1, b1) in enumerate(peaks):
        paired = 0
        for j in range(i + 1, n):
            t2, b2 = peaks[j]
            dt = t2 - t1
            if dt == 0:
                continue
            if dt > max_dt:
                break
            out.append(((b1 << 22) | (b2 << 12) | dt, t1))
            paired += 1
            if paired >= fan_out:
                break
    return out


# --- MPEG-1 Layer I/II subband synthesis (round 10) --------------------------
#
# Turns the requantized subband samples codecs.mp3_l12_subband_samples
# decodes into PCM, so the content gates (LUFS / silence) stop
# refusing Layer I/II audio. The filterbank MATH is the documented
# MPEG-1 pseudo-QMF: analysis filters h_k[n] = C[n]·cos((2k+1)(n−16)π/64)
# over 512 taps, synthesis the time-reversed match (whose phase
# reduces to +17 mod the cosine's period). The 512-tap PROTOTYPE is
# the one thing this module does NOT transcribe from the spec's
# printed table: it is DERIVED — a Kaiser(β=9)-windowed ideal lowpass
# at the π/64 band edge, normalized to unit passband gain, the same
# design family the standard's own window comes from. Consequences,
# measured and pinned in tests/test_audio_analysis.py:
#
# * through this module's own analysis twin (the fixture path) the
#   pair is near-perfect-reconstruction (~40 dB SNR, gain 0.9992);
# * against a REAL encoder's subbands (standard prototype) the
#   mismatch adds aliasing at roughly the pair's SNR floor — an
#   energy-domain error orders of magnitude below the ±1 dB the
#   loudness/silence gates resolve (LUFS error ≲ 0.05 dB);
# * absolute scale is anchored by the standard's own quantizer range:
#   full-scale PCM produces subband samples near ±1 (the (-2, 2) code
#   range), which unit analysis passband gain reproduces — so the
#   synthesis gain calibrates against the spec contract, not against
#   a remembered table.
#
# Layer III decodes for real since round 11 (``mp3_l3.py``: side info,
# bit reservoir, Huffman spectrum for the transcribed-table registry,
# requantize, stereo, alias reduction, IMDCT — feeding this same
# polyphase bank); streams selecting untranscribed B.7 tables refuse
# by name, with the PyAV seam as the real-world fallback path.

_L12_TAPS = 512
_L12_SYNTH_PHASE = 17  # time-reversed analysis phase: 512-1-n-16 ≡ n+17


def _l12_prototype() -> np.ndarray:
    """Square-root-raised-cosine prototype: |H| = 1 in the passband,
    cos(πs/2) across a transition centered at the π/64 band edge
    (half-width 0.5·π/64), zero beyond — POWER-COMPLEMENTARY at the
    band boundary (cos² + sin² = 1), which is exactly the condition
    pseudo-QMF adjacent-band alias cancellation needs; a plain
    windowed sinc measured ~20 dB reconstruction at band-edge tones
    vs ~35-46 dB for this design. Frequency-sampled, linear phase,
    truncated to 512 taps, unit DC gain."""
    M = 16384
    w = np.arange(M // 2 + 1) * (2.0 * np.pi / M)
    wc = np.pi / 64.0
    d = 0.5 * wc
    H = np.zeros(M // 2 + 1)
    H[w <= wc - d] = 1.0
    tr = (w > wc - d) & (w < wc + d)
    s = (w[tr] - (wc - d)) / (2.0 * d)
    H[tr] = np.cos(np.pi * s / 2.0)
    ph = np.exp(-1j * w * (_L12_TAPS - 1) / 2.0)
    h = np.fft.irfft(H * ph, M)[:_L12_TAPS]
    return h / h.sum()


_L12_BANKS: dict = {}


def _l12_synth_bank() -> np.ndarray:
    """G[i, k, j] = g_k[32 i + j]: the synthesis filters in polyphase
    layout — out[32t + j] = Σ_i Σ_k S[t − i, k] · G[i, k, j]."""
    if "G" not in _L12_BANKS:
        h = _l12_prototype()
        n = np.arange(_L12_TAPS)
        k = np.arange(32)
        g = 64.0 * h[None, :] * np.cos(
            (2 * k[:, None] + 1) * (n[None, :] + _L12_SYNTH_PHASE) * np.pi / 64.0
        )
        _L12_BANKS["G"] = np.ascontiguousarray(
            g.reshape(32, 16, 32).transpose(1, 0, 2)
        )
    return _L12_BANKS["G"]


def l12_synthesis(sb: np.ndarray) -> np.ndarray:
    """Subband samples (T, 32) or (T, 32, ch) → PCM float in ~[-1, 1],
    (T*32,) or (T*32, ch). Vectorized: 16 shifted matmuls against the
    polyphase bank."""
    sb = np.asarray(sb, dtype=np.float64)
    if sb.ndim == 3:
        chans = [l12_synthesis(sb[:, :, c]) for c in range(sb.shape[2])]
        return np.stack(chans, axis=1)
    if sb.ndim != 2 or sb.shape[1] != 32:
        raise ValueError(f"subband array must be (T, 32[, ch]), got {sb.shape}")
    G = _l12_synth_bank()
    T = sb.shape[0]
    out = np.zeros((T, 32))
    for i in range(16):
        if T - i <= 0:
            break
        out[i:] += sb[: T - i] @ G[i]
    return out.reshape(-1)


def l12_analysis(x: np.ndarray) -> np.ndarray:
    """The analysis twin (FIXTURE/test side only — real streams were
    analyzed by the encoder): mono float PCM → (len(x)//32, 32)
    subband samples through h_k[n] = C[n]·cos((2k+1)(n−16)π/64) with
    the same derived prototype at unit passband gain (2·h)."""
    x = np.asarray(x, dtype=np.float64)
    if x.ndim != 1:
        raise ValueError("l12_analysis takes mono (n,) PCM")
    h = 2.0 * _l12_prototype()
    n = np.arange(_L12_TAPS)
    T = len(x) // 32
    out = np.empty((T, 32))
    for k in range(32):
        hk = h * np.cos((2 * k + 1) * (n - 16) * np.pi / 64.0)
        out[:, k] = np.convolve(x, hk)[: T * 32 : 32]
    return out
