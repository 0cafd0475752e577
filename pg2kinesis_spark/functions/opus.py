"""Opus energy-envelope decode for the audio fingerprint tier.

Extends the MP3 Layer III proxy discipline (``codecs.py`` — side-info
``global_gain`` without Huffman/IMDCT synthesis) to Ogg Opus: an Opus
stream's amplitude envelope is recoverable from symbols that sit at the
FRONT of each frame's range-coded payload, long before the expensive
residual/PVQ machinery —

* **SILK frames** (configs 0–11 and the hybrid 12–15, RFC 6716 §4.2):
  header VAD/LBRR bits, the frame-type symbol, then the per-subframe
  quantization GAINS — decoded through a real range decoder (§4.1
  layout: ``ec_decode``/``ec_dec_update``/``ec_dec_icdf``) with the
  RFC's OWN probability tables, transcribed below: the frame-type
  iCDFs (§4.2.7.3), the per-signal-class independent gain MSB iCDFs +
  uniform-8 LSB (§4.2.7.4), the 41-symbol delta-gain iCDF, and the
  stereo-weight layout (§4.2.7.1: one 25-way joint symbol plus a
  uniform-3 and uniform-5 refinement per weight) with the mid-only
  flag's iCDF (§4.2.7.2). Dequantization follows the RFC rules:
  ``log_gain = max(ind0, prev - 16)`` for an independently-coded
  first subframe, ``clamp(max(2*ind - 16, prev + ind - 4), 0, 63)``
  for delta-coded subframes (the double-step escape), the decoder
  state threading across packets exactly like ``LastGainIndex``
  (reset value 10), and the log-to-linear mapping
  ``2**((0x1D1C71*lg >> 16) + 2090)/128 - 16)`` — the quantizer's
  documented ~1.369 dB steps spanning ~2..88 dB. A real-world
  libopus SILK or hybrid stream therefore yields its TRUE gain
  envelope (proof against an external encoder is seam-gated in
  tests/test_opus.py, same discipline as ``fast_image_decoder``).
* **CELT frames** (configs 16–31, §4.3): the flag walk and the
  Laplace coder follow the RFC structure (silence/post-filter with
  its uint-coded octave + tapset iCDF/transient/intra flags, then
  per-band coarse energy with the geometric-then-minimum-probability
  interval layout and the prediction leak), but the per-band
  probability BYTES stand in for the reference's ``e_prob_model``
  (336 values this module does not transcribe). Real-world CELT
  streams would decode structurally into meaningless values, so they
  REFUSE (NotImplementedError → the caller's quarantine channel)
  unless the container carries this module's fixture marker (the
  OpusTags vendor string / WebM WritingApp written by the fixture
  encoders below). Swapping the RFC's e_prob_model bytes in and
  lifting that gate completes real-stream CELT support with no
  structural change.

What this is NOT: a PCM decoder. Stereo SILK walks the MID channel
(the mono mix — exactly the envelope the fingerprint wants) after
stepping the stereo-weight symbols; unsupported layouts (stereo CELT,
surround, 40/60 ms SILK packets, LBRR redundancy, Vorbis) refuse
loudly and take the quarantine channel upstream.

Self-consistency is pinned by round trips (tests/test_opus.py,
hypothesis fuzz incl. carry-cascade patterns in the range coder)
against the pure-arithmetic quantizer mirrors
(``silk_quantize_envelope`` / ``celt_quantize_envelope``), and the
planted-pair truth: a re-encode and a half-volume re-encode of the
same envelope must land at Hamming ≤ threshold in
``media_near_dup_pairs(signature="audio")``.
"""

from __future__ import annotations

import struct

import numpy as np

# --- range coder (RFC 6716 §4.1 layout) -----------------------------------
#
# 32-bit state, 8-bit symbols, 7 extra code bits: rng renormalizes at
# 2^23, values live below 2^31. The decoder consumes bytes MSB-first
# with the RFC's odd-looking complement (val tracks the DISTANCE to the
# top of the current interval); the encoder mirrors it with classic
# carry counting (rem + a run of 0xFF bytes that a carry flips to 0x00).

_SYM_BITS = 8
_CODE_BITS = 32
_CODE_EXTRA = 7
_CODE_TOP = 1 << (_CODE_BITS - 1)
_CODE_BOT = _CODE_TOP >> _SYM_BITS
_CODE_SHIFT = _CODE_BITS - _SYM_BITS - 1
_SYM_MAX = (1 << _SYM_BITS) - 1


class RangeDecoder:
    __slots__ = ("buf", "pos", "rng", "val", "rem", "ext")

    def __init__(self, buf: bytes) -> None:
        self.buf = buf
        self.pos = 0
        self.rem = self._byte()
        self.rng = 1 << _CODE_EXTRA
        self.val = self.rng - 1 - (self.rem >> (_SYM_BITS - _CODE_EXTRA))
        self.ext = 0
        self._normalize()

    def _byte(self) -> int:
        b = self.buf[self.pos] if self.pos < len(self.buf) else 0
        self.pos += 1
        return b

    def _normalize(self) -> None:
        while self.rng <= _CODE_BOT:
            self.rng <<= _SYM_BITS
            sym = self.rem
            self.rem = self._byte()
            sym = ((sym << _SYM_BITS) | self.rem) >> (_SYM_BITS - _CODE_EXTRA)
            self.val = (
                (self.val << _SYM_BITS) + (_SYM_MAX & ~sym)
            ) & (_CODE_TOP - 1)

    def decode(self, ft: int) -> int:
        """Current cumulative-frequency estimate in [0, ft)."""
        self.ext = self.rng // ft
        s = self.val // self.ext
        return ft - min(s + 1, ft)

    def update(self, fl: int, fh: int, ft: int) -> None:
        s = self.ext * (ft - fh)
        self.val -= s
        self.rng = self.ext * (fh - fl) if fl > 0 else self.rng - s
        self._normalize()

    def dec_icdf(self, icdf, ftb: int) -> int:
        """Symbol from an inverse-CDF table: icdf[k] = ft - cdf(k+1),
        scaled to ft = 2**ftb; the table is non-increasing, last = 0."""
        s = self.rng
        r = s >> ftb
        k = -1
        while True:
            t = s
            k += 1
            s = r * icdf[k]
            if self.val >= s:
                break
        self.val -= s
        self.rng = t - s
        self._normalize()
        return k

    def dec_bit_logp(self, logp: int) -> int:
        """One binary symbol with P(1) = 2**-logp (the flag coder)."""
        r = self.rng
        d = self.val
        s = r >> logp
        ret = d < s
        if ret:
            self.rng = s
        else:
            self.val = d - s
            self.rng = r - s
        self._normalize()
        return int(ret)

    def dec_bits(self, n: int) -> int:
        """n raw (uniform) bits through the range coder."""
        out = 0
        for _ in range(n):
            out = (out << 1) | self.dec_bit_logp(1)
        return out

    def dec_uint(self, ft: int) -> int:
        """A uniformly-distributed integer in [0, ft) (the ec_dec_uint
        small-ft path — one symbol; this module never needs ft > 256)."""
        t = self.decode(ft)
        self.update(t, t + 1, ft)
        return t


class RangeEncoder:
    __slots__ = ("out", "low", "rng", "rem", "ext")

    def __init__(self) -> None:
        self.out = bytearray()
        self.low = 0
        self.rng = _CODE_TOP
        self.rem = -1  # no byte pending yet
        self.ext = 0  # run of 0xFF bytes a carry may flip

    def _carry_out(self, c: int) -> None:
        if c != _SYM_MAX:
            carry = c >> _SYM_BITS
            if self.rem >= 0:
                self.out.append((self.rem + carry) & 0xFF)
            while self.ext > 0:
                self.out.append((_SYM_MAX + carry) & 0xFF)
                self.ext -= 1
            self.rem = c & _SYM_MAX
        else:
            self.ext += 1

    def _normalize(self) -> None:
        while self.rng <= _CODE_BOT:
            self._carry_out(self.low >> _CODE_SHIFT)
            self.low = (self.low << _SYM_BITS) & (_CODE_TOP - 1)
            self.rng <<= _SYM_BITS

    def encode(self, fl: int, fh: int, ft: int) -> None:
        if not 0 <= fl < fh <= ft:
            raise ValueError(f"empty coding interval [{fl}, {fh}) of {ft}")
        r = self.rng // ft
        if fl > 0:
            self.low += self.rng - r * (ft - fl)
            self.rng = r * (fh - fl)
        else:
            self.rng -= r * (ft - fh)
        self._normalize()

    def enc_icdf(self, k: int, icdf, ftb: int) -> None:
        ft = 1 << ftb
        fl = ft - icdf[k - 1] if k > 0 else 0
        fh = ft - icdf[k]
        self.encode(fl, fh, ft)

    def enc_bit_logp(self, bit: int, logp: int) -> None:
        # the decoder's val is the RFC's distance-to-top complement, so
        # the '1' interval that reads as [0, s) in val-space is the TOP
        # of low-space: low += r - s
        r = self.rng
        s = r >> logp
        if bit:
            self.low += r - s
            self.rng = s
        else:
            self.rng = r - s
        self._normalize()

    def enc_bits(self, val: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.enc_bit_logp((val >> i) & 1, 1)

    def enc_uint(self, t: int, ft: int) -> None:
        self.encode(t, t + 1, ft)

    def done(self) -> bytes:
        """Flush: emit enough of low to make decoding unambiguous."""
        # push out 4 full renormalizations — any value in [low, low+rng)
        # decodes correctly, and low itself always is
        for _ in range(_CODE_BITS // _SYM_BITS + 1):
            self._carry_out(self.low >> _CODE_SHIFT)
            self.low = (self.low << _SYM_BITS) & (_CODE_TOP - 1)
        if self.rem >= 0:
            self.out.append(self.rem & 0xFF)
        while self.ext > 0:
            self.out.append(0xFF)
            self.ext -= 1
        return bytes(self.out)


# --- SILK symbol tables (transcribed from RFC 6716) -------------------------
#
# icdf rows with ft = 256: icdf[k] = 256 - cdf(k+1), non-increasing,
# terminal 0. These are the RFC's published tables for every symbol the
# gain walk touches (silk_type_offset_*_iCDF, silk_gain_iCDF,
# silk_uniform{3,5,8}_iCDF, silk_delta_gain_iCDF,
# silk_stereo_pred_joint_iCDF, silk_stereo_only_code_mid_iCDF).

# frame type (§4.2.7.3): VAD-inactive → {inactive, inactive+offset};
# VAD-active → {unvoiced-low, unvoiced-high, voiced-low, voiced-high}
_ICDF_TYPE_NO_VAD = (230, 0)
_ICDF_TYPE_VAD = (232, 158, 10, 0)
# independent gain MSB per signal class (§4.2.7.4, 8 symbols each)
_ICDF_GAIN_MSB = {
    0: (224, 112, 44, 15, 3, 2, 1, 0),  # inactive
    1: (254, 237, 192, 132, 70, 23, 4, 0),  # unvoiced
    2: (243, 192, 123, 64, 48, 15, 4, 0),  # voiced
}
_ICDF_GAIN_LSB = (224, 192, 160, 128, 96, 64, 32, 0)  # uniform 8
# delta gain (41 symbols): strong peak at symbol 4 (= hold)
_ICDF_GAIN_DELTA = (
    250, 245, 234, 203, 71, 50, 42, 38, 35, 33, 31, 29, 28, 27, 26, 25,
    24, 23, 22, 21, 20, 19, 18, 17, 16, 15, 14, 13, 12, 11, 10, 9,
    8, 7, 6, 5, 4, 3, 2, 1, 0,
)
# stereo prediction weights (§4.2.7.1): one joint symbol over the 25
# (w0,w1) quantization pairs, then per weight a uniform-3 and a
# uniform-5 refinement — decoded to SKIP them (the envelope wants the
# mid gains, and the mid IS the mono mix)
_ICDF_STEREO_JOINT = (
    249, 247, 246, 245, 244, 234, 210, 202, 201, 200, 197, 174, 82,
    59, 56, 55, 54, 46, 22, 12, 11, 10, 9, 7, 0,
)
_ICDF_UNIFORM3 = (171, 85, 0)
_ICDF_UNIFORM5 = (205, 154, 102, 51, 0)
# mid-only flag (§4.2.7.2) — coded only when the side channel's VAD
# flag is inactive for the frame
_ICDF_MID_ONLY = (64, 0)

# --- SILK gain dequantization (§4.2.7.4) -------------------------------------
#
# Gain indices live in [0, 63]; the log-to-linear mapping is the RFC's
# silk_log2lin((0x1D1C71 * log_gain >> 16) + 2090) — ~1.369 dB per
# step spanning ~2..88 dB (here in exact floats: the envelope compares
# window-energy ORDER, so the reference's piecewise-parabolic 2**x
# approximation cancels). The delta rules and the cross-packet state
# (LastGainIndex, reset value 10) are transcribed verbatim.

_GAIN_STEP_Q16 = 0x1D1C71
_GAIN_OFFSET_Q7 = 2090
_GAIN_RESET_IND = 10  # the SILK decoder's LastGainIndex reset value
_N_GAIN_LEVELS = 64


def _silk_gain_log2(log_gain: int) -> float:
    return (((_GAIN_STEP_Q16 * log_gain) >> 16) + _GAIN_OFFSET_Q7) / 128.0 - 16.0


_GAIN_LOG2 = np.array([_silk_gain_log2(i) for i in range(_N_GAIN_LEVELS)])
_GAIN_LINEAR = 2.0 ** _GAIN_LOG2


def _gain_first(ind0: int, prev_ind: int) -> int:
    """Independently-coded first subframe: the index can't fall more
    than 16 notches below the previous frame's last gain."""
    return max(ind0, prev_ind - 16)


def _gain_delta(delta: int, prev_ind: int) -> int:
    """Delta-coded subframe: ±4-notch moves around hold (symbol 4),
    with the 2*ind-16 double-step escape for large upward jumps."""
    return min(max(max(2 * delta - 16, prev_ind + delta - 4), 0), 63)


def _quantize_gain_index(e: float) -> int:
    """Nearest gain index in the log domain (scale-shift friendly)."""
    return int(np.argmin(np.abs(_GAIN_LOG2 - np.log2(max(e, 1e-12)))))


def _plan_silk_gains(
    target_lg: int, prev_ind: int, n_sub: int
) -> tuple[int, list[int], list[int], int]:
    """(ind0, deltas, realized gain indices, new prev) for one frame —
    the single mirror behind the fixture encoder AND
    ``silk_quantize_envelope``, so the construction-side truth and the
    wire bytes can never drift apart. Deltas prefer hold (symbol 4)
    among equally-close options; the realized indices are whatever the
    RFC dequant rules produce for the chosen symbols (a >16-notch fall
    across an independent frame boundary saturates, exactly like the
    real codec)."""
    ind0 = target_lg
    cur = _gain_first(ind0, prev_ind)
    realized = [cur]
    deltas: list[int] = []
    order = sorted(range(41), key=lambda d: abs(d - 4))
    for _ in range(n_sub - 1):
        d = min(order, key=lambda dd: abs(_gain_delta(dd, cur) - target_lg))
        cur = _gain_delta(d, cur)
        deltas.append(d)
        realized.append(cur)
    return ind0, deltas, realized, cur


def silk_quantize_envelope(energies, frame_ms: int = 20) -> np.ndarray:
    """The envelope ``opus_energy_envelope`` returns for
    ``encode_ogg_opus_envelope(energies, mode='silk', ...)`` — pure
    quantizer arithmetic (no range coding): the independent
    construction-side truth for round-trip tests."""
    n_sub = 2 if frame_ms == 10 else 4
    prev = _GAIN_RESET_IND
    out: list[float] = []
    for e in np.asarray(energies, dtype=np.float64):
        if e == 0.0:
            continue  # DTX packet: no envelope samples
        target = _quantize_gain_index(e)
        _i, _d, realized, prev = _plan_silk_gains(target, prev, n_sub)
        out.extend(float(_GAIN_LINEAR[lg]) for lg in realized)
    return np.asarray(out, dtype=np.float64)


# --- CELT coarse-energy model (§4.3.2) ---------------------------------------
#
# The Laplace coder's interval layout is the RFC's: value 0 owns
# [0, fs0); ±k pairs walk outward with widths fs1 = ((32768 -
# 2*NMIN*MINP - fs0)*(16384 - decay) >> 15) + MINP then w' =
# ((w - 2*MINP)*decay >> 15) + MINP, and once w hits MINP everything
# beyond has probability MINP per value. The per-band probability
# BYTES below are module-owned stand-ins for e_prob_model (wired
# fs0 = prob<<7 / decay = decay<<6 exactly as the real model is), so
# real-world CELT streams REFUSE upstream (fixture-marker gate) until
# the RFC's bytes are swapped in.

_N_BANDS = 21
_LAPLACE_MINP = 1
_LAPLACE_NMIN = 16
_TAPSET_ICDF = (2, 1, 0)  # post-filter tapset
_CELT_BETA_INTRA = 4915.0 / 32768.0  # intra prediction leak

# module-owned (prob, decay) bytes per band — NOT RFC 6716's e_prob_model
_CELT_PROB_INTRA = tuple(
    (max(70 - 2 * b, 20), min(172 + 3 * b, 251)) for b in range(_N_BANDS)
)
_CELT_PROB_INTER = tuple(
    (max(94 - 2 * b, 24), min(141 + 4 * b, 251)) for b in range(_N_BANDS)
)


def _laplace_fs1(fs0: int, decay: int) -> int:
    ft = 32768 - 2 * _LAPLACE_NMIN * _LAPLACE_MINP - fs0
    return ((ft * (16384 - decay)) >> 15) + _LAPLACE_MINP


def _laplace_next(w: int, decay: int) -> int:
    return (((w - 2 * _LAPLACE_MINP) * decay) >> 15) + _LAPLACE_MINP


def _laplace_decode(dec: RangeDecoder, fs: int, decay: int) -> int:
    fm = dec.decode(32768)
    if fm < fs:
        lo, hi, val = 0, fs, 0
    else:
        lo = fs
        w = _laplace_fs1(fs, decay)
        k = 1
        while w > _LAPLACE_MINP and fm >= lo + 2 * w:
            lo += 2 * w
            w = _laplace_next(w, decay)
            k += 1
        if w == _LAPLACE_MINP:
            di = (fm - lo) >> 1
            k += di
            lo += 2 * di
        if fm < lo + w:
            val, hi = -k, lo + w
        else:
            val, lo = k, lo + w
            hi = lo + w
        hi = min(hi, 32768)
    dec.update(lo, hi, 32768)
    return val


def _laplace_encode(enc: RangeEncoder, value: int, fs: int, decay: int) -> int:
    """Encode ``value`` (saturating where the layout runs out of room);
    returns the value actually coded — callers must use it for their
    prediction state."""
    if value == 0:
        enc.encode(0, fs, 32768)
        return 0
    sign = -1 if value < 0 else 1
    mag = abs(value)
    lo = fs
    w = _laplace_fs1(fs, decay)
    k = 1
    while k < mag and w > _LAPLACE_MINP and lo + 2 * w <= 32768 - 2:
        lo += 2 * w
        w = _laplace_next(w, decay)
        k += 1
    if w == _LAPLACE_MINP and k < mag:
        room = (32768 - lo - 2) // 2
        di = min(mag - k, room)
        k += di
        lo += 2 * di
    if sign < 0:
        fl, fh = lo, lo + w
    else:
        fl, fh = lo + w, min(lo + 2 * w, 32768)
    enc.encode(fl, fh, 32768)
    return sign * k


def _celt_prob(band: int, intra: int) -> tuple[int, int]:
    p, d = (_CELT_PROB_INTRA if intra else _CELT_PROB_INTER)[band]
    return p << 7, d << 6


# --- TOC / frame splitting (§3.1–3.2) ---------------------------------------

_FRAME_MS = {  # config → frame duration in ms
    **{c: (10, 20, 40, 60)[c & 3] for c in range(12)},  # SILK NB/MB/WB
    **{c: (10, 20)[c & 1] for c in (12, 13, 14, 15)},  # hybrid
    **{c: (2.5, 5, 10, 20)[c & 3] for c in range(16, 32)},  # CELT
}


def opus_packet_frames(pkt: bytes) -> tuple[int, bool, list[bytes]]:
    """(config, stereo, frames) per RFC 6716 §3.2 — codes 0-3 with CBR
    and VBR layouts, padding honored."""
    if not pkt:
        raise ValueError("empty Opus packet")
    toc = pkt[0]
    config, stereo, code = toc >> 3, bool((toc >> 2) & 1), toc & 3
    body = pkt[1:]

    def read_len(b: bytes, at: int) -> tuple[int, int]:
        if at >= len(b):
            raise ValueError("truncated Opus frame length")
        v = b[at]
        if v < 252:
            return v, at + 1
        if at + 1 >= len(b):
            raise ValueError("truncated Opus frame length")
        return v + 4 * b[at + 1], at + 2

    if code == 0:
        frames = [body]
    elif code == 1:
        if len(body) % 2:
            raise ValueError("code-1 packet with odd payload")
        h = len(body) // 2
        frames = [body[:h], body[h:]]
    elif code == 2:
        n1, at = read_len(body, 0)
        if at + n1 > len(body):
            raise ValueError("code-2 frame overruns packet")
        frames = [body[at : at + n1], body[at + n1 :]]
    else:  # code 3
        if not body:
            raise ValueError("empty code-3 packet")
        fc = body[0]
        m = fc & 0x3F
        vbr, pad = bool(fc & 0x80), bool(fc & 0x40)
        if not 1 <= m <= 48:
            raise ValueError(f"code-3 frame count {m} out of range")
        at = 1
        pad_len = 0
        if pad:
            while True:
                if at >= len(body):
                    raise ValueError("truncated code-3 padding length")
                p = body[at]
                at += 1
                pad_len += p if p < 255 else 254
                if p != 255:
                    break
        end = len(body) - pad_len
        if vbr:
            lens = []
            for _ in range(m - 1):
                ln, at = read_len(body, at)
                lens.append(ln)
            frames = []
            for ln in lens:
                frames.append(body[at : at + ln])
                at += ln
            if at > end:
                raise ValueError("code-3 VBR frames overrun packet")
            frames.append(body[at:end])
        else:
            if (end - at) % m:
                raise ValueError("code-3 CBR payload not divisible")
            ln = (end - at) // m
            frames = [body[at + i * ln : at + (i + 1) * ln] for i in range(m)]
    return config, stereo, frames


# --- per-frame energy walks --------------------------------------------------


def _silk_frame_gains(
    frame: bytes, frame_ms: int, stereo: bool = False, prev_ind: int = _GAIN_RESET_IND
) -> tuple[list[float], int]:
    """(subframe linear gains, new LastGainIndex) of a single SILK
    frame (§4.2): VAD flag(s), LBRR flag(s), then — for stereo — the
    stereo prediction weights (joint + two refinements per weight) and
    the mid-only flag (coded only when the side VAD is inactive), then
    the frame-type symbol and the gains: independent MSB (signal-class
    icdf) + 3 uniform LSBs for subframe 0, delta icdf after, all
    dequantized by the RFC rules against ``prev_ind``. 10 ms → 2
    subframes, 20 ms → 4. Stereo returns the MID channel's gains —
    the mid IS the mono mix, exactly the envelope the fingerprint
    wants; the side channel's gains sit behind the mid frame's full
    residual and stay un-walked."""
    dec = RangeDecoder(frame)
    vad = dec.dec_bit_logp(1)
    if dec.dec_bit_logp(1):  # mid LBRR
        raise NotImplementedError("SILK LBRR redundancy not walked")
    if stereo:
        side_vad = dec.dec_bit_logp(1)
        if dec.dec_bit_logp(1):  # side LBRR
            raise NotImplementedError("SILK LBRR redundancy not walked")
        dec.dec_icdf(_ICDF_STEREO_JOINT, 8)  # joint (w0, w1) index
        for _w in range(2):
            dec.dec_icdf(_ICDF_UNIFORM3, 8)  # per-weight refinement 1
            dec.dec_icdf(_ICDF_UNIFORM5, 8)  # per-weight refinement 2
        if not side_vad:
            dec.dec_icdf(_ICDF_MID_ONLY, 8)  # mid-only flag (§4.2.7.2)
    if vad:
        ftype = dec.dec_icdf(_ICDF_TYPE_VAD, 8)
        signal = 1 + (ftype >> 1)  # 1 unvoiced, 2 voiced
    else:
        dec.dec_icdf(_ICDF_TYPE_NO_VAD, 8)
        signal = 0
    n_sub = 2 if frame_ms == 10 else 4
    gains: list[float] = []
    for i in range(n_sub):
        if i == 0:
            msb = dec.dec_icdf(_ICDF_GAIN_MSB[signal], 8)
            lsb = dec.dec_icdf(_ICDF_GAIN_LSB, 8)
            prev_ind = _gain_first((msb << 3) | lsb, prev_ind)
        else:
            delta = dec.dec_icdf(_ICDF_GAIN_DELTA, 8)
            prev_ind = _gain_delta(delta, prev_ind)
        gains.append(float(_GAIN_LINEAR[prev_ind]))
    return gains, prev_ind


def _celt_frame_energy(frame: bytes, lm_state: dict | None = None) -> float:
    """Mean linear band energy of a mono CELT frame (§4.3): silence,
    post-filter (uint octave + period/gain bits + tapset icdf),
    transient, intra flags, then per-band coarse energy — Laplace-coded
    deltas against the two-term predictor (time prediction zeroed for
    intra; the in-frame accumulator leaks by beta)."""
    dec = RangeDecoder(frame)
    if dec.dec_bit_logp(15):  # silence
        return 0.0
    if dec.dec_bit_logp(1):  # post-filter
        octave = dec.dec_uint(6)
        dec.dec_bits(4 + octave)  # period
        dec.dec_bits(3)  # gain
        dec.dec_icdf(_TAPSET_ICDF, 2)  # tapset
    dec.dec_bit_logp(3)  # transient
    intra = dec.dec_bit_logp(3)
    energies = []
    prev = 0.0
    for band in range(_N_BANDS):
        fs, decay = _celt_prob(band, intra)
        q = _laplace_decode(dec, fs, decay)
        cur = prev + q
        energies.append(2.0 ** (cur / 2.0))
        prev = prev + q * (1.0 - _CELT_BETA_INTRA) if intra else 0.7 * cur
    return float(np.mean(energies))


def celt_quantize_envelope(energies) -> np.ndarray:
    """The envelope ``opus_energy_envelope`` returns for
    ``encode_ogg_opus_envelope(energies, mode='celt')`` — the
    pure-arithmetic mirror of the intra-frame coarse-energy walk."""
    out: list[float] = []
    for e in np.asarray(energies, dtype=np.float64):
        if e == 0.0:
            out.append(0.0)
            continue
        target = 2.0 * np.log2(max(e, 1e-12))
        prev = 0.0
        es = []
        for _band in range(_N_BANDS):
            q = int(round(target - prev))
            cur = prev + q
            es.append(2.0 ** (cur / 2.0))
            prev = prev + q * (1.0 - _CELT_BETA_INTRA)
        out.append(float(np.mean(es)))
    return np.asarray(out, dtype=np.float64)


_CELT_REFUSAL = (
    "CELT coarse-energy probability model is module-owned, not RFC "
    "6716's e_prob_model — real-world CELT streams quarantine (SILK "
    "and hybrid streams decode with the transcribed RFC tables)"
)

_FIXTURE_VENDOR = "pg2kinesis_spark fixture"


def opus_energy_envelope(data: bytes) -> np.ndarray:
    """Per-frame energy envelope of an Ogg Opus stream — the sequence
    ``audio_fingerprint`` consumes. Mono throughout; stereo SILK walks
    the mid (mono-mix) channel. Surround, stereo CELT, 40/60 ms SILK
    packets, non-Opus Ogg, and — until e_prob_model is transcribed —
    real-world CELT streams (no fixture marker in the OpusTags vendor
    string) refuse (NotImplementedError) so the caller's quarantine
    channel stays honest."""
    packets = ogg_packets(data)
    if not packets or not packets[0].startswith(b"OpusHead"):
        raise NotImplementedError("not an Ogg Opus stream")
    head = packets[0]
    if len(head) < 10:
        raise ValueError("truncated OpusHead")
    channels = head[9]
    if channels not in (1, 2):
        raise NotImplementedError(
            f"Opus envelope: {channels}-channel (surround) streams"
        )
    fixture = False
    for p in packets[1:3]:
        if p.startswith(b"OpusTags"):
            fixture = _vorbis_vendor(p[8:]) == _FIXTURE_VENDOR
            break
    return opus_packets_energy(
        (p for p in packets[1:] if not p.startswith(b"OpusTags")),
        fixture_celt=fixture,
    )


def _vorbis_vendor(vc: bytes) -> str | None:
    """The vendor string of a VorbisComment payload (None if short)."""
    if len(vc) < 4:
        return None
    n = struct.unpack_from("<I", vc, 0)[0]
    if 4 + n > len(vc):
        return None
    try:
        return vc[4 : 4 + n].decode("utf-8")
    except UnicodeDecodeError:
        return None


def opus_packets_energy(packets, fixture_celt: bool = False) -> np.ndarray:
    """The per-packet energy walk shared by the Ogg and WebM fronts:
    each packet contributes its SILK subframe gains (real RFC tables,
    LastGainIndex threaded across packets like the real decoder) or —
    for fixture-marked streams only — CELT coarse band energy (see the
    module docstring for scope + refusals)."""
    env: list[float] = []
    prev_ind = _GAIN_RESET_IND
    for pkt in packets:
        config, stereo, frames = opus_packet_frames(pkt)
        ms = _FRAME_MS[config]
        if config < 12 and ms not in (10, 20):
            raise NotImplementedError(
                f"{ms} ms SILK packets hold multiple interleaved SILK "
                "frames in one entropy stream (full SILK decode tier)"
            )
        if config >= 16:
            if stereo:
                raise NotImplementedError(
                    "stereo CELT packet (coupled-band energy is the full-"
                    "decode tier; stereo SILK walks the mid channel)"
                )
            if not fixture_celt:
                raise NotImplementedError(_CELT_REFUSAL)
        for fr in frames:
            if not fr:
                continue  # DTX
            if config < 16:
                gains, prev_ind = _silk_frame_gains(
                    fr, int(ms), stereo=stereo, prev_ind=prev_ind
                )
                env.extend(gains)
            else:
                env.append(_celt_frame_energy(fr))
    return np.asarray(env, dtype=np.float64)


# --- Ogg packet reassembly ---------------------------------------------------


def ogg_packets(data: bytes, serial: int | None = None) -> list[bytes]:
    """Reassemble the logical packets of ONE Ogg stream from the page
    lacing values, handling 255-continuation within and across pages.
    ``serial=None`` follows the FIRST stream whose BOS page opens with
    an audio magic (OpusHead / \\x01vorbis / \\x7fFLAC), falling back to the first
    stream — so multiplexed files (e.g. Theora+Vorbis) feed the audio
    walk the audio stream's packets instead of an interleaved garble;
    pass an explicit ``serial`` to pick a stream. Pages of other
    serials are skipped structurally (their lacing still walks, so a
    hostile interleave can't smuggle bytes). CRC is checked by the
    caller's page walk (ogg_info); this walk re-checks structure
    only."""
    data = bytes(data)
    n = len(data)

    def pages():
        pos = 0
        while pos + 27 <= n:
            if data[pos : pos + 4] != b"OggS":
                return
            nsegs = data[pos + 26]
            seg_table = data[pos + 27 : pos + 27 + nsegs]
            if len(seg_table) < nsegs:
                raise ValueError("truncated Ogg segment table")
            body = pos + 27 + nsegs
            size = sum(seg_table)
            if body + size > n:
                raise ValueError("Ogg lacing overruns file")
            yield (
                data[pos + 5],
                struct.unpack_from("<I", data, pos + 14)[0],
                seg_table,
                body,
            )
            pos = body + size

    want = serial
    if want is None:  # header-only pre-scan: first audio BOS, else first page
        first_serial = None
        for header_type, page_serial, _segs, body in pages():
            if first_serial is None:
                first_serial = page_serial
            if header_type & 0x02:
                head = data[body : body + 8]
                if (
                    head.startswith(b"OpusHead")
                    or head.startswith(b"\x01vorbis")
                    or head.startswith(b"\x7fFLAC")
                ):
                    want = page_serial
                    break
        if want is None:
            want = first_serial
    packets: list[bytes] = []
    cur = bytearray()
    for _ht, page_serial, seg_table, body in pages():
        if page_serial != want:
            continue
        at = body
        for s in seg_table:
            cur += data[at : at + s]
            at += s
            if s < 255:
                packets.append(bytes(cur))
                cur = bytearray()
    if cur:
        packets.append(bytes(cur))  # unterminated final packet
    return packets


# --- fixture encoder ---------------------------------------------------------


def opus_envelope_packets(
    energies, mode: str = "silk", frame_ms: int = 20, stereo: bool = False
) -> list[bytes]:
    """Raw Opus packets (code 0, one frame each) carrying the quantized
    envelope — the packet builder shared by the Ogg and WebM fixture
    fronts. The SILK packets are REAL-table streams (any conformant
    Opus front-end decoder reads the same gains); the gain planning
    threads LastGainIndex exactly like the decoder, so
    ``silk_quantize_envelope`` is the byte-independent truth.
    ``stereo=True`` (silk only) writes real stereo SILK frames: both
    channels' VAD/LBRR flags, the five stereo-weight symbols, the
    mid-only flag (set — the fixture carries no side channel), then
    the mid frame holding the envelope in its gains."""
    env = np.asarray(energies, dtype=np.float64)
    if (env < 0).any():
        raise ValueError("energies must be non-negative")
    if frame_ms not in (10, 20):
        raise ValueError("frame_ms must be 10 or 20")
    pkts: list[bytes] = []
    prev_ind = _GAIN_RESET_IND
    for e in env:
        if mode == "silk":
            config = 9 if frame_ms == 20 else 8  # WB SILK
            toc = bytes([(config << 3) | (4 if stereo else 0)])  # code 0
            if e == 0.0:
                pkts.append(toc)  # DTX
                continue
            enc = RangeEncoder()
            enc.enc_bit_logp(1, 1)  # mid VAD active
            enc.enc_bit_logp(0, 1)  # no mid LBRR
            if stereo:
                enc.enc_bit_logp(0, 1)  # side VAD inactive
                enc.enc_bit_logp(0, 1)  # no side LBRR
                enc.enc_icdf(12, _ICDF_STEREO_JOINT, 8)  # centered weights
                for _w in range(2):
                    enc.enc_icdf(1, _ICDF_UNIFORM3, 8)
                    enc.enc_icdf(2, _ICDF_UNIFORM5, 8)
                enc.enc_icdf(1, _ICDF_MID_ONLY, 8)  # mid-only (side VAD off)
            enc.enc_icdf(2, _ICDF_TYPE_VAD, 8)  # voiced, low offset
            n_sub = 2 if frame_ms == 10 else 4
            target = _quantize_gain_index(e)
            ind0, deltas, _realized, prev_ind = _plan_silk_gains(
                target, prev_ind, n_sub
            )
            enc.enc_icdf(ind0 >> 3, _ICDF_GAIN_MSB[2], 8)
            enc.enc_icdf(ind0 & 7, _ICDF_GAIN_LSB, 8)
            for d in deltas:
                enc.enc_icdf(d, _ICDF_GAIN_DELTA, 8)
            pkts.append(toc + enc.done())
        elif mode == "celt":
            if stereo:
                raise ValueError("stereo fixtures are SILK-only")
            config = 16 + (2 if frame_ms == 10 else 3)  # NB CELT 10/20ms
            toc = bytes([config << 3])
            enc = RangeEncoder()
            if e == 0.0:
                enc.enc_bit_logp(1, 15)  # silence
                pkts.append(toc + enc.done())
                continue
            enc.enc_bit_logp(0, 15)
            enc.enc_bit_logp(0, 1)  # no post-filter
            enc.enc_bit_logp(0, 3)  # not transient
            enc.enc_bit_logp(1, 3)  # intra
            target = 2.0 * np.log2(max(e, 1e-12))
            prev = 0.0
            for band in range(_N_BANDS):
                fs, decay = _celt_prob(band, 1)
                q = int(round(target - prev))
                q = _laplace_encode(enc, q, fs, decay)
                prev = prev + q * (1.0 - _CELT_BETA_INTRA)
            pkts.append(toc + enc.done())
        else:
            raise ValueError(mode)
    return pkts


def webm_opus_energy_envelope(data: bytes) -> np.ndarray:
    """Per-frame energy envelope of Opus inside WebM/Matroska — the
    same per-packet walk as the Ogg front, with packets lifted from
    the Cluster SimpleBlocks/Blocks of the first A_OPUS audio track
    (the shared ``codecs.webm_audio_packets`` walk; laced audio
    refuses). An Ogg Opus stream and its WebM remux fingerprint
    IDENTICALLY. Video-bearing files stay on the video tier; stereo
    and non-Opus audio refuse. The CELT fixture gate reads the
    WritingApp element (the WebM twin of the OpusTags vendor
    marker)."""
    from pg2kinesis_spark.functions import codecs as C

    data = bytes(data)
    if not C.is_webm(data):
        raise ValueError("not Matroska/WebM: bad EBML magic")
    info = C.webm_info(data)
    if info["n_video_tracks"]:
        raise NotImplementedError("WebM with video tracks stays on the video tier")
    if info["audio_codec"] != "A_OPUS":
        raise NotImplementedError(
            f"WebM audio envelope covers A_OPUS ({info['audio_codec']!r})"
        )
    if (info["n_channels"] or 1) != 1:
        raise NotImplementedError("Opus envelope walks mono streams only")
    _codec, _priv, packets, writing_app = C.webm_audio_packets(data)
    if not packets:
        raise ValueError("WebM Opus track with no blocks")
    return opus_packets_energy(
        packets, fixture_celt=writing_app == _FIXTURE_VENDOR
    )


_MKV_WRITINGAPP = 0x5741


def encode_webm_opus_envelope(
    energies,
    mode: str = "silk",
    frame_ms: int = 20,
    blocks_per_cluster: int = 20,
) -> bytes:
    """Audio-only WebM fixture carrying the SAME Opus packets the Ogg
    fixture would — the remux twin for the cross-container identity
    test, and the independent construction side of
    ``webm_opus_energy_envelope``. Writes the fixture marker into
    WritingApp (the CELT gate's WebM channel)."""
    from pg2kinesis_spark.functions import codecs as C

    pkts = opus_envelope_packets(energies, mode, frame_ms)
    ebml_hdr = C._EBML_MAGIC + C._ebml_encode_size(0)
    dur_ticks = frame_ms * len(pkts)  # 1 ms ticks at the default scale
    info = C._ebml_elem(
        C._MKV_INFO,
        C._ebml_elem(C._MKV_TIMECODESCALE, (1_000_000).to_bytes(4, "big"))
        + C._ebml_elem(C._MKV_DURATION, struct.pack(">d", float(dur_ticks)))
        + C._ebml_elem(_MKV_WRITINGAPP, _FIXTURE_VENDOR.encode("utf-8")),
    )
    audio_entry = C._ebml_elem(
        C._MKV_TRACKENTRY,
        C._ebml_elem(C._MKV_TRACKTYPE, b"\x02")
        + C._ebml_elem(C._MKV_TRACKNUMBER, b"\x01")
        + C._ebml_elem(C._MKV_CODECID, b"A_OPUS")
        + C._ebml_elem(
            C._MKV_AUDIO,
            C._ebml_elem(C._MKV_SAMPLINGFREQ, struct.pack(">f", 48000.0))
            + C._ebml_elem(C._MKV_CHANNELS, b"\x01"),
        ),
    )
    tracks = C._ebml_elem(C._MKV_TRACKS, audio_entry)
    clusters = b""
    for i in range(0, len(pkts), blocks_per_cluster):
        chunk = pkts[i : i + blocks_per_cluster]
        base_tc = i * frame_ms
        payload = C._ebml_elem(C._MKV_CLUSTERTC, base_tc.to_bytes(4, "big"))
        for j, pkt in enumerate(chunk):
            blk = bytes([0x81]) + struct.pack(">h", j * frame_ms) + b"\x80" + pkt
            payload += C._ebml_elem(C._MKV_SIMPLEBLOCK, blk)
        clusters += C._ebml_elem(C._MKV_CLUSTER, payload)
    segment = C._ebml_elem(C._MKV_SEGMENT, info + tracks + clusters)
    return ebml_hdr + segment


def encode_ogg_opus_envelope(
    energies,
    mode: str = "silk",
    frame_ms: int = 20,
    tags: dict[str, str] | None = None,
    serial: int = 7,
    stereo: bool = False,
) -> bytes:
    """Ogg Opus fixture whose per-frame decoded envelope equals
    ``silk_quantize_envelope(energies)`` / ``celt_quantize_envelope``
    — the independent construction side of ``opus_energy_envelope``
    (the MP3 ``encode_mp3_layer3_envelope`` precedent). ``mode='silk'``
    writes one mono 20 ms (or 10 ms) REAL-table SILK frame per packet
    carrying the energy in its subframe gains; ``'celt'`` writes CELT
    frames carrying it in the coarse band energies (decodable only
    under the fixture marker — the OpusTags vendor string written
    here). Zero energy becomes a DTX (empty) packet in silk mode and
    the silence flag in celt mode."""
    from pg2kinesis_spark.functions import codecs as C

    rate = 48000
    spf = 48 * frame_ms
    pkts = opus_envelope_packets(energies, mode, frame_ms, stereo=stereo)

    def page(granule, seq, payload, header_type=0):
        segs = []
        rest = len(payload)
        while rest >= 255:
            segs.append(255)
            rest -= 255
        segs.append(rest)
        hdr = (
            b"OggS" + bytes([0, header_type])
            + struct.pack("<q", granule)
            + struct.pack("<II", serial, seq)
            + bytes(4)
            + bytes([len(segs)]) + bytes(segs)
        )
        raw = bytearray(hdr + payload)
        raw[22:26] = struct.pack("<I", C._ogg_page_crc(bytes(raw)))
        return bytes(raw)

    head = (
        b"OpusHead" + bytes([1, 2 if stereo else 1]) + struct.pack("<H", 0)
        + struct.pack("<I", rate) + bytes(3)
    )
    out = page(-1, 0, head, header_type=2)
    seq = 1
    out += page(
        -1, seq, b"OpusTags" + C.encode_vorbis_comment(tags or {})
    )
    seq += 1
    granule = 0
    for i, p in enumerate(pkts):
        granule += spf
        last = i == len(pkts) - 1
        out += page(granule, seq, p, header_type=4 if last else 0)
        seq += 1
    return out
