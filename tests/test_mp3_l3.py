"""MPEG-1 Layer III: structural identities (sfb coverage, Kraft/
prefix-complete trusted tables, TDAC exactness of the derived
windows), full encode/decode round trips through every implemented
stage (scalefactors, scfsi, MS stereo, count1 quads, bit reservoir),
tolerance oracles vs the WAV twin for the content measures, and the
named refusals for everything the Huffman registry does not trust
(the house transcription rule — see mp3_l3's module docstring)."""

from __future__ import annotations

import numpy as np
import pytest

from pg2kinesis_spark.functions import audio_analysis as aa
from pg2kinesis_spark.functions import mp3_l3 as L3
from pg2kinesis_spark.functions.codecs import encode_mp3_frames, encode_wav

RATE = 44100


def sine(freq=440.0, seconds=2.0, amp=0.5, rate=RATE):
    t = np.arange(int(seconds * rate))
    return amp * np.sin(2 * np.pi * freq * t / rate)


def melody(seed, seconds=2.0, rate=RATE, amp=0.5):
    rng = np.random.default_rng(seed)
    seg = int(0.25 * rate)
    notes = rng.integers(300, 3200, int(seconds / 0.25))
    t = np.arange(seg)
    return np.concatenate([amp * np.sin(2 * np.pi * f * t / rate) for f in notes])


def _rms_db(x):
    return 20 * np.log10(np.sqrt((np.asarray(x, dtype=float) ** 2).mean()))


# --- structural identities ----------------------------------------------------


def test_sfb_tables_tile_the_spectrum():
    for rate, w in L3._SFB_LONG.items():
        assert len(w) == 22 and sum(w) == 576, rate
    for rate, w in L3._SFB_SHORT.items():
        assert len(w) == 13 and sum(w) == 192, rate


def test_trusted_tables_are_prefix_complete():
    # re-run the import-time checks explicitly (they must keep holding
    # for any table swapped in through the B.7 seam)
    for tid, entry in L3._HUFF_TABLES.items():
        if entry is not None and entry[0]:
            L3._check_prefix_complete(entry[0], f"table {tid}")
    L3._check_prefix_complete(L3._COUNT1_B, "count1 B")
    L3._check_prefix_complete(L3._COUNT1_A, "count1 A")
    with pytest.raises(AssertionError, match="Kraft"):
        L3._check_prefix_complete({(0, 0): (2, 0)}, "undersubscribed")
    with pytest.raises(AssertionError, match="prefix|Kraft"):
        L3._check_prefix_complete(
            {(0, 0): (1, 1), (0, 1): (2, 3), (1, 0): (2, 2)}, "clash"
        )


def test_mdct_imdct_tdac_is_exact():
    """The derived sine window + 4/N MDCT is the exact inverse of the
    decode IMDCT + overlap-add, to machine epsilon (Princen-Bradley)."""
    rng = np.random.default_rng(1)
    x = rng.normal(size=18 * 12)
    w = L3._WINDOWS[0]
    rec, overlap, tail = [], np.zeros(18), np.zeros(18)
    for g in range(12):
        cur = x[g * 18 : (g + 1) * 18]
        x36 = np.concatenate([tail, cur])
        tail = cur
        z = (L3._C36 @ L3._mdct_forward(x36, w)) * w
        rec.append(z[:18] + overlap)
        overlap = z[18:]
    rec = np.concatenate(rec)
    assert np.abs(rec[18:] - x[:-18]).max() < 1e-12


def test_window_shapes_are_the_spec_piecewise_forms():
    w_start, w_stop, w_long = L3._WINDOWS[1], L3._WINDOWS[3], L3._WINDOWS[0]
    assert np.allclose(w_start[:18], w_long[:18])
    assert (w_start[18:24] == 1.0).all() and (w_start[30:] == 0.0).all()
    assert np.allclose(w_stop, w_start[::-1])
    # sine windows satisfy w[n]^2 + w[n+18]^2 == 1 (the OLA condition)
    assert np.allclose(w_long[:18] ** 2 + w_long[18:] ** 2, 1.0)


def test_alias_butterflies_invert_exactly():
    rng = np.random.default_rng(2)
    x = rng.normal(size=576)
    g = {"block_type": 0, "mixed": 0}
    assert np.allclose(
        L3._alias_reduce(L3._alias_reduce(x, g, inverse=True), g), x
    )


# --- round trips ----------------------------------------------------------------


def test_mono_round_trip_tracks_the_wav_twin():
    pcm = sine(amp=0.5)
    dec, rate = L3.decode_mp3_layer3(L3.encode_mp3_layer3(pcm, RATE))
    assert rate == RATE
    mid = slice(2304, len(pcm) - 2304)
    err_db = _rms_db(dec[mid, 0]) - _rms_db(pcm[mid])
    # global_gain steps are 1.5 dB -> worst-case rounding 0.75 dB
    assert abs(err_db) < 1.0
    # waveform, not just energy: strong correlation at the best lag
    d = dec[:, 0]
    lags = range(0, 2200)
    best = max(lags, key=lambda l: float(np.dot(d[l : l + 4000], pcm[:4000])))
    assert np.corrcoef(d[best : best + 4000], pcm[:4000])[0, 1] > 0.97


def test_amplitude_linearity_and_silence():
    pcm = sine(amp=0.4)
    half = sine(amp=0.2)
    mid = slice(2304, len(pcm) - 2304)
    a = L3.decode_mp3_layer3(L3.encode_mp3_layer3(pcm, RATE))[0][mid, 0]
    b = L3.decode_mp3_layer3(L3.encode_mp3_layer3(half, RATE))[0][mid, 0]
    assert abs((_rms_db(b) - _rms_db(a)) + 6.02) < 1.6  # two 0.75 dB grids
    # digital silence stays exactly silent
    z = L3.decode_mp3_layer3(L3.encode_mp3_layer3(np.zeros(4 * 1152), RATE))
    assert np.abs(z[0]).max() == 0.0


def test_stereo_and_ms_round_trip():
    l = melody(5)
    r = 0.4 * melody(6)
    st = np.stack([l, r], axis=1)
    mid = slice(2304, len(l) - 2304)
    for kw in ({}, {"ms": True}):
        dec, _ = L3.decode_mp3_layer3(L3.encode_mp3_layer3(st, RATE, **kw))
        for ch, ref in ((0, l), (1, r)):
            err = _rms_db(dec[mid, ch]) - _rms_db(ref[mid])
            assert abs(err) < 1.6, (kw, ch)


def test_intensity_stereo_round_trip():
    """Joint (intensity) stereo per §2.4.3.4.9.3 — a pure formula, no
    tables: bands above the right channel's decoded extent carry the
    summed signal in the left channel and is_pos in the right
    channel's scalefactor slots; L = t·r/(1+r), R = t/(1+r),
    r = tan(is_pos·π/12). A high tone panned at an exact grid ratio
    reconstructs both channels; is_pos itself round-trips through the
    slen-4/3 scalefactor layout."""
    n = 1152 * 6
    t = np.arange(n)
    lo_l = 0.3 * np.sin(2 * np.pi * 300 * t / RATE)
    lo_r = 0.3 * np.sin(2 * np.pi * 500 * t / RATE)
    hi = 0.3 * np.sin(2 * np.pi * 5000 * t / RATE)
    r = np.tan(4 * np.pi / 12)  # is_pos = 4
    L = lo_l + hi * (r / (1 + r))
    R = lo_r + hi * (1 / (1 + r))
    blob = L3.encode_mp3_layer3(np.stack([L, R], 1), RATE, intensity=8)
    si = L3._parse_side_info(blob[4:36], 2)
    assert si["granules"][0][1]["scalefac_compress"] == 15
    dec, _ = L3.decode_mp3_layer3(blob)
    mid = slice(2304, n - 2304)
    for ch, ref in ((0, L), (1, R)):
        assert abs(_rms_db(dec[mid, ch]) - _rms_db(ref[mid])) < 1.2, ch
        d = dec[:, ch]
        lags = range(0, len(d) - 4200)
        best = max(
            lags, key=lambda l: float(np.dot(d[l : l + 4000], ref[:4000]))
        )
        assert np.corrcoef(d[best : best + 4000], ref[:4000])[0, 1] > 0.9, ch
    # fully-left panning (is_pos 6) zeroes the right channel above the
    # border; the right channel keeps its own below-border content
    L2_ = lo_l + hi
    blob = L3.encode_mp3_layer3(np.stack([L2_, lo_r], 1), RATE, intensity=8)
    dec, _ = L3.decode_mp3_layer3(blob)
    assert abs(_rms_db(dec[mid, 1]) - _rms_db(lo_r[mid])) < 1.2
    # intensity with short blocks refuses (the per-window border
    # corner) — craft by flipping the MS fixture's mode_ext
    with pytest.raises(ValueError, match="intensity"):
        L3.encode_mp3_layer3(np.stack([L, R], 1), RATE, intensity=8, ms=True)


def test_intensity_silent_right_granules_keep_the_left_channel():
    """Degenerate-extent guard: granules whose right channel quantizes
    to NOTHING would have extent 0, letting the decoder's intensity
    region swallow the below-border bands (is_pos 0 slots would wipe
    the left channel). The encoder floors the right channel's
    big_values at the border with free (0,0) pairs, so the extent —
    and with it the intensity region — stays exactly at the border."""
    n = 1152 * 16
    t = np.arange(n)
    L = 0.3 * np.sin(2 * np.pi * 300 * t / RATE)
    R = np.zeros(n)
    R[n // 2 :] = 0.3 * np.sin(2 * np.pi * 500 * t[n // 2 :] / RATE)
    blob = L3.encode_mp3_layer3(np.stack([L, R], 1), RATE, intensity=8)
    # the extent floor shows in the side info: 36/2 = 18 pairs even in
    # silent-right granules
    si = L3._parse_side_info(blob[4:36], 2)
    assert si["granules"][0][1]["big_values"] >= 18
    dec, _ = L3.decode_mp3_layer3(blob)
    # the left tone must survive the silent-right half
    early = slice(2304, n // 2 - 2304)
    assert abs(_rms_db(dec[early, 0]) - _rms_db(L[early])) < 1.2
    late = slice(n // 2 + 4608, n - 2304)
    assert abs(_rms_db(dec[late, 1]) - _rms_db(R[late])) < 1.2


def test_scalefactors_scfsi_and_reservoir_paths():
    pcm = melody(7)
    mid = slice(2304, len(pcm) - 2304)
    base = L3.decode_mp3_layer3(L3.encode_mp3_layer3(pcm, RATE))[0]
    # nonzero scalefactors change the bitstream but the decoder undoes
    # them: same signal within the per-band quantization grids
    for kw in (
        {"scalefac_pattern": 1},
        {"scalefac_pattern": 1, "use_scfsi": True},
        {"use_reservoir": True},
        {"use_count1": False},
    ):
        blob = L3.encode_mp3_layer3(pcm, RATE, **kw)
        dec = L3.decode_mp3_layer3(blob)[0]
        err = _rms_db(dec[mid, 0]) - _rms_db(base[mid, 0])
        assert abs(err) < 0.6, kw
    # the reservoir stream really uses back-pointers
    blob = L3.encode_mp3_layer3(pcm, RATE, use_reservoir=True)
    mdbs = []
    pos = 0
    while pos + 4 <= len(blob) and blob[pos] == 0xFF:
        from pg2kinesis_spark.functions.codecs import _MP3_BITRATES

        flen = 144 * _MP3_BITRATES[(1, 3)][blob[pos + 2] >> 4] * 1000 // RATE
        side = blob[pos + 4 :]
        mdbs.append((side[0] << 1) | (side[1] >> 7))
        pos += flen
    assert max(mdbs) > 0
    # and decodes identically to the slot-aligned packing of the SAME
    # granule bits
    plain = L3.encode_mp3_layer3(pcm, RATE, use_reservoir=False)
    assert np.array_equal(
        L3.decode_mp3_layer3(blob)[0], L3.decode_mp3_layer3(plain)[0]
    )


def test_short_blocks_round_trip():
    """block_type 2: three 12-point MDCTs per subband, the sfb-major
    wire order undone by the decoder's reorder, subblock gains undone
    by the requantizer. Uniform subblock gains must cancel EXACTLY
    (same quantization grid) — a decoder ignoring them would come out
    12 dB hot."""
    pcm = sine(700.0, amp=0.4)
    mid = slice(2304, len(pcm) - 2304)
    dec, _ = L3.decode_mp3_layer3(
        L3.encode_mp3_layer3(pcm, RATE, short_blocks=True)
    )
    assert abs(_rms_db(dec[mid, 0]) - _rms_db(pcm[mid])) < 1.0
    side = L3._parse_side_info(
        L3.encode_mp3_layer3(pcm, RATE, short_blocks=True)[4:21], 1
    )
    assert side["granules"][0][0]["block_type"] == 2
    a = L3.decode_mp3_layer3(
        L3.encode_mp3_layer3(pcm, RATE, short_blocks=True)
    )[0]
    b = L3.decode_mp3_layer3(
        L3.encode_mp3_layer3(
            pcm, RATE, short_blocks=True, subblock_gain=(1, 1, 1)
        )
    )[0]
    assert np.array_equal(a, b)
    side = L3._parse_side_info(
        L3.encode_mp3_layer3(
            pcm, RATE, short_blocks=True, subblock_gain=(0, 1, 2)
        )[4:21],
        1,
    )
    assert side["granules"][0][0]["subblock_gain"] == [0, 1, 2]
    with pytest.raises(ValueError, match="scalefactor options"):
        L3.encode_mp3_layer3(pcm, RATE, short_blocks=True, scalefac_pattern=1)


def test_block_type_transitions_and_mixed_blocks():
    """All FOUR block types round-trip, including the start/stop
    windows and every transition the TDAC window design allows
    (0->1->2->3->0), and mixed blocks (subbands 0-1 long, 2-31 short
    with the single alias boundary and the offset reorder base)."""
    t = np.arange(1152 * 8)
    pcm = 0.4 * np.sin(2 * np.pi * 700 * t / RATE)
    mid = slice(2304, len(pcm) - 2304)
    for kw in (
        {"block_pattern": (0, 1, 2, 3)},
        {"block_pattern": (1, 2, 3)},
        {"short_blocks": True, "mixed": True},
    ):
        dec, _ = L3.decode_mp3_layer3(L3.encode_mp3_layer3(pcm, RATE, **kw))
        assert abs(_rms_db(dec[mid, 0]) - _rms_db(pcm[mid])) < 1.2, kw
        d = dec[:, 0]
        best = max(
            range(0, 2200),
            key=lambda l: float(np.dot(d[l : l + 6000], pcm[:6000])),
        )
        assert np.corrcoef(d[best : best + 6000], pcm[:6000])[0, 1] > 0.9, kw
    side = L3._parse_side_info(
        L3.encode_mp3_layer3(pcm, RATE, block_pattern=(0, 1, 2, 3))[4:21], 1
    )
    assert [side["granules"][g][0]["block_type"] for g in range(2)] == [0, 1]
    side = L3._parse_side_info(
        L3.encode_mp3_layer3(pcm, RATE, short_blocks=True, mixed=True)[4:21], 1
    )
    assert side["granules"][0][0]["mixed"] == 1
    with pytest.raises(ValueError, match="block_pattern"):
        L3.encode_mp3_layer3(pcm, RATE, block_pattern=(5,))
    with pytest.raises(ValueError, match="mixed"):
        L3.encode_mp3_layer3(pcm, RATE, mixed=True)


def test_zeroed_granules_decode_as_silence():
    """encode_mp3_frames' all-zero Layer III bodies are VALID frames
    (part2_3_length 0): they decode to exact digital silence — the
    construction behind the n28 truth-row flip."""
    z = encode_mp3_frames(20, kbps=128, rate=44100, layer=3)
    dec, rate = L3.decode_mp3_layer3(z)
    assert rate == 44100 and dec.shape == (20 * 1152, 2)
    assert np.abs(dec).max() == 0.0


# --- refusals (the Huffman-registry contract) -----------------------------------


def _flip_side_bits(blob: bytes, bitpos: int, value: int, width: int) -> bytes:
    out = bytearray(blob)
    for i in range(width):
        byte, bit = bitpos >> 3, 7 - (bitpos & 7)
        want = (value >> (width - 1 - i)) & 1
        out[byte] = (out[byte] & ~(1 << bit)) | (want << bit)
        bitpos += 1
    return bytes(out)


def test_untrusted_tables_refuse_by_name():
    blob = L3.encode_mp3_layer3(sine(), RATE)
    # mono side info: granule 0's first table_select begins at bit
    # 9 + 5 + 4 + (12 + 9 + 8 + 4 + 1) = 52 past the 4-byte header
    bad = _flip_side_bits(blob, 4 * 8 + 52, 13, 5)
    with pytest.raises(NotImplementedError, match="table 13"):
        L3.decode_mp3_layer3(bad)
    bad = _flip_side_bits(blob, 4 * 8 + 52, 24, 5)
    with pytest.raises(NotImplementedError, match="table 24"):
        L3.decode_mp3_layer3(bad)


def test_transcribed_table_registry_round_trips():
    """Round 12: every transcribed big-value table carries a real
    bitstream round trip, and same-alphabet tables must produce
    BIT-IDENTICAL PCM — the quantized spectra are equal, only the
    wire bits differ, so any same-length value mixup inside one of
    the twin tables would break the equality."""
    pcm = melody(3)
    mid = slice(2304, len(pcm) - 2304)
    ref_db = _rms_db(pcm[mid])
    outs, corrs = {}, {}
    for tab in (1, 2, 3, 5, 6, 7, 8, 9):
        dec, rate = L3.decode_mp3_layer3(
            L3.encode_mp3_layer3(pcm, RATE, table_select=tab)
        )
        assert rate == RATE
        outs[tab] = dec[:, 0]
        assert abs(_rms_db(dec[mid, 0]) - ref_db) < 1.0, tab
        d = dec[:, 0]
        best = max(
            range(0, 2200),
            key=lambda l: float(np.dot(d[l : l + 4000], pcm[:4000])),
        )
        corrs[tab] = np.corrcoef(d[best : best + 4000], pcm[:4000])[0, 1]
        assert corrs[tab] > 0.95, (tab, corrs[tab])
    # a finer quantizer alphabet must track the source better
    assert corrs[1] < corrs[2] < corrs[5] < corrs[7]
    for a, b in ((2, 3), (5, 6), (7, 8), (8, 9)):
        assert np.array_equal(outs[a], outs[b]), (a, b)


def test_count1_table_a_round_trip():
    pcm = melody(11)
    blob_a = L3.encode_mp3_layer3(pcm, RATE, count1_table="A")
    blob_b = L3.encode_mp3_layer3(pcm, RATE, count1_table="B")
    side = L3._parse_side_info(blob_a[4:21], 1)
    assert side["granules"][0][0]["count1table_select"] == 0
    side = L3._parse_side_info(blob_b[4:21], 1)
    assert side["granules"][0][0]["count1table_select"] == 1
    # identical quantized spectra -> identical PCM from either wire
    dec_a = L3.decode_mp3_layer3(blob_a)[0]
    dec_b = L3.decode_mp3_layer3(blob_b)[0]
    assert np.array_equal(dec_a, dec_b)
    mid = slice(2304, len(pcm) - 2304)
    assert abs(_rms_db(dec_a[mid, 0]) - _rms_db(pcm[mid])) < 1.0


def test_lsf_round_trips_track_the_source():
    """MPEG-2 LSF (round 12): 13818-3 side info (8-bit back-pointer,
    one granule, 9-bit scalefac_compress, implicit preflag), the slen
    decomposition rows 0/1/2, LSF sfb widths, MS stereo, and short
    blocks — all through real encode/decode round trips."""
    rate = 22050
    pcm = melody(5, rate=rate)
    mid = slice(2304, len(pcm) - 2304)
    for kw in (
        {},
        {"table_select": 7},
        {"count1_table": "A"},
        {"lsf_sfc": 101},   # row 0: slen (1,1,1,1)
        {"lsf_sfc": 470},   # row 1: slen (3,2,2,0)
        {"lsf_sfc": 508},   # row 2: slen (2,2,0,0) + preflag/pretab
        {"short_blocks": True},
    ):
        blob = L3.encode_mp3_layer3(pcm, rate, kbps=64, version=2, **kw)
        dec, r = L3.decode_mp3_layer3(blob)
        assert r == rate, kw
        assert abs(_rms_db(dec[mid, 0]) - _rms_db(pcm[mid])) < 1.0, kw
        d = dec[:, 0]
        best = max(
            range(0, 2200),
            key=lambda l: float(np.dot(d[l : l + 4000], pcm[:4000])),
        )
        thr = 0.9 if kw.get("short_blocks") else 0.95
        assert np.corrcoef(d[best : best + 4000], pcm[:4000])[0, 1] > thr, kw
    # MS stereo and the other LSF rates
    st = np.stack([pcm, melody(6, rate=rate)], 1)
    dec, r = L3.decode_mp3_layer3(
        L3.encode_mp3_layer3(st, rate, kbps=64, version=2, ms=True)
    )
    assert r == rate and dec.shape[1] == 2
    for ch in range(2):
        assert abs(_rms_db(dec[mid, ch]) - _rms_db(st[mid, ch])) < 1.5, ch
    for r2 in (24000, 16000):
        pcm2 = melody(7, rate=r2)
        dec, got = L3.decode_mp3_layer3(
            L3.encode_mp3_layer3(pcm2, r2, kbps=64, version=2)
        )
        m2 = slice(2304, len(pcm2) - 2304)
        assert got == r2
        assert abs(_rms_db(dec[m2, 0]) - _rms_db(pcm2[m2])) < 1.0, r2


_GSUTIL_MP3 = (
    "/usr/lib/google-cloud-sdk/platform/gsutil/gslib/tests/test_data/"
    "test.mp3"
)


@pytest.mark.skipif(
    not __import__("os").path.exists(_GSUTIL_MP3),
    reason="gsutil test data not present",
)
def test_real_world_lsf_stream_decodes():
    """A REAL third-party encoder's MP3 (Apache-2.0 gsutil test data
    that ships in this container: 22.05 kHz mono 64 kbps MPEG-2 LSF,
    45 frames of digital silence — all side info verified by hand in
    round 12) must decode end-to-end through the LSF walk: 8-bit
    back-pointers up to 255, real padding bytes, ID3v2 skip. Every
    granule's bit walk lands exactly on part2_3_length or the decode
    would raise — a real-world structural receipt for the walk."""
    data = open(_GSUTIL_MP3, "rb").read()
    dec, rate = L3.decode_mp3_layer3(data)
    assert rate == 22050
    assert dec.shape == (45 * 576, 1)
    assert np.abs(dec).max() == 0.0  # the file is digital silence


def test_structural_refusals_and_desync_guard():
    # round 12: MPEG-2 LSF decodes (zeroed granules -> exact silence);
    # the version refusal pin moves to MPEG-2.5
    lsf = encode_mp3_frames(5, kbps=64, rate=22050, mpeg2=True, layer=3)
    dec, rate = L3.decode_mp3_layer3(lsf)
    assert rate == 22050 and dec.shape == (5 * 576, 2)
    assert np.abs(dec).max() == 0.0
    m25 = bytearray(lsf)
    m25[1] &= ~0x18  # version bits -> MPEG-2.5
    with pytest.raises(NotImplementedError, match="MPEG-2.5"):
        L3.decode_mp3_layer3(bytes(m25))
    # intensity + short blocks is the one stereo corner that refuses:
    # flip a short-block stereo stream's mode/mode_ext to joint/IS
    blob = L3.encode_mp3_layer3(
        np.stack([sine(), sine(700.0)], 1), RATE, short_blocks=True
    )
    bad = bytearray(blob)
    pos = 0
    from pg2kinesis_spark.functions.codecs import _MP3_BITRATES

    while pos + 4 <= len(bad) and bad[pos] == 0xFF:
        bad[pos + 3] = (bad[pos + 3] & 0x0F) | (1 << 6) | (1 << 4)
        pos += 144 * _MP3_BITRATES[(1, 3)][bad[pos + 2] >> 4] * 1000 // RATE
    with pytest.raises(NotImplementedError, match="short/mixed"):
        L3.decode_mp3_layer3(bytes(bad))
    # shrinking part2_3_length by a few bits lands in the count1
    # region, where the spec's overshoot rule DROPS the final quad —
    # that must decode (real encoders rely on it), not raise
    blob = L3.encode_mp3_layer3(sine(), RATE)
    side = L3._parse_side_info(blob[4:21], 1)
    p23 = side["granules"][0][0]["part2_3_length"]
    ok = _flip_side_bits(blob, 4 * 8 + 18, p23 - 4, 12)
    L3.decode_mp3_layer3(ok)
    # halving it strands the big-values walk past its budget: the
    # desync guard must fire, never silent garbage
    bad = _flip_side_bits(blob, 4 * 8 + 18, p23 // 2, 12)
    with pytest.raises(ValueError, match="desync|truncated|Huffman"):
        L3.decode_mp3_layer3(bad)
    with pytest.raises(ValueError, match="no Layer III"):
        L3.decode_mp3_layer3(b"\x00" * 40)


# --- the content front door (spark) ---------------------------------------------


def test_l3_through_the_content_gates(spark):
    from pg2kinesis_spark.functions.multimodal import (
        MEDIA_SCHEMA,
        extract_audio_analysis,
    )

    tone = sine(amp=0.4, seconds=2.0)
    quiet = sine(amp=0.004, seconds=2.0)
    as_i16 = lambda x: np.round(x * 32767).astype(np.int16).reshape(-1, 1)
    rows = [
        (0, encode_wav(as_i16(tone), RATE)),        # the WAV twin
        (1, L3.encode_mp3_layer3(tone, RATE)),      # real L3 decode
        (2, L3.encode_mp3_layer3(quiet, RATE)),     # quiet: below -30
        (3, encode_mp3_frames(80, kbps=64, rate=22050, mpeg2=True, layer=3)),
    ]
    media = spark.createDataFrame(
        [(i, bytearray(c), ("a/x", len(c), f"m{i}")) for i, c in rows],
        MEDIA_SCHEMA,
    )
    got = {
        r["media_id"]: r
        for r in extract_audio_analysis(media).collect()
    }
    assert got[3]["decode_error"] is None  # LSF decodes since r12
    assert got[3]["silence_ratio"] == 1.0
    assert got[1]["decode_error"] is None
    assert abs(got[1]["lufs"] - got[0]["lufs"]) < 1.0  # vs the WAV twin
    assert got[1]["silence_ratio"] == got[0]["silence_ratio"] == 0.0
    assert got[2]["lufs"] < -45.0


def test_l3_transcode_landmark_matches_the_wav(spark):
    """An L3 transcode of a melody pairs with its WAV (small negative
    dt: codec latency) in audio_landmark_match — Layer III joins the
    shared content front door (the Layer I/II precedent, round 10)."""
    from pg2kinesis_spark.functions.multimodal import (
        MEDIA_SCHEMA,
        audio_landmark_match,
    )

    rate = 8000
    base = melody(11, seconds=3.0, rate=rate)
    as_i16 = lambda x: np.round(x * 32767).astype(np.int16).reshape(-1, 1)
    rows = [
        (0, encode_wav(as_i16(base), rate)),
        (1, L3.encode_mp3_layer3(base, 32000)),  # nearest MPEG-1 rate
        (2, encode_wav(as_i16(melody(12, seconds=3.0, rate=rate)), rate)),
    ]
    media = spark.createDataFrame(
        [(i, bytearray(c), ("a/x", len(c), f"m{i}")) for i, c in rows],
        MEDIA_SCHEMA,
    )
    got = {
        (r["media_id1"], r["media_id2"]): r["dt_frames"]
        for r in audio_landmark_match(media, min_votes=8).collect()
    }
    assert not any(2 in p for p in got)
    # the transcode pair exists; rates differ (8 k vs 32 k) so the
    # constellation geometry differs — pairing is only required when
    # the rates match, so re-check at the same rate
    base32 = melody(11, seconds=3.0, rate=32000)
    rows = [
        (0, encode_wav(as_i16(base32), 32000)),
        (1, L3.encode_mp3_layer3(base32, 32000)),
    ]
    media = spark.createDataFrame(
        [(i, bytearray(c), ("a/x", len(c), f"m{i}")) for i, c in rows],
        MEDIA_SCHEMA,
    )
    got = {
        (r["media_id1"], r["media_id2"]): r["dt_frames"]
        for r in audio_landmark_match(media, min_votes=8).collect()
    }
    # the codec pipeline delays the decoded events by ~2 hop-frames
    # (576-sample MDCT granule + polyphase latency), so the consensus
    # offset is small and NEGATIVE (wav events earlier), never zero
    assert (0, 1) in got and -4 <= got[(0, 1)] <= 0


def test_window_switching_region_boundary_is_rate_derived():
    """Start/stop (block_type 1/3) granules imply region0_count = 7,
    so the big-values region split is the rate table's bounds[8] —
    36 at every MPEG-1 rate but 54 at the LSF rates, whose long sfbs
    are wider (the ISO reference decoder computes it from the table,
    never literal 36). Short blocks (block_type 2) imply the first
    three short sfbs x 3 windows = 36 at every rate. A hand-built bit
    walk coding region 0 with table 1 and region 1 with table 5 only
    lands exactly on part2_3_length when the decoder derives the
    split correctly (code-review round 12: the old literal 36
    mis-tabled LSF start/stop lines 36-53)."""
    from pg2kinesis_spark.functions.codecs import _MsbWriter

    cases = [
        (44100, 1, 36), (48000, 3, 36), (32000, 1, 36),  # MPEG-1 long
        (22050, 1, 54), (24000, 3, 54), (16000, 1, 54),  # LSF long
        (22050, 2, 36), (44100, 2, 36),                  # short: 36 everywhere
    ]
    tab1, _ = L3._HUFF_TABLES[1]
    tab5, _ = L3._HUFF_TABLES[5]
    for rate, bt, expect_b1 in cases:
        assert expect_b1 % 2 == 0
        bw = _MsbWriter()
        bits = 0
        n0 = expect_b1 // 2
        l1, c1 = tab1[(1, 1)]
        for _ in range(n0):  # region 0: +1,+1 pairs (table 1)
            bw.write(c1, l1)
            bw.write(0, 1)
            bw.write(0, 1)
            bits += l1 + 2
        n1 = 6
        l5, c5 = tab5[(3, 2)]
        for _ in range(n1):  # region 1: +3,-2 pairs (table 5 only)
            bw.write(c5, l5)
            bw.write(0, 1)
            bw.write(1, 1)
            bits += l5 + 2
        g = {
            "region0_count": None, "region1_count": None,
            "block_type": bt, "mixed": 0,
            "big_values": n0 + n1,
            "table_select": [1, 5, 0],
            "count1table_select": 1,
        }
        br = L3._BitReader(bw.getvalue())
        ix, _extent = L3._decode_spectrum(br, g, rate, bits)
        assert br.pos == bits, (rate, bt)
        assert np.all(ix[:expect_b1] == 1), (rate, bt)
        seg = ix[expect_b1:expect_b1 + 2 * n1]
        assert np.all(seg[0::2] == 3) and np.all(seg[1::2] == -2), (rate, bt)
        assert np.all(ix[expect_b1 + 2 * n1:] == 0)
