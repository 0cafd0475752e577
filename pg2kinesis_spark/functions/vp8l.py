"""VP8L — WebP *lossless* pixel decode (round 10), dependency-free.

Implements the public "WebP Lossless Bitstream Specification" (the
format RIFF/WEBP/VP8L carries): LSB-first bit reading, canonical
prefix codes (simple 1-2-symbol form and the full code-length-coded
form with the 16/17/18 repeat symbols and the optional max_symbol
cap), meta prefix codes (an entropy image selecting one of N groups
of 5 codes per pixel block), LZ77 backward references with the
length/distance prefix coding, the color cache ((0x1E35A7BD * argb)
>> (32 - bits) indexing), and all four transforms inverted in reverse
read order: PREDICTOR (14 spatial modes over a sub-sampled mode
image), COLOR (per-block signed 3.5 fixed-point cross-channel
deltas), SUBTRACT_GREEN, and COLOR_INDEXING (palette with sub-byte
pixel bundling for <=16 colors).

The 120-entry near-distance map is NOT transcribed from memory: it is
GENERATED from its defining geometry — the (dx, dy) pixel
neighborhood dy in 0..7, dx in -7..8 (dy=0 restricted to dx>=1),
ordered by ascending Euclidean distance, ties by |dx| then positive
dx first — and the generator's output is pinned by tests against
known entries. Deriving beats recalling 120 opaque bytes.

Lossy VP8 stays an honest refusal in ``codecs.decode_webp`` (the
boolean-coder probability tables are a different, far larger
transcription); the PIL seam still upgrades it when present.

Scale posture: this runs inside the bounded per-file Arrow kernels of
the media tier (multimodal.py) — decode cost is per-row map work, the
MAX_PIXELS bomb gate fires before any allocation, and nothing here
touches a shuffle.

Fixture twin: ``encode_vp8l`` writes real VP8L streams (optional
subtract-green / uniform predictor / palette transforms, optional
color cache, literal + dist=1 run backrefs, full code-length-coded
prefix codes with 16/17/18 runs) so round trips exercise every decode
path; ``encode_webp_lossless`` wraps the stream in RIFF. WEBP≡PNG
dHash identity is pinned in tests/test_webp.py (the TIFF precedent).
"""

from __future__ import annotations

import heapq
import struct

import numpy as np

from pg2kinesis_spark.functions.codecs import _check_pixels

# --- bit reader (LSB-first within bytes) -------------------------------------


class _Bits:
    __slots__ = ("data", "pos", "n")

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0  # bit position
        self.n = len(data) * 8

    def bits(self, k: int) -> int:
        if k == 0:
            return 0
        if self.pos + k > self.n:
            raise ValueError("truncated VP8L stream")
        out = 0
        p = self.pos
        data = self.data
        for i in range(k):
            out |= ((data[(p + i) >> 3] >> ((p + i) & 7)) & 1) << i
        self.pos = p + k
        return out

    def bit(self) -> int:
        if self.pos >= self.n:
            raise ValueError("truncated VP8L stream")
        b = (self.data[self.pos >> 3] >> (self.pos & 7)) & 1
        self.pos += 1
        return b


# --- canonical prefix codes ---------------------------------------------------

# code-length alphabet order (the spec's own permutation)
_CL_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)
_MAX_CODE_LEN = 15


class _Prefix:
    """Canonical prefix decoder: deflate-style code assignment
    (ascending length, then ascending symbol), decoded by walking the
    bits MSB-first as the spec's ReadSymbol does. A single-symbol code
    consumes 0 bits (the spec's trivial-code rule)."""

    __slots__ = ("table", "trivial")

    def __init__(self, lengths: list[int]) -> None:
        nz = [(l, s) for s, l in enumerate(lengths) if l > 0]
        if not nz:
            raise ValueError("VP8L prefix code with no symbols")
        if len(nz) == 1:
            self.trivial = nz[0][1]
            self.table = None
            return
        self.trivial = None
        if max(l for l, _ in nz) > _MAX_CODE_LEN:
            raise ValueError("VP8L code length exceeds 15")
        # Kraft completeness: real streams must carry exact codes
        kraft = sum(1 << (_MAX_CODE_LEN - l) for l, _ in nz)
        if kraft != 1 << _MAX_CODE_LEN:
            raise ValueError("over/under-subscribed VP8L prefix code")
        bl_count = [0] * (_MAX_CODE_LEN + 1)
        for l, _ in nz:
            bl_count[l] += 1
        next_code = [0] * (_MAX_CODE_LEN + 2)
        code = 0
        for l in range(1, _MAX_CODE_LEN + 1):
            code = (code + bl_count[l - 1]) << 1
            next_code[l] = code
        table: dict[tuple[int, int], int] = {}
        for l, s in sorted(nz, key=lambda t: (t[0], t[1])):
            table[(l, next_code[l])] = s
            next_code[l] += 1
        self.table = table

    def read(self, br: _Bits) -> int:
        if self.trivial is not None:
            return self.trivial
        code = 0
        length = 0
        table = self.table
        for _ in range(_MAX_CODE_LEN):
            code = (code << 1) | br.bit()
            length += 1
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("VP8L prefix walk exceeded 15 bits")


def _read_prefix_code(br: _Bits, alphabet_size: int) -> _Prefix:
    """One prefix code: the simple 1-2-symbol form, or code lengths
    coded through the code-length code (with 16/17/18 repeats and the
    optional max_symbol cap)."""
    if br.bit():  # simple code
        num_symbols = br.bit() + 1
        if br.bit():  # 8-bit first symbol
            sym0 = br.bits(8)
        else:
            sym0 = br.bit()
        lengths = [0] * alphabet_size
        if sym0 >= alphabet_size:
            raise ValueError("VP8L simple-code symbol out of range")
        if num_symbols == 2:
            sym1 = br.bits(8)
            if sym1 >= alphabet_size:
                raise ValueError("VP8L simple-code symbol out of range")
            lengths[sym0] = 1
            lengths[sym1] = 1
        else:
            lengths[sym0] = 1  # trivial: _Prefix treats 1 symbol as 0-bit
        return _Prefix(lengths)
    num_codes = 4 + br.bits(4)
    cl_lengths = [0] * 19
    for i in range(num_codes):
        cl_lengths[_CL_ORDER[i]] = br.bits(3)
    cl_code = _Prefix(cl_lengths) if any(cl_lengths) else None
    if cl_code is None:
        raise ValueError("VP8L code-length code with no symbols")
    if br.bit():  # length-capped read
        length_nbits = 2 + 2 * br.bits(3)
        max_symbol = 2 + br.bits(length_nbits)
    else:
        max_symbol = alphabet_size
    lengths = [0] * alphabet_size
    prev_len = 8  # the spec's default for a leading 16-repeat
    symbol = 0
    while symbol < alphabet_size:
        if max_symbol <= 0:
            break
        max_symbol -= 1
        cl = cl_code.read(br)
        if cl < 16:
            lengths[symbol] = cl
            symbol += 1
            if cl != 0:
                prev_len = cl
        else:
            if cl == 16:
                repeat, fill = 3 + br.bits(2), prev_len
            elif cl == 17:
                repeat, fill = 3 + br.bits(3), 0
            else:  # 18
                repeat, fill = 11 + br.bits(7), 0
            if symbol + repeat > alphabet_size:
                raise ValueError("VP8L code-length repeat overruns alphabet")
            for _ in range(repeat):
                lengths[symbol] = fill
                symbol += 1
    return _Prefix(lengths)


# --- LZ77 prefix values + the generated near-distance map --------------------


def _lz77_prefix(br: _Bits, code: int) -> int:
    """length/distance prefix decode: codes 0-3 are 1-4; beyond that
    each pair of codes doubles the range with (code-2)>>1 extra bits."""
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.bits(extra) + 1


def _gen_distance_map() -> tuple[tuple[int, int], ...]:
    """The 120 (dx, dy) near-distance pairs, GENERATED from their
    defining geometry instead of transcribed: dy 0..7, dx -7..8 with
    dy=0 limited to dx>=1 (120 pairs), sorted by ascending dx^2+dy^2,
    ties by |dx| ascending then positive dx before negative."""
    pairs = [
        (x, y)
        for y in range(8)
        for x in range(-7, 9)
        if y > 0 or x >= 1
    ]
    pairs.sort(key=lambda p: (p[0] * p[0] + p[1] * p[1], abs(p[0]), p[0] < 0))
    assert len(pairs) == 120
    return tuple(pairs)


_DISTANCE_MAP = _gen_distance_map()


def _plane_to_distance(dist_code: int, xsize: int) -> int:
    if dist_code > 120:
        return dist_code - 120
    dx, dy = _DISTANCE_MAP[dist_code - 1]
    return max(dy * xsize + dx, 1)


# --- color cache --------------------------------------------------------------

_CACHE_MULT = 0x1E35A7BD


class _ColorCache:
    __slots__ = ("bits", "slots")

    def __init__(self, bits: int) -> None:
        self.bits = bits
        self.slots = [0] * (1 << bits)

    def key(self, argb: int) -> int:
        return ((_CACHE_MULT * argb) & 0xFFFFFFFF) >> (32 - self.bits)

    def insert(self, argb: int) -> None:
        self.slots[self.key(argb)] = argb

    def insert_many(self, vals: np.ndarray) -> None:
        """Bulk insert preserving in-order last-wins slot state: for
        each distinct key keep the LAST value — equivalent to inserting
        every pixel in order, in O(distinct keys) Python work."""
        keys = ((_CACHE_MULT * vals.astype(np.uint64)) & 0xFFFFFFFF) >> (
            32 - self.bits
        )
        uk, idx = np.unique(keys[::-1], return_index=True)
        last_vals = vals[::-1][idx]
        slots = self.slots
        for k, v in zip(uk.tolist(), last_vals.tolist()):
            slots[k] = int(v)

    def lookup(self, idx: int) -> int:
        return self.slots[idx]


# --- entropy-coded image (spatially-coded ARGB with LZ77 + cache) -------------

_NUM_LENGTH_CODES = 24
_NUM_DIST_CODES = 40


def _sub_size(size: int, bits: int) -> int:
    return (size + (1 << bits) - 1) >> bits


def _backref_copy(out: np.ndarray, pos: int, dist: int, length: int) -> None:
    """LZ77 backward copy with repeat semantics, vectorized: a
    non-overlapping copy is one slice assignment; an overlapping one
    (dist < length) equals tiling the dist-periodic source pattern —
    NOT numpy's memmove-style overlap handling, hence the explicit
    tile. Replaces the per-pixel loop ADVICE r10 flagged as the
    bytes-to-CPU bomb path."""
    end = pos + length
    if dist >= length:
        out[pos:end] = out[pos - dist : end - dist]
    else:
        src = out[pos - dist : pos]
        reps = -(-length // dist)
        out[pos:end] = np.tile(src, reps)[:length]


def _read_code_groups(br: _Bits, cache_bits: int, n_groups: int):
    groups = []
    green_ab = 256 + _NUM_LENGTH_CODES + (1 << cache_bits if cache_bits else 0)
    for _ in range(n_groups):
        groups.append(
            (
                _read_prefix_code(br, green_ab),
                _read_prefix_code(br, 256),  # red
                _read_prefix_code(br, 256),  # blue
                _read_prefix_code(br, 256),  # alpha
                _read_prefix_code(br, _NUM_DIST_CODES),
            )
        )
    return groups


def _decode_pixels(br: _Bits, w: int, h: int, level0: bool) -> np.ndarray:
    """The shared entropy-image decoder: returns a flat uint32 ARGB
    array of w*h pixels. Sub-resolution images (transform data,
    entropy image, palette) call this with level0=False — no meta
    prefix codes there, but they may carry their own color cache."""
    cache_bits = 0
    if br.bit():
        cache_bits = br.bits(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError(f"bad VP8L color-cache size {cache_bits}")
    meta_img = None
    meta_bits = 0
    n_groups = 1
    if level0 and br.bit():  # meta prefix codes
        meta_bits = 2 + br.bits(3)
        mw, mh = _sub_size(w, meta_bits), _sub_size(h, meta_bits)
        meta_raw = _decode_pixels(br, mw, mh, level0=False)
        meta_img = ((meta_raw >> 8) & 0xFFFF).astype(np.int64)
        n_groups = int(meta_img.max()) + 1
        meta_w = mw
    groups = _read_code_groups(br, cache_bits, n_groups)
    cache = _ColorCache(cache_bits) if cache_bits else None
    total = w * h
    out = np.zeros(total, dtype=np.uint32)
    pos = 0
    g_green, g_red, g_blue, g_alpha, g_dist = groups[0]
    cur_meta = 0
    # Decode-cost bound: every event below either consumes >=1 payload
    # bit or takes a vectorized constant/backref fast path, so the loop
    # count is bounded by the payload size. Without this a hostile
    # stream built from 0-bit trivial codes (plus a meta image to dodge
    # the constant fast path) turns a few hundred input bytes into 2^26
    # interpreted iterations — the bytes-to-CPU bomb ADVICE r10 flagged.
    # Spec-VALID streams can also progress on 0 bits (trivial codes
    # under a meta image fill one cell-row span per event — ADVICE r11):
    # those events write >=1 pixel each, so they get their own budget,
    # generous enough for any non-degenerate image (4M spans) while
    # still bounding a hostile 1-px-wide 2^26-px stream to seconds.
    events_left = 8 * len(br.data) + 1024
    zero_events_left = 1 << 22
    prev_bit = br.pos
    prev_pos = pos
    while pos < total:
        if br.pos == prev_bit and pos > prev_pos:
            zero_events_left -= 1
            if zero_events_left <= 0:
                raise ValueError("VP8L zero-bit progress bound exceeded")
        else:
            events_left -= 1
            if events_left <= 0:
                raise ValueError("VP8L decode-cost bound exceeded")
        prev_bit, prev_pos = br.pos, pos
        if meta_img is not None:
            x, y = pos % w, pos // w
            mi = int(meta_img[(y >> meta_bits) * meta_w + (x >> meta_bits)])
            if mi != cur_meta:
                cur_meta = mi
                g_green, g_red, g_blue, g_alpha, g_dist = groups[mi]
        if (
            g_green.trivial is not None
            and g_green.trivial < 256
            and g_red.trivial is not None
            and g_blue.trivial is not None
            and g_alpha.trivial is not None
        ):
            # all-trivial literal group (0 bits/pixel — e.g. a constant
            # image): fill the whole group span vectorized
            pix = (
                (g_alpha.trivial << 24)
                | (g_red.trivial << 16)
                | (g_green.trivial << 8)
                | g_blue.trivial
            )
            if meta_img is None:
                end = total
            else:  # to the end of this meta cell's row span
                x, y = pos % w, pos // w
                end = y * w + min(w, ((x >> meta_bits) + 1) << meta_bits)
            out[pos:end] = pix
            if cache is not None:
                cache.insert(pix)
            pos = end
            continue
        if (
            g_green.trivial is not None
            and g_green.trivial >= 256 + _NUM_LENGTH_CODES
        ):
            # trivial cache symbol: cache slots only change on literal /
            # backref events, so while this group is active the slot is
            # one constant — fill the whole remaining image (no meta
            # image: no other group can ever run) or this meta cell's
            # row span, vectorized (ADVICE r11 edge).
            if cache is None:
                raise ValueError("VP8L cache symbol without a color cache")
            pix = cache.lookup(g_green.trivial - 256 - _NUM_LENGTH_CODES)
            if meta_img is None:
                end = total
            else:
                x, y = pos % w, pos // w
                end = y * w + min(w, ((x >> meta_bits) + 1) << meta_bits)
            out[pos:end] = pix
            pos = end
            continue
        s = g_green.read(br)
        if s < 256:
            red = g_red.read(br)
            blue = g_blue.read(br)
            alpha = g_alpha.read(br)
            pix = (alpha << 24) | (red << 16) | (s << 8) | blue
            out[pos] = pix
            if cache is not None:
                cache.insert(pix)
            pos += 1
        elif s < 256 + _NUM_LENGTH_CODES:
            length = _lz77_prefix(br, s - 256)
            dist_code = _lz77_prefix(br, g_dist.read(br))
            dist = _plane_to_distance(dist_code, w)
            if dist > pos:
                raise ValueError("VP8L backward reference before start")
            if pos + length > total:
                raise ValueError("VP8L backward reference overruns image")
            end = pos + length
            _backref_copy(out, pos, dist, length)
            if cache is not None:
                cache.insert_many(out[pos:end])
            pos = end
        else:
            if cache is None:
                raise ValueError("VP8L cache symbol without a color cache")
            idx = s - 256 - _NUM_LENGTH_CODES
            out[pos] = cache.lookup(idx)
            pos += 1
    return out


# --- transforms (inverse) ------------------------------------------------------

_T_PREDICTOR, _T_COLOR, _T_SUBTRACT_GREEN, _T_COLOR_INDEX = 0, 1, 2, 3

# Only predictor modes whose prediction reads the just-reconstructed
# LEFT pixel nonlinearly (5, 6, 7, 10, 11, 12, 13) are inherently
# sequential and run as an interpreted per-pixel loop; modes 0/2/3/4/
# 8/9 read the previous row only and mode 1 is a per-channel running
# sum, so whole block-row segments of those vectorize (ADVICE r11).
# The interpreted-cost cap therefore counts SLOW-mode pixels only —
# 2^21 of them is seconds of work; beyond that the image refuses
# honestly into quarantine. Env-tunable like the PyAV seam.
_SLOW_PRED_MODES = frozenset((5, 6, 7, 10, 11, 12, 13))


def _pred_slow_cap() -> int:
    import os

    try:
        return int(os.environ.get("SPARK_GRAFT_VP8L_PRED_CAP", str(1 << 21)))
    except ValueError:
        return 1 << 21


def _avg2(a: int, b: int) -> int:
    # per-channel (a+b)>>1 on packed ARGB without unpacking
    return (((a ^ b) & 0xFEFEFEFE) >> 1) + (a & b)


def _select(l: int, t: int, tl: int) -> int:
    pl = pt = 0
    for shift in (24, 16, 8, 0):
        lc = (l >> shift) & 0xFF
        tc = (t >> shift) & 0xFF
        tlc = (tl >> shift) & 0xFF
        p = lc + tc - tlc
        pl += abs(p - lc)
        pt += abs(p - tc)
    return l if pl < pt else t


def _clamp_add_sub_full(l: int, t: int, tl: int) -> int:
    out = 0
    for shift in (24, 16, 8, 0):
        v = ((l >> shift) & 0xFF) + ((t >> shift) & 0xFF) - ((tl >> shift) & 0xFF)
        out |= (0 if v < 0 else 255 if v > 255 else v) << shift
    return out


def _clamp_add_sub_half(ave: int, tl: int) -> int:
    out = 0
    for shift in (24, 16, 8, 0):
        a = (ave >> shift) & 0xFF
        b = (tl >> shift) & 0xFF
        # C truncation toward zero (the spec / libwebp semantics), NOT
        # Python floor: for a < b with odd difference they differ by 1.
        d = a - b
        v = a + (-(-d >> 1) if d < 0 else d >> 1)
        out |= (0 if v < 0 else 255 if v > 255 else v) << shift
    return out


def _predict(mode: int, l: int, t: int, tr: int, tl: int) -> int:
    if mode == 0:
        return 0xFF000000
    if mode == 1:
        return l
    if mode == 2:
        return t
    if mode == 3:
        return tr
    if mode == 4:
        return tl
    if mode == 5:
        return _avg2(_avg2(l, tr), t)
    if mode == 6:
        return _avg2(l, tl)
    if mode == 7:
        return _avg2(l, t)
    if mode == 8:
        return _avg2(tl, t)
    if mode == 9:
        return _avg2(t, tr)
    if mode == 10:
        return _avg2(_avg2(l, tl), _avg2(t, tr))
    if mode == 11:
        return _select(l, t, tl)
    if mode == 12:
        return _clamp_add_sub_full(l, t, tl)
    if mode == 13:
        return _clamp_add_sub_half(_avg2(l, t), tl)
    raise ValueError(f"bad VP8L predictor mode {mode}")


def _add_pixels(a: int, b: int) -> int:
    # per-channel (a+b) & 0xff on packed ARGB
    out = 0
    for shift in (24, 16, 8, 0):
        out |= ((((a >> shift) & 0xFF) + ((b >> shift) & 0xFF)) & 0xFF) << shift
    return out


def _inverse_predictor(argb: np.ndarray, w: int, h: int, bits: int,
                       pred_img: np.ndarray) -> None:
    pw = _sub_size(w, bits)
    data = argb  # flat uint32, residuals in, pixels out (in place)
    img = data[: w * h].reshape(h, w)
    # little-endian channel bytes: [..., 0]=B [..., 1]=G [..., 2]=R
    # [..., 3]=A; uint8 arithmetic wraps mod 256, the spec's rule
    ch = img.view(np.uint8).reshape(h, w, 4)
    modes = ((pred_img.reshape(-1, pw) >> 8) & 0xF).astype(np.int64)
    slow_left = _pred_slow_cap()
    # row 0: (0,0) is black-predicted, every other pixel L-predicted —
    # one per-channel running sum
    ch[0, 0, 3] += 0xFF
    img[0, :] = (
        np.cumsum(ch[0].astype(np.uint32), axis=0).astype(np.uint8)
        .view(np.uint32)
        .reshape(-1)
    )
    for y in range(1, h):
        ch[y, 0] += ch[y - 1, 0]  # column 0: T-predicted
        mrow = modes[y >> bits]
        for xb in range((w + (1 << bits) - 1) >> bits):
            x0 = max(1, xb << bits)
            x1 = min(w, (xb + 1) << bits)
            if x1 <= x0:
                continue
            mode = int(mrow[xb])
            if mode in _SLOW_PRED_MODES:
                slow_left -= x1 - x0
                if slow_left < 0:
                    raise ValueError(
                        "VP8L predictor transform exceeds the interpreted-"
                        f"decode pixel cap (slow modes > {_pred_slow_cap()})"
                    )
                row = y * w
                for x in range(x0, x1):
                    l = int(data[row + x - 1])
                    t = int(data[row - w + x])
                    tl = int(data[row - w + x - 1])
                    # TR of the last column wraps to the current row's
                    # first pixel (the contiguous-memory rule)
                    tr = (
                        int(data[row - w + x + 1]) if x + 1 < w
                        else int(data[row])
                    )
                    pred = _predict(mode, l, t, tr, tl)
                    data[row + x] = _add_pixels(int(data[row + x]), pred)
                continue
            if mode == 0:
                ch[y, x0:x1, 3] += 0xFF
            elif mode == 1:  # L: running sum seeded by the left pixel
                seg = ch[y, x0 - 1 : x1].astype(np.uint32)
                img[y, x0:x1] = (
                    np.cumsum(seg, axis=0)[1:].astype(np.uint8)
                    .view(np.uint32)
                    .reshape(-1)
                )
            elif mode == 2:  # T
                ch[y, x0:x1] += ch[y - 1, x0:x1]
            elif mode == 3:  # TR (last column wraps to row start)
                tr = np.empty((x1 - x0, 4), dtype=np.uint8)
                tr[: min(x1 + 1, w) - (x0 + 1)] = ch[y - 1, x0 + 1 : x1 + 1]
                if x1 == w:
                    tr[-1] = ch[y, 0]
                ch[y, x0:x1] += tr
            elif mode == 4:  # TL
                ch[y, x0:x1] += ch[y - 1, x0 - 1 : x1 - 1]
            elif mode in (8, 9):  # avg2(TL, T) / avg2(T, TR)
                t = ch[y - 1, x0:x1].astype(np.uint16)
                if mode == 8:
                    other = ch[y - 1, x0 - 1 : x1 - 1].astype(np.uint16)
                else:
                    other = np.empty((x1 - x0, 4), dtype=np.uint16)
                    other[: min(x1 + 1, w) - (x0 + 1)] = ch[
                        y - 1, x0 + 1 : x1 + 1
                    ]
                    if x1 == w:
                        other[-1] = ch[y, 0]
                ch[y, x0:x1] += (((t + other) >> 1)).astype(np.uint8)
            else:
                raise ValueError(f"bad VP8L predictor mode {mode}")


def _inverse_color_transform(argb: np.ndarray, w: int, h: int, bits: int,
                             cte_img: np.ndarray) -> np.ndarray:
    pw = _sub_size(w, bits)
    img = argb.reshape(h, w)
    # per-pixel multipliers, expanded from the block image
    ys = np.arange(h) >> bits
    xs = np.arange(w) >> bits
    cte = cte_img.reshape(-1)[(ys[:, None] * pw + xs[None, :])]
    g2r = ((cte & 0xFF).astype(np.int32) ^ 0x80) - 0x80  # int8 view
    g2b = (((cte >> 8) & 0xFF).astype(np.int32) ^ 0x80) - 0x80
    r2b = (((cte >> 16) & 0xFF).astype(np.int32) ^ 0x80) - 0x80
    green = ((img >> 8) & 0xFF).astype(np.int32)
    g_s = (green ^ 0x80) - 0x80  # int8 of the green byte
    red = ((img >> 16) & 0xFF).astype(np.int32)
    blue = (img & 0xFF).astype(np.int32)
    new_red = (red + ((g2r * g_s) >> 5)) & 0xFF
    nr_s = (new_red ^ 0x80) - 0x80  # int8 of the RESTORED red
    new_blue = (blue + ((g2b * g_s) >> 5) + ((r2b * nr_s) >> 5)) & 0xFF
    out = (
        (img & np.uint32(0xFF00FF00))
        | (new_red.astype(np.uint32) << 16)
        | new_blue.astype(np.uint32)
    )
    return out.reshape(-1).astype(np.uint32)


def _inverse_subtract_green(argb: np.ndarray) -> np.ndarray:
    green = (argb >> 8) & 0xFF
    red = (((argb >> 16) & 0xFF) + green) & 0xFF
    blue = ((argb & 0xFF) + green) & 0xFF
    return (argb & np.uint32(0xFF00FF00)) | (red << np.uint32(16)) | blue


def _inverse_color_index(packed: np.ndarray, w: int, h: int,
                         palette: np.ndarray) -> np.ndarray:
    """Unbundle sub-byte indices from the green channel and look up
    the palette; out-of-range indices decode as 0 (the spec rule)."""
    n = len(palette)
    xbits = 3 if n <= 2 else 2 if n <= 4 else 1 if n <= 16 else 0
    pal = np.zeros(256, dtype=np.uint32)
    pal[:n] = palette
    if xbits == 0:
        idx = ((packed >> 8) & 0xFF).astype(np.int64)
        idx[idx >= n] = 255  # -> 0 slot beyond the palette
        return pal[np.minimum(idx, 255)] * (idx < n)
    pw = _sub_size(w, xbits)
    per = 1 << xbits  # indices per packed green byte
    ibits = 8 >> xbits  # bits per index
    green = ((packed.reshape(h, pw) >> 8) & 0xFF).astype(np.int64)
    ks = np.arange(per) * ibits
    idx = (green[:, :, None] >> ks[None, None, :]) & ((1 << ibits) - 1)
    idx = idx.reshape(h, pw * per)[:, :w]
    out = pal[idx] * (idx < n)
    return out.reshape(-1).astype(np.uint32)


# --- top-level decode -----------------------------------------------------------


def decode_vp8l(payload: bytes) -> np.ndarray:
    """VP8L chunk payload -> (H, W, 3|4) uint8 (RGBA when any alpha
    < 255, else RGB)."""
    payload = bytes(payload)
    if len(payload) < 5 or payload[0] != 0x2F:
        raise ValueError("bad VP8L signature")
    head = int.from_bytes(payload[1:5], "little")
    w = (head & 0x3FFF) + 1
    h = ((head >> 14) & 0x3FFF) + 1
    if (head >> 29) & 7:
        raise ValueError("unknown VP8L version")
    _check_pixels(w, h, "WebP")
    br = _Bits(payload[5:])
    cur_w = w
    transforms = []  # (type, params) in read order
    seen = set()
    while br.bit():
        ttype = br.bits(2)
        if ttype in seen:
            raise ValueError("VP8L transform repeated")
        seen.add(ttype)
        if ttype in (_T_PREDICTOR, _T_COLOR):
            tbits = 2 + br.bits(3)
            tw, th = _sub_size(cur_w, tbits), _sub_size(h, tbits)
            timg = _decode_pixels(br, tw, th, level0=False)
            transforms.append((ttype, (cur_w, tbits, timg)))
        elif ttype == _T_SUBTRACT_GREEN:
            transforms.append((ttype, None))
        else:  # color indexing
            n_colors = br.bits(8) + 1
            praw = _decode_pixels(br, n_colors, 1, level0=False)
            # palette entries are delta-coded componentwise
            pal = np.zeros(n_colors, dtype=np.uint32)
            prev = 0
            for i in range(n_colors):
                prev = _add_pixels(prev, int(praw[i]))
                pal[i] = prev
            xbits = 3 if n_colors <= 2 else 2 if n_colors <= 4 else (
                1 if n_colors <= 16 else 0
            )
            transforms.append((ttype, (cur_w, pal)))
            cur_w = _sub_size(cur_w, xbits)
    argb = _decode_pixels(br, cur_w, h, level0=True)
    for ttype, params in reversed(transforms):
        if ttype == _T_PREDICTOR:
            tr_w, tbits, timg = params
            _inverse_predictor(argb, tr_w, h, tbits, timg)
        elif ttype == _T_COLOR:
            tr_w, tbits, timg = params
            argb = _inverse_color_transform(argb, tr_w, h, tbits, timg)
        elif ttype == _T_SUBTRACT_GREEN:
            argb = _inverse_subtract_green(argb)
        else:
            tr_w, pal = params
            argb = _inverse_color_index(argb, tr_w, h, pal)
    argb = argb.reshape(h, w)
    out = np.empty((h, w, 4), dtype=np.uint8)
    out[:, :, 0] = (argb >> 16) & 0xFF
    out[:, :, 1] = (argb >> 8) & 0xFF
    out[:, :, 2] = argb & 0xFF
    out[:, :, 3] = (argb >> 24) & 0xFF
    if (out[:, :, 3] == 255).all():
        return np.ascontiguousarray(out[:, :, :3])
    return out


# --- encoder twin ---------------------------------------------------------------


def _huffman_lengths(freqs: dict[int, int], alphabet: int) -> list[int]:
    """Code lengths (<=15) for the given symbol frequencies — heap
    Huffman; fixture inputs never get near the depth limit, and the
    guard raises rather than emitting an invalid stream."""
    items = [(f, s) for s, f in freqs.items() if f > 0]
    lengths = [0] * alphabet
    if not items:
        raise ValueError("empty histogram")
    if len(items) == 1:
        lengths[items[0][1]] = 1
        return lengths
    heap = [(f, i, (s,)) for i, (f, s) in enumerate(items)]
    heapq.heapify(heap)
    nxt = len(heap)
    while len(heap) > 1:
        f1, _, s1 = heapq.heappop(heap)
        f2, _, s2 = heapq.heappop(heap)
        for s in s1 + s2:
            lengths[s] += 1
        heapq.heappush(heap, (f1 + f2, nxt, s1 + s2))
        nxt += 1
    if max(lengths) > _MAX_CODE_LEN:
        raise ValueError("fixture huffman exceeded 15 bits")
    return lengths


def _canonical_codes(lengths: list[int]) -> dict[int, tuple[int, int]]:
    bl_count = [0] * (_MAX_CODE_LEN + 1)
    for l in lengths:
        if l:
            bl_count[l] += 1
    next_code = [0] * (_MAX_CODE_LEN + 2)
    code = 0
    for l in range(1, _MAX_CODE_LEN + 1):
        code = (code + bl_count[l - 1]) << 1
        next_code[l] = code
    out = {}
    for s, l in enumerate(lengths):
        if l:
            out[s] = (next_code[l], l)
            next_code[l] += 1
    return out


class _BitWriter:
    __slots__ = ("buf", "acc", "nb")

    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nb = 0

    def bits(self, val: int, k: int) -> None:
        self.acc |= (val & ((1 << k) - 1)) << self.nb
        self.nb += k
        while self.nb >= 8:
            self.buf.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nb -= 8

    def code(self, code: int, length: int) -> None:
        # prefix codes are written MSB-first (the decoder's walk order)
        for i in range(length - 1, -1, -1):
            self.bits((code >> i) & 1, 1)

    def done(self) -> bytes:
        if self.nb:
            self.buf.append(self.acc & 0xFF)
            self.acc = 0
            self.nb = 0
        return bytes(self.buf)


def _balanced_lengths(used: list[int], alphabet: int) -> list[int]:
    """Exactly-complete code over the used symbols: k symbols get
    lengths L/L-1 with 2^L - k of them shortened (Kraft == 1) — the
    depth-limit fallback when heap Huffman exceeds a field's cap."""
    k = len(used)
    lengths = [0] * alphabet
    if k == 1:
        lengths[used[0]] = 1
        return lengths
    L = (k - 1).bit_length()
    n_short = (1 << L) - k
    for i, s in enumerate(sorted(used)):
        lengths[s] = L - 1 if i < n_short else L
    return lengths


def _length_rle(lengths: list[int]) -> list[tuple[int, int, int]]:
    """Code lengths -> (cl_symbol, extra, extra_bits) stream using the
    16/17/18 repeat symbols, so fixture round trips exercise them."""
    syms: list[tuple[int, int, int]] = []
    i, n = 0, len(lengths)
    while i < n:
        l = lengths[i]
        run = 1
        while i + run < n and lengths[i + run] == l:
            run += 1
        i += run
        if l == 0:
            while run >= 11:
                take = min(run, 138)
                syms.append((18, take - 11, 7))
                run -= take
            while run >= 3:
                take = min(run, 10)
                syms.append((17, take - 3, 3))
                run -= take
            syms.extend((0, 0, 0) for _ in range(run))
        else:
            syms.append((l, 0, 0))
            run -= 1
            while run >= 3:
                take = min(run, 6)
                syms.append((16, take - 3, 2))
                run -= take
            syms.extend((l, 0, 0) for _ in range(run))
    return syms


def _write_code(bw: _BitWriter, freqs: dict[int, int], alphabet: int):
    """Write one prefix code (simple form for <=2 symbols under 256,
    else the full code-length-coded form) and return {sym: (code,
    len)} for payload writing — zero-length for a trivial code."""
    used = sorted(s for s, f in freqs.items() if f > 0)
    if not used:
        used = [0]
    if len(used) <= 2 and used[-1] <= 255:
        bw.bits(1, 1)  # simple
        bw.bits(len(used) - 1, 1)
        if used[0] <= 1:
            bw.bits(0, 1)  # 1-bit first symbol
            bw.bits(used[0], 1)
        else:
            bw.bits(1, 1)
            bw.bits(used[0], 8)
        if len(used) == 1:
            return {used[0]: (0, 0)}
        bw.bits(used[1], 8)
        return {used[0]: (0, 1), used[1]: (1, 1)}
    try:
        lengths = _huffman_lengths({s: freqs[s] for s in used}, alphabet)
    except ValueError:
        lengths = _balanced_lengths(used, alphabet)
    syms = _length_rle(lengths)
    cl_freqs: dict[int, int] = {}
    for s, _, _ in syms:
        cl_freqs[s] = cl_freqs.get(s, 0) + 1
    cl_lengths = _huffman_lengths(cl_freqs, 19)
    if max(cl_lengths) > 7:  # 3-bit length fields
        cl_lengths = _balanced_lengths(
            sorted(cl_freqs), 19
        )
    bw.bits(0, 1)  # not simple
    bw.bits(15, 4)  # num_code_lengths = 4 + 15 = 19
    for s in _CL_ORDER:
        bw.bits(cl_lengths[s], 3)
    cl_codes = _canonical_codes(cl_lengths)
    bw.bits(0, 1)  # no max_symbol cap
    for s, extra, ebits in syms:
        c, ln = cl_codes[s]
        bw.code(c, ln)
        if ebits:
            bw.bits(extra, ebits)
    return _canonical_codes(lengths)


def _sub_pixels(a: int, b: int) -> int:
    out = 0
    for shift in (24, 16, 8, 0):
        out |= ((((a >> shift) & 0xFF) - ((b >> shift) & 0xFF)) & 0xFF) << shift
    return out


def _lz77_encode(value: int) -> tuple[int, int, int]:
    """value -> (prefix code, extra payload, extra bits) — the exact
    inverse of _lz77_prefix."""
    if value <= 4:
        return value - 1, 0, 0
    for code in range(4, 40):
        extra = (code - 2) >> 1
        lo = ((2 + (code & 1)) << extra) + 1
        if lo <= value <= lo + (1 << extra) - 1:
            return code, value - lo, extra
    raise ValueError(f"LZ77 value {value} out of range")


def encode_vp8l(
    img: np.ndarray,
    subtract_green: bool = False,
    predictor: int | None = None,
    palette: bool = False,
    cache_bits: int = 0,
    use_runs: bool = True,
) -> bytes:
    """Fixture twin: a real VP8L stream for (H, W, 1|3|4) uint8 input.
    Options pick which decode paths the stream exercises — the
    transforms (uniform-mode predictor sub-image written with simple
    codes, subtract-green, delta-coded palette with sub-byte
    bundling), the color cache, and dist-1 run backrefs."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, c = img.shape
    if c == 1:
        img = np.repeat(img, 3, axis=2)
        c = 3
    if c not in (3, 4):
        raise ValueError(f"VP8L encode supports 1/3/4 channels, got {c}")
    if w > 0x4000 or h > 0x4000:
        raise ValueError("VP8L dimensions exceed 14 bits")
    alpha = (
        img[:, :, 3].astype(np.uint32)
        if c == 4
        else np.full((h, w), 255, dtype=np.uint32)
    )
    argb = (
        (alpha << 24)
        | (img[:, :, 0].astype(np.uint32) << 16)
        | (img[:, :, 1].astype(np.uint32) << 8)
        | img[:, :, 2].astype(np.uint32)
    ).reshape(-1)

    bw = _BitWriter()
    cur_w = w
    if palette and (predictor is not None or subtract_green):
        raise ValueError("palette fixture is exclusive of other transforms")
    if predictor is not None:
        if not 0 <= predictor <= 13:
            raise ValueError("predictor mode 0..13")
        bw.bits(1, 1)
        bw.bits(_T_PREDICTOR, 2)
        tbits = 2  # block size 4
        bw.bits(tbits - 2, 3)
        # residuals under the uniform mode (same edge rules as decode)
        res = np.empty_like(argb)
        for y in range(h):
            row = y * w
            for x in range(w):
                if y == 0 and x == 0:
                    pred = 0xFF000000
                elif y == 0:
                    pred = int(argb[row + x - 1])
                elif x == 0:
                    pred = int(argb[row - w + x])
                else:
                    l = int(argb[row + x - 1])
                    t = int(argb[row - w + x])
                    tl = int(argb[row - w + x - 1])
                    tr = (
                        int(argb[row - w + x + 1]) if x + 1 < w else int(argb[row])
                    )
                    pred = _predict(predictor, l, t, tr, tl)
                res[row + x] = _sub_pixels(int(argb[row + x]), pred)
        argb = res
        # the mode sub-image: every pixel = mode in green — pure
        # simple codes, zero payload bits per pixel
        bw.bits(0, 1)  # no cache in the sub-image
        for freqs, ab in (
            ({predictor: 1}, 256 + _NUM_LENGTH_CODES),
            ({0: 1}, 256),
            ({0: 1}, 256),
            ({0xFF: 1}, 256),
            ({0: 1}, _NUM_DIST_CODES),
        ):
            _write_code(bw, freqs, ab)
        # green symbol is trivial (0 bits/pixel): no payload needed
    if subtract_green:
        bw.bits(1, 1)
        bw.bits(_T_SUBTRACT_GREEN, 2)
        green = (argb >> 8) & 0xFF
        red = (((argb >> 16) & 0xFF) - green) & 0xFF
        blue = ((argb & 0xFF) - green) & 0xFF
        argb = (argb & np.uint32(0xFF00FF00)) | (red << np.uint32(16)) | blue
    if palette:
        colors, inverse = np.unique(argb, return_inverse=True)
        n_colors = len(colors)
        if n_colors > 256:
            raise ValueError("palette fixture needs <=256 distinct colors")
        bw.bits(1, 1)
        bw.bits(_T_COLOR_INDEX, 2)
        bw.bits(n_colors - 1, 8)
        # delta-coded palette as a 1-row literal image (no cache)
        deltas = []
        prev = 0
        for col in colors.tolist():
            deltas.append(_sub_pixels(int(col), prev))
            prev = int(col)
        bw.bits(0, 1)  # no cache
        codes = []
        for ch_shift, ab in ((8, 256 + _NUM_LENGTH_CODES), (16, 256), (0, 256), (24, 256)):
            freqs: dict[int, int] = {}
            for d in deltas:
                v = (d >> ch_shift) & 0xFF
                freqs[v] = freqs.get(v, 0) + 1
            codes.append(_write_code(bw, freqs, ab))
        _write_code(bw, {0: 1}, _NUM_DIST_CODES)
        g_codes, r_codes, b_codes, a_codes = codes
        for d in deltas:
            for tbl, shift in (
                (g_codes, 8), (r_codes, 16), (b_codes, 0), (a_codes, 24)
            ):
                cd, ln = tbl[(d >> shift) & 0xFF]
                bw.code(cd, ln)
        xbits = 3 if n_colors <= 2 else 2 if n_colors <= 4 else (
            1 if n_colors <= 16 else 0
        )
        if xbits:
            per = 1 << xbits
            ibits = 8 >> xbits
            pw = _sub_size(w, xbits)
            idx2 = inverse.reshape(h, w)
            packed = np.zeros((h, pw), dtype=np.uint32)
            for k in range(per):
                cols = idx2[:, k::per]
                packed[:, : cols.shape[1]] |= cols.astype(np.uint32) << (
                    k * ibits
                )
            argb = (np.uint32(0xFF000000) | (packed << np.uint32(8))).reshape(-1)
            cur_w = pw
        else:
            argb = (
                np.uint32(0xFF000000)
                | (inverse.astype(np.uint32) << np.uint32(8))
            ).reshape(-1)
    bw.bits(0, 1)  # end of transforms

    # --- pixel stream ---------------------------------------------------
    if cache_bits:
        bw.bits(1, 1)
        bw.bits(cache_bits, 4)
    else:
        bw.bits(0, 1)
    bw.bits(0, 1)  # no meta prefix codes
    cache = _ColorCache(cache_bits) if cache_bits else None
    events: list[tuple] = []
    g_f: dict[int, int] = {}
    r_f: dict[int, int] = {}
    b_f: dict[int, int] = {}
    a_f: dict[int, int] = {}
    d_f: dict[int, int] = {}
    px = argb.tolist()
    total = len(px)
    i = 0
    while i < total:
        pix = px[i]
        if use_runs and i > 0 and pix == px[i - 1]:
            run = 1
            while i + run < total and px[i + run] == pix and run < 4096:
                run += 1
            if run >= 4:
                lc, lex, leb = _lz77_encode(run)
                dc, dex, deb = _lz77_encode(1 + 120)  # dist 1, direct form
                events.append(("copy", lc, lex, leb, dc, dex, deb))
                g_f[256 + lc] = g_f.get(256 + lc, 0) + 1
                d_f[dc] = d_f.get(dc, 0) + 1
                if cache is not None:
                    for _ in range(run):
                        cache.insert(pix)
                i += run
                continue
        if cache is not None:
            k = cache.key(pix)
            if cache.slots[k] == pix and i > 0:
                sym = 256 + _NUM_LENGTH_CODES + k
                events.append(("cache", sym))
                g_f[sym] = g_f.get(sym, 0) + 1
                i += 1
                continue
            cache.insert(pix)
        g = (pix >> 8) & 0xFF
        r = (pix >> 16) & 0xFF
        b = pix & 0xFF
        a = (pix >> 24) & 0xFF
        events.append(("lit", g, r, b, a))
        g_f[g] = g_f.get(g, 0) + 1
        r_f[r] = r_f.get(r, 0) + 1
        b_f[b] = b_f.get(b, 0) + 1
        a_f[a] = a_f.get(a, 0) + 1
        i += 1
    if not r_f:  # all pixels were runs/cache of pixel 0? keep codes valid
        r_f, b_f, a_f = {0: 1}, {0: 1}, {0xFF: 1}
    if not d_f:
        d_f = {0: 1}
    green_ab = 256 + _NUM_LENGTH_CODES + ((1 << cache_bits) if cache_bits else 0)
    g_codes = _write_code(bw, g_f, green_ab)
    r_codes = _write_code(bw, r_f, 256)
    b_codes = _write_code(bw, b_f, 256)
    a_codes = _write_code(bw, a_f, 256)
    d_codes = _write_code(bw, d_f, _NUM_DIST_CODES)
    for ev in events:
        if ev[0] == "lit":
            _, g, r, b, a = ev
            bw.code(*g_codes[g])
            bw.code(*r_codes[r])
            bw.code(*b_codes[b])
            bw.code(*a_codes[a])
        elif ev[0] == "cache":
            bw.code(*g_codes[ev[1]])
        else:
            _, lc, lex, leb, dc, dex, deb = ev
            bw.code(*g_codes[256 + lc])
            if leb:
                bw.bits(lex, leb)
            bw.code(*d_codes[dc])
            if deb:
                bw.bits(dex, deb)
    head = (w - 1) | ((h - 1) << 14)
    if c == 4:
        head |= 1 << 28
    return bytes([0x2F]) + head.to_bytes(4, "little") + bw.done()


def encode_webp_lossless(img: np.ndarray, **kw) -> bytes:
    """RIFF-wrapped lossless WebP fixture (the decodable twin of
    codecs.encode_webp_skeleton)."""
    payload = encode_vp8l(img, **kw)
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunk += b"\x00"
    body = b"WEBP" + chunk
    return b"RIFF" + struct.pack("<I", len(body)) + body
