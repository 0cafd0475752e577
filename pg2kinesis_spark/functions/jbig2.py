"""JBIG2 (ITU-T T.88) decode — the scanned-PDF plate tier (VERDICT
r11 item 3; symbol/text coding added in the round-12 second half).

Scope: the MQ arithmetic coder (decoder + encoder twin), generic
region decoding for templates 0-3 with movable AT pixels and TPGDON
typical prediction, SYMBOL DICTIONARIES + TEXT REGIONS (§6.4/§6.5
arithmetic variants — the coding mode real scanner output uses for
text pages: the Annex A integer arithmetic procedures IADH/IADW/
IAEX/IADT/IAFS/IADS/IAIT/IAID are pure PROCEDURE, no value tables,
so they pass the house transcription rule), embedded-organization
segment parsing (the layout PDF /JBIG2Decode streams use: no file
header, page association segments), page composition (OR / default
pixel), and encoder twins that emit real embedded streams (generic
plates via encode_jbig2; dictionary + text pages via
encode_jbig2_text, incl. the split-globals PDF layout) for fixtures.

Constants policy (house rule — derive > cross-checked transcription >
honest refusal):

* The MQ Qe/NMPS/NLPS/SWITCH table below is printed IDENTICALLY in
  two independent standards — T.88 Annex E and T.800 (JPEG 2000) —
  which satisfies the dual-source cross-check; structural checks at
  import: NMPS chain monotone into the final state, SWITCH set
  exactly at the three fast-attack states (0/6/14), state 46
  self-loops, every Qe < 0x8000.
* The coder PROCEDURES (INITDEC/DECODE/BYTEIN, the encoder's
  CODEMPS/CODELPS/BYTEOUT/FLUSH) are published flowcharts, verified
  here by the encoder/decoder pair consistency under fuzzed symbol
  streams (tests/test_jbig2.py) — the pair partitions [0, A) the
  same way on both sides, so a transcription slip desyncs round
  trips immediately.
* The generic-region CONTEXT layouts are transcribed from the spec
  figures (fixed pixels + nominal AT slots, context bits ordered row
  y-2, y-1, y, left to right, MSB first). Round trips cannot verify
  the ORDER against other implementations (encoder and decoder share
  it), so that residual interop risk is documented here and covered
  by the PyMuPDF cross-decoder test in the docker twin
  (tests/test_jbig2.py::test_pymupdf_cross_decoder), which renders a
  plate through an independent JBIG2 implementation.
* The integer-arithmetic PREV threading (Annex A: contexts selected
  by the bit path, capped at 9 bits) and the text-region placement
  walks (§6.4.5: strip deltas, refcorner/transposed geometry, the
  CURS advance) are likewise encoder/decoder-shared procedure —
  their interop receipt is test_pymupdf_cross_decoder_symbol_text.

MMR-coded generic regions route to the CCITT T.6/G4 kernel (MMR IS
T.6 coding — the TIFF-compression-4 precedent). Refusals (by name):
Huffman-coded symbol dictionaries and text regions, refinement /
aggregation, shared coding contexts, halftone / pattern segments,
unknown data length, auxiliary (intermediate) buffers. Decode cost
is capped (interpreted per-pixel MQ work, symbol pixel budget,
instance-count bound) like the VP8L predictor cap.

Reference: /root/reference/pg2kinesis has no image surface; this is
the training-data tier. Format per ITU-T T.88 (public); no code
consulted.
"""

from __future__ import annotations

import os
import struct

import numpy as np

# --- MQ coder state table (T.88 Annex E == T.800) ------------------------------
# (Qe, NMPS, NLPS, SWITCH)
_QE = (
    (0x5601, 1, 1, 1), (0x3401, 2, 6, 0), (0x1801, 3, 9, 0),
    (0x0AC1, 4, 12, 0), (0x0521, 5, 29, 0), (0x0221, 38, 33, 0),
    (0x5601, 7, 6, 1), (0x5401, 8, 14, 0), (0x4801, 9, 14, 0),
    (0x3801, 10, 14, 0), (0x3001, 11, 17, 0), (0x2401, 12, 18, 0),
    (0x1C01, 13, 20, 0), (0x1601, 29, 21, 0), (0x5601, 15, 14, 1),
    (0x5401, 16, 14, 0), (0x5101, 17, 15, 0), (0x4801, 18, 16, 0),
    (0x3801, 19, 17, 0), (0x3401, 20, 18, 0), (0x3001, 21, 19, 0),
    (0x2801, 22, 19, 0), (0x2401, 23, 20, 0), (0x2201, 24, 21, 0),
    (0x1C01, 25, 22, 0), (0x1801, 26, 23, 0), (0x1601, 27, 24, 0),
    (0x1401, 28, 25, 0), (0x1201, 29, 26, 0), (0x1101, 30, 27, 0),
    (0x0AC1, 31, 28, 0), (0x09C1, 32, 29, 0), (0x08A1, 33, 30, 0),
    (0x0521, 34, 31, 0), (0x0441, 35, 32, 0), (0x02A1, 36, 33, 0),
    (0x0221, 37, 34, 0), (0x0141, 38, 35, 0), (0x0111, 39, 36, 0),
    (0x0085, 40, 37, 0), (0x0049, 41, 38, 0), (0x0025, 42, 39, 0),
    (0x0015, 43, 40, 0), (0x0009, 44, 41, 0), (0x0005, 45, 42, 0),
    (0x0001, 45, 43, 0), (0x5601, 46, 46, 0),
)

# import-time structural checks on the transcription
assert len(_QE) == 47
for _i, (_qe, _nm, _nl, _sw) in enumerate(_QE):
    assert 0 < _qe < 0x8000, _i
    assert 0 <= _nm <= 46 and 0 <= _nl <= 46, _i
assert [_i for _i, t in enumerate(_QE) if t[3]] == [0, 6, 14]
assert _QE[46][1] == 46 and _QE[46][2] == 46  # terminal self-loop
assert _QE[45][1] == 45  # most-adapted state keeps its NMPS
for _i in range(15, 45):  # the steady-state chain marches forward
    assert _QE[_i][1] == _i + 1, _i


class MQDecoder:
    """T.88 software-conventions MQ decoder over a byte string."""

    __slots__ = ("data", "bp", "c", "a", "ct")

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.bp = 0
        b0 = data[0] if data else 0xFF
        self.c = b0 << 16
        self._bytein()
        self.c = (self.c << 7) & 0xFFFFFFFF
        self.ct -= 7
        self.a = 0x8000

    def _bytein(self) -> None:
        data, bp = self.data, self.bp
        b = data[bp] if bp < len(data) else 0xFF
        if b == 0xFF:
            b1 = data[bp + 1] if bp + 1 < len(data) else 0xFF
            if b1 > 0x8F:
                self.c += 0xFF00
                self.ct = 8
            else:
                self.bp = bp + 1
                self.c += b1 << 9
                self.ct = 7
        else:
            self.bp = bp + 1
            b1 = data[bp + 1] if bp + 1 < len(data) else 0xFF
            self.c += b1 << 8
            self.ct = 8

    def decode(self, cx: list) -> int:
        """cx = [state_index, mps] — one adaptive context."""
        i, mps = cx
        qe, nmps, nlps, sw = _QE[i]
        self.a -= qe
        if (self.c >> 16) < qe:
            # bottom interval
            if self.a < qe:  # conditional exchange: bottom is MPS
                d = mps
                cx[0] = nmps
            else:
                d = 1 - mps
                if sw:
                    cx[1] = 1 - mps
                cx[0] = nlps
            self.a = qe
        else:
            self.c -= qe << 16
            if self.a & 0x8000:
                return mps
            if self.a < qe:  # conditional exchange: top is LPS
                d = 1 - mps
                if sw:
                    cx[1] = 1 - mps
                cx[0] = nlps
            else:
                d = mps
                cx[0] = nmps
        while True:  # RENORMD
            if self.ct == 0:
                self._bytein()
            self.a = (self.a << 1) & 0xFFFF
            self.c = (self.c << 1) & 0xFFFFFFFF
            self.ct -= 1
            if self.a & 0x8000:
                break
        return d


class MQEncoder:
    """The encoder twin (T.88 CODEMPS/CODELPS/BYTEOUT/FLUSH)."""

    __slots__ = ("buf", "c", "a", "ct")

    def __init__(self) -> None:
        self.buf = bytearray(b"\x00")  # scratch pre-first byte
        self.c = 0
        self.a = 0x8000
        self.ct = 12

    def _byteout(self) -> None:
        buf = self.buf
        if buf[-1] == 0xFF:
            buf.append((self.c >> 20) & 0xFF)
            self.c &= 0xFFFFF
            self.ct = 7
        elif self.c < 0x8000000:
            buf.append((self.c >> 19) & 0xFF)
            self.c &= 0x7FFFF
            self.ct = 8
        else:
            buf[-1] += 1
            if buf[-1] == 0xFF:
                self.c &= 0x7FFFFFF
                buf.append((self.c >> 20) & 0xFF)
                self.c &= 0xFFFFF
                self.ct = 7
            else:
                buf.append((self.c >> 19) & 0xFF)
                self.c &= 0x7FFFF
                self.ct = 8

    def _renorm(self) -> None:
        while True:
            if self.ct == 0:
                self._byteout()
            self.a = (self.a << 1) & 0xFFFF
            self.c <<= 1
            self.ct -= 1
            if self.a & 0x8000:
                break

    def encode(self, cx: list, d: int) -> None:
        i, mps = cx
        qe, nmps, nlps, sw = _QE[i]
        self.a -= qe
        if d == mps:  # CODEMPS
            if self.a & 0x8000:
                self.c += qe
                return
            if self.a < qe:
                self.a = qe  # exchange: MPS takes the bottom interval
            else:
                self.c += qe
            cx[0] = nmps
            self._renorm()
        else:  # CODELPS
            if self.a < qe:
                self.c += qe  # exchange: LPS takes the top interval
            else:
                self.a = qe
            if sw:
                cx[1] = 1 - mps
            cx[0] = nlps
            self._renorm()

    def flush(self) -> bytes:
        tempc = (self.c + self.a - 1) & 0xFFFF0000
        self.c = tempc if self.c < tempc else tempc + 0x8000
        self.c <<= self.ct
        self._byteout()
        self.c <<= self.ct
        self._byteout()
        if self.buf[-1] != 0xFF:
            self.buf.append(0xFF)
        self.buf.append(0xAC)
        return bytes(self.buf[1:])


# --- integer arithmetic coding (T.88 Annex A) -----------------------------------
#
# Pure PROCEDURE, no value tables: a sign bit, a unary-ish range
# selector, then offset bits — every bit decoded with an adaptive
# context selected by the path so far (PREV threading, capped at 9
# bits). The encoder twin emits the identical walk, so a procedure
# slip desyncs round trips immediately (the MQ-pair evidence class).

_INT_RANGES = (  # (selector depth, offset-bit count, base)
    (2, 0), (4, 4), (6, 20), (8, 84), (12, 340), (32, 4436),
)

_OOB = object()  # out-of-band marker (S=1, V=0)


def _new_int_ctx() -> list:
    """512 adaptive contexts — one IAx statistics block."""
    return [[0, 0] for _ in range(512)]


def _int_decode(dec: MQDecoder, cx: list):
    """IAx decoding procedure -> int or _OOB."""
    prev = 1

    def bit() -> int:
        nonlocal prev
        b = dec.decode(cx[prev])
        prev = ((prev << 1) | b) if prev < 256 else (
            (((prev << 1) | b) & 511) | 256
        )
        return b

    s = bit()
    for i, (nbits, base) in enumerate(_INT_RANGES):
        if i == len(_INT_RANGES) - 1 or not bit():
            v = 0
            for _ in range(nbits):
                v = (v << 1) | bit()
            v += base
            break
    if s and v == 0:
        return _OOB
    return -v if s else v


def _int_encode(enc: MQEncoder, cx: list, value) -> None:
    """Encoder twin of _int_decode (value = int or _OOB)."""
    prev = 1

    def bit(b: int) -> None:
        nonlocal prev
        enc.encode(cx[prev], b)
        prev = ((prev << 1) | b) if prev < 256 else (
            (((prev << 1) | b) & 511) | 256
        )

    if value is _OOB:
        s, v = 1, 0
    else:
        s = 1 if value < 0 else 0
        v = -value if value < 0 else value
        if s and v == 0:
            raise ValueError("-0 is the OOB codepoint")
    bit(s)
    for i, (nbits, base) in enumerate(_INT_RANGES):
        top = base + (1 << nbits) - 1
        if v <= top or i == len(_INT_RANGES) - 1:
            if i < len(_INT_RANGES) - 1:
                bit(0)
            off = v - base
            if off < 0 or off >= (1 << nbits):
                raise ValueError(f"integer {value} out of coding range")
            for j in range(nbits - 1, -1, -1):
                bit((off >> j) & 1)
            return
        bit(1)


def _iaid_decode(dec: MQDecoder, cx: list, symcodelen: int) -> int:
    """IAID: symcodelen bits, tree-threaded contexts (§A.3)."""
    prev = 1
    for _ in range(symcodelen):
        b = dec.decode(cx[prev])
        prev = (prev << 1) | b
    return prev - (1 << symcodelen)


def _iaid_encode(enc: MQEncoder, cx: list, symcodelen: int,
                 value: int) -> None:
    prev = 1
    for j in range(symcodelen - 1, -1, -1):
        b = (value >> j) & 1
        enc.encode(cx[prev], b)
        prev = (prev << 1) | b


def _new_iaid_ctx(symcodelen: int) -> list:
    return [[0, 0] for _ in range(1 << (symcodelen + 1))]


# --- generic region templates ---------------------------------------------------
#
# (fixed pixels, nominal AT positions, TPGDON pseudo-context). Fixed
# pixel lists are (dx, dy); the context value orders ALL pixels
# (fixed + AT at their nominal slots) by (dy, dx), MSB first — the
# spec figures' row-major reading. AT pixels keep their bit SLOT when
# moved (the slot is where the nominal position sorts).

_TEMPLATES = {
    0: (
        ((-1, -2), (0, -2), (1, -2),
         (-2, -1), (-1, -1), (0, -1), (1, -1), (2, -1),
         (-4, 0), (-3, 0), (-2, 0), (-1, 0)),
        ((3, -1), (-3, -1), (2, -2), (-2, -2)),
        0x9B25,
    ),
    1: (
        ((-1, -2), (0, -2), (1, -2), (2, -2),
         (-2, -1), (-1, -1), (0, -1), (1, -1), (2, -1),
         (-3, 0), (-2, 0), (-1, 0)),
        ((3, -1),),
        0x0795,
    ),
    2: (
        ((-1, -2), (0, -2), (1, -2),
         (-2, -1), (-1, -1), (0, -1), (1, -1),
         (-2, 0), (-1, 0)),
        ((2, -1),),
        0x00E5,
    ),
    3: (
        ((-3, -1), (-2, -1), (-1, -1), (0, -1), (1, -1),
         (-4, 0), (-3, 0), (-2, 0), (-1, 0)),
        ((2, -1),),
        0x0195,
    ),
}


def _template_pixels(template: int, at: tuple[tuple[int, int], ...]):
    """Ordered (dx, dy) context pixels: AT pixels take the bit slot of
    their NOMINAL position in the (dy, dx) sort, pointing wherever the
    segment header moved them."""
    fixed, nominal, _ = _TEMPLATES[template]
    if len(at) != len(nominal):
        raise ValueError(
            f"template {template} needs {len(nominal)} AT pixels"
        )
    slots = [(pos, pos) for pos in fixed]
    slots += [(nom, actual) for nom, actual in zip(nominal, at)]
    slots.sort(key=lambda s: (s[0][1], s[0][0]))
    return [actual for _nom, actual in slots]


def _jbig2_pixel_cap() -> int:
    try:
        return int(os.environ.get("SPARK_GRAFT_JBIG2_PIXEL_CAP",
                                  str(1 << 21)))
    except ValueError:
        return 1 << 21


def _row_groups(template: int):
    """Nominal-AT row decomposition: [(dy, dx_min, dx_max)] ordered by
    dy — every template's nominal context is three (or two) CONTIGUOUS
    per-row windows, which the fast path shifts incrementally."""
    fixed, nominal, _ = _TEMPLATES[template]
    cols: dict[int, list[int]] = {}
    for dx, dy in list(fixed) + list(nominal):
        cols.setdefault(dy, []).append(dx)
    groups = []
    for dy in sorted(cols):
        xs = sorted(cols[dy])
        assert xs == list(range(xs[0], xs[-1] + 1)), (template, dy)
        groups.append((dy, xs[0], xs[-1]))
    return groups


def decode_generic_region(
    data: bytes,
    width: int,
    height: int,
    template: int = 0,
    at: tuple[tuple[int, int], ...] | None = None,
    tpgdon: bool = False,
) -> np.ndarray:
    """Arithmetically-coded generic region -> bool (H, W) bitmap
    (True = black, the JBIG2 1 pixel). Pixels outside the bitmap read
    0, rows above the first read 0 (the spec's edge convention)."""
    if width <= 0 or height <= 0 or width * height > _jbig2_pixel_cap():
        raise NotImplementedError(
            f"JBIG2 region {width}x{height} exceeds the interpreted-"
            f"decode pixel cap ({_jbig2_pixel_cap()})"
        )
    dec = MQDecoder(data)
    states = _new_gb_states(template)
    return _decode_generic_proc(dec, states, width, height, template,
                                at, tpgdon)


def _new_gb_states(template: int) -> list:
    """Fresh adaptive-context array for a generic-region template —
    shared across every symbol bitmap of one dictionary (§6.5.8.1:
    the states persist, only the MQ stream continues)."""
    if template not in _TEMPLATES:
        raise ValueError(f"bad JBIG2 template {template}")
    fixed, nominal, _ = _TEMPLATES[template]
    nbits = len(fixed) + len(nominal)
    return [[0, 0] for _ in range(1 << nbits)]


def _decode_generic_proc(
    dec: MQDecoder,
    states: list,
    width: int,
    height: int,
    template: int = 0,
    at: tuple[tuple[int, int], ...] | None = None,
    tpgdon: bool = False,
) -> np.ndarray:
    """The §6.2.5 decoding PROCEDURE over an existing MQ decoder and
    context array (the symbol-dictionary reuse seam)."""
    if at is None:
        at = _TEMPLATES[template][1]
    pixels = _template_pixels(template, tuple(at))
    sltp_ctx = _TEMPLATES[template][2]
    sltp_state = states[sltp_ctx]
    rows: list[list[int]] = [[0] * width for _ in range(height)]
    zero = [0] * width
    nominal = tuple(at) == _TEMPLATES[template][1]
    if nominal:
        groups = _row_groups(template)
        # bit position of each group inside the context value
        shifts = []
        total = 0
        for _dy, dmin, dmax in groups:
            total += dmax - dmin + 1
        rem = total
        for dy, dmin, dmax in groups:
            n = dmax - dmin + 1
            rem -= n
            shifts.append((dy, dmin, dmax, rem, (1 << n) - 1))
    ltp = 0
    decode = dec.decode
    for y in range(height):
        if tpgdon:
            if decode(sltp_state):
                ltp ^= 1
            if ltp:
                if y:
                    rows[y] = list(rows[y - 1])
                continue
        row = rows[y]
        if nominal:
            srcs = []
            regs = []
            for dy, dmin, dmax, shift, mask in shifts:
                src = rows[y + dy] if y + dy >= 0 else zero
                srcs.append(src)
                v = 0
                for dx in range(dmin, dmax + 1):
                    v = (v << 1) | (src[dx] if 0 <= dx < width else 0)
                regs.append(v)
            for x in range(width):
                ctx = 0
                for gi, (dy, dmin, dmax, shift, mask) in enumerate(shifts):
                    ctx |= regs[gi] << shift
                bit = decode(states[ctx])
                row[x] = bit
                for gi, (dy, dmin, dmax, shift, mask) in enumerate(shifts):
                    nx = x + 1 + dmax
                    if dy == 0:
                        inc = bit if dmax == -1 else (
                            row[nx] if 0 <= nx < width else 0
                        )
                    else:
                        inc = srcs[gi][nx] if 0 <= nx < width else 0
                    regs[gi] = ((regs[gi] << 1) | inc) & mask
        else:
            for x in range(width):
                ctx = 0
                for dx, dy in pixels:
                    xx, yy = x + dx, y + dy
                    ctx <<= 1
                    if 0 <= yy < height and 0 <= xx < width and (
                        yy < y or (yy == y and xx < x)
                    ):
                        ctx |= rows[yy][xx]
                row[x] = decode(states[ctx])
    return np.array(rows, dtype=bool)


def encode_generic_region(
    bitmap: np.ndarray,
    template: int = 0,
    at: tuple[tuple[int, int], ...] | None = None,
    tpgdon: bool = False,
) -> bytes:
    """Encoder twin: bool (H, W) -> MQ-coded generic region data,
    bit-exact decodable by decode_generic_region. With ``tpgdon`` the
    typical-prediction decision bit is coded per row (rows equal to
    their predecessor cost one bit)."""
    enc = MQEncoder()
    states = _new_gb_states(template)
    _encode_generic_proc(enc, states, bitmap, template, at, tpgdon)
    return enc.flush()


def _encode_generic_proc(
    enc: MQEncoder,
    states: list,
    bitmap: np.ndarray,
    template: int = 0,
    at: tuple[tuple[int, int], ...] | None = None,
    tpgdon: bool = False,
) -> None:
    """Encoding procedure over an existing MQ encoder + context array
    (the symbol-dictionary twin of _decode_generic_proc)."""
    bm = np.asarray(bitmap).astype(bool)
    h, w = bm.shape
    if at is None:
        at = _TEMPLATES[template][1]
    pixels = _template_pixels(template, tuple(at))
    sltp_state = states[_TEMPLATES[template][2]]
    ltp = 0
    for y in range(h):
        if tpgdon:
            typical = 1 if (y > 0 and bool((bm[y] == bm[y - 1]).all())
                            ) else 0
            enc.encode(sltp_state, typical ^ ltp)
            ltp = typical
            if ltp:
                continue
        for x in range(w):
            ctx = 0
            for dx, dy in pixels:
                xx, yy = x + dx, y + dy
                ctx <<= 1
                if 0 <= yy < h and 0 <= xx < w and (
                    yy < y or (yy == y and xx < x)
                ):
                    ctx |= int(bm[yy, xx])
            enc.encode(states[ctx], int(bm[y, x]))


# --- embedded-organization segment stream ---------------------------------------

_SEG_PAGE_INFO = 48
_SEG_END_OF_PAGE = 49
_SEG_END_OF_STRIPE = 50
_SEG_END_OF_FILE = 51
_SEG_GENERIC_IMMEDIATE = 38
_SEG_GENERIC_IMMEDIATE_LOSSLESS = 39
_SEG_GENERIC_INTERMEDIATE = 36
_SEG_SYMBOL_DICT = 0
_SEG_TEXT_INTERMEDIATE = 4
_SEG_TEXT_IMMEDIATE = 6
_SEG_TEXT_IMMEDIATE_LOSSLESS = 7

_SEG_NAMES = {
    16: "pattern dictionary", 20: "intermediate halftone region",
    22: "immediate halftone region",
    23: "immediate lossless halftone region",
    40: "intermediate refinement region",
    42: "immediate refinement region",
    43: "immediate lossless refinement region",
    53: "tables", 62: "extension",
}


def _parse_segment_header(data: bytes, pos: int):
    """-> (segment_number, type, page_assoc, data_start, data_len,
    next_pos, referred_segment_numbers). Embedded organization
    (T.88 §7.2)."""
    if pos + 11 > len(data):
        raise ValueError("JBIG2 segment header truncated")
    seg_num = struct.unpack(">I", data[pos : pos + 4])[0]
    flags = data[pos + 4]
    seg_type = flags & 0x3F
    page_assoc_4 = bool(flags & 0x40)
    p = pos + 5
    rts = data[p]
    if (rts >> 5) == 7:  # long form
        count = struct.unpack(">I", data[p : p + 4])[0] & 0x1FFFFFFF
        p += 4 + (count + 8) // 8  # retain bits
    else:
        count = rts >> 5
        p += 1
    ref_size = 1 if seg_num <= 256 else (2 if seg_num <= 65536 else 4)
    # a huge long-form referred count can push p past the buffer —
    # keep the error contract ValueError, never struct.error/IndexError
    if p + count * ref_size + (4 if page_assoc_4 else 1) + 4 > len(data):
        raise ValueError("JBIG2 segment header truncated")
    refs = []
    for _ in range(count):
        if ref_size == 1:
            refs.append(data[p])
        elif ref_size == 2:
            refs.append(struct.unpack(">H", data[p : p + 2])[0])
        else:
            refs.append(struct.unpack(">I", data[p : p + 4])[0])
        p += ref_size
    if page_assoc_4:
        page = struct.unpack(">I", data[p : p + 4])[0]
        p += 4
    else:
        page = data[p]
        p += 1
    data_len = struct.unpack(">I", data[p : p + 4])[0]
    p += 4
    if data_len == 0xFFFFFFFF:
        raise NotImplementedError(
            "JBIG2 segment with unknown data length"
        )
    if p + data_len > len(data):
        raise ValueError("JBIG2 segment data truncated")
    return seg_num, seg_type, page, p, data_len, p + data_len, refs


def _parse_region_info(data: bytes):
    """17-byte region segment info field."""
    if len(data) < 17:
        raise ValueError("JBIG2 region info truncated")
    w, h, x, y = struct.unpack(">IIII", data[:16])
    comb_op = data[16] & 7
    return w, h, x, y, comb_op


# --- symbol dictionary + text region (T.88 §6.4/§6.5, arithmetic) ---------------


def _symcodelen(nsyms: int) -> int:
    """SBSYMCODELEN = ceil(log2(SBNUMSYMS)) — spec-literal, so a
    one-symbol dictionary codes IDs in ZERO bits (§6.4.11.1)."""
    n = 0
    while (1 << n) < nsyms:
        n += 1
    return n


def decode_symbol_dict(body: bytes,
                       input_syms: list[np.ndarray]) -> list[np.ndarray]:
    """Arithmetic symbol-dictionary segment body -> exported symbol
    bitmaps (§6.5; SDHUFF/SDREFAGG/shared-context variants refuse by
    name). ``input_syms`` are the exports of referred dictionaries."""
    if len(body) < 2:
        raise ValueError("JBIG2 symbol dictionary truncated")
    flags = struct.unpack(">H", body[:2])[0]
    if flags & 1:
        raise NotImplementedError("JBIG2 Huffman-coded symbol dictionary")
    if flags & 2:
        raise NotImplementedError(
            "JBIG2 symbol dictionary with refinement/aggregation"
        )
    if flags & 0x100 or flags & 0x200:
        raise NotImplementedError(
            "JBIG2 symbol dictionary with shared coding contexts"
        )
    template = (flags >> 10) & 3
    n_at = 4 if template == 0 else 1
    p = 2
    at = []
    if p + 2 * n_at + 8 > len(body):
        raise ValueError("JBIG2 symbol dictionary truncated")
    for _ in range(n_at):
        at.append(struct.unpack(">bb", body[p : p + 2]))
        p += 2
    num_ex, num_new = struct.unpack(">II", body[p : p + 8])
    p += 8
    cap = _jbig2_pixel_cap()
    if num_new > 1 << 16 or num_ex > num_new + len(input_syms):
        raise NotImplementedError(
            f"JBIG2 symbol dictionary with {num_new} new / {num_ex} "
            "exported symbols exceeds the sanity bound"
        )
    dec = MQDecoder(body[p:])
    iadh, iadw, iaex = _new_int_ctx(), _new_int_ctx(), _new_int_ctx()
    gb_states = _new_gb_states(template)
    new_syms: list[np.ndarray] = []
    budget = cap
    hcheight = 0
    while len(new_syms) < num_new:
        dh = _int_decode(dec, iadh)
        if dh is _OOB:
            raise ValueError("JBIG2 symbol dictionary: OOB height delta")
        hcheight += dh
        if hcheight <= 0 or hcheight > 1 << 15:
            raise ValueError(f"JBIG2 symbol height {hcheight}")
        symwidth = 0
        while True:
            dw = _int_decode(dec, iadw)
            if dw is _OOB:
                break  # end of this height class
            symwidth += dw
            if symwidth <= 0 or symwidth > 1 << 15:
                raise ValueError(f"JBIG2 symbol width {symwidth}")
            if len(new_syms) >= num_new:
                raise ValueError(
                    "JBIG2 symbol dictionary: more symbols than declared"
                )
            budget -= symwidth * hcheight
            if budget < 0:
                raise NotImplementedError(
                    "JBIG2 symbol dictionary exceeds the pixel cap"
                )
            new_syms.append(_decode_generic_proc(
                dec, gb_states, symwidth, hcheight, template, tuple(at)
            ))
    # export flag runs (§6.5.10): alternating skip/export run lengths
    allsyms = list(input_syms) + new_syms
    exported: list[np.ndarray] = []
    i = 0
    exflag = 0
    while i < len(allsyms) and len(exported) < num_ex:
        run = _int_decode(dec, iaex)
        if run is _OOB or run < 0:
            raise ValueError("JBIG2 symbol export run")
        if exflag:
            exported.extend(allsyms[i : i + run])
        i += run
        exflag ^= 1
    if len(exported) != num_ex:
        raise ValueError(
            f"JBIG2 symbol dictionary exported {len(exported)} != "
            f"declared {num_ex}"
        )
    return exported


def decode_text_region(body: bytes,
                       syms: list[np.ndarray]):
    """Arithmetic text-region segment body + symbol list ->
    (bitmap, x, y, comb_op) (§6.4; Huffman/refinement variants refuse
    by name). Symbols place by strip with the IADT/IAFS/IADS/IAIT/
    IAID walks; REFCORNER/TRANSPOSED/SBDSOFFSET all honored."""
    w, h, x, y, comb = _parse_region_info(body[:17])
    if len(body) < 23:
        raise ValueError("JBIG2 text region truncated")
    flags = struct.unpack(">H", body[17:19])[0]
    if flags & 1:
        raise NotImplementedError("JBIG2 Huffman-coded text region")
    if flags & 2:
        raise NotImplementedError("JBIG2 text region with refinement")
    log_strips = (flags >> 2) & 3
    refcorner = (flags >> 4) & 3
    transposed = (flags >> 6) & 1
    sbcombop = (flags >> 7) & 3
    defpixel = (flags >> 9) & 1
    dsoffset = (flags >> 10) & 0x1F
    if dsoffset > 15:
        dsoffset -= 32  # signed 5-bit
    strips = 1 << log_strips
    n_inst = struct.unpack(">I", body[19:23])[0]
    if w <= 0 or h <= 0 or w * h > _jbig2_pixel_cap():
        raise NotImplementedError(
            f"JBIG2 text region {w}x{h} exceeds the pixel cap"
        )
    if n_inst > 1 << 20:
        raise NotImplementedError(
            f"JBIG2 text region with {n_inst} instances exceeds the "
            "sanity bound"
        )
    if not syms and n_inst:
        raise ValueError("JBIG2 text region with no referred symbols")
    codelen = _symcodelen(len(syms))
    dec = MQDecoder(body[23:])
    iadt, iafs, iads, iait = (_new_int_ctx(), _new_int_ctx(),
                              _new_int_ctx(), _new_int_ctx())
    iaid = _new_iaid_ctx(codelen)
    region = np.full((h, w), bool(defpixel))
    dt0 = _int_decode(dec, iadt)
    if dt0 is _OOB:
        raise ValueError("JBIG2 text region: OOB initial DT")
    stript = -dt0 * strips
    firsts = 0
    placed = 0
    while placed < n_inst:
        dt = _int_decode(dec, iadt)
        if dt is _OOB:
            raise ValueError("JBIG2 text region: OOB strip DT")
        stript += dt * strips
        first = True
        curs = 0
        while True:
            if first:
                dfs = _int_decode(dec, iafs)
                if dfs is _OOB:
                    raise ValueError("JBIG2 text region: OOB first S")
                firsts += dfs
                curs = firsts
                first = False
            else:
                ids = _int_decode(dec, iads)
                if ids is _OOB:
                    break  # end of strip
                curs += ids + dsoffset
            curt = 0 if strips == 1 else _int_decode(dec, iait)
            if curt is _OOB:
                raise ValueError("JBIG2 text region: OOB T offset")
            ti = stript + curt
            sid = _iaid_decode(dec, iaid, codelen)
            if sid >= len(syms):
                raise ValueError(f"JBIG2 symbol id {sid} out of range")
            sym = syms[sid]
            hs, ws = sym.shape
            if transposed:
                # S runs down rows; T picks the left/right column edge
                r0 = curs
                c0 = ti if refcorner in (0, 1) else ti - ws + 1
            else:
                # S runs along columns; T picks the top/bottom row edge
                c0 = curs
                r0 = ti if refcorner in (1, 3) else ti - hs + 1
            _draw_symbol(region, sym, r0, c0, sbcombop)
            curs += (hs if transposed else ws) - 1
            placed += 1
            if placed > n_inst:
                raise ValueError(
                    "JBIG2 text region placed more instances than "
                    "declared"
                )
    return region, x, y, comb


def _draw_symbol(region: np.ndarray, sym: np.ndarray, r0: int,
                 c0: int, op: int) -> None:
    """Compose one symbol at (row r0, col c0) with SBCOMBOP, clipped
    to the region like page composition clips regions."""
    h, w = region.shape
    hs, ws = sym.shape
    rs, cs = max(r0, 0), max(c0, 0)
    re_, ce = min(r0 + hs, h), min(c0 + ws, w)
    if rs >= re_ or cs >= ce:
        return
    piece = sym[rs - r0 : re_ - r0, cs - c0 : ce - c0]
    tgt = region[rs:re_, cs:ce]
    if op == 0:
        tgt |= piece
    elif op == 1:
        tgt &= piece
    elif op == 2:
        tgt ^= piece
    else:  # 3 = XNOR
        tgt[:] = ~(tgt ^ piece)


def encode_symbol_dict(symbols: list[np.ndarray],
                       template: int = 0) -> tuple[bytes, list[int]]:
    """Encoder twin (§6.5 arithmetic): symbol bitmaps -> (segment
    body, order) where ``order[i]`` is the caller index of exported
    symbol i (the dictionary walks height classes ascending, so the
    wire order is a stable height sort of the input)."""
    syms = [np.asarray(s).astype(bool) for s in symbols]
    if not syms:
        raise ValueError("symbol dictionary needs at least one symbol")
    order = sorted(range(len(syms)), key=lambda i: syms[i].shape[0])
    at = _TEMPLATES[template][1]
    enc = MQEncoder()
    iadh, iadw, iaex = _new_int_ctx(), _new_int_ctx(), _new_int_ctx()
    gb_states = _new_gb_states(template)
    hcheight = 0
    i = 0
    while i < len(order):
        h = syms[order[i]].shape[0]
        _int_encode(enc, iadh, h - hcheight)
        hcheight = h
        symwidth = 0
        while i < len(order) and syms[order[i]].shape[0] == h:
            w = syms[order[i]].shape[1]
            _int_encode(enc, iadw, w - symwidth)
            symwidth = w
            _encode_generic_proc(enc, gb_states, syms[order[i]],
                                 template, at)
            i += 1
        _int_encode(enc, iadw, _OOB)
    _int_encode(enc, iaex, 0)       # skip run
    _int_encode(enc, iaex, len(syms))  # export run: everything
    n_at = 4 if template == 0 else 1
    body = struct.pack(">H", (template & 3) << 10)
    for ax, ay in at[:n_at]:
        body += struct.pack(">bb", ax, ay)
    body += struct.pack(">II", len(syms), len(syms))
    return body + enc.flush(), order


def encode_text_region(
    symbols: list[np.ndarray],
    placements: list[tuple[int, int, int]],
    width: int,
    height: int,
    refcorner: int = 1,
    transposed: bool = False,
    sbcombop: int = 0,
    defpixel: int = 0,
    dsoffset: int = 0,
) -> bytes:
    """Encoder twin (§6.4 arithmetic, SBSTRIPS=1): placements are
    (symbol_id, row, col) TOP-LEFT page coordinates — the wire S/T
    walk (strip deltas, first-S, in-strip deltas, ID codes) is
    derived per refcorner/transposed exactly inversely to the
    decoder."""
    syms = [np.asarray(s).astype(bool) for s in symbols]
    codelen = _symcodelen(len(syms))
    wire = []
    for sid, r0, c0 in placements:
        hs, ws = syms[sid].shape
        if transposed:
            t = c0 if refcorner in (0, 1) else c0 + ws - 1
            s = r0
            adv = hs - 1
        else:
            t = r0 if refcorner in (1, 3) else r0 + hs - 1
            s = c0
            adv = ws - 1
        wire.append((t, s, sid, adv))
    wire.sort(key=lambda e: (e[0], e[1]))
    enc = MQEncoder()
    iadt, iafs, iads = _new_int_ctx(), _new_int_ctx(), _new_int_ctx()
    iaid = _new_iaid_ctx(codelen)
    _int_encode(enc, iadt, 0)  # STRIPT starts at 0
    stript = 0
    firsts = 0
    k = 0
    while k < len(wire):
        t = wire[k][0]
        _int_encode(enc, iadt, t - stript)
        stript = t
        first = True
        curs = 0
        while k < len(wire) and wire[k][0] == t:
            _t, s, sid, adv = wire[k]
            if first:
                _int_encode(enc, iafs, s - firsts)
                firsts = s
                first = False
            else:
                _int_encode(enc, iads, s - curs - dsoffset)
            _iaid_encode(enc, iaid, codelen, sid)
            curs = s + adv
            k += 1
        _int_encode(enc, iads, _OOB)
    flags = ((refcorner & 3) << 4) | ((1 if transposed else 0) << 6)
    flags |= (sbcombop & 3) << 7 | (defpixel & 1) << 9
    flags |= (dsoffset & 0x1F) << 10
    body = struct.pack(">IIII", width, height, 0, 0) + bytes([0])  # OR
    body += struct.pack(">H", flags)
    body += struct.pack(">I", len(placements))
    return body + enc.flush()


def _segment(num: int, stype: int, body: bytes,
             refs: tuple[int, ...] = ()) -> bytes:
    """Embedded-organization segment with short-form referred list
    (1-byte referred numbers — enough for fixture streams)."""
    head = struct.pack(">IB", num, stype)
    head += bytes([len(refs) << 5])
    head += bytes(refs)
    head += bytes([1])  # page 1
    head += struct.pack(">I", len(body))
    return head + body


def encode_jbig2_text(
    symbols: list[np.ndarray],
    placements: list[tuple[int, int, int]],
    width: int,
    height: int,
    split_globals: bool = False,
    **text_kwargs,
):
    """Full embedded stream: page info + symbol dictionary + text
    region placing ``(symbol_id, row, col)`` instances. With
    ``split_globals`` returns (globals_bytes, data_bytes) — the PDF
    /JBIG2Globals layout where the dictionary travels separately."""
    dict_body, order = encode_symbol_dict(symbols)
    remap = {orig: wire for wire, orig in enumerate(order)}
    places = [(remap[sid], r, c) for sid, r, c in placements]
    text_body = encode_text_region(
        symbols=[symbols[i] for i in order],
        placements=places, width=width, height=height, **text_kwargs,
    )
    page_info = struct.pack(">IIII", width, height, 0, 0) + b"\x00\x00\x00"
    g = _segment(0, _SEG_SYMBOL_DICT, dict_body)
    d = _segment(1, _SEG_PAGE_INFO, page_info)
    d += _segment(2, _SEG_TEXT_IMMEDIATE_LOSSLESS, text_body, refs=(0,))
    if split_globals:
        return g, d
    return g + d


def decode_jbig2(data: bytes, globals_data: bytes = b"") -> np.ndarray:
    """Embedded-organization JBIG2 (the PDF /JBIG2Decode layout) ->
    bool (H, W) page bitmap (True = black). Handles page info,
    generic region, symbol dictionary, and text region segments
    (arithmetic coding; Huffman / refinement / halftone tiers refuse
    by segment name)."""
    stream = bytes(globals_data) + bytes(data)
    pos = 0
    page: np.ndarray | None = None
    page_default = 0
    regions: list[tuple[np.ndarray, int, int, int]] = []
    page_wh: tuple[int, int] | None = None
    sym_dicts: dict[int, list[np.ndarray]] = {}
    while pos + 11 <= len(stream):
        (seg_num, seg_type, _pg, dstart, dlen, nxt, refs
         ) = _parse_segment_header(stream, pos)
        body = stream[dstart : dstart + dlen]
        if seg_type == _SEG_PAGE_INFO:
            if len(body) < 19:
                raise ValueError("JBIG2 page info truncated")
            pw, ph = struct.unpack(">II", body[:8])
            flags = body[16]
            page_default = (flags >> 2) & 1
            # 0xFFFFFFFF height = striped page, resolved by regions
            page_wh = (pw, ph if ph != 0xFFFFFFFF else 0)
        elif seg_type in (_SEG_GENERIC_IMMEDIATE,
                          _SEG_GENERIC_IMMEDIATE_LOSSLESS,
                          _SEG_GENERIC_INTERMEDIATE):
            if seg_type == _SEG_GENERIC_INTERMEDIATE:
                raise NotImplementedError(
                    "JBIG2 intermediate generic region (auxiliary "
                    "buffers)"
                )
            w, h, x, y, comb = _parse_region_info(body[:17])
            gflags = body[17]
            if gflags & 1:
                # MMR-coded generic region: MMR IS T.6/G4 coding
                # (pure 2D, no EOLs) — route to the CCITT kernel
                # (round 12; the TIFF-compression-4 precedent)
                if w <= 0 or h <= 0 or w * h > _jbig2_pixel_cap():
                    raise NotImplementedError(
                        f"JBIG2 region {w}x{h} exceeds the "
                        f"interpreted-decode pixel cap"
                    )
                from pg2kinesis_spark.functions import ccitt as ccitt_mod

                bm = ccitt_mod.ccitt_decode(body[18:], w, h, k=-1)
                regions.append((bm.astype(bool), x, y, comb))
                pos = nxt
                continue
            template = (gflags >> 1) & 3
            tpgdon = bool(gflags & 8)
            n_at = 4 if template == 0 else 1
            p = 18
            at = []
            for _ in range(n_at):
                ax = struct.unpack(">b", body[p : p + 1])[0]
                ay = struct.unpack(">b", body[p + 1 : p + 2])[0]
                at.append((ax, ay))
                p += 2
            bm = decode_generic_region(
                body[p:], w, h, template, tuple(at), tpgdon
            )
            regions.append((bm, x, y, comb))
        elif seg_type == _SEG_SYMBOL_DICT:
            input_syms: list[np.ndarray] = []
            for r in refs:
                input_syms.extend(sym_dicts.get(r, []))
            sym_dicts[seg_num] = decode_symbol_dict(body, input_syms)
        elif seg_type in (_SEG_TEXT_IMMEDIATE,
                          _SEG_TEXT_IMMEDIATE_LOSSLESS,
                          _SEG_TEXT_INTERMEDIATE):
            if seg_type == _SEG_TEXT_INTERMEDIATE:
                raise NotImplementedError(
                    "JBIG2 intermediate text region (auxiliary buffers)"
                )
            syms: list[np.ndarray] = []
            for r in refs:
                if r not in sym_dicts:
                    raise ValueError(
                        f"JBIG2 text region refers to missing segment {r}"
                    )
                syms.extend(sym_dicts[r])
            regions.append(decode_text_region(body, syms))
        elif seg_type in (_SEG_END_OF_PAGE, _SEG_END_OF_STRIPE,
                          _SEG_END_OF_FILE):
            pass
        else:
            raise NotImplementedError(
                "JBIG2 segment type "
                f"{seg_type} ({_SEG_NAMES.get(seg_type, 'reserved')})"
            )
        pos = nxt
    if not regions:
        raise ValueError("JBIG2 stream with no region segment")
    if page_wh is None:
        pw = max(x + bm.shape[1] for bm, x, _y, _c in regions)
        ph = max(y + bm.shape[0] for bm, _x, y, _c in regions)
    else:
        pw, ph = page_wh
        ph = max(ph, max(y + bm.shape[0] for bm, _x, y, _c in regions))
        pw = max(pw, max(x + bm.shape[1] for bm, x, _y, _c in regions))
    if pw * ph > _jbig2_pixel_cap():
        raise NotImplementedError(
            f"JBIG2 page {pw}x{ph} exceeds the pixel cap"
        )
    page = np.full((ph, pw), bool(page_default))
    for bm, x, y, comb in regions:
        h, w = bm.shape
        tgt = page[y : y + h, x : x + w]
        if comb == 0:  # OR
            tgt |= bm[: tgt.shape[0], : tgt.shape[1]]
        elif comb == 1:  # AND
            tgt &= bm[: tgt.shape[0], : tgt.shape[1]]
        elif comb == 2:  # XOR
            tgt ^= bm[: tgt.shape[0], : tgt.shape[1]]
        elif comb == 4:  # REPLACE
            tgt[:] = bm[: tgt.shape[0], : tgt.shape[1]]
        else:
            raise NotImplementedError(
                f"JBIG2 combination operator {comb}"
            )
    return page


def encode_jbig2(bitmap: np.ndarray, template: int = 0,
                 tpgdon: bool = False, mmr: bool = False) -> bytes:
    """Encoder twin: bool (H, W) -> embedded-organization stream
    (page info + immediate lossless generic region), the layout a
    PDF /JBIG2Decode stream carries. ``mmr`` codes the region with
    T.6/G4 (the CCITT kernel) instead of the MQ coder."""
    bm = np.asarray(bitmap).astype(bool)
    h, w = bm.shape
    at = _TEMPLATES[template][1]
    if mmr:
        from pg2kinesis_spark.functions import ccitt as ccitt_mod

        payload = ccitt_mod.ccitt_encode(bm, k=-1, eofb=False)
    else:
        payload = encode_generic_region(bm, template, at, tpgdon)

    page_info = struct.pack(">IIII", w, h, 0, 0) + b"\x00\x00\x00"
    out = _segment(0, _SEG_PAGE_INFO, page_info)
    region = struct.pack(">IIII", w, h, 0, 0) + bytes([0])  # OR
    gflags = ((template & 3) << 1) | (8 if tpgdon else 0) | (
        1 if mmr else 0
    )
    region += bytes([gflags])
    if not mmr:
        n_at = 4 if template == 0 else 1
        for ax, ay in at[:n_at]:
            region += struct.pack(">bb", ax, ay)
    region += payload
    out += _segment(1, _SEG_GENERIC_IMMEDIATE_LOSSLESS, region)
    return out
