"""JBIG2 (ITU-T T.88) generic-region decode — the scanned-PDF plate
tier (VERDICT r11 item 3).

Scope: the MQ arithmetic coder (decoder + encoder twin), generic
region decoding for templates 0-3 with movable AT pixels and TPGDON
typical prediction, embedded-organization segment parsing (the layout
PDF /JBIG2Decode streams use: no file header, page association
segments), page composition (OR / default pixel), and an encoder twin
that emits real embedded streams (page info + immediate lossless
generic region) for fixtures.

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

MMR-coded generic regions route to the CCITT T.6/G4 kernel (MMR IS
T.6 coding — the TIFF-compression-4 precedent). Refusals (by name):
refinement / symbol dictionary / text / halftone / pattern segments,
unknown data length, auxiliary buffers. Decode cost is capped (interpreted per-pixel MQ
work) like the VP8L predictor cap.

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
    if template not in _TEMPLATES:
        raise ValueError(f"bad JBIG2 template {template}")
    if at is None:
        at = _TEMPLATES[template][1]
    if width <= 0 or height <= 0 or width * height > _jbig2_pixel_cap():
        raise NotImplementedError(
            f"JBIG2 region {width}x{height} exceeds the interpreted-"
            f"decode pixel cap ({_jbig2_pixel_cap()})"
        )
    pixels = _template_pixels(template, tuple(at))
    sltp_ctx = _TEMPLATES[template][2]
    nbits = len(pixels)
    dec = MQDecoder(data)
    # one adaptive state per context value
    states = [[0, 0] for _ in range(1 << nbits)]
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
    bm = np.asarray(bitmap).astype(bool)
    h, w = bm.shape
    if at is None:
        at = _TEMPLATES[template][1]
    pixels = _template_pixels(template, tuple(at))
    enc = MQEncoder()
    states = [[0, 0] for _ in range(1 << len(pixels))]
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
    return enc.flush()


# --- embedded-organization segment stream ---------------------------------------

_SEG_PAGE_INFO = 48
_SEG_END_OF_PAGE = 49
_SEG_END_OF_STRIPE = 50
_SEG_END_OF_FILE = 51
_SEG_GENERIC_IMMEDIATE = 38
_SEG_GENERIC_IMMEDIATE_LOSSLESS = 39
_SEG_GENERIC_INTERMEDIATE = 36

_SEG_NAMES = {
    0: "symbol dictionary", 4: "intermediate text region",
    6: "immediate text region", 7: "immediate lossless text region",
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
    next_pos). Embedded organization (T.88 §7.2)."""
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
    p += count * ref_size
    # a huge long-form referred count can push p past the buffer —
    # keep the error contract ValueError, never struct.error/IndexError
    if p + (4 if page_assoc_4 else 1) + 4 > len(data):
        raise ValueError("JBIG2 segment header truncated")
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
    return seg_num, seg_type, page, p, data_len, p + data_len


def _parse_region_info(data: bytes):
    """17-byte region segment info field."""
    if len(data) < 17:
        raise ValueError("JBIG2 region info truncated")
    w, h, x, y = struct.unpack(">IIII", data[:16])
    comb_op = data[16] & 7
    return w, h, x, y, comb_op


def decode_jbig2(data: bytes, globals_data: bytes = b"") -> np.ndarray:
    """Embedded-organization JBIG2 (the PDF /JBIG2Decode layout) ->
    bool (H, W) page bitmap (True = black). Handles page info +
    generic region segments; everything else refuses by segment
    name (symbol/text/halftone/refinement tiers)."""
    stream = bytes(globals_data) + bytes(data)
    pos = 0
    page: np.ndarray | None = None
    page_default = 0
    regions: list[tuple[np.ndarray, int, int, int]] = []
    page_wh: tuple[int, int] | None = None
    while pos + 11 <= len(stream):
        (_num, seg_type, _pg, dstart, dlen, nxt
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
        raise ValueError("JBIG2 stream with no generic region")
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

    def segment(num: int, stype: int, body: bytes) -> bytes:
        head = struct.pack(">IB", num, stype)  # page-assoc 1 byte
        head += b"\x00"  # no referred-to segments
        head += bytes([1])  # page 1
        head += struct.pack(">I", len(body))
        return head + body

    page_info = struct.pack(">IIII", w, h, 0, 0) + b"\x00\x00\x00"
    out = segment(0, _SEG_PAGE_INFO, page_info)
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
    out += segment(1, _SEG_GENERIC_IMMEDIATE_LOSSLESS, region)
    return out
