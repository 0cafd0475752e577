"""CCITT Group 3 / Group 4 bilevel decode (ITU-T T.4 / T.6) — the
fax compressions behind TIFF Compression 2/3/4 and PDF
``/CCITTFaxDecode``, the highest-volume layouts in real scanned-document
corpora (most scanned archives are G4 bilevel).

ONE decoder serves both containers (the ``_lzw_decode`` sharing
precedent: reference semantics live once, the TIFF strip walk and the
PDF filter chain both call it):

* **Modified Huffman (1D)** — per-row white/black alternating run
  lengths from the T.4 terminating (0–63) + makeup (64–1728) + shared
  extended makeup (1792–2560) code tables, transcribed below from the
  published ITU-T T.4 tables.
* **Modified READ (2D, K > 0)** — per-row EOL + tag bit selecting
  1D/2D; 2D rows code vertical (V0, VR1-3, VL1-3), horizontal, and
  pass modes against the previous row's changing elements.
* **MMR (T.6 / G4, K < 0)** — pure 2D against an imaginary all-white
  reference line, no EOLs (EOFB tolerated), TIFF Compression 4 and
  the PDF K=-1 default for scanned plates.

The decoder is STRICT the way the rest of the codec tier is: invalid
codes, row overruns, and short data raise ValueError; the T.4/T.6
extension codes (uncompressed mode) raise NotImplementedError — per
image quarantine upstream, never silent garbage. The encoder twin
(``ccitt_encode``) exists for fixture construction and shares the same
code tables, so round trips pin the coder while the table transcription
is cross-checked by prefix-freeness + the spec's published identities
(tests/test_ccitt.py).

Output convention: a (rows, columns) bool ndarray, True = BLACK pen
(the CCITT color model). Containers map it onto their own photometric
conventions (TIFF PhotometricInterpretation, PDF BlackIs1).
"""

from __future__ import annotations

import numpy as np

# --- T.4 code tables (run length -> bit string) ------------------------------

_WHITE_TERM = {
    0: "00110101", 1: "000111", 2: "0111", 3: "1000", 4: "1011",
    5: "1100", 6: "1110", 7: "1111", 8: "10011", 9: "10100",
    10: "00111", 11: "01000", 12: "001000", 13: "000011", 14: "110100",
    15: "110101", 16: "101010", 17: "101011", 18: "0100111",
    19: "0001100", 20: "0001000", 21: "0010111", 22: "0000011",
    23: "0000100", 24: "0101000", 25: "0101011", 26: "0010011",
    27: "0100100", 28: "0011000", 29: "00000010", 30: "00000011",
    31: "00011010", 32: "00011011", 33: "00010010", 34: "00010011",
    35: "00010100", 36: "00010101", 37: "00010110", 38: "00010111",
    39: "00101000", 40: "00101001", 41: "00101010", 42: "00101011",
    43: "00101100", 44: "00101101", 45: "00000100", 46: "00000101",
    47: "00001010", 48: "00001011", 49: "01010010", 50: "01010011",
    51: "01010100", 52: "01010101", 53: "00100100", 54: "00100101",
    55: "01011000", 56: "01011001", 57: "01011010", 58: "01011011",
    59: "01001010", 60: "01001011", 61: "00110010", 62: "00110011",
    63: "00110100",
}
_WHITE_MAKEUP = {
    64: "11011", 128: "10010", 192: "010111", 256: "0110111",
    320: "00110110", 384: "00110111", 448: "01100100", 512: "01100101",
    576: "01101000", 640: "01100111", 704: "011001100", 768: "011001101",
    832: "011010010", 896: "011010011", 960: "011010100",
    1024: "011010101", 1088: "011010110", 1152: "011010111",
    1216: "011011000", 1280: "011011001", 1344: "011011010",
    1408: "011011011", 1472: "010011000", 1536: "010011001",
    1600: "010011010", 1664: "011000", 1728: "010011011",
}
_BLACK_TERM = {
    0: "0000110111", 1: "010", 2: "11", 3: "10", 4: "011", 5: "0011",
    6: "0010", 7: "00011", 8: "000101", 9: "000100", 10: "0000100",
    11: "0000101", 12: "0000111", 13: "00000100", 14: "00000111",
    15: "000011000", 16: "0000010111", 17: "0000011000",
    18: "0000001000", 19: "00001100111", 20: "00001101000",
    21: "00001101100", 22: "00000110111", 23: "00000101000",
    24: "00000010111", 25: "00000011000", 26: "000011001010",
    27: "000011001011", 28: "000011001100", 29: "000011001101",
    30: "000001101000", 31: "000001101001", 32: "000001101010",
    33: "000001101011", 34: "000011010010", 35: "000011010011",
    36: "000011010100", 37: "000011010101", 38: "000011010110",
    39: "000011010111", 40: "000001101100", 41: "000001101101",
    42: "000011011010", 43: "000011011011", 44: "000001010100",
    45: "000001010101", 46: "000001010110", 47: "000001010111",
    48: "000001100100", 49: "000001100101", 50: "000001010010",
    51: "000001010011", 52: "000000100100", 53: "000000110111",
    54: "000000111000", 55: "000000100111", 56: "000000101000",
    57: "000001011000", 58: "000001011001", 59: "000000101011",
    60: "000000101100", 61: "000001011010", 62: "000001100110",
    63: "000001100111",
}
_BLACK_MAKEUP = {
    64: "0000001111", 128: "000011001000", 192: "000011001001",
    256: "000001011011", 320: "000000110011", 384: "000000110100",
    448: "000000110101", 512: "0000001101100", 576: "0000001101101",
    640: "0000001001010", 704: "0000001001011", 768: "0000001001100",
    832: "0000001001101", 896: "0000001110010", 960: "0000001110011",
    1024: "0000001110100", 1088: "0000001110101", 1152: "0000001110110",
    1216: "0000001110111", 1280: "0000001010010", 1344: "0000001010011",
    1408: "0000001010100", 1472: "0000001010101", 1536: "0000001011010",
    1600: "0000001011011", 1664: "0000001100100", 1728: "0000001100101",
}
# extended makeups (shared by both colors)
_EXT_MAKEUP = {
    1792: "00000001000", 1856: "00000001100", 1920: "00000001101",
    1984: "000000010010", 2048: "000000010011", 2112: "000000010100",
    2176: "000000010101", 2240: "000000010110", 2304: "000000010111",
    2368: "000000011100", 2432: "000000011101", 2496: "000000011110",
    2560: "000000011111",
}

_WHITE_ENC = {**_WHITE_TERM, **_WHITE_MAKEUP, **_EXT_MAKEUP}
_BLACK_ENC = {**_BLACK_TERM, **_BLACK_MAKEUP, **_EXT_MAKEUP}


def _decode_map(enc: dict) -> dict:
    return {(len(b), int(b, 2)): run for run, b in enc.items()}


_WHITE_DEC = _decode_map(_WHITE_ENC)
_BLACK_DEC = _decode_map(_BLACK_ENC)
_MAX_CODE_BITS = 14

_EOL = "000000000001"


class _EolHit(Exception):
    """An EOL code appeared where a run/mode code was expected."""


class _BitReader:
    __slots__ = ("data", "pos", "nbits")

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.nbits = len(data) * 8

    def read1(self) -> int:
        if self.pos >= self.nbits:
            raise ValueError("CCITT data exhausted mid-code")
        b = (self.data[self.pos >> 3] >> (7 - (self.pos & 7))) & 1
        self.pos += 1
        return b

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7

    def exhausted(self, slack_bits: int = 0) -> bool:
        return self.pos + slack_bits >= self.nbits

    def try_eol(self) -> bool:
        """Consume fill zeros + one EOL if present at the cursor; the
        cursor is untouched when the lookahead is not an EOL."""
        save = self.pos
        zeros = 0
        while self.pos < self.nbits:
            if self.read1():
                if zeros >= 11:
                    return True
                break
            zeros += 1
        self.pos = save
        return False


def _read_run(bits: _BitReader, color: int) -> int:
    table = _BLACK_DEC if color else _WHITE_DEC
    v = 0
    n = 0
    while n < _MAX_CODE_BITS:
        v = (v << 1) | bits.read1()
        n += 1
        if n >= 2:
            r = table.get((n, v))
            if r is not None:
                return r
    if v == 0 or v == 1:
        # ≥13 zeros: fill bits running into an EOL — finish it
        while v == 0:
            v = bits.read1()
        raise _EolHit
    raise ValueError(f"invalid CCITT {'black' if color else 'white'} code")


def _read_full_run(bits: _BitReader, color: int) -> int:
    """One complete run: any number of makeup codes, closed by a
    terminating (< 64) code of the same color."""
    total = 0
    while True:
        r = _read_run(bits, color)
        total += r
        if r < 64:
            return total


def _read_mode(bits: _BitReader) -> tuple[str, int]:
    if bits.read1():
        return ("v", 0)
    if bits.read1():
        return ("v", 1) if bits.read1() else ("v", -1)
    if bits.read1():
        return ("h", 0)
    if bits.read1():
        return ("p", 0)
    if bits.read1():
        return ("v", 2) if bits.read1() else ("v", -2)
    if bits.read1():
        return ("v", 3) if bits.read1() else ("v", -3)
    if bits.read1():
        raise NotImplementedError(
            "CCITT 2D extension code (uncompressed mode)"
        )
    # ≥7 zeros: only fill + EOL is legal from here
    zeros = 7
    while True:
        if bits.read1():
            if zeros >= 11:
                raise _EolHit
            raise ValueError("invalid CCITT 2D mode code")
        zeros += 1


def _decode_1d_row(bits: _BitReader, columns: int) -> list[int]:
    """Changing-element positions of one MH row (rows start white; a
    black-first row is coded with a zero-length white run)."""
    changes: list[int] = []
    pos = 0
    color = 0
    while pos < columns:
        run = _read_full_run(bits, color)
        pos += run
        if pos > columns:
            raise ValueError(f"CCITT 1D run overruns row: {pos} > {columns}")
        changes.append(pos)
        color ^= 1
    return changes


def _decode_2d_row(bits: _BitReader, columns: int, ref: list[int]) -> list[int]:
    """Changing-element positions of one 2D (MR/MMR) row against the
    reference row's changing elements (T.4 §4.2.1.3: b1 is the first
    changing element on the reference line right of a0 with the
    opposite color of a0's run; pass sets a0=b2, vertical codes
    a1=b1±d, horizontal codes two 1D runs)."""
    from bisect import bisect_right

    changes: list[int] = []
    a0 = -1
    color = 0
    while True:
        # b1: first changing element right of a0 whose new color is the
        # opposite of a0's run color — even ref indices enter black
        i = bisect_right(ref, a0)
        if (i & 1) != color:
            i += 1
        b1 = ref[i] if i < len(ref) else columns
        b2 = ref[i + 1] if i + 1 < len(ref) else columns
        mode, d = _read_mode(bits)
        if mode == "p":
            a0 = b2
        elif mode == "v":
            a1 = b1 + d
            if not (a0 if a0 > 0 else 0) <= a1 <= columns:
                raise ValueError("CCITT vertical mode escapes the row")
            changes.append(a1)
            a0 = a1
            color ^= 1
        else:  # horizontal: two full runs, color then opposite
            a0s = a0 if a0 > 0 else 0
            r1 = _read_full_run(bits, color)
            r2 = _read_full_run(bits, color ^ 1)
            a1 = a0s + r1
            a2 = a1 + r2
            if a2 > columns:
                raise ValueError("CCITT horizontal mode escapes the row")
            changes.append(a1)
            changes.append(a2)
            a0 = a2
        if a0 >= columns:
            break
    return changes


def _changes_to_row(changes: list[int], columns: int) -> np.ndarray:
    row = np.zeros(columns, dtype=bool)
    flat = [c for c in changes if c < columns]
    for a, b in zip(flat[::2], (flat[1::2] + [columns])):
        row[a:b] = True
    return row


def ccitt_decode(
    data: bytes,
    columns: int,
    rows: int,
    k: int,
    byte_align: bool = False,
) -> np.ndarray:
    """Decode ``rows`` scan lines of ``columns`` pixels: ``k < 0`` is
    T.6/G4 (pure 2D, no EOLs), ``k == 0`` is pure 1D MH (leading EOLs
    tolerated), ``k > 0`` is mixed T.4 2D (EOL + tag bit selects the
    row coding; a missing first EOL is tolerated as 1D). Returns a
    (rows, columns) bool array, True = black."""
    if columns <= 0 or rows <= 0 or columns * rows > 2**28:
        raise ValueError(f"CCITT dimensions {columns}x{rows} out of bounds")
    bits = _BitReader(bytes(data))
    out = np.zeros((rows, columns), dtype=bool)
    ref: list[int] = []  # imaginary all-white reference line
    for r in range(rows):
        if byte_align:
            bits.align()
        try:
            if k < 0:
                changes = _decode_2d_row(bits, columns, ref)
            elif k == 0:
                while bits.try_eol():
                    pass
                changes = _decode_1d_row(bits, columns)
            else:
                if bits.try_eol():
                    one_d = bits.read1()
                else:
                    one_d = 1 if r == 0 else None
                    if one_d is None:
                        raise ValueError("CCITT K>0 row without its EOL")
                changes = (
                    _decode_1d_row(bits, columns)
                    if one_d
                    else _decode_2d_row(bits, columns, ref)
                )
        except _EolHit:
            raise ValueError(f"CCITT row {r}: EOL inside a coded line") from None
        out[r] = _changes_to_row(changes, columns)
        # next row's reference: only true in-row changing elements —
        # the b1/b2 lookup supplies `columns` sentinels positionally
        ref = [c for c in changes if c < columns]
    return out


# --- encoder twin (fixtures + the round-trip pin) ----------------------------


class _BitWriter:
    __slots__ = ("bytes_", "acc", "n")

    def __init__(self) -> None:
        self.bytes_ = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: str) -> None:
        for ch in code:
            self.acc = (self.acc << 1) | (ch == "1")
            self.n += 1
            if self.n == 8:
                self.bytes_.append(self.acc)
                self.acc = 0
                self.n = 0

    def align(self) -> None:
        while self.n:
            self.write("0")

    def done(self) -> bytes:
        self.align()
        return bytes(self.bytes_)


def _enc_run(w: _BitWriter, color: int, run: int) -> None:
    enc = _BLACK_ENC if color else _WHITE_ENC
    while run > 2623:
        w.write(enc[2560])
        run -= 2560
    if run >= 64:
        m = (run >> 6) << 6
        w.write(enc[m])
        run -= m
    w.write(enc[run])


def _row_changes(row: np.ndarray) -> list[int]:
    d = np.flatnonzero(np.diff(row.astype(np.int8)) != 0) + 1
    return [int(x) for x in d]


def _enc_1d_row(w: _BitWriter, row: np.ndarray) -> None:
    columns = len(row)
    pos = 0
    color = 0
    changes = _row_changes(row) + [columns]
    if row[0]:
        changes = [0] + changes
    for c in changes:
        _enc_run(w, color, c - pos)
        pos = c
        color ^= 1
    if pos < columns:
        _enc_run(w, color, columns - pos)


def _enc_2d_row(w: _BitWriter, row: np.ndarray, ref: list[int]) -> None:
    from bisect import bisect_right

    columns = len(row)
    cur = _row_changes(row)
    if bool(row[0]):
        cur = [0] + cur
    cur_t = cur + [columns, columns]
    a0 = -1
    color = 0
    ci = 0
    while True:
        a1 = cur_t[ci] if ci < len(cur_t) else columns
        i = bisect_right(ref, a0)
        if (i & 1) != color:
            i += 1
        b1 = ref[i] if i < len(ref) else columns
        b2 = ref[i + 1] if i + 1 < len(ref) else columns
        if b2 < a1:
            w.write("0001")  # pass
            a0 = b2
        elif abs(a1 - b1) <= 3:
            w.write(
                {0: "1", 1: "011", 2: "000011", 3: "0000011",
                 -1: "010", -2: "000010", -3: "0000010"}[a1 - b1]
            )
            a0 = a1
            color ^= 1
            ci += 1
        else:  # horizontal
            a2 = cur_t[ci + 1] if ci + 1 < len(cur_t) else columns
            a0s = a0 if a0 > 0 else 0
            w.write("001")
            _enc_run(w, color, a1 - a0s)
            _enc_run(w, color ^ 1, a2 - a1)
            a0 = a2
            ci += 2
        if a0 >= columns:
            break


def ccitt_encode(
    black: np.ndarray, k: int, byte_align: bool = False, eofb: bool = True
) -> bytes:
    """Encode a (rows, columns) bool array (True = black): ``k < 0``
    G4/MMR (EOFB appended unless ``eofb=False``), ``k == 0`` pure 1D
    MH, ``k > 0`` mixed 2D with an EOL + tag bit per row and a 1D row
    every ``k`` rows. The fixture twin of ``ccitt_decode`` — shares
    the module's code tables."""
    black = np.asarray(black, dtype=bool)
    if black.ndim != 2:
        raise ValueError("ccitt_encode wants a (rows, columns) mask")
    w = _BitWriter()
    ref: list[int] = []
    for r in range(black.shape[0]):
        if byte_align:
            w.align()
        row = black[r]
        if k < 0:
            _enc_2d_row(w, row, ref)
        elif k == 0:
            _enc_1d_row(w, row)
        else:
            one_d = (r % k) == 0
            w.write(_EOL)
            w.write("1" if one_d else "0")
            if one_d:
                _enc_1d_row(w, row)
            else:
                _enc_2d_row(w, row, ref)
        ref = ([0] if bool(row[0]) else []) + _row_changes(row)
    if k < 0 and eofb:
        w.write(_EOL)
        w.write(_EOL)
    if k > 0:
        w.write(_EOL + "1")  # RTC starts (decoder stops at `rows`)
    return w.done()
