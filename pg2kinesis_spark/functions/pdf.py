"""PDF text extraction — simple fonts, plus CID/Type0 via /ToUnicode.

After HTML, PDF is the most common document format a corpus pipeline
meets. Full PDF text extraction is a rendering problem (encoding
dictionaries, ActualText, layout reconstruction); this module
implements the well-defined subsets and REFUSES the rest loudly (the
codecs.py honesty rule — wrong text silently entering a training
corpus is worse than a quarantined file):

* content streams through the text-bearing filter set, alone or
  CHAINED in declared order: /FlateDecode, /LZWDecode (TIFF
  variant, /EarlyChange honored), /ASCIIHexDecode,
  /ASCII85Decode, /RunLengthDecode — every inflating step
  MAX_INFLATE-bounded; image filters (DCT/JPX/CCITT/JBIG2) skip;
* PDF 1.5+ object streams (``/Type /ObjStm``): compressed non-stream
  objects (page dicts, font dicts, the catalog) are inflated and
  joined to the object map, so post-2005 writers that hide the page
  tree inside an ObjStm still parse;
* text shown with ``Tj``, ``'``, ``"`` and ``TJ`` (array form with
  kerning numbers — a kern ≤ -180/1000 em inserts a space, the
  convention extractors use for inter-word gaps);
* literal strings with the full escape set (``\\n \\r \\t \\b \\f
  \\( \\) \\\\`` + octal ``\\ddd`` + line continuations) and hex
  strings;
* line structure from ``T*``, ``'``, ``"``, ``Td``/``TD`` with a
  vertical component, and ``Tm`` re-positioning;
* simple (Type1/TrueType) fonts decode byte→char as Latin-1
  (StandardEncoding's printable range) — correct for the unembedded
  base-14-font documents — with /Encoding /Differences overrides
  resolved through glyph names (algorithmic uniXXXX/uXXXXXX plus the
  high-frequency Adobe-Glyph-List subset; unknown names render
  U+FFFD);
* CID/Type0 fonts (the dominant post-2005 case) decode through the
  font's embedded **/ToUnicode CMap** (``bfchar`` + ``bfrange``
  entries, both scalar-increment and array destinations, UTF-16BE
  values incl. surrogate pairs). The active font is tracked per
  ``Tf`` operator against the page's (or an ancestor's) /Resources
  /Font dict. A code the CMap doesn't cover renders U+FFFD — an
  explicit unknown, never confident garbage.

Encrypted documents using the standard security handler with an
EMPTY user password — the owner-locked layout a crawl actually meets
— decrypt for real across all three cipher generations: RC4 (/V 1-2,
/R 2-3; PDF 1.7 §7.6.3 key derivation + per-object MD5 keys), AES-128
AESV2 (/V 4; per-object sAlT keys, IV+CBC+PKCS#7), and AES-256 AESV3
(/V 5 /R 6; ISO 32000-2 Algorithm 2.B hardened KDF validates /U, the
file key unwraps from /UE) — on functions/aes.py's generated-table
AES. /U is always verified BEFORE trusting a key. A caller-supplied
``password`` (round 7) is tried as the USER password and then as the
OWNER password (Algorithm 7's /O RC4-unwrap; AESV3's /O-hash-over-/U
+ /OE file-key unwrap), so credentialed corpora decrypt too; a wrong
or missing password raises. A Type0 font WITHOUT a usable ToUnicode
CMap still raises NotImplementedError — its string bytes are glyph
indices that need a CMap; decoding them as Latin-1 would produce
confident garbage. All land in the standard quarantine channel in the
Spark operator (`extract_pdf_text`, which takes the same
``password=``).

Objects are found by scanning (no xref dependence — real-world PDFs
have broken xref tables constantly); stream bodies are delimited by
``stream``/``endstream`` with the declared ``/Length`` used when it
parses. Page order follows the catalog's /Kids tree when one resolves,
falling back to object-scan order, and a document with no page graph
at all falls back to the every-stream walk. All scans are bounded.
"""

from __future__ import annotations

import re
import zlib
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import types as T

MAX_INFLATE = 1 << 28  # per-stream inflate cap (decompression bomb)
MAX_STREAMS = 50_000
_KERN_SPACE = -180  # TJ kern threshold (milli-em) that reads as a word gap


def is_pdf(data: bytes) -> bool:
    return bytes(data[:5]) == b"%PDF-"


_STREAM_RE = re.compile(rb"stream\r?\n", re.DOTALL)
_LENGTH_RE = re.compile(rb"/Length\s+(\d+)(?![\d\s]*R)")


def _dict_before(data: bytes, at: int, window: int = 4096) -> bytes:
    """The OUTERMOST ``<< ... >>`` dict ending just before ``at`` —
    a backward balance scan, because ``rfind(b'<<')`` would return the
    innermost nested dict (``/DecodeParms << ... >>``) and lose the
    outer dict's ``/Filter`` key."""
    lo = max(0, at - window)
    seg = data[lo:at]
    depth = 0
    i = len(seg)
    start = -1
    while i >= 2:
        pair = seg[i - 2 : i]
        if pair == b">>":
            depth += 1
            i -= 2
        elif pair == b"<<":
            depth -= 1
            i -= 2
            if depth <= 0:
                start = i
                break
        else:
            i -= 1
    return seg[start:] if start >= 0 else b""


def _iter_streams(data: bytes):
    """Yield (dict_bytes, body_bytes) for every stream object. The
    enclosing dict is the bytes between the nearest '<<' chain start
    and 'stream'; body length prefers the inline /Length, falling back
    to an 'endstream' scan."""
    pos = 0
    count = 0
    while True:
        m = _STREAM_RE.search(data, pos)
        if not m:
            return
        count += 1
        if count > MAX_STREAMS:
            raise ValueError(f"PDF exceeds {MAX_STREAMS} streams")
        sdict = _dict_before(data, m.start())
        body_start = m.end()
        lm = _LENGTH_RE.search(sdict)
        body_end = -1
        if lm:
            ln = int(lm.group(1))
            cand = body_start + ln
            # trust the declared length only if endstream follows it
            if data[cand : cand + 11].lstrip(b"\r\n")[:9] == b"endstream":
                body_end = cand
        if body_end < 0:
            e = data.find(b"endstream", body_start)
            if e < 0:
                return  # truncated final stream: stop
            body_end = e
            while body_end > body_start and data[body_end - 1 : body_end] in (b"\r", b"\n"):
                body_end -= 1
        yield sdict, data[body_start:body_end]
        # advance PAST the endstream keyword: 'endstream\n' itself ends
        # with 'stream\n' and would otherwise re-match as a bogus stream
        e = data.find(b"endstream", body_end)
        pos = (e + 9) if e >= 0 else len(data)


def _lzw_decode(data: bytes, early: int = 1) -> bytes:
    """TIFF-variant LZW (PDF /LZWDecode): MSB-first 9-12 bit codes,
    256 = clear table, 257 = EOD; /EarlyChange (default 1) bumps the
    code width one code early. Bounded by MAX_INFLATE."""
    base = {i: bytes([i]) for i in range(256)}
    table = dict(base)
    next_code, width = 258, 9
    out = bytearray()
    prev: bytes | None = None
    val = nbits = 0
    for byte in data:
        val = (val << 8) | byte
        nbits += 8
        while nbits >= width:
            code = (val >> (nbits - width)) & ((1 << width) - 1)
            nbits -= width
            val &= (1 << nbits) - 1
            if code == 256:
                table = dict(base)
                next_code, width = 258, 9
                prev = None
                continue
            if code == 257:
                return bytes(out)
            if prev is None:
                entry = table[code] if code in table else None
                if entry is None:
                    raise ValueError("LZW: first code not a literal")
            elif code in table:
                entry = table[code]
                table[next_code] = prev + entry[:1]
                next_code += 1
            elif code == next_code:
                entry = prev + prev[:1]
                table[next_code] = entry
                next_code += 1
            else:
                raise ValueError(f"LZW: code {code} out of range")
            out += entry
            if len(out) > MAX_INFLATE:
                raise ValueError(f"PDF stream inflates past {MAX_INFLATE} bytes")
            prev = entry
            if next_code + early >= (1 << width) and width < 12:
                width += 1
    return bytes(out)


def _rle_decode(data: bytes) -> bytes:
    """PDF /RunLengthDecode: length byte < 128 copies n+1 literals,
    > 128 repeats the next byte 257-n times, 128 = EOD."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        l = data[i]
        i += 1
        if l == 128:
            break
        if l < 128:
            out += data[i : i + l + 1]
            i += l + 1
        else:
            if i >= n:
                break
            out += data[i : i + 1] * (257 - l)
            i += 1
        if len(out) > MAX_INFLATE:
            raise ValueError(f"PDF stream inflates past {MAX_INFLATE} bytes")
    return bytes(out)


def _filter_names(sdict: bytes) -> list[bytes]:
    m = re.search(rb"/Filter\s*(\[[^\]]*\]|/[A-Za-z0-9]+)", sdict)
    if not m:
        return []
    return re.findall(rb"/([A-Za-z0-9]+)", m.group(1))


def _parse_decode_parms(sdict: bytes) -> list[bytes]:
    """Per-filter /DecodeParms (or /DP) dict bytes aligned with
    _filter_names order; b'' for null/absent entries."""
    m = re.search(rb"/(?:DecodeParms|DP)(?![#A-Za-z0-9])\s*", sdict)
    if not m:
        return []
    rest = sdict[m.end() :]
    if rest.startswith(b"<<"):
        return [_dict_at(rest, 0)]
    if rest.startswith(b"["):
        out: list[bytes] = []
        i, n = 1, len(rest)
        while i < n:
            if rest[i : i + 1] == b"]":
                break
            if rest[i : i + 2] == b"<<":
                d = _dict_at(rest, i)
                out.append(d)
                i += len(d)
            elif rest[i : i + 4] == b"null":
                out.append(b"")
                i += 4
            else:
                i += 1
        return out
    return []


def _parm_int(parms: bytes, key: bytes, default: int) -> int:
    m = re.search(rb"/" + key + rb"\s+(\d+)", parms)
    return int(m.group(1)) if m else default


def _unpredict(data: bytes, parms: bytes) -> bytes:
    """Undo /Predictor post-prediction on a Flate/LZW-decoded stream
    (ISO 32000-1 Table 10): 1 = none, 2 = TIFF horizontal differencing,
    >= 10 = PNG row filters (each row tagged None/Sub/Up/Average/Paeth).
    Raises on combinations this tier can't honestly undo — silently
    skipping would hand garbage to the CMap/ObjStm/content parsers."""
    pred = _parm_int(parms, b"Predictor", 1)
    if pred <= 1:
        return data
    colors = _parm_int(parms, b"Colors", 1)
    bpc = _parm_int(parms, b"BitsPerComponent", 8)
    cols = _parm_int(parms, b"Columns", 1)
    bpp = max(1, (colors * bpc + 7) // 8)
    rowlen = max(1, (cols * colors * bpc + 7) // 8)
    if pred == 2:
        if bpc != 8:
            raise ValueError(
                f"TIFF predictor with /BitsPerComponent {bpc} unsupported"
            )
        out = bytearray(data)
        for r0 in range(0, len(out), rowlen):
            end = min(r0 + rowlen, len(out))
            for i in range(r0 + bpp, end):
                out[i] = (out[i] + out[i - bpp]) & 0xFF
        return bytes(out)
    if pred < 10:
        raise ValueError(f"/Predictor {pred} is not a PDF predictor")
    out = bytearray()
    prev = bytearray(rowlen)
    i, n = 0, len(data)
    while i < n:
        ft = data[i]
        i += 1
        row = bytearray(data[i : i + rowlen])
        i += rowlen
        if len(row) < rowlen:
            raise ValueError("predictor-coded stream: truncated final row")
        if ft == 0:
            pass
        elif ft == 1:  # Sub
            for j in range(bpp, rowlen):
                row[j] = (row[j] + row[j - bpp]) & 0xFF
        elif ft == 2:  # Up
            for j in range(rowlen):
                row[j] = (row[j] + prev[j]) & 0xFF
        elif ft == 3:  # Average
            for j in range(rowlen):
                a = row[j - bpp] if j >= bpp else 0
                row[j] = (row[j] + ((a + prev[j]) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            for j in range(rowlen):
                a = row[j - bpp] if j >= bpp else 0
                b = prev[j]
                c = prev[j - bpp] if j >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                row[j] = (row[j] + pr) & 0xFF
        else:
            raise ValueError(f"PNG predictor row filter {ft} invalid")
        out += row
        prev = row
    return bytes(out)


def _decode_stream(sdict: bytes, body: bytes, upto: int | None = None) -> bytes | None:
    """Apply the stream's filter chain for the text-bearing filters
    (Flate, LZW, ASCIIHex, ASCII85, RunLength — in declared order);
    None for image filters (DCT/JPX/CCITT/JBIG2) this tier won't
    fake. Every inflating step is MAX_INFLATE-bounded. ``upto`` stops
    after the first ``upto`` filters — how pdf_images unwraps the
    transport filters AROUND a /DCTDecode payload without faking the
    DCT itself."""
    names = _filter_names(sdict)
    if upto is not None:
        names = names[:upto]
    if not names:
        return body
    import base64

    parms = _parse_decode_parms(sdict)

    def _parm(idx: int) -> bytes:
        return parms[idx] if idx < len(parms) else b""

    out = body
    for fi, nm in enumerate(names):
        if nm == b"FlateDecode":
            d = zlib.decompressobj()
            out = d.decompress(out, MAX_INFLATE + 1)
            if len(out) > MAX_INFLATE:
                raise ValueError(f"PDF stream inflates past {MAX_INFLATE} bytes")
            out = _unpredict(out, _parm(fi))
        elif nm == b"LZWDecode":
            em = re.search(rb"/EarlyChange\s+(\d+)", _parm(fi) or sdict)
            out = _lzw_decode(out, early=int(em.group(1)) if em else 1)
            out = _unpredict(out, _parm(fi))
        elif nm == b"ASCIIHexDecode":
            hx = re.sub(rb"[\s>]", b"", out.split(b">")[0] + b"")
            if len(hx) % 2:
                hx += b"0"
            out = bytes.fromhex(hx.decode("ascii"))
        elif nm == b"ASCII85Decode":
            payload = re.sub(rb"\s", b"", out).split(b"~>")[0]
            out = base64.a85decode(b"<~" + payload + b"~>", adobe=True)
            if len(out) > MAX_INFLATE:
                raise ValueError(f"PDF stream inflates past {MAX_INFLATE} bytes")
        elif nm == b"RunLengthDecode":
            out = _rle_decode(out)
        elif nm == b"Crypt":
            continue  # /Identity crypt filter: handled at the object layer
        else:
            return None  # DCT/JPX/CCITT/JBIG2: image data, not text
    return out


# --- object graph (scan-based, xref-free) ----------------------------------

_OBJ_START_RE = re.compile(rb"(\d+)\s+\d+\s+obj\b")
_PAGE_RE = re.compile(rb"/Type\s*/Page\b(?!s)")


def _object_map(data: bytes) -> dict[int, tuple[bytes, bytes | None]]:
    """num → (head_bytes, stream_body | None) by sequential scan.

    The scan advances past each object's stream body before looking for
    the next ``N 0 obj`` token, so binary stream content that happens
    to contain the pattern can't fabricate objects."""
    objs: dict[int, tuple[bytes, bytes | None]] = {}
    pos = 0
    count = 0
    while True:
        m = _OBJ_START_RE.search(data, pos)
        if not m:
            return objs
        count += 1
        if count > MAX_STREAMS:
            raise ValueError(f"PDF exceeds {MAX_STREAMS} objects")
        num = int(m.group(1))
        sm = _STREAM_RE.search(data, m.end())
        eo = data.find(b"endobj", m.end())
        if sm is not None and (eo < 0 or sm.start() < eo):
            head = data[m.end() : sm.start()]
            body_start = sm.end()
            lm = _LENGTH_RE.search(head)
            body_end = -1
            if lm:
                ln = int(lm.group(1))
                cand = body_start + ln
                if data[cand : cand + 11].lstrip(b"\r\n")[:9] == b"endstream":
                    body_end = cand
            if body_end < 0:
                e = data.find(b"endstream", body_start)
                if e < 0:
                    return objs  # truncated final stream: stop
                body_end = e
                while body_end > body_start and data[body_end - 1 : body_end] in (b"\r", b"\n"):
                    body_end -= 1
            objs[num] = (head, data[body_start:body_end])
            e = data.find(b"endstream", body_end)
            pos = (e + 9) if e >= 0 else len(data)
        else:
            if eo < 0:
                eo = len(data)
            objs[num] = (data[m.end() : eo], None)
            pos = eo + 6
    return objs


def _expand_objstm(objs: dict[int, tuple[bytes, bytes | None]]) -> None:
    """Inflate ``/Type /ObjStm`` streams and add their embedded objects
    (spec: never stream objects themselves) to the map. The ObjStm body
    starts with N (objnum, offset) integer pairs; object i spans from
    /First+offset_i to the next offset (or the end). A direct object
    with the same number wins — in a well-formed file the two never
    coexist, and preferring the directly-scanned bytes is the
    conservative choice for a hostile one."""
    extra: dict[int, tuple[bytes, bytes | None]] = {}
    for head, body in list(objs.values()):
        if body is None or not re.search(rb"/Type\s*/ObjStm\b", head):
            continue
        try:
            dec = _decode_stream(head, body)
        except zlib.error:
            continue  # corrupt/still-encrypted body: skip, don't die
        if dec is None:
            continue
        nm = re.search(rb"/N\s+(\d+)", head)
        fm = re.search(rb"/First\s+(\d+)", head)
        if not nm or not fm:
            continue
        n, first = int(nm.group(1)), int(fm.group(1))
        if n > MAX_STREAMS or first > len(dec):
            raise ValueError("ObjStm header out of bounds")
        toks = dec[:first].split()
        pairs = []
        for i in range(min(n, len(toks) // 2)):
            try:
                pairs.append((int(toks[2 * i]), int(toks[2 * i + 1])))
            except ValueError:
                break
        payload = dec[first:]
        for i, (onum, off) in enumerate(pairs):
            end = pairs[i + 1][1] if i + 1 < len(pairs) else len(payload)
            if 0 <= off <= end <= len(payload):
                extra[onum] = (payload[off:end], None)
    for k, v in extra.items():
        objs.setdefault(k, v)


def _dict_at(data: bytes, start: int) -> bytes:
    """Forward-balanced ``<< ... >>`` starting at ``data[start:]``."""
    depth = 0
    i = start
    n = min(len(data), start + (1 << 20))
    while i < n - 1:
        pair = data[i : i + 2]
        if pair == b"<<":
            depth += 1
            i += 2
        elif pair == b">>":
            depth -= 1
            i += 2
            if depth == 0:
                return data[start:i]
        else:
            i += 1
    return data[start:n]


def _lookup_dict(
    objs: dict, head: bytes, key: bytes
) -> bytes | None:
    """The dict value of ``/Key`` in ``head`` — inline ``<< ... >>``
    returned as bytes, or an ``N 0 R`` reference dereferenced to the
    target object's head."""
    m = re.search(re.escape(key) + rb"(?![#A-Za-z0-9])", head)
    if not m:
        return None
    rest = head[m.end() :].lstrip()
    if rest.startswith(b"<<"):
        return _dict_at(rest, 0)
    rm = re.match(rb"(\d+)\s+\d+\s+R", rest)
    if rm:
        tgt = objs.get(int(rm.group(1)))
        return tgt[0] if tgt else None
    return None


def _page_order(objs: dict) -> list[int]:
    """Document page order via the catalog's /Kids tree; object-scan
    order as the broken-graph fallback."""
    order: list[int] = []
    visited: set[int] = set()

    def walk(num: int, depth: int) -> None:
        if depth > 64 or num in visited or len(order) > MAX_STREAMS:
            return
        visited.add(num)
        entry = objs.get(num)
        if entry is None:
            return
        head = entry[0]
        if _PAGE_RE.search(head):
            order.append(num)
            return
        km = re.search(rb"/Kids\s*\[([^\]]*)\]", head)
        if km:
            for rm in re.finditer(rb"(\d+)\s+\d+\s+R", km.group(1)):
                walk(int(rm.group(1)), depth + 1)

    root = next(
        (
            n
            for n, (h, b) in objs.items()
            if b is None and re.search(rb"/Type\s*/Catalog\b", h)
        ),
        None,
    )
    if root is not None:
        pm = re.search(rb"/Pages\s+(\d+)\s+\d+\s+R", objs[root][0])
        if pm:
            walk(int(pm.group(1)), 0)
    if not order:
        order = [
            n
            for n in sorted(objs)
            if objs[n][1] is None and _PAGE_RE.search(objs[n][0])
        ]
    return order


def _content_refs(head: bytes) -> list[int]:
    m = re.search(rb"/Contents\s*\[([^\]]*)\]", head)
    if m:
        return [int(x) for x in re.findall(rb"(\d+)\s+\d+\s+R", m.group(1))]
    m = re.search(rb"/Contents\s+(\d+)\s+\d+\s+R", head)
    return [int(m.group(1))] if m else []


# --- fonts / ToUnicode CMaps ------------------------------------------------

_HEXTOK_RE = re.compile(rb"<([0-9A-Fa-f]+)>")


def _utf16be(hx: bytes) -> str:
    if len(hx) % 2:
        hx += b"0"
    raw = bytes.fromhex(hx.decode("ascii"))
    if len(raw) % 2:
        raw += b"\x00"
    return raw.decode("utf-16-be", errors="replace")


def _parse_tounicode(data: bytes | None) -> tuple[int, dict[int, str]] | None:
    """(code_byte_length, {code → unicode}) from a ToUnicode CMap.

    Covers ``bfchar`` pairs and ``bfrange`` entries in both the
    scalar-increment form (``<lo> <hi> <dstbase>`` — the destination is
    a big-endian integer incremented per code, the PDF 1.7 §9.10.3
    convention) and the array form (``<lo> <hi> [<d0> <d1> ...]``).
    Destination values are UTF-16BE (ligatures map to multiple chars,
    astral chars to surrogate pairs). Returns None when no mapping
    parses — the caller treats that as an unusable CMap and refuses."""
    if data is None:
        return None
    code_len = 2  # Identity-H's length; codespacerange overrides
    m = re.search(rb"begincodespacerange(.*?)endcodespacerange", data, re.S)
    if m:
        h = _HEXTOK_RE.search(m.group(1))
        if h:
            code_len = max(1, len(h.group(1)) // 2)
    mapping: dict[int, str] = {}
    for sec in re.finditer(rb"beginbfchar(.*?)endbfchar", data, re.S):
        toks = _HEXTOK_RE.findall(sec.group(1))
        for i in range(0, len(toks) - 1, 2):
            mapping[int(toks[i], 16)] = _utf16be(toks[i + 1])
    entry_re = re.compile(
        rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>\s*"
        rb"(\[(?:\s*<[0-9A-Fa-f]+>)*\s*\]|<[0-9A-Fa-f]+>)"
    )
    for sec in re.finditer(rb"beginbfrange(.*?)endbfrange", data, re.S):
        for em in entry_re.finditer(sec.group(1)):
            lo, hi = int(em.group(1), 16), int(em.group(2), 16)
            if hi < lo or hi - lo > 0xFFFF:
                continue  # hostile/corrupt range: skip, don't allocate
            dst = em.group(3)
            if dst.startswith(b"["):
                vals = _HEXTOK_RE.findall(dst)
                for i, v in enumerate(vals):
                    if lo + i > hi:
                        break
                    mapping[lo + i] = _utf16be(v)
            else:
                base_hx = dst.strip(b"<>")
                width = len(base_hx)
                base = int(base_hx, 16)
                for c in range(lo, hi + 1):
                    mapping[c] = _utf16be(
                        (b"%0*x" % (width, base + (c - lo)))[-width:]
                        if width
                        else b""
                    )
    return (code_len, mapping) if mapping else None


# Glyph-name → unicode for /Differences remaps: uniXXXX/uXXXX[XX]
# names resolve algorithmically (the AGL's own rule); the map below is
# the high-frequency Adobe-Glyph-List subset a Differences array
# actually remaps in machine-generated documents. An unknown name
# renders U+FFFD — explicit unknown, never a confidently wrong char.
_GLYPH_NAMES = {
    "space": " ", "exclam": "!", "quotedbl": '"', "numbersign": "#",
    "dollar": "$", "percent": "%", "ampersand": "&", "quotesingle": "'",
    "parenleft": "(", "parenright": ")", "asterisk": "*", "plus": "+",
    "comma": ",", "hyphen": "-", "period": ".", "slash": "/",
    "zero": "0", "one": "1", "two": "2", "three": "3", "four": "4",
    "five": "5", "six": "6", "seven": "7", "eight": "8", "nine": "9",
    "colon": ":", "semicolon": ";", "less": "<", "equal": "=",
    "greater": ">", "question": "?", "at": "@", "bracketleft": "[",
    "backslash": "\\", "bracketright": "]", "asciicircum": "^",
    "underscore": "_", "grave": "`", "braceleft": "{", "bar": "|",
    "braceright": "}", "asciitilde": "~",
    "adieresis": "ä", "odieresis": "ö", "udieresis": "ü",
    "Adieresis": "Ä", "Odieresis": "Ö", "Udieresis": "Ü",
    "germandbls": "ß", "eacute": "é", "egrave": "è", "ecircumflex": "ê",
    "agrave": "à", "acircumflex": "â", "ccedilla": "ç", "ntilde": "ñ",
    "aacute": "á", "iacute": "í", "oacute": "ó", "uacute": "ú",
    "quoteleft": "‘", "quoteright": "’",
    "quotedblleft": "“", "quotedblright": "”",
    "endash": "–", "emdash": "—", "bullet": "•",
    "ellipsis": "…", "fi": "ﬁ", "fl": "ﬂ", "degree": "°",
    "euro": "€", "sterling": "£", "yen": "¥", "cent": "¢",
    "section": "§", "paragraph": "¶", "copyright": "©",
    "registered": "®", "trademark": "™",
}


def _glyph_to_char(name: str) -> str:
    if len(name) == 1:
        return name  # /a /B /7 — the name IS the character
    m = re.fullmatch(r"uni([0-9A-Fa-f]{4})", name)
    if m:
        return chr(int(m.group(1), 16))
    m = re.fullmatch(r"u([0-9A-Fa-f]{4,6})", name)
    if m:
        cp = int(m.group(1), 16)
        return chr(cp) if cp <= 0x10FFFF else "�"
    return _GLYPH_NAMES.get(name, "�")


def _parse_differences(fhead: bytes) -> dict[int, str] | None:
    """byte → char overrides from a simple font's /Encoding
    << /Differences [ code /name /name ... code /name ... ] >>."""
    em = re.search(rb"/Differences\s*\[([^\]]*)\]", fhead)
    if not em:
        return None
    out: dict[int, str] = {}
    code = 0
    for tok in re.finditer(rb"(\d+)|/([^\s/<>\[\]()]+)", em.group(1)):
        if tok.group(1) is not None:
            code = int(tok.group(1))
        else:
            if 0 <= code <= 255:
                out[code] = _glyph_to_char(tok.group(2).decode("latin-1"))
            code += 1
    return out or None


def _font_decoder(objs: dict, fhead: bytes) -> tuple:
    """('simple', byte-override-map | None) for byte-per-char fonts
    (the map comes from an /Encoding /Differences array — unmapped
    bytes stay Latin-1); ('cid', (code_len, mapping)) for Type0 with a
    usable ToUnicode; ('cid', None) for Type0 without one — which
    refuses at first use."""
    if not re.search(rb"/Subtype\s*/Type0\b", fhead) and b"/Type0" not in fhead:
        diffs = _parse_differences(fhead)
        if diffs is None:
            # /Encoding may be an indirect dict holding the array
            enc = _lookup_dict(objs, fhead, b"/Encoding")
            if enc is not None:
                diffs = _parse_differences(enc)
        return ("simple", diffs)
    tu = re.search(rb"/ToUnicode\s+(\d+)\s+\d+\s+R", fhead)
    if tu:
        t = objs.get(int(tu.group(1)))
        if t is not None and t[1] is not None:
            parsed = _parse_tounicode(_decode_stream(t[0], t[1]))
            if parsed is not None:
                return ("cid", parsed)
    return ("cid", None)


def _page_resources(objs: dict, pnum: int) -> bytes | None:
    """The page's /Resources dict bytes, walking the /Parent chain when
    the page inherits resources (bounded depth)."""
    num: int | None = pnum
    for _ in range(32):
        if num is None:
            break
        entry = objs.get(num)
        if entry is None:
            break
        head = entry[0]
        res = _lookup_dict(objs, head, b"/Resources")
        if res is not None:
            return res
        pm = re.search(rb"/Parent\s+(\d+)\s+\d+\s+R", head)
        num = int(pm.group(1)) if pm else None
    return None


def _fonts_from_resources(objs: dict, res: bytes | None) -> dict[str, tuple]:
    """name → decoder for a /Resources dict's /Font entries."""
    fonts: dict[str, tuple] = {}
    if res is None:
        return fonts
    fdict = _lookup_dict(objs, res, b"/Font")
    if fdict is not None:
        for m in re.finditer(rb"/([^\s/<>\[\]()]+)\s+(\d+)\s+\d+\s+R", fdict):
            tgt = objs.get(int(m.group(2)))
            if tgt is not None:
                fonts[m.group(1).decode("latin-1")] = _font_decoder(objs, tgt[0])
    return fonts


def _xobject_refs(objs: dict, res: bytes | None) -> list[int]:
    """Object numbers of the /Resources dict's /XObject entries."""
    if res is None:
        return []
    xdict = _lookup_dict(objs, res, b"/XObject")
    if xdict is None:
        return []
    return [int(m.group(1)) for m in re.finditer(rb"\s(\d+)\s+\d+\s+R", xdict)]


_CID_REFUSAL = (
    "CID/Type0-font PDF without a usable /ToUnicode CMap: string bytes "
    "are glyph indices that need the font's CMap — Latin-1 decoding "
    "would be garbage"
)


# --- standard security handler (RC4, revisions 2-3) -------------------------
#
# Most "encrypted" PDFs in a crawl are owner-password-only: the USER
# password is empty, and the spec's standard handler derives the key
# from the padding constant alone — decrypting them is the documented,
# intended read path (PDF 1.7 §7.6.3), not a bypass. This tier covers
# /Filter /Standard with /V 1-2, /R 2-3 (RC4); AES (/V 4-5) and files
# whose user password is NOT empty still raise into quarantine.

_PWD_PAD = bytes.fromhex(
    "28BF4E5E4E758A4164004E56FFFA01082E2E00B6D0683E802F0CA9FE6453697A"
)


def _rc4(key: bytes, data: bytes) -> bytes:
    s = list(range(256))
    j = 0
    for i in range(256):
        j = (j + s[i] + key[i % len(key)]) & 0xFF
        s[i], s[j] = s[j], s[i]
    out = bytearray(len(data))
    i = j = 0
    for k, c in enumerate(data):
        i = (i + 1) & 0xFF
        j = (j + s[i]) & 0xFF
        s[i], s[j] = s[j], s[i]
        out[k] = c ^ s[(s[i] + s[j]) & 0xFF]
    return bytes(out)


def _md5(b: bytes) -> bytes:
    import hashlib

    return hashlib.md5(b).digest()


def _std_owner_value(r: int, n: int, owner_pwd: bytes, user_pwd: bytes) -> bytes:
    """Algorithm 3: the /O entry."""
    h = _md5((owner_pwd + _PWD_PAD)[:32])
    if r >= 3:
        for _ in range(50):
            h = _md5(h)
    rc4key = h[:n]
    o = _rc4(rc4key, (user_pwd + _PWD_PAD)[:32])
    if r >= 3:
        for i in range(1, 20):
            o = _rc4(bytes(b ^ i for b in rc4key), o)
    return o


def _std_encryption_key(
    r: int,
    n: int,
    o: bytes,
    p: int,
    file_id: bytes,
    user_pwd: bytes = b"",
    encrypt_metadata_false: bool = False,
) -> bytes:
    """Algorithm 2: the file encryption key (R4's /EncryptMetadata
    false appends 0xFFFFFFFF to the hash input)."""
    h = _md5(
        (user_pwd + _PWD_PAD)[:32]
        + o
        + (p & 0xFFFFFFFF).to_bytes(4, "little")
        + file_id
        + (b"\xff\xff\xff\xff" if encrypt_metadata_false else b"")
    )
    if r >= 3:
        for _ in range(50):
            h = _md5(h[:n])
    return h[:n]


def _std_user_value(r: int, key: bytes, file_id: bytes) -> bytes:
    """Algorithms 4 (R2) / 5 (R3): the /U entry."""
    if r == 2:
        return _rc4(key, _PWD_PAD)
    x = _rc4(key, _md5(_PWD_PAD + file_id))
    for i in range(1, 20):
        x = _rc4(bytes(b ^ i for b in key), x)
    return x + bytes(16)


def _object_rc4_key(key: bytes, num: int) -> bytes:
    """Algorithm 1's per-object key (generation 0 — the only generation
    the fixture writers and the scanning walk produce/see)."""
    return _md5(key + num.to_bytes(3, "little") + bytes(2))[: min(len(key) + 5, 16)]


def _pdf_string_bytes(head: bytes, key: bytes) -> bytes | None:
    """The value of /Key as raw PDF-string bytes: hex or literal."""
    m = re.search(re.escape(key) + rb"\s*<([0-9A-Fa-f\s]*)>", head)
    if m:
        hx = re.sub(rb"\s", b"", m.group(1))
        if len(hx) % 2:
            hx += b"0"
        return bytes.fromhex(hx.decode("ascii"))
    m = re.search(re.escape(key) + rb"\s*\(", head)
    if m:
        raw = _balanced_strings(head[m.end() - 1 :])
        sm = re.match(rb"\((?:[^()\\]|\\.)*\)", raw)
        if sm:
            return _unescape_literal(sm.group(0)[1:-1])
    return None


import functools


@functools.lru_cache(maxsize=64)
def _hash_2b(pwd: bytes, salt: bytes, udata: bytes = b"") -> bytes:
    """ISO 32000-2 Algorithm 2.B hardened hash (R6): SHA-256 seed, then
    AES-128-CBC-encrypt 64 copies of (pwd+K+udata) with K's halves as
    key/IV, re-hash with SHA-256/384/512 chosen by the first 16 bytes'
    sum mod 3, until round ≥ 64 and E's last byte ≤ round − 32.

    Deliberately expensive (it is a password KDF) but BOUNDED: the
    round count is 64-127 by construction and K1's size is bounded by
    |K| ≤ 64, so hostile bytes can't inflate it — ~0.35 s in pure
    Python per (pwd, salt) pair, memoized."""
    import hashlib

    from pg2kinesis_spark.functions.aes import cbc_encrypt

    k = hashlib.sha256(pwd + salt + udata).digest()
    i = 0
    while True:
        k1 = (pwd + k + udata) * 64
        e = cbc_encrypt(k[:16], k[16:32], k1, pad=False)[16:]  # strip IV
        k = (hashlib.sha256, hashlib.sha384, hashlib.sha512)[sum(e[:16]) % 3](
            e
        ).digest()
        i += 1
        if i >= 64 and e[-1] <= i - 32:
            return k[:32]


def _decrypt_objects(data: bytes, objs: dict, password: bytes = b"") -> None:
    """If the file uses the standard security handler — RC4 (V 1-2 /
    R 2-3), AES-128 AESV2 (V 4 / R 4), or AES-256 AESV3 (V 5 / R 6) —
    decrypt every stream body in place; raise for anything this tier
    can't honestly decrypt (wrong/missing password, non-Standard
    filters, unresolvable /Encrypt).

    ``password`` is tried BOTH ways, per the spec's own retry order:
    as the user password (Algorithm 2 / 2.A key derivation, validated
    against /U), then as the owner password (Algorithm 7: the /O-key
    RC4-unwrap recovers the padded user password; AESV3: the /O hash
    over /U's 48 bytes, file key from /OE). The default empty password
    keeps the owner-locked crawl case working with no credentials."""
    from pg2kinesis_spark.functions.aes import cbc_decrypt

    em = re.search(rb"/Encrypt\s+(\d+)\s+\d+\s+R", data)
    if not em:
        # inline /Encrypt dict (rare) — unsupported shape
        raise NotImplementedError("encrypted PDF: unresolvable /Encrypt")
    enc_num = int(em.group(1))
    entry = objs.get(enc_num)
    if entry is None:
        raise NotImplementedError("encrypted PDF: missing /Encrypt object")
    head = entry[0]
    fm = re.search(rb"/Filter\s*/(\w+)", head)
    vm = re.search(rb"/V\s+(\d+)", head)
    rm = re.search(rb"/R\s+(\d+)", head)
    v = int(vm.group(1)) if vm else 0
    r = int(rm.group(1)) if rm else 0
    supported = (
        fm is not None
        and fm.group(1) == b"Standard"
        and ((v in (1, 2) and r in (2, 3)) or (v, r) == (4, 4) or (v, r) == (5, 6))
    )
    # V4/V5 name the stream crypt filter via /StmF (default /StdCF):
    # /Identity means STREAMS ARE NOT ENCRYPTED — "decrypting" them
    # would produce garbage that silently skips as non-text. Any other
    # non-StdCF name is a custom filter this tier can't honestly apply.
    stmf = re.search(rb"/StmF\s*/(\w+)", head)
    stmf_name = stmf.group(1) if stmf else b"StdCF"
    if v >= 4 and stmf_name not in (b"StdCF", b"Identity"):
        supported = False
    if v == 4 and stmf_name != b"Identity" and b"/AESV2" not in head:
        supported = False  # V4 with a non-AES crypt filter chain
    if not supported:
        raise NotImplementedError(
            f"encrypted PDF: only the Standard handler with RC4 (V 1-2, "
            f"R 2-3), AESV2 (V 4), or AESV3 (V 5, R 6) decrypts; this file "
            f"has /Filter {fm.group(1).decode() if fm else '?'} /V {v} /R {r}"
        )
    if v >= 4 and stmf_name == b"Identity":
        # stream bodies are plaintext by declaration; this tier only
        # consumes streams, so there is nothing to decrypt (no key
        # needed — an empty-password check would be beside the point)
        return
    o_val = _pdf_string_bytes(head, b"/O")
    pm = re.search(rb"/P\s+(-?\d+)", head)
    u_val = _pdf_string_bytes(head, b"/U")
    if o_val is None or pm is None or u_val is None:
        raise NotImplementedError("encrypted PDF: malformed /Encrypt dict")

    no_creds = (
        "encrypted PDF: user password is not empty — cannot decrypt "
        "without credentials"
        if not password
        else "encrypted PDF: wrong password (matches neither /U nor /O)"
    )
    if r == 6:
        # AESV3: /U = hash(32) + validation salt(8) + key salt(8); the
        # file key comes from AES-decrypting /UE with the key-salt hash.
        # Algorithm 2.A truncates the (UTF-8) password to 127 bytes.
        password = password[:127]
        ue_val = _pdf_string_bytes(head, b"/UE")
        if len(u_val) < 48 or ue_val is None or len(ue_val) < 32:
            raise NotImplementedError("encrypted PDF: malformed AESV3 /U //UE")
        vsalt, ksalt = u_val[32:40], u_val[40:48]
        if _hash_2b(password, vsalt) == u_val[:32]:
            inter = _hash_2b(password, ksalt)
            key = cbc_decrypt(inter, bytes(16) + ue_val[:32], unpad=False)
        else:
            # owner path: /O hashes over the password + its validation
            # salt + the FULL 48-byte /U value; /OE unwraps the same
            # file key (ISO 32000-2 Algorithm 2.A steps e-f)
            oe_val = _pdf_string_bytes(head, b"/OE")
            if (
                len(o_val) >= 48
                and oe_val is not None
                and len(oe_val) >= 32
                and _hash_2b(password, o_val[32:40], u_val[:48]) == o_val[:32]
            ):
                inter = _hash_2b(password, o_val[40:48], u_val[:48])
                key = cbc_decrypt(inter, bytes(16) + oe_val[:32], unpad=False)
            else:
                raise NotImplementedError(no_creds)

        def dec(num: int, body: bytes) -> bytes:
            return cbc_decrypt(key, body)  # AESV3: file key used directly

    else:
        lm = re.search(rb"/Length\s+(\d+)", head)
        n = (int(lm.group(1)) // 8) if (lm and r >= 3) else 5
        idm = re.search(rb"/ID\s*\[\s*<([0-9A-Fa-f]*)>", data)
        file_id = bytes.fromhex(idm.group(1).decode("ascii")) if idm else b""
        meta = re.search(rb"/EncryptMetadata\s+false", head) is not None and r == 4

        def _try_user(user_pwd: bytes) -> bytes | None:
            k = _std_encryption_key(
                r, n, o_val[:32], int(pm.group(1)), file_id,
                user_pwd=user_pwd, encrypt_metadata_false=meta,
            )
            expect_u = _std_user_value(r, k, file_id)
            got, want = (
                (u_val[:16], expect_u[:16]) if r >= 3 else (u_val[:32], expect_u)
            )
            return k if got == want else None

        key = _try_user(password)
        if key is None and password:
            # Algorithm 7: the password as OWNER password — RC4-unwrap
            # /O back to the PADDED user password, then Algorithm 2
            h = _md5((password + _PWD_PAD)[:32])
            if r >= 3:
                for _ in range(50):
                    h = _md5(h)
            rc4key = h[:n]
            rec = o_val[:32]
            if r == 2:
                rec = _rc4(rc4key, rec)
            else:
                for i in range(19, -1, -1):
                    rec = _rc4(bytes(b ^ i for b in rc4key), rec)
            # rec IS the 32-byte padded user password; Algorithm 2's
            # (pwd + PAD)[:32] leaves it unchanged
            key = _try_user(rec)
        if key is None:
            raise NotImplementedError(no_creds)
        if v == 4:
            def dec(num: int, body: bytes) -> bytes:
                # AESV2 per-object key: the RC4 derivation + sAlT
                okey = _md5(
                    key + num.to_bytes(3, "little") + bytes(2) + b"sAlT"
                )[: min(n + 5, 16)]
                return cbc_decrypt(okey, body)
        else:
            def dec(num: int, body: bytes) -> bytes:
                return _rc4(_object_rc4_key(key, num), body)

    for num, (h, body) in list(objs.items()):
        # XRef streams are never encrypted (spec) and the /Encrypt
        # object itself holds no stream; a stream carrying its own
        # /Crypt filter with /Name /Identity (or no /Name — Identity is
        # the Table-26 default) opted out per-stream; everything else
        # decrypts.
        if body is None or num == enc_num or b"/XRef" in h:
            continue
        if b"Crypt" in _filter_names(h):
            nm = re.search(rb"/Name\s*/(\w+)", h)
            if nm is None or nm.group(1) == b"Identity":
                continue
            if nm.group(1) != b"StdCF":  # StdCF = the default decryption
                raise NotImplementedError(
                    f"encrypted PDF: per-stream /Crypt filter "
                    f"/{nm.group(1).decode()} is neither Identity nor StdCF"
                )
        try:
            objs[num] = (h, dec(num, body))
        except ValueError as e:
            raise NotImplementedError(f"encrypted PDF: {e}") from e


def _unescape_literal(raw: bytes) -> bytes:
    out = bytearray()
    i, n = 0, len(raw)
    esc = {
        ord("n"): 10, ord("r"): 13, ord("t"): 9, ord("b"): 8, ord("f"): 12,
        ord("("): 40, ord(")"): 41, ord("\\"): 92,
    }
    while i < n:
        c = raw[i]
        if c != 0x5C:  # backslash
            out.append(c)
            i += 1
            continue
        i += 1
        if i >= n:
            break
        c = raw[i]
        if c in esc:
            out.append(esc[c])
            i += 1
        elif 0x30 <= c <= 0x37:  # octal, up to 3 digits
            j = i
            while j < min(i + 3, n) and 0x30 <= raw[j] <= 0x37:
                j += 1
            out.append(int(raw[i:j], 8) & 0xFF)
            i = j
        elif c in (10, 13):  # line continuation
            i += 1
            if c == 13 and i < n and raw[i] == 10:
                i += 1
        else:
            out.append(c)
            i += 1
    return bytes(out)


_TOKEN_RE = re.compile(
    rb"\((?:[^()\\]|\\.)*\)"      # literal string (no nesting: pre-balanced)
    rb"|<[0-9A-Fa-f\s]*>"          # hex string
    rb"|\[|\]"
    rb"|[-+]?[0-9]*\.?[0-9]+"
    rb"|/[^\s\[\]()<>/]*"
    rb"|[A-Za-z'\"*]+",
)


def _balanced_strings(content: bytes) -> bytes:
    """PDF literal strings allow BALANCED unescaped parens; the token
    regex doesn't. Pre-pass: escape inner balanced parens so the regex
    sees flat strings (bounded single scan)."""
    out = bytearray()
    depth = 0
    i, n = 0, len(content)
    while i < n:
        c = content[i]
        if c == 0x5C and depth > 0 and i + 1 < n:
            out += content[i : i + 2]
            i += 2
            continue
        if c == 0x28:  # (
            depth += 1
            out += b"\\(" if depth > 1 else b"("
        elif c == 0x29:  # )
            if depth > 1:
                out += b"\\)"
            else:
                out += b")"
            depth = max(0, depth - 1)
        else:
            out.append(c)
        i += 1
    return bytes(out)


def _extract_text_ops(
    content: bytes,
    parts: list[str],
    fonts: dict[str, tuple] | None = None,
    has_type0: bool = False,
) -> None:
    """Walk one content stream's BT..ET blocks, appending text pieces
    and newline markers to ``parts`` (str).

    ``fonts`` is the page's name → decoder map; ``Tf`` switches the
    active decoder. Simple fonts decode Latin-1; CID fonts decode
    fixed-width big-endian codes through their ToUnicode mapping (an
    unmapped code renders U+FFFD — explicit unknown, never confident
    garbage). A CID font with no usable CMap raises at first use. When
    the document contains a Type0 font but a ``Tf`` names a font the
    resource walk couldn't resolve, text under it also raises — it
    could be CID-coded bytes."""
    cur: tuple = ("unknown", None)

    def show(b: bytes) -> None:
        kind, mp = cur
        if kind == "cid":
            if mp is None:
                raise NotImplementedError(_CID_REFUSAL)
            code_len, mapping = mp
            parts.append(
                "".join(
                    mapping.get(int.from_bytes(b[i : i + code_len], "big"), "�")
                    for i in range(0, len(b) - code_len + 1, code_len)
                )
            )
            return
        if kind == "unknown" and has_type0 and fonts is not None:
            raise NotImplementedError(_CID_REFUSAL)
        if mp:  # /Encoding /Differences overrides; other bytes Latin-1
            parts.append("".join(mp.get(x, chr(x)) for x in b))
        else:
            parts.append(b.decode("latin-1"))

    pos = 0
    while True:
        bt = content.find(b"BT", pos)
        if bt < 0:
            return
        et = content.find(b"ET", bt + 2)
        if et < 0:
            et = len(content)
        block = _balanced_strings(content[bt + 2 : et])
        stack: list = []  # recent operands
        in_array: list | None = None
        for m in _TOKEN_RE.finditer(block):
            tok = m.group(0)
            if tok == b"[":
                in_array = []
            elif tok == b"]":
                stack.append(in_array)
                in_array = None
            elif tok.startswith(b"("):
                s = _unescape_literal(tok[1:-1])
                (in_array if in_array is not None else stack).append(s)
            elif tok.startswith(b"<"):
                hx = re.sub(rb"\s", b"", tok[1:-1])
                if len(hx) % 2:
                    hx += b"0"
                s = bytes.fromhex(hx.decode("ascii"))
                (in_array if in_array is not None else stack).append(s)
            elif tok.startswith(b"/"):
                # name tokens carry a distinct wrapper: a LITERAL STRING
                # whose decoded bytes begin with '/' (e.g. a unix path)
                # is real text and must never be mistaken for a name by
                # a byte-prefix heuristic (or vice versa)
                (in_array if in_array is not None else stack).append(("name", tok))
            elif tok[:1] in b"-+.0123456789":
                try:
                    v: float | None = float(tok)
                except ValueError:
                    v = None
                (in_array if in_array is not None else stack).append(v)
            elif tok == b"Tf":
                # operands: /Name size — only a genuine NAME token can
                # switch the active font; a literal string like (/F2)
                # left on the stack by malformed content cannot
                name = next(
                    (
                        o[1]
                        for o in reversed(stack)
                        if isinstance(o, tuple) and o[0] == "name"
                    ),
                    None,
                )
                if fonts is not None and name is not None:
                    cur = fonts.get(name[1:].decode("latin-1"), ("unknown", None))
                stack.clear()
            elif tok == b"Tj":
                if stack and isinstance(stack[-1], bytes):
                    show(stack[-1])
                stack.clear()
            elif tok in (b"'", b'"'):
                parts.append("\n")
                if stack and isinstance(stack[-1], bytes):
                    show(stack[-1])
                stack.clear()
            elif tok == b"TJ":
                if stack and isinstance(stack[-1], list):
                    for item in stack[-1]:
                        if isinstance(item, bytes):
                            show(item)  # names are tuples, never shown
                        elif isinstance(item, float) and item <= _KERN_SPACE:
                            parts.append(" ")
                stack.clear()
            elif tok == b"T*":
                parts.append("\n")
                stack.clear()
            elif tok in (b"Td", b"TD"):
                ty = stack[-1] if stack and isinstance(stack[-1], float) else 0.0
                if ty:  # vertical movement = new line
                    parts.append("\n")
                stack.clear()
            elif tok == b"Tm":
                parts.append("\n")
                stack.clear()
            elif re.fullmatch(rb"[A-Za-z*]+", tok):
                stack.clear()  # any other operator consumes its operands
        pos = et + 2


def _has_type0(data: bytes, objs: dict) -> bool:
    if b"/Type0" in data or b"/Identity-H" in data:
        return True
    return any(
        b"/Type0" in h or b"/Identity-H" in h for h, _ in objs.values()
    )


def pdf_text(data: bytes, password: bytes | str = b"") -> str:
    """Extract text from a simple-font or ToUnicode-mapped CID-font
    PDF. Raises on encrypted documents whose password isn't supplied,
    on CID fonts WITHOUT a usable ToUnicode CMap (decoding those as
    Latin-1 would be confident garbage), and on bomb-sized streams —
    route through the quarantine channel at corpus scale.

    ``password`` (str is encoded latin-1, the PDFDocEncoding-compatible
    range) is tried as the user and then the owner password; the
    default empty string covers the owner-locked crawl case."""
    data = bytes(data)
    if isinstance(password, str):
        password = password.encode("latin-1")
    if not is_pdf(data):
        raise ValueError("not a PDF: missing %PDF- header")
    objs = _object_map(data)
    if b"/Encrypt" in data:
        # the standard handler decrypts for real (empty password = the
        # owner-locked case; a supplied password is tried as user then
        # owner); anything else raises into quarantine from
        # _decrypt_objects
        _decrypt_objects(data, objs, password=password)
    _expand_objstm(objs)
    order = _page_order(objs)
    has_t0 = _has_type0(data, objs)
    parts: list[str] = []
    if order:
        # object-graph walk: per-page resources pick each content
        # stream's font decoders (the only correct way to CID-decode)
        seen_streams: set[int] = set()
        for pnum in order:
            head = objs[pnum][0]
            res = _page_resources(objs, pnum)
            fonts = _fonts_from_resources(objs, res)

            def _extract_stream(num: int, use_fonts: dict) -> None:
                entry = objs.get(num)
                if num in seen_streams or entry is None or entry[1] is None:
                    return
                seen_streams.add(num)
                decoded = _decode_stream(entry[0], entry[1])
                if decoded is None or b"BT" not in decoded:
                    return
                _extract_text_ops(decoded, parts, fonts=use_fonts, has_type0=has_t0)

            for cnum in _content_refs(head):
                _extract_stream(cnum, fonts)
            # Form XObjects: text drawn via `/Fm Do` lives in a stream
            # the page merely references — the pre-round-6 every-stream
            # walk extracted it, so the graph walk must too. A form's
            # own /Resources fonts win over the page's; shared forms
            # extract once (first referencing page), matching the old
            # one-pass-per-stream behavior. One level deep (a form
            # referencing another form is rare enough to leave to the
            # fallback-shaped future).
            for xnum in _xobject_refs(objs, res):
                xentry = objs.get(xnum)
                if xentry is None:
                    continue
                own = _lookup_dict(objs, xentry[0], b"/Resources")
                xfonts = _fonts_from_resources(objs, own) if own is not None else fonts
                _extract_stream(xnum, xfonts)
            parts.append("\n")
    else:
        # no page graph resolves (bare content streams, stripped files):
        # the every-stream walk, which can't tie streams to resources —
        # so any Type0 presence refuses wholesale
        if has_t0:
            raise NotImplementedError(_CID_REFUSAL)
        for sdict, body in _iter_streams(data):
            decoded = _decode_stream(sdict, body)
            if decoded is None or b"BT" not in decoded:
                continue
            _extract_text_ops(decoded, parts)
            parts.append("\n")
    text = "".join(parts)
    # collapse runs the line-structure ops produce
    text = re.sub(r"[ \t]*\n[ \t]*", "\n", text)
    return re.sub(r"\n{3,}", "\n\n", text).strip("\n")


def pdf_page_count(data: bytes, password: bytes | str = b"") -> int:
    """Page-dict count, seeing through ObjStm compression (and the
    standard RC4 handler); raw-bytes regex as the fallback."""
    data = bytes(data)
    if isinstance(password, str):
        password = password.encode("latin-1")
    try:
        objs = _object_map(data)
        if b"/Encrypt" in data:
            _decrypt_objects(data, objs, password=password)
        _expand_objstm(objs)
    except (ValueError, NotImplementedError):
        objs = {}
    n = sum(1 for h, b in objs.values() if b is None and _PAGE_RE.search(h))
    if n:
        return n
    return len(_PAGE_RE.findall(data))


_IMAGE_RE = re.compile(rb"/Subtype\s*/Image\b")
_INDEXED_RE = re.compile(
    rb"/ColorSpace\s*\[\s*/(?:Indexed|I)\s*/(DeviceRGB|DeviceGray)\s+(\d+)\s*"
    rb"(?:<([0-9A-Fa-f\s]*)>|\((.*?)\)|(\d+)\s+\d+\s+R)",
    re.S,
)


def _indexed_palette(objs: dict, head: bytes) -> tuple[bytes, int] | None:
    """(lookup_bytes, base_channels) for an /Indexed colorspace image —
    lookup as a hex string, literal string, or stream reference — or
    None when the image isn't indexed."""
    m = _INDEXED_RE.search(head)
    if m is None:
        return None
    base_nch = 3 if m.group(1) == b"DeviceRGB" else 1
    hival = int(m.group(2))
    if m.group(3) is not None:
        # any PDF whitespace may split the hex pairs, and an odd-length
        # hex string implies a trailing 0 (ISO 32000 §7.3.4.3)
        hx = re.sub(rb"\s+", b"", m.group(3))
        if len(hx) % 2:
            hx += b"0"
        lookup = bytes.fromhex(hx.decode("ascii"))
    elif m.group(4) is not None:
        lookup = _unescape_literal(m.group(4))
    else:
        ref = objs.get(int(m.group(5)))
        if ref is None or ref[1] is None:
            raise ValueError("/Indexed lookup stream missing")
        lookup = _decode_stream(ref[0], ref[1])
        if lookup is None:
            raise NotImplementedError("/Indexed lookup behind an image filter")
    need = (hival + 1) * base_nch
    if len(lookup) < need:
        raise ValueError(
            f"/Indexed lookup short: {len(lookup)} < {need} for hival {hival}"
        )
    return lookup[:need], base_nch


def _img_int(head: bytes, key: bytes) -> int | None:
    m = re.search(re.escape(key) + rb"\s+(\d+)", head)
    return int(m.group(1)) if m else None


def _ink_png(black) -> bytes:
    """Bool ink mask (True = black) -> grayscale PNG bytes — the one
    rendering convention shared by the CCITT and JBIG2 plate paths."""
    import numpy as np

    from pg2kinesis_spark.functions import codecs as C

    gray = np.where(black, 0, 255).astype(np.uint8)[:, :, None]
    return C.encode_png(gray)


def pdf_images(data: bytes, password: bytes | str = b"") -> list[tuple]:
    """Embedded raster images from a PDF's Image XObjects, as
    (index, bytes | None, mime | None, error | None) rows — the
    composition seam that feeds figures/covers into the image tier
    (dHash / near-dup / exact dedup) the way audio cover art does.

    Found by scanning EVERY stream object for /Subtype /Image (so
    images referenced from Form XObjects or orphaned by a broken page
    tree still surface), through the same object-graph plumbing as
    pdf_text: ObjStm expansion and standard-handler decryption
    included. Two real extractions:

    * **/DCTDecode** payloads ARE JPEG files: transport filters before
      the DCT (Flate/A85/AHx/RLE) are unwrapped, the JPEG bytes pass
      through untouched — arithmetic/12-bit/progressive handling is
      decode_jpeg's contract downstream, exactly like any other JPEG.
    * **Raw-sample images** (no filter, or fully decodable chains) in
      8-bit /DeviceRGB or /DeviceGray re-wrap losslessly as PNG via
      codecs.encode_png, so downstream sees one uniform image format.

    **/CCITTFaxDecode** and (round 12) **/JBIG2Decode** plates decode
    to pixels: CCITT through the G3/G4 kernel, JBIG2 generic regions
    through the MQ-coder tier (functions/jbig2.py, incl.
    /JBIG2Globals resolution); both render black ink = 0 and re-wrap
    as PNG (MMR regions ride the same CCITT kernel; symbol-dictionary
    + text-region pages decode through the Annex A integer-arithmetic
    tier). JBIG2 halftone/refinement/Huffman segments, JPX payloads,
    exotic colorspaces, and sub-8-bit depths
    yield (idx, None, None, reason) — per-image quarantine, the whole
    document never fails over one plate."""
    data = bytes(data)
    if isinstance(password, str):
        password = password.encode("latin-1")
    objs = _object_map(data)
    if b"/Encrypt" in data:
        _decrypt_objects(data, objs, password=password)
    _expand_objstm(objs)
    out: list[tuple] = []
    idx = 0
    for num in sorted(objs):
        head, body = objs[num]
        if body is None or not _IMAGE_RE.search(head):
            continue
        names = _filter_names(head)
        try:
            if names and names[-1] == b"DCTDecode":
                jpg = _decode_stream(head, body, upto=len(names) - 1)
                if jpg is None:
                    raise NotImplementedError(
                        "image filter before the DCT payload"
                    )
                out.append((idx, jpg, "image/jpeg", None))
            elif names and names[-1] == b"CCITTFaxDecode":
                from pg2kinesis_spark.functions import ccitt as ccitt_mod

                fax = _decode_stream(head, body, upto=len(names) - 1)
                if fax is None:
                    raise NotImplementedError(
                        "image filter before the CCITT payload"
                    )
                w = _img_int(head, b"/Width")
                h = _img_int(head, b"/Height")
                if not w or not h:
                    raise ValueError("image without /Width + /Height")
                parms = _parse_decode_parms(head)
                p = parms[len(names) - 1] if len(parms) >= len(names) else b""
                mk = re.search(rb"/K\s+(-?\d+)", p)
                k = int(mk.group(1)) if mk else 0
                cols = _parm_int(p, b"Columns", 1728)
                rows = _parm_int(p, b"Rows", h)
                ba = bool(re.search(rb"/EncodedByteAlign\s+true", p))
                if cols != w or rows < h:
                    raise ValueError(
                        f"/CCITTFaxDecode geometry {cols}x{rows} vs "
                        f"image {w}x{h}"
                    )
                # the CCITT pen is rendered directly (black ink = 0):
                # /BlackIs1 + /Decode only pick the intermediate BIT
                # convention, which this path never materializes
                black = ccitt_mod.ccitt_decode(fax, w, h, k=k, byte_align=ba)
                out.append((idx, _ink_png(black), "image/png", None))
            elif names and names[-1] == b"JBIG2Decode":
                from pg2kinesis_spark.functions import jbig2 as jbig2_mod

                emb = _decode_stream(head, body, upto=len(names) - 1)
                if emb is None:
                    raise NotImplementedError(
                        "image filter before the JBIG2 payload"
                    )
                w = _img_int(head, b"/Width")
                h = _img_int(head, b"/Height")
                if not w or not h:
                    raise ValueError("image without /Width + /Height")
                parms = _parse_decode_parms(head)
                p = parms[len(names) - 1] if len(parms) >= len(names) else b""
                glob = b""
                mg = re.search(rb"/JBIG2Globals\s+(\d+)\s+\d+\s+R", p)
                if mg:
                    gnum = int(mg.group(1))
                    if gnum not in objs or objs[gnum][1] is None:
                        raise ValueError("/JBIG2Globals object missing")
                    ghead, gbody = objs[gnum]
                    glob = _decode_stream(ghead, gbody)
                    if glob is None:
                        raise NotImplementedError(
                            "undecodable /JBIG2Globals filter chain"
                        )
                black = jbig2_mod.decode_jbig2(emb, glob)
                if black.shape != (h, w):
                    # pages can be declared larger than the image dict
                    if black.shape[0] < h or black.shape[1] < w:
                        raise ValueError(
                            f"JBIG2 page {black.shape} smaller than "
                            f"image {w}x{h}"
                        )
                    black = black[:h, :w]
                out.append((idx, _ink_png(black), "image/png", None))
            elif names and names[-1] == b"JPXDecode":
                raise NotImplementedError(
                    f"{names[-1].decode()} image payloads"
                )
            else:
                raw = _decode_stream(head, body)
                if raw is None:
                    raise NotImplementedError("undecodable image filter chain")
                w = _img_int(head, b"/Width")
                h = _img_int(head, b"/Height")
                bpc = _img_int(head, b"/BitsPerComponent")
                if not w or not h:
                    raise ValueError("image without /Width + /Height")
                import numpy as np

                from pg2kinesis_spark.functions import codecs as C

                pal = _indexed_palette(objs, head)
                if pal is not None:
                    # /Indexed: samples are palette indices at 1/2/4/8
                    # bits, rows padded to byte boundaries
                    if bpc not in (1, 2, 4, 8):
                        raise NotImplementedError(
                            f"{bpc}-bit indexed samples"
                        )
                    lookup, base_nch = pal
                    row_bytes = (w * bpc + 7) // 8
                    if len(raw) < row_bytes * h:
                        raise ValueError("indexed samples shorter than raster")
                    rows = np.frombuffer(
                        raw[: row_bytes * h], dtype=np.uint8
                    ).reshape(h, row_bytes)
                    if bpc == 8:
                        idxs = rows[:, :w]
                    else:
                        bits = np.unpackbits(rows, axis=1)
                        per = 8 // bpc
                        bits = bits[:, : w * bpc].reshape(h, w, bpc)
                        weights = (1 << np.arange(bpc - 1, -1, -1)).astype(
                            np.uint8
                        )
                        idxs = (bits * weights).sum(axis=2).astype(np.uint8)
                    if int(idxs.max(initial=0)) * base_nch >= len(lookup):
                        raise ValueError("palette index beyond /Indexed hival")
                    table = np.frombuffer(lookup, dtype=np.uint8).reshape(
                        -1, base_nch
                    )
                    img = table[idxs.reshape(-1)].reshape(h, w, base_nch)
                    out.append((idx, C.encode_png(img), "image/png", None))
                    idx += 1
                    continue
                if bpc != 8:
                    raise NotImplementedError(
                        f"{bpc}-bit raw image samples (8-bit tier)"
                    )
                if re.search(rb"/ColorSpace\s*/DeviceRGB\b", head):
                    nch = 3
                elif re.search(rb"/ColorSpace\s*/DeviceGray\b", head):
                    nch = 1
                else:
                    raise NotImplementedError(
                        "raw image colorspace beyond DeviceRGB/DeviceGray"
                    )
                if len(raw) < w * h * nch:
                    raise ValueError("raw image samples shorter than W*H*C")
                img = np.frombuffer(
                    raw[: w * h * nch], dtype=np.uint8
                ).reshape(h, w, nch)
                out.append((idx, C.encode_png(img), "image/png", None))
        except Exception as e:
            out.append((idx, None, None, f"{type(e).__name__}: {e}"))
        idx += 1
    return out


# --- fixture writer --------------------------------------------------------

def _esc_pdf(s: str) -> str:
    return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


def _assemble_pdf(
    objs: list[bytes | None],
    catalog: int,
    objstm_members: dict[int, bytes] | None = None,
    encrypt_r: int | None = None,
    user_password: bytes = b"",
    owner_password: bytes = b"",
) -> bytes:
    """Serialize numbered objects (+ optional ObjStm packing) into a
    file. ``objs[i]`` is object i+1's body; a None slot means that
    object lives in ``objstm_members`` (num → dict bytes) and is
    emitted only inside the object stream. ``encrypt_r`` (2 or 3)
    encrypts every stream body with the standard RC4 handler at that
    revision, empty owner AND user passwords — the owner-locked layout
    a crawl actually meets. The classic-xref table only covers the
    direct objects — readers of these fixtures scan, so the xref is
    cosmetic (a spec-complete ObjStm file would use an xref stream)."""
    out = bytearray(b"%PDF-1.5\n" if objstm_members else b"%PDF-1.4\n")
    direct: list[tuple[int, bytes]] = [
        (i, body) for i, body in enumerate(objs, 1) if body is not None
    ]
    if objstm_members:
        # ObjStm body: "num offset" pairs, then the members back-to-back
        payload = bytearray()
        header = bytearray()
        for num, dct in sorted(objstm_members.items()):
            header += f"{num} {len(payload)} ".encode()
            payload += dct + b"\n"
        first = len(header)
        z = zlib.compress(bytes(header) + bytes(payload))
        stm = (
            b"<< /Type /ObjStm /N " + str(len(objstm_members)).encode()
            + b" /First " + str(first).encode()
            + b" /Length " + str(len(z)).encode()
            + b" /Filter /FlateDecode >>\nstream\n" + z + b"\nendstream"
        )
        direct.append((len(objs) + 1, stm))
    enc_num = None
    enc_trailer = b""
    if encrypt_r is not None:
        if encrypt_r not in (2, 3, 4, 6):
            raise ValueError(
                f"encrypt_r must be 2/3 (RC4), 4 (AESV2) or 6 (AESV3), "
                f"got {encrypt_r}"
            )
        from pg2kinesis_spark.functions.aes import cbc_encrypt

        p = -44  # typical print-allowed permission mask
        file_id = _md5(b"pg2kinesis_spark pdf fixture id")
        if encrypt_r == 6:
            # AESV3: deterministic salts/key; passwords default empty
            # (the owner-locked layout)
            vsalt = _md5(b"fixture vsalt")[:8]
            ksalt = _md5(b"fixture ksalt")[:8]
            key = _md5(b"fixture file key A") + _md5(b"fixture file key B")
            u_val = _hash_2b(user_password, vsalt) + vsalt + ksalt
            ue_val = cbc_encrypt(
                _hash_2b(user_password, ksalt), bytes(16), key, pad=False
            )[16:]
            o_vs = _md5(b"fixture o vsalt")[:8]
            o_ks = _md5(b"fixture o ksalt")[:8]
            o_val = _hash_2b(owner_password, o_vs, u_val) + o_vs + o_ks
            oe_val = cbc_encrypt(
                _hash_2b(owner_password, o_ks, u_val), bytes(16), key, pad=False
            )[16:]

            def enc_body(num: int, raw: bytes) -> bytes:
                iv = _md5(b"iv" + num.to_bytes(4, "little"))
                return cbc_encrypt(key, iv, raw)

            enc_dict = (
                b"<< /Filter /Standard /V 5 /R 6 /Length 256"
                b" /O <" + o_val.hex().encode() + b">"
                b" /U <" + u_val.hex().encode() + b">"
                b" /OE <" + oe_val.hex().encode() + b">"
                b" /UE <" + ue_val.hex().encode() + b">"
                b" /P " + str(p).encode() +
                b" /CF << /StdCF << /CFM /AESV3 /Length 32 >> >>"
                b" /StmF /StdCF /StrF /StdCF >>"
            )
        else:
            n = 5 if encrypt_r == 2 else 16
            o_val = _std_owner_value(
                encrypt_r, n, owner_password or user_password, user_password
            )
            key = _std_encryption_key(
                encrypt_r, n, o_val, p, file_id, user_pwd=user_password
            )
            u_val = _std_user_value(encrypt_r, key, file_id)
            if encrypt_r == 4:
                def enc_body(num: int, raw: bytes) -> bytes:
                    okey = _md5(
                        key + num.to_bytes(3, "little") + bytes(2) + b"sAlT"
                    )[: min(n + 5, 16)]
                    iv = _md5(b"iv" + num.to_bytes(4, "little"))
                    return cbc_encrypt(okey, iv, raw)

                enc_dict = (
                    b"<< /Filter /Standard /V 4 /R 4 /Length 128"
                    b" /O <" + o_val.hex().encode() + b">"
                    b" /U <" + u_val.hex().encode() + b">"
                    b" /P " + str(p).encode() +
                    b" /CF << /StdCF << /CFM /AESV2 /Length 16 >> >>"
                    b" /StmF /StdCF /StrF /StdCF >>"
                )
            else:
                def enc_body(num: int, raw: bytes) -> bytes:
                    return _rc4(_object_rc4_key(key, num), raw)

                enc_dict = (
                    b"<< /Filter /Standard /V "
                    + (b"1" if encrypt_r == 2 else b"2")
                    + b" /R " + str(encrypt_r).encode()
                    + b" /Length " + str(n * 8).encode()
                    + b" /O <" + o_val.hex().encode() + b">"
                    + b" /U <" + u_val.hex().encode() + b">"
                    + b" /P " + str(p).encode() + b" >>"
                )
        encrypted: list[tuple[int, bytes]] = []
        for num, body in direct:
            sm = _STREAM_RE.search(body)
            if sm and body.endswith(b"\nendstream"):
                raw = body[sm.end() : -len(b"\nendstream")]
                ct = enc_body(num, raw)
                # AES padding/IV changes the length: fix /Length so the
                # declared-length fast path still lands on 'endstream'
                head_part = body[: sm.start()]
                head_part = re.sub(
                    rb"/Length\s+\d+",
                    b"/Length " + str(len(ct)).encode(),
                    head_part,
                    count=1,
                )
                body = head_part + b"stream\n" + ct + b"\nendstream"
            encrypted.append((num, body))
        direct = encrypted
        enc_num = len(objs) + (3 if objstm_members else 2)
        direct.append((enc_num, enc_dict))
        enc_trailer = (
            b" /Encrypt " + str(enc_num).encode() + b" 0 R /ID [ <"
            + file_id.hex().encode() + b"> <" + file_id.hex().encode() + b"> ]"
        )
    offsets = []
    for num, body in direct:
        offsets.append((num, len(out)))
        out += str(num).encode() + b" 0 obj\n" + body + b"\nendobj\n"
    xref_at = len(out)
    out += b"xref\n0 1\n0000000000 65535 f \n"
    for num, off in offsets:
        out += f"{num} 1\n{off:010d} 00000 n \n".encode()
    total = max(n_ for n_, _ in direct) + 1 if direct else 1
    out += (
        b"trailer\n<< /Size " + str(total).encode()
        + b" /Root " + str(catalog).encode() + b" 0 R" + enc_trailer
        + b" >>\nstartxref\n"
        + str(xref_at).encode() + b"\n%%EOF\n"
    )
    return bytes(out)


class _PdfBuilder:
    """Shared fixture-writer bookkeeping: object numbering, optional
    ObjStm membership for non-stream dicts, and the page-tree/catalog
    assembly both encode_pdf and encode_pdf_cid need."""

    def __init__(
        self,
        objstm: bool,
        encrypt_r: int | None = None,
        user_password: bytes = b"",
        owner_password: bytes = b"",
    ):
        self.objstm = objstm
        self.encrypt_r = encrypt_r
        self.user_password = user_password
        self.owner_password = owner_password
        self.objs: list[bytes | None] = []
        self.members: dict[int, bytes] = {}

    def add(self, body: bytes | None) -> int:
        self.objs.append(body)
        return len(self.objs)  # 1-based object number

    def add_dict(self, body: bytes) -> int:
        if self.objstm:
            num = self.add(None)
            self.members[num] = body
            return num
        return self.add(body)

    def add_stream(self, stream: bytes, compress: bool = False) -> int:
        if compress:
            z = zlib.compress(stream)
            return self.add(
                b"<< /Length " + str(len(z)).encode()
                + b" /Filter /FlateDecode >>\nstream\n" + z + b"\nendstream"
            )
        return self.add(
            b"<< /Length " + str(len(stream)).encode()
            + b" >>\nstream\n" + stream + b"\nendstream"
        )

    def add_image(
        self, payload: bytes, w: int, h: int, kind: str,
        palette: bytes | None = None, bpc: int = 8,
    ) -> int:
        """An Image XObject stream: kind 'jpeg' stores the bytes under
        /DCTDecode; 'rgb'/'gray' store raw 8-bit samples; 'indexed'
        stores palette indices at ``bpc`` bits with the RGB ``palette``
        as a hex-string /Indexed lookup; 'ccitt-g4'/'ccitt-g3'/
        'ccitt-mh' store pre-coded fax bytes under /CCITTFaxDecode
        with the matching /DecodeParms (K -1/2/0); 'jbig2' stores an
        embedded-organization stream (jbig2.encode_jbig2) under
        /JBIG2Decode."""
        if kind == "jpeg":
            extra = b" /Filter /DCTDecode /ColorSpace /DeviceRGB /BitsPerComponent 8"
            body = payload
        elif kind == "jpx":
            extra = b" /Filter /JPXDecode /ColorSpace /DeviceRGB /BitsPerComponent 8"
            body = payload
        elif kind == "jbig2":
            # an embedded-organization stream from jbig2.encode_jbig2 /
            # encode_jbig2_text; a (data, globals) tuple splits the
            # symbol dictionary into a /JBIG2Globals stream (the
            # real-scanner layout)
            extra = (
                b" /Filter /JBIG2Decode"
                b" /ColorSpace /DeviceGray /BitsPerComponent 1"
            )
            if isinstance(payload, tuple):
                body, glob = payload
                gid = self.add(
                    b"<< /Length " + str(len(glob)).encode()
                    + b" >>\nstream\n" + glob + b"\nendstream"
                )
                extra += (
                    b" /DecodeParms << /JBIG2Globals "
                    + str(gid).encode() + b" 0 R >>"
                )
            else:
                body = payload
        elif kind.startswith("ccitt"):
            k = {"ccitt-g4": -1, "ccitt-g3": 2, "ccitt-mh": 0}[kind]
            align = b" /EncodedByteAlign true" if kind == "ccitt-mh" else b""
            extra = (
                b" /Filter /CCITTFaxDecode /DecodeParms << /K "
                + str(k).encode() + b" /Columns " + str(w).encode()
                + b" /Rows " + str(h).encode() + align + b" >>"
                + b" /ColorSpace /DeviceGray /BitsPerComponent 1"
            )
            body = payload
        elif kind == "indexed":
            hival = len(palette) // 3 - 1
            extra = (
                b" /ColorSpace [/Indexed /DeviceRGB " + str(hival).encode()
                + b" <" + palette.hex().encode() + b">]"
                + b" /BitsPerComponent " + str(bpc).encode()
            )
            body = payload
        else:
            cs = b"/DeviceRGB" if kind == "rgb" else b"/DeviceGray"
            extra = b" /ColorSpace " + cs + b" /BitsPerComponent 8"
            body = payload
        return self.add(
            b"<< /Type /XObject /Subtype /Image /Width " + str(w).encode()
            + b" /Height " + str(h).encode() + extra
            + b" /Length " + str(len(body)).encode()
            + b" >>\nstream\n" + body + b"\nendstream"
        )

    def finish(
        self, content_ids: list[int], font: int,
        image_ids: list[int] | None = None,
    ) -> bytes:
        """Page dicts + /Pages + /Catalog around the content streams,
        then serialize (the pages_id forward-reference arithmetic lives
        exactly once, here)."""
        pages_id = len(self.objs) + len(content_ids) + 1
        xobj = b""
        if image_ids:
            refs = b" ".join(
                b"/Im" + str(i).encode() + b" " + str(oid).encode() + b" 0 R"
                for i, oid in enumerate(image_ids)
            )
            xobj = b" /XObject << " + refs + b" >>"
        page_ids = []
        for cid in content_ids:
            page_ids.append(
                self.add_dict(
                    b"<< /Type /Page /Parent " + str(pages_id).encode()
                    + b" 0 R /MediaBox [0 0 612 792] /Contents "
                    + str(cid).encode() + b" 0 R /Resources << /Font << /F1 "
                    + str(font).encode() + b" 0 R >>" + xobj + b" >> >>"
                )
            )
        kids = b" ".join(str(pn).encode() + b" 0 R" for pn in page_ids)
        real_pages = self.add_dict(
            b"<< /Type /Pages /Kids [" + kids + b"] /Count "
            + str(len(page_ids)).encode() + b" >>"
        )
        assert real_pages == pages_id
        catalog = self.add_dict(
            b"<< /Type /Catalog /Pages " + str(pages_id).encode() + b" 0 R >>"
        )
        return _assemble_pdf(
            self.objs,
            catalog,
            self.members if self.objstm else None,
            encrypt_r=self.encrypt_r,
            user_password=self.user_password,
            owner_password=self.owner_password,
        )


def encode_pdf(
    pages: list[list[str]],
    compress: bool = False,
    objstm: bool = False,
    encrypt_r: int | None = None,
    user_password: bytes = b"",
    owner_password: bytes = b"",
    images: list[tuple] | None = None,
) -> bytes:
    """Minimal valid PDF: one content stream per page, each inner list
    is that page's lines — the independent side of pdf_text's contract,
    like every encode_* in codecs.py. ``objstm=True`` packs every
    non-stream object (font, pages, page dicts, catalog) into a
    FlateDecoded /ObjStm, the PDF 1.5+ layout that hides the page tree
    from a raw-bytes scan. ``encrypt_r`` (2/3) RC4-encrypts the streams
    with empty passwords — the owner-locked layout; ``user_password``/
    ``owner_password`` produce the credentialed layouts (every cipher
    generation).

    ``images``: list of (payload, width, height, kind) placed as Image
    XObjects on the first page's resources and drawn with `Do` — kind
    'jpeg' stores the bytes under /DCTDecode, 'rgb'/'gray' store raw
    8-bit samples; the independent fixture side of ``pdf_images``."""
    b = _PdfBuilder(objstm, encrypt_r, user_password, owner_password)
    font = b.add_dict(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    image_ids = [
        b.add_image(spec[0], spec[1], spec[2], spec[3], *spec[4:])
        for spec in images or []
    ]
    content_ids = []
    for pi, lines in enumerate(pages):
        ops = ["BT /F1 12 Tf 72 720 Td"]
        for i, line in enumerate(lines):
            if i:
                ops.append("T*")
            ops.append(f"({_esc_pdf(line)}) Tj")
        ops.append("ET")
        if pi == 0:
            for i in range(len(image_ids)):
                ops.append(f"q 100 0 0 100 72 {600 - 110 * i} cm /Im{i} Do Q")
        content_ids.append(b.add_stream(" ".join(ops).encode("latin-1"), compress))
    return b.finish(content_ids, font, image_ids)


def encode_pdf_cid(
    pages: list[list[str]],
    with_tounicode: bool = True,
    objstm: bool = False,
    code_base: int = 0x0013,
    encrypt_r: int | None = None,
) -> bytes:
    """CID/Type0 fixture: text is shown as hex strings of 2-byte glyph
    codes under an Identity-H Type0 font whose /ToUnicode CMap maps
    code → char. Codes are assigned sequentially from ``code_base`` per
    distinct character (deliberately ≠ the Unicode values, so Latin-1
    or identity decoding of the codes yields garbage — the extraction
    is only correct THROUGH the CMap). ``with_tounicode=False`` omits
    the CMap: the honest-refusal fixture. The CMap uses bfchar entries;
    bfrange forms are unit-tested against _parse_tounicode directly."""
    charset: list[str] = []
    index: dict[str, int] = {}
    for lines in pages:
        for line in lines:
            for ch in line:
                if ch not in index:
                    index[ch] = code_base + len(charset)
                    charset.append(ch)

    b = _PdfBuilder(objstm, encrypt_r)
    tounicode = None
    if with_tounicode:
        entries = "\n".join(
            f"<{index[ch]:04x}> <{''.join(f'{u:04x}' for u in _utf16_units(ch))}>"
            for ch in charset
        )
        cmap = (
            "/CIDInit /ProcSet findresource begin\n"
            "begincmap\n"
            "1 begincodespacerange\n<0000> <ffff>\nendcodespacerange\n"
            f"{len(charset)} beginbfchar\n{entries}\nendbfchar\n"
            "endcmap\nend\n"
        ).encode("ascii")
        tounicode = b.add_stream(cmap, compress=True)
    font = b.add_dict(
        b"<< /Type /Font /Subtype /Type0 /BaseFont /Fixture-Identity-H"
        b" /Encoding /Identity-H"
        + (b" /ToUnicode " + str(tounicode).encode() + b" 0 R" if tounicode else b"")
        + b" >>"
    )
    content_ids = []
    for lines in pages:
        ops = ["BT /F1 12 Tf 72 720 Td"]
        for i, line in enumerate(lines):
            if i:
                ops.append("T*")
            hx = "".join(f"{index[ch]:04x}" for ch in line)
            ops.append(f"<{hx}> Tj")
        ops.append("ET")
        content_ids.append(b.add_stream(" ".join(ops).encode("ascii")))
    return b.finish(content_ids, font)


def _utf16_units(ch: str) -> list[int]:
    raw = ch.encode("utf-16-be")
    return [int.from_bytes(raw[i : i + 2], "big") for i in range(0, len(raw), 2)]


# --- Spark operator --------------------------------------------------------

PDF_TEXT_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("n_pages", T.IntegerType()),
        T.StructField("decode_error", T.StringType()),
    ]
)


def extract_pdf_text(
    media: DataFrame, errors: str = "quarantine", password: bytes | str = b""
) -> DataFrame:
    """(media_id, content, meta) → (media_id, text, n_pages,
    decode_error) under the standard media quarantine contract:
    CID-font / encrypted / hostile PDFs become error rows, not dead
    stages (``errors="raise"`` restores fail-stop). ``password`` is
    offered to every encrypted document (user then owner, see
    pdf_text) — corpora from one source often share one credential;
    non-matching documents quarantine as before."""
    import pandas as pd

    from pg2kinesis_spark.functions.multimodal import _check_errors, _guard

    _check_errors(errors)

    def one(c: bytes):
        return pdf_text(c, password=password), pdf_page_count(c, password=password)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, c in zip(pdf["media_id"], pdf["content"]):
                r, err = _guard(errors, one, bytes(c))
                text, np_ = r if r else (None, None)
                rows.append((mid, text, np_, err))
            yield pd.DataFrame(
                rows, columns=["media_id", "text", "n_pages", "decode_error"]
            )

    return media.mapInPandas(kernel, PDF_TEXT_SCHEMA)
