"""PDF text extraction — the honest simple-font tier.

After HTML, PDF is the most common document format a corpus pipeline
meets. Full PDF text extraction is a rendering problem (CID/Type0
fonts with CMaps, encoding dictionaries, ActualText, layout
reconstruction); this module implements the well-defined subset that
covers machine-generated simple-font documents, and REFUSES the rest
loudly (the codecs.py honesty rule — wrong text silently entering a
training corpus is worse than a quarantined file):

* content streams stored raw or /FlateDecode (bounded inflate);
* text shown with ``Tj``, ``'``, ``"`` and ``TJ`` (array form with
  kerning numbers — a kern ≤ -180/1000 em inserts a space, the
  convention extractors use for inter-word gaps);
* literal strings with the full escape set (``\\n \\r \\t \\b \\f
  \\( \\) \\\\`` + octal ``\\ddd`` + line continuations) and hex
  strings;
* line structure from ``T*``, ``'``, ``"``, ``Td``/``TD`` with a
  vertical component, and ``Tm`` re-positioning;
* byte→char mapping is Latin-1 (StandardEncoding's printable range) —
  correct for the unembedded base-14-font documents this tier accepts.

A PDF using Type0/Identity-H (CID) fonts raises NotImplementedError —
its string bytes are glyph indices that NEED the font's CMap; decoding
them as Latin-1 would produce confident garbage. Encrypted PDFs raise
too. Both land in the standard quarantine channel in the Spark
operator (`extract_pdf_text`).

Objects are found by scanning (no xref dependence — real-world PDFs
have broken xref tables constantly); stream bodies are delimited by
``stream``/``endstream`` with the declared ``/Length`` used when it
parses. All scans are bounded.
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


def _decode_stream(sdict: bytes, body: bytes) -> bytes | None:
    """Raw or FlateDecode body; None for filters this tier won't fake."""
    if b"/Filter" not in sdict:
        return body
    if b"/FlateDecode" in sdict and b"[" not in sdict.split(b"/Filter", 1)[1][:20]:
        d = zlib.decompressobj()
        out = d.decompress(body, MAX_INFLATE + 1)
        if len(out) > MAX_INFLATE:
            raise ValueError(f"PDF stream inflates past {MAX_INFLATE} bytes")
        return out
    return None  # DCT/LZW/filter chains: not text content for this tier


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


def _extract_text_ops(content: bytes, parts: list) -> None:
    """Walk one content stream's BT..ET blocks, appending text pieces
    and newline markers to ``parts``."""
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
            elif tok[:1] in b"-+.0123456789":
                try:
                    v: float | None = float(tok)
                except ValueError:
                    v = None
                (in_array if in_array is not None else stack).append(v)
            elif tok == b"Tj":
                if stack and isinstance(stack[-1], bytes):
                    parts.append(stack[-1])
                stack.clear()
            elif tok in (b"'", b'"'):
                parts.append(b"\n")
                if stack and isinstance(stack[-1], bytes):
                    parts.append(stack[-1])
                stack.clear()
            elif tok == b"TJ":
                if stack and isinstance(stack[-1], list):
                    for item in stack[-1]:
                        if isinstance(item, bytes):
                            parts.append(item)
                        elif isinstance(item, float) and item <= _KERN_SPACE:
                            parts.append(b" ")
                stack.clear()
            elif tok == b"T*":
                parts.append(b"\n")
                stack.clear()
            elif tok in (b"Td", b"TD"):
                ty = stack[-1] if stack and isinstance(stack[-1], float) else 0.0
                if ty:  # vertical movement = new line
                    parts.append(b"\n")
                stack.clear()
            elif tok == b"Tm":
                parts.append(b"\n")
                stack.clear()
            elif re.fullmatch(rb"[A-Za-z*]+", tok):
                stack.clear()  # any other operator consumes its operands
        pos = et + 2


def pdf_text(data: bytes) -> str:
    """Extract text from a simple-font PDF. Raises on encrypted or
    CID-font documents (decoding those as Latin-1 would be confident
    garbage) and on bomb-sized streams — route through the quarantine
    channel at corpus scale."""
    data = bytes(data)
    if not is_pdf(data):
        raise ValueError("not a PDF: missing %PDF- header")
    if b"/Encrypt" in data:
        raise NotImplementedError("encrypted PDF")
    if b"/Type0" in data or b"/Identity-H" in data:
        raise NotImplementedError(
            "CID/Type0-font PDF: string bytes are glyph indices that need "
            "the font's CMap — Latin-1 decoding would be garbage"
        )
    parts: list = []
    for sdict, body in _iter_streams(data):
        decoded = _decode_stream(sdict, body)
        if decoded is None or b"BT" not in decoded:
            continue
        _extract_text_ops(decoded, parts)
        parts.append(b"\n")
    text = b"".join(parts).decode("latin-1")
    # collapse runs the line-structure ops produce
    text = re.sub(r"[ \t]*\n[ \t]*", "\n", text)
    return re.sub(r"\n{3,}", "\n\n", text).strip("\n")


def pdf_page_count(data: bytes) -> int:
    return len(re.findall(rb"/Type\s*/Page\b(?!s)", bytes(data)))


# --- fixture writer --------------------------------------------------------

def encode_pdf(pages: list[list[str]], compress: bool = False) -> bytes:
    """Minimal valid PDF (xref included): one content stream per page,
    each inner list is that page's lines — the independent side of
    pdf_text's contract, like every encode_* in codecs.py."""

    def esc(s: str) -> str:
        return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")

    objs: list[bytes] = []

    def add(body: bytes) -> int:
        objs.append(body)
        return len(objs)  # 1-based object number

    font = add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    page_ids = []
    content_ids = []
    for lines in pages:
        ops = ["BT /F1 12 Tf 72 720 Td"]
        for i, line in enumerate(lines):
            if i:
                ops.append("T*")
            ops.append(f"({esc(line)}) Tj")
        ops.append("ET")
        stream = " ".join(ops).encode("latin-1")
        if compress:
            z = zlib.compress(stream)
            body = (
                b"<< /Length " + str(len(z)).encode()
                + b" /Filter /FlateDecode >>\nstream\n" + z + b"\nendstream"
            )
        else:
            body = (
                b"<< /Length " + str(len(stream)).encode()
                + b" >>\nstream\n" + stream + b"\nendstream"
            )
        content_ids.append(add(body))
    pages_id = len(objs) + len(pages) + 1  # filled after page objects
    for cid in content_ids:
        page_ids.append(
            add(
                b"<< /Type /Page /Parent " + str(pages_id).encode()
                + b" 0 R /MediaBox [0 0 612 792] /Contents "
                + str(cid).encode() + b" 0 R /Resources << /Font << /F1 "
                + str(font).encode() + b" 0 R >> >> >>"
            )
        )
    kids = b" ".join(str(p).encode() + b" 0 R" for p in page_ids)
    real_pages = add(
        b"<< /Type /Pages /Kids [" + kids + b"] /Count "
        + str(len(page_ids)).encode() + b" >>"
    )
    assert real_pages == pages_id
    catalog = add(b"<< /Type /Catalog /Pages " + str(pages_id).encode() + b" 0 R >>")

    out = bytearray(b"%PDF-1.4\n")
    offsets = [0]
    for i, body in enumerate(objs, 1):
        offsets.append(len(out))
        out += str(i).encode() + b" 0 obj\n" + body + b"\nendobj\n"
    xref_at = len(out)
    out += b"xref\n0 " + str(len(objs) + 1).encode() + b"\n"
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        b"trailer\n<< /Size " + str(len(objs) + 1).encode()
        + b" /Root " + str(catalog).encode() + b" 0 R >>\nstartxref\n"
        + str(xref_at).encode() + b"\n%%EOF\n"
    )
    return bytes(out)


# --- Spark operator --------------------------------------------------------

PDF_TEXT_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("n_pages", T.IntegerType()),
        T.StructField("decode_error", T.StringType()),
    ]
)


def extract_pdf_text(media: DataFrame, errors: str = "quarantine") -> DataFrame:
    """(media_id, content, meta) → (media_id, text, n_pages,
    decode_error) under the standard media quarantine contract:
    CID-font / encrypted / hostile PDFs become error rows, not dead
    stages (``errors="raise"`` restores fail-stop)."""
    import pandas as pd

    from pg2kinesis_spark.functions.multimodal import _check_errors, _guard

    _check_errors(errors)

    def one(c: bytes):
        return pdf_text(c), pdf_page_count(c)

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
