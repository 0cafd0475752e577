"""Dependency-free media codecs: PNG (pure numpy) and WAV (manual RIFF).

The multimodal stage needs decode kernels that run on every executor.
This container ships no PIL/ffmpeg/soundfile — but PNG and PCM WAV are
simple enough to decode with stdlib ``zlib``/``struct`` + numpy, so for
those two formats the pipeline is REAL end-to-end: bytes in parquet ->
decoded pixels/samples -> features/resize, all inside Arrow batches.
JPEG/MP3/video stay behind honest NotImplementedError guards
(``multimodal.extract_features``), because implementing a DCT/huffman
decoder here would be neither small nor trustworthy.

Scale note: these functions are per-row kernels invoked from
``mapInPandas`` — decode cost is embarrassingly parallel and
constant-memory per Arrow batch; nothing here touches the driver.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIG = b"\x89PNG\r\n\x1a\n"

# color type -> samples per pixel (before palette expansion)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def is_png(data: bytes) -> bool:
    return bytes(data[:8]) == PNG_SIG


def decode_png(data: bytes) -> np.ndarray:
    """Decode an 8-bit PNG to an (H, W, C) uint8 array.

    Supports color types 0/2/3/4/6 (gray, RGB, palette, gray+alpha,
    RGBA), all five scanline filters, single IDAT or split IDATs.
    Palette images expand to RGB. Interlaced (Adam7) and 16-bit images
    are rejected explicitly.
    """
    data = bytes(data)
    if not is_png(data):
        raise ValueError("not a PNG: bad signature")
    pos, ihdr, idat, plte, trns = 8, None, [], None, None
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + body + crc
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"IDAT":
            idat.append(body)
        elif ctype == b"PLTE":
            plte = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"tRNS":
            trns = np.frombuffer(body, dtype=np.uint8)
        elif ctype == b"IEND":
            break
    if ihdr is None or not idat:
        raise ValueError("not a PNG: missing IHDR/IDAT")
    width, height, depth, color, comp, filt, interlace = ihdr
    if depth != 8:
        raise NotImplementedError(f"PNG bit depth {depth} (only 8 supported)")
    if interlace != 0:
        raise NotImplementedError("interlaced (Adam7) PNG not supported")
    if color not in _PNG_CHANNELS:
        raise ValueError(f"bad PNG color type {color}")
    nch = _PNG_CHANNELS[color]
    raw = zlib.decompress(b"".join(idat))
    stride = width * nch
    if len(raw) != height * (stride + 1):
        raise ValueError("PNG data length mismatch")
    img = np.empty((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        row_start = y * (stride + 1)
        ftype = raw[row_start]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=row_start + 1
        ).copy()
        img[y] = _unfilter_row(line, prev, ftype, nch)
        prev = img[y]
    out = img.reshape(height, width, nch)
    if color == 3:
        if plte is None:
            raise ValueError("palette PNG without PLTE")
        idx = out[:, :, 0]
        rgb = plte[idx]
        if trns is not None:
            alpha = np.full(idx.shape, 255, dtype=np.uint8)
            known = idx < len(trns)
            alpha[known] = trns[idx[known]]
            return np.dstack([rgb, alpha])
        return rgb
    return out


def _unfilter_row(line: np.ndarray, prev: np.ndarray, ftype: int, bpp: int) -> np.ndarray:
    """Reverse one scanline filter (PNG spec §9). Sub/Paeth recurrences
    are sequential in x; Up/Average/None vectorize."""
    n = len(line)
    if ftype == 0:  # None
        return line
    if ftype == 2:  # Up
        return (line.astype(np.int16) + prev).astype(np.uint8)
    out = np.zeros(n, dtype=np.int16)
    li = line.astype(np.int16)
    pi = prev.astype(np.int16)
    if ftype == 1:  # Sub
        for x in range(n):
            left = out[x - bpp] if x >= bpp else 0
            out[x] = (li[x] + left) & 0xFF
    elif ftype == 3:  # Average
        for x in range(n):
            left = out[x - bpp] if x >= bpp else 0
            out[x] = (li[x] + ((left + pi[x]) >> 1)) & 0xFF
    elif ftype == 4:  # Paeth
        for x in range(n):
            a = out[x - bpp] if x >= bpp else 0
            b = pi[x]
            c = pi[x - bpp] if x >= bpp else 0
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            out[x] = (li[x] + pred) & 0xFF
    else:
        raise ValueError(f"bad PNG filter type {ftype}")
    return out.astype(np.uint8)


def encode_png(img: np.ndarray) -> bytes:
    """Encode an (H, W) or (H, W, C) uint8 array as PNG (filter 0 rows).

    C in {1: gray, 2: gray+alpha, 3: RGB, 4: RGBA}. Minimal but fully
    spec-conformant output — any PNG reader (including decode_png)
    accepts it.
    """
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, c = img.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    raw = b"".join(b"\x00" + img[y].tobytes() for y in range(h))
    out = [PNG_SIG, _png_chunk(b"IHDR", ihdr)]
    out.append(_png_chunk(b"IDAT", zlib.compress(raw, 6)))
    out.append(_png_chunk(b"IEND", b""))
    return b"".join(out)


def _png_chunk(ctype: bytes, body: bytes) -> bytes:
    crc = zlib.crc32(ctype + body) & 0xFFFFFFFF
    return struct.pack(">I", len(body)) + ctype + body + struct.pack(">I", crc)


def resize_nearest(img: np.ndarray, width: int, height: int) -> np.ndarray:
    """Deterministic nearest-neighbor resize of an (H, W, C) array."""
    h, w = img.shape[:2]
    ys = (np.arange(height) * h // height).clip(0, h - 1)
    xs = (np.arange(width) * w // width).clip(0, w - 1)
    return img[ys][:, xs]


# --- WAV ------------------------------------------------------------------

def is_wav(data: bytes) -> bool:
    return bytes(data[:4]) == b"RIFF" and bytes(data[8:12]) == b"WAVE"


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """Decode a PCM WAV to ((n_samples, n_channels) array, sample_rate).

    Manual RIFF chunk walk (fmt / data), PCM 8/16/24/32-bit integer and
    32-bit float. 8-bit is unsigned per spec and is recentred to signed.
    The stdlib ``wave`` module is deliberately NOT used here so tests
    can employ it as an independent oracle.
    """
    data = bytes(data)
    if not is_wav(data):
        raise ValueError("not a WAV: bad RIFF/WAVE header")
    pos, fmt, payload = 12, None, None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (clen,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + clen]
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            payload = body
    if fmt is None or payload is None:
        raise ValueError("not a WAV: missing fmt/data chunk")
    audio_fmt, nch, rate, _brate, _balign, bits = fmt
    if audio_fmt == 3 and bits == 32:  # IEEE float
        arr = np.frombuffer(payload, dtype="<f4").astype(np.float64)
    elif audio_fmt == 1 and bits == 8:
        arr = np.frombuffer(payload, dtype=np.uint8).astype(np.int16) - 128
    elif audio_fmt == 1 and bits == 16:
        arr = np.frombuffer(payload, dtype="<i2")
    elif audio_fmt == 1 and bits == 24:
        b = np.frombuffer(payload, dtype=np.uint8).reshape(-1, 3)
        arr = (
            b[:, 0].astype(np.int32)
            | (b[:, 1].astype(np.int32) << 8)
            | (b[:, 2].astype(np.int32) << 16)
        )
        arr = np.where(arr >= 1 << 23, arr - (1 << 24), arr)
    elif audio_fmt == 1 and bits == 32:
        arr = np.frombuffer(payload, dtype="<i4")
    else:
        raise NotImplementedError(f"WAV format {audio_fmt}/{bits}-bit not supported")
    n = (len(arr) // nch) * nch
    return arr[:n].reshape(-1, nch), rate


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """Encode an (n_samples, n_channels) int16 array as PCM-16 WAV."""
    samples = np.ascontiguousarray(samples, dtype="<i2")
    if samples.ndim == 1:
        samples = samples[:, None]
    nch = samples.shape[1]
    payload = samples.tobytes()
    fmt = struct.pack("<HHIIHH", 1, nch, sample_rate, sample_rate * nch * 2, nch * 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(payload)) + payload
    return b"RIFF" + struct.pack("<I", len(body)) + body
