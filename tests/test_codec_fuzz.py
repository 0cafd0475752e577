"""Adversarial corruption fuzz over every decode kernel.

The quarantine channel's contract is "any dirty bytes are survivable":
`_guard` catches Exception, so the only job-killers left are hangs and
interpreter-level faults. This fuzz hammers each decoder with seeded
corruptions of VALID streams — single byte flips, truncations, splices,
length-field tampering — and asserts every call returns or raises a
normal Exception quickly. It exists to FIND pathological paths (huffman
loops on corrupt DHTs, LZW table runaway, zero-length chunk spins), not
to pin outputs.
"""

from __future__ import annotations

import time

import numpy as np
import pytest

from pg2kinesis_spark.functions import codecs as C


def _corruptions(data: bytes, rng: np.random.RandomState, n: int):
    """Deterministic corruption stream: flips, truncations, splices."""
    data = bytearray(data)
    for i in range(n):
        kind = rng.randint(4)
        buf = bytearray(data)
        if kind == 0:  # flip 1-4 bytes anywhere
            for _ in range(rng.randint(1, 5)):
                pos = rng.randint(len(buf))
                buf[pos] ^= 1 << rng.randint(8)
        elif kind == 1:  # truncate at a random offset
            buf = buf[: rng.randint(1, len(buf))]
        elif kind == 2:  # splice a random window over another offset
            a, b = sorted(rng.randint(0, len(buf), size=2))
            w = buf[a : min(b, a + 64)]
            pos = rng.randint(len(buf))
            buf[pos : pos + len(w)] = w
        else:  # stomp a run with random bytes (hits length fields)
            pos = rng.randint(len(buf))
            run = rng.randint(1, 16)
            buf[pos : pos + run] = bytes(rng.randint(0, 256, size=run, dtype=np.uint8))
        yield bytes(buf)


def _hammer(decode, corpus, seed, n_per_item=120, budget_s=0.5):
    """Every corruption must return or raise within the time budget."""
    rng = np.random.RandomState(seed)
    slowest = 0.0
    for data in corpus:
        for mutated in _corruptions(data, rng, n_per_item):
            t0 = time.perf_counter()
            try:
                decode(mutated)
            except Exception:
                pass  # any normal exception is fine — _guard routes it
            dt = time.perf_counter() - t0
            slowest = max(slowest, dt)
            assert dt < budget_s, (
                f"decoder took {dt:.2f}s on a corrupt input — pathological path"
            )
    return slowest


def _img(h, w, c, seed):
    return np.random.RandomState(seed).randint(0, 256, size=(h, w, c), dtype=np.uint8)


def test_fuzz_png():
    import struct
    import zlib

    corpus = [
        C.encode_png(_img(24, 17, 3, 1)),
        C.encode_png(_img(9, 9, 1, 2), interlace=True),
    ]
    # 16-bit and 1-bit variants built by hand (the encoder is 8-bit)
    rng = np.random.RandomState(3)
    v16 = rng.randint(0, 65536, size=(6, 5, 1), dtype=np.uint16)
    b16 = np.stack([(v16 >> 8), (v16 & 0xFF)], axis=-1).astype(np.uint8).reshape(6, 10)
    raw = b"".join(b"\x00" + b16[y].tobytes() for y in range(6))
    corpus.append(
        C.PNG_SIG
        + C._png_chunk(b"IHDR", struct.pack(">IIBBBBB", 5, 6, 16, 0, 0, 0, 0))
        + C._png_chunk(b"IDAT", zlib.compress(raw))
        + C._png_chunk(b"IEND", b"")
    )
    bits = np.packbits(rng.randint(0, 2, size=(8, 16), dtype=np.uint8), axis=1)
    raw = b"".join(b"\x00" + bits[y].tobytes() for y in range(8))
    corpus.append(
        C.PNG_SIG
        + C._png_chunk(b"IHDR", struct.pack(">IIBBBBB", 16, 8, 1, 0, 0, 0, 0))
        + C._png_chunk(b"tRNS", struct.pack(">H", 1))
        + C._png_chunk(b"IDAT", zlib.compress(raw))
        + C._png_chunk(b"IEND", b"")
    )
    _hammer(C.decode_png, corpus, seed=10)


def test_fuzz_jpeg_sequential_and_progressive():
    corpus = [
        C.encode_jpeg(_img(24, 24, 3, 3), quality=85, subsample=True),
        C.encode_jpeg(_img(17, 13, 1, 4), quality=70),
        C.encode_jpeg_progressive(_img(24, 16, 3, 5), quality=85),
        C.encode_jpeg(_img(32, 32, 3, 6), quality=85, restart_interval=2),
    ]
    _hammer(C.decode_jpeg, corpus, seed=11)


def test_fuzz_gif():
    from pg2kinesis_spark.functions.codecs import encode_gif

    img = _img(16, 16, 3, 7) // 32 * 32  # palette-friendly
    corpus = [encode_gif(img)]
    _hammer(C.decode_gif, corpus, seed=12)


def test_fuzz_wav():
    pcm = (np.random.RandomState(8).randn(4000, 2) * 8000).astype(np.int16)
    corpus = [C.encode_wav(pcm, 16000)]
    _hammer(C.decode_wav, corpus, seed=13)


def test_fuzz_avi_and_dispatch():
    from pg2kinesis_spark.functions.codecs import encode_avi_mjpeg

    frames = [_img(16, 16, 3, 20 + i) for i in range(3)]
    corpus = [encode_avi_mjpeg(frames, fps=5, quality=85)]
    _hammer(C.decode_avi_mjpeg, corpus, seed=14)
    # the mime-dispatching front door must be equally crash-free
    png = C.encode_png(_img(12, 12, 3, 30))
    _hammer(C.decode_image, [png], seed=15, n_per_item=60)


def test_resource_guards_reject_absurd_dimensions():
    """Header fields claiming giant canvases must raise BEFORE any
    allocation — the OOM-killer fires faster than Python's MemoryError
    on a real executor, so quarantine can't catch an allocation bomb."""
    import struct
    import zlib

    # GIF claiming a 65535x65535 screen (12 GB canvas)
    gif = bytearray(C.encode_gif(_img(8, 8, 3, 40) // 32 * 32))
    struct.pack_into("<HH", gif, 6, 65535, 65535)
    with pytest.raises(ValueError, match="out of bounds"):
        C.decode_gif(bytes(gif))
    # PNG IHDR claiming 60000x60000 (10 GB RGB)
    ihdr = struct.pack(">IIBBBBB", 60000, 60000, 8, 2, 0, 0, 0)
    png = (
        C.PNG_SIG
        + C._png_chunk(b"IHDR", ihdr)
        + C._png_chunk(b"IDAT", zlib.compress(b"\x00" * 100))
        + C._png_chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="out of bounds"):
        C.decode_png(png)
    # JPEG SOF claiming 65500x65500
    jpg = bytearray(C.encode_jpeg(_img(8, 8, 1, 41), quality=85))
    sof = jpg.index(b"\xff\xc0")
    struct.pack_into(">HH", jpg, sof + 5, 65500, 65500)
    with pytest.raises(ValueError, match="out of bounds"):
        C.decode_jpeg(bytes(jpg))


def test_png_decompression_bomb_bounded():
    """A tiny IDAT inflating to far more than the claimed image size
    raises instead of materializing the bomb."""
    import struct
    import zlib

    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 0, 0, 0, 0)  # 4x4 gray: 20 raw bytes
    bomb = zlib.compress(b"\x00" * (50 * 1024 * 1024), 9)  # 50 MB of zeros, ~50 KB
    assert len(bomb) < 100 * 1024
    png = (
        C.PNG_SIG
        + C._png_chunk(b"IHDR", ihdr)
        + C._png_chunk(b"IDAT", bomb)
        + C._png_chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="length mismatch"):
        C.decode_png(png)


def test_gif_lzw_min_code_size_bounded():
    """A stomped LZW minimum-code-size byte (e.g. 40) must not size the
    root dictionary: 2^40 roots is a found-by-fuzz memory/CPU bomb."""
    with pytest.raises(ValueError, match="minimum code size"):
        C._lzw_decode(b"\x00\x01\x02", 40)
    with pytest.raises(ValueError, match="minimum code size"):
        C._lzw_decode(b"\x00", 1)


def test_jpeg_component_count_bounded():
    """SOF claiming 255 components would allocate 255 coefficient
    planes (~68 GB at the pixel cap) — found by fuzz."""
    import struct

    jpg = bytearray(C.encode_jpeg(_img(8, 8, 1, 43), quality=85))
    sof = jpg.index(b"\xff\xc0")
    jpg[sof + 9] = 255  # nc byte
    with pytest.raises(ValueError, match="component count"):
        C.decode_jpeg(bytes(jpg))


def test_animation_total_output_bounded():
    """Frames multiply the canvas: a small file declaring a large
    screen plus many tiny image blocks must hit the total-output cap
    instead of materializing gigabytes of canvas copies."""
    import struct

    # GIF: 4096x4096 screen (under the per-image cap), many 1x1 frames
    img = _img(4, 4, 3, 50) // 32 * 32
    data = bytearray(C.encode_gif(img))
    struct.pack_into("<HH", data, 6, 4096, 4096)
    # splice the (1x1-equivalent) image block many times: decode each
    # frame onto the big canvas until the cumulative cap trips
    desc = data.index(b"\x2c")
    frame_block = bytes(data[desc:-1])  # descriptor..before trailer
    bomb = bytes(data[:desc]) + frame_block * 40 + b"\x3b"
    with pytest.raises(ValueError, match="total output pixels"):
        C.decode_gif_frames(bomb)
    # bounded samplers (max_frames) are unaffected
    assert len(C.decode_gif_frames(bomb, max_frames=2)) == 2


def test_warc_gunzip_bomb_bounded():
    import zlib

    from pg2kinesis_spark.functions import warc as W

    co = zlib.compressobj(9, zlib.DEFLATED, 16 + zlib.MAX_WBITS)
    bomb = co.compress(b"\x00" * (64 * 1024 * 1024)) + co.flush()
    assert len(bomb) < 1024 * 1024
    with pytest.raises(ValueError, match="gzip bomb"):
        W.gunzip_members(bomb, max_bytes=4 * 1024 * 1024)
    # legit multi-member round trip unaffected
    recs = [{"warc_type": "response", "payload": b"hello"}]
    buf = W.encode_warc(recs, gzip_members=True)
    assert b"hello" in W.gunzip_members(buf)


def test_gif_lzw_expansion_bounded():
    """LZW output stops at the frame's pixel count: a stream built to
    expand ~4096x per code cannot out-allocate the declared frame."""
    img = _img(8, 8, 3, 42) // 32 * 32
    data = C.encode_gif(img)
    # valid image still decodes identically with the cap in place
    np.testing.assert_array_equal(C.decode_gif(data), C.decode_gif(data))
    got = C._lzw_decode(
        C._lzw_encode(list(range(16)) * 1000, 8), 8, max_out=64
    )
    assert 64 <= len(got) < 64 + 4096  # stops at/near the cap, not 16k


def test_fuzz_container_metadata_walks():
    """MP4 / WebM / Ogg / FLAC / MP3 metadata walks under the same
    corruption hammer: every mutation returns or raises promptly —
    no budget blowups, no hangs on stomped size/length fields."""
    corpus_mp4 = [
        C.encode_mp4_skeleton(),
        C.encode_mp4_skeleton(version1=True, largesize_mdat=True),
    ]
    _hammer(C.mp4_info, corpus_mp4, seed=41)
    corpus_webm = [
        C.encode_webm_skeleton(),
        C.encode_webm_skeleton(unknown_segment_size=True),
    ]
    _hammer(C.webm_info, corpus_webm, seed=42)
    _hammer(C.ogg_info, [C.encode_ogg_pages("opus"),
                         C.encode_ogg_pages("vorbis")], seed=43)
    _hammer(C.flac_info, [C.encode_flac_streaminfo(extra_blocks=2)], seed=44)
    _hammer(C.mp3_info, [C.encode_mp3_frames(8, xing=True)], seed=45)


def test_fuzz_flac_decode():
    """Full FLAC frame decode under the hammer: triple-guarded (CRC-8,
    CRC-16, STREAMINFO MD5), so corruptions must refuse or decode
    bit-identically — and always promptly."""
    pcm = (np.random.RandomState(21).randn(5000, 2) * 6000).astype(np.int64)
    corpus = [
        C.encode_flac(pcm, 44100, block_size=1024),
        C.encode_flac(pcm, 44100, stereo="mid", partition_order=2, block_size=1024),
    ]
    _hammer(C.decode_flac, corpus, seed=46)


def test_fuzz_pdf_and_archives():
    """PDF text extraction and the archive splitter under corruption:
    return-or-raise quickly, never hang."""
    import gzip
    import io
    import tarfile
    import zipfile

    from pg2kinesis_spark.functions import archives as A
    from pg2kinesis_spark.functions import pdf as P

    pdfs = [
        P.encode_pdf([["fuzz page one", "line two"], ["page two"]]),
        P.encode_pdf([["compressed text stream"]], compress=True),
    ]
    _hammer(P.pdf_text, pdfs, seed=46)

    zbuf = io.BytesIO()
    with zipfile.ZipFile(zbuf, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("a.txt", b"zip member text content")
    tbuf = io.BytesIO()
    with tarfile.open(fileobj=tbuf, mode="w") as tf:
        info = tarfile.TarInfo("b.txt")
        payload = b"tar member text content"
        info.size = len(payload)
        tf.addfile(info, io.BytesIO(payload))
    archives = [
        zbuf.getvalue(),
        tbuf.getvalue(),
        gzip.compress(tbuf.getvalue()),
        gzip.compress(b"bare gz member"),
    ]

    def split(data):
        return list(
            A._split_archive(data, "fuzz.bin", 1 << 20, 1 << 22, 1000)
        )

    _hammer(split, archives, seed=47)


def test_fuzz_warc_records_walk():
    """The WARC record walk (incl. the negative-Content-Length guard)
    and multi-member gunzip under corruption."""
    from pg2kinesis_spark.functions import warc as W

    recs = [
        {"warc_type": "response", "url": "http://x.example/",
         "payload": W.http_response_bytes(b"<html><body><p>f</p></body></html>")}
    ] * 3
    corpus = [
        W.encode_warc(recs, gzip_members=False),
        W.encode_warc(recs, gzip_members=True),
    ]

    def walk(data):
        return list(W.iter_warc_records(W.gunzip_members(data, max_bytes=1 << 22)))

    _hammer(walk, corpus, seed=48)


def test_fuzz_bmp_ico():
    rgb = _img(13, 22, 3, 61)
    corpus = [
        C.encode_bmp(rgb),
        C.encode_bmp(rgb, top_down=True),
        C.encode_bmp(rgb // 64 * 64, bpp=8, rle=True),
        C.encode_bmp(rgb // 128 * 128, bpp=4),
        C.encode_bmp(rgb, bpp=16),
        C.encode_bmp(
            np.dstack([rgb, _img(13, 22, 1, 62)[:, :, 0]]), bpp=32
        ),
        C.encode_ico([rgb[:6, :6], rgb]),
        C.encode_ico([rgb], png=True),
    ]
    _hammer(C.decode_bmp, corpus[:-2], seed=63)
    _hammer(C.decode_ico, corpus[-2:], seed=64)
    # and through the dispatch front door (magic-byte confusion)
    _hammer(C.decode_image, corpus, seed=65)


def test_fuzz_y4m_and_webp_walks():
    frames = [_img(12, 16, 3, 71) for _ in range(3)]
    y4m_corpus = [
        C.encode_y4m(frames),
        C.encode_y4m(frames, colorspace="C420jpeg"),
        C.encode_y4m([f[:, :, 0] for f in frames], colorspace="Cmono"),
    ]
    _hammer(C.decode_y4m_frames, y4m_corpus, seed=72)
    _hammer(C.y4m_info, y4m_corpus, seed=73)
    webp_corpus = [
        C.encode_webp_skeleton(640, 480, alpha=True),
        C.encode_webp_skeleton(31, 17, lossless=False),
        C.encode_webp_skeleton(8, 8, n_anim_frames=3),
    ]
    _hammer(C.webp_info, webp_corpus, seed=74)


def test_fuzz_apng():
    frames = [_img(8, 10, 4, 81) for _ in range(3)]
    corpus = [C.encode_apng(frames), C.encode_apng(frames[:1])]
    _hammer(C.decode_apng_frames, corpus, seed=82)
    _hammer(C.apng_info, corpus, seed=83)


def test_fuzz_pnm():
    rgb = _img(9, 13, 3, 91)
    gray = _img(9, 13, 1, 92)
    bw = np.where(gray > 127, 255, 0).astype(np.uint8)
    corpus = [
        C.encode_pnm(rgb),
        C.encode_pnm(rgb, binary=False),
        C.encode_pnm(gray, maxval=65535),
        C.encode_pnm(bw, maxval=1),
    ]
    _hammer(C.decode_pnm, corpus, seed=93)
    _hammer(C.decode_image, corpus, seed=94)


def test_fuzz_tga():
    rgb = _img(9, 13, 3, 95)
    corpus = [
        C.encode_tga(rgb),
        C.encode_tga(rgb // 64 * 64, rle=True),
        C.encode_tga(np.dstack([rgb, _img(9, 13, 1, 96)[:, :, 0]])),
    ]
    _hammer(C.decode_tga, corpus, seed=97)
