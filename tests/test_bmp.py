"""BMP / ICO: the favicon-and-screenshot formats every crawl collects.
Oracles are hand-packed spec-form fixtures (byte-level header/RLE
layouts written from the public DIB documentation, independent of the
encoder) plus LOSSLESS round trips through ``encode_bmp``/``encode_ico``
— BMP is uncompressed or RLE over exact indices, so every round trip
must be bit-exact, which pins both directions at once."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from pg2kinesis_spark.functions import codecs as C


def _rgb(h=13, w=22, seed=5):
    return np.random.default_rng(seed).integers(0, 256, (h, w, 3), dtype=np.uint8)


# --- hand-packed spec-form oracles ---------------------------------------


def test_core_header_palette_bottom_up():
    """BITMAPCOREHEADER (12 bytes, u16 dims, RGB-TRIPLE palette):
    bottom-up row order means file row 0 is the image's LAST row."""
    pal = b"\xff\x00\x00" + b"\x00\xff\x00" + b"\x00\x00\x00" * 254
    rows = bytes([0, 1, 0, 0]) + bytes([1, 0, 0, 0])  # stride pads to 4
    core = struct.pack("<IHHHH", 12, 2, 2, 1, 8)
    off = 14 + 12 + len(pal)
    fh = struct.pack("<2sIHHI", b"BM", off + len(rows), 0, 0, off)
    img = C.decode_bmp(fh + core + pal + rows)
    # palette entry 0 is BGR(255,0,0) = blue; entry 1 green
    assert img.tolist() == [
        [[0, 255, 0], [0, 0, 255]],  # top row = file row 1
        [[0, 0, 255], [0, 255, 0]],
    ]


def test_rle4_escapes_hand_packed():
    """RLE4: run (alternating nibbles), absolute mode (word-aligned),
    EOL, EOB — decoded raster computed by hand from the spec."""
    rle = (
        bytes([3, 0x12])          # run 3 -> 1,2,1
        + bytes([0, 3, 0x30, 0x00])  # absolute 3 px -> 3,0,0 (clipped at w=4)
        + bytes([0, 0])           # EOL
        + bytes([2, 0x45])        # run 2 -> 4,5
        + bytes([0, 1])           # EOB
    )
    hdr = struct.pack("<IiiHHIIiiII", 40, 4, 2, 1, 4, 2, len(rle), 0, 0, 16, 0)
    pal = b"".join(bytes([i, i, i, 0]) for i in range(16))
    off = 14 + 40 + len(pal)
    fh = struct.pack("<2sIHHI", b"BM", off + len(rle), 0, 0, off)
    img = C.decode_bmp(fh + hdr + pal + rle)
    assert img[:, :, 0].tolist() == [[4, 5, 0, 0], [1, 2, 1, 3]]


def test_rle8_delta_skips_stay_background():
    """The 0,2 delta escape jumps right/up; skipped pixels keep index
    0 (the spec's undefined-as-background rule)."""
    rle = bytes([2, 7]) + bytes([0, 2, 1, 1]) + bytes([1, 9]) + bytes([0, 1])
    hdr = struct.pack("<IiiHHIIiiII", 40, 4, 2, 1, 8, 1, len(rle), 0, 0, 16, 0)
    pal = b"".join(bytes([i, i, i, 0]) for i in range(16))
    off = 14 + 40 + len(pal)
    fh = struct.pack("<2sIHHI", b"BM", off + len(rle), 0, 0, off)
    img = C.decode_bmp(fh + hdr + pal + rle)
    # bottom row: 7,7 then delta +1 col +1 row; top row gets 9 at x=3
    assert img[:, :, 0].tolist() == [[0, 0, 0, 9], [7, 7, 0, 0]]


def test_bitfields_555_default_and_custom_masks():
    """16-bpp BI_RGB uses the 555 layout; BI_BITFIELDS reads the three
    masks — a hand-packed single pixel checks both paths."""
    # one pixel, value 0b0_11111_00000_00000 = red max in 555
    px = struct.pack("<H", 0x7C00) + b"\x00\x00"
    hdr = struct.pack("<IiiHHIIiiII", 40, 1, 1, 1, 16, 0, len(px), 0, 0, 0, 0)
    off = 14 + 40
    fh = struct.pack("<2sIHHI", b"BM", off + len(px), 0, 0, off)
    img = C.decode_bmp(fh + hdr + px)
    assert img[0, 0].tolist() == [255, 0, 0]
    # same value under 565 masks reads as red 15/31 + green high bits
    masks = struct.pack("<III", 0xF800, 0x07E0, 0x001F)
    hdr3 = struct.pack("<IiiHHIIiiII", 40, 1, 1, 1, 16, 3, len(px), 0, 0, 0, 0)
    off = 14 + 40 + 12
    fh = struct.pack("<2sIHHI", b"BM", off + len(px), 0, 0, off)
    img = C.decode_bmp(fh + hdr3 + masks + px)
    # 0x7C00 >> 11 = 0b01111 red -> replicated 0111_1011
    assert img[0, 0, 0] == 0x7B


def test_non_contiguous_mask_refuses():
    px = b"\x00\x00\x00\x00"
    masks = struct.pack("<III", 0b101, 0, 0)
    hdr = struct.pack("<IiiHHIIiiII", 40, 1, 1, 1, 16, 3, 4, 0, 0, 0, 0)
    off = 14 + 40 + 12
    fh = struct.pack("<2sIHHI", b"BM", off + 4, 0, 0, off)
    with pytest.raises(ValueError, match="non-contiguous"):
        C.decode_bmp(fh + hdr + masks + px)


# --- lossless round trips --------------------------------------------------


@pytest.mark.parametrize("top_down", [False, True])
def test_bmp24_roundtrip_exact(top_down):
    img = _rgb()
    assert np.array_equal(C.decode_bmp(C.encode_bmp(img, top_down=top_down)), img)


def test_bmp32_alpha_and_bgrx():
    rng = np.random.default_rng(6)
    rgb = _rgb()
    rgba = np.dstack([rgb, rng.integers(0, 256, rgb.shape[:2], dtype=np.uint8)])
    # V3 header with alpha mask round-trips all four channels
    assert np.array_equal(C.decode_bmp(C.encode_bmp(rgba, bpp=32)), rgba)
    # BGRX (no alpha in the input) decodes back to plain RGB
    assert np.array_equal(C.decode_bmp(C.encode_bmp(rgb, bpp=32)), rgb)


def test_palette_depths_and_rle8_roundtrip():
    img = _rgb() // 64 * 64  # <= 64 colors
    assert np.array_equal(C.decode_bmp(C.encode_bmp(img, bpp=8)), img)
    assert np.array_equal(C.decode_bmp(C.encode_bmp(img, bpp=8, rle=True)), img)
    img4 = _rgb() // 128 * 128  # <= 8 colors
    assert np.array_equal(C.decode_bmp(C.encode_bmp(img4, bpp=4)), img4)
    bw = np.repeat(np.where(_rgb()[:, :, :1] > 127, 255, 0).astype(np.uint8), 3, 2)
    assert np.array_equal(C.decode_bmp(C.encode_bmp(bw, bpp=1)), bw)
    with pytest.raises(ValueError, match="colors"):
        C.encode_bmp(_rgb(), bpp=8)  # random RGB won't fit 256 colors


def test_bmp16_565_top_bit_replication():
    img = _rgb()
    dec = C.decode_bmp(C.encode_bmp(img, bpp=16))
    r5 = img[:, :, 0] >> 3
    assert np.array_equal(dec[:, :, 0], ((r5.astype(int) << 3) | (r5 >> 2)).astype(np.uint8))
    g6 = img[:, :, 1] >> 2
    assert np.array_equal(dec[:, :, 1], ((g6.astype(int) << 2) | (g6 >> 4)).astype(np.uint8))


# --- ICO -------------------------------------------------------------------


def test_ico_picks_largest_and_reads_and_mask():
    img = _rgb()
    small = img[:6, :6]
    ico = C.encode_ico([small, img])
    ents = C.ico_entries(ico)
    assert [e["width"] for e in ents] == [6, 22]
    dec = C.decode_ico(ico)
    assert dec.shape == (13, 22, 4)  # DIB entry + all-opaque AND mask
    assert np.array_equal(dec[:, :, :3], img) and (dec[:, :, 3] == 255).all()
    assert np.array_equal(C.decode_ico(ico, index=0)[:, :, :3], small)


def test_ico_png_entry_and_transparent_mask():
    img = _rgb(8, 8)
    assert np.array_equal(C.decode_ico(C.encode_ico([img], png=True)), img)
    # hand-set an AND-mask bit -> that pixel reads transparent
    ico = bytearray(C.encode_ico([img]))
    ents = C.ico_entries(bytes(ico))
    # mask sits at the end of the (single) entry: last mask_stride*h bytes
    mask_stride = ((8 + 31) // 32) * 4
    mask_start = ents[0]["offset"] + ents[0]["size"] - mask_stride * 8
    ico[mask_start] = 0x80  # bottom-left pixel transparent
    dec = C.decode_ico(bytes(ico))
    assert dec[7, 0, 3] == 0 and dec[0, 0, 3] == 255


def test_ico_256_encoding_and_bounds():
    big = np.zeros((256, 256, 3), dtype=np.uint8)
    ents = C.ico_entries(C.encode_ico([big], png=True))
    assert ents[0]["width"] == 256  # the 0-means-256 byte rule
    with pytest.raises(ValueError, match="cap at 256"):
        C.encode_ico([np.zeros((300, 300, 3), dtype=np.uint8)])
    with pytest.raises(ValueError, match="bad magic"):
        C.decode_ico(struct.pack("<HHH", 0, 1, 0))  # count 0: gate refuses
    with pytest.raises(ValueError, match="overruns"):
        bad = bytearray(C.encode_ico([_rgb(8, 8)]))
        struct.pack_into("<I", bad, 6 + 8, 10**6)  # entry size beyond EOF
        C.decode_ico(bytes(bad))


# --- hostile inputs / integration -----------------------------------------


def test_bounds_fire_before_allocation():
    bad = bytearray(C.encode_bmp(np.zeros((4, 4, 3), np.uint8)))
    struct.pack_into("<ii", bad, 18, 2**17, 2**17)
    with pytest.raises(ValueError, match="out of bounds"):
        C.decode_bmp(bytes(bad))
    trunc = bytes(C.encode_bmp(_rgb()))[:-9]
    with pytest.raises(ValueError, match="truncated"):
        C.decode_bmp(trunc)
    with pytest.raises(ValueError, match="outside the raster"):
        # EOLs walk y past height, then a run
        rle = bytes([0, 0]) * 5 + bytes([3, 0x11])
        hdr = struct.pack("<IiiHHIIiiII", 40, 4, 2, 1, 4, 2, len(rle), 0, 0, 16, 0)
        pal = b"".join(bytes([i, i, i, 0]) for i in range(16))
        off = 14 + 40 + len(pal)
        fh = struct.pack("<2sIHHI", b"BM", off + len(rle), 0, 0, off)
        C.decode_bmp(fh + hdr + pal + rle)
    with pytest.raises(ValueError, match="palette index"):
        # 8-bpp raster referencing index 5 with a 2-color palette
        rows = bytes([5, 0, 0, 0])
        hdr = struct.pack("<IiiHHIIiiII", 40, 1, 1, 1, 8, 0, 4, 0, 0, 2, 0)
        off = 14 + 40 + 8
        fh = struct.pack("<2sIHHI", b"BM", off + 4, 0, 0, off)
        C.decode_bmp(fh + hdr + b"\x00" * 8 + rows)


def test_decode_image_dispatch_and_dhash_identity():
    """A BMP and the PNG of the same pixels are one dedup identity."""
    from pg2kinesis_spark.functions.multimodal import _dhash_image

    img = _rgb()
    via_bmp = C.decode_image(C.encode_bmp(img))
    via_png = C.decode_image(C.encode_png(img))
    assert np.array_equal(via_bmp, via_png)
    assert _dhash_image(via_bmp, C.resize_nearest) == _dhash_image(
        via_png, C.resize_nearest
    )
    assert C.decode_image(C.encode_ico([img])).shape == (13, 22, 4)


def test_sniff_mime_bmp_ico(spark):
    from pg2kinesis_spark.functions.multimodal import sniff_mime

    rows = [
        (bytearray(C.encode_bmp(_rgb())),),
        (bytearray(C.encode_ico([_rgb(8, 8)])),),
        (bytearray(C.encode_png(_rgb())),),
    ]
    df = spark.createDataFrame(rows, "content binary")
    got = [r[0] for r in df.select(sniff_mime("content")).collect()]
    assert got == ["image/bmp", "image/x-icon", "image/png"]


# --- WebP container truth ---------------------------------------------------


def test_webp_info_lossless_and_lossy():
    w = C.encode_webp_skeleton(640, 480, lossless=True, alpha=True)
    i = C.webp_info(w)
    assert i == {
        "format": "lossless", "width": 640, "height": 480,
        "has_alpha": True, "animated": False, "n_frames": 1,
    }
    w = C.encode_webp_skeleton(31, 17, lossless=False)
    i = C.webp_info(w)
    assert (i["format"], i["width"], i["height"], i["has_alpha"]) == (
        "lossy", 31, 17, False,
    )
    # ALPH chunk presence (not a flag byte) drives has_alpha on lossy
    w = C.encode_webp_skeleton(31, 17, lossless=False, alpha=True)
    assert C.webp_info(w)["has_alpha"] is True


def test_webp_animation_and_refusals():
    w = C.encode_webp_skeleton(8, 8, n_anim_frames=3)
    i = C.webp_info(w)
    assert i["animated"] is True and i["n_frames"] == 3
    # lossy still refuses (bool-coder tables not transcribed) ...
    with pytest.raises(NotImplementedError, match="VP8"):
        C.decode_webp(C.encode_webp_skeleton(8, 8, lossless=False))
    # ... while the lossless skeleton now reaches the REAL VP8L
    # decoder (round 10) and fails honestly on its empty image data
    with pytest.raises(ValueError, match="truncated VP8L"):
        C.decode_webp(C.encode_webp_skeleton(8, 8))
    with pytest.raises((NotImplementedError, ValueError)):
        C.decode_image(C.encode_webp_skeleton(8, 8))
    with pytest.raises(ValueError, match="keyframe start code"):
        bad = bytearray(C.encode_webp_skeleton(8, 8, lossless=False))
        bad[23] ^= 0xFF  # stomp the 9D 01 2A start code
        C.webp_info(bytes(bad))
    with pytest.raises(ValueError, match="overruns"):
        C.webp_info(C.encode_webp_skeleton(8, 8)[:-3])
    with pytest.raises(ValueError, match="image chunk"):
        # metadata-only container: an EXIF chunk but no VP8/VP8L/ANMF
        C.webp_info(b"RIFF\x0c\x00\x00\x00WEBP" + b"EXIF\x00\x00\x00\x00")


def test_webp_vp8x_canvas_wins_and_sniff(spark):
    import struct as st

    from pg2kinesis_spark.functions.multimodal import sniff_mime

    # hand-packed: VP8X canvas 100x50 followed by a 8x8 VP8L stream
    vp8x = b"\x00\x00\x00\x00" + (99).to_bytes(3, "little") + (49).to_bytes(3, "little")
    bits = 7 | (7 << 14)
    vp8l = bytes([0x2F]) + bits.to_bytes(4, "little")
    body = (
        b"WEBP"
        + b"VP8X" + st.pack("<I", len(vp8x)) + vp8x
        + b"VP8L" + st.pack("<I", len(vp8l)) + vp8l + b"\x00"
    )
    data = b"RIFF" + st.pack("<I", len(body)) + body
    i = C.webp_info(data)
    assert (i["width"], i["height"], i["format"]) == (100, 50, "lossless")

    df = spark.createDataFrame([(bytearray(data),)], "content binary")
    assert df.select(sniff_mime("content")).first()[0] == "image/webp"


def test_webp_pil_seam_upgrades_refusal():
    """With PIL present, decode_image turns the WebP refusal into a
    real decode (the refusal->decode direction the seam contract
    allows). Skipped where PIL is absent — the refusal path above is
    the always-run tier."""
    PIL = pytest.importorskip("PIL.Image")
    import io

    img = _rgb(10, 10)
    buf = io.BytesIO()
    PIL.fromarray(img).save(buf, format="WEBP", lossless=True)
    dec = C.decode_image(buf.getvalue())
    assert np.array_equal(dec[:, :, :3], img)
    # and the pure header walk agrees with PIL's own encoder output
    i = C.webp_info(buf.getvalue())
    assert (i["width"], i["height"]) == (10, 10)


def test_webp_pil_seam_covers_lossy_vp8():
    """VERDICT r11 item 4: the real-world LOSSY WebP path. VP8 intra
    stays a named refusal in the pure kernel (the RFC 6386 coefficient
    probability tables are not transcribed), and where PIL exists the
    seam upgrades the refusal into a real decode that flows into the
    dHash/resize tier — the PyAV-audio-seam contract, image edition.
    Skipped where PIL is absent (this container); runs in any PIL
    environment."""
    PIL = pytest.importorskip("PIL.Image")
    import io

    from pg2kinesis_spark.functions import multimodal as M

    # a smooth gradient survives lossy coding within tight tolerance
    y, x = np.mgrid[0:64, 0:64]
    img = np.stack(
        [(x * 4).astype(np.uint8), (y * 4).astype(np.uint8),
         ((x + y) * 2).astype(np.uint8)], axis=-1
    )
    buf = io.BytesIO()
    PIL.fromarray(img).save(buf, format="WEBP", lossless=False, quality=92)
    blob = buf.getvalue()
    assert C.webp_info(blob)["format"] == "lossy"
    # the pure kernel refuses by name...
    with pytest.raises(NotImplementedError, match="boolean-coder"):
        C.decode_webp(blob)
    # ...and the seam decodes close to the source
    dec = C.decode_image(blob)
    assert dec.shape[:2] == (64, 64)
    assert np.abs(dec[:, :, :3].astype(int) - img.astype(int)).mean() < 6.0
    # downstream plumbing: dHash + resize over the seam-decoded pixels
    # matches the dHash of the ORIGINAL pixels (lossy-stable gradient)
    h_dec = M._dhash_image(dec, C.resize_nearest)
    h_src = M._dhash_image(img, C.resize_nearest)
    assert bin(h_dec ^ h_src).count("1") <= 2
    small = C.resize_nearest(dec, 16, 16)
    assert small.shape[:2] == (16, 16)


def test_cur_cursor_files_decode_like_ico():
    """CUR (.cur) is ICO with type 2 and hotspot fields in the entry —
    the payloads are identical DIBs, so the same reader covers it."""
    img = _rgb(8, 8)
    cur = bytearray(C.encode_ico([img]))
    cur[2] = 2                                   # ICONDIR type: cursor
    struct.pack_into("<HH", cur, 6 + 4, 3, 5)    # hotspot (3, 5)
    assert C.is_ico(bytes(cur))
    dec = C.decode_ico(bytes(cur))
    assert np.array_equal(dec[:, :, :3], img)
    assert np.array_equal(C.decode_image(bytes(cur))[:, :, :3], img)


def test_rle_delta_past_width_fails_cleanly():
    """A hostile delta escape that moves x past the row end followed
    by a run / absolute mode must raise the module's format error,
    not an opaque numpy broadcast ValueError (ADVICE r9)."""
    pal = b"".join(bytes([i, i, i, 0]) for i in range(16))
    off = 14 + 40 + len(pal)
    for tail in (
        bytes([2, 7]),             # encoded run after the delta
        bytes([0, 3, 1, 2, 3, 0]),  # absolute run after the delta
    ):
        rle = bytes([0, 2, 200, 0]) + tail + bytes([0, 1])  # dx=200!
        hdr = struct.pack(
            "<IiiHHIIiiII", 40, 4, 2, 1, 8, 1, len(rle), 0, 0, 16, 0
        )
        fh = struct.pack("<2sIHHI", b"BM", off + len(rle), 0, 0, off)
        with pytest.raises(ValueError, match="outside the raster"):
            C.decode_bmp(fh + hdr + pal + rle)
