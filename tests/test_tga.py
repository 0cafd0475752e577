"""TGA: hand-packed spec-form fixtures (16-bit ARRRRRGG pixels,
colormap entries, descriptor orientation bits, RLE packets) plus
lossless round trips through the encoder twin. TGA has no magic
number, so the structural is_tga gate is also pinned against
false-positives on real magics and plain text."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from pg2kinesis_spark.functions import codecs as C


def _rgb(seed=3, h=9, w=13):
    return np.random.default_rng(seed).integers(0, 256, (h, w, 3), dtype=np.uint8)


def test_roundtrips_all_shapes():
    rgb = _rgb()
    rgba = np.dstack([rgb, _rgb(4)[:, :, 0]])
    gray = rgb[:, :, :1]
    for img, kw in [
        (rgb, {}),
        (rgb, {"top_down": False}),
        (rgba, {}),
        (gray, {}),
        (rgb // 64 * 64, {"rle": True}),   # runs worth compressing
        (gray, {"rle": True}),
        (rgb, {"rle": True}),              # raw-packet-dominated
    ]:
        assert np.array_equal(C.decode_tga(C.encode_tga(img, **kw)), img)


def test_hand_packed_16bit_palette_and_flips():
    # 16-bit ARRRRRGG GGGBBBBB little-endian: 0x7C00 = full red
    hdr = struct.pack("<BBBHHBHHHHBB", 0, 0, 2, 0, 0, 0, 0, 0, 1, 1, 16, 0x20)
    assert C.decode_tga(hdr + struct.pack("<H", 0x7C00))[0, 0].tolist() == [255, 0, 0]
    assert C.decode_tga(hdr + struct.pack("<H", 0x03E0))[0, 0].tolist() == [0, 255, 0]
    # colormapped: BGR entries red/green, indices 0,1
    cmap = bytes([0, 0, 255, 0, 255, 0])
    hdr = struct.pack("<BBBHHBHHHHBB", 0, 1, 1, 0, 2, 24, 0, 0, 2, 1, 8, 0x20)
    assert C.decode_tga(hdr + cmap + bytes([0, 1])).tolist() == [
        [[255, 0, 0], [0, 255, 0]]
    ]
    # orientation bits: bottom-up default, right-to-left flip
    rgb = _rgb()
    t = bytearray(C.encode_tga(rgb))
    t[17] &= ~0x20  # clear top-down: rows now read bottom-up
    assert np.array_equal(C.decode_tga(bytes(t)), rgb[::-1])
    t = bytearray(C.encode_tga(rgb))
    t[17] |= 0x10
    assert np.array_equal(C.decode_tga(bytes(t)), rgb[:, ::-1])
    # RLE run crossing a row boundary decodes linearly
    hdr = struct.pack("<BBBHHBHHHHBB", 0, 0, 11, 0, 0, 0, 0, 0, 3, 2, 8, 0x20)
    rle = bytes([0x80 | 5, 7])  # one 6-pixel run covers both rows
    assert (C.decode_tga(hdr + rle)[:, :, 0] == 7).all()


def test_no_magic_gate_and_refusals():
    assert not C.is_tga(C.encode_png(_rgb()))
    assert not C.is_tga(C.encode_jpeg(_rgb()))
    assert not C.is_tga(b"hello world, plain text bytes")
    with pytest.raises(ValueError, match="truncated"):
        C.decode_tga(C.encode_tga(_rgb())[:-7])
    with pytest.raises(ValueError, match="truncated TGA RLE"):
        C.decode_tga(C.encode_tga(_rgb(), rle=True)[:-3])
    with pytest.raises(ValueError, match="palette index"):
        cmap = bytes([0, 0, 255] * 2)
        hdr = struct.pack("<BBBHHBHHHHBB", 0, 1, 1, 0, 2, 24, 0, 0, 1, 1, 8, 0x20)
        C.decode_tga(hdr + cmap + bytes([5]))
    with pytest.raises(ValueError, match="out of bounds"):
        hdr = struct.pack(
            "<BBBHHBHHHHBB", 0, 0, 2, 0, 0, 0, 0, 0, 65535, 65535, 24, 0x20
        )
        C.decode_tga(hdr)


def test_dispatch_runs_last_and_dhash_identity():
    from pg2kinesis_spark.functions.multimodal import _dhash_image

    rgb = _rgb()
    via_tga = C.decode_image(C.encode_tga(rgb))
    via_png = C.decode_image(C.encode_png(rgb))
    assert np.array_equal(via_tga, via_png)
    assert _dhash_image(via_tga, C.resize_nearest) == _dhash_image(
        via_png, C.resize_nearest
    )


def test_tga_never_shadowed_by_the_cur_magic():
    """A plain truecolor TGA's first four bytes ARE the CUR magic
    (00 00 02 00) — the ICO gate's directory-plausibility check must
    keep decode_image dispatching such files to the TGA reader."""
    rgb = _rgb()
    t = C.encode_tga(rgb)
    assert t[:4] == b"\x00\x00\x02\x00"
    assert not C.is_ico(t)
    assert np.array_equal(C.decode_image(t), rgb)
