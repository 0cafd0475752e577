"""GIF codec: lossless round trips pin the LZW pair bit-for-bit.

Unlike JPEG, GIF is palette-exact, so every encode->decode test here
asserts EXACT pixel equality — across interlace, full-256-color
palettes (which force LZW code-width growth), and low-entropy content
(which fills the 4096-entry dictionary and forces a mid-stream CLEAR).
"""

from __future__ import annotations

import numpy as np
import pytest

from pg2kinesis_spark.functions.codecs import (
    decode_gif,
    decode_image,
    encode_gif,
    encode_png,
    is_gif,
    resize_nearest,
)


def _paletted(h, w, ncolors, seed=0):
    rng = np.random.RandomState(seed)
    pal = rng.randint(0, 256, (ncolors, 3)).astype(np.uint8)
    return pal[rng.randint(0, ncolors, (h, w))]


@pytest.mark.parametrize("interlace", [False, True])
@pytest.mark.parametrize("ncolors", [2, 16, 100])
def test_gif_roundtrip_exact(interlace, ncolors):
    img = _paletted(23, 17, ncolors, seed=ncolors)
    data = encode_gif(img, interlace=interlace)
    assert is_gif(data)
    np.testing.assert_array_equal(decode_gif(data), img)


def test_gif_gray_and_dispatch():
    g = np.arange(99, dtype=np.uint8).reshape(9, 11)
    want = np.repeat(g[:, :, None], 3, axis=2)
    np.testing.assert_array_equal(decode_gif(encode_gif(g)), want)
    np.testing.assert_array_equal(decode_image(encode_gif(g)), want)


def test_gif_code_width_growth_full_palette():
    """256 colors + noise: the LZW stream must widen codes repeatedly."""
    img = _paletted(120, 120, 256, seed=3)
    np.testing.assert_array_equal(decode_gif(encode_gif(img)), img)


def test_gif_dictionary_clear_on_low_entropy():
    """Long repeated runs fill the 4096-entry dictionary and force the
    encoder's mid-stream CLEAR; the decoder must resynchronize."""
    pal = _paletted(1, 256, 256, seed=4).reshape(256, 3)
    img = pal[(np.add.outer(np.arange(300), np.arange(300)) % 7)]
    np.testing.assert_array_equal(decode_gif(encode_gif(img)), img)


def test_gif_rejections():
    with pytest.raises(ValueError, match="signature"):
        decode_gif(b"NOTAGIF")
    with pytest.raises(ValueError, match="256 distinct"):
        # a smooth gradient image with > 256 distinct RGB triples
        rng = np.random.RandomState(8)
        encode_gif(rng.randint(0, 256, (32, 32, 3)).astype(np.uint8))
    with pytest.raises(ValueError):
        encode_gif(np.zeros((4, 4, 4), dtype=np.uint8))  # RGBA unsupported
    img = _paletted(10, 10, 8, seed=5)
    data = bytearray(encode_gif(img))
    with pytest.raises(ValueError):
        decode_gif(bytes(data[:40]))  # truncated mid-stream


def test_gif_property_roundtrip():
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=40, deadline=None)
    @given(
        st.integers(min_value=1, max_value=16),
        st.integers(min_value=1, max_value=16),
        st.integers(min_value=1, max_value=256),
        st.booleans(),
        st.integers(min_value=0, max_value=2**32 - 1),
    )
    def prop(h, w, ncolors, interlace, seed):
        img = _paletted(h, w, ncolors, seed=seed)
        np.testing.assert_array_equal(
            decode_gif(encode_gif(img, interlace=interlace)), img
        )

    prop()


# --- Spark-side real paths -------------------------------------------------

def test_gif_spark_features_resize_dhash(spark):
    from pyspark.sql import functions as F

    from pg2kinesis_spark.functions.multimodal import (
        MEDIA_SCHEMA,
        extract_features,
        media_dhash,
        resize_media,
    )

    img = _paletted(24, 16, 32, seed=9)
    rows = [
        (0, bytearray(encode_gif(img)), ("image/gif", 0, "a.gif")),
        (1, bytearray(encode_png(img)), ("image/png", 0, "a.png")),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)

    dims = {r["media_id"]: (r["width"], r["height"]) for r in extract_features(media, fake=False).collect()}
    assert dims == {0: (16, 24), 1: (16, 24)}

    # GIF is lossless: the same pixels as the PNG -> identical dHash
    h = {r["media_id"]: r["dhash"] for r in media_dhash(media).collect()}
    assert h[0] == h[1]

    out = resize_media(media.filter(F.col("media_id") == 0), width=8, height=8, fake=False).collect()
    resized = decode_gif(bytes(out[0]["content"]))
    np.testing.assert_array_equal(resized, resize_nearest(img, 8, 8))
