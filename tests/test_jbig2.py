"""JBIG2 generic-region tier (functions/jbig2.py, round 12): the MQ
coder's encoder/decoder pair under fuzzed symbol streams (a
transcription slip in the dual-printed Qe table or the coder
procedures desyncs these immediately), generic-region round trips
across all four templates with nominal and MOVED AT pixels and
TPGDON, the embedded segment stream, the PDF /JBIG2Decode plate path
(incl. /JBIG2Globals), the named refusals, the pixel cap, and the
corruption hammer. The context-bit-order interop receipt (vs an
independent implementation) is the PyMuPDF-gated test at the end —
see the module docstring's constants-policy note."""

from __future__ import annotations

import numpy as np
import pytest

from pg2kinesis_spark.functions import jbig2 as J
from pg2kinesis_spark.functions import pdf as P
from pg2kinesis_spark.functions.codecs import decode_image


def _plate(seed=7, h=40, w=64, p=0.15):
    rng = np.random.default_rng(seed)
    img = np.zeros((h, w), dtype=bool)
    img[h // 4 : h // 2, w // 8 : w - w // 8] = True
    img ^= rng.random((h, w)) < p
    return img


def test_qe_table_structure():
    # re-run the import-time checks (they must keep holding)
    assert len(J._QE) == 47
    assert [i for i, t in enumerate(J._QE) if t[3]] == [0, 6, 14]
    assert J._QE[46][1] == J._QE[46][2] == 46
    for i in range(15, 45):
        assert J._QE[i][1] == i + 1
    # the fast-attack ladder halves roughly geometrically
    assert J._QE[0][0] == 0x5601 and J._QE[5][0] == 0x0221


def test_mq_coder_round_trips_fuzzed_streams():
    rng = np.random.default_rng(3)
    for trial in range(12):
        n = int(rng.integers(1, 3000))
        ncx = int(rng.integers(1, 16))
        # biased streams exercise the adaptation ladder deeply
        bias = rng.random()
        syms = (rng.random(n) < bias).astype(int).tolist()
        cxs = rng.integers(0, ncx, n).tolist()
        enc = J.MQEncoder()
        est = [[0, 0] for _ in range(ncx)]
        for s, c in zip(syms, cxs):
            enc.encode(est[c], s)
        blob = enc.flush()
        dec = J.MQDecoder(blob)
        dst = [[0, 0] for _ in range(ncx)]
        got = [dec.decode(dst[c]) for c in cxs]
        assert got == syms, trial
        # adaptation states converged identically on both sides
        assert est == dst, trial


def test_generic_region_round_trips_all_templates():
    img = _plate()
    for t in (0, 1, 2, 3):
        blob = J.encode_generic_region(img, template=t)
        out = J.decode_generic_region(
            blob, img.shape[1], img.shape[0], template=t
        )
        assert np.array_equal(out, img), t


def test_generic_region_moved_at_pixels():
    """AT pixels keep their context bit SLOT when moved — encoder and
    decoder must agree for any legal placement."""
    img = _plate(11)
    at0 = ((1, -1), (-1, -1), (3, -2), (-3, -2))  # template 0, moved
    blob = J.encode_generic_region(img, template=0, at=at0)
    out = J.decode_generic_region(blob, 64, 40, template=0, at=at0)
    assert np.array_equal(out, img)
    # a different placement decodes to garbage or desyncs -> NOT equal
    out2 = J.decode_generic_region(blob, 64, 40, template=0)
    assert not np.array_equal(out2, img)
    at1 = ((-2, -3),)
    blob = J.encode_generic_region(img, template=2, at=at1)
    out = J.decode_generic_region(blob, 64, 40, template=2, at=at1)
    assert np.array_equal(out, img)


def test_tpgdon_round_trip_and_compression():
    """Rows repeated verbatim cost one decision bit under TPGDON: a
    banded image must round-trip AND shrink."""
    img = np.zeros((64, 48), dtype=bool)
    img[8:32] = True
    img[40:44, 10:30] = True
    plain = J.encode_generic_region(img, template=0)
    tp = J.encode_generic_region(img, template=0, tpgdon=True)
    out = J.decode_generic_region(tp, 48, 64, template=0, tpgdon=True)
    assert np.array_equal(out, img)
    assert len(tp) < len(plain)
    # all-typical image: every row equals its predecessor after row 0
    flat = np.ones((32, 32), dtype=bool)
    tp2 = J.encode_generic_region(flat, template=0, tpgdon=True)
    out2 = J.decode_generic_region(tp2, 32, 32, template=0, tpgdon=True)
    assert np.array_equal(out2, flat)
    assert len(tp2) < 16


def test_embedded_stream_and_composition():
    img = _plate(13, 30, 50)
    stream = J.encode_jbig2(img)
    page = J.decode_jbig2(stream)
    assert np.array_equal(page, img)
    for t in (1, 2, 3):
        assert np.array_equal(
            J.decode_jbig2(J.encode_jbig2(img, template=t)), img
        )
    assert np.array_equal(
        J.decode_jbig2(J.encode_jbig2(img, tpgdon=True)), img
    )


def test_mmr_regions_route_to_the_ccitt_kernel():
    """MMR-coded generic regions ARE T.6/G4 coding — they decode
    through the existing CCITT kernel instead of refusing (round 12,
    the TIFF-compression-4 precedent)."""
    img = _plate(41, 28, 44, p=0.2)
    stream = J.encode_jbig2(img, mmr=True)
    assert np.array_equal(J.decode_jbig2(stream), img)
    # and through a PDF plate end to end
    doc = P.encode_pdf(
        [["xi: an MMR JBIG2 plate"]], images=[(stream, 44, 28, "jbig2")]
    )
    images = P.pdf_images(doc)
    assert len(images) == 1 and images[0][3] is None
    px = decode_image(images[0][1])
    got = px[:, :, 0] if px.ndim == 3 else px
    assert np.array_equal(got, np.where(img, 0, 255).astype(np.uint8))


def test_refusals_by_name_and_pixel_cap(monkeypatch):
    img = _plate(17, 16, 16)
    stream = bytearray(J.encode_jbig2(img))
    # halftone-region segment type refuses by name (symbol
    # dictionaries DECODE since the round-12 second half)
    ht = bytearray(stream)
    ht[4] = 22  # segment 0's type byte -> immediate halftone region
    with pytest.raises(NotImplementedError, match="halftone"):
        J.decode_jbig2(bytes(ht))
    # unknown data length refuses
    unk = bytearray(stream)
    unk[7:11] = b"\xff\xff\xff\xff"
    with pytest.raises((NotImplementedError, ValueError)):
        J.decode_jbig2(bytes(unk))
    # pixel cap: env-tunable, fires before any MQ work
    monkeypatch.setenv("SPARK_GRAFT_JBIG2_PIXEL_CAP", "100")
    with pytest.raises(NotImplementedError, match="pixel cap"):
        J.decode_generic_region(b"\x00" * 8, 64, 40)
    monkeypatch.delenv("SPARK_GRAFT_JBIG2_PIXEL_CAP")
    # truncated segment header
    with pytest.raises(ValueError):
        J.decode_jbig2(bytes(stream[:8]))


def test_corruption_hammer_never_hangs():
    img = _plate(19, 24, 24)
    stream = J.encode_jbig2(img)
    rng = np.random.default_rng(23)
    for _ in range(60):
        bad = bytearray(stream)
        for _k in range(int(rng.integers(1, 4))):
            bad[int(rng.integers(0, len(bad)))] = int(rng.integers(256))
        try:
            out = J.decode_jbig2(bytes(bad))
            assert out.shape[0] <= 1 << 16 and out.shape[1] <= 1 << 16
        except (ValueError, NotImplementedError):
            pass  # named refusal / structural damage: fine


def test_pdf_jbig2_plate_round_trips_to_construction_pixels():
    """The n27 G4-plate precedent: a /JBIG2Decode plate re-wraps as
    the PNG of the construction pixels."""
    ink = _plate(29, 20, 32, p=0.3)
    stream = J.encode_jbig2(ink)
    doc = P.encode_pdf(
        [["nu: a JBIG2 plate"]], images=[(stream, 32, 20, "jbig2")]
    )
    images = P.pdf_images(doc)
    assert len(images) == 1
    idx, payload, mime, err = images[0]
    assert err is None and mime == "image/png"
    px = decode_image(payload)
    want = np.where(ink, 0, 255).astype(np.uint8)
    got = px[:, :, 0] if px.ndim == 3 else px
    assert np.array_equal(got, want)


def test_pdf_jbig2_globals_stream():
    """/JBIG2Globals carries shared segments (here: the page info),
    with the per-image stream carrying only the region."""
    ink = _plate(31, 18, 26, p=0.2)
    full = J.encode_jbig2(ink)
    # split: segment 0 (page info, 11 + 19 bytes) into globals
    glob, rest = full[:30], full[30:]
    assert np.array_equal(J.decode_jbig2(rest, glob), ink)


# --- the independent-implementation receipt (docker twin) ----------------------


def test_pymupdf_cross_decoder():
    """Render a JBIG2 plate through PyMuPDF (MuPDF's own JBIG2
    decoder) and compare pixels — the context-bit-order interop
    receipt the round-trip tests cannot provide. Skips without the
    binding; docker/docker-compose.av.yml installs it."""
    fitz = pytest.importorskip("fitz")
    ink = _plate(37, 40, 64, p=0.25)
    stream = J.encode_jbig2(ink)
    doc_bytes = P.encode_pdf(
        [["cross-check"]], images=[(stream, 64, 40, "jbig2")]
    )
    doc = fitz.open(stream=doc_bytes, filetype="pdf")
    page = doc[0]
    found = False
    for xref in range(1, doc.xref_length()):
        if "JBIG2Decode" not in doc.xref_object(xref, compressed=True):
            continue
        pix = fitz.Pixmap(doc, xref)
        arr = np.frombuffer(pix.samples, dtype=np.uint8).reshape(
            pix.height, pix.width, pix.n
        )[:, :, 0]
        want = np.where(ink, 0, 255).astype(np.uint8)
        assert arr.shape == want.shape
        assert np.array_equal(arr, want)
        found = True
    assert found, "no JBIG2 image found by PyMuPDF"
    del page


def test_malformed_long_form_header_raises_valueerror():
    """A long-form referred-segment count large enough to push the
    parser past the buffer must raise the module's documented
    ValueError — never struct.error / IndexError (code-review round
    12)."""
    import struct

    hdr = struct.pack(">IB", 1, J._SEG_PAGE_INFO) + bytes([0xE0, 0x00, 0x10, 0x00])
    with pytest.raises(ValueError, match="truncated"):
        J.decode_jbig2(hdr + b"\x00" * 4)


# --- symbol dictionary + text region (round 12, second half) ------------------


def _glyphs(seed=11, n=4):
    rng = np.random.RandomState(seed)
    shapes = [(7, 5), (7, 4), (9, 6), (5, 5)][:n]
    return [rng.random_sample(s) > 0.5 for s in shapes]


def _compose(places, glyphs, w, h, op="or"):
    """Construction-side truth: direct numpy placement — never runs
    either JBIG2 coder."""
    page = np.zeros((h, w), dtype=bool)
    for sid, r, c in places:
        g = glyphs[sid]
        tgt = page[r : r + g.shape[0], c : c + g.shape[1]]
        piece = g[: tgt.shape[0], : tgt.shape[1]]
        if op == "or":
            tgt |= piece
        else:
            tgt ^= piece
    return page


_PLACES = [(0, 2, 3), (1, 2, 10), (3, 2, 16), (2, 14, 5),
           (0, 14, 13), (2, 30, 1)]


@pytest.mark.parametrize("corner", [0, 1, 2, 3])
@pytest.mark.parametrize("transposed", [False, True])
def test_symbol_text_round_trip_every_refcorner(corner, transposed):
    """Symbol dictionary + text region: decode must equal the numpy
    composition of the construction glyphs at the construction
    coordinates, for every REFCORNER x TRANSPOSED wire encoding of
    the SAME page (the coordinate walks differ, the pixels must
    not)."""
    glyphs = _glyphs()
    truth = _compose(_PLACES, glyphs, 40, 44)
    stream = J.encode_jbig2_text(glyphs, _PLACES, 40, 44,
                                 refcorner=corner, transposed=transposed)
    assert np.array_equal(J.decode_jbig2(stream), truth)


def test_symbol_text_globals_split_and_pdf_layout():
    """The real-scanner layout: symbol dictionary in /JBIG2Globals,
    page info + text region in the image stream."""
    from pg2kinesis_spark.functions.codecs import decode_image

    glyphs = _glyphs(seed=3, n=3)
    places = [(0, 1, 1), (1, 1, 9), (2, 1, 17), (1, 12, 4), (0, 12, 12)]
    truth = _compose(places, glyphs, 26, 22)
    g, d = J.encode_jbig2_text(glyphs, places, 26, 22, split_globals=True)
    assert np.array_equal(J.decode_jbig2(d, g), truth)
    doc = P.encode_pdf([["symbol/text plate"]],
                       images=[((d, g), 26, 22, "jbig2")])
    images = P.pdf_images(doc)
    assert len(images) == 1 and images[0][3] is None
    px = decode_image(images[0][1])
    got = (px[:, :, 0] if px.ndim == 3 else px) == 0
    assert np.array_equal(got, truth)


def test_text_region_xor_dsoffset_and_single_symbol():
    """SBCOMBOP=XOR composes overlaps by parity; SBDSOFFSET shifts
    the in-strip delta walk (wire-level only — pixels must not move);
    a one-symbol dictionary codes IDs in ZERO bits (spec-literal
    SBSYMCODELEN)."""
    glyphs = _glyphs(seed=5, n=2)
    overlap = [(0, 4, 4), (1, 6, 6), (0, 4, 20)]
    truth = _compose(overlap, glyphs, 32, 20, op="xor")
    stream = J.encode_jbig2_text(glyphs, overlap, 32, 20, sbcombop=2)
    assert np.array_equal(J.decode_jbig2(stream), truth)
    # dsoffset: same page, different wire deltas
    t2 = _compose(overlap, glyphs, 32, 20)
    for off in (-5, 7):
        s = J.encode_jbig2_text(glyphs, overlap, 32, 20, dsoffset=off)
        assert np.array_equal(J.decode_jbig2(s), t2)
    # single symbol -> SBSYMCODELEN = 0
    one = [glyphs[0]]
    places = [(0, 0, 0), (0, 0, 10), (0, 9, 3)]
    truth1 = _compose(places, one, 18, 17)
    assert np.array_equal(
        J.decode_jbig2(J.encode_jbig2_text(one, places, 18, 17)), truth1
    )


def test_symbol_text_refusals_by_name():
    glyphs = _glyphs(n=2)
    stream = bytearray(
        J.encode_jbig2_text(glyphs, [(0, 1, 1), (1, 1, 8)], 16, 10)
    )
    # symbol dictionary body starts after its 11-byte segment header
    with pytest.raises(NotImplementedError, match="Huffman"):
        bad = bytearray(stream)
        bad[12] |= 1  # SDHUFF (flags low byte = offset 12)
        J.decode_jbig2(bytes(bad))
    with pytest.raises(NotImplementedError, match="refinement"):
        bad = bytearray(stream)
        bad[12] |= 2  # SDREFAGG
        J.decode_jbig2(bytes(bad))
    with pytest.raises(NotImplementedError, match="shared"):
        bad = bytearray(stream)
        bad[11] |= 1  # flags high byte: bitmap coding context used
        J.decode_jbig2(bytes(bad))


def test_int_coder_round_trips_every_bucket():
    """The Annex A integer coder: every range bucket, both signs, and
    OOB, through ONE MQ stream with adaptation carried across values
    (the pair-consistency evidence class of the MQ fuzz test)."""
    rng = np.random.RandomState(2)
    vals = [0, 1, 3, 4, 19, 20, 83, 84, 339, 340, 4435, 4436, 10**5,
            -1, -4, -20, -84, -340, -4436, -(10**6), J._OOB]
    vals += [int(v) for v in rng.randint(-5000, 5000, 60) if v != 0]
    vals += [J._OOB, 17, J._OOB]
    enc = J.MQEncoder()
    cx = J._new_int_ctx()
    for v in vals:
        J._int_encode(enc, cx, v)
    dec = J.MQDecoder(enc.flush())
    cx2 = J._new_int_ctx()
    for v in vals:
        got = J._int_decode(dec, cx2)
        assert (got is J._OOB) if v is J._OOB else (got == v)
    assert [s for s, _m in cx] == [s for s, _m in cx2]  # adapted alike


def test_pymupdf_cross_decoder_symbol_text():
    """The symbol/text interop receipt: the IAx PREV-threading and the
    placement walks are encoder/decoder-shared here, so only an
    independent implementation can vouch for them (the context-bit-
    order precedent). Skips without PyMuPDF."""
    fitz = pytest.importorskip("fitz")
    glyphs = _glyphs(seed=9)
    truth = _compose(_PLACES, glyphs, 40, 44)
    g, d = J.encode_jbig2_text(glyphs, _PLACES, 40, 44, split_globals=True)
    doc_bytes = P.encode_pdf([["sym/text cross-check"]],
                             images=[((d, g), 40, 44, "jbig2")])
    doc = fitz.open(stream=doc_bytes, filetype="pdf")
    found = False
    for xref in range(1, doc.xref_length()):
        if "JBIG2Decode" not in doc.xref_object(xref, compressed=True):
            continue
        pix = fitz.Pixmap(doc, xref)
        arr = np.frombuffer(pix.samples, dtype=np.uint8).reshape(
            pix.height, pix.width, pix.n
        )[:, :, 0]
        assert np.array_equal(arr, np.where(truth, 0, 255).astype(np.uint8))
        found = True
    assert found, "no JBIG2 image found by PyMuPDF"
