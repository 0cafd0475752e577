"""Deterministic Group-A fixture generation (FIXTURES.md, seed=42).

Generates the CDC golden-parity corpora:
- ``pk_catalog``          — PK catalog snapshot (FIXTURES.md A1)
- ``info_schema_*``       — information_schema-shaped tables feeding
                            catalog.build_pk_catalog (reference slot.py:18-33)
- ``cdc_test_decoding``   — clean test_decoding wire lines (A2)
- ``cdc_wal2json``        — clean wal2json wire messages (A3)

"Clean" corpora contain no error-path rows (those live in unit tests)
so the oracle-checked pipeline queries run strict end to end.
Everything is reproducible from the seed; ``tools/gen_fixtures.py``
materializes parquet under fixtures/.
"""

from __future__ import annotations

import json
import random

# (qualified name, pk col, pk type, quoted?, pk value generator kind)
STREAM_TABLES = [
    ("public.test_table", "uuid", "uuid", True, "uuid"),
    ("public.test_table2", "name", "character varying", True, "name"),
    ("public.orders_cdc", "id", "int4", False, "int"),
]

OPS_TD = ["INSERT", "UPDATE", "DELETE"]  # test_decoding: uppercase verbatim
OPS_W2J = ["insert", "update", "delete"]  # wal2json: lowercase kinds


def pk_catalog_rows() -> list[tuple]:
    """(table_name, col_name, col_type, col_ord_pos) incl. the composite
    (last-ordinal-wins pin, SURVEY §8.3) and no-PK (NULL row) cases."""
    rows = [(t, c, ty, 0) for t, c, ty, _, _ in STREAM_TABLES]
    rows += [
        ("public.composite", "a", "int4", 1),
        ("public.composite", "b", "int4", 2),
        ("public.nopk", None, None, None),
    ]
    return rows


def info_schema_rows() -> dict[str, list[tuple]]:
    """information_schema-shaped inputs whose pk pipeline output equals
    pk_catalog_rows(). Includes a VIEW and a non-PK constraint that the
    query must filter out."""
    cat = "db"
    tables, constraints, kcu, columns = [], [], [], []
    for t, c, ty, _, _ in STREAM_TABLES + [("public.composite", None, None, None, None), ("public.nopk", None, None, None, None)]:
        schema, name = t.split(".")
        tables.append((cat, schema, name, "BASE TABLE"))
    tables.append((cat, "public", "some_view", "VIEW"))

    def pk(schema, name, col, ty, ord_pos):
        cn = f"{name}_pkey"
        constraints.append((cat, schema, cn, cat, schema, name, "PRIMARY KEY"))
        kcu.append((cat, schema, cn, cat, schema, name, col, ord_pos))
        columns.append((cat, schema, name, col, ty))

    for t, c, ty, _, _ in STREAM_TABLES:
        schema, name = t.split(".")
        pk(schema, name, c, ty, 0)
    pk("public", "composite", "a", "int4", 1)
    # second pk column of the composite shares the constraint row
    kcu.append((cat, "public", "composite_pkey", cat, "public", "composite", "b", 2))
    columns.append((cat, "public", "composite", "b", "int4"))
    # a UNIQUE constraint the PRIMARY KEY filter must exclude
    constraints.append((cat, "public", "test_table_uniq", cat, "public", "test_table", "UNIQUE"))
    kcu.append((cat, "public", "test_table_uniq", cat, "public", "test_table", "uuid", 0))
    return {
        "tables": tables,
        "table_constraints": constraints,
        "key_column_usage": kcu,
        "columns": columns,
    }


def _uuid(rng: random.Random) -> str:
    h = "".join(rng.choice("0123456789abcdef") for _ in range(32))
    return f"{h[:8]}-{h[8:12]}-{h[12:16]}-{h[16:20]}-{h[20:]}"


def _pk_value(rng: random.Random, kind: str):
    if kind == "uuid":
        return _uuid(rng)
    if kind == "name":
        return f"Name-{rng.randrange(100000)}"
    return rng.randrange(1, 10_000_000)


def gen_test_decoding(n_txns: int = 2000, seed: int = 42) -> list[tuple[int, int, str]]:
    """(lsn, data_size, payload) rows: BEGIN/COMMIT-framed transactions of
    1-4 DML lines each, grammar per reference formatter.py:45-57."""
    rng = random.Random(seed)
    rows, lsn, xid = [], 1000, 100

    def emit(payload: str):
        nonlocal lsn
        rows.append((lsn, len(payload.encode()), payload))
        lsn += rng.randrange(1, 50)

    for _ in range(n_txns):
        xid += rng.randrange(1, 5)
        emit(f"BEGIN {xid}")
        for _ in range(rng.randrange(1, 5)):
            t, col, ty, quoted, kind = rng.choice(STREAM_TABLES)
            op = rng.choice(OPS_TD)
            val = _pk_value(rng, kind)
            vtxt = f"'{val}'" if quoted else str(val)
            extra = f" other_col[text]:'x{rng.randrange(1000)}'"
            emit(f"table {t}: {op}: {col}[{ty}]:{vtxt}{extra}")
        emit("COMMIT")
    return rows


def gen_wal2json(n_msgs: int = 2000, seed: int = 43) -> list[tuple[int, int, str]]:
    """(lsn, data_size, payload) wal2json messages; includes empty change
    arrays, multi-change messages, pk at varying positions, mixed-type and
    null extra columnvalues, occasional null pk (→ pkey 'None')."""
    rng = random.Random(seed)
    rows, lsn, xid = [], 5000, 500

    def emit(payload: str):
        nonlocal lsn
        rows.append((lsn, len(payload.encode()), payload))
        lsn += rng.randrange(1, 50)

    for _ in range(n_msgs):
        xid += rng.randrange(1, 5)
        n_changes = rng.choice([0, 1, 1, 1, 2, 3])
        changes = []
        for _ in range(n_changes):
            t, col, ty, _, kind = rng.choice(STREAM_TABLES)
            schema, table = t.split(".")
            pk_val = None if rng.random() < 0.02 else _pk_value(rng, kind)
            extra_cols = [
                ("num_col", "int4", rng.randrange(1000)),
                ("txt_col", "text", f"v{rng.randrange(1000)}"),
                ("nullable_col", "text", None),
            ][: rng.randrange(0, 4)]
            cols = [(col, ty, pk_val)] + extra_cols
            rng.shuffle(cols)  # pk position varies (pins P9 lookup-by-name)
            changes.append(
                {
                    "kind": rng.choice(OPS_W2J),
                    "schema": schema,
                    "table": table,
                    "columnnames": [c[0] for c in cols],
                    "columntypes": [c[1] for c in cols],
                    "columnvalues": [c[2] for c in cols],
                }
            )
        emit(json.dumps({"xid": xid, "change": changes}))
    return rows


def gen_pgoutput(n_txns: int = 2000, seed: int = 44) -> list[tuple[int, int, str]]:
    """(lsn, data_size, payload) rows of base64-encoded pgoutput
    messages — Relation declarations up front, then Begin/DML/Commit
    framed transactions. data_size counts the BINARY message bytes
    (the wire size a real slot serves)."""
    import base64

    from pg2kinesis_spark.operators.pgoutput import (
        encode_begin,
        encode_commit,
        encode_delete,
        encode_insert,
        encode_relation,
        encode_update,
    )

    rng = random.Random(seed)
    rows, lsn, xid = [], 1000, 100
    rels = [
        (101, "public", "users", ["id", "name"], ("id",)),
        (102, "public", "orders", ["order_id", "total"], ("order_id",)),
        (103, "app", "events", ["event_id", "kind"], ("event_id",)),
    ]

    def emit(msg: bytes):
        nonlocal lsn
        rows.append((lsn, len(msg), base64.b64encode(msg).decode()))
        lsn += rng.randrange(1, 50)

    for rel_id, ns, rel, cols, keys in rels:
        emit(encode_relation(rel_id, ns, rel, cols, key_cols=keys))
    for _ in range(n_txns):
        xid += rng.randrange(1, 5)
        emit(encode_begin(lsn + 500, xid))
        for _ in range(rng.randrange(1, 5)):
            rel_id, ns, rel, cols, keys = rng.choice(rels)
            pk = str(rng.randrange(10_000))
            other = f"v{rng.randrange(1000)}"
            op = rng.choice(["insert", "update", "delete"])
            if op == "insert":
                emit(encode_insert(rel_id, [pk, other]))
            elif op == "update":
                emit(encode_update(rel_id, [pk, other], old=[pk, None], old_kind="K"))
            else:
                emit(encode_delete(rel_id, [pk, None]))
        emit(encode_commit(lsn + 500, lsn + 501))
    return rows


# --------------------------------------------------------------------------
# Round-6 media-front-door fixtures (driver oracle rows n24-n26).
#
# Construction-side truth tables are the independence contract: the
# generators record WHAT went into each archive/container (member
# order, encoder parameters), and the oracle re-derives the expected
# operator output from that record with plain SQL/arithmetic — never by
# calling the walk/extract code under test.
# --------------------------------------------------------------------------


def gen_media_archives() -> tuple[list[tuple], list[tuple]]:
    """(archive_rows, truth_rows) for the archive front door (n24).

    archive_rows: (path, content_bytes) — two good archives (ZIP with a
    legally-duplicated member name + binary member; TAR with nested
    paths) and one corrupt ZIP that must quarantine whole.
    truth_rows: (path, ordinal, member, text) in CONSTRUCTION order —
    text is None for binary members (the suffix rule excludes them
    downstream; the oracle applies that rule in SQL, independently).
    """
    import io
    import tarfile
    import zipfile

    rng = random.Random(42)
    vocab = (
        "spark shuffle archive member corpus dedup batch stream kernel "
        "column vector window merge join filter"
    ).split()

    def sentence(n: int) -> str:
        return " ".join(rng.choice(vocab) for _ in range(n)) + "."

    zip_members = [
        ("docs/intro.txt", sentence(24)),
        ("docs/guide.md", "# Guide\n\n" + sentence(40)),
        ("img/logo.bin", bytes(range(256)) * 4),  # binary: suffix-excluded
        ("notes.txt", "naïve café — ünïcode ✓"),
        ("dup.txt", "first copy: " + sentence(8)),
        ("dup.txt", "second copy: " + sentence(8)),  # dup names are legal
    ]
    tar_members = [
        ("readme.txt", sentence(30)),
        ("data.csv", "a,b\n1,2\n3,4\n"),
        ("sub/deep/leaf.md", sentence(16)),
        ("binary.dat", b"\x00\xff" * 64),  # suffix-excluded
    ]

    zbuf = io.BytesIO()
    with zipfile.ZipFile(zbuf, "w", zipfile.ZIP_DEFLATED) as zf:
        for name, content in zip_members:
            data = content if isinstance(content, bytes) else content.encode()
            # fixed date_time: archive bytes must be bit-reproducible
            zi = zipfile.ZipInfo(name, date_time=(2020, 1, 1, 0, 0, 0))
            zf.writestr(zi, data)
    tbuf = io.BytesIO()
    with tarfile.open(fileobj=tbuf, mode="w") as tf:
        for name, content in tar_members:
            data = content if isinstance(content, bytes) else content.encode()
            ti = tarfile.TarInfo(name)
            ti.size = len(data)
            ti.mtime = 0
            tf.addfile(ti, io.BytesIO(data))

    archive_rows = [
        ("fx/a1.zip", zbuf.getvalue()),
        ("fx/a2.tar", tbuf.getvalue()),
        # ZIP magic + garbage: BadZipFile -> whole-archive quarantine,
        # so NO truth rows exist for it (the oracle sees it only as
        # absence; the quarantine row itself is pinned in pytest)
        ("fx/bad.zip", b"PK\x03\x04" + bytes(32)),
    ]
    truth_rows = []
    for path, members in (("fx/a1.zip", zip_members), ("fx/a2.tar", tar_members)):
        for ordinal, (name, content) in enumerate(members):
            text = None if isinstance(content, bytes) else content
            truth_rows.append((path, ordinal, name, text))
    return archive_rows, truth_rows


def gen_media_containers() -> tuple[
    list[tuple], list[tuple], list[tuple], list[tuple]
]:
    """(container_rows, audio_truth, video_truth, image_truth) for n25.

    container_rows: (media_id, kind, content) — spec-packed fixture
    encodings across every supported container. Truth rows carry the
    EXPECTED metadata columns computed from the encoder parameters with
    the documented formulas (duration = samples/rate, bitrate =
    bytes*8/seconds, fps = frames/duration; round 9 adds images with
    ITU-R 601 mean luma on the construction pixels) — plain arithmetic
    on the construction inputs, independent of the walks under test.
    """
    import numpy as np

    from pg2kinesis_spark.functions import codecs as C

    container_rows: list[tuple] = []
    audio_truth: list[tuple] = []
    video_truth: list[tuple] = []

    def add(mid: int, kind: str, content: bytes) -> None:
        container_rows.append((mid, kind, content))

    # --- audio -------------------------------------------------------
    # 1: WAV — PCM16 mono; kbps = rate*ch*bits/1000 (CBR by definition)
    import hashlib as _hl

    samples = (np.sin(np.arange(4000) / 10.0) * 3000).astype(np.int16)
    wav = C.encode_wav(samples, 8000)
    add(1, "audio", wav)
    audio_truth.append(
        (1, "wav", 8000, 1, 1000.0 * 4000 / 8000, 8000 * 1 * 16 / 1000.0, False,
         None, None, _hl.md5(samples.astype("<i2").tobytes()).hexdigest())
    )
    # 2: FLAC — STREAMINFO totals; container bitrate = bytes over play time
    flac = C.encode_flac_streaminfo(
        rate=44100, channels=2, bits=16, n_samples=441000, extra_blocks=1
    )
    dur_ms = 1000.0 * 441000 / 44100
    add(2, "audio", flac)
    audio_truth.append(
        (2, "flac", 44100, 2, dur_ms, len(flac) * 8 / (dur_ms / 1000.0) / 1000.0, True)
    )
    # 3: Ogg Opus — granules at 48 kHz, pre-skip excluded
    ogg_o = C.encode_ogg_pages(
        codec="opus", rate=48000, channels=2, n_samples=96000, pre_skip=312
    )
    dur_ms = 1000.0 * 96000 / 48000.0
    add(3, "audio", ogg_o)
    audio_truth.append(
        (3, "ogg/opus", 48000, 2, dur_ms,
         len(ogg_o) * 8 / (dur_ms / 1000.0) / 1000.0, True)
    )
    # 4: Ogg Vorbis — granules at the stream rate
    ogg_v = C.encode_ogg_pages(
        codec="vorbis", rate=22050, channels=1, n_samples=44100
    )
    dur_ms = 1000.0 * 44100 / 22050
    add(4, "audio", ogg_v)
    audio_truth.append(
        (4, "ogg/vorbis", 22050, 1, dur_ms,
         len(ogg_v) * 8 / (dur_ms / 1000.0) / 1000.0, True)
    )
    # 5: MP3 CBR — 20 stereo MPEG1 Layer III frames at 128 kbps.
    # duration accumulates per frame (spf/rate summed), mirroring how a
    # frame walk must add it up — same float-op order, same result.
    mp3_cbr = C.encode_mp3_frames(20, kbps=128, rate=44100)
    d = 0.0
    for _ in range(20):
        d += 1152 / 44100
    add(5, "audio", mp3_cbr)
    audio_truth.append((5, "mp3", 44100, 2, d * 1000.0, 128.0, False))
    # 6: MP3 VBR — varying frame bitrates + Xing frame (excluded from
    # the audio-frame count and the mean)
    vbr_rates = [128, 192, 160, 128, 224, 192, 160, 128, 192, 160, 128, 96]
    mp3_vbr = C.encode_mp3_frames(len(vbr_rates), kbps=vbr_rates, rate=44100, xing=True)
    d = 0.0
    for _ in vbr_rates:
        d += 1152 / 44100
    add(6, "audio", mp3_vbr)
    audio_truth.append(
        (6, "mp3", 44100, 2, d * 1000.0, sum(vbr_rates) / len(vbr_rates), True)
    )

    # 12: ADTS AAC — 25 LC frames of 256 bytes at 32 kHz; duration is
    # 1024 samples per raw data block, bitrate the container mean
    aac = C.encode_adts_frames(25, rate=32000, channels=2, frame_bytes=256)
    d = 0.0
    for _ in range(25):
        d += 1024 / 32000
    add(12, "audio", aac)
    audio_truth.append(
        (12, "aac", 32000, 2, d * 1000.0, 25 * 256 * 8 / d / 1000.0, True)
    )

    # --- round-8 rows: tags + lossless PCM identity on the board ------
    # Truth md5s are computed HERE with inline numpy packing (interleaved
    # little-endian s16 — the FLAC STREAMINFO layout), independent of the
    # decode kernels and of codecs._pcm_le_bytes.
    import hashlib

    def s16_md5(arr: "np.ndarray") -> str:
        return hashlib.md5(arr.reshape(-1).astype("<i2").tobytes()).hexdigest()

    # 13: full FLAC (real frames) + VorbisComment tags; pcm_md5 proves
    # the complete lossless decode chain cross-engine
    t = np.arange(6000)
    stereo = np.stack(
        [(np.sin(t / 7.0) * 9000).astype(np.int16),
         (np.sin(t / 11.0) * 7000).astype(np.int16)], axis=1
    )
    flac_full = C.encode_flac(
        stereo, rate=16000, tags={"title": "Night Drive", "artist": "Unit Vectors"}
    )
    add(13, "audio", flac_full)
    audio_truth.append(
        (13, "flac", 16000, 2, 1000.0 * 6000 / 16000,
         len(flac_full) * 8 / (6000 / 16000) / 1000.0, True,
         "Night Drive", "Unit Vectors", s16_md5(stereo))
    )
    # 14: MP3 CBR behind an ID3v2.3 tag — the walk must skip the tag for
    # the frame math and read it for title/artist; no canonical PCM
    mp3_tagged = C.encode_id3v2(
        {"title": "Standards", "artist": "The Parsers"}, version=3
    ) + C.encode_mp3_frames(18, kbps=128, rate=44100)
    d = 0.0
    for _ in range(18):
        d += 1152 / 44100
    add(14, "audio", mp3_tagged)
    audio_truth.append(
        (14, "mp3", 44100, 2, d * 1000.0, 128.0, False,
         "Standards", "The Parsers", None)
    )
    # 15: WAV with RIFF LIST/INFO tags; pcm_md5 is the data chunk itself
    mono = (np.sin(np.arange(3200) / 9.0) * 12000).astype(np.int16)
    wav_tagged = C.encode_wav(
        mono, 8000, tags={"title": "Sine Study", "artist": "Test Bench"}
    )
    add(15, "audio", wav_tagged)
    audio_truth.append(
        (15, "wav", 8000, 1, 1000.0 * 3200 / 8000, 8000 * 1 * 16 / 1000.0, False,
         "Sine Study", "Test Bench", s16_md5(mono))
    )
    # 16: AIFF with NAME/AUTH text chunks; big-endian container, same
    # little-endian canonical PCM layout as WAV/FLAC (lossless identity)
    aiff_tagged = C.encode_aiff(
        mono.reshape(-1, 1), 8000, tags={"title": "Iff Study", "artist": "Big End"}
    )
    add(16, "audio", aiff_tagged)
    audio_truth.append(
        (16, "aiff", 8000, 1, 1000.0 * 3200 / 8000, 8000 * 1 * 16 / 1000.0, False,
         "Iff Study", "Big End", s16_md5(mono))
    )
    # 30 (round 11): a REAL Layer III stream from the trusted-table
    # encoder twin — the header walk's frame math must agree with the
    # encoder's parameters (42 frames = ceil(1.5 s * 32 kHz / 1152));
    # lossy, so the canonical PCM identity stays NULL
    from pg2kinesis_spark.functions.mp3_l3 import encode_mp3_layer3

    t30 = np.arange(int(1.5 * 32000))
    l3_real = encode_mp3_layer3(
        0.3 * np.sin(2 * np.pi * 500 * t30 / 32000), 32000, kbps=160
    )
    add(30, "audio", l3_real)
    d = 0.0
    for _ in range(42):
        d += 1152 / 32000
    audio_truth.append((30, "mp3", 32000, 1, d * 1000.0, 160.0, False))
    # 31 (round 12): same walk over a stream carrying the newly
    # transcribed table 7 + count1 A (39 frames = ceil(1 s * 44.1 kHz
    # / 1152)) — the header math is table-independent, so this row
    # pins that the bigger-alphabet wire format still parses
    t31 = np.arange(44100)
    l3_t7 = encode_mp3_layer3(
        0.4 * np.sin(2 * np.pi * 700 * t31 / 44100), 44100, kbps=128,
        table_select=7, count1_table="A",
    )
    add(31, "audio", l3_t7)
    d = 0.0
    for _ in range(39):
        d += 1152 / 44100
    audio_truth.append((31, "mp3", 44100, 1, d * 1000.0, 128.0, False))
    # 32 (round 12): MPEG-2 LSF from the twin — 576-sample frames, so
    # 39 frames = ceil(1 s * 22.05 kHz / 576); the walk must use the
    # LSF frame-length formula or duration would read 2x off
    t32 = np.arange(22050)
    l3_lsf = encode_mp3_layer3(
        0.4 * np.sin(2 * np.pi * 500 * t32 / 22050), 22050, kbps=64,
        version=2,
    )
    add(32, "audio", l3_lsf)
    d = 0.0
    for _ in range(39):
        d += 576 / 22050
    audio_truth.append((32, "mp3", 22050, 1, d * 1000.0, 64.0, False))

    # --- video -------------------------------------------------------
    # 7: MP4 v0 boxes — mdhd timescale = fps*1000, so fps re-derives
    # exactly as n_frames / duration_s
    mp4_a = C.encode_mp4_skeleton(
        duration_s=8.0, timescale=600, width=640, height=360, fps=25.0
    )
    add(7, "video", mp4_a)
    video_truth.append((7, 200, 640, 360, 25.0, 1000.0 * 4800 / 600))
    # 8: MP4 v1 boxes + 64-bit largesize mdat
    mp4_b = C.encode_mp4_skeleton(
        duration_s=3.5, timescale=1000, width=1920, height=1080, fps=24.0,
        version1=True, largesize_mdat=True,
    )
    add(8, "video", mp4_b)
    video_truth.append((8, 84, 1920, 1080, 84 / 3.5, 1000.0 * 3500 / 1000))
    # 9: WebM with Clusters — 30 video SimpleBlocks over 12 s, audio
    # track blocks interleaved (the count must ignore them) and every
    # other frame wrapped in BlockGroup/Block; fps = frames/duration
    webm = C.encode_webm_skeleton(
        duration_s=12.0, width=1280, height=720, n_frames=30,
        audio_blocks=True, block_groups=True,
    )
    add(9, "video", webm)
    video_truth.append((9, 30, 1280, 720, 30 / 12.0, 12000.0))
    # 10: MJPEG AVI — avih math: usec/frame = 10^6 // fps
    rng = np.random.default_rng(42)
    frames = [rng.integers(0, 255, (16, 16, 3), dtype=np.uint8) for _ in range(5)]
    avi = C.encode_avi_mjpeg(frames, fps=25)
    add(10, "video", avi)
    video_truth.append((10, 5, 16, 16, 1_000_000.0 / (1_000_000 // 25), 1000.0 * 5 / 25.0))
    # 11: animated GIF — 4 frames at 25 cs; fps = frames / (cs/100)
    gframes = [np.full((8, 8, 3), 32 * i, dtype=np.uint8) for i in range(4)]
    gif = C.encode_gif_frames(gframes, delay_cs=25)
    add(11, "video", gif)
    video_truth.append((11, 4, 8, 8, 4 / (100 / 100.0), 100 * 10.0))
    # 28: Y4M (late round 9) — 3 uncompressed frames at 30000/1001
    yframes = [rng.integers(0, 255, (12, 16, 3), dtype=np.uint8) for _ in range(3)]
    add(28, "video", C.encode_y4m(yframes, rate=(30000, 1001)))
    video_truth.append((28, 3, 16, 12, 30000 / 1001, 1000.0 * 3 * 1001 / 30000))
    # 29: APNG (late round 9) — 4 frames at 8 cs each: fps = 4/0.32
    aframes = [rng.integers(0, 255, (9, 11, 4), dtype=np.uint8) for _ in range(4)]
    add(29, "video", C.encode_apng(aframes, delay_cs=8))
    video_truth.append((29, 4, 11, 9, 4 / 0.32, 320.0))
    # pre-round-8 rows carry no tag/pcm expectations (untagged fixtures,
    # compressed or frameless streams): pad to the 10-column truth shape
    audio_truth = [r + (None,) * (10 - len(r)) for r in audio_truth]

    # --- images (round 9: the TIFF tier joins the driver board) ------
    # truth rows: (media_id, width, height, n_channels, mean_luma) —
    # luma computed with inline numpy on the CONSTRUCTION pixels using
    # the documented ITU-R 601 formula, never by the decode kernels.
    # Lossless encodings only, so decode must reproduce the pixels.
    image_truth: list[tuple] = []

    def luma_of(px: np.ndarray) -> float:
        f = px.astype(np.float64)
        if f.shape[2] >= 3:
            return float(
                (0.299 * f[:, :, 0] + 0.587 * f[:, :, 1] + 0.114 * f[:, :, 2])
                .mean()
            )
        return float(f[:, :, 0].mean())

    irng = np.random.default_rng(90)
    rgb = irng.integers(0, 256, (21, 34, 3), dtype=np.uint8)
    gray = irng.integers(0, 256, (18, 25, 1), dtype=np.uint8)
    ink = (irng.random((30, 46)) < 0.35).astype(np.uint8) * 255
    plate = 255 - ink  # black ink = dark pixels
    wide16 = irng.integers(0, 65536, (11, 17, 3)).astype(np.uint16)
    # 17: PNG twin of the RGB pixels (cross-format identity anchor)
    add(17, "image", C.encode_png(rgb))
    image_truth.append((17, 34, 21, 3, luma_of(rgb)))
    # 18: uncompressed TIFF, same pixels — TIFF≡PNG luma identity
    add(18, "image", C.encode_tiff(rgb))
    image_truth.append((18, 34, 21, 3, luma_of(rgb)))
    # 19: LZW gray with predictor 2, big-endian byte order
    add(19, "image", C.encode_tiff(
        gray, compression=5, predictor=2, byteorder=">"
    ))
    image_truth.append((19, 25, 18, 1, luma_of(gray)))
    # 20: G4 bilevel fax (CCITT tier), photometric WhiteIsZero
    add(20, "image", C.encode_tiff(plate, compression=4, bits=1, photometric=0))
    image_truth.append((20, 46, 30, 1, luma_of(plate[:, :, None])))
    # 21: tiled deflate RGB — edge tiles clip (34 % 16 != 0)
    add(21, "image", C.encode_tiff(rgb, compression=8, tiles=(16, 16)))
    image_truth.append((21, 34, 21, 3, luma_of(rgb)))
    # 22: planar configuration 2, PackBits, multi-strip
    add(22, "image", C.encode_tiff(
        rgb, compression=32773, planar=2, rows_per_strip=7
    ))
    image_truth.append((22, 34, 21, 3, luma_of(rgb)))
    # 23: 16-bit with predictor 2 — decode reduces to the high byte
    add(23, "image", C.encode_tiff(wide16, bits=16, predictor=2))
    image_truth.append(
        (23, 17, 11, 3, luma_of((wide16 >> 8).astype(np.uint8)))
    )
    # 24: truncated TIFF — the quarantine row (all features NULL)
    add(24, "image", C.encode_tiff(rgb)[: 40])
    image_truth.append((24, None, None, None, None))
    # 25: 12-bit extended-sequential JPEG (SOF1) — constant-per-8x8-
    # block EVEN samples at quality 100 decode EXACTLY (DC-only blocks;
    # quant step 16 divides 8*even), so the lossy format still carries
    # construction-side truth: luma of the top-8-bit reduction
    deep_blocks = irng.integers(0, 2048, (4, 6), dtype=np.uint16) * 2
    deep = np.repeat(np.repeat(deep_blocks, 8, axis=0), 8, axis=1)
    add(25, "image", C.encode_jpeg_ext12(deep, quality=100))
    image_truth.append(
        (25, 48, 32, 1, luma_of((deep >> 4).astype(np.uint8)[:, :, None]))
    )
    # 26: BMP twin of the RGB pixels (lossless) — BMP≡PNG≡TIFF luma
    add(26, "image", C.encode_bmp(rgb))
    image_truth.append((26, 34, 21, 3, luma_of(rgb)))
    # 27: ICO favicon (DIB entry + all-opaque AND mask -> 4 channels;
    # the luma formula reads the RGB planes, alpha doesn't enter)
    favicon = irng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    add(27, "image", C.encode_ico([favicon]))
    image_truth.append((27, 16, 16, 4, luma_of(favicon)))
    return container_rows, audio_truth, video_truth, image_truth


# Per-language vocabularies for the lang-ID training corpus: common
# words with language-characteristic orthography (char n-grams carry
# the signal — 'sch'/umlauts vs 'th'/'tion' vs 'ción'/'ñ' vs
# 'aux'/'è'). Deliberately DISJOINT from text.LANG_MARKERS where
# possible so the trained model isn't just re-learning the marker list.
LANG_VOCAB: dict[str, tuple[str, ...]] = {
    "de": (
        "über", "schön", "müssen", "können", "zwischen", "straße",
        "mädchen", "natürlich", "vielleicht", "wichtig", "geschichte",
        "wissenschaft", "verstehen", "sprechen", "deutschland", "größe",
        "fünf", "zwölf", "tägliche", "glück", "bücher", "spät",
        "während", "jahrhundert", "entwicklung", "möglichkeit",
    ),
    "en": (
        "through", "knowledge", "because", "together", "thought",
        "world", "people", "should", "right", "language", "history",
        "science", "understand", "speak", "england", "growth",
        "twelve", "daily", "happiness", "books", "late", "during",
        "century", "development", "possibility", "weather",
    ),
    "es": (
        "través", "conocimiento", "porque", "juntos", "pensamiento",
        "mundo", "gente", "debería", "derecho", "lenguaje", "historia",
        "ciencia", "entender", "hablar", "españa", "crecimiento",
        "doce", "diario", "felicidad", "libros", "tarde", "durante",
        "siglo", "desarrollo", "posibilidad", "añejo",
    ),
    "fr": (
        "travers", "connaissance", "parce", "ensemble", "pensée",
        "monde", "gens", "devrait", "droit", "langage", "histoire",
        "science", "comprendre", "parler", "français", "croissance",
        "douze", "quotidien", "bonheur", "livres", "tard", "pendant",
        "siècle", "développement", "possibilité", "château",
    ),
}


def gen_lang_corpus(
    n_per_lang: int = 300, seed: int = 13, min_words: int = 12, max_words: int = 40
) -> list[tuple[int, str, str]]:
    """(doc_id, text, lang) training rows for the char-n-gram lang-ID:
    sentences sampled from per-language vocabularies (LANG_VOCAB)."""
    rng = random.Random(seed)
    rows = []
    doc_id = 0
    for lang in sorted(LANG_VOCAB):
        vocab = LANG_VOCAB[lang]
        for _ in range(n_per_lang):
            n = rng.randint(min_words, max_words)
            words = [rng.choice(vocab) for _ in range(n)]
            text = (" ".join(words)).capitalize() + "."
            rows.append((doc_id, text, lang))
            doc_id += 1
    return rows


def gen_media_pdfs() -> tuple[list[tuple], list[tuple]]:
    """(pdf_rows, truth_rows) for the PDF text tier (n27).

    pdf_rows: (media_id, content) across the five supported layouts —
    plain simple-font, FlateDecoded, ObjStm-packed (page tree hidden
    from raw scans), CID/Type0 via ToUnicode (glyph codes ≠ Unicode,
    so the round trip only survives decoding through the CMap), and
    CID+ObjStm combined, AND owner-locked encrypted docs with empty
    user passwords across all three cipher generations — RC4/R3,
    AES-128 AESV2 (V4), AES-256 AESV3 (V5/R6) — which all DECODE
    — plus the two honest refusals (Type0 with no CMap; a non-empty
    user password, simulated by a tampered /U), whose truth rows are
    (NULL, NULL): the quarantine kernel yields NULL text/pages for
    them in every engine.
    truth_rows: (media_id, text, n_pages, n_images, img_mime, img_md5)
    computed from the CONSTRUCTION inputs (lines joined by newline,
    pages by blank line — the documented collapse convention; image
    truth from the bytes/pixels PUT IN: a /DCTDecode payload passes
    through byte-exact so img_md5 is the md5 of the INPUT jpeg, a
    CCITT plate re-wraps as the PNG of the construction pixels, a JPX
    image quarantines per image → NULL mime/md5), never by
    pdf_text/pdf_images."""
    import hashlib as _hl

    import numpy as np

    from pg2kinesis_spark.functions import ccitt as CC
    from pg2kinesis_spark.functions import codecs as C
    from pg2kinesis_spark.functions.pdf import encode_pdf, encode_pdf_cid

    def expected(pages: list[list[str]]) -> str:
        return "\n\n".join("\n".join(lines) for lines in pages)

    a = [["alpha document line one", "alpha line two"], ["alpha page two"]]
    b = [["beta compressed stream (latin-1)", "naïve café text"]]
    c = [["gamma inside an object stream"], ["gamma page two"], ["gamma three"]]
    d = [["delta CID: héllo wörld", "ligature ﬁ — dash"], ["delta 你好 ✓"]]
    e = [["epsilon: CID and ObjStm combined"]]
    f_enc = [["zeta: RC4 R3 encrypted text"], ["zeta page two"]]
    locked = bytearray(encode_pdf([["locked away"]], encrypt_r=3))
    ui = locked.find(b"/U <")
    locked[ui + 4 : ui + 8] = b"0000"  # wrong /U: a non-empty user password
    pdf_rows = [
        (1, encode_pdf(a)),
        (2, encode_pdf(b, compress=True)),
        (3, encode_pdf(c, compress=True, objstm=True)),
        (4, encode_pdf_cid(d)),
        (5, encode_pdf_cid(e, objstm=True)),
        (6, encode_pdf_cid([["refused glyphs"]], with_tounicode=False)),
        (7, encode_pdf(f_enc, compress=True, encrypt_r=3)),
        (8, bytes(locked)),
        (9, encode_pdf([["eta: AESV2 encrypted"]], compress=True, encrypt_r=4)),
        (10, encode_pdf_cid([["theta: AESV3 + CID"]], encrypt_r=6)),
    ]
    # round 9: image-bearing docs — the pdf_images tier joins the board
    x = np.linspace(0, 255, 24, dtype=np.uint8)
    fig = np.stack(
        np.meshgrid(x, x)[::-1] + [np.outer(x, x[::-1]) // 255], axis=-1
    ).astype(np.uint8)
    jpg = C.encode_jpeg(fig, quality=90)
    irng = np.random.default_rng(77)
    ink = (irng.random((20, 32)) < 0.3).astype(bool)
    fax = CC.ccitt_encode(ink, k=-1)
    plate_png = C.encode_png(
        np.where(ink, 0, 255).astype(np.uint8)[:, :, None]
    )
    g_iota = [["iota: a figure below"]]
    g_kappa = [["kappa: same figure, ObjStm + AESV2"]]
    g_lam = [["lambda: a G4 scanned plate"]]
    g_mu = [["mu: a JPX plate (quarantines per image)"]]
    # 15 (round 12): a JBIG2 generic-region plate — MQ-coded through
    # the encoder twin, decoded back to the construction pixels
    from pg2kinesis_spark.functions import jbig2 as JB

    ink2 = (irng.random((24, 40)) < 0.25).astype(bool)
    jb_stream = JB.encode_jbig2(ink2)
    jb_png = C.encode_png(
        np.where(ink2, 0, 255).astype(np.uint8)[:, :, None]
    )
    g_nu = [["nu: a JBIG2 generic plate"]]
    # 16 (round 12 second half): a symbol/text-coded JBIG2 page — the
    # coding mode real scanner output uses for text; the dictionary
    # travels as /JBIG2Globals (the split layout) and the truth page
    # is the numpy composition of the construction glyphs (the oracle
    # never runs either JBIG2 coder)
    st_glyphs = [(irng.random((7, 5)) < 0.5),
                 (irng.random((9, 6)) < 0.45),
                 (irng.random((6, 6)) < 0.55)]
    st_places = [(0, 2, 3), (1, 2, 11), (2, 2, 20), (1, 14, 5),
                 (0, 14, 14)]
    st_page = np.zeros((24, 30), dtype=bool)
    for _sid, _r, _c in st_places:
        _gl = st_glyphs[_sid]
        st_page[_r : _r + _gl.shape[0], _c : _c + _gl.shape[1]] |= _gl
    st_g, st_d = JB.encode_jbig2_text(
        st_glyphs, st_places, 30, 24, split_globals=True
    )
    st_png = C.encode_png(
        np.where(st_page, 0, 255).astype(np.uint8)[:, :, None]
    )
    g_xi = [["xi: a JBIG2 symbol/text page"]]
    pdf_rows += [
        (11, encode_pdf(g_iota, images=[(jpg, 24, 24, "jpeg")])),
        (12, encode_pdf(g_kappa, images=[(jpg, 24, 24, "jpeg")],
                        compress=True, objstm=True, encrypt_r=4)),
        (13, encode_pdf(g_lam, images=[(fax, 32, 20, "ccitt-g4")])),
        (14, encode_pdf(g_mu, images=[(b"\x00jp2-junk", 8, 8, "jpx")])),
        (15, encode_pdf(g_nu, images=[(jb_stream, 40, 24, "jbig2")])),
        (16, encode_pdf(g_xi, images=[((st_d, st_g), 30, 24, "jbig2")])),
    ]
    jpg_md5 = _hl.md5(jpg).hexdigest()
    truth_rows = [
        (1, expected(a), 2, 0, None, None),
        (2, expected(b), 1, 0, None, None),
        (3, expected(c), 3, 0, None, None),
        (4, expected(d), 2, 0, None, None),
        (5, expected(e), 1, 0, None, None),
        (6, None, None, 0, None, None),
        (7, expected(f_enc), 2, 0, None, None),
        (8, None, None, 0, None, None),
        (9, "eta: AESV2 encrypted", 1, 0, None, None),
        (10, "theta: AESV3 + CID", 1, 0, None, None),
        # 11/12: the SAME jpeg bytes through plain and ObjStm+AESV2
        # layouts — the byte-exact DCT pass-through contract
        (11, expected(g_iota), 1, 1, "image/jpeg", jpg_md5),
        (12, expected(g_kappa), 1, 1, "image/jpeg", jpg_md5),
        (13, expected(g_lam), 1, 1, "image/png",
         _hl.md5(plate_png).hexdigest()),
        (14, expected(g_mu), 1, 1, None, None),  # JPX: per-image NULL
        # 15: JBIG2 generic plate -> PNG of the construction pixels
        # (the G4-plate precedent, round 12)
        (15, expected(g_nu), 1, 1, "image/png",
         _hl.md5(jb_png).hexdigest()),
        # 16: JBIG2 symbol/text page with /JBIG2Globals -> PNG of the
        # numpy-composed construction glyphs (round 12, second half)
        (16, expected(g_xi), 1, 1, "image/png",
         _hl.md5(st_png).hexdigest()),
    ]
    return pdf_rows, truth_rows


def gen_media_curate() -> tuple[list[tuple], list[tuple]]:
    """(media_rows, truth_rows) for the media-curation fate partition
    (n28, round 10).

    media_rows: (media_id, kind, content) — a mixed image + audio set
    where every row is CONSTRUCTED to hit exactly one curate_media
    fate under the gates (image: min_pixels=100, max_hamming=3; audio:
    min_duration_ms=1000, max_silence_ratio=0.8, min_lufs=-30,
    max_hamming=3). truth_rows: (media_id, kind, fate) derived from
    the construction parameters, never by running the pipeline:

    * exact duplicates are byte-identical copies (min-id survives);
    * image perceptual duplicates are lossless RE-ENCODINGS of the
      SAME pixels (BMP/TIFF/lossless-WebP — identical decoded rasters
      give identical dHash, hamming 0 by construction; the greedy rule
      drops the greater id of every pair, so the base PNG survives);
    * the audio perceptual duplicate is the FLAC of the same PCM (the
      pinned WAV≡FLAC fingerprint identity);
    * the two kept audio rows have strictly DECAYING vs strictly
      RISING amplitude envelopes — the envelope fingerprint's bits are
      all-zero vs all-one by monotonicity, hamming 64, never a pair;
    * silence / loudness gates use inputs decided by arithmetic, far
      from the thresholds (90% zero frames vs the 0.8 ratio; a
      ~-51 dBFS tone vs the -30 LUFS floor);
    * the MPEG-1 Layer III rows are REAL decodes since round 11
      (``mp3_l3``): the zeroed-granule dummy stream decodes as pure
      silence (gate:max_silence_ratio — the r10 quarantine row
      flipped, as VERDICT r10 item 2 prescribed), and a quiet
      encoder-twin tone (~-51 dBFS vs the -30 LUFS floor, 0.75 dB max
      quantization error — decided by arithmetic) hits gate:min_lufs;
    * the MPEG-2 (LSF) Layer III row decodes for REAL since round 12
      (the 13818-3 LSF side-info/scalefactor layout shipped in
      ``mp3_l3``): the zeroed-granule LSF stream is pure silence, so
      its r11 quarantine truth flipped to gate:max_silence_ratio —
      the same flip row 18 took in r11 for MPEG-1.

    A generation-time assert checks the base and the unrelated image
    sit beyond pairing distance under an INLINE numpy dHash mirror
    (independent of multimodal.py), so a freak collision would fail
    fixture generation, not silently flip a truth row.
    """
    import numpy as np

    from pg2kinesis_spark.functions import codecs as C
    from pg2kinesis_spark.functions import vp8l as V

    rows: list[tuple] = []
    truth: list[tuple] = []

    def add(mid: int, kind: str, content: bytes, fate: str) -> None:
        rows.append((mid, kind, content))
        truth.append((mid, kind, fate))

    def inline_dhash(img: np.ndarray) -> int:
        px = img.astype("float64")
        gray = (
            0.299 * px[:, :, 0] + 0.587 * px[:, :, 1] + 0.114 * px[:, :, 2]
            if px.shape[2] >= 3
            else px[:, :, 0]
        )
        ys = (np.arange(8) * gray.shape[0]) // 8
        xs = (np.arange(9) * gray.shape[1]) // 9
        small = gray[np.ix_(ys, xs)]
        bits = (small[:, 1:] > small[:, :-1]).flatten()
        return sum(1 << i for i, b in enumerate(bits) if b)

    rng = np.random.default_rng(46)

    # --- images (gates: min_pixels=100, max_hamming=3) ----------------
    base = rng.integers(0, 256, (24, 24, 3), dtype=np.uint8)
    other = rng.integers(0, 256, (24, 24, 3), dtype=np.uint8)
    d = bin(inline_dhash(base) ^ inline_dhash(other)).count("1")
    assert d > 3, f"fixture collision: unrelated images at hamming {d}"
    png = C.encode_png(base)
    add(1, "image", png, "kept")
    add(2, "image", png, "duplicate:exact")  # byte-identical, id > 1
    add(3, "image", C.encode_bmp(base), "duplicate:perceptual")
    add(4, "image", C.encode_tiff(base, compression=5), "duplicate:perceptual")
    add(5, "image", V.encode_webp_lossless(base), "duplicate:perceptual")
    add(6, "image", C.encode_png(other), "kept")
    add(7, "image", C.encode_png(other[:6, :6]), "gate:min_pixels")  # 36 px
    add(8, "image", b"not an image at all", "quarantine")

    # --- audio (gates: min_duration_ms=1000, max_silence_ratio=0.8,
    #            min_lufs=-30, max_hamming=3) --------------------------
    rate = 8000
    t = np.arange(2 * rate)
    tone = np.sin(2 * np.pi * 440 * t / rate)

    def pcm(x: np.ndarray) -> np.ndarray:
        return np.round(x * 32767).astype(np.int16).reshape(-1, 1)

    falling = pcm(tone * np.linspace(0.9, 0.1, len(t)))
    rising = pcm(tone * np.linspace(0.1, 0.9, len(t)))
    wav_fall = C.encode_wav(falling, rate)
    add(11, "audio", wav_fall, "kept")
    add(12, "audio", wav_fall, "duplicate:exact")
    add(13, "audio", C.encode_flac(falling, rate), "duplicate:perceptual")
    add(14, "audio", C.encode_wav(rising, rate), "kept")
    add(15, "audio", C.encode_wav(pcm(tone[: int(0.3 * rate)] * 0.5), rate),
        "gate:min_duration_ms")  # 300 ms < 1000
    mostly_silent = np.zeros(2 * rate)
    mostly_silent[: int(0.2 * rate)] = tone[: int(0.2 * rate)] * 0.5
    add(16, "audio", C.encode_wav(pcm(mostly_silent), rate),
        "gate:max_silence_ratio")  # 18/20 silent frames = 0.9 > 0.8
    add(17, "audio", C.encode_wav(pcm(tone * 0.004), rate),
        "gate:min_lufs")  # ~-51 LUFS, audible (> -60 dBFS frames)
    add(18, "audio", C.encode_mp3_frames(80, kbps=128, rate=44100),
        "gate:max_silence_ratio")  # zeroed L3 granules decode as silence
    add(19, "audio", b"junk audio bytes", "quarantine")
    from pg2kinesis_spark.functions.mp3_l3 import encode_mp3_layer3

    t44 = np.arange(2 * 44100)
    quiet = 0.004 * np.sin(2 * np.pi * 440 * t44 / 44100)
    add(20, "audio", encode_mp3_layer3(quiet, 44100),
        "gate:min_lufs")  # ~-51 LUFS real L3 decode, audible frames
    add(21, "audio",
        C.encode_mp3_frames(80, kbps=64, rate=22050, mpeg2=True, layer=3),
        "gate:max_silence_ratio")  # zeroed LSF granules decode (r12)
    return rows, truth


def gen_av_match() -> tuple[list[tuple], list[tuple]]:
    """(media_rows, truth_rows) for the landmark-match + scene-cut
    driver row (n29, round 11 — VERDICT r10 item 5: the last
    pytest-only round-9 compositions reach the correctness board).

    media_rows: (media_id, kind, content) with kind 'audio'/'video'.
    truth_rows: (part, a, b, c) — the construction-side answer the
    oracle reads back, never produced by running the operators:

    * ``part='match'`` (a=id1, b=id2, c=dt_frames): audio landmark
      pairs with their offset. dt is PLANTED — the padded copy leads
      the base by exactly pad/hop = 4 frames (hop 512 at 8 kHz), the
      half-volume FLAC transcode is aligned (dt 0; the constellation
      is amplitude-invariant by construction). The unrelated melody
      and the garbage row must produce NO pair — absence is part of
      the hash. Votes are NOT in the truth (they depend on the peak
      extractor); a generation-time assert checks the consensus
      offset of every planted pair equals the planted dt with >= 8
      votes, failing generation loudly rather than flipping truth.
    * ``part='cut'`` (a=media_id, b=frame_idx of the NEW scene): hard
      cuts planted as constant-luma scene blocks (within-scene score
      exactly 0, boundary |Δluma|/255 ≈ 0.67 vs the 0.3 threshold —
      decided by arithmetic, far from the threshold).
    * ``part='scored'`` (a=media_id, b=n_transitions, c=n_cuts): every
      decodable clip scores exactly n_frames-1 transitions (stride 1),
      pinning the zero-cut clip's presence too.
    * ``part='quarantine'`` (a=media_id): the undecodable clip's NULL
      row.

    Three video containers cross the shared front door: Y4M, APNG,
    animated lossless WebP (the round-10 VP8L tier).
    """
    import numpy as np

    from pg2kinesis_spark.functions import audio_analysis as aa
    from pg2kinesis_spark.functions import codecs as C

    rows: list[tuple] = []
    truth: list[tuple] = []

    # --- audio: planted-offset landmark pairs -------------------------
    rate, hop = 8000, 512

    def melody(seed: int, seconds: float = 3.0) -> np.ndarray:
        rng = np.random.default_rng(seed)
        seg = int(0.25 * rate)
        notes = rng.integers(300, 3200, int(seconds / 0.25))
        t = np.arange(seg)
        return np.concatenate(
            [0.5 * np.sin(2 * np.pi * f * t / rate) for f in notes]
        )

    def pcm(x: np.ndarray) -> np.ndarray:
        return np.round(x * 32767).astype(np.int16).reshape(-1, 1)

    base = melody(7)
    pad = 4  # frames (hops) the copy is delayed by
    shifted = np.concatenate([np.zeros(pad * hop), base])
    rows.append((21, "audio", C.encode_wav(pcm(base), rate)))
    rows.append((22, "audio", C.encode_wav(pcm(shifted), rate)))
    rows.append((23, "audio", C.encode_flac(pcm(0.5 * base), rate)))
    rows.append((24, "audio", C.encode_wav(pcm(melody(8)), rate)))
    rows.append((25, "audio", b"not audio at all"))
    # dt convention (multimodal.audio_landmark_match): t1(id1) - t1(id2)
    truth.append(("match", 21, 22, -pad))
    truth.append(("match", 21, 23, 0))
    truth.append(("match", 22, 23, pad))

    # generation-time sanity: the planted offsets must be recoverable
    # with a clear consensus (>= 8 votes), else FAIL generation
    from collections import Counter

    lms = {
        mid: aa.landmark_hashes(aa.spectral_peaks(x, rate))
        for mid, x in ((21, base), (22, shifted), (23, 0.5 * base))
    }
    for _, i1, i2, want_dt in [t for t in truth if t[0] == "match"]:
        by_hash: dict[int, list[int]] = {}
        for h, t1 in lms[i2]:
            by_hash.setdefault(h, []).append(t1)
        votes: Counter = Counter()
        for h, t1 in lms[i1]:
            for t0 in by_hash.get(h, ()):
                votes[t1 - t0] += 1
        dt, n = votes.most_common(1)[0]
        assert (dt, n >= 8) == (want_dt, True), (
            f"fixture pair ({i1},{i2}): consensus {dt} x{n}, "
            f"planted {want_dt}"
        )

    # --- video: planted scene cuts across three containers ------------
    def flat(v: int, n: int) -> list[np.ndarray]:
        return [np.full((24, 32, 3), v, dtype=np.uint8)] * n

    y4m = C.encode_y4m(flat(40, 6) + flat(210, 6))  # cut at frame 6
    apng = C.encode_apng(flat(10, 4) + flat(128, 4) + flat(245, 4))
    webp = C.encode_webp_anim(flat(100, 5), durations_ms=[40] * 5)
    rows.append((31, "video", y4m))
    rows.append((32, "video", apng))
    rows.append((33, "video", webp))
    rows.append((34, "video", b"junk video bytes"))
    truth.append(("cut", 31, 6, None))
    truth.append(("cut", 32, 4, None))
    truth.append(("cut", 32, 8, None))
    truth.append(("scored", 31, 11, 1))
    truth.append(("scored", 32, 11, 2))
    truth.append(("scored", 33, 4, 0))
    truth.append(("quarantine", 34, None, None))
    return rows, truth
