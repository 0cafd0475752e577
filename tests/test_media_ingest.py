"""Streaming media ingest: construction-side fate partitions per
batch, cross-batch dedup through the parquet indexes, and the
crash-replay idempotence contract (a replayed batch_id excludes its
own partitions, recomputes the same accepted set, and overwrites)."""

from __future__ import annotations

import numpy as np
import pytest

from pg2kinesis_spark.functions import codecs as C
from pg2kinesis_spark.functions.multimodal import MEDIA_SCHEMA
from pg2kinesis_spark.streaming.media_ingest import MediaIngest


def _img(seed, h=24, w=24):
    rng = np.random.default_rng(seed)
    return C.resize_nearest(rng.integers(30, 226, (3, 4, 3), dtype=np.uint8), w, h)


def _df(spark, rows):
    return spark.createDataFrame(
        [(i, bytearray(c), ("x/x", len(c), f"m{i}")) for i, c in rows],
        MEDIA_SCHEMA,
    )


def _accepted_ids(spark, out):
    return sorted(
        r["media_id"]
        for r in spark.read.parquet(f"{out}/accepted").collect()
    )


def test_batches_dedup_against_accepted_state(spark, tmp_path):
    out = str(tmp_path / "media")
    ing = MediaIngest(out, kind="image", min_pixels=100)
    a, c = _img(1), _img(9)  # seeds 1/9: far apart at dHash level

    batch1 = [
        (0, C.encode_png(a)),
        (1, C.encode_png(a)),          # exact dup within the batch
        (2, C.encode_bmp(a)),          # same pixels: perceptual dup
        (3, C.encode_png(c)),          # distinct: kept
        (4, C.encode_png(_img(2, 4, 4))),  # 16 px: gated
        (5, b"garbage"),               # quarantined at the gate
    ]
    ing.process_batch(_df(spark, batch1), 1)
    assert _accepted_ids(spark, out) == [0, 3]

    batch2 = [
        (10, C.encode_png(a)),         # exact vs the hash INDEX
        (11, C.encode_bmp(a, top_down=True)),  # perceptual vs the sig INDEX
        (12, C.encode_png(_img(20))),  # new: kept
    ]
    ing.process_batch(_df(spark, batch2), 2)
    assert _accepted_ids(spark, out) == [0, 3, 12]
    # both indexes accrued exactly the accepted rows
    assert spark.read.parquet(f"{out}/hash_index").count() == 3
    assert spark.read.parquet(f"{out}/sig_index").count() == 3


def test_replay_is_idempotent(spark, tmp_path):
    out = str(tmp_path / "media")
    ing = MediaIngest(out, kind="image")
    a = _img(3)
    ing.process_batch(_df(spark, [(0, C.encode_png(a))]), 1)
    b2 = [(10, C.encode_png(_img(4))), (11, C.encode_png(a))]  # 11 dups idx
    ing.process_batch(_df(spark, b2), 2)
    first = _accepted_ids(spark, out)
    assert first == [0, 10]
    # crash replay: the SAME batch_id runs again — identical result,
    # no duplicated partitions, indexes unchanged
    ing.process_batch(_df(spark, b2), 2)
    assert _accepted_ids(spark, out) == first
    assert spark.read.parquet(f"{out}/hash_index").count() == 2
    assert spark.read.parquet(f"{out}/sig_index").count() == 2


def test_audio_kind_and_validation(spark, tmp_path):
    out = str(tmp_path / "audio")
    ing = MediaIngest(out, kind="audio", min_duration_ms=300, max_hamming=0)
    rate = 8000
    t = np.arange(2 * rate)
    tone = np.round(
        0.5 * np.sin(2 * np.pi * 440 * t / rate) * 32767
    ).astype(np.int16).reshape(-1, 1)
    rng = np.random.default_rng(6)
    other = np.round(
        (0.4 * np.sin(2 * np.pi * 1790 * t / rate)
         + 0.2 * np.sin(2 * np.pi * 333 * t / rate)) * 32767 / 2
    ).astype(np.int16).reshape(-1, 1)
    ing.process_batch(
        _df(spark, [(0, C.encode_wav(tone, rate)), (1, C.encode_wav(tone[:800], rate))]),
        1,
    )
    assert _accepted_ids(spark, out) == [0]  # short clip gated
    # batch 2: the FLAC transcode fingerprints identically -> dropped
    ing.process_batch(
        _df(spark, [(10, C.encode_flac(tone, rate)), (11, C.encode_wav(other, rate))]),
        2,
    )
    assert _accepted_ids(spark, out) == [0, 11]
    with pytest.raises(ValueError, match="kind"):
        MediaIngest(out, kind="video")


def test_upgrade_over_pre_r10_state_without_sig_column(spark, tmp_path):
    """ADVICE r10: pre-round-10 accepted partitions lack the `sig`
    column. The post-write re-read must not fail or drop the column
    when old footers are sampled — mergeSchema surfaces old rows with
    sig = NULL and the new batch's index rebuild proceeds."""
    import shutil

    out = str(tmp_path / "media")
    ing = MediaIngest(out, kind="image")
    a = _img(3)
    ing.process_batch(_df(spark, [(0, C.encode_png(a))]), 1)
    # rewrite batch 1's accepted partition WITHOUT the sig column,
    # exactly what a pre-round-10 deployment left on disk
    part = f"{out}/accepted/batch_id=1"
    old = spark.read.parquet(part).drop("sig").collect()
    old_df = spark.createDataFrame(
        old, spark.read.parquet(part).drop("sig").schema
    )
    shutil.rmtree(part)
    old_df.write.parquet(part)
    # the upgraded code appends a new batch over the old state: the
    # re-read must succeed, dedup against the indexes, and keep going
    b2 = [(10, C.encode_png(a)), (11, C.encode_png(_img(4)))]
    ing.process_batch(_df(spark, b2), 2)
    assert _accepted_ids(spark, out) == [0, 11]
    merged = (
        spark.read.option("mergeSchema", "true").parquet(f"{out}/accepted")
    )
    assert "sig" in merged.columns
    rows = {r["media_id"]: r["sig"] for r in merged.collect()}
    assert rows[0] is None and rows[11] is not None


def test_compaction_folds_and_dedup_still_holds(spark, tmp_path):
    out = str(tmp_path / "m")
    ing = MediaIngest(out, kind="image")
    imgs = [_img(s) for s in (30, 40, 50)]
    for b, im in enumerate(imgs, start=1):
        ing.process_batch(_df(spark, [(b * 100, C.encode_png(im))]), b)
    from pg2kinesis_spark.streaming.media_ingest import compact_media_indexes

    summary = compact_media_indexes(spark, out, keep_last_batches=1)
    assert summary["hash_index"]["folded"] == [1, 2]
    import os

    parts = sorted(os.listdir(f"{out}/hash_index"))
    assert "batch_id=-1" in parts and "batch_id=1" not in parts
    # the folded index still dedups: batch 4 replays batch 1's image
    # (as a BMP re-layout, so BOTH indexes must answer)
    ing.process_batch(
        _df(spark, [(400, C.encode_bmp(imgs[0])), (401, C.encode_png(_img(60)))]), 4
    )
    assert _accepted_ids(spark, out) == [100, 200, 300, 401]
