"""Round-11 oracle row: landmark audio matching + scene cuts on the
driver board.

``audio_landmark_match`` and ``video_scene_cuts`` were pytest-only
(VERDICT r10 "What's missing" item 4); n29 puts both on the
cross-engine CORRECTNESS ledger. The independence contract is the
committed construction-side truth table
(``fixtures/av_match_truth.parquet``, written by
``tools/gen_fixtures.py`` from ``fixtures.gen_av_match``): the audio
pairs' offsets are PLANTED (a copy padded by exactly 4 hop-frames, an
aligned half-volume FLAC transcode), the scene cuts are planted as
constant-luma blocks whose boundary scores are decided by arithmetic
far from the threshold, and absence (the unrelated melody, the
zero-cut clip) is part of the hash. The oracle never runs either
operator.

Scale shape under this row: landmarks shuffle as (hash, id, t1) longs
with a hot-hash cap (never audio bytes, never all-pairs); scene cuts
are a bounded per-clip Arrow kernel (map-only).

The reference (/root/reference/pg2kinesis) has no analogue — this is
the media-retrieval surface of the training-data tier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pg2kinesis_spark.plans.r6_queries import _f, _fx


def n29_av_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tagged union over the av_match fixture set:

    * part='match' — audio landmark pairs (a=id1, b=id2, c=dt_frames);
      votes are excluded (peak-extractor-dependent), presence + offset
      are the construction-side claim;
    * part='cut' — scene-cut transitions (a=media_id, b=frame_idx of
      the new scene);
    * part='scored' — per decodable clip (a=media_id, b=n_transitions,
      c=n_cuts), pinning the zero-cut clip and full coverage;
    * part='quarantine' — the undecodable clip's NULL row.
    """
    from pg2kinesis_spark.functions.multimodal import (
        audio_landmark_match,
        video_scene_cuts,
    )

    raw = _fx(spark, "av_match")

    def as_media(kind: str) -> DataFrame:
        return raw.filter(F.col("kind") == kind).select(
            "media_id",
            "content",
            F.struct(
                F.lit(f"{kind}/fixture").alias("mime"),
                F.length("content").cast("long").alias("bytes_hint"),
                F.concat(F.lit("fx://"), F.col("media_id")).alias("source_uri"),
            ).alias("meta"),
        )

    nil = F.lit(None).cast("long")
    matches = audio_landmark_match(as_media("audio"), min_votes=8).select(
        F.lit("match").alias("part"),
        F.col("media_id1").alias("a"),
        F.col("media_id2").alias("b"),
        F.col("dt_frames").cast("long").alias("c"),
    )
    cuts = video_scene_cuts(as_media("video"))
    # transitions feed three projections: materialize the kernel once
    cuts = cuts.localCheckpoint(eager=False)
    cut_rows = cuts.filter(F.col("is_cut")).select(
        F.lit("cut").alias("part"),
        F.col("media_id").alias("a"),
        F.col("frame_idx").cast("long").alias("b"),
        nil.alias("c"),
    )
    scored = (
        cuts.filter(F.col("frame_idx").isNotNull())
        .groupBy("media_id")
        .agg(
            F.count("*").alias("n_trans"),
            F.sum(F.col("is_cut").cast("long")).alias("n_cuts"),
        )
        .select(
            F.lit("scored").alias("part"),
            F.col("media_id").alias("a"),
            F.col("n_trans").cast("long").alias("b"),
            F.col("n_cuts").cast("long").alias("c"),
        )
    )
    quarantined = cuts.filter(F.col("decode_error").isNotNull()).select(
        F.lit("quarantine").alias("part"),
        F.col("media_id").alias("a"),
        nil.alias("b"),
        nil.alias("c"),
    )
    return (
        matches.unionByName(cut_rows)
        .unionByName(scored)
        .unionByName(quarantined)
        .orderBy("part", "a", "b")
    )


R11_QUERIES = {"n29_av_match": n29_av_match}

R11_ORACLE_SQL = {
    "n29_av_match": f"""
        SELECT part, a, b, c
        FROM {_f('av_match_truth')}
        ORDER BY part, a, b
    """,
}
