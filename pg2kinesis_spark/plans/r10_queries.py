"""Round-10 oracle row: the media-curation tier on the driver board.

``curate_media`` / the MediaIngest dedup core were pytest-only
(VERDICT r9 "What's missing" item 5); n28 puts the full fate
partition on the cross-engine CORRECTNESS ledger. The independence
contract is the committed construction-side truth table
(``fixtures/media_curate_truth.parquet``, written by
``tools/gen_fixtures.py`` from ``fixtures.gen_media_curate``): every
fixture row is BUILT to hit exactly one fate — kept, a named gate,
an exact or perceptual duplicate, or quarantine — and the truth
records that construction intent (byte-copies dedup exactly; lossless
re-encodings of one raster share a dHash; the WAV and its FLAC share
a fingerprint; monotone amplitude envelopes give all-zero vs all-one
fingerprint bits; silence/LUFS gate inputs are decided by arithmetic
far from the thresholds; the MP3 row pins the lossy-content-gate
honest refusal). The oracle never runs the pipeline.

The round-10 one-decode image kernel (``image_features_sig``) is the
code path under the image half of this row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pg2kinesis_spark.plans.r6_queries import FIXTURES_DIR, _f, _fx


def n28_media_curate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full curate_media fate partition over the mixed fixture set:
    one row per input media_id with its fate — 'kept', the gate or
    dedup rule that removed it, or 'quarantine' for decode refusals
    (reasons outside the gate:/duplicate: namespaces)."""
    from pg2kinesis_spark.functions.multimodal import MEDIA_SCHEMA, curate_media

    raw = _fx(spark, "media_curate")
    parts = []
    for kind, gates in (
        ("image", dict(min_pixels=100)),
        (
            "audio",
            dict(min_duration_ms=1000, max_silence_ratio=0.8, min_lufs=-30),
        ),
    ):
        sub = raw.filter(F.col("kind") == kind).select(
            "media_id",
            "content",
            F.struct(
                F.lit(f"{kind}/fixture").alias("mime"),
                F.length("content").cast("long").alias("bytes_hint"),
                F.concat(F.lit("fx://"), F.col("media_id")).alias("source_uri"),
            ).alias("meta"),
        )
        clean, rejected = curate_media(sub, kind=kind, max_hamming=3, **gates)
        parts.append(
            clean.select(
                "media_id", F.lit(kind).alias("kind"), F.lit("kept").alias("fate")
            )
        )
        parts.append(
            rejected.select(
                "media_id",
                F.lit(kind).alias("kind"),
                F.when(
                    F.col("reason").startswith("gate:")
                    | F.col("reason").startswith("duplicate:"),
                    F.col("reason"),
                )
                .otherwise(F.lit("quarantine"))
                .alias("fate"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("media_id")


R10_QUERIES = {"n28_media_curate": n28_media_curate}

R10_ORACLE_SQL = {
    "n28_media_curate": f"""
        SELECT media_id, kind, fate
        FROM {_f('media_curate_truth')}
        ORDER BY media_id
    """,
}
