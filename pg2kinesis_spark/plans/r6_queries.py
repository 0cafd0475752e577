"""Round-6 oracle rows: the media front door on the driver's board.

The round-5 archive/container tiers were pytest-only (VERDICT r5 task
2); these rows put them on the cross-engine CORRECTNESS ledger. The
independence contract is construction-side truth tables (committed
parquet next to the fixture bytes, both written by
``tools/gen_fixtures.py`` from ``fixtures.gen_media_*``): the truth
records what was PUT IN (member order, encoder parameters, expected
formula outputs), and the oracle SQL re-derives the operator's answer
from that record — doc ids and the text-suffix rule are recomputed in
SQL, never by the walk code under test.

* n24: ZIP/TAR → ``archive_to_corpus``. Covers deflate + store, nested
  tar paths, a legally-duplicated ZIP member name (ordinal-keyed), a
  binary member the suffix rule must drop, unicode text, and a corrupt
  archive that must quarantine WHOLE (it simply has no truth rows —
  presence in the output would hash-mismatch).
* n27: PDFs across all five supported layouts (plain/Flate/ObjStm/
  CID via ToUnicode/CID+ObjStm) → ``extract_pdf_text``; expected text
  is the construction-side page/line convention, and the two honest
  refusals (no-CMap Type0, encrypted) are (NULL, NULL) truth rows —
  the quarantine kernel must yield exactly that.
* n25: both container walks in one tagged wide-schema slot.
  Audio — WAV/FLAC/Ogg(Opus+Vorbis)/MP3(CBR+VBR+Xing) →
  ``extract_audio_metadata``; expected values are encoder-parameter
  arithmetic (duration = samples/rate, bitrate = bytes·8/seconds,
  Xing frames excluded from the mean).
  Video — MP4(v0 + v1/largesize)/WebM/MJPEG-AVI/animated-GIF →
  ``extract_video_features``; WebM frame count/fps are honestly NULL
  (no Cluster walk) and the truth table says so.

The reference (/root/reference/pg2kinesis) has no analogue — this is
the training-data front-door surface, not CDC parity.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

FIXTURES_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "fixtures",
)


def _fx(spark: SparkSession, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(FIXTURES_DIR, f"{name}.parquet"))


def _f(name: str) -> str:
    return f"read_parquet('{FIXTURES_DIR}/{name}.parquet')"


def n24_archive_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ZIP/TAR front door: archives → per-member text docs, hash-keyed
    by the cross-engine md5-60 of path:ordinal:member."""
    from pg2kinesis_spark.functions.archives import archive_to_corpus

    out = archive_to_corpus(_fx(spark, "media_archives"))
    return out.select(
        "doc_id", "path", "member", F.md5("text").alias("text_md5")
    ).orderBy("doc_id")


def n25_container_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio, video AND image container walks over every supported
    format, as one tagged wide-schema union (one driver slot covers
    all three; columns the other modalities lack are NULL). Round 8
    widened the audio side with the tag walk (title/artist across
    ID3v2, VorbisComment, RIFF INFO, AIFF NAME/AUTH) and the lossless
    PCM identity md5; round 9 adds the IMAGE tier (VERDICT r8 task 5):
    extract_image_features over the TIFF matrix (none/LZW+predictor/
    G4 fax/tiled deflate/planar-2 PackBits/16-bit) plus the PNG twin
    of the same pixels — width/height/channels/mean-luma truth is
    inline-numpy arithmetic on the construction pixels, and the
    truncated fixture pins the quarantine row (all features NULL).
    Late round 9 adds a 12-bit SOF1 JPEG whose constant-per-8x8-block
    even samples decode EXACTLY at quality 100 (DC-only; quant step 16
    divides 8*even), so even the lossy deep-scan format carries
    bit-identical construction truth, plus the BMP twin of the RGB
    pixels and an ICO favicon (DIB entry whose AND mask becomes the
    alpha channel — n_channels 4, luma over the RGB planes).
    Tag/pcm/feature kernels run errors='quarantine': untagged,
    compressed-only or corrupt fixtures yield NULLs, which the truth
    tables record explicitly."""
    from pg2kinesis_spark.functions.multimodal import (
        extract_audio_metadata,
        extract_audio_pcm,
        extract_audio_tags,
        extract_image_features,
        extract_video_features,
    )

    media = _fx(spark, "media_containers")
    audio_media = media.filter(F.col("kind") == "audio").select(
        "media_id", "content"
    )
    tags = extract_audio_tags(audio_media).select("media_id", "title", "artist")
    pcm = extract_audio_pcm(audio_media).select("media_id", "pcm_md5")
    audio = (
        extract_audio_metadata(audio_media, errors="raise")
        .join(tags, "media_id", "left")
        .join(pcm, "media_id", "left")
        .select(
            "media_id",
            F.lit("audio").alias("kind"),
            "container", "sample_rate", "n_channels", "bitrate_kbps", "vbr",
            "title", "artist", "pcm_md5",
            F.lit(None).cast("int").alias("n_frames"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("double").alias("fps"),
            F.lit(None).cast("double").alias("mean_luma"),
            "duration_ms",
        )
    )
    video = extract_video_features(
        media.filter(F.col("kind") == "video").select("media_id", "content"),
        errors="raise",
    ).select(
        "media_id",
        F.lit("video").alias("kind"),
        F.lit(None).cast("string").alias("container"),
        F.lit(None).cast("int").alias("sample_rate"),
        F.lit(None).cast("int").alias("n_channels"),
        F.lit(None).cast("double").alias("bitrate_kbps"),
        F.lit(None).cast("boolean").alias("vbr"),
        F.lit(None).cast("string").alias("title"),
        F.lit(None).cast("string").alias("artist"),
        F.lit(None).cast("string").alias("pcm_md5"),
        "n_frames", "width", "height", "fps",
        F.lit(None).cast("double").alias("mean_luma"),
        "duration_ms",
    )
    image = extract_image_features(
        media.filter(F.col("kind") == "image").select("media_id", "content"),
    ).select(
        "media_id",
        F.lit("image").alias("kind"),
        F.lit(None).cast("string").alias("container"),
        F.lit(None).cast("int").alias("sample_rate"),
        "n_channels",
        F.lit(None).cast("double").alias("bitrate_kbps"),
        F.lit(None).cast("boolean").alias("vbr"),
        F.lit(None).cast("string").alias("title"),
        F.lit(None).cast("string").alias("artist"),
        F.lit(None).cast("string").alias("pcm_md5"),
        F.lit(None).cast("int").alias("n_frames"),
        "width", "height",
        F.lit(None).cast("double").alias("fps"),
        "mean_luma",
        F.lit(None).cast("double").alias("duration_ms"),
    )
    return audio.unionByName(video).unionByName(image).orderBy("media_id")


def n27_pdf_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PDF text tier across all five supported layouts (plain, Flate,
    ObjStm, CID/ToUnicode, CID+ObjStm) plus the two honest refusals
    (no-CMap Type0, encrypted), whose quarantined rows carry NULL text
    and NULL n_pages — exactly what the truth table records for them.
    Round 9 widens the slot with the pdf_images tier (VERDICT r8 task
    5): per-document image count + first image's mime and byte md5 —
    the same /DCTDecode jpeg through plain and ObjStm+AESV2 layouts
    must hash identically (byte-exact pass-through), the G4 plate
    re-wraps as the PNG of the construction pixels (the shared CCITT
    decoder), and the JPX plate quarantines per image (counted, NULL
    content)."""
    from pg2kinesis_spark.functions.multimodal import extract_pdf_images
    from pg2kinesis_spark.functions.pdf import extract_pdf_text

    media = _fx(spark, "media_pdfs").select("media_id", "content")
    text = extract_pdf_text(media)
    imgs = extract_pdf_images(media).groupBy("media_id").agg(
        F.count("img_idx").cast("int").alias("n_images"),
        F.min(F.when(F.col("img_idx") == 0, F.col("mime"))).alias("img_mime"),
        F.min(F.when(F.col("img_idx") == 0, F.md5("content"))).alias("img_md5"),
    )
    return (
        text.join(imgs, "media_id", "left")
        .select(
            "media_id", F.md5("text").alias("text_md5"), "n_pages",
            F.coalesce("n_images", F.lit(0)).alias("n_images"),
            "img_mime", "img_md5",
        )
        .orderBy("media_id")
    )


R6_QUERIES = {
    "n24_archive_text": n24_archive_text,
    "n25_container_meta": n25_container_meta,
    "n27_pdf_text": n27_pdf_text,
}

# Spark-side doc_id: cast(conv(substr(md5(k),1,15),16,10) as bigint);
# DuckDB twin below. The suffix rule is re-applied in SQL from the
# truth table's member names (binary members carry NULL text anyway).
_TEXT_SUFFIX_SQL = (
    "(lower(member) LIKE '%.txt' OR lower(member) LIKE '%.md' OR "
    "lower(member) LIKE '%.text' OR lower(member) LIKE '%.json' OR "
    "lower(member) LIKE '%.jsonl' OR lower(member) LIKE '%.csv' OR "
    "lower(member) LIKE '%.html' OR lower(member) LIKE '%.htm')"
)

R6_ORACLE_SQL = {
    "n27_pdf_text": f"""
        SELECT media_id, md5(text) AS text_md5, n_pages,
               n_images, img_mime, img_md5
        FROM {_f('media_pdfs_truth')}
        ORDER BY media_id
    """,
    "n24_archive_text": f"""
        SELECT ('0x' || substr(md5(path || ':' || CAST(ordinal AS VARCHAR)
                 || ':' || member), 1, 15))::BIGINT AS doc_id,
               path, member, md5(text) AS text_md5
        FROM {_f('media_archives_truth')}
        WHERE text IS NOT NULL AND {_TEXT_SUFFIX_SQL}
        ORDER BY doc_id
    """,
    "n25_container_meta": f"""
        SELECT media_id, 'audio' AS kind, container, sample_rate,
               n_channels, bitrate_kbps, vbr,
               title, artist, pcm_md5,
               CAST(NULL AS INTEGER) AS n_frames,
               CAST(NULL AS INTEGER) AS width,
               CAST(NULL AS INTEGER) AS height,
               CAST(NULL AS DOUBLE) AS fps,
               CAST(NULL AS DOUBLE) AS mean_luma,
               duration_ms
        FROM {_f('media_containers_audio_truth')}
        UNION ALL
        SELECT media_id, 'video' AS kind,
               CAST(NULL AS VARCHAR) AS container,
               CAST(NULL AS INTEGER) AS sample_rate,
               CAST(NULL AS INTEGER) AS n_channels,
               CAST(NULL AS DOUBLE) AS bitrate_kbps,
               CAST(NULL AS BOOLEAN) AS vbr,
               CAST(NULL AS VARCHAR) AS title,
               CAST(NULL AS VARCHAR) AS artist,
               CAST(NULL AS VARCHAR) AS pcm_md5,
               n_frames, width, height, fps,
               CAST(NULL AS DOUBLE) AS mean_luma,
               duration_ms
        FROM {_f('media_containers_video_truth')}
        UNION ALL
        SELECT media_id, 'image' AS kind,
               CAST(NULL AS VARCHAR) AS container,
               CAST(NULL AS INTEGER) AS sample_rate,
               n_channels,
               CAST(NULL AS DOUBLE) AS bitrate_kbps,
               CAST(NULL AS BOOLEAN) AS vbr,
               CAST(NULL AS VARCHAR) AS title,
               CAST(NULL AS VARCHAR) AS artist,
               CAST(NULL AS VARCHAR) AS pcm_md5,
               CAST(NULL AS INTEGER) AS n_frames,
               width, height,
               CAST(NULL AS DOUBLE) AS fps,
               mean_luma,
               CAST(NULL AS DOUBLE) AS duration_ms
        FROM {_f('media_containers_image_truth')}
        ORDER BY media_id
    """,
}
