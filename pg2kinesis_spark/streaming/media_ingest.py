"""Streaming media ingest: the media twin of ``corpus_ingest``.

A crawler delivers media in micro-batches; each batch must be gated,
deduplicated against everything already ACCEPTED (not just within
itself), and appended — with crash-replay idempotence. This module
applies the corpus_ingest parquet-index discipline to the media tier:

* **gates** — the shared ``_media_gate_ids`` stage (decode/quarantine,
  min_pixels / min_duration_ms / silence / LUFS), cheapest first;
* **exact dedup** — within-batch min-id survivor per content md5, then
  an anti-join against the accepted ``hash_index`` (16-byte keys
  shuffle, payloads don't; the index side always wins);
* **perceptual dedup** — dHash/pHash (image) or the audio fingerprint;
  within-batch pairs via the multi-index ``simhash_pairs``, and the
  cross-batch probe melts BOTH sides with the same pigeonhole
  ``simhash_segments`` and equi-joins on (seg, key) — the accepted
  ``sig_index`` is probed by the new batch only (new-side-only work,
  the lsh_pairs_incremental shape), never index-vs-index;
* **state** — parquet indexes partitioned by ``batch_id``; a replayed
  batch excludes its OWN partitions from every index read (the
  corpus_ingest crash-replay contract), recomputes the same accepted
  set, and dynamically overwrites its partitions — so a crash between
  the accepted write and an index write heals on replay;
* **lineage severing** — accepted rows are written FIRST and the index
  rows derive from a re-read of that parquet, so the index writes
  don't re-execute the gate/dedup plan (the corpus_ingest measured
  trap). Round 10: the perceptual signature is a COLUMN of the
  accepted parquet (computed once in the fused gate decode for
  images), so the sig_index rebuild is a projection of the re-read —
  the old third decode of every accepted file is gone.

Unbounded operator state never exists: all cross-batch memory is
parquet on disk, readable by any executor count, compactable offline.

State-schema note (round 10 -> 11): the accepted parquet gained a
``sig`` column in round 10. Deployments upgrading over pre-round-10
accepted state keep working — the post-write re-read uses
``mergeSchema`` so old partitions surface ``sig = NULL`` instead of
poisoning the schema sample; no offline backfill is required (the
sig_index rebuild only projects the current batch's rows, which always
carry the column).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _read_index(
    spark: SparkSession, path: str, exclude_batch_id: int | None = None
) -> DataFrame | None:
    """FS-probe index read (quiet on first batch — no py4j stack in
    stderr), excluding a replayed batch's own partition."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(jpath):
        return None
    try:
        df = spark.read.parquet(path)
    except Exception:
        return None
    if exclude_batch_id is not None and "batch_id" in df.columns:
        df = df.filter(F.col("batch_id") != exclude_batch_id)
    return df


class MediaIngest:
    """foreachBatch processor: gates -> exact -> perceptual -> append."""

    def __init__(
        self,
        out_dir: str,
        kind: str = "image",
        max_hamming: int | None = 3,
        algo: str = "dhash",
        min_pixels: int | None = None,
        min_duration_ms: float | None = None,
        max_silence_ratio: float | None = None,
        min_lufs: float | None = None,
        stats: bool = False,
    ):
        if kind not in ("image", "audio"):
            raise ValueError(f"kind must be 'image' or 'audio', not {kind!r}")
        self.out_dir = out_dir
        self.kind = kind
        self.max_hamming = max_hamming
        self.algo = algo
        self.gates = dict(
            min_pixels=min_pixels,
            min_duration_ms=min_duration_ms,
            max_silence_ratio=max_silence_ratio,
            min_lufs=min_lufs,
        )
        self.stats = stats
        self.accepted_path = os.path.join(out_dir, "accepted")
        self.hash_path = os.path.join(out_dir, "hash_index")
        self.sig_path = os.path.join(out_dir, "sig_index")
        self.stats_path = os.path.join(out_dir, "stats")

    def _signatures(self, media: DataFrame) -> DataFrame:
        """(media_id, simhash-as-'doc_id'-shape) for the configured
        modality; undecodable rows simply can't pair."""
        from pg2kinesis_spark.functions.multimodal import (
            audio_fingerprint,
            media_dhash,
        )

        if self.kind == "image":
            sigs = media_dhash(media, algo=self.algo).filter(
                F.col("dhash").isNotNull()
            )
            return sigs.select("media_id", F.col("dhash").alias("simhash"))
        sigs = audio_fingerprint(media).filter(F.col("afp").isNotNull())
        return sigs.select("media_id", F.col("afp").alias("simhash"))

    def process_batch(self, batch: DataFrame, batch_id: int) -> None:
        from pg2kinesis_spark.functions.dedup import (
            hamming64,
            simhash_pairs,
            simhash_segments,
        )
        from pg2kinesis_spark.functions.multimodal import _media_gate_ids

        spark = batch.sparkSession
        # heal a crashed compact_media_indexes swap before any read
        from pg2kinesis_spark.streaming.corpus_ingest import _recover_compaction

        for p in (self.hash_path, self.sig_path):
            _recover_compaction(p)
        keep_ids, _rejected, gate_sigs = _media_gate_ids(
            batch, self.kind, algo=self.algo, **self.gates
        )
        gated = batch.join(keep_ids, "media_id", "left_semi")
        # the survivor set feeds hashing, signatures, AND the final
        # write — materialize once (the multi-reference discipline)
        gated = gated.localCheckpoint(eager=False)

        # exact: within-batch min-id survivor, then the accepted index
        hashed = gated.select("media_id", F.md5("content").alias("h"))
        keep = hashed.groupBy("h").agg(F.min("media_id").alias("media_id"))
        idx = _read_index(spark, self.hash_path, exclude_batch_id=batch_id)
        if idx is not None:
            keep = keep.join(idx.select("h"), "h", "left_anti")
        survivors = gated.join(keep.select("media_id"), "media_id", "left_semi")

        if self.max_hamming is not None:
            if gate_sigs is not None:
                # one-decode fusion (round 10): image signatures come
                # from the SAME decode the gate pass used
                sigs = gate_sigs.join(
                    survivors.select("media_id"), "media_id", "left_semi"
                ).select("media_id", F.col("sig").alias("simhash"))
            else:
                sigs = self._signatures(survivors)
            sigs = sigs.localCheckpoint(eager=False)
            within = simhash_pairs(
                sigs.select(F.col("media_id").alias("doc_id"), "simhash"),
                max_hamming=self.max_hamming,
            )
            drop = within.select(F.greatest("id1", "id2").alias("media_id"))
            sig_idx = _read_index(spark, self.sig_path, exclude_batch_id=batch_id)
            if sig_idx is not None:
                new_seg = simhash_segments(
                    sigs.select(F.col("media_id").alias("doc_id"), "simhash"),
                    self.max_hamming,
                )
                idx_seg = simhash_segments(
                    sig_idx.select(F.col("media_id").alias("doc_id"), "simhash"),
                    self.max_hamming,
                ).select(
                    F.col("doc_id").alias("idx_id"),
                    F.col("simhash").alias("idx_sim"),
                    "seg",
                    "key",
                )
                # new-side-only probe: the index side ALWAYS wins
                cross = (
                    new_seg.join(idx_seg, ["seg", "key"])
                    .select("doc_id", "simhash", "idx_sim")
                    .distinct()
                    .filter(
                        hamming64(F.col("simhash"), F.col("idx_sim"))
                        <= self.max_hamming
                    )
                    .select(F.col("doc_id").alias("media_id"))
                )
                drop = drop.unionByName(cross)
            survivors = survivors.join(drop.distinct(), "media_id", "left_anti")

        # accepted rows land FIRST; index writes derive from a re-read
        # (lineage severed + idempotence anchor: everything partitions
        # by batch_id and a replay dynamically overwrites its own)
        def _write(df: DataFrame, path: str) -> None:
            df.withColumn("batch_id", F.lit(batch_id)).write.mode(
                "overwrite"
            ).partitionBy("batch_id").option(
                "partitionOverwriteMode", "dynamic"
            ).parquet(path)

        # the perceptual signature RIDES IN the accepted parquet
        # (round 10): the post-write index rebuild below reads it back
        # instead of paying a third decode of every accepted file
        if self.max_hamming is not None:
            survivors = survivors.join(
                sigs.withColumnRenamed("simhash", "sig"), "media_id", "left"
            )
        else:
            survivors = survivors.withColumn(
                "sig", F.lit(None).cast("long")
            )
        _write(survivors, self.accepted_path)
        # mergeSchema: pre-round-10 accepted partitions lack the `sig`
        # column, and a plain read may sample its schema from an old
        # footer and drop (or fail on) the new column — the upgrade
        # migration ADVICE r10 flagged. Old rows surface sig=NULL.
        accepted = (
            spark.read.option("mergeSchema", "true")
            .parquet(self.accepted_path)
            .filter(F.col("batch_id") == batch_id)
        )
        if "sig" not in accepted.columns:
            accepted = accepted.withColumn("sig", F.lit(None).cast("long"))
        _write(accepted.select(F.md5("content").alias("h")), self.hash_path)
        if self.max_hamming is not None:
            _write(
                accepted.filter(F.col("sig").isNotNull()).select(
                    "media_id", F.col("sig").alias("simhash")
                ),
                self.sig_path,
            )
        if self.stats:
            n = accepted.count()
            _write(
                spark.createDataFrame([(n,)], "n_accepted long"), self.stats_path
            )


def compact_media_indexes(
    spark: SparkSession, out_dir: str, keep_last_batches: int = 1,
    target_files: int = 1,
) -> dict:
    """Fold old per-batch media-index partitions into one compacted
    partition — ``compact_corpus_indexes`` verbatim (the fold core is
    schema-agnostic and MediaIngest uses the same hash_index /
    sig_index names; the corpus-only indexes skip as absent). Run with
    the ingest stream STOPPED; a crashed swap heals on the next batch
    (process_batch calls _recover_compaction first)."""
    from pg2kinesis_spark.streaming.corpus_ingest import compact_corpus_indexes

    return compact_corpus_indexes(
        spark, out_dir, keep_last_batches=keep_last_batches,
        target_files=target_files,
    )


def start_media_ingest(
    stream: DataFrame, out_dir: str, checkpoint: str, **kwargs
):
    """writeStream wrapper: foreachBatch(MediaIngest(...).process_batch)
    with the checkpoint directory carrying Spark's own batch-id replay
    guarantees (exactly the corpus_ingest starter shape)."""
    ingest = MediaIngest(out_dir, **kwargs)
    return (
        stream.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint)
        .foreachBatch(ingest.process_batch)
        .start()
    )
