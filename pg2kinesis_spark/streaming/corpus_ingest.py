"""Streaming corpus ingest: continuous curation with incremental dedup.

The streaming twin of ``functions.curate``: documents arrive as files
(the standard landing-zone pattern — each micro-batch is a set of new
parquet files), pass the row-local gates, are exact-deduplicated against
everything already accepted, near-dup-checked against the materialized
MinHash signature index, and appended to the curated output — while the
signature index grows by exactly the accepted batch.

Scale/streaming design
----------------------
* Row-local gates (quality/lang/Gopher/PII) run inside the micro-batch —
  map-only, no state.
* Exact dedup state is the ACCEPTED-HASH PARQUET INDEX (16-byte md5
  keys), not Spark operator state: a `dropDuplicates` over an unbounded
  key stream would grow executor state forever and die on restart
  recovery at 100 TB. The index is a column-pruned scan + left-anti
  join per batch, and doubles as within-batch dedup via a groupBy.
* Near-dup state is the signature index from
  ``dedup.write_minhash_signatures`` — the new batch is signed ONCE;
  banding joins new-vs-index candidates (`lsh_pairs_incremental`).
* Idempotence: the foreachBatch body keys every append by batch_id
  (overwrite-by-partition), so a replayed batch after a crash rewrites
  the same partition instead of duplicating it — the standard
  exactly-once-by-idempotence recipe for file sinks.

The reference system is itself a streaming CDC pump; this module is the
same at-least-once + idempotent-sink contract applied to the corpus
domain (reference `__main__.py` consume loop; SURVEY §2.9).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pg2kinesis_spark.functions.curate import annotate
from pg2kinesis_spark.functions.dedup import lsh_pairs_incremental


class CorpusIngest:
    """foreachBatch processor: gate -> dedup -> near-dup -> append."""

    def __init__(
        self,
        out_dir: str,
        min_quality: float = 0.0,
        near_dup_jaccard: float | None = 0.6,
        n: int = 3,
        k: int = 16,
        bands: int = 4,
        gopher: bool | dict = False,
        max_pii: int | None = None,
        lm_model=None,
        max_perplexity: float | None = None,
        url_col: str | None = None,
        url_blocklist: list[str] | None = None,
        url_badwords: tuple[str, ...] | None = None,
        dsir_logratios: DataFrame | None = None,
        min_dsir_logw: float | None = None,
        semdedup_eps: float | None = None,
        semdedup_ref_emb: DataFrame | None = None,
        semdedup_dim: int | None = None,
        semdedup_clusters: int = 16,
        bloom_bits: int | None = 1 << 23,
        bloom_k: int = 7,
    ):
        self.out_dir = out_dir
        self.gopher = gopher
        self.max_pii = max_pii
        # SemDeDup as a STREAMING stage: centroids are fit ONCE on a
        # reference embedding set (frozen quantizer — every batch and
        # the accepted index agree on cluster ids forever), then each
        # micro-batch is checked against the accepted-embedding parquet
        # index + itself (semdedup_incremental: index side always wins,
        # within-batch uses the paper's keep order). Requires batches to
        # carry an `embedding` column.
        self.semdedup_eps = semdedup_eps
        self.sd_cents = None
        if semdedup_eps is not None:
            if semdedup_ref_emb is None or semdedup_dim is None:
                raise ValueError(
                    "semdedup_eps needs semdedup_ref_emb + semdedup_dim "
                    "(centroids are fit once, on a reference corpus)"
                )
            from pg2kinesis_spark.functions.similarity import ivf_int_centroids

            self.sd_cents = ivf_int_centroids(
                semdedup_ref_emb, semdedup_dim, semdedup_clusters
            )
        # URL front door (urls.py): badwords/blocklist are row-local;
        # URL dedup is WITHIN-batch (cross-batch dedup is the text-hash
        # index's job — a recrawled page has equal text and dedups there)
        self.url_col = url_col
        self.url_blocklist = url_blocklist
        self.url_badwords = url_badwords
        # DSIR as a STREAMING gate: the log-ratio table is fit once on
        # reference corpora; per-batch scoring thresholds on logw — the
        # streaming analogue of top-k selection. Materialize it HERE
        # (eager localCheckpoint): the table is probed every batch, and
        # a lazy plan would re-run the whole fit per micro-batch.
        if dsir_logratios is not None:
            dsir_logratios = dsir_logratios.localCheckpoint(eager=True)
            self.dsir_n_buckets = dsir_logratios.count()
        self.dsir_logratios = dsir_logratios
        self.min_dsir_logw = min_dsir_logw
        # LM gate state: the model's count DataFrames live for the whole
        # stream (trained once, on a REFERENCE corpus — not the stream)
        self.lm_model = lm_model
        self.max_perplexity = max_perplexity
        self.accepted_path = os.path.join(out_dir, "accepted")
        self.hash_path = os.path.join(out_dir, "hash_index")
        self.sig_path = os.path.join(out_dir, "sig_index")
        self.emb_path = os.path.join(out_dir, "emb_index")
        self.min_quality = min_quality
        self.near_dup_jaccard = near_dup_jaccard
        self.n, self.k, self.bands = n, k, bands
        # Bloom sidecar over the accepted hashes: answers "definitely
        # new" for the bulk of each batch so the hash-index anti-join
        # runs only on the maybe-seen residue. Purely an optimization —
        # no false negatives by construction, accepted set identical
        # with it on or off (test-pinned). bloom_bits=None disables.
        self.bloom = None
        self.band_bloom = None
        if bloom_bits is not None:
            from pg2kinesis_spark.functions.bloom import BloomSidecar

            self.bloom = BloomSidecar(
                os.path.join(out_dir, "bloom"), m_bits=bloom_bits, k=bloom_k
            )
            # second sidecar over the signature index's (band_idx,
            # band_key) rows: prefilters the banding join the same way
            # the hash bloom prefilters the exact anti-join
            self.band_bloom = BloomSidecar(
                os.path.join(out_dir, "bloom_bands"), m_bits=bloom_bits, k=bloom_k
            )

    def _existing(
        self, spark: SparkSession, path: str, exclude_batch_id: int | None = None
    ) -> DataFrame | None:
        """Read an index, excluding ``exclude_batch_id``'s partition.

        The exclusion is the crash-replay contract: a replayed batch must
        dedup against everything EXCEPT its own (possibly partial) prior
        writes, so it recomputes the same accepted set and idempotently
        rewrites all of its partitions. Without it, a crash after the
        hash-index write but before the sig-index write would make the
        replay see its own hashes, compute an empty batch, and leave the
        sig index permanently missing those signatures.
        """
        try:
            df = spark.read.parquet(path)
        except Exception:
            return None  # first batch: no index yet
        if exclude_batch_id is not None and "batch_id" in df.columns:
            df = df.filter(F.col("batch_id") != exclude_batch_id)
        return df

    def process_batch(self, batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        if self.url_col is not None:
            from pg2kinesis_spark.functions import urls as _urls

            if self.url_badwords:
                batch = _urls.url_badword_filter(
                    batch, self.url_badwords, url_col=self.url_col
                )
            # parse once; blocklist + dedup reuse the computed columns
            parsed = _urls.parse_urls(batch, self.url_col)
            if self.url_blocklist:
                parsed = _urls.domain_blocklist_filter(
                    parsed, self.url_blocklist, url_col=self.url_col,
                    host_col="host", domain_col="domain",
                )
            parsed = _urls.url_dedup(parsed, url_col=self.url_col, norm_col="url_norm")
            batch = parsed.drop("host", "domain", "path", "url_norm")
        if self.dsir_logratios is not None and self.min_dsir_logw is not None:
            from pg2kinesis_spark.functions.dsir import dsir_scores

            keep = (
                dsir_scores(batch, self.dsir_logratios, n_buckets=self.dsir_n_buckets)
                .filter(F.col("logw") >= self.min_dsir_logw)
                .select("doc_id")
            )
            batch = batch.join(keep, "doc_id", "left_semi")
        if self.gopher:
            from pg2kinesis_spark.functions.repetition import gopher_filter

            batch = gopher_filter(
                batch, thresholds=self.gopher if isinstance(self.gopher, dict) else None
            )
        if self.max_pii is not None:
            from pg2kinesis_spark.functions.pii import pii_filter

            batch = pii_filter(batch, max_pii=self.max_pii)
        if self.lm_model is not None and self.max_perplexity is not None:
            from pg2kinesis_spark.functions.lm import perplexity_filter

            batch = perplexity_filter(batch, self.lm_model, self.max_perplexity)
        ann = annotate(batch)
        if self.sd_cents is not None:
            # annotate projects (doc_id, text, ...); carry the embedding
            # through for the semantic stage + the accepted output
            ann = ann.join(batch.select("doc_id", "embedding"), "doc_id")
        if self.min_quality > 0.0:
            ann = ann.filter(F.col("quality") >= self.min_quality)

        # exact dedup: within batch (min doc_id per hash) and vs index
        ann = ann.withColumn("_h", F.md5("text"))
        ann = ann.join(
            ann.groupBy("_h").agg(F.min("doc_id").alias("doc_id")),
            ["_h", "doc_id"],
            "left_semi",
        )
        idx = self._existing(spark, self.hash_path, exclude_batch_id=batch_id)
        if idx is not None:
            bloom_bits = (
                self.bloom.load_union(exclude_batch_id=batch_id)
                if self.bloom is not None
                else None
            )
            if bloom_bits is not None:
                # bloom prefilter: rows the filter has never seen are
                # DEFINITELY new and skip the index anti-join; only the
                # maybe-seen residue (dups + <1% false positives) pays it
                from pg2kinesis_spark.functions.bloom import (
                    bloom_hash_cols,
                    maybe_seen_udf,
                )

                h1, h2 = bloom_hash_cols(F.col("_h"))
                maybe = maybe_seen_udf(spark, bloom_bits, self.bloom.k)
                flagged = ann.withColumn("_maybe", maybe(h1, h2))
                ann = flagged.filter(~F.col("_maybe")).unionByName(
                    flagged.filter(F.col("_maybe")).join(
                        idx.select("_h"), "_h", "left_anti"
                    )
                ).drop("_maybe")
            else:
                ann = ann.join(idx.select("_h"), "_h", "left_anti")

        # near-dup vs signature index (new-vs-index + new-vs-new pairs)
        if self.near_dup_jaccard is not None:
            docs = ann.select("doc_id", "text")
            if self._existing(spark, self.sig_path, exclude_batch_id=batch_id) is not None:
                band_bits = (
                    self.band_bloom.load_union(exclude_batch_id=batch_id)
                    if self.band_bloom is not None
                    else None
                )
                pairs = lsh_pairs_incremental(
                    spark,
                    docs,
                    self.sig_path,
                    self.n,
                    self.k,
                    self.bands,
                    exclude_batch_id=batch_id,
                    band_bloom_bits=band_bits,
                    band_bloom_k=self.band_bloom.k if self.band_bloom else 7,
                ).filter(F.col("est_jaccard") >= self.near_dup_jaccard)
                # ids are canonicalized id1 < id2; the ACCEPTED index side
                # must never be dropped. Mark which side is new (the batch
                # id set is micro-batch-sized -> broadcast), then drop:
                # both new -> the larger; one new -> the new one.
                ids = docs.select("doc_id")
                n1 = F.broadcast(
                    ids.select(F.col("doc_id").alias("id1"), F.lit(True).alias("_n1"))
                )
                n2 = F.broadcast(
                    ids.select(F.col("doc_id").alias("id2"), F.lit(True).alias("_n2"))
                )
                drop = (
                    pairs.join(n1, "id1", "left")
                    .join(n2, "id2", "left")
                    .select(
                        F.when(F.col("_n1") & F.col("_n2"), F.col("id2"))
                        .when(F.col("_n1"), F.col("id1"))
                        .otherwise(F.col("id2"))
                        .alias("doc_id")
                    )
                    .distinct()
                )
                ann = ann.join(drop, "doc_id", "left_anti")

        # semantic near-dup vs the accepted-embedding index (+ itself)
        if self.sd_cents is not None:
            from pg2kinesis_spark.functions.semdedup import semdedup_incremental

            new_emb = ann.select(F.col("doc_id").alias("vec_id"), "embedding")
            idx_emb = self._existing(spark, self.emb_path, exclude_batch_id=batch_id)
            if idx_emb is not None:
                idx_emb = idx_emb.select("vec_id", "cid", "cent_sim", "embedding")
            kept = (
                semdedup_incremental(
                    new_emb, idx_emb, self.sd_cents, eps=self.semdedup_eps
                )
                .filter(F.col("kept"))
                .select(F.col("vec_id").alias("doc_id"))
            )
            ann = ann.join(kept, "doc_id", "left_semi")

        # WRITE-THEN-READ-BACK, deliberately: the accepted plan's lineage
        # runs anti-joins AGAINST the hash/signature indexes. If the index
        # writes below re-executed that lineage (cache eviction, partial
        # persist), they would see the batch's OWN freshly-written hashes
        # and silently compute an empty batch. Materializing the accepted
        # rows to their final parquet first and deriving both index writes
        # from a re-read severs that lineage completely — and doubles as
        # the idempotence anchor (everything is partitioned by batch_id,
        # so a crash-replayed batch overwrites its own partition).
        def _write(df: DataFrame, path: str) -> None:
            df.withColumn("batch_id", F.lit(batch_id)).write.mode(
                "overwrite"
            ).partitionBy("batch_id").option(
                "partitionOverwriteMode", "dynamic"
            ).parquet(path)

        if ann.limit(1).count() == 0:
            return
        _write(ann.drop("_h"), self.accepted_path)
        back = (
            spark.read.parquet(self.accepted_path)
            .filter(F.col("batch_id") == batch_id)
            .drop("batch_id")
        )
        # sig BEFORE hash: with the batch-id exclusion above, replay is
        # idempotent regardless of where a crash lands, but ordering the
        # replay-gating state (exact-dedup hashes) last means even a
        # reader that ignores the exclusion can never observe a batch
        # whose hashes exist while its signatures don't.
        if self.near_dup_jaccard is not None:
            from pg2kinesis_spark.functions.dedup import (
                _banded,
                band_key_col,
                minhash_signatures,
            )

            sig = minhash_signatures(back.select("doc_id", "text"), self.n, self.k)
            # band bloom BEFORE the sig index (same over-approximation
            # discipline as the hash bloom: a crash between the two
            # leaves extra maybe-seen probes, never missed duplicates)
            if self.band_bloom is not None:
                from pg2kinesis_spark.functions.bloom import bloom_hash_cols

                h1, h2 = bloom_hash_cols(band_key_col())
                self.band_bloom.write(
                    _banded(sig, self.k, self.bands).select(
                        h1.alias("_h1"), h2.alias("_h2")
                    ),
                    "_h1",
                    "_h2",
                    batch_id,
                )
            _write(sig, self.sig_path)
        if self.sd_cents is not None:
            from pg2kinesis_spark.functions.semdedup import assign_with_centroids

            # re-assign from the read-back rows (same frozen centroids →
            # identical cids) so the index write shares the severed
            # lineage and the replay-exclusion contract of the others
            _write(
                assign_with_centroids(
                    back.select(F.col("doc_id").alias("vec_id"), "embedding"),
                    self.sd_cents,
                ),
                self.emb_path,
            )
        # bloom BEFORE the hash index: a crash between the two leaves the
        # bloom over-approximating (maybe-seen rows probe the index, find
        # nothing, get re-accepted) — never under-approximating, which
        # would silently re-admit duplicates. Replay overwrites both.
        if self.bloom is not None:
            from pg2kinesis_spark.functions.bloom import bloom_hash_cols

            h1, h2 = bloom_hash_cols(F.md5("text"))
            self.bloom.write(
                back.select(h1.alias("_h1"), h2.alias("_h2")),
                "_h1",
                "_h2",
                batch_id,
            )
        _write(back.select(F.md5("text").alias("_h")), self.hash_path)


def start_corpus_ingest(
    spark: SparkSession,
    src_dir: str,
    out_dir: str,
    checkpoint: str,
    schema=None,
    max_files_per_trigger: int = 10,
    **kwargs,
):
    """Wire the file-landing-zone stream into CorpusIngest. Returns the
    StreamingQuery (caller owns lifecycle)."""
    if schema is None:
        schema = spark.read.parquet(src_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(src_dir)
    )
    ingest = CorpusIngest(out_dir, **kwargs)
    return (
        stream.writeStream.foreachBatch(ingest.process_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def start_warc_ingest(
    spark: SparkSession,
    warc_dir: str,
    out_dir: str,
    checkpoint: str,
    max_files_per_trigger: int = 4,
    **kwargs,
):
    """The CommonCrawl front door as a CONTINUOUS stream: WARC archives
    landing in ``warc_dir`` flow through the record splitter + HTTP
    gate + codegen HTML->text (functions/warc.py) into the same
    crash-idempotent CorpusIngest gates (exact + incremental-LSH dedup
    against the parquet indexes).

    binaryFile is a regular file-stream source, so checkpointed file
    tracking gives exactly-once archive consumption; one archive = one
    task (the CommonCrawl 64k-files layout is the parallelism), and
    maxFilesPerTrigger bounds per-batch memory the same way
    maxPartitionBytes bounds scan tasks on a real cluster.
    """
    from pg2kinesis_spark.functions.warc import warc_to_corpus

    # binaryFile's schema is fixed by the format, but the stream source
    # API still demands it explicitly
    bf_schema = (
        "path string, modificationTime timestamp, length long, content binary"
    )
    stream = (
        spark.readStream.format("binaryFile")
        .schema(bf_schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .load(warc_dir)
    )
    ingest = CorpusIngest(out_dir, **kwargs)

    def _batch(df: DataFrame, batch_id: int) -> None:
        ingest.process_batch(warc_to_corpus(df).select("doc_id", "text"), batch_id)

    return (
        stream.writeStream.foreachBatch(_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
