"""Corpus materialization: the ship-it step of the curation pipeline.

``materialize_corpus`` runs the configured curation, writes the accepted
documents as size-targeted parquet shards, computes the concat-and-chunk
training layout over the ACCEPTED set, and writes a manifest with the
numbers a downstream trainer needs (docs, tokens, sequences, shard
count, profile stats).

Discipline notes (both load-bearing at scale):

* WRITE-THEN-READ-BACK: the curated plan is executed exactly once (the
  shard write); the layout and manifest derive from re-reading the
  written shards, so neither re-executes the curation DAG (LSH joins,
  substring dedup) nor races a cache eviction into recompute.
* The layout is written batch-free (one overwrite) because
  materialization is a whole-corpus operation; incremental ingest is
  ``streaming.corpus_ingest``'s job.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .curate import curate_corpus
from .packing import pack_sequences, packing_stats
from .profile import corpus_profile


def materialize_corpus(
    docs: DataFrame,
    out_dir: str,
    seq_len: int = 2048,
    target_shard_mb: float = 256,
    bpe_model=None,
    unigram_model=None,
    write_sequences: bool = False,
    pad_id: int = 0,
    **curate_kwargs,
) -> dict:
    """Curate -> shard -> layout -> manifest. Returns the manifest dict
    (also written to ``{out_dir}/manifest.json``).

    With ``bpe_model`` (a :class:`functions.bpe.BpeModel`) or
    ``unigram_model`` (a :class:`functions.unigram.UnigramModel` —
    mutually exclusive), the packing layout and manifest token totals
    use budget-true subword counts instead of the curation's whitespace
    ``n_tokens`` — the counts a trainer's dataloader will actually
    see.

    ``write_sequences=True`` (requires ``bpe_model``) additionally
    materializes the ACTUAL training batches at ``{out_dir}/sequences``
    — (seq_id, input_ids, segment_ids, n_real, n_docs) via
    ``packing.materialize_sequences`` over the BPE-encoded shards, so
    the output is trainer-ready rather than layout-only."""
    if bpe_model is not None and unigram_model is not None:
        raise ValueError("pass bpe_model or unigram_model, not both")
    from pg2kinesis_spark.io import write_sharded

    spark = docs.sparkSession
    docs_path = os.path.join(out_dir, "docs")
    layout_path = os.path.join(out_dir, "layout")

    curated = curate_corpus(docs, **curate_kwargs)
    n_shards = write_sharded(curated, docs_path, target_mb=target_shard_mb)

    back = spark.read.parquet(docs_path)
    token_col = F.col("n_tokens")
    if bpe_model is not None:
        from .bpe import bpe_token_counts

        back = back.join(bpe_token_counts(back, bpe_model), "doc_id")
        token_col = F.col("n_bpe_tokens")
    elif unigram_model is not None:
        from .unigram import unigram_token_counts

        back = back.join(unigram_token_counts(back, unigram_model), "doc_id")
        token_col = F.col("n_unigram_tokens")
    layout = pack_sequences(back, token_col, seq_len, "doc_id")
    layout.write.mode("overwrite").parquet(layout_path)

    sequences_path = None
    if write_sequences:
        if bpe_model is None:
            raise ValueError("write_sequences=True requires bpe_model")
        from .bpe import bpe_encode
        from .packing import materialize_sequences

        sequences_path = os.path.join(out_dir, "sequences")
        encoded = bpe_encode(back, bpe_model)
        materialize_sequences(encoded, seq_len, pad_id=pad_id).write.mode(
            "overwrite"
        ).parquet(sequences_path)

    layout_back = spark.read.parquet(layout_path)
    stats = packing_stats(layout_back, seq_len).collect()[0].asDict()
    prof = corpus_profile(back.select("doc_id", "text")).collect()[0].asDict()
    prof = {k: (list(v) if isinstance(v, list) else v) for k, v in prof.items()}

    manifest = {
        "docs_path": docs_path,
        "layout_path": layout_path,
        "sequences_path": sequences_path,
        "n_shards": n_shards,
        "seq_len": seq_len,
        "token_counter": (
            "bpe"
            if bpe_model is not None
            else "unigram" if unigram_model is not None else "whitespace"
        ),
        "packing": stats,
        "profile": prof,
        "curate_args": {
            k: (v if isinstance(v, (int, float, str, bool, type(None))) else str(v))
            for k, v in curate_kwargs.items()
        },
    }
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=2, default=str)
    return manifest
