"""Exact substring deduplication (Lee et al. 2021, "Deduplicating
Training Data Makes Language Models Better").

Removes every duplicated token span of >= k tokens from the corpus,
keeping only its corpus-wide first occurrence. The published
implementation builds a suffix array on one machine; this is the
shuffle-native reformulation: any duplicated span of length >= k
contains a duplicated k-gram at every offset, so cutting all token
positions covered by non-first duplicated k-grams removes exactly the
non-first occurrences of every maximal duplicated span.

Scale design
------------
* The k-gram stream crosses the wire as (xxhash64, doc_id, pos) — ~16
  bytes per token, never text. That linear cost is inherent to the
  method (the suffix array is linear too); an optional ``stride`` > 1
  trades completeness for a 1/stride stream (documented approximation:
  spans shorter than k + stride - 1 can be missed).
* "Is this occurrence the corpus-wide first?" is a groupBy-min +
  equi-join, NOT a window over the hash: min(struct(doc_id, pos))
  partial-aggregates map-side, so a boilerplate k-gram occurring 10⁸
  times costs its combiner, not a single reducer (a row_number window
  would funnel every occurrence of a viral gram into one task).
* Only documents that actually lose a span are reassembled (explode →
  anti-join covered positions → sort-within-doc concat); untouched
  documents pass through byte-identical with no explode at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _kgram_hashes(docs: DataFrame, k: int, stride: int) -> DataFrame:
    """(doc_id, pos, h): xxhash64 of each k-token window (1-based pos).

    Two deliberate expression-level choices, worth ~6x end-to-end
    (measured at 25k docs):

    * words are hashed ONCE to a bigint array and each window hashes the
      SLICE of that array (xxhash64 accepts arrays) — no k-word string
      rebuild per position (per-gram ``concat_ws`` allocates
      O(k·wordlen) per token);
    * the word-hash array is LET-BOUND via a one-element transform
      (same trick as repetition._bind): as a plain projected column,
      Catalyst inlines it into the per-position lambda, re-splitting
      and re-hashing the whole document per gram — O(L²) per doc.
    """
    empty = "cast(array() as array<struct<pos: int, h: bigint>>)"
    grams = (
        f"transform(array(transform(split(text, ' '), w -> xxhash64(w))), wh ->"
        f" if(size(wh) >= {k},"
        f" transform(sequence(1, size(wh) - {k} + 1, {stride}),"
        f" i -> named_struct('pos', i, 'h', xxhash64(slice(wh, i, {k})))),"
        f" {empty}))[0]"
    )
    return (
        docs.select("doc_id", F.expr(grams).alias("g"))
        .select("doc_id", F.explode("g").alias("g"))
        .select("doc_id", F.col("g.pos").alias("pos"), F.col("g.h").alias("h"))
    )


def duplicated_kgram_losers(
    docs: DataFrame, k: int = 50, stride: int = 1, materialize: bool = True
) -> DataFrame:
    """(doc_id, pos) of every k-gram occurrence that is NOT the
    corpus-wide first occurrence of its gram (first = min (doc_id, pos)).

    The gram stream feeds both the per-hash aggregate and the probe side
    of the join; left lazy the tokenize+hash pass runs 2-4x (exchange
    reuse does not fire across the agg/probe shapes). ``materialize``
    checkpoints the ~16-byte/token stream once (GC-cleaned); at cluster
    scale prefer writing it to parquet and passing stride>1 if storage
    is the binding constraint.
    """
    grams = _kgram_hashes(docs, k, stride)
    if materialize:
        grams = grams.localCheckpoint(eager=False)
    firsts = grams.groupBy("h").agg(
        F.min(F.struct("doc_id", "pos")).alias("_first"),
        F.count("*").alias("_n"),
    )
    return (
        grams.join(firsts.filter(F.col("_n") > 1), "h")
        .filter(
            (F.col("doc_id") != F.col("_first.doc_id"))
            | (F.col("pos") != F.col("_first.pos"))
        )
        .select("doc_id", "pos")
    )


def dedup_substrings(docs: DataFrame, k: int = 50, stride: int = 1) -> DataFrame:
    """Cut non-first occurrences of every duplicated >= k-token span.

    Documents with nothing to cut pass through BYTE-IDENTICAL (and are
    never exploded); affected documents are rebuilt from their surviving
    tokens, joined with single spaces. Documents cut to zero tokens are
    dropped.
    """
    losers = duplicated_kgram_losers(docs, k, stride)
    # ONE doc_id-keyed aggregate collapses every losing occurrence into a
    # per-doc covered-position array; the k-gram stream executes exactly
    # once. Rebuild is then row-local (docs without cuts keep their text
    # column untouched — no explode, no per-word shuffle). The covered
    # array is bounded by the document's own length.
    #
    # r13 opt round (guide §2.3 "shuffle fewer bytes", §2.4): aggregate
    # the LOSER POSITIONS and expand each to its covered k-span
    # row-locally AFTER the shuffle — the old shape exploded every
    # loser into k wpos rows BEFORE the doc_id aggregate, so the
    # partial collect_set sets crossing the exchange were up to k×
    # larger and the plan carried a Generate node for the expansion.
    # array_distinct(flatten(sequence...)) builds the same SET the
    # exploded collect_set did (order is irrelevant: _cut only feeds
    # array_contains and is dropped) — survivors byte-identical.
    cut = (
        losers.groupBy("doc_id")
        .agg(F.collect_set("pos").alias("_lp"))
        .select(
            "doc_id",
            F.expr(
                f"array_distinct(flatten(transform(_lp,"
                f" p -> sequence(p, p + {k} - 1))))"
            ).alias("_cut"),
        )
    )
    rebuilt = F.expr(
        "array_join(filter(transform(split(text, ' '),"
        " (w, i) -> if(array_contains(_cut, i + 1), null, w)),"
        " w -> w is not null), ' ')"
    )
    return (
        docs.join(cut, "doc_id", "left")
        .withColumn(
            "text", F.when(F.col("_cut").isNull(), F.col("text")).otherwise(rebuilt)
        )
        # drop only docs CUT to nothing; originally-empty docs pass through
        .filter(F.col("_cut").isNull() | (F.length("text") > 0))
        .drop("_cut")
    )


def duplication_profile(docs: DataFrame, k: int = 50, stride: int = 1) -> DataFrame:
    """One row: corpus duplication metrics at span length k — docs
    affected, token positions cut, distinct duplicated grams."""
    losers = duplicated_kgram_losers(docs, k, stride)
    covered = losers.select(
        "doc_id", F.explode(F.expr(f"sequence(pos, pos + {k} - 1)")).alias("wpos")
    ).distinct()
    return covered.agg(
        F.countDistinct("doc_id").alias("n_docs_cut"),
        F.count("*").alias("n_tokens_cut"),
    )
