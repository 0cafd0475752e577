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
    """(doc_id, pos, h): xxhash64 of each k-token window (1-based pos)."""
    return (
        docs.select("doc_id", F.split("text", " ").alias("ws"))
        .select(
            "doc_id",
            F.expr(
                f"""if(size(ws) >= {k},
                  transform(sequence(1, size(ws) - {k} + 1, {stride}),
                    i -> named_struct('pos', i,
                                      'h', xxhash64(concat_ws(' ', slice(ws, i, {k}))))),
                  array())"""
            ).alias("g"),
        )
        .select("doc_id", F.explode("g").alias("g"))
        .select("doc_id", F.col("g.pos").alias("pos"), F.col("g.h").alias("h"))
    )


def duplicated_kgram_losers(docs: DataFrame, k: int = 50, stride: int = 1) -> DataFrame:
    """(doc_id, pos) of every k-gram occurrence that is NOT the
    corpus-wide first occurrence of its gram (first = min (doc_id, pos))."""
    grams = _kgram_hashes(docs, k, stride)
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
    covered = losers.select(
        "doc_id", F.explode(F.expr(f"sequence(pos, pos + {k} - 1)")).alias("wpos")
    ).distinct()
    cut_ids = covered.select("doc_id").distinct()
    untouched = docs.join(cut_ids, "doc_id", "left_anti")
    words = (
        docs.join(cut_ids, "doc_id", "left_semi")
        .select("doc_id", F.posexplode(F.split("text", " ")).alias("wpos0", "w"))
        .select("doc_id", (F.col("wpos0") + 1).alias("wpos"), "w")
    )
    rebuilt = (
        words.join(covered, ["doc_id", "wpos"], "left_anti")
        .groupBy("doc_id")
        .agg(
            F.array_join(
                F.expr("transform(array_sort(collect_list(struct(wpos, w))), s -> s.w)"),
                " ",
            ).alias("text")
        )
    )
    extra = [c for c in docs.columns if c not in ("doc_id", "text")]
    if extra:
        rebuilt = rebuilt.join(docs.select("doc_id", *extra), "doc_id")
    return untouched.unionByName(rebuilt.select(*docs.columns))


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
