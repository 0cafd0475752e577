"""Corpus profiling: the one-pass summary a pipeline logs before/after
each curation stage.

``corpus_profile`` computes corpus-level aggregates in ONE job over a
single scan: doc/token/char counts, doc-length distribution (exact
count + approx percentiles), language and quality distributions, exact
duplicate rate (16-byte hash), and PII density. Everything is either a
partial-aggregatable global agg or an approx sketch — no window, no
join, no second scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .pii import PII_RULES
from .text import lang_exprs, quality_exprs


def corpus_profile(docs: DataFrame) -> DataFrame:
    """One-row corpus summary. Single scan + one global aggregate
    (plus the tiny distinct-hash count, computed in the same agg via
    approx_count_distinct — exact dup rate needs only the corpus total
    minus distinct hashes, and HLL 2% error is fine for a profile)."""
    q = quality_exprs()
    _, pred = lang_exprs()
    pii_total = F.lit(0)
    t = F.col("text")
    for _, pat, repl in PII_RULES:
        pii_total = pii_total + F.regexp_count(t, F.lit(pat))
        t = F.regexp_replace(t, pat, repl)
    from .text import _words

    ann = docs.select("text", _words().alias("ws")).select(
        F.length("text").alias("_chars"),
        q["n_tokens"].alias("_tok"),
        q["quality"].alias("_q"),
        pred.alias("_lang"),
        F.md5("text").alias("_h"),
        pii_total.alias("_pii"),
    )
    return ann.agg(
        F.count("*").alias("n_docs"),
        F.sum("_tok").alias("n_tokens"),
        F.sum("_chars").alias("n_chars"),
        F.expr("percentile_approx(_tok, array(0.1, 0.5, 0.9, 0.99), 5000)").alias(
            "tok_p10_p50_p90_p99"
        ),
        F.avg("_q").alias("quality_mean"),
        F.expr("percentile_approx(_q, 0.5, 5000)").alias("quality_p50"),
        F.approx_count_distinct("_h", 0.02).alias("approx_distinct_texts"),
        F.sum("_pii").alias("n_pii_matches"),
        F.countDistinct("_lang").alias("n_langs"),
    )


def lang_distribution(docs: DataFrame) -> DataFrame:
    """(lang, n_docs, n_tokens) — the grouped companion to the one-row
    profile (one keyed shuffle, partial-aggregated)."""
    q = quality_exprs()
    _, pred = lang_exprs()
    from .text import _words

    return (
        docs.select("text", _words().alias("ws"))
        .select(pred.alias("lang"), q["n_tokens"].alias("nt"))
        .groupBy("lang")
        .agg(F.count("*").alias("n_docs"), F.sum("nt").alias("n_tokens"))
        .orderBy(F.col("n_docs").desc())
    )
