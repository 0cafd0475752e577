#!/usr/bin/env python
"""Corpus curation report: profile a documents table, run every quality
gate in audit mode, and print one JSON document.

Usage: python tools/corpus_report.py [sf_dir] [--limit N]

The report answers "what would each gate do to this corpus" WITHOUT
mutating anything: profile before, per-gate survivor counts, dedup
rates, duplication profile. Every number comes from the same operators
the pipeline runs, so the report is the pipeline's dry run.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"
    )
    limit = None
    if "--limit" in sys.argv:
        limit = int(sys.argv[sys.argv.index("--limit") + 1])

    from pg2kinesis_spark.functions.curate import annotate
    from pg2kinesis_spark.functions.dedup import minhash_lsh_pairs
    from pg2kinesis_spark.functions.pii import pii_filter
    from pg2kinesis_spark.functions.profile import corpus_profile, lang_distribution
    from pg2kinesis_spark.functions.repetition import gopher_filter
    from pg2kinesis_spark.functions.substr_dedup import duplication_profile
    from pg2kinesis_spark.io import load_table
    from pg2kinesis_spark.session import get_spark

    spark = get_spark("corpus_report")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    if limit:
        docs = docs.limit(limit)

    prof = corpus_profile(docs).collect()[0].asDict()
    n_docs = prof["n_docs"]

    ann = annotate(docs)
    gates = {
        "quality_ge_0.2": ann.filter(F.col("quality") >= 0.2).count(),
        "gopher": gopher_filter(docs).count(),
        "pii_clean": pii_filter(docs, 0).count(),
    }
    exact_survivors = (
        ann.groupBy(F.md5("text").alias("h")).agg(F.min("doc_id")).count()
    )
    near_pairs = (
        minhash_lsh_pairs(docs, n=3, k=16, bands=4)
        .filter(F.col("est_jaccard") >= 0.6)
        .count()
    )
    dup_prof = duplication_profile(docs, k=20).collect()[0].asDict()
    langs = [
        r.asDict() for r in lang_distribution(docs).limit(10).collect()
    ]

    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "profile": {
                    k: (list(v) if isinstance(v, list) else v)
                    for k, v in prof.items()
                },
                "gate_survivors": {k: {"n": v, "frac": round(v / n_docs, 4)} for k, v in gates.items()},
                "exact_dedup": {
                    "survivors": exact_survivors,
                    "dup_rate": round(1 - exact_survivors / n_docs, 4),
                },
                "near_dup_pairs_jaccard_0.6": near_pairs,
                "substring_dup_k20": dup_prof,
                "languages": langs,
            },
            default=str,
        )
    )


if __name__ == "__main__":
    main()
