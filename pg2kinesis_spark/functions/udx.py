"""User-defined extension surfaces: UDTF and grouped-agg UDAF.

The reference's only extension point is the Formatter subclass
(reference formatter.py:146-163, SURVEY §2.10); the Spark engine exposes
the full trio — scalar pandas_udf (see dedup.simhash), grouped-agg
pandas_udf (UDAF), and Python UDTF — demonstrated here on the documents
table. Both are Arrow-batched; the UDTF runs one process-pool pass per
partition, the UDAF one reduction per group.

These exist to prove the extension surface; the equivalent built-ins
(posexplode for bigrams, sum()/ratio for the weighted mean) are what a
hot path should use — and the DuckDB oracles for n19/n20 check the UDF
implementations against exactly those built-in formulations.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udtf


@udtf(returnType="pos int, bigram string")
class BigramsUDTF:
    """Emit (position, word-bigram) rows per document — the UDTF shape
    (0..n output rows per input row)."""

    def eval(self, text: str):
        if not text:
            return
        ws = text.split(" ")
        for i in range(len(ws) - 1):
            yield i, ws[i] + " " + ws[i + 1]


def doc_bigrams_udtf(docs: DataFrame) -> DataFrame:
    spark = docs.sparkSession
    spark.udtf.register("doc_bigrams", BigramsUDTF)
    docs.createOrReplaceTempView("_udtf_docs")
    return spark.sql(
        "SELECT d.doc_id, b.pos, b.bigram FROM _udtf_docs d, LATERAL doc_bigrams(d.text) b"
    )


@pandas_udf("double")
def weighted_mean(values: pd.Series, weights: pd.Series) -> float:
    """Grouped-agg pandas UDF (UDAF): Σ v·w / Σ w over each group."""
    return float((values * weights).sum() / weights.sum())


def quality_by_lang_udaf(quality: DataFrame, docs: DataFrame) -> DataFrame:
    """Token-weighted mean quality per language via the UDAF."""
    joined = quality.join(docs.select("doc_id", "lang"), "doc_id")
    # Spark disallows mixing a grouped-agg pandas UDF with built-in
    # aggregates in one agg() — compute counts separately and join.
    wq = joined.groupBy("lang").agg(
        weighted_mean(F.col("quality"), F.col("n_tokens").cast("double")).alias("wq")
    )
    counts = joined.groupBy("lang").agg(F.count("*").alias("n_docs"))
    return wq.join(counts, "lang")
