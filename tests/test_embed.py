"""Text -> embedding -> ANN composition."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pg2kinesis_spark.functions.embed import (
    embed_docs,
    fit_embedder,
    semantic_neardup_pairs,
)
from pg2kinesis_spark.io import load_table


@pytest.fixture(scope="module")
def docs(spark, sf_small):
    base = load_table(spark, sf_small, "documents").limit(120).select("doc_id", "text")
    # plant a semantic near-dup: doc 900001 = one doc with light edits.
    # Replacements use a COMMON word ("the") — an invented rare token
    # would get a huge IDF and dominate the vector (correct TF-IDF
    # behavior, but not the near-dup case this test wants).
    src = base.first()
    edited = " ".join(
        (w if i % 9 else "the") for i, w in enumerate(src["text"].split(" "))
    )
    extra = spark.createDataFrame([(900001, edited)], ["doc_id", "text"])
    return base.unionByName(extra), src["doc_id"]


def test_embeddings_shape_and_norm(spark, docs):
    df, _ = docs
    model = fit_embedder(df, num_features=512, dim=16)
    emb = embed_docs(model, df)
    rows = emb.collect()
    assert len(rows) == 121
    assert all(len(r["embedding"]) == 16 for r in rows)
    norms = [sum(x * x for x in r["embedding"]) for r in rows]
    assert all(abs(n - 1.0) < 1e-6 or n < 1e-12 for n in norms)  # unit or zero


def test_identical_docs_have_identical_embeddings(spark, docs):
    df, src_id = docs
    dup = df.filter(F.col("doc_id") == src_id).withColumn("doc_id", F.lit(900002))
    model = fit_embedder(df, num_features=512, dim=16)
    emb = embed_docs(model, df.unionByName(dup))
    a = emb.filter(F.col("doc_id") == src_id).first()["embedding"]
    b = emb.filter(F.col("doc_id") == 900002).first()["embedding"]
    assert a == pytest.approx(b)


def test_semantic_neardup_finds_planted_pair(spark, docs):
    df, src_id = docs
    pairs = semantic_neardup_pairs(df, min_cos=0.8, num_features=512, dim=16)
    got = {(r["id1"], r["id2"]) for r in pairs.collect()}
    assert (src_id, 900001) in got or (900001, src_id) in got
