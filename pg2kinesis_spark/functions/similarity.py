"""Similarity search over embedding columns (array<float>).

- ``cosine_topk``     — exact brute-force top-k: the correctness baseline.
                        Dot products are JVM-side zip_with/aggregate
                        lambdas in double precision (oracle-parity with
                        DuckDB's list_cosine_similarity on DOUBLE[]).
- ``srp_buckets`` /
  ``srp_ann_topk``    — the scale path: sign-random-projection LSH.
                        Vectors hash to a B-bit bucket; only same-bucket
                        (plus optional 1-bit-probe) pairs are scored, so
                        the pair count drops from N² to Σ bucket².

At 100 TB the brute-force join is a broadcast of the query side against
a partitioned corpus (queries ≪ corpus); srp buckets turn that into a
bucket-key equi-join. Both shapes avoid ever shuffling the corpus twice.
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def _dot(a: str, b: str) -> Column:
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * cast(y as double)),"
        " cast(0.0 as double), (acc, v) -> acc + v)"
    )


def _norm(a: str) -> Column:
    return F.sqrt(_dot(a, a))


def with_cosine(pairs: DataFrame, a: str = "a.embedding", b: str = "b.embedding") -> DataFrame:
    return pairs.withColumn("cos", _dot(a, b) / (_norm(a) * _norm(b)))


def cosine_pairs(emb: DataFrame, min_cos: float) -> DataFrame:
    """All pairs with cosine ≥ threshold (embedding-space near-dup)."""
    a = emb.alias("a")
    b = emb.alias("b")
    joined = a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
    return (
        with_cosine(joined)
        .filter(F.col("cos") >= min_cos)
        .select(F.col("a.vec_id").alias("id1"), F.col("b.vec_id").alias("id2"), "cos")
    )


def cosine_topk(emb: DataFrame, queries: DataFrame, k: int = 5) -> DataFrame:
    """Exact top-k neighbors per query vector by cosine.

    ``queries`` (vec_id, embedding) is expected to be small — broadcast
    it so the corpus never shuffles; ranking happens per query partition.
    """
    q = F.broadcast(queries.select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("qemb"))).alias("q")
    c = emb.alias("c")
    scored = (
        c.join(q, F.col("c.vec_id") != F.col("query_id"))
        .withColumn("cos", _dot("qemb", "c.embedding") / (_norm("qemb") * _norm("c.embedding")))
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("c.vec_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", F.col("c.vec_id").alias("neighbor_id"), "cos", "rnk")
    )


def srp_planes(dim: int, n_bits: int = 8, seed: int = 11) -> list[list[float]]:
    """Deterministic random hyperplanes for sign-random-projection."""
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_bits)]


def srp_buckets(emb: DataFrame, dim: int, n_bits: int = 8, seed: int = 11) -> DataFrame:
    """Assign each vector a B-bit LSH bucket (JVM-side expressions only)."""
    planes = srp_planes(dim, n_bits, seed)
    bucket = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        arr = "array(" + ", ".join(f"cast({x!r} as double)" for x in plane) + ")"
        dot = F.expr(
            f"aggregate(zip_with(embedding, {arr}, (x, y) -> cast(x as double) * y),"
            " cast(0.0 as double), (acc, v) -> acc + v)"
        )
        bucket = bucket + F.when(dot > 0, F.lit(1 << i)).otherwise(0)
    return emb.withColumn("bucket", bucket)


def srp_ann_topk(
    emb: DataFrame, queries: DataFrame, dim: int, k: int = 5, n_bits: int = 8, seed: int = 11
) -> DataFrame:
    """Approximate top-k: score only same-bucket candidates.

    Recall is tunable via n_bits (fewer bits → bigger buckets → higher
    recall, more compute). The candidate join is a bucket equi-join —
    at scale, the corpus is hash-partitioned by bucket once and reused
    across query batches.
    """
    c = srp_buckets(emb, dim, n_bits, seed).alias("c")
    q = F.broadcast(
        srp_buckets(queries, dim, n_bits, seed).select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("qemb"), F.col("bucket").alias("qbucket")
        )
    ).alias("q")
    scored = (
        c.join(q, (F.col("c.bucket") == F.col("qbucket")) & (F.col("c.vec_id") != F.col("query_id")))
        .withColumn("cos", _dot("qemb", "c.embedding") / (_norm("qemb") * _norm("c.embedding")))
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("c.vec_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", F.col("c.vec_id").alias("neighbor_id"), "cos", "rnk")
    )
