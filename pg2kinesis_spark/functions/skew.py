"""Skew mitigation for hot join/aggregation keys.

Two complementary tools for the 100 TB case where one key holds a
disproportionate share of rows (the classic: a null-ish default key, a
celebrity user, an empty-document shingle):

- **AQE skew-join splitting** is on in the session factory
  (``spark.sql.adaptive.skewJoin.enabled``) — at runtime Spark splits a
  skewed shuffle partition into sub-partitions and replicates the other
  side. This handles sort-merge joins transparently; nothing to do.
- **Deterministic salting** (this module) is the plan-level fix for the
  cases AQE does not cover: broadcast-ineligible dimension joins you
  want co-partitioned, and per-key aggregations whose single reducer
  would otherwise own the hot key. The salt is derived from a HASH OF
  THE ROW CONTENT, never ``rand()`` — reruns and retried tasks must
  land rows in the same salt bucket or at-least-once sinks double-count.

``salted_join`` replicates the dimension side ``n_salt``× (explode of a
small literal array — the dimension is small by assumption, that's why
it's a dimension) and splits the fact side's hot key across
``(key, salt)`` composite keys, so the hot key's rows spread over
``n_salt`` reducers instead of one. Results are exactly a plain join:
each fact row matches exactly one replica of each dimension row.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT = "_salt"


def salt_from_row(df: DataFrame, n_salt: int) -> Column:
    """Deterministic salt in [0, n_salt): xxhash64 over every column.

    Content-derived, so a retried task or a rerun of the whole job
    assigns each row the same salt (unlike rand()-based salting).
    """
    return F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salt))


def explode_salt(dim: DataFrame, n_salt: int) -> DataFrame:
    """Replicate a (small) dimension ``n_salt``× with a salt id column."""
    return dim.withColumn(
        SALT, F.explode(F.array(*[F.lit(i) for i in range(n_salt)]))
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    n_salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join a skewed fact table against a small dimension, spreading
    each fact key over ``n_salt`` composite shuffle keys.

    Identical output to ``fact.join(dim, key, how)`` for how in
    {inner, left}: every fact row carries exactly one salt value and the
    dimension carries all of them.
    """
    f = fact.withColumn(SALT, salt_from_row(fact, n_salt))
    d = explode_salt(dim, n_salt)
    return f.join(d, [key, SALT], how).drop(SALT)


def salted_count_distinct(
    df: DataFrame, key: str, value: str, n_salt: int = 16
) -> DataFrame:
    """Per-key COUNT(DISTINCT value) that never funnels a hot key into a
    single reducer.

    Phase 1 dedups (key, salt-of-value, value) — the hot key's distinct
    set is partitioned across ``n_salt`` reducers; phase 2 sums the
    per-salt distinct counts, a shuffle of at most ``n_salt`` small rows
    per key. Exact (not approximate): value-hash salting puts equal
    values in the same salt bucket, so no distinct value is counted
    twice across buckets.
    """
    salted = df.select(
        key, F.col(value).alias("_v"), F.pmod(F.xxhash64(value), F.lit(n_salt)).alias(SALT)
    )
    per_salt = salted.distinct().groupBy(key, SALT).agg(F.count("*").alias("_n"))
    return per_salt.groupBy(key).agg(F.sum("_n").alias("n_distinct"))
