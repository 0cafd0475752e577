"""Salted joins/aggregations: exact-equality with the unsalted plan, and
the salt actually spreads the hot key across composite shuffle keys."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pg2kinesis_spark.functions.skew import (
    explode_salt,
    salt_from_row,
    salted_count_distinct,
    salted_join,
)


@pytest.fixture(scope="module")
def skewed(spark):
    # 10k rows, 90% under a single hot key — the shape AQE calls a skew.
    df = spark.range(10000).select(
        F.when(F.col("id") % 10 < 9, F.lit(0)).otherwise(F.col("id") % 100).alias("k"),
        (F.col("id") % 997).alias("v"),
    )
    return df


@pytest.fixture(scope="module")
def dim(spark):
    return spark.range(100).select(F.col("id").alias("k"), F.concat(F.lit("name_"), "id").alias("name"))


def test_salted_join_equals_plain_join(spark, skewed, dim):
    plain = skewed.join(dim, "k").select("k", "v", "name")
    salted = salted_join(skewed, dim, "k", n_salt=8).select("k", "v", "name")
    assert salted.exceptAll(plain).count() == 0
    assert plain.exceptAll(salted).count() == 0


def test_salted_left_join_keeps_unmatched(spark, skewed, dim):
    only_low = dim.filter(F.col("k") < 50)
    plain = skewed.join(only_low, "k", "left").select("k", "v", "name")
    salted = salted_join(skewed, only_low, "k", n_salt=8, how="left").select("k", "v", "name")
    assert salted.exceptAll(plain).count() == 0
    assert plain.exceptAll(salted).count() == 0


def test_salt_is_deterministic_and_spread(spark, skewed):
    s1 = skewed.withColumn("s", salt_from_row(skewed, 8))
    s2 = skewed.withColumn("s", salt_from_row(skewed, 8))
    assert s1.exceptAll(s2).count() == 0  # rerun-stable, content-derived
    # the hot key's rows actually use every salt bucket
    n = s1.filter(F.col("k") == 0).select("s").distinct().count()
    assert n == 8


def test_explode_salt_replicates_dimension(spark, dim):
    assert explode_salt(dim, 8).count() == dim.count() * 8


def test_salted_count_distinct_exact(spark, skewed):
    got = {
        r.k: r.n_distinct for r in salted_count_distinct(skewed, "k", "v", n_salt=8).collect()
    }
    want = {
        r.k: r.n
        for r in skewed.groupBy("k").agg(F.countDistinct("v").alias("n")).collect()
    }
    assert got == want
