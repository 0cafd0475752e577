"""Bucketed co-located joins: the write-once / shuffle-never layout must
actually produce zero-Exchange SortMergeJoins and bucket-pruned probes."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pg2kinesis_spark.bucketing import colocated_join, write_bucketed
from pg2kinesis_spark.io import load_table


def _final_plan(df) -> str:
    df.collect()  # let AQE finalize so the string is the executed plan
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_small):
    write_bucketed(load_table(spark, sf_small, "orders"), "b_orders", "o_custkey", buckets=8)
    write_bucketed(
        load_table(spark, sf_small, "customer").withColumnRenamed("c_custkey", "o_custkey"),
        "b_customer",
        "o_custkey",
        buckets=8,
    )
    yield
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")


def test_colocated_join_has_no_exchange(spark, bucketed_tables):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = colocated_join(spark, "b_orders", "b_customer", "o_custkey").select(
            "o_custkey", "o_orderkey", "c_name"
        )
        plan = _final_plan(j)
        assert "SortMergeJoin" in plan, plan
        assert "Exchange" not in plan, plan  # both sides co-partitioned by layout
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_colocated_join_matches_plain_join(spark, sf_small, bucketed_tables):
    j = colocated_join(spark, "b_orders", "b_customer", "o_custkey")
    plain = load_table(spark, sf_small, "orders").join(
        load_table(spark, sf_small, "customer").withColumnRenamed("c_custkey", "o_custkey"),
        "o_custkey",
    )
    assert j.count() == plain.count()
    a = j.groupBy().agg(F.sum("o_totalprice").alias("s")).collect()[0].s
    b = plain.groupBy().agg(F.sum("o_totalprice").alias("s")).collect()[0].s
    assert abs(a - b) < 1e-6


def test_bucket_pruned_point_lookup(spark, bucketed_tables):
    # autoBucketedScan=true lets the planner fall back to a plain scan
    # when nothing needs the bucket distribution, which also forfeits
    # bucket pruning — force the bucketed scan for the point probe.
    key = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    old = spark.conf.get(key)
    spark.conf.set(key, "false")
    try:
        probe = spark.table("b_orders").filter(F.col("o_custkey") == 371)
        plan = _final_plan(probe)
        # point probe on the bucket key reads 1 of 8 buckets
        assert "SelectedBucketsCount: 1 out of 8" in plan, plan
    finally:
        spark.conf.set(key, old)


def test_write_sorted_yields_disjoint_rowgroup_stats(spark, tmp_path):
    """Sorted-on-write layout: parquet row-group min/max on the sort
    column must be (near-)disjoint across row groups and files, where a
    round-robin write spans the whole domain in every file — the
    statistic the reader's predicate skip lives on."""
    import glob as _glob

    import pyarrow.parquet as pq

    from pg2kinesis_spark.io import write_sorted

    df = spark.range(100_000).selectExpr(
        "cast(pmod(id * 2654435761, 100000) as long) AS k", "id AS v"
    )
    sorted_path = str(tmp_path / "sorted")
    rr_path = str(tmp_path / "roundrobin")
    write_sorted(df, sorted_path, by="k", n_files=8)
    df.repartition(8).write.mode("overwrite").parquet(rr_path)

    def ranges(path):
        out = []
        for f in sorted(_glob.glob(path + "/*.parquet")):
            pf = pq.ParquetFile(f)
            for g in range(pf.metadata.num_row_groups):
                col = pf.metadata.row_group(g).column(0)  # k
                st = col.statistics
                out.append((st.min, st.max))
        return out

    srt = sorted(ranges(sorted_path))
    rr = ranges(rr_path)
    assert len(srt) >= 8
    # sorted: consecutive row-group ranges never overlap (strictly
    # increasing mins, max < next min allowing the boundary value)
    for (lo1, hi1), (lo2, _hi2) in zip(srt, srt[1:]):
        assert hi1 <= lo2
    # round-robin: every row group spans (almost) the whole domain
    assert all(hi - lo > 90_000 for lo, hi in rr)
    # content identical either way
    a = spark.read.parquet(sorted_path).orderBy("k", "v").collect()
    b = spark.read.parquet(rr_path).orderBy("k", "v").collect()
    assert a == b


def test_write_sorted_rejects_zero_files(spark, tmp_path):
    import pytest as _pt

    from pg2kinesis_spark.io import write_sorted

    with _pt.raises(ValueError, match="n_files"):
        write_sorted(spark.range(10), str(tmp_path / "x"), by="id", n_files=0)
