"""Bucketed tables: pay the shuffle once at write time, join for free
forever after.

At 100 TB the dominant cost of a repeated equi-join (fact-to-fact, or
any self-join pipeline like LSH banding) is re-shuffling both sides on
the join key every run. Spark's bucketed tables move that shuffle to
write time: ``bucketBy(n, key)`` hash-partitions rows into ``n`` files
per write-task group, records the layout in the catalog, and the planner
then proves both sides of a same-key join are co-partitioned — the
SortMergeJoin runs with ZERO Exchange on either side (pinned by
``tests/test_bucketing.py``).

Rules that make this work (and that ``write_bucketed`` encodes):
- both tables must use the SAME bucket count on the SAME key type;
- ``sortBy`` within buckets lets the join skip its sort when each bucket
  holds one file per side;
- bucket pruning (``SelectedBucketsCount``) kicks in for point lookups
  on the bucket key — a ``key = literal`` probe reads 1/n of the data.

The reference system has no storage layer at all (it streams row by
row); this module is the scale-out answer to the same workload shape the
reference's PK-catalog hash join (J3) serves — repeated key lookups —
expressed as a first-class Spark layout decision.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    buckets: int = 32,
    sort: bool = True,
) -> None:
    """Materialize ``df`` as a bucketed (and bucket-sorted) parquet table
    in the session catalog, replacing any previous version."""
    df.sparkSession.sql(f"DROP TABLE IF EXISTS {table}")
    w = df.write.mode("overwrite").format("parquet").bucketBy(buckets, key)
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)


def colocated_join(
    spark: SparkSession, left: str, right: str, key: str, how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed catalog tables on their bucket key.

    With matching bucket specs the planner emits a shuffle-free
    SortMergeJoin; this helper only names the pattern — the zero-Exchange
    guarantee comes from the table layout, not from code here.
    """
    return spark.table(left).join(spark.table(right), key, how)
