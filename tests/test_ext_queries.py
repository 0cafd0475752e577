"""Tests for the extended operators: as-of join semantics, approximate
sketch tolerance, streaming dropDuplicates (SQ4)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from pg2kinesis_spark.io import load_table
from pg2kinesis_spark.operators.asof import asof_join


def _ts(minute):
    return dt.datetime(2024, 1, 1, 0, minute)


@pytest.fixture(scope="module")
def quotes_trades(spark):
    quotes = spark.createDataFrame(
        [
            ("A", _ts(0), 10.0),
            ("A", _ts(5), 11.0),
            ("A", _ts(10), 12.0),
            ("B", _ts(3), 100.0),
        ],
        "sym string, qts timestamp, px double",
    )
    trades = spark.createDataFrame(
        [
            ("A", _ts(1), 1),   # after quote@0  → px 10
            ("A", _ts(5), 2),   # exactly at quote@5 → px 11 (<= matches)
            ("A", _ts(7), 3),   # between 5 and 10 → px 11
            ("B", _ts(2), 4),   # before any B quote → NULL
            ("C", _ts(9), 5),   # no quotes at all → NULL
        ],
        "sym string, tts timestamp, qty int",
    )
    return quotes, trades


def test_asof_join_semantics(spark, quotes_trades):
    quotes, trades = quotes_trades
    out = {
        r.qty: r.px_r
        for r in asof_join(
            trades, quotes, on="sym", left_time="tts", right_time="qts", right_cols=["px"]
        ).collect()
    }
    assert out == {1: 10.0, 2: 11.0, 3: 11.0, 4: None, 5: None}


def test_asof_join_no_row_explosion(spark, quotes_trades):
    quotes, trades = quotes_trades
    out = asof_join(trades, quotes, on="sym", left_time="tts", right_time="qts", right_cols=["px"])
    assert out.count() == trades.count()  # exactly one output row per left row


def test_approx_distinct_within_tolerance(spark, sf_small):
    orders = load_table(spark, sf_small, "orders")
    row = orders.agg(
        F.approx_count_distinct("o_custkey", 0.01).alias("approx"),
        F.countDistinct("o_custkey").alias("exact"),
    ).collect()[0]
    assert abs(row.approx - row.exact) / row.exact < 0.05


def test_q21_carries_the_sketch_witness_rows(spark, sf_small):
    """The former q30 rows live in q21's tagged union (round-11
    consolidation): a 'hll' row whose val is 1.0 when this engine's
    own sketch lands within ±5% of the exact count, plus the exact
    interpolated percentile rows — the recipe that keeps an
    approximate operator hash-checkable."""
    from pg2kinesis_spark.plans.queries import q21

    rows = {r.tag: r for r in q21(spark, sf_small).collect() if r.bucket is None}
    assert set(rows) == {"hll", "p25", "p50", "p75"}
    assert rows["hll"].val == 1.0
    assert rows["hll"].cnt > 0
    assert rows["p25"].val <= rows["p50"].val <= rows["p75"].val
    # every sketch row repeats the exact distinct count in cnt
    assert len({r.cnt for r in rows.values()}) == 1


def test_sq4_streaming_drop_duplicates(spark, tmp_path):
    """Streaming exact dedup with watermarked state — the streaming form
    of the dedup operator family."""
    src = str(tmp_path / "src")
    rows = [(i, _ts(i % 7), f"key{i % 10}") for i in range(50)]
    df = spark.createDataFrame(rows, "i long, ts timestamp, k string")
    df.coalesce(2).write.parquet(src)

    stream = (
        spark.readStream.schema(df.schema).option("maxFilesPerTrigger", 1).parquet(src)
        .withWatermark("ts", "1 hour")
        .dropDuplicates(["k"])
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("sq4")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.table("sq4").collect()
    assert len(got) == 10  # one survivor per key
    assert sorted({r.k for r in got}) == sorted({r[2] for r in rows})
