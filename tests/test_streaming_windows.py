"""SQ1-SQ3: watermark / tumbling / sliding / session windows on the
events stream (SURVEY §2.9 T6 — absent in the reference, required for
the engine at scale). Each streaming aggregate is checked against its
batch equivalent on the same data."""

from __future__ import annotations

import pytest

from pg2kinesis_spark.sinks.kpl import deaggregate_kpl
from pyspark.sql import functions as F

from pg2kinesis_spark.io import load_table


@pytest.fixture(scope="module")
def events_dir(spark, sf_small, tmp_path_factory):
    """Re-materialize events (ts normalized to TIMESTAMP) for file-stream
    reads — the raw testdata's TIMESTAMP(NANOS) needs the load_table
    shim, then micro-second parquet streams cleanly."""
    path = str(tmp_path_factory.mktemp("events_stream"))
    load_table(spark, sf_small, "events").coalesce(4).write.mode("overwrite").parquet(path)
    return path


def _run_stream_agg(spark, events_dir, build, tmp, name):
    schema = spark.read.parquet(events_dir).schema
    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(events_dir)
    out = build(stream)
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", f"{tmp}/ckpt_{name}")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(name)


def test_sq1_tumbling_window_with_watermark(spark, events_dir, tmp_path):
    def build(stream):
        return (
            stream.withWatermark("ts", "1 hour")
            .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(F.count("*").alias("cnt"), F.sum("value").alias("total"))
            .select(F.col("w.start").alias("ws"), "event_type", "cnt", "total")
        )

    got = _run_stream_agg(spark, events_dir, build, str(tmp_path), "sq1")
    batch = (
        spark.read.parquet(events_dir)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("cnt"), F.sum("value").alias("total"))
        .select(F.col("w.start").alias("ws"), "event_type", "cnt", "total")
    )
    # append mode emits only watermark-closed windows; every emitted row
    # must match the batch result, and most windows must have closed.
    b = {(r.ws, r.event_type): (r.cnt, round(r.total, 6)) for r in batch.collect()}
    g = [(r.ws, r.event_type, r.cnt, round(r.total, 6)) for r in got.collect()]
    assert len(g) > 0.5 * len(b)
    for ws, et, cnt, total in g:
        assert b[(ws, et)] == (cnt, total)


def test_sq2_sliding_window(spark, events_dir, tmp_path):
    def build(stream):
        return (
            stream.withWatermark("ts", "30 minutes")
            .groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
            .agg(F.count("*").alias("cnt"))
            .select(F.col("w.start").alias("ws"), "cnt")
        )

    got = _run_stream_agg(spark, events_dir, build, str(tmp_path), "sq2")
    batch = (
        spark.read.parquet(events_dir)
        .groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count("*").alias("cnt"))
        .select(F.col("w.start").alias("ws"), "cnt")
    )
    b = {r.ws: r.cnt for r in batch.collect()}
    rows = got.collect()
    assert len(rows) > 0
    for r in rows:
        assert b[r.ws] == r.cnt


def test_sq3_session_window(spark, events_dir, tmp_path):
    def build(stream):
        return (
            stream.withWatermark("ts", "30 minutes")
            .groupBy(F.session_window("ts", "10 minutes").alias("w"), "user_id")
            .agg(F.count("*").alias("cnt"))
            .select(F.col("w.start").alias("ws"), "user_id", "cnt")
        )

    got = _run_stream_agg(spark, events_dir, build, str(tmp_path), "sq3")
    batch = (
        spark.read.parquet(events_dir)
        .groupBy(F.session_window("ts", "10 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("cnt"))
        .select(F.col("w.start").alias("ws"), "user_id", "cnt")
    )
    b = {(r.ws, r.user_id): r.cnt for r in batch.collect()}
    rows = got.collect()
    assert len(rows) > 0
    for r in rows:
        assert b[(r.ws, r.user_id)] == r.cnt


def test_wal2json_fullchange_stream(spark, pk_fixture_dir, tmp_path):
    """Full-change mode end-to-end in streaming: unvalidated passthrough,
    CSVPayload envelope with the raw change dict."""
    import json

    from pg2kinesis_spark.sinks.kinesis import InMemoryTransport, KinesisLikeWriter
    from pg2kinesis_spark.streaming.pipeline import build_wal2json_stream, run_until

    corpus = f"{pk_fixture_dir}/cdc_wal2json.parquet"
    n_changes = 2682  # every change in the corpus (no catalog validation)

    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        transport = InMemoryTransport()
        writer = KinesisLikeWriter(transport)
        stream = build_wal2json_stream(
            spark, corpus, pk_map=None, full_change=True, rows_per_batch=3000,
        )
        run_until(
            stream, writer, str(tmp_path / "ckpt"),
            done=lambda: writer.put_message_calls >= n_changes,
        )
        writer.flush_tail()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)

    msgs = [m.decode() for _, data in transport.records for _, m in deaggregate_kpl(data)]
    assert len(msgs) == n_changes
    first = json.loads(msgs[0].split(",", 2)[-1])
    assert set(first) == {"xid", "change"}
    assert isinstance(first["xid"], int)
    assert {"kind", "schema", "table", "columnnames", "columntypes", "columnvalues"} <= set(
        first["change"]
    )


def test_wal2json_stream_matches_batch(spark, pk_fixture_dir, tmp_path):
    """wal2json streaming (stateless per-message xid) over the committed
    fixture corpus equals the batch parse."""
    from pg2kinesis_spark.catalog import primary_key_map
    from pg2kinesis_spark.operators.formatters import format_csv
    from pg2kinesis_spark.operators.wal2json import parse_wal2json
    from pg2kinesis_spark.sinks.kinesis import InMemoryTransport, KinesisLikeWriter
    from pg2kinesis_spark.streaming.pipeline import build_wal2json_stream, run_until

    corpus = f"{pk_fixture_dir}/cdc_wal2json.parquet"
    pk_map = primary_key_map(spark.read.parquet(f"{pk_fixture_dir}/pk_catalog.parquet"))
    batch = format_csv(
        parse_wal2json(spark.read.parquet(corpus), pk_map).orderBy("lsn", "change_idx")
    ).collect()
    expected = [r.fmt_msg for r in batch]

    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        transport = InMemoryTransport()
        writer = KinesisLikeWriter(transport)
        stream = build_wal2json_stream(
            spark, corpus, pk_map, formatter="CSV",
            operations=("insert", "update", "delete"), rows_per_batch=1000,
        )
        run_until(
            stream, writer, str(tmp_path / "ckpt"),
            done=lambda: writer.put_message_calls >= len(expected),
        )
        writer.flush_tail()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)

    streamed = [m.decode() for _, data in transport.records for _, m in deaggregate_kpl(data)]
    assert streamed == expected
