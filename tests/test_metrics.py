"""Progress metrics: engine listener (X9) + reference-format counters (T7)."""

from __future__ import annotations

from pg2kinesis_spark.sinks.kinesis import InMemoryTransport, KinesisLikeWriter
from pg2kinesis_spark.streaming.metrics import ProgressListener


def test_writer_progress_counters_and_window_reset():
    now = [1001.0]  # off the 10s boundary so the first counts don't flush the window
    lines = []
    w = KinesisLikeWriter(InMemoryTransport(), clock=lambda: now[0], sleep=lambda s: None)
    w.log = lines.append
    w._count_message(100, "7")
    w._count_message(50, "7")
    assert w.cum_msg_count == 2 and w.cum_msg_size == 150
    assert w.msg_window_count == 2
    now[0] = 1010.0  # 10s boundary → log + window reset (ref __main__.py:106-115)
    w._count_message(25, "8")
    assert len(lines) == 1 and "xid: 8" in lines[0] and "cum_count:" in lines[0]
    assert w.msg_window_count == 0
    assert w.cum_msg_count == 3  # cumulative never resets


def test_streaming_listener_collects_progress(spark, tmp_path):
    listener = ProgressListener()
    spark.streams.addListener(listener)
    try:
        df = spark.readStream.format("rate").option("rowsPerSecond", "100").load()
        q = (
            df.writeStream.format("memory")
            .queryName("metrics_smoke")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
        )
        import time

        deadline = time.time() + 30
        while time.time() < deadline and not listener.batches:
            time.sleep(0.3)
        q.stop()
        q.awaitTermination(20)
    finally:
        spark.streams.removeListener(listener)
    assert listener.batches, "listener must observe at least one batch"
    assert all("batchId" in b for b in listener.batches)
