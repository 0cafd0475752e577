"""Streaming pipeline tests: replay source offsets/acks, stateful xid,
ordered packing sink, retry/backoff, restart at-least-once.

(SURVEY §5 rebuild test plan item 3.)
"""

from __future__ import annotations

import json
import time
import os

import pytest
from pyspark.sql import functions as F

from pg2kinesis_spark.catalog import primary_key_map
from pg2kinesis_spark.operators.formatters import format_csv
from pg2kinesis_spark.operators.test_decoding import parse_test_decoding
from pg2kinesis_spark.sinks.kinesis import (
    AggRecord,
    InMemoryTransport,
    KinesisLikeWriter,
    ProvisionedThroughputExceeded,
)
from pg2kinesis_spark.streaming.pipeline import build_test_decoding_stream, run_until

UUID = "00079f3e-0479-4475-acff-4f225cc5188a"
N_TXNS = 4
MSGS_PER_TXN = 3
TOTAL_LINES = N_TXNS * (MSGS_PER_TXN + 2)


@pytest.fixture(scope="module")
def few_shuffles(spark):
    """Micro-batch stateful stages pay per-partition task overhead; 4 is
    plenty for a 20-row corpus and keeps each trigger fast."""
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    yield
    spark.conf.set("spark.sql.shuffle.partitions", old)


@pytest.fixture(scope="module")
def pk_map(spark):
    catalog = spark.createDataFrame(
        [("public.test_table", "uuid", "uuid", 0)],
        "table_name string, col_name string, col_type string, col_ord_pos int",
    )
    return primary_key_map(catalog)


@pytest.fixture(scope="module")
def corpus(spark, tmp_path_factory):
    """rows_per_batch=7 with 5-line transactions puts batch boundaries
    INSIDE transactions — pins cross-batch xid state."""
    lines = []
    lsn = 10
    for xid in range(7, 7 + N_TXNS):
        lines.append((lsn, f"BEGIN {xid}")); lsn += 2
        for i in range(MSGS_PER_TXN):
            lines.append((lsn, f"table public.test_table: UPDATE: uuid[uuid]:'{UUID[:-1]}{i}'")); lsn += 2
        lines.append((lsn, "COMMIT")); lsn += 2
    path = str(tmp_path_factory.mktemp("corpus") / "corpus.parquet")
    spark.createDataFrame(
        [(l, len(p.encode()), p) for l, p in lines], "lsn long, data_size int, payload string"
    ).coalesce(1).write.mode("overwrite").parquet(path)
    return path


def _msgs(transport):
    from pg2kinesis_spark.sinks.kpl import deaggregate_kpl

    return [m.decode() for _, data in transport.records for _, m in deaggregate_kpl(data)]


@pytest.fixture(scope="module")
def drained(spark, corpus, pk_map, tmp_path_factory, few_shuffles):
    """One full multi-batch run shared by the assertion tests below."""
    tmp = str(tmp_path_factory.mktemp("run"))
    transport = InMemoryTransport()
    writer = KinesisLikeWriter(transport)
    ack_log = os.path.join(tmp, "acks.jsonl")
    stream = build_test_decoding_stream(
        spark, corpus, pk_map, formatter="CSV", operations=("UPDATE",),
        rows_per_batch=7, ack_log=ack_log,
    )
    run_until(
        stream,
        writer,
        os.path.join(tmp, "ckpt"),
        done=lambda: writer.put_message_calls >= N_TXNS * MSGS_PER_TXN
        and writer._agg.num_bytes == 0,
    )
    writer.flush_tail()
    return transport, writer, ack_log


def test_streaming_matches_batch_content_and_order(spark, corpus, pk_map, drained):
    transport, writer, _ = drained
    streamed = _msgs(transport)
    batch = format_csv(parse_test_decoding(spark.read.parquet(corpus), pk_map)).orderBy("lsn").collect()
    expected = [r.fmt_msg for r in batch]
    assert streamed == expected  # content AND order (T2/O2)
    # xid state crossed micro-batch boundaries (W1 streaming form)
    xids = [m.split(",")[2] for m in streamed]
    assert xids == [str(x) for x in range(7, 7 + N_TXNS) for _ in range(MSGS_PER_TXN)]


def test_acks_monotone_and_never_exceed_puts(spark, corpus, drained):
    transport, writer, ack_log = drained
    acks = [json.loads(l)["acked_lsn"] for l in open(ack_log)]
    assert acks, "source commit log must receive acks"
    assert acks == sorted(acks)  # monotone ack watermark (S8/T5)
    max_lsn = spark.read.parquet(corpus).agg(F.max("lsn")).collect()[0][0]
    # ack ≤ put: the last batch's ack may lag one trigger (reference
    # ack-lag, SURVEY §3.2 step 5) but never overtakes delivered data.
    assert acks[-1] <= max_lsn


def test_operation_filter_nulls_still_counted(spark, corpus, pk_map, tmp_path, few_shuffles):
    """operations=('all',) → lowercase set → uppercase UPDATE never
    matches (§8.4): zero published records, but every change row still
    drove a put_message call (§8.6 flush-clock parity)."""
    transport = InMemoryTransport()
    writer = KinesisLikeWriter(transport)
    stream = build_test_decoding_stream(
        spark, corpus, pk_map, formatter="CSV", operations=("all",),
        rows_per_batch=7, ack_log=str(tmp_path / "acks.jsonl"),
    )
    run_until(
        stream, writer, str(tmp_path / "ckpt"),
        done=lambda: writer.put_message_calls >= N_TXNS * MSGS_PER_TXN,
    )
    assert _msgs(transport) == []
    assert writer.put_message_calls >= N_TXNS * MSGS_PER_TXN
    assert writer.physical_puts == 0


def test_restart_is_at_least_once(spark, corpus, pk_map, tmp_path, few_shuffles):
    """Transport dies permanently mid-run → query fails after backoff;
    restart with a healthy transport must deliver every message at least
    once (duplicates allowed — reference README.rst:14-18)."""

    class DyingTransport(InMemoryTransport):
        def __init__(self, die_after):
            super().__init__()
            self.die_after = die_after

        def put_record(self, data, partition_key):
            if len(self.records) >= self.die_after:
                raise ProvisionedThroughputExceeded()
            super().put_record(data, partition_key)

    t1 = DyingTransport(die_after=1)
    # tiny aggregate size → one record per message → mid-batch failure
    w1 = KinesisLikeWriter(t1, back_off_limit=0.1, sleep=lambda s: None, max_agg_bytes=10)
    ack_log = str(tmp_path / "acks.jsonl")
    stream = build_test_decoding_stream(
        spark, corpus, pk_map, formatter="CSV", operations=("UPDATE",),
        rows_per_batch=7, ack_log=ack_log,
    )
    with pytest.raises(Exception):
        run_until(stream, w1, str(tmp_path / "ckpt"), done=lambda: False, timeout=60)

    t2 = InMemoryTransport()
    w2 = KinesisLikeWriter(t2)
    stream2 = build_test_decoding_stream(
        spark, corpus, pk_map, formatter="CSV", operations=("UPDATE",),
        rows_per_batch=7, ack_log=ack_log,
    )
    # same checkpoint → resume from last committed batch
    run_until(
        stream2, w2, str(tmp_path / "ckpt"),
        done=lambda: len(_msgs(t2)) >= N_TXNS * MSGS_PER_TXN and w2._agg.num_bytes == 0,
    )
    w2.flush_tail()

    batch = format_csv(parse_test_decoding(spark.read.parquet(corpus), pk_map)).collect()
    expected = {r.fmt_msg for r in batch}
    delivered = _msgs(t1) + _msgs(t2)
    assert set(delivered) == expected            # nothing lost
    assert len(delivered) >= len(expected)       # dups allowed, loss not


# ---------- sink unit behavior (reference test_stream.py shape) ----------

def test_backoff_schedule_and_exhaustion():
    sleeps = []
    t = InMemoryTransport(fail_times=3)
    w = KinesisLikeWriter(t, back_off_limit=60, sleep=sleeps.append)
    w.put_message("x", "1")
    w.flush_tail()
    assert sleeps == [0.05, 0.1, 0.2]  # 0.05 × 2ⁿ (reference stream.py:54-66)
    assert len(t.records) == 1

    t2 = InMemoryTransport(fail_times=100)
    w2 = KinesisLikeWriter(t2, back_off_limit=0.2, sleep=lambda s: None)
    w2.put_message("x", "1")
    with pytest.raises(ProvisionedThroughputExceeded):
        w2.flush_tail()  # cap exceeded → re-raise (stream.py:73-74)


def test_agg_record_size_flush():
    from pg2kinesis_spark.sinks.kpl import deaggregate_kpl

    # Sizes are *serialized* KPL bytes: 20-byte envelope + 3-byte key
    # table ("1") + 10 bytes per framed 4-byte record → 33, 43, 53...
    t = InMemoryTransport()
    w = KinesisLikeWriter(t, max_agg_bytes=50)
    assert w.put_message("aaaa", "1") is False   # buffered (33 ≤ 50)
    assert w.put_message("bbbb", "1") is False   # still fits (43 ≤ 50)
    assert w.put_message("cccc", "1") is True    # 53 > 50 → flush previous
    w.flush_tail()
    assert [deaggregate_kpl(d) for _, d in t.records] == [
        [("1", b"aaaa"), ("1", b"bbbb")],
        [("1", b"cccc")],
    ]


def test_agg_sizing_is_exact_and_respects_kinesis_limit():
    """The fill check must bound the *serialized* aggregate at 1 MiB —
    raw-user-byte accounting overflows the Kinesis PutRecord limit by
    ~25 % with small CDC records (ValidationException, which escapes
    the throughput-exceeded backoff loop and kills the stream)."""
    rec = AggRecord()
    msg = b"0,CDC,1337,public.blue,Update,123456"  # realistic small CDC line
    xid = 100000
    while rec.add(msg, str(xid), 1 << 20):
        xid += 1  # distinct keys grow the partition-key table too
    blob = rec.serialize()
    assert len(blob) == rec.est_size            # accounting is exact
    assert len(blob) <= 1 << 20                 # full agg fits a Kinesis record
    assert len(blob) > (1 << 20) - 100          # and is packed ~to the brim
    assert rec.num_bytes > (1 << 20) * 0.7      # mostly payload, not framing


def test_send_window_flush():
    now = [1000.0]
    t = InMemoryTransport()
    w = KinesisLikeWriter(t, send_window=13, clock=lambda: now[0], sleep=lambda s: None)
    w.put_message("a", "1")
    assert t.records == []
    now[0] += 14  # window expires; next put triggers the time flush (T3)
    assert w.put_message(None, None) is True  # even a filtered message flushes (§8.6)
    assert _msgs(t) == ["a"]


def test_agg_partition_key_is_first_message_xid():
    rec = AggRecord()
    rec.add(b"m1", "42", 1 << 20)
    rec.add(b"m2", "43", 1 << 20)
    assert rec.partition_key == "42"  # key of a contained record (stream.py:36)


def test_unknown_table_fails_stream(spark, pk_map, tmp_path, few_shuffles):
    """Fail-stop error channel (§8.5): a change for a table missing from
    the PK catalog must kill the stream with the reference's
    _log_and_raise message — never be silently published truncated."""
    lines = [
        (1, "BEGIN 7"),
        (3, "table public.test_table: UPDATE: uuid[uuid]:'a-1'"),
        (5, "table public.never_seen: UPDATE: id[integer]:'5'"),
        (7, "COMMIT"),
    ]
    corpus = str(tmp_path / "bad.parquet")
    spark.createDataFrame(
        [(l, len(p.encode()), p) for l, p in lines], "lsn long, data_size int, payload string"
    ).coalesce(1).write.parquet(corpus)
    transport = InMemoryTransport()
    writer = KinesisLikeWriter(transport)
    stream = build_test_decoding_stream(
        spark, corpus, pk_map, formatter="CSV", operations=("UPDATE",), rows_per_batch=10,
    )
    with pytest.raises(Exception, match="Unable to locate table"):
        run_until(stream, writer, str(tmp_path / "ckpt"), done=lambda: False, timeout=90)


def test_counters_use_reference_units(spark, corpus, pk_map, drained):
    """Progress counters match the reference's Consume loop units
    (reference __main__.py:86-91): every wire line — BEGIN/COMMIT frames
    included — counts once by its wire data_size, while put_message is
    only driven by formatted (change) rows."""
    transport, writer, _ = drained
    total_size, total_lines = (
        spark.read.parquet(corpus).agg(F.sum("data_size"), F.count("*")).first()
    )
    assert writer.cum_msg_count == total_lines == TOTAL_LINES
    assert writer.cum_msg_size == total_size
    assert writer.put_message_calls == N_TXNS * MSGS_PER_TXN


def test_wal2json_table_pat_counts_filtered_messages(spark, pk_map, tmp_path, few_shuffles):
    """Pre-filter counter parity (reference __main__.py:86-91): a
    --table-pat that filters out change 0 — or EVERY change — of a wire
    message must not drop that message from the counters. The reference
    counts every wire message before the formatter's table filter runs;
    the rebuild tags wire_size on every row (skeleton rows survive for
    fully-filtered messages) and the sink counts the first row per lsn."""
    import json

    from pg2kinesis_spark.streaming.pipeline import build_wal2json_stream

    def chg(table, val):
        return {
            "kind": "insert",
            "schema": "public",
            "table": table,
            "columnnames": ["uuid"],
            "columntypes": ["uuid"],
            "columnvalues": [val],
        }

    msgs = [
        # change 0 filtered, change 1 survives → counted via change 1
        (10, {"xid": 1, "change": [chg("skipme", "a"), chg("test_table", "b")]}),
        # every change filtered → counted via the skeleton row
        (20, {"xid": 2, "change": [chg("skipme", "c")]}),
        # empty change array → counted via the empty-message row
        (30, {"xid": 3, "change": []}),
        # nothing filtered → counted normally
        (40, {"xid": 4, "change": [chg("test_table", "d")]}),
    ]
    payloads = [(lsn, json.dumps(m)) for lsn, m in msgs]
    corpus = str(tmp_path / "corpus.parquet")
    spark.createDataFrame(
        [(l, len(p.encode()), p) for l, p in payloads],
        "lsn long, data_size int, payload string",
    ).coalesce(1).write.mode("overwrite").parquet(corpus)

    transport = InMemoryTransport()
    writer = KinesisLikeWriter(transport)
    stream = build_wal2json_stream(
        spark, corpus, pk_map, formatter="CSV", table_pat="test_table", rows_per_batch=10,
    )
    run_until(
        stream, writer, str(tmp_path / "ckpt"), done=lambda: writer.cum_msg_count >= 4
    )
    writer.flush_tail()

    total_size = sum(len(p.encode()) for _, p in payloads)
    assert writer.cum_msg_count == 4          # every wire message counted once
    assert writer.cum_msg_size == total_size  # by its full wire data_size
    # only the two surviving changes format and put
    assert writer.put_message_calls == 2
    assert sorted(_msgs(transport)) == ["0,CDC,1,public.test_table,insert,b",
                                        "0,CDC,4,public.test_table,insert,d"]


def test_fresh_checkpoint_recovers_cursor_from_ack_log(spark, corpus, pk_map, tmp_path, few_shuffles):
    """Restart-cursor recovery (confirmed_flush_lsn semantics): a fresh
    checkpoint that reuses a fully-committed ack log must re-serve ZERO
    rows and never append a regressing ack; a partially-committed log
    resumes exactly after the watermark with batch 0 bounded relative to
    it (not the corpus start)."""
    from pg2kinesis_spark.streaming.pipeline import run_to_sink

    max_lsn, mid_lsn = (
        spark.read.parquet(corpus).agg(F.max("lsn"), F.expr("percentile(lsn, 0.5)")).first()
    )

    # --- fully-committed log → nothing re-served
    ack_log = str(tmp_path / "acks_full.jsonl")
    with open(ack_log, "w") as f:
        f.write(json.dumps({"acked_lsn": int(max_lsn)}) + "\n")
    t = InMemoryTransport()
    w = KinesisLikeWriter(t)
    stream = build_test_decoding_stream(
        spark, corpus, pk_map, formatter="CSV", operations=("UPDATE",),
        rows_per_batch=7, ack_log=ack_log,
    )
    q = run_to_sink(stream, w, str(tmp_path / "ckpt_full"), available_now=True)
    q.awaitTermination(60)
    w.flush_tail()
    assert _msgs(t) == []
    assert w.put_message_calls == 0
    acks = [json.loads(l)["acked_lsn"] for l in open(ack_log) if l.strip()]
    assert acks == sorted(acks) and min(acks) >= int(max_lsn)  # monotone, no regress

    # --- partially-committed log → resume strictly after the watermark
    ack_log2 = str(tmp_path / "acks_mid.jsonl")
    with open(ack_log2, "w") as f:
        f.write(json.dumps({"acked_lsn": int(mid_lsn)}) + "\n")
    t2 = InMemoryTransport()
    w2 = KinesisLikeWriter(t2)
    stream2 = build_test_decoding_stream(
        spark, corpus, pk_map, formatter="CSV", operations=("UPDATE",),
        rows_per_batch=1000, ack_log=ack_log2,
    )
    q2 = run_to_sink(stream2, w2, str(tmp_path / "ckpt_mid"), available_now=True)
    q2.awaitTermination(60)
    w2.flush_tail()
    tail = (
        spark.read.parquet(corpus)
        .filter(F.col("lsn") > int(mid_lsn))
        .count()
    )
    # every wire line after the watermark was served once, none before
    assert w2.put_message_calls + sum(
        1 for r in spark.read.parquet(corpus).filter(F.col("lsn") > int(mid_lsn)).collect()
        if not r.payload.startswith("table ")
    ) == tail


def test_xid_stamp_across_many_arrow_chunks(spark, corpus, pk_map, tmp_path, few_shuffles):
    """_stamp_fn receives a micro-batch as MULTIPLE Arrow chunks once the
    batch exceeds arrow.maxRecordsPerBatch; the stamp must concatenate
    and sort them ONCE by lsn before attributing xids (a per-chunk sort
    would misattribute rows when a BEGIN lands in a later chunk than its
    DML rows). Forcing 4-row chunks over a whole-corpus batch pins this."""
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "4")
    try:
        transport = InMemoryTransport()
        writer = KinesisLikeWriter(transport)
        stream = build_test_decoding_stream(
            spark, corpus, pk_map, formatter="CSV", operations=("UPDATE",),
            rows_per_batch=1000,  # whole corpus in ONE batch → many chunks
        )
        run_until(
            stream, writer, str(tmp_path / "ckpt"),
            done=lambda: writer.put_message_calls >= N_TXNS * MSGS_PER_TXN,
        )
        writer.flush_tail()
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)

    batch = format_csv(parse_test_decoding(spark.read.parquet(corpus), pk_map)).orderBy("lsn").collect()
    assert _msgs(transport) == [r.fmt_msg for r in batch]  # same xids, same order


def test_dedupe_replayed_drops_lsn_repeats_with_bounded_state(spark, pk_map, tmp_path, few_shuffles):
    """At-least-once delivery re-serves un-acked LSNs; dedupe_replayed
    gives consumers effective exactly-once with state bounded to the
    watermark window (not the whole stream)."""
    from pg2kinesis_spark.streaming.pipeline import dedupe_replayed, read_replay_stream

    lines = [
        (10, "BEGIN 7"),
        (12, f"table public.test_table: UPDATE: uuid[uuid]:'{UUID}'"),
        (12, f"table public.test_table: UPDATE: uuid[uuid]:'{UUID}'"),  # replay dup
        (14, "COMMIT"),
        (14, "COMMIT"),                                                 # replay dup
        (16, "BEGIN 8"),
    ]
    corpus = str(tmp_path / "dup_corpus.parquet")
    spark.createDataFrame(
        [(l, len(p.encode()), p) for l, p in lines], "lsn long, data_size int, payload string"
    ).coalesce(1).write.mode("overwrite").parquet(corpus)

    raw = dedupe_replayed(read_replay_stream(spark, corpus, rows_per_batch=100))
    got = []

    def collect_batch(df, _bid):
        got.extend((r.lsn, r.payload) for r in df.collect())

    q = (
        raw.writeStream.foreachBatch(collect_batch)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(90)

    assert sorted(got) == [
        (10, "BEGIN 7"),
        (12, lines[1][1]),
        (14, "COMMIT"),
        (16, "BEGIN 8"),
    ]  # one row per LSN — repeats dropped
    # dedup state is watermark-bounded, not a forever-growing key set
    prog = q.lastProgress
    assert prog is not None and any(
        op.get("operatorName") == "dedupeWithinWatermark"
        for op in prog.get("stateOperators", [])
    )


def test_tws_processor_logic_with_fake_handle(spark):
    """XidStampTws wiring without the streaming engine: Spark's TWS
    driver worker needs the `protobuf` package (absent here), so the
    state handle is faked and the processor's chunk handling + state
    round-trip are pinned directly."""
    import pandas as pd

    from pg2kinesis_spark.streaming.pipeline import XidStampTws

    class FakeValueState:
        def __init__(self):
            self.v = None

        def get(self):
            return self.v

        def update(self, v):
            self.v = v

    class FakeHandle:
        def __init__(self):
            self.state = FakeValueState()

        def getValueState(self, name, schema, ttlDurationMs=None):
            assert name == "cur_xact"
            return self.state

    proc = XidStampTws()
    handle = FakeHandle()
    proc.init(handle)
    # chunks arrive unordered; BEGIN for lsn 2/4 rows sits in the LATER chunk
    c1 = pd.DataFrame({"lsn": [4, 6], "data_size": [1, 1], "payload": ["table t: UPDATE: x", "COMMIT"]})
    c2 = pd.DataFrame({"lsn": [2], "data_size": [1], "payload": ["BEGIN 99"]})
    out = list(proc.handleInputRows((0,), iter([c1, c2]), None))
    got = dict(zip(out[0]["lsn"], out[0]["xid"]))
    assert got == {2: "99", 4: "99", 6: "99"}
    assert handle.state.get() == ("99",)
    # next micro-batch inherits cur_xact from state
    c3 = pd.DataFrame({"lsn": [8], "data_size": [1], "payload": ["table t: UPDATE: y"]})
    out2 = list(proc.handleInputRows((0,), iter([c3]), None))
    assert list(out2[0]["xid"]) == ["99"]
    proc.close()


def test_tws_stamp_matches_stateful_stamp(spark, corpus, tmp_path, few_shuffles):
    """transformWithStateInPandas W1 (stamp_xid_tws) must produce the
    same per-lsn xid attribution as the applyInPandasWithState path,
    including cur_xact carried ACROSS micro-batch boundaries
    (rows_per_batch=7 splits transactions across batches)."""
    # Spark's TWS runtime speaks protobuf to the Python state server
    # (pyspark.sql.streaming.proto generated stubs). Environments
    # without the protobuf package run on the vendored mini-runtime
    # (pg2kinesis_spark/vendor/protoshim — descriptor parsing + real
    # wire format), activated by conftest BEFORE the JVM starts so the
    # Python workers inherit it via PYTHONPATH. With the real protobuf
    # installed, that one is used instead; either way this e2e runs.
    pytest.importorskip("google.protobuf")
    from pg2kinesis_spark.streaming.pipeline import read_replay_stream, stamp_xid_tws

    key = "spark.sql.streaming.stateStore.providerClass"
    default = "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider"
    old = spark.conf.get(key, default)
    spark.conf.set(
        key, "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    )
    rows = []
    try:
        stamped = stamp_xid_tws(read_replay_stream(spark, corpus, rows_per_batch=7))
        # the replay source is a custom Python micro-batch source with no
        # Trigger.AvailableNow support (Spark falls back to ONE batch) —
        # drive it like run_until does: ASAP trigger + done predicate
        q = (
            stamped.writeStream.foreachBatch(lambda df, bid: rows.extend(df.collect()))
            .option("checkpointLocation", str(tmp_path / "tws_ckpt"))
            .trigger(processingTime="0 seconds")
            .start()
        )
        deadline = time.time() + 120
        while len(rows) < TOTAL_LINES and time.time() < deadline:
            time.sleep(0.3)
        q.stop()
        q.awaitTermination(30)
    finally:
        spark.conf.set(key, old)

    got = {r.lsn: r.xid for r in sorted(rows, key=lambda r: r.lsn)}
    # independent oracle: replay the corpus serially, python-side
    cur, want = "", {}
    for r in sorted(spark.read.parquet(corpus).collect(), key=lambda r: r.lsn):
        if r.payload.startswith("BEGIN "):
            cur = r.payload.split(" ", 2)[1]
        want[r.lsn] = cur
    assert got == want
    assert len(rows) == TOTAL_LINES
