"""S2/S3 slot-lifecycle idempotency (reference slot.py:96-120).

Mirror of the reference's mocked-cursor tests (test_slot.py:51-140):
DUPLICATE_OBJECT on create and UNDEFINED_OBJECT on drop are swallowed
(idempotent re-run); every other error — pgcode or not — re-raises.
No Postgres needed: a fake connection factory stands in for
psycopg2.connect, and ProgrammingError carries the pgcode.
"""

from __future__ import annotations

import pytest

from pg2kinesis_spark.sources.pgcdc import (
    PG_DUPLICATE_OBJECT,
    PG_UNDEFINED_OBJECT,
    PgSlotManager,
    ProgrammingError,
)


class FakeCursor:
    def __init__(self, create_raises=None, drop_raises=None):
        self.create_raises = create_raises
        self.drop_raises = drop_raises
        self.create_calls: list[tuple[str, str]] = []
        self.drop_calls: list[str] = []

    def create_replication_slot(self, slot_name, output_plugin):
        self.create_calls.append((slot_name, output_plugin))
        if self.create_raises is not None:
            raise self.create_raises

    def drop_replication_slot(self, slot_name):
        self.drop_calls.append(slot_name)
        if self.drop_raises is not None:
            raise self.drop_raises

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False


class FakeConn:
    def __init__(self, cursor):
        self._cursor = cursor
        self.replication_requested: list[bool] = []

    def cursor(self):
        return self._cursor

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False


def _mgr(cursor):
    conn = FakeConn(cursor)

    def factory(replication):
        conn.replication_requested.append(replication)
        return conn

    return PgSlotManager("dbname=x", "slot1", "wal2json", connection_factory=factory), conn


def test_create_slot_passes_name_and_plugin():
    cur = FakeCursor()
    mgr, conn = _mgr(cur)
    mgr.create_slot()
    assert cur.create_calls == [("slot1", "wal2json")]
    assert conn.replication_requested == [True]  # replication connection (slot.py:50-53)


def test_create_slot_swallows_duplicate_object():
    cur = FakeCursor(create_raises=ProgrammingError(pgcode=PG_DUPLICATE_OBJECT))
    mgr, _ = _mgr(cur)
    mgr.create_slot()  # no raise — idempotent re-create (slot.py:102-108)
    assert len(cur.create_calls) == 1


def test_create_slot_reraises_other_pgcodes():
    # e.g. OBJECT_IN_USE — anything that isn't "already exists" must surface
    cur = FakeCursor(create_raises=ProgrammingError(pgcode="55006"))
    mgr, _ = _mgr(cur)
    with pytest.raises(ProgrammingError):
        mgr.create_slot()


def test_create_slot_reraises_non_programming_errors():
    cur = FakeCursor(create_raises=RuntimeError("connection lost"))
    mgr, _ = _mgr(cur)
    with pytest.raises(RuntimeError):
        mgr.create_slot()


def test_delete_slot_swallows_undefined_object():
    cur = FakeCursor(drop_raises=ProgrammingError(pgcode=PG_UNDEFINED_OBJECT))
    mgr, _ = _mgr(cur)
    mgr.delete_slot()  # no raise — idempotent drop of an absent slot (slot.py:114-120)
    assert cur.drop_calls == ["slot1"]


def test_delete_slot_reraises_other_pgcodes():
    cur = FakeCursor(drop_raises=ProgrammingError(pgcode="55006"))  # OBJECT_IN_USE
    mgr, _ = _mgr(cur)
    with pytest.raises(ProgrammingError):
        mgr.delete_slot()


def test_delete_slot_reraises_non_programming_errors():
    cur = FakeCursor(drop_raises=RuntimeError("connection lost"))
    mgr, _ = _mgr(cur)
    with pytest.raises(RuntimeError):
        mgr.delete_slot()


def test_recreate_cycle_is_idempotent_end_to_end():
    """--recreate-slot path: drop (absent ok) then create (dup ok) —
    the reference CLI sequence (__main__.py:56-60) never fails on
    either pre-existing state."""
    cur = FakeCursor(
        create_raises=ProgrammingError(pgcode=PG_DUPLICATE_OBJECT),
        drop_raises=ProgrammingError(pgcode=PG_UNDEFINED_OBJECT),
    )
    mgr, _ = _mgr(cur)
    mgr.delete_slot()
    mgr.create_slot()
    assert cur.drop_calls and cur.create_calls


# ---------- START_REPLICATION push-loop parity (reference slot.py:122-129) ----------

class FakeReplMessage:
    def __init__(self, lsn, payload, cursor):
        self.data_start = lsn
        self.data_size = len(payload.encode())
        self.payload = payload
        self.cursor = cursor


class FakeReplCursor:
    """Replication cursor double: start_replication records its args;
    consume_stream pushes a scripted message sequence through the
    callback (the psycopg2 C loop's shape)."""

    def __init__(self, payloads):
        self.payloads = payloads
        self.start_calls = []
        self.feedback = []

    def start_replication(self, slot_name, options=None):
        self.start_calls.append((slot_name, options))

    def consume_stream(self, consume):
        for lsn, p in self.payloads:
            consume(FakeReplMessage(lsn, p, self))

    def send_feedback(self, flush_lsn):
        self.feedback.append(flush_lsn)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False


class FakeReplConn:
    def __init__(self, cursor):
        self._cursor = cursor

    def cursor(self):
        return self._cursor

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False


def _repl_mgr(payloads, plugin):
    cur = FakeReplCursor(payloads)
    mgr = PgSlotManager(
        "dbname=x", "slot1", plugin, connection_factory=lambda repl: FakeReplConn(cur)
    )
    return mgr, cur


def test_start_replication_wal2json_gets_include_xids():
    mgr, cur = _repl_mgr([], "wal2json")
    mgr.process_replication_stream(lambda c: None)
    # reference slot.py:124-127: wal2json → {'include-xids': 1}
    assert cur.start_calls == [("slot1", {"include-xids": 1})]


def test_start_replication_test_decoding_has_no_options():
    mgr, cur = _repl_mgr([], "test_decoding")
    mgr.process_replication_stream(lambda c: None)
    assert cur.start_calls == [("slot1", None)]


def test_queue_consume_buffers_and_acks_on_delivering_cursor():
    from pg2kinesis_spark.sources.pgcdc import QueueConsume

    payloads = [(10, "BEGIN 7"), (12, "table public.t: UPDATE: id[integer]:1"), (14, "COMMIT")]
    mgr, cur = _repl_mgr(payloads, "test_decoding")
    q = QueueConsume()
    mgr.process_replication_stream(q)
    assert q.drain() == [
        (10, len("BEGIN 7"), "BEGIN 7"),
        (12, len(payloads[1][1]), payloads[1][1]),
        (14, 6, "COMMIT"),
    ]
    assert q.drain() == []        # drained
    assert cur.feedback == []     # nothing acked until the sink says so
    q.ack(12)                     # ack after put (S8): feedback w/ flush_lsn
    assert cur.feedback == [12]
    q.ack(14)
    assert cur.feedback == [12, 14]
    q.ack(14)                     # idempotent — cursor ref already dropped
    assert cur.feedback == [12, 14]


def test_queue_consume_backpressure_bounds_buffer():
    from pg2kinesis_spark.sources.pgcdc import QueueConsume

    q = QueueConsume(max_buffer=2)
    mgr, cur = _repl_mgr([(1, "a"), (2, "b"), (3, "c")], "test_decoding")
    with pytest.raises(BufferError):
        mgr.process_replication_stream(q)


def test_push_stream_reader_serves_once_in_order_and_acks():
    """Push-mode reader drives the full DataSourceStreamReader contract
    off the START_REPLICATION thread: messages surface exactly once in
    LSN order across triggers, and commit() sends send_feedback with the
    acked flush_lsn — ack only after the sink's batch succeeded."""
    import time

    from pg2kinesis_spark.sources.pgcdc import PgCdcPushStreamReader

    payloads = [(10, "BEGIN 7"), (12, "table public.t: UPDATE: id[integer]:1"),
                (14, "COMMIT"), (16, "BEGIN 8"), (18, "COMMIT")]
    mgr, cur = _repl_mgr(payloads, "test_decoding")
    r = PgCdcPushStreamReader({"dsn": "dbname=x"}, manager=mgr)

    assert r.initialOffset() == {"lsn": 0}
    served = []
    start = r.initialOffset()
    deadline = time.time() + 5
    while len(served) < len(payloads) and time.time() < deadline:
        end = r.latestOffset()
        if end["lsn"] == start["lsn"]:
            time.sleep(0.01)
            continue
        for part in r.partitions(start, end):
            served.extend(r.read(part))
        r.commit(end)
        start = end

    assert [m[0] for m in served] == [10, 12, 14, 16, 18]  # once, in order
    assert served[1][2] == payloads[1][1]
    assert cur.feedback and cur.feedback[-1] == 18          # acked to the tip
    assert cur.feedback == sorted(cur.feedback)             # monotone acks
    # re-trigger with no new data: empty batch, offset stable
    end2 = r.latestOffset()
    assert end2 == start and r.partitions(start, end2)[0].messages == []
