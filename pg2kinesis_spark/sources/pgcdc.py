"""Live Postgres logical-decoding streaming source (production path).

The deployment twin of sources/replay.py: same offset model (LSN), same
single-ordered-partition shape, but reading from a real replication slot
via psycopg2 — the rebuild of the reference's SlotReader
(reference slot.py:36-129):

- slot create/drop tolerate duplicate/absent slots
  (reference slot.py:96-120, S2/S3 idempotency)
- the PK catalog snapshot ships the same information_schema SQL the
  reference sends (reference slot.py:18-33) and feeds
  catalog.primary_key_map
- ``commit(offset)`` sends ``send_feedback(flush_lsn=...)`` — the ack
  that lets Postgres reclaim WAL (reference __main__.py:101-104, S8/X7)

psycopg2 is not installed in this environment; everything here degrades
to ImportError at construction, and the class is excluded from CI. The
replay source exercises the identical engine-facing contract.
"""

from __future__ import annotations

import json

try:
    import psycopg2
    import psycopg2.errorcodes
    import psycopg2.extras

    HAVE_PSYCOPG2 = True
except ImportError:
    HAVE_PSYCOPG2 = False

from pyspark.sql.datasource import DataSource, DataSourceStreamReader, InputPartition

# SQLSTATE codes (public PostgreSQL standard; the values behind
# psycopg2.errorcodes.DUPLICATE_OBJECT / UNDEFINED_OBJECT that the
# reference's tolerance branches compare against, slot.py:102-118).
PG_DUPLICATE_OBJECT = "42710"
PG_UNDEFINED_OBJECT = "42704"

if HAVE_PSYCOPG2:
    ProgrammingError = psycopg2.ProgrammingError
else:
    class ProgrammingError(Exception):
        """Stand-in carrying ``pgcode`` so the slot-lifecycle tolerance
        branches are testable without psycopg2 installed; replaced by
        the real psycopg2.ProgrammingError when it is."""

        def __init__(self, pgcode: str | None = None):
            super().__init__(pgcode)
            self.pgcode = pgcode

# The reference's catalog query, reproduced verbatim in spirit
# (slot.py:18-33): every table, its PK columns where they exist.
PK_SQL = """
SELECT CONCAT(table_schema, '.', table_name) AS table_name,
       column_name, data_type, ordinal_position
FROM information_schema.tables
LEFT JOIN (
    SELECT table_catalog, table_schema, table_name,
           column_name, data_type, ordinal_position
    FROM information_schema.table_constraints
    JOIN information_schema.key_column_usage
      USING (constraint_catalog, constraint_schema, constraint_name,
             table_catalog, table_schema, table_name)
    JOIN information_schema.columns
      USING (table_catalog, table_schema, table_name, column_name)
    WHERE constraint_type = 'PRIMARY KEY'
) pk USING (table_catalog, table_schema, table_name)
WHERE table_type = 'BASE TABLE'
ORDER BY ordinal_position
"""


def _require_psycopg2():
    if not HAVE_PSYCOPG2:  # pragma: no cover
        raise ImportError(
            "psycopg2 is required for the live pgcdc source; use the "
            "cdc_replay source (sources/replay.py) in environments without it"
        )


class PgSlotManager:
    """Connection + slot lifecycle (reference slot.py:36-120).

    ``connection_factory`` (tests): a ``(replication: bool) -> conn``
    callable injected in place of psycopg2.connect, so the S2/S3
    idempotency branches run without a Postgres (the reference mocks
    the cursor the same way, test_slot.py:51-140).
    """

    def __init__(
        self,
        dsn: str,
        slot_name: str = "pg2kinesis",
        plugin: str = "test_decoding",
        connection_factory=None,
    ):
        if connection_factory is None:
            _require_psycopg2()
        self.dsn = dsn
        self.slot_name = slot_name
        self.plugin = plugin
        self._connection_factory = connection_factory

    def _conn(self, replication: bool = False):
        if self._connection_factory is not None:
            return self._connection_factory(replication)
        if replication:  # pragma: no cover - needs PG
            return psycopg2.connect(
                self.dsn, connection_factory=psycopg2.extras.LogicalReplicationConnection
            )
        c = psycopg2.connect(self.dsn)  # pragma: no cover - needs PG
        c.autocommit = True  # pragma: no cover
        return c  # pragma: no cover

    def create_slot(self) -> None:
        """Idempotent create (tolerates DUPLICATE_OBJECT, slot.py:96-108)."""
        with self._conn(replication=True) as conn, conn.cursor() as cur:
            try:
                cur.create_replication_slot(self.slot_name, output_plugin=self.plugin)
            except ProgrammingError as e:
                if e.pgcode != PG_DUPLICATE_OBJECT:
                    raise

    def delete_slot(self) -> None:
        """Idempotent drop (tolerates UNDEFINED_OBJECT, slot.py:110-120)."""
        with self._conn(replication=True) as conn, conn.cursor() as cur:
            try:
                cur.drop_replication_slot(self.slot_name)
            except ProgrammingError as e:
                if e.pgcode != PG_UNDEFINED_OBJECT:
                    raise

    def fetch_pk_catalog(self) -> list[tuple]:  # pragma: no cover - needs PG
        """One catalog round trip (S4/X6); rows feed
        spark.createDataFrame(..., 'table_name string, col_name string,
        col_type string, col_ord_pos int') → catalog.primary_key_map."""
        with self._conn() as conn, conn.cursor() as cur:
            cur.execute(PK_SQL)
            return cur.fetchall()

    def process_replication_stream(self, consume) -> None:
        """START_REPLICATION push loop — exact parity with the
        reference's SlotReader.process_replication_stream
        (slot.py:122-129): wal2json slots get {'include-xids': 1},
        then the blocking consume_stream drives ``consume`` once per
        replication message. This is the reference's deployment surface;
        the Spark stream reader below uses peek/advance polling instead
        (same at-least-once contract) because a Structured Streaming
        source is pull-based — push mode is bridged via QueueConsume.
        """
        options = {"include-xids": 1} if self.plugin == "wal2json" else None
        with self._conn(replication=True) as conn:
            cur = conn.cursor()
            cur.start_replication(slot_name=self.slot_name, options=options)
            cur.consume_stream(consume)


class QueueConsume:
    """Bridge from the push loop to a pull-based reader: buffers
    (lsn, data_size, payload) rows and acks the flushed LSN back on the
    message's own cursor — the reference's ack-after-put feedback
    (__main__.py:101-104) split into its two halves so the sink can ack
    only after Kinesis accepted the batch."""

    def __init__(self, max_buffer: int = 100_000):
        import threading

        self.max_buffer = max_buffer
        self.buffer: list[tuple[int, int, str]] = []
        self._cursors: dict[int, object] = {}
        # consume thread appends while the driver drains — without the
        # lock an append racing the drain swap could land on the
        # already-swapped-out list and silently vanish.
        self._lock = threading.Lock()

    def __call__(self, change) -> None:
        with self._lock:
            if len(self.buffer) >= self.max_buffer:
                raise BufferError(
                    f"CDC buffer exceeded {self.max_buffer} messages without an ack"
                )
            self.buffer.append((change.data_start, change.data_size, change.payload))
            self._cursors[change.data_start] = change.cursor

    def drain(self) -> list[tuple[int, int, str]]:
        with self._lock:
            out, self.buffer = self.buffer, []
        return out

    def ack(self, lsn: int) -> None:
        """send_feedback(flush_lsn=...) on the cursor that delivered the
        message at (or nearest below) this LSN; drops older cursor refs."""
        eligible = [k for k in self._cursors if k <= lsn]
        if not eligible:
            return
        top = max(eligible)
        self._cursors[top].send_feedback(flush_lsn=lsn)
        for k in eligible:
            del self._cursors[k]


class _PgBatch(InputPartition):
    def __init__(self, messages: list[tuple[int, int, str]]):
        self.messages = messages


class PgCdcStreamReader(DataSourceStreamReader):  # pragma: no cover - needs PG
    """Polls the slot with peek semantics; commit() advances the slot.

    Offsets are LSNs; each trigger drains up to rows_per_batch messages
    via pg_logical_slot_peek_changes (non-destructive read), and
    commit() calls pg_replication_slot_advance — so un-acked WAL is
    re-served after a crash: the same at-least-once contract as the
    reference's ack-after-put feedback loop.
    """

    def __init__(self, options: dict):
        _require_psycopg2()
        self.mgr = PgSlotManager(
            options["dsn"], options.get("slot", "pg2kinesis"), options.get("plugin", "test_decoding")
        )
        self.rows_per_batch = int(options.get("rowsperbatch", 1000))
        self._pending: list[tuple[int, int, str]] = []

    def _peek(self) -> list[tuple[int, int, str]]:
        opts = "('include-xids', '1')" if self.mgr.plugin == "wal2json" else ""
        with self.mgr._conn() as conn, conn.cursor() as cur:
            cur.execute(
                f"SELECT lsn, xid, data FROM pg_logical_slot_peek_changes(%s, NULL, %s{',' if opts else ''} {opts})",
                (self.mgr.slot_name, self.rows_per_batch),
            )
            rows = cur.fetchall()
        return [(self._lsn_to_int(l), len(d.encode()), d) for l, _, d in rows]

    @staticmethod
    def _lsn_to_int(lsn: str) -> int:
        hi, lo = lsn.split("/")
        return (int(hi, 16) << 32) | int(lo, 16)

    @staticmethod
    def _int_to_lsn(v: int) -> str:
        return f"{v >> 32:X}/{v & 0xFFFFFFFF:X}"

    def initialOffset(self) -> dict:
        return {"lsn": 0}

    def latestOffset(self) -> dict:
        self._pending = self._peek()
        return {"lsn": self._pending[-1][0]} if self._pending else {"lsn": 0}

    def partitions(self, start: dict, end: dict):
        msgs = [m for m in self._pending if start["lsn"] < m[0] <= end["lsn"]]
        return [_PgBatch(msgs)]

    def read(self, partition: _PgBatch):
        yield from partition.messages

    def commit(self, end: dict) -> None:
        # The ack (S8): Postgres may now reclaim WAL up to this LSN.
        with self.mgr._conn() as conn, conn.cursor() as cur:
            cur.execute(
                "SELECT pg_replication_slot_advance(%s, %s)",
                (self.mgr.slot_name, self._int_to_lsn(end["lsn"])),
            )


class PgCdcPushStreamReader(DataSourceStreamReader):
    """START_REPLICATION push mode wired into the Spark source contract.

    A daemon thread runs the blocking ``consume_stream`` loop
    (reference slot.py:122-129) into a QueueConsume; ``latestOffset``
    drains the buffer on each trigger, ``partitions`` embeds the drained
    messages (executors cannot reach driver memory), and ``commit``
    sends ``send_feedback(flush_lsn=...)`` on the delivering cursor —
    ack-after-put, exactly the reference's two-phase-commit shape.
    The poll reader (peek/advance) remains the default: re-reading
    un-acked WAL after a crash needs no driver-side buffer there. Push
    mode trades that re-read for the reference's lower-latency loop;
    messages held in the buffer before commit are re-served by Postgres
    on restart either way (at-least-once in both modes).
    """

    def __init__(self, options: dict, manager: PgSlotManager | None = None):
        self.mgr = manager or PgSlotManager(
            options["dsn"], options.get("slot", "pg2kinesis"), options.get("plugin", "test_decoding")
        )
        self.queue = QueueConsume(int(options.get("maxbuffer", 100_000)))
        self._thread = None
        self._pending: list[tuple[int, int, str]] = []
        self._last = 0

    def _ensure_started(self) -> None:
        if self._thread is None:
            import threading

            self._thread = threading.Thread(
                target=self.mgr.process_replication_stream, args=(self.queue,), daemon=True
            )
            self._thread.start()

    def initialOffset(self) -> dict:
        return {"lsn": 0}

    def latestOffset(self) -> dict:
        self._ensure_started()
        drained = self.queue.drain()
        if drained:
            self._pending.extend(drained)
            self._last = max(self._last, max(m[0] for m in drained))
        return {"lsn": self._last}

    def partitions(self, start: dict, end: dict):
        msgs = [m for m in self._pending if start["lsn"] < m[0] <= end["lsn"]]
        self._pending = [m for m in self._pending if m[0] > end["lsn"]]
        return [_PgBatch(msgs)]

    def read(self, partition: _PgBatch):
        yield from partition.messages

    def commit(self, end: dict) -> None:
        self.queue.ack(end["lsn"])


class PgCdcDataSource(DataSource):  # pragma: no cover - needs PG
    """spark.readStream.format("pgcdc").option("dsn", ...).load()

    option("mode", "poll"|"push") selects peek/advance polling (default)
    or the START_REPLICATION push loop."""

    @classmethod
    def name(cls) -> str:
        return "pgcdc"

    def schema(self) -> str:
        return "lsn bigint, data_size int, payload string"

    def streamReader(self, schema):
        if self.options.get("mode", "poll") == "push":
            return PgCdcPushStreamReader(self.options)
        return PgCdcStreamReader(self.options)
