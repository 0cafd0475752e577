"""CDC replay streaming source (PySpark Python DataSource API).

The Spark-native rebuild of the reference's replication-slot reader
(reference slot.py:122-129): a streaming source whose **offset is the
LSN** and whose **commit() is the ack** (the reference's
``send_feedback(flush_lsn=...)``, __main__.py:101-104).

In production the read path would speak the Postgres replication
protocol (see sources/pgcdc.py); here it replays a parquet-backed wire
corpus so the full pipeline — source offsets, micro-batches, stateful
parse, ordered sink, commit log — runs end to end in tests exactly as it
would against a live slot.

Offset model: ``{"lsn": <last-served-lsn>}``; each micro-batch serves at
most ``rows_per_batch`` messages in strictly increasing LSN order from a
single partition (a replication slot IS one ordered partition — same
shape as the reference's single connection). ``commit(offset)`` appends
the acked LSN to ``ack_log`` — the analogue of WAL-truncation feedback,
and the thing tests assert at-least-once semantics against.
"""

from __future__ import annotations

import json
import os

from pyspark.sql.datasource import DataSource, DataSourceStreamReader, InputPartition


class _Batch(InputPartition):
    def __init__(self, path: str, start_lsn: int, end_lsn: int):
        self.path = path
        self.start_lsn = start_lsn
        self.end_lsn = end_lsn


class CdcReplayStreamReader(DataSourceStreamReader):
    def __init__(self, options: dict):
        self.path = options["path"]
        self.rows_per_batch = int(options.get("rowsperbatch", 1000))
        self.ack_log = options.get("acklog")
        self._lsns: list[int] | None = None
        self._cursor: int | None = None

    def _all_lsns(self) -> list[int]:
        if self._lsns is None:
            import pyarrow.parquet as pq

            t = pq.read_table(self.path, columns=["lsn"])
            self._lsns = sorted(t.column("lsn").to_pylist())
        return self._lsns

    def initialOffset(self) -> dict:
        # A fresh checkpoint that reuses an existing ack log starts at
        # the ack watermark, not the corpus start — otherwise batch 0
        # would span [corpus start, recovered + rows_per_batch]: one
        # unbounded batch re-serving the whole previously-acked range,
        # defeating the rows_per_batch backpressure knob. This is the
        # slot's confirmed_flush_lsn semantics: acked WAL is reclaimed.
        recovered = self._recovered_cursor()
        if recovered is not None:
            self._cursor = recovered
            return {"lsn": recovered}
        lsns = self._all_lsns()
        return {"lsn": (lsns[0] - 1) if lsns else 0}

    def _recovered_cursor(self) -> int | None:
        """After a restart the in-memory cursor is gone; the last acked
        LSN in the ack log is the durable low-water mark (the analogue of
        the slot's confirmed_flush_lsn). Without it, a restart whose
        every batch was committed would re-serve the whole corpus and
        append regressing acks."""
        if not self.ack_log or not os.path.exists(self.ack_log):
            return None
        last = None
        with open(self.ack_log) as f:
            for line in f:
                if line.strip():
                    last = json.loads(line)["acked_lsn"]
        return last

    def latestOffset(self) -> dict:
        # Advance by at most rows_per_batch messages per trigger — the
        # backpressure knob (maxOffsetsPerTrigger analogue, T4). The
        # cursor lives on the driver for the lifetime of the query; after
        # a restart it is recovered from the ack log (commit watermark),
        # and partitions() re-syncs it from the checkpointed start.
        import bisect

        lsns = self._all_lsns()
        if not lsns:
            return {"lsn": 0}
        if self._cursor is None:
            self._cursor = self._recovered_cursor()
        cur = self._cursor if self._cursor is not None else lsns[0] - 1
        i = bisect.bisect_right(lsns, cur)
        j = min(i + self.rows_per_batch, len(lsns))
        new = lsns[j - 1] if j > i else cur
        self._cursor = new
        return {"lsn": new}

    def partitions(self, start: dict, end: dict) -> list[InputPartition]:
        # ONE partition: a replication slot is an ordered log; parallelism
        # belongs downstream of the parse (SURVEY §4, T2).
        self._cursor = max(self._cursor or 0, end["lsn"])
        return [_Batch(self.path, start["lsn"], end["lsn"])]

    def read(self, partition: _Batch):
        import pyarrow.parquet as pq

        t = pq.read_table(partition.path, columns=["lsn", "data_size", "payload"])
        rows = sorted(
            zip(
                t.column("lsn").to_pylist(),
                t.column("data_size").to_pylist(),
                t.column("payload").to_pylist(),
            )
        )
        for lsn, size, payload in rows:
            if partition.start_lsn < lsn <= partition.end_lsn:
                yield (lsn, size, payload)

    def commit(self, end: dict) -> None:
        # The ack point (S8): progress is durable from the source's point
        # of view only once the sink batch holding these LSNs succeeded.
        if self.ack_log:
            with open(self.ack_log, "a") as f:
                f.write(json.dumps({"acked_lsn": end["lsn"], "pid": os.getpid()}) + "\n")


class CdcReplayDataSource(DataSource):
    """spark.readStream.format("cdc_replay").option("path", ...).load()"""

    @classmethod
    def name(cls) -> str:
        return "cdc_replay"

    def schema(self) -> str:
        return "lsn bigint, data_size int, payload string"

    def streamReader(self, schema) -> CdcReplayStreamReader:
        return CdcReplayStreamReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(CdcReplayDataSource)
