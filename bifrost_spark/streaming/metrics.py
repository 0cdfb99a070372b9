"""Per-microbatch throughput metrics for the CDC stream.

The reference exposes live flow counters per channel/table (the admin UI's
monitor graphs — /root/reference/server/count/flow.go, served by
/root/reference/admin/controller/table.go); the Spark rebuild gets the same
numbers from the engine itself: a ``StreamingQueryListener`` captures every
micro-batch's StreamingQueryProgress (rows in, rows/sec, per-phase duration)
and appends it as JSONL next to the table's lineage sidecar
(``_state/stream_metrics.jsonl``), through the same metadata FS the commit
protocol uses — so the metrics survive restarts and work on object-store
table roots.

Listener callbacks run on a driver background thread and deliver
asynchronously (possibly after ``awaitTermination`` returns) — readers poll
or treat the file as eventually-complete, which is the same contract the
reference's sampled counters have.
"""

from __future__ import annotations

import json
import os

from pyspark.sql.streaming import StreamingQueryListener

from bifrost_spark.operators.merge import TargetTable


class StreamMetricsListener(StreamingQueryListener):
    """Appends one JSONL record per micro-batch of the named query.

    Lifecycle: the listener is session-global, so it DEREGISTERS ITSELF when
    its query terminates — otherwise every stream (re)start would leak one
    listener that pins its table handle and re-parses every other query's
    progress forever, and a reused query name would double-append metrics.
    """

    def __init__(self, spark, table: TargetTable, query_name: str):  # noqa: ANN001
        self.spark = spark
        self.table = table
        self.query_name = query_name
        self.query_id: str | None = None

    # -- StreamingQueryListener interface (driver-side, async) ------------
    def onQueryStarted(self, event) -> None:  # noqa: ANN001, N802
        if event.name == self.query_name and self.query_id is None:
            self.query_id = str(event.id)

    def onQueryProgress(self, event) -> None:  # noqa: ANN001, N802
        # cheap name check BEFORE deserializing the full progress payload —
        # this runs on the shared listener-bus thread for every query's
        # every micro-batch
        if event.progress.name != self.query_name:
            return
        p = json.loads(event.progress.json)
        entry = {
            "kind": "stream_progress",
            "query": p.get("name"),
            "batch_id": p.get("batchId"),
            "timestamp": p.get("timestamp"),
            "num_input_rows": p.get("numInputRows"),
            "input_rows_per_sec": p.get("inputRowsPerSecond"),
            "processed_rows_per_sec": p.get("processedRowsPerSecond"),
            "duration_ms": p.get("durationMs", {}),
        }
        self.table._fs.append_line(
            os.path.join(self.table.path, "_state", "stream_metrics.jsonl"),
            json.dumps(entry),
        )

    def onQueryTerminated(self, event) -> None:  # noqa: ANN001, N802
        if self.query_id is not None and str(event.id) == self.query_id:
            self.spark.streams.removeListener(self)

    def onQueryIdle(self, event) -> None:  # noqa: ANN001, N802
        pass


def stream_metrics(table: TargetTable) -> list[dict]:
    """All recorded micro-batch progress entries for a table, in append
    order (advisory — see the async-delivery note in the module docstring)."""
    out: list[dict] = []
    for line in table._fs.read_lines(os.path.join(table.path, "_state", "stream_metrics.jsonl")):
        if line.strip():
            out.append(json.loads(line))
    return out
