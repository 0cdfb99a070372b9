"""Structured Streaming wrapper: event-log file stream → foreachBatch apply.

The streaming shape of the replay engine (SURVEY.md §7 step 4): the file
source tails the chunked event log the way the reference's dump goroutine
tails the binlog (/root/reference/Bristol/mysql/conn_dump.go:97-299); Spark's
checkpoint replaces the LevelDB position store for SOURCE offsets
(/root/reference/server/storage.go:52-128), and the TargetTable commit
manifest makes the SINK exactly-once even if the checkpoint is wiped —
``foreachBatch`` is only at-least-once on its own.

On a real deployment the source line changes to
``spark.readStream.format("kafka")`` + the format decoders in
bifrost_spark/sources/kafka_formats.py; everything downstream is identical.

Ordering: the file source does NOT guarantee event-log chunk order, so the
engine runs with ``ordered=False`` — correctness comes from the commutative
tombstone/guard MERGE + manifests, not from a high-water-mark skip.  DML is
safe in any batch order; DDL events are assumed in-order relative to the DML
they affect (a Kafka source with a single control partition, or the chunked
batch driver, provides this; it is the same assumption the reference makes
by serializing DDL through its single dump thread).
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

from bifrost_spark.operators.merge import TargetTable
from bifrost_spark.pipelines.replay import ReplayEngine
from bifrost_spark.schemas import EVENT_SCHEMA


def start_cdc_stream(
    spark: SparkSession,
    log_path: str,
    table: TargetTable,
    checkpoint_dir: str,
    max_files_per_trigger: int = 1,
    available_now: bool = True,
    lww_strategy: str = "agg",
    ordered: bool = False,
    auto_compact_snapshots: int | None = None,
    query_name: str | None = None,
    metrics: bool = True,
) -> StreamingQuery:
    engine = ReplayEngine(table, lww_strategy, ordered=ordered,
                          auto_compact_snapshots=auto_compact_snapshots)
    if query_name is None:
        # unique per start: the metrics listener is session-global and
        # filters on the query name, so a reused name would route one
        # stream's progress into every same-named table's metrics file.
        import uuid

        query_name = f"bifrost_cdc_{uuid.uuid4().hex[:8]}"
    listener = None
    if metrics:
        # throughput metrics per micro-batch → _state/stream_metrics.jsonl
        # (the reference's flow-monitor counters, streaming/metrics.py);
        # registered BEFORE start so the first batch is captured, and
        # self-deregistering on query termination (no listener leak).
        # Caller-supplied query_names reused across quick restarts can
        # briefly overlap two live listeners (the old onQueryTerminated is
        # async) — the default uuid name avoids that entirely.
        from bifrost_spark.streaming.metrics import StreamMetricsListener

        listener = StreamMetricsListener(spark, table, query_name)
        spark.streams.addListener(listener)
    # NB: StructType.add mutates in place — build a copy, never touch the
    # shared EVENT_SCHEMA.
    stream_schema = T.StructType(list(EVENT_SCHEMA.fields) + [T.StructField("chunk", T.StringType())])
    events = (
        spark.readStream.schema(stream_schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(log_path)
        .drop("chunk")
    )

    def _apply(batch_df, epoch_id: int):  # noqa: ANN001
        engine.apply_batch(batch_df)
        engine.maybe_maintain()

    writer = (
        events.writeStream.queryName(query_name)
        .foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    try:
        return writer.start()
    except Exception:
        # start() failed → onQueryTerminated will never fire for this
        # listener; deregister here or it leaks on the session for good.
        if listener is not None:
            spark.streams.removeListener(listener)
        raise
