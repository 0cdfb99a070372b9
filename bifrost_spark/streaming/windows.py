"""Event-time windowed flow counters with watermark — late-data handling.

The reference's ring-buffer counters bucket by ARRIVAL time
(/root/reference/server/count/count.go:11-115 — whatever second the event
hits the accumulator).  The Spark-native upgrade buckets by EVENT time
(binlog header timestamp) with a watermark: late events still land in the
window they belong to, and a window only emits once the watermark passes
its end — the Structured Streaming pattern for A1-style time series.

Append output mode ⇒ each window row is emitted exactly once (closed
windows only), so the parquet sink is an immutable time series a dashboard
can tail.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

from bifrost_spark.schemas import EVENT_SCHEMA


def windowed_flow_counts(events: DataFrame, window: str = "5 seconds",
                         watermark: str = "10 seconds") -> DataFrame:
    """Per (event-time window, table, event_type) counts; watermarked so the
    state store evicts closed windows (bounded state at stream scale)."""
    return (
        events.filter(F.col("event_type").isin("insert", "update", "delete"))
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "table_name", "event_type")
        .agg(F.count("*").alias("n"), F.max("event_id").alias("max_event_id"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "table_name",
            "event_type",
            "n",
            "max_event_id",
        )
    )


def start_windowed_flow_stream(
    spark: SparkSession,
    log_path: str,
    out_path: str,
    checkpoint_dir: str,
    window: str = "5 seconds",
    watermark: str = "10 seconds",
    max_files_per_trigger: int = 4,
) -> StreamingQuery:
    stream_schema = T.StructType(list(EVENT_SCHEMA.fields) + [T.StructField("chunk", T.StringType())])
    events = (
        spark.readStream.schema(stream_schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(log_path)
        .drop("chunk")
    )
    agg = windowed_flow_counts(events, window=window, watermark=watermark)
    return (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def session_window_stats(events: DataFrame, gap: str = "30 minutes",
                         watermark: str = "1 hour",
                         user_col: str = "user_id") -> DataFrame:
    """Streaming twin of ``functions/sessions.session_stats``: Spark's
    native ``session_window`` aggregation — windows merge while events keep
    arriving within ``gap`` of the session's edge, close when the watermark
    passes (append mode emits each closed session exactly once; state per
    open session only, evicted on close — bounded like the dedup stream).

    Boundary semantics match the batch twin, pinned in tests: an event
    landing EXACTLY ``gap`` after the previous one merges into the SAME
    session in both (session_window treats the ``ts + gap`` edge as
    inclusive for merging; the batch operator splits only on
    ``diff > gap``)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), user_col)
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(18,6)")).cast("double"), 4).alias("sum_value"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
        .select(user_col, "session_start", "session_end", "n_events", "sum_value")
    )


def start_session_stream(
    spark: SparkSession,
    in_path: str,
    out_path: str,
    checkpoint_dir: str,
    schema: T.StructType,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> StreamingQuery:
    """File-source ingest → session_window rollup → append parquet sink."""
    events = spark.readStream.schema(schema).json(in_path)
    agg = session_window_stats(events, gap=gap, watermark=watermark)
    return (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
