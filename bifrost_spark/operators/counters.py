"""Flow counters & position aggregation — SURVEY.md §2.4 (A1-A3).

The reference keeps ring buffers of time-bucketed event/byte counters per
table/channel (/root/reference/server/count/count.go:11-115 — Minute=12×5s,
TenMinute, Hour, ... buckets) and a TableCount sink plugin
(/root/reference/plugin/TableCount/src/flow.go).  In Spark these are plain
time-window aggregations — partial-combined map-side, so they scale with
cores, not keys.  A3's min-position (source offset ack —
/root/reference/server/input_min_position.go:11-130) is a two-level min.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def flow_counters(events: DataFrame, bucket_seconds: int = 5) -> DataFrame:
    """A1: events + bytes per (time bucket, table, event_type).

    The byte proxy is the serialized payload length (the reference counts
    binlog EventSize).  Returns one row per bucket with insert/update/delete
    breakdowns like the TableCount plugin.
    """
    bucket = F.window(F.col("ts"), f"{bucket_seconds} seconds").getField("start").alias("bucket_start")
    size = (
        F.coalesce(F.length(F.to_json(F.col("after"))), F.lit(0))
        + F.coalesce(F.length(F.to_json(F.col("before"))), F.lit(0))
    )
    return (
        events.groupBy(bucket, F.col("table_name"))
        .agg(
            F.count("*").alias("events"),
            F.sum(size).alias("bytes"),
            F.sum(F.when(F.col("event_type") == "insert", 1).otherwise(0)).alias("inserts"),
            F.sum(F.when(F.col("event_type") == "update", 1).otherwise(0)).alias("updates"),
            F.sum(F.when(F.col("event_type") == "delete", 1).otherwise(0)).alias("deletes"),
        )
    )


def table_counts(events: DataFrame) -> DataFrame:
    """A2: lifetime per-table op counters (TableCount plugin)."""
    return (
        events.filter(F.col("event_type").isin("insert", "update", "delete"))
        .groupBy("schema_name", "table_name", "event_type")
        .agg(F.count("*").alias("n"))
    )


def min_position(per_sink_positions: DataFrame) -> DataFrame:
    """A3: the source may ack offsets up to min(position) across sinks;
    idle sinks (no pending work) are skipped — they report max instead
    (input_min_position.go:82-130).  Input: (sink, is_idle, event_id)."""
    active = per_sink_positions.filter(~F.col("is_idle")).agg(F.min("event_id").alias("ack"))
    idle = per_sink_positions.agg(F.max("event_id").alias("ack"))
    return active.crossJoin(idle.withColumnRenamed("ack", "idle_ack")).select(
        F.coalesce(F.col("ack"), F.col("idle_ack")).alias("ack_event_id")
    )
