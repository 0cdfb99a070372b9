"""Stateful streaming flow counters — applyInPandasWithState.

The reference keeps LONG-LIVED in-memory accumulators fed by a channel: ring
buffers of time-bucketed event/byte counts per table that survive across
batches for as long as the process runs
(/root/reference/server/count/count.go:11-115, consumer
/root/reference/server/count/cosume.go).  A per-micro-batch groupBy cannot
express that — the running total must live in OPERATOR STATE across
triggers.  This is the engine's custom stateful streaming operator
(SURVEY.md §2.4 A1), built on ``applyInPandasWithState``:

- grouped by ``table_name`` (the reference's accumulator key);
- state = running (events, bytes, inserts, updates, deletes) totals plus
  the max event_id seen — checkpointed by Spark, so a restart resumes the
  totals exactly like the reference reloading its flow doc from LevelDB;
- each trigger emits one row per table with the batch delta AND the
  running totals (Arrow-vectorized: the per-batch math is pandas column
  ops, no per-row Python).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from bifrost_spark.schemas import EVENT_SCHEMA

STATE_SCHEMA = T.StructType(
    [
        T.StructField("events", T.LongType()),
        T.StructField("bytes", T.LongType()),
        T.StructField("inserts", T.LongType()),
        T.StructField("updates", T.LongType()),
        T.StructField("deletes", T.LongType()),
        T.StructField("max_event_id", T.LongType()),
    ]
)

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("table_name", T.StringType()),
        T.StructField("batch_events", T.LongType()),
        T.StructField("total_events", T.LongType()),
        T.StructField("total_bytes", T.LongType()),
        T.StructField("total_inserts", T.LongType()),
        T.StructField("total_updates", T.LongType()),
        T.StructField("total_deletes", T.LongType()),
        T.StructField("max_event_id", T.LongType()),
    ]
)


def _update(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    ev = by = ins = upd = dl = 0
    meid = -1
    if state.exists:
        ev, by, ins, upd, dl, meid = state.get
    b_ev = b_by = b_ins = b_upd = b_dl = 0
    b_meid = meid
    for pdf in pdfs:
        b_ev += len(pdf)
        b_by += int(pdf["approx_bytes"].sum())
        vc = pdf["event_type"].value_counts()
        b_ins += int(vc.get("insert", 0))
        b_upd += int(vc.get("update", 0))
        b_dl += int(vc.get("delete", 0))
        if len(pdf):
            b_meid = max(b_meid, int(pdf["event_id"].max()))
    state.update((ev + b_ev, by + b_by, ins + b_ins, upd + b_upd, dl + b_dl, b_meid))
    yield pd.DataFrame(
        [
            {
                "table_name": key[0],
                "batch_events": b_ev,
                "total_events": ev + b_ev,
                "total_bytes": by + b_by,
                "total_inserts": ins + b_ins,
                "total_updates": upd + b_upd,
                "total_deletes": dl + b_dl,
                "max_event_id": b_meid,
            }
        ]
    )


def flow_counter_updates(events: DataFrame) -> DataFrame:
    """Wire the stateful counter over a (streaming) event DataFrame.

    The byte proxy is computed DataFrame-side (JVM expressions) so only
    three narrow columns cross into the Python state function.
    """
    narrow = events.filter(
        F.col("event_type").isin("insert", "update", "delete")
    ).select(
        "table_name",
        "event_type",
        "event_id",
        (
            F.coalesce(F.length(F.to_json(F.col("after"))), F.lit(0))
            + F.coalesce(F.length(F.to_json(F.col("before"))), F.lit(0))
        ).cast("long").alias("approx_bytes"),
    )
    return narrow.groupBy("table_name").applyInPandasWithState(
        _update, OUTPUT_SCHEMA, STATE_SCHEMA, "update", GroupStateTimeout.NoTimeout
    )


def start_flow_counter_stream(
    spark: SparkSession,
    log_path: str,
    out_path: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 1,
) -> StreamingQuery:
    """Tail the chunked event log and append per-trigger running totals to
    ``out_path`` (parquet) — the Spark shape of the TableCount sink plugin
    (/root/reference/plugin/TableCount/src/flow.go)."""
    stream_schema = T.StructType(list(EVENT_SCHEMA.fields) + [T.StructField("chunk", T.StringType())])
    events = (
        spark.readStream.schema(stream_schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(log_path)
        .drop("chunk")
    )
    updates = flow_counter_updates(events)

    def _sink(batch_df: DataFrame, epoch_id: int) -> None:
        batch_df.withColumn("epoch", F.lit(epoch_id)).write.mode("append").parquet(out_path)

    return (
        updates.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
