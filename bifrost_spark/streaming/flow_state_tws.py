"""Stateful streaming flow counters — transformWithStateInPandas.

The Spark 4 successor API to ``applyInPandasWithState`` (flow_state.py —
kept as the portable fallback): a ``StatefulProcessor`` with typed
ValueState gives the same long-lived per-table accumulators the reference
holds in memory (/root/reference/server/count/count.go:11-115), plus what
the old API couldn't express — state TTL, timers, and independent state
variables — which is where idle-table expiry (the reference prunes idle
flow docs) would land.

Requires the RocksDB state store (transformWithState is implemented on it);
``start_flow_counter_stream_tws`` sets the provider conf on the session.
ALSO requires the ``protobuf`` package (the API's Python state-server
protocol) — absent in this sandbox, so the pytest coverage skips here and
``flow_state.py`` (applyInPandasWithState) is the verified default; on a
real cluster with protobuf installed this module is a drop-in upgrade
(same inputs, same OUTPUT_SCHEMA, adds TTL/timers headroom).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
    TimerValues,
)

from bifrost_spark.schemas import EVENT_SCHEMA
from bifrost_spark.streaming.flow_state import OUTPUT_SCHEMA, STATE_SCHEMA

ROCKSDB_PROVIDER = "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"


class FlowCounterProcessor(StatefulProcessor):
    """Running (events, bytes, inserts, updates, deletes, max_event_id)
    totals per table across triggers; emits one row per table per trigger
    carrying the batch delta and the running totals."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self.totals = handle.getValueState("totals", STATE_SCHEMA)

    def handleInputRows(self, key, rows, timerValues: TimerValues) -> Iterator[pd.DataFrame]:
        ev = by = ins = upd = dl = 0
        meid = -1
        if self.totals.exists():
            ev, by, ins, upd, dl, meid = self.totals.get()
        b_ev = b_by = b_ins = b_upd = b_dl = 0
        b_meid = meid
        for pdf in rows:
            b_ev += len(pdf)
            b_by += int(pdf["approx_bytes"].sum())
            vc = pdf["event_type"].value_counts()
            b_ins += int(vc.get("insert", 0))
            b_upd += int(vc.get("update", 0))
            b_dl += int(vc.get("delete", 0))
            if len(pdf):
                b_meid = max(b_meid, int(pdf["event_id"].max()))
        self.totals.update((ev + b_ev, by + b_by, ins + b_ins, upd + b_upd, dl + b_dl, b_meid))
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

    def close(self) -> None:
        pass


def flow_counter_updates_tws(events: DataFrame) -> DataFrame:
    """Same narrow-projection wiring as flow_state.flow_counter_updates,
    expressed on the transformWithStateInPandas API."""
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
    return narrow.groupBy("table_name").transformWithStateInPandas(
        statefulProcessor=FlowCounterProcessor(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


def start_flow_counter_stream_tws(
    spark: SparkSession,
    log_path: str,
    out_path: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 1,
) -> StreamingQuery:
    """Tail the chunked event log with the transformWithState processor and
    append per-trigger running totals to ``out_path`` (parquet).

    EXPERIMENTAL in this environment: fails fast (ImportError) when
    ``protobuf`` is absent rather than deep inside Spark's Python state
    server; ``flow_state.start_flow_counter_stream`` is the verified
    equivalent with identical inputs and OUTPUT_SCHEMA."""
    try:
        import google.protobuf  # noqa: F401 — the tws state-server protocol dep
    except ImportError as e:
        raise ImportError(
            "transformWithStateInPandas needs the 'protobuf' package, which is "
            "not installed here; use streaming.flow_state.start_flow_counter_stream "
            "(applyInPandasWithState) — same inputs, same OUTPUT_SCHEMA"
        ) from e
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER)
    stream_schema = T.StructType(list(EVENT_SCHEMA.fields) + [T.StructField("chunk", T.StringType())])
    events = (
        spark.readStream.schema(stream_schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(log_path)
        .drop("chunk")
    )
    updates = flow_counter_updates_tws(events)

    def _sink(batch_df: DataFrame, epoch_id: int) -> None:
        batch_df.withColumn("epoch", F.lit(epoch_id)).write.mode("append").parquet(out_path)

    return (
        updates.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
