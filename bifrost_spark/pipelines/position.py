"""Binlog position validity check / nearest-right scan — SURVEY.md §2.6 C3.

The reference guards resume against a stale saved position: it checks that
the (file, pos) offset still exists and parses to an event boundary, and if
not, scans forward for the nearest valid event to restart from
(/root/reference/Bristol/mysql/binlog_check.go:9-50+ — used when a slave
reconnects after the master purged or rotated binlogs).

Two Spark-first layers:

- ``check_position``: driver-side O(#segments) metadata check against the
  log's ``_chunks.json`` source-position index (the analogue of "does the
  binlog file still exist and does the offset fall inside it") — positions
  go invalid here exactly as in MySQL: retention expired a chunk, or the
  saved id falls in a gap between segments.  With ``deep=True`` it adds the
  event-boundary check: ONE column-pruned, predicate-pushed scan of only
  the containing chunk to find the exact nearest event id ≥ the request
  (the "parse forward to the next valid event" scan, as a distributed read
  of just that chunk's files).
- ``nearest_valid_positions``: the same nearest-right scan as a distributed
  DataFrame op over any position stream, for batch-auditing many saved
  positions at once: broadcast the probe set, one pass over the log, map-
  side partial min — no shuffle of the big side beyond the final tiny agg.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["PositionCheck", "check_position", "nearest_valid_positions"]


@dataclass(frozen=True)
class PositionCheck:
    requested: int
    valid: bool
    nearest_right: int | None  # smallest available position >= requested
    chunk: str | None          # chunk dir holding nearest_right
    reason: str                # in_segment | gap | before_log | after_log | no_index


def _load_index(log_path: str, spark: SparkSession | None = None) -> dict | None:
    from bifrost_spark.metafs import load_chunk_index

    return load_chunk_index(log_path, spark=spark) or None


def check_position(
    log_path: str,
    event_id: int,
    spark: SparkSession | None = None,
    deep: bool = False,
) -> PositionCheck:
    """Validate a saved resume position against the event log.

    Shallow mode answers from the chunk index alone (no jobs).  ``deep=True``
    (requires ``spark``) confirms the exact event boundary by scanning the
    candidate chunk with ``event_id >= requested`` pushed into the parquet
    scan — cost is one chunk, not the log."""
    index = _load_index(log_path, spark)
    if not index:
        return PositionCheck(event_id, False, None, None, "no_index")
    # segments are (lo, hi) ranges per chunk, in chunk order
    chunks = sorted((k, v) for k, v in index.items() if v.get("segments"))
    spans = [
        (seg["lo"], seg["hi"], chunk)
        for chunk, meta in chunks
        for seg in meta["segments"]
    ]
    spans.sort()
    if not spans:
        return PositionCheck(event_id, False, None, None, "no_index")
    if event_id > spans[-1][1]:
        return PositionCheck(event_id, False, None, None, "after_log")
    containing = next((s for s in spans if s[0] <= event_id <= s[1]), None)
    if containing is None:
        # purged / gap: nearest right is the first segment starting above
        lo, _hi, chunk = next(s for s in spans if s[0] > event_id)
        reason = "before_log" if event_id < spans[0][0] else "gap"
        return PositionCheck(event_id, False, lo, chunk, reason)
    if not deep:
        return PositionCheck(event_id, True, event_id, containing[2], "in_segment")
    if spark is None:
        raise ValueError("deep=True requires a SparkSession")
    row = (
        spark.read.parquet(os.path.join(log_path, containing[2]))
        .select("event_id")
        .filter(F.col("event_id") >= event_id)
        .agg(F.min("event_id"))
        .first()
    )
    nearest = row[0]
    return PositionCheck(
        event_id, nearest == event_id, nearest, containing[2],
        "in_segment" if nearest == event_id else "gap",
    )


def nearest_valid_positions(
    positions: DataFrame, probes: list[int], pos_col: str = "event_id"
) -> DataFrame:
    """Batch nearest-right scan: for each probe, is it a valid position in
    the stream, and what is the smallest position ≥ it?

    Returns ``(requested long, valid boolean, nearest_right long)``.  The
    probe set is broadcast (it is always tiny), the big side is scanned
    once with map-side partial aggregation, and probes past the end keep a
    NULL nearest_right via the closing left join."""
    spark = positions.sparkSession
    p = spark.createDataFrame([(int(x),) for x in probes], "requested long")
    hits = (
        positions.select(F.col(pos_col).cast("long").alias("pos"))
        .join(F.broadcast(p), F.col("pos") >= F.col("requested"))
        .groupBy("requested")
        .agg(
            F.max(F.col("pos") == F.col("requested")).alias("valid"),
            F.min("pos").alias("nearest_right"),
        )
    )
    return (
        p.join(hits, "requested", "left")
        .select(
            "requested",
            F.coalesce("valid", F.lit(False)).alias("valid"),
            "nearest_right",
        )
    )
