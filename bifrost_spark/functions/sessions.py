"""Sessionization and event-sequence analytics over event streams.

Gap-based sessionization is the canonical event-analytics operator the
reference's flow counters stop short of (server/count/count.go buckets by
wall-clock second; a session is the per-entity generalization).  Both
operators here are pure window-function pipelines: ONE shuffle on the
entity key, everything after it is a sorted within-partition scan —
whole-stage codegen, no UDFs, no self-joins.

Scale notes:
- the only exchange is hashpartitioning(user_id); windows and the final
  per-session aggregate reuse that partitioning (Catalyst collapses the
  agg into the same exchange), so a 100 TB event log costs exactly one
  shuffle pass.
- a single pathological entity (one user with 10^9 events) lands on one
  reducer — the standard mitigation is a two-level session id (salt by
  day first); at the brief's shape (events spread over many users) the
  plain form is right.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["sessionize", "session_stats"]


def _secs(c):
    """Whole-second epoch.  Parquet event-time columns read as
    TIMESTAMP_NTZ, which Spark refuses to cast straight to BIGINT; going
    through TIMESTAMP first is allowed for both flavors.  Only DIFFERENCES
    of this value are ever used, so the session-timezone offset the
    NTZ→TZ cast may introduce cancels."""
    return c.cast("timestamp").cast("long")


def sessionize(
    events: DataFrame,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Assign every event a session: a new session starts when the gap to
    the entity's previous event exceeds ``gap_minutes``.  Returns the input
    plus ``session_seq`` (1-based per user).  lag → boundary flag →
    running sum, all in one window pass."""
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col), F.col("event_id"))
    prev_ts = F.lag(F.col(ts_col)).over(w)
    new_session = (
        prev_ts.isNull()
        | (_secs(F.col(ts_col)) - _secs(prev_ts) > gap_minutes * 60)
    ).cast("long")
    return events.withColumn("session_seq", F.sum(new_session).over(w))


def session_stats(
    events: DataFrame,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-session rollup: bounds, event count, value total, duration.
    The groupBy keys start with ``user_col`` — the sessionize window's
    partitioning — so Catalyst plans the aggregate WITHOUT a second
    exchange.  Columns are pruned BEFORE the window: a window operator
    carries whole rows through its shuffle, so leaving payload columns
    (the props JSON blob) attached would multiply shuffle bytes for
    nothing."""
    events = events.select(user_col, ts_col, "event_id", "value")
    s = sessionize(events, gap_minutes=gap_minutes, user_col=user_col, ts_col=ts_col)
    return s.groupBy(user_col, "session_seq").agg(
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count("*").alias("n_events"),
        F.round(F.sum(F.col("value").cast("decimal(18,6)")).cast("double"), 4).alias("sum_value"),
        (_secs(F.max(F.col(ts_col))) - _secs(F.min(F.col(ts_col)))).alias("duration_sec"),
    )
