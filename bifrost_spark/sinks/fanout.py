"""Multi-sink fan-out — SURVEY.md §2.2 F8.

The reference replicates every change event to each sink in the matching
table's ``ToServerList`` (and every like-table match's list), applying
per-sink filters on the way: ``FilterQuery`` drops DDL messages except the
COMMIT marker, and a per-sink ``LastSuccessBinlog`` skips events that are
stale for THAT sink only (event older by id AND by timestamp) —
/root/reference/server/channel_consume.go:265-317 (sendToServerList /
sendToServerList0).  Flow counters account ``bytes × len(ToServerList)``
because the event really is replicated N ways.

Spark-first shape: the whole fan-out is ONE narrow projection — per sink a
foldable match predicate (wildcard table patterns compile to regex
literals, so Catalyst pushes the disjunction into the scan), a conditional
struct (sink, topic, key, value) with the sink's own template/format, then
``array_compact`` + ``explode``.  One pass over the source produces the
union of every sink's message stream, already tagged and encoded; a single
``.write.partitionBy("sink")`` (or one kafka sink keyed by topic) delivers
all of them without re-reading the input N times.  Replication factor is
explicit in the row count, so the A1 flow counters see bytes × n_sinks for
free, like the reference's countChan accounting.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from bifrost_spark.operators.filters import table_pattern_pred, template_expr
from bifrost_spark.sinks.messages import encode_events

__all__ = ["SinkSpec", "fanout", "write_fanout"]


@dataclass(frozen=True)
class SinkSpec:
    """One ToServer entry (channel_consume.go:293-316 + like-table routing).

    ``last_event_id``/``last_ts`` mirror the reference's per-sink
    LastSuccessBinlog double guard: an event is skipped only when it is
    stale by BOTH id and timestamp (the timestamp check exists to survive
    mis-computed event ids — channel_consume.go:300-307)."""

    name: str
    tables: tuple[str, ...] = ("*.*",)
    ignore_tables: tuple[str, ...] = ()
    event_types: tuple[str, ...] | None = None
    filter_query: bool = False
    last_event_id: int = 0
    last_ts: int = 0  # epoch seconds
    fmt: str = "bifrost"
    topic_template: str = "{$SchemaName}_{$TableName}"
    key_template: str | None = None
    options: dict = field(default_factory=dict, hash=False, compare=False)


def _match_pred(spec: SinkSpec) -> Column:
    pred = None
    for pat in spec.tables:
        p = table_pattern_pred(pat)
        pred = p if pred is None else (pred | p)
    pred = pred if pred is not None else F.lit(True)
    for pat in spec.ignore_tables:
        pred = pred & ~table_pattern_pred(pat)
    if spec.event_types is not None:
        pred = pred & F.col("event_type").isin(*spec.event_types)
    if spec.filter_query:
        # FilterQuery: DDL messages are dropped except the COMMIT marker
        # (channel_consume.go:295-299 — EventType "sql" && Query != "COMMIT")
        pred = pred & ((F.col("event_type") != "ddl") | (F.col("query") == "COMMIT"))
    if spec.last_event_id or spec.last_ts:
        stale = (F.col("event_id") < F.lit(spec.last_event_id)) & (
            F.unix_timestamp(F.col("ts")) < F.lit(spec.last_ts)
        )
        pred = pred & ~stale
    return pred


def fanout(events: DataFrame, specs: list[SinkSpec]) -> DataFrame:
    """Canonical events → the union of every sink's message stream.

    Output columns: ``(event_id, gtid, event_type, sink, topic, key,
    value)`` — one row per (event, matching sink).  Encoded values are
    computed once per distinct format (identical subtrees; whole-stage
    codegen CSEs them), and the match predicates are foldable, so the plan
    is a single narrow Project + Generate over the source — no shuffle, no
    second scan, no driver loop over sinks."""
    if not specs:
        raise ValueError("fanout needs at least one SinkSpec")
    names = [s.name for s in specs]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate sink names: {names}")
    enc = {fmt: encode_events(events, fmt) for fmt in {s.fmt for s in specs}}
    arms = [
        F.when(
            _match_pred(s),
            F.struct(
                F.lit(s.name).alias("sink"),
                template_expr(s.topic_template).alias("topic"),
                (
                    template_expr(s.key_template)
                    if s.key_template
                    else F.lit(None).cast("string")
                ).alias("key"),
                enc[s.fmt].alias("value"),
            ),
        )
        for s in specs
    ]
    return events.select(
        "event_id",
        "gtid",
        "event_type",
        F.explode(F.array_compact(F.array(*arms))).alias("msg"),
    ).select("event_id", "gtid", "event_type", "msg.*")


def write_fanout(messages: DataFrame, base_dir: str, mode: str = "append") -> None:
    """Deliver a fan-out batch to per-sink directories in ONE job.

    ``partitionBy("sink")`` splits the union back into per-sink streams at
    write time — the file-sink stand-in for N broker producers.  In
    streaming, call this from ``foreachBatch`` (the micro-batch is the
    aligned send-then-commit unit; the checkpoint holds the position — the
    reference's BatchSize/commitBinlogList machinery, kafka.go:244-349)."""
    messages.write.mode(mode).partitionBy("sink").parquet(base_dir)
