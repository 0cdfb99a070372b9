"""Key-value point-op emitter — the M5 sink contract beyond Kafka formats.

Rebuilds the reference's Redis sink semantics
(/root/reference/plugin/redis/src/redis.go:186-295) as a declarative
DataFrame projection: each change event becomes ONE broker-ready command row
``(cmd, key, value, expire_s, event_id)``:

- ``kv_type="set"``: insert/update → ``SET key val`` (val from the
  ``val_template`` when given, else the JSON of the row image — redis.go's
  ``json.Marshal(data.Rows[index])``); delete → ``DEL key``.
- ``kv_type="list"``: every event (including delete) → ``LPUSH key val``
  with val = the full PluginDataType JSON when no ``val_template``
  (redis.go SendToList's ``json.Marshal(data)``) — the changelog-queue mode.

Key/value templates are the F14 ``{$Tag}`` DSL (``template_expr``), exactly
the reference's KeyConfig/ValConfig through ``TransfeResult``; row-field
tags resolve after-image first with before-image fallback, which reproduces
``getKeyVal(data, index)`` on delete events whose only row is the before
image.

Scale shape: a pure narrow projection — no shuffle, no Python; a protocol
executor ``foreachPartition``s the result and pipelines commands.  For
per-key command ordering under a parallel writer, partition by ``key`` and
sort by ``event_id`` within partitions (``ordered_for_pipeline``) — one
uniform hash shuffle, the same contract Kafka gets from per-key partitioning.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from bifrost_spark.operators.filters import template_expr
from bifrost_spark.sinks.messages import encode_bifrost_json


def _row_json(events: DataFrame) -> Column:
    """JSON of the operative row image (after; before for deletes) — the
    default SET value, mirroring json.Marshal of the row map."""
    img = F.when(F.col("event_type") == "delete", F.col("before")).otherwise(F.col("after"))
    return F.to_json(img)


def kv_commands(
    events: DataFrame,
    key_template: str,
    val_template: str | None = None,
    kv_type: str = "set",
    expire_s: int = 0,
    filter_query_events: bool = True,
) -> DataFrame:
    """Events → ``(cmd, key, value, expire_s, event_id)`` command rows.

    ``filter_query_events`` drops DDL/commit events in set mode (the
    reference's BifrostFilterQuery knob; list mode enqueues them like its
    Query/Commit handlers do when the knob is off)."""
    if kv_type not in ("set", "list"):
        raise ValueError(f"kv_type must be 'set' or 'list', got {kv_type!r}")
    src = events
    key = template_expr(key_template)
    if kv_type == "list":
        if filter_query_events:
            src = src.filter(~F.col("event_type").isin("ddl", "commit"))
        val = template_expr(val_template) if val_template else encode_bifrost_json(src)
        cmd = F.lit("LPUSH")
        value = val
    else:
        src = src.filter(F.col("event_type").isin("insert", "update", "delete"))
        val = template_expr(val_template) if val_template else _row_json(src)
        cmd = F.when(F.col("event_type") == "delete", F.lit("DEL")).otherwise(F.lit("SET"))
        value = F.when(F.col("event_type") != "delete", val)  # DEL carries no value
    return src.select(
        cmd.alias("cmd"),
        key.alias("key"),
        value.alias("value"),
        F.lit(int(expire_s)).alias("expire_s"),
        F.col("event_id").alias("event_id"),
    )


def ordered_for_pipeline(commands: DataFrame, n_partitions: int | None = None) -> DataFrame:
    """Repartition by key + sort by event_id within partitions: every key's
    commands land on one writer task in apply order (what a pipelined
    protocol executor needs for SET/DEL correctness), keys hash-uniform
    across tasks.  ONE shuffle; at 100 TB this is the same exchange any
    keyed sink pays."""
    parts = commands.repartition(n_partitions, "key") if n_partitions else commands.repartition("key")
    return parts.sortWithinPartitions("key", "event_id")
