"""Message sinks — SURVEY.md §2.3 M6.

The reference pushes every change event to message brokers (Kafka
/root/reference/plugin/kafka/src/kafka.go:206-349, plus RabbitMQ/ActiveMQ/
http/hprose variants) as a JSON-serialized event object: the topic and key
are rendered from ``{$Tag}`` templates (``TransfeResult``, reused here as
the F14 ``template_expr`` DSL), and the message value is the event
serialized in one of three object types (``ToOtherObject``,
/root/reference/plugin/driver/to_other_object.go:41-51): the native
``PluginDataType`` JSON, Canal JSON (to_canal_json.go:8-47), or a flat
table-map object (to_table_map.go).

Spark-first shape: each encoder is a pure projection producing exactly the
DataFrame contract of ``df.write.format("kafka")`` / ``writeStream`` —
columns ``(topic string, key string, value string)`` — so the actual broker
push is a one-line built-in sink.  Everything is JVM-side (``to_json`` over
structs/maps); no Python in the row path.  The reference's producer-side
batching/commit machinery (BatchSize, commitBinlogList,
kafka.go:244-349) maps onto Spark epochs: a ``foreachBatch``/streaming
micro-batch IS the aligned send-then-commit unit, and the checkpoint holds
the commit position — none of it needs reimplementing.

Determinism note: canal's ``ts`` field is wall-clock ``time.Now()`` in the
reference (to_canal_json.go:15); here both ``ts`` and ``es`` derive from the
event timestamp so encoders are pure functions (replays byte-identical).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from bifrost_spark.operators.filters import template_expr
from bifrost_spark.schemas import PAYLOAD_COLUMNS

__all__ = [
    "encode_bifrost_json",
    "encode_canal_json",
    "encode_debezium_json",
    "encode_events",
    "kafka_messages",
]


def _map_from_payload(img: Column) -> Column:
    """Typed payload struct → the wire row map<string,string>.

    Declared payload columns first (stable key order → deterministic JSON),
    then the ``extra`` map (DDL-added columns), mirroring how the reference
    flattens a row map into PluginDataType.Rows."""
    base = F.create_map(
        *[c for col in PAYLOAD_COLUMNS for c in (F.lit(col), img[col].cast("string"))]
    )
    extra = F.coalesce(img["extra"], F.create_map().cast("map<string,string>"))
    return F.when(img.isNotNull(), F.map_concat(base, extra))


def _rows_array(df: DataFrame) -> Column:
    """PluginDataType.Rows: update interleaves [before, after] (even=before,
    odd=after — /root/reference/server/to_server_consume.go:399-427); insert
    carries [after]; delete carries [before]; DDL carries none."""
    et = F.col("event_type")
    before_m = _map_from_payload(F.col("before"))
    after_m = _map_from_payload(F.col("after"))
    return (
        F.when(et == "update", F.array(before_m, after_m))
        .when(et == "insert", F.array(after_m))
        .when(et == "delete", F.array(before_m))
        .otherwise(F.lit(None).cast("array<map<string,string>>"))
    )


def encode_bifrost_json(events: DataFrame) -> Column:
    """Native wire format: the PluginDataType JSON object
    (/root/reference/plugin/driver/driver.go:29-45; EventType "sql" for DDL).
    Inverse of ``sources.kafka_formats.decode_bifrost_json``."""
    et = F.col("event_type")
    obj = F.struct(
        F.when(et == "ddl", "sql").otherwise(et).alias("EventType"),
        F.col("schema_name").alias("SchemaName"),
        F.col("table_name").alias("TableName"),
        _rows_array(events).alias("Rows"),
        F.col("query").alias("Query"),
        F.col("file_num").alias("BinlogFileNum"),
        F.col("pos").alias("BinlogPosition"),
        F.col("gtid").alias("Gtid"),
        F.col("pri").alias("Pri"),
        F.col("event_id").alias("EventID"),
        F.unix_timestamp(F.col("ts")).alias("Timestamp"),
    )
    return F.to_json(obj)


def encode_canal_json(events: DataFrame) -> Column:
    """Canal JSON (to_canal_json.go:8-47): update → data=[after]/old=[before],
    insert|delete → data=[image], DDL → isDdl+sql with no rows.  Inverse of
    ``decode_canal_json``."""
    et = F.col("event_type")
    before_m = _map_from_payload(F.col("before"))
    after_m = _map_from_payload(F.col("after"))
    data = (
        F.when(et == "update", F.array(after_m))
        .when(et == "insert", F.array(after_m))
        .when(et == "delete", F.array(before_m))
        .otherwise(F.lit(None).cast("array<map<string,string>>"))
    )
    old = F.when(et == "update", F.array(before_m)).otherwise(
        F.lit(None).cast("array<map<string,string>>")
    )
    obj = F.struct(
        F.col("schema_name").alias("database"),
        F.col("table_name").alias("table"),
        F.when(et == "ddl", "QUERY").otherwise(F.upper(et)).alias("type"),
        F.unix_millis(F.col("ts")).alias("ts"),
        F.unix_millis(F.col("ts")).alias("es"),
        F.col("query").alias("sql"),
        (et == "ddl").alias("isDdl"),
        F.col("pri").alias("pkNames"),
        data.alias("data"),
        old.alias("old"),
    )
    return F.to_json(obj)


def encode_debezium_json(events: DataFrame) -> Column:
    """Debezium envelope (payload.before/after/op/ts_ms/source) — the
    third interchange format; inverse of ``decode_debezium_json``.
    DDL events have no Debezium row-envelope form and encode as op='q'
    messages that the decoder side treats as unknown (the reference's
    Debezium INPUT likewise only consumes c/r/u/d rows)."""
    et = F.col("event_type")
    op = (
        F.when(et == "insert", "c")
        .when(et == "update", "u")
        .when(et == "delete", "d")
        .otherwise("q")
    )
    obj = F.struct(
        F.struct(
            _map_from_payload(F.col("before")).alias("before"),
            _map_from_payload(F.col("after")).alias("after"),
            op.alias("op"),
            F.unix_millis(F.col("ts")).alias("ts_ms"),
            F.struct(
                F.col("schema_name").alias("db"),
                F.col("table_name").alias("table"),
                F.format_string("binlog.%06d", F.col("file_num")).alias("file"),
                F.col("pos").alias("pos"),
                F.col("gtid").alias("gtid"),
            ).alias("source"),
        ).alias("payload")
    )
    return F.to_json(obj)


_ENCODERS = {
    "bifrost": encode_bifrost_json,
    "canal": encode_canal_json,
    "debezium": encode_debezium_json,
}


def encode_events(events: DataFrame, fmt: str = "bifrost") -> Column:
    try:
        return _ENCODERS[fmt](events)
    except KeyError:
        raise ValueError(f"unknown message format {fmt!r}; one of {sorted(_ENCODERS)}")


def kafka_messages(
    events: DataFrame,
    topic_template: str = "{$SchemaName}_{$TableName}",
    key_template: str | None = None,
    fmt: str = "bifrost",
    filter_query_events: bool = False,
) -> DataFrame:
    """Events → broker-ready messages ``(topic, key, value)``.

    Topic/key are ``{$Tag}`` templates exactly like the reference's Kafka
    sink params (kafka.go:227-233 via TransfeResult); ``filter_query_events``
    is its BifrostFilterQuery knob (drop DDL/commit messages).  Feed the
    result straight to ``.write.format("kafka")`` (add bootstrap options) or
    any other message sink — per-topic partitioning is the broker's job, and
    Spark's kafka sink distributes the produce across executors, so this
    scales with input splits (no driver-side send loop)."""
    src = events
    if filter_query_events:
        src = src.filter(~F.col("event_type").isin("ddl", "commit"))
    key = template_expr(key_template) if key_template else F.lit(None).cast("string")
    return src.select(
        template_expr(topic_template).alias("topic"),
        key.alias("key"),
        encode_events(src, fmt).alias("value"),
    )
