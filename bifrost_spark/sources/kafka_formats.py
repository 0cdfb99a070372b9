"""Kafka-source message decoders — SURVEY.md §2.1 S6.

The reference consumes a Kafka topic in 5 formats and normalizes each into
its universal event record (/root/reference/input/kafka/input.go,
input_canal_data.go, input_debezium_data.go, input_customer_json_data.go;
format structs /root/reference/plugin/driver/canal_json.go:29-47 and
debezium_json.go), tracking offsets as a pseudo-GTID
``topic:partition:offset`` (/root/reference/input/kafka/position.go:27-45).

Here each decoder is a pure ``from_json`` + projection over a DataFrame with
(topic, partition, offset, timestamp, value) columns — exactly the shape of
``spark.readStream.format("kafka")`` — producing the canonical EVENT_SCHEMA.
Offsets become the ordering key: ``event_id = offset`` per partition with
``file_num = partition`` standing in for the binlog file (the reference does
the same positional encoding).  Everything is JVM-side JSON parsing; no
Python in the row path.

Live wiring (needs the connector jar, absent in this sandbox)::

    spark-submit --packages org.apache.spark:spark-sql-kafka-0-10_2.13:<spark-version> ...
    raw = (spark.readStream.format("kafka")
           .option("kafka.bootstrap.servers", brokers)
           .option("subscribe", topic).load()
           .selectExpr("topic", "partition", "offset", "timestamp",
                       "CAST(value AS STRING) AS value"))
    events = decode_canal_json(raw)     # or decode_debezium_json /
                                        # decode_bifrost_json /
                                        # decode_customer_json / decode_string
    start = events.writeStream.foreachBatch(...)   # streaming/job.py shape
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from bifrost_spark.schemas import PAYLOAD_COLUMNS

_ROW = T.MapType(T.StringType(), T.StringType())

CANAL_SCHEMA = T.StructType(
    [
        T.StructField("database", T.StringType()),
        T.StructField("table", T.StringType()),
        T.StructField("type", T.StringType()),  # INSERT | UPDATE | DELETE | QUERY/DDL
        T.StructField("ts", T.LongType()),
        T.StructField("es", T.LongType()),
        T.StructField("sql", T.StringType()),
        T.StructField("isDdl", T.BooleanType()),
        T.StructField("pkNames", T.ArrayType(T.StringType())),
        T.StructField("data", T.ArrayType(_ROW)),
        T.StructField("old", T.ArrayType(_ROW)),
    ]
)

DEBEZIUM_SCHEMA = T.StructType(
    [
        T.StructField(
            "payload",
            T.StructType(
                [
                    T.StructField("before", _ROW),
                    T.StructField("after", _ROW),
                    T.StructField("op", T.StringType()),  # c r u d
                    T.StructField("ts_ms", T.LongType()),
                    T.StructField(
                        "source",
                        T.StructType(
                            [
                                T.StructField("db", T.StringType()),
                                T.StructField("table", T.StringType()),
                                T.StructField("file", T.StringType()),
                                T.StructField("pos", T.LongType()),
                                T.StructField("gtid", T.StringType()),
                            ]
                        ),
                    ),
                ]
            ),
        )
    ]
)

# the reference's own wire format is a JSON PluginDataType
BIFROST_SCHEMA = T.StructType(
    [
        T.StructField("EventType", T.StringType()),
        T.StructField("SchemaName", T.StringType()),
        T.StructField("TableName", T.StringType()),
        T.StructField("Rows", T.ArrayType(_ROW)),
        T.StructField("Query", T.StringType()),
        T.StructField("BinlogFileNum", T.IntegerType()),
        T.StructField("BinlogPosition", T.LongType()),
        T.StructField("Gtid", T.StringType()),
        T.StructField("Pri", T.ArrayType(T.StringType())),
        T.StructField("EventID", T.LongType()),
        T.StructField("Timestamp", T.LongType()),
    ]
)


def _payload_from_map(m: Column) -> Column:
    fields = [F.when(m.isNotNull(), m[c]).alias(c) for c in PAYLOAD_COLUMNS]
    extra = F.lit(None).cast("map<string,string>").alias("extra")
    return F.when(m.isNotNull(), F.struct(*fields, extra))


def _envelope(
    kafka: DataFrame,
    event_type: Column,
    before: Column,
    after: Column,
    schema_name: Column,
    table_name: Column,
    ts: Column,
    query: Column,
    pri: Column,
    gtid: Column | None = None,
) -> DataFrame:
    """Common projection to EVENT_SCHEMA; per-partition offset ordering."""
    return kafka.select(
        F.col("offset").cast("long").alias("event_id"),
        F.col("partition").cast("int").alias("file_num"),
        F.col("offset").cast("long").alias("pos"),
        event_type.alias("event_type"),
        schema_name.alias("schema_name"),
        table_name.alias("table_name"),
        ts.alias("ts"),
        (gtid if gtid is not None else F.concat_ws(":", F.col("topic"), F.col("partition"), F.col("offset"))).alias("gtid"),
        pri.alias("pri"),
        before.alias("before"),
        after.alias("after"),
        query.alias("query"),
        F.lit(0).alias("schema_version"),
    )


def decode_canal_json(kafka: DataFrame) -> DataFrame:
    """Canal JSON → events. Multi-row messages explode on data[] with old[]
    aligned by index (the reference walks data/old pairwise)."""
    j = kafka.withColumn("j", F.from_json(F.col("value").cast("string"), CANAL_SCHEMA))
    ddl = j.filter(F.col("j.isDdl"))
    dml = j.filter(~F.coalesce(F.col("j.isDdl"), F.lit(False)))
    dml = dml.select(
        "*",
        F.posexplode(F.col("j.data")).alias("row_idx", "row_after"),
    ).withColumn("row_before", F.col("j.old").getItem(F.col("row_idx")))
    et = F.lower(F.col("j.type"))
    out_dml = _envelope(
        dml,
        F.when(et == "insert", "insert").when(et == "update", "update").when(et == "delete", "delete").otherwise(et),
        F.when(et == "delete", _payload_from_map(F.col("row_after"))).otherwise(_payload_from_map(F.col("row_before"))),
        F.when(et != "delete", _payload_from_map(F.col("row_after"))),
        F.col("j.database"),
        F.col("j.table"),
        F.timestamp_millis(F.col("j.ts")),
        F.lit(None).cast("string"),
        F.col("j.pkNames"),
    )
    out_ddl = _envelope(
        ddl,
        F.lit("ddl"),
        F.lit(None).cast(out_dml.schema["before"].dataType),
        F.lit(None).cast(out_dml.schema["after"].dataType),
        F.col("j.database"),
        F.col("j.table"),
        F.timestamp_millis(F.col("j.ts")),
        F.col("j.sql"),
        F.col("j.pkNames"),
    )
    return out_dml.unionByName(out_ddl)


def decode_debezium_json(kafka: DataFrame) -> DataFrame:
    """Debezium envelope → events (op c/r→insert, u→update, d→delete)."""
    j = kafka.withColumn("p", F.from_json(F.col("value").cast("string"), DEBEZIUM_SCHEMA).getField("payload"))
    op = F.col("p.op")
    return _envelope(
        j,
        F.when(op.isin("c", "r"), "insert").when(op == "u", "update").when(op == "d", "delete").otherwise("unknown"),
        _payload_from_map(F.col("p.before")),
        _payload_from_map(F.col("p.after")),
        F.col("p.source.db"),
        F.col("p.source.table"),
        F.timestamp_millis(F.col("p.ts_ms")),
        F.lit(None).cast("string"),
        F.array(F.lit("repo"), F.lit("path")),
        gtid=F.col("p.source.gtid"),
    )


def decode_string(kafka: DataFrame) -> DataFrame:
    """``string_kafka``: the whole message becomes ONE insert row with the
    queue metadata columns and PK (topic, partition, offset) — byte-for-byte
    the reference's column mapping (/root/reference/input/kafka/
    input_string_data.go:39-80: queue_key/queue_value/queue_topic/
    queue_timestamp/queue_partition/queue_offset, pri = topic,partition,
    offset).  Rows ride in the ``extra`` map (the payload columns repo/path
    carry the PK) so the universal EVENT_SCHEMA stays unchanged."""
    row = F.create_map(
        F.lit("queue_key"), F.col("key").cast("string"),
        F.lit("queue_value"), F.col("value").cast("string"),
        F.lit("queue_topic"), F.col("topic"),
        F.lit("queue_timestamp"), F.col("timestamp").cast("string"),
        F.lit("queue_partition"), F.col("partition").cast("string"),
        F.lit("queue_offset"), F.col("offset").cast("string"),
    )
    after = F.struct(
        F.col("topic").alias("repo"),
        F.concat_ws(":", F.col("partition"), F.col("offset")).alias("path"),
        F.lit(None).cast("string").alias("commit"),
        F.lit(None).cast("string").alias("lang"),
        F.col("value").cast("string").alias("content"),
        row.alias("extra"),
    )
    return _envelope(
        kafka,
        F.lit("insert"),
        F.lit(None).cast(
            "struct<repo:string,path:string,commit:string,lang:string,content:string,extra:map<string,string>>"
        ),
        after,
        F.col("topic").alias("schema_name"),
        F.lit("queue_data").alias("table_name"),
        F.col("timestamp").cast("timestamp"),
        F.lit(None).cast("string"),
        F.array(F.lit("queue_topic"), F.lit("queue_partition"), F.lit("queue_offset")),
    )


class CustomerJsonConfig:
    """Config-driven generic JSON mapping — the reference's
    ``customer_json_kafka`` input (/root/reference/input/kafka/
    input_customer_json_data.go:60-105 wires dotted paths into
    /root/reference/plugin/driver/customer_json.go:173-215).

    Every field is a dotted JSON path inside the message; ``event_type_vals``
    maps the message's type values onto insert/update/delete (the
    reference's input.event.type.val.* params).  ``update_old_path`` absent
    → the old image defaults to the new image (customer_json.go:210-214)."""

    def __init__(
        self,
        database_path: str = "db",
        table_path: str = "table",
        pks: list[str] | None = None,
        event_type_path: str = "type",
        event_type_vals: dict[str, str] | None = None,
        insert_path: str = "data",
        update_new_path: str = "data",
        update_old_path: str | None = None,
        delete_path: str = "data",
    ):
        self.database_path = database_path
        self.table_path = table_path
        self.pks = pks or ["id"]
        self.event_type_path = event_type_path
        self.event_type_vals = event_type_vals or {
            "insert": "insert", "update": "update", "delete": "delete"
        }
        self.insert_path = insert_path
        self.update_new_path = update_new_path
        self.update_old_path = update_old_path
        self.delete_path = delete_path


def decode_customer_json(kafka: DataFrame, cfg: CustomerJsonConfig | None = None) -> DataFrame:
    """Customer-JSON → events.  JSON paths are evaluated with
    ``get_json_object`` (scalar fields) and a map parse at the configured
    data path (row images); unmapped event-type values are DROPPED like the
    reference's nil return (customer_json.go:180-190)."""
    cfg = cfg or CustomerJsonConfig()

    def jpath(p: str) -> Column:
        return F.get_json_object(F.col("value").cast("string"), f"$.{p}")

    def jmap(p: str | None) -> Column:
        if p is None:
            return F.lit(None).cast(_ROW)
        return F.from_json(jpath(p), _ROW)

    raw_type = jpath(cfg.event_type_path)
    event_type = F.lit(None).cast("string")
    for wire_val, et in cfg.event_type_vals.items():
        event_type = F.when(raw_type == F.lit(wire_val), F.lit(et)).otherwise(event_type)

    new_img = (
        F.when(event_type == "insert", jmap(cfg.insert_path))
        .when(event_type == "update", jmap(cfg.update_new_path))
    )
    # per-MESSAGE fallback, not per-config: a configured old path whose
    # field is absent in this message defaults to the new image, exactly
    # like customer_json.go:210-214 (oldData == nil → oldData = newData)
    old_for_update = (
        F.coalesce(jmap(cfg.update_old_path), jmap(cfg.update_new_path))
        if cfg.update_old_path else jmap(cfg.update_new_path)
    )
    old_img = (
        F.when(event_type == "update", old_for_update)
        .when(event_type == "delete", jmap(cfg.delete_path))
    )
    out = _envelope(
        kafka.filter(F.lit(True)),
        event_type,
        _payload_from_map(old_img),
        _payload_from_map(new_img),
        jpath(cfg.database_path),
        jpath(cfg.table_path),
        F.col("timestamp").cast("timestamp"),
        F.lit(None).cast("string"),
        F.array(*[F.lit(p) for p in cfg.pks]),
    )
    return out.filter(F.col("event_type").isNotNull())


def decode_bifrost_json(kafka: DataFrame) -> DataFrame:
    """The reference's native JSON format: Rows[] interleaves before/after
    for updates (even=before, odd=after —
    /root/reference/plugin/clickhouse/src/normal_sync.go:45-79), one image
    per row otherwise."""
    j = kafka.withColumn("j", F.from_json(F.col("value").cast("string"), BIFROST_SCHEMA))
    et = F.col("j.EventType")
    upd = j.filter(et == "update").select(
        "*", F.posexplode(F.expr("transform(sequence(0, int(size(j.Rows)/2) - 1), i -> struct(j.Rows[i*2] as b, j.Rows[i*2+1] as a))")).alias("row_idx", "pair")
    )
    out_upd = _envelope(
        upd,
        F.lit("update"),
        _payload_from_map(F.col("pair.b")),
        _payload_from_map(F.col("pair.a")),
        F.col("j.SchemaName"),
        F.col("j.TableName"),
        F.timestamp_seconds(F.col("j.Timestamp")),
        F.lit(None).cast("string"),
        F.col("j.Pri"),
        gtid=F.col("j.Gtid"),
    )
    single = j.filter(et.isin("insert", "delete")).select("*", F.posexplode(F.col("j.Rows")).alias("row_idx", "img"))
    out_single = _envelope(
        single,
        et,
        F.when(et == "delete", _payload_from_map(F.col("img"))),
        F.when(et == "insert", _payload_from_map(F.col("img"))),
        F.col("j.SchemaName"),
        F.col("j.TableName"),
        F.timestamp_seconds(F.col("j.Timestamp")),
        F.lit(None).cast("string"),
        F.col("j.Pri"),
        gtid=F.col("j.Gtid"),
    )
    sql = j.filter(et == "sql")
    out_sql = _envelope(
        sql,
        F.lit("ddl"),
        F.lit(None).cast(out_single.schema["before"].dataType),
        F.lit(None).cast(out_single.schema["after"].dataType),
        F.col("j.SchemaName"),
        F.col("j.TableName"),
        F.timestamp_seconds(F.col("j.Timestamp")),
        F.col("j.Query"),
        F.col("j.Pri"),
        gtid=F.col("j.Gtid"),
    )
    return out_upd.unionByName(out_single).unionByName(out_sql)
