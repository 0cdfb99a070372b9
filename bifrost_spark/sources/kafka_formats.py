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
