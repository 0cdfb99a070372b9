"""M6 message sinks: encoders are exact inverses of the S6 decoders
(encode → decode is the identity on the event envelope), and topic/key
templating matches the reference's TransfeResult params."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from bifrost_spark.generator import GeneratorConfig, generate_events
from bifrost_spark.sinks.messages import (
    encode_bifrost_json,
    encode_canal_json,
    encode_debezium_json,
    kafka_messages,
)
from bifrost_spark.sources.kafka_formats import (
    decode_bifrost_json,
    decode_canal_json,
    decode_debezium_json,
)

CMP = ["event_type", "schema_name", "table_name", "query",
       "before.repo", "before.path", "before.content",
       "after.repo", "after.path", "after.content"]


def _events(spark, with_ddl=True):
    ddl = [(40, "ALTER TABLE app.repos ADD COLUMN stars bigint")] if with_ddl else []
    return generate_events(spark, GeneratorConfig(n_events=80, n_keys=25, n_repos=5, ddl=ddl))


def _as_kafka(encoded):
    """(value, event_id→offset) back into the kafka-frame shape the decoders eat."""
    return encoded.select(
        F.lit("t").alias("topic"), F.lit(0).alias("partition"),
        F.col("event_id").alias("offset"), F.col("ts").alias("timestamp"),
        F.col("value"),
    )


def _roundtrip_check(events, decoded):
    left = events.select(F.col("event_id"), *[F.expr(c).alias(c.replace(".", "_")) for c in CMP])
    right = decoded.select(F.col("event_id"), *[F.expr(c).alias(c.replace(".", "_")) for c in CMP])
    assert left.exceptAll(right).count() == 0
    assert right.exceptAll(left).count() == 0


def test_bifrost_encode_decode_identity(spark):
    events = _events(spark)
    enc = events.withColumn("value", encode_bifrost_json(events))
    dec = decode_bifrost_json(_as_kafka(enc))
    _roundtrip_check(events, dec)
    # gtid and pri survive the native format
    g = dec.select("event_id", "gtid", "pri")
    orig = events.select("event_id", "gtid", "pri")
    assert g.exceptAll(orig).count() == 0


def test_canal_encode_decode_identity(spark):
    events = _events(spark)
    enc = events.withColumn("value", encode_canal_json(events))
    dec = decode_canal_json(_as_kafka(enc))
    _roundtrip_check(events, dec)


def test_debezium_encode_decode_identity_dml(spark):
    events = _events(spark, with_ddl=False)
    enc = events.withColumn("value", encode_debezium_json(events))
    dec = decode_debezium_json(_as_kafka(enc)).filter(F.col("event_type") != "unknown")
    _roundtrip_check(events, dec)
    # debezium carries the source gtid through
    assert dec.filter(F.col("gtid") != F.lit("")).count() == dec.count()


def test_extra_columns_ride_the_wire(spark):
    events = _events(spark)  # DDL adds `stars`, generator fills extra map
    with_extra = events.filter(F.col("after.extra").isNotNull()).limit(5)
    n = with_extra.count()
    assert n > 0
    enc = with_extra.withColumn("value", encode_bifrost_json(with_extra))
    row = enc.select("value").first()
    rows = json.loads(row["value"])["Rows"]
    assert "stars" in rows[-1]  # extra key flattened into the wire row map


def test_kafka_messages_templating_and_filter(spark):
    events = _events(spark)
    msgs = kafka_messages(
        events,
        topic_template="cdc_{$SchemaName}_{$TableName}",
        key_template="{$repo}/{$path}",
        fmt="canal",
        filter_query_events=True,
    )
    assert msgs.columns == ["topic", "key", "value"]
    assert msgs.filter(F.col("topic") != "cdc_code_repos").count() == 0
    # BifrostFilterQuery drops DDL messages
    assert msgs.filter(F.col("value").contains('"isDdl":true')).count() == 0
    # key template resolves row fields from after (fallback before)
    assert msgs.filter(~F.col("key").rlike("^[^/]+/dir[0-9]+/file_[0-9]+\\..+$")).count() == 0


def test_update_interleaves_before_after(spark):
    events = _events(spark).filter(F.col("event_type") == "update").limit(3)
    enc = events.withColumn("value", encode_bifrost_json(events))
    for r in enc.select("value").collect():
        obj = json.loads(r["value"])
        assert obj["EventType"] == "update"
        assert len(obj["Rows"]) == 2  # even=before, odd=after
