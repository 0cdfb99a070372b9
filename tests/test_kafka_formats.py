"""Kafka-format decoders (SURVEY.md §2.1 S6) — mirrors the reference's
canal/debezium/bifrost decode tests (/root/reference/plugin/driver/*_test.go)."""

import datetime
import json

from bifrost_spark.sources.kafka_formats import decode_bifrost_json, decode_canal_json, decode_debezium_json

TS = datetime.datetime(2024, 1, 1)


def _kafka(spark, values):
    rows = [("t", 0, i, TS, v) for i, v in enumerate(values)]
    return spark.createDataFrame(rows, "topic string, partition int, offset long, timestamp timestamp, value string")


def test_canal_insert_update_multirow_ddl(spark):
    ins = {"database": "code", "table": "repos", "type": "INSERT", "ts": 1700000000000, "isDdl": False,
           "pkNames": ["repo", "path"],
           "data": [{"repo": "r", "path": "a", "content": "v1"}, {"repo": "r", "path": "b", "content": "v2"}]}
    upd = {"database": "code", "table": "repos", "type": "UPDATE", "ts": 1700000001000, "isDdl": False,
           "pkNames": ["repo", "path"],
           "data": [{"repo": "r", "path": "a", "content": "v3"}], "old": [{"repo": "r", "path": "a", "content": "v1"}]}
    ddl = {"database": "code", "table": "repos", "type": "ALTER", "ts": 1700000002000, "isDdl": True,
           "sql": "ALTER TABLE code.repos ADD COLUMN stars INT"}
    out = decode_canal_json(_kafka(spark, [json.dumps(x) for x in (ins, upd, ddl)])).collect()
    by = {}
    for r in out:
        by.setdefault(r["event_type"], []).append(r)
    assert len(by["insert"]) == 2  # multi-row explode
    assert {r["after"]["path"] for r in by["insert"]} == {"a", "b"}
    assert by["update"][0]["before"]["content"] == "v1" and by["update"][0]["after"]["content"] == "v3"
    assert by["ddl"][0]["query"].startswith("ALTER TABLE")
    assert by["insert"][0]["gtid"] == "t:0:0"  # pseudo-GTID topic:partition:offset


def test_debezium_ops(spark):
    def env(op, before=None, after=None):
        return json.dumps({"payload": {"op": op, "before": before, "after": after, "ts_ms": 1700000000000,
                                       "source": {"db": "code", "table": "repos", "file": "b.1", "pos": 77, "gtid": "g:1"}}})

    vals = [env("c", after={"repo": "r", "path": "a", "content": "v1"}),
            env("u", before={"repo": "r", "path": "a", "content": "v1"}, after={"repo": "r", "path": "a", "content": "v2"}),
            env("d", before={"repo": "r", "path": "a", "content": "v2"})]
    out = decode_debezium_json(_kafka(spark, vals)).orderBy("event_id").collect()
    assert [r["event_type"] for r in out] == ["insert", "update", "delete"]
    assert out[1]["after"]["content"] == "v2" and out[2]["before"]["content"] == "v2"
    assert out[0]["gtid"] == "g:1"


def test_bifrost_native_interleaved_update(spark):
    upd = {"EventType": "update", "SchemaName": "code", "TableName": "repos",
           "Rows": [{"repo": "r", "path": "a", "content": "v1"}, {"repo": "r", "path": "a", "content": "v2"},
                    {"repo": "r", "path": "b", "content": "b1"}, {"repo": "r", "path": "b", "content": "b2"}],
           "Pri": ["repo", "path"], "Timestamp": 1700000000, "Gtid": "g:9"}
    ins = {"EventType": "insert", "SchemaName": "code", "TableName": "repos",
           "Rows": [{"repo": "r", "path": "c", "content": "c1"}], "Pri": ["repo", "path"], "Timestamp": 1700000001}
    sql = {"EventType": "sql", "SchemaName": "code", "TableName": "repos", "Rows": [],
           "Query": "TRUNCATE TABLE code.repos", "Timestamp": 1700000002}
    out = decode_bifrost_json(_kafka(spark, [json.dumps(x) for x in (upd, ins, sql)])).collect()
    ups = sorted([r for r in out if r["event_type"] == "update"], key=lambda r: r["after"]["path"])
    assert len(ups) == 2  # Rows[] even/odd pairing → 2 update events
    assert ups[0]["before"]["content"] == "v1" and ups[0]["after"]["content"] == "v2"
    assert ups[1]["before"]["content"] == "b1" and ups[1]["after"]["content"] == "b2"
    assert [r["event_type"] for r in out].count("insert") == 1
    ddl = [r for r in out if r["event_type"] == "ddl"][0]
    assert ddl["query"].startswith("TRUNCATE")


def test_string_format_whole_message_row(spark):
    """string_kafka: every message is one insert row keyed
    (topic, partition, offset) with queue metadata columns
    (/root/reference/input/kafka/input_string_data.go:39-80)."""
    from bifrost_spark.sources.kafka_formats import decode_string

    rows = [("logs", 3, 41, "key1", TS, "payload one"), ("logs", 3, 42, None, TS, '{"x": 1}')]
    kafka = spark.createDataFrame(
        rows, "topic string, partition int, offset long, key string, timestamp timestamp, value string"
    )
    out = decode_string(kafka).orderBy("event_id").collect()
    assert [r["event_type"] for r in out] == ["insert", "insert"]
    r = out[0]
    assert r["event_id"] == 41 and r["file_num"] == 3
    assert r["gtid"] == "logs:3:41"
    assert r["after"]["repo"] == "logs" and r["after"]["path"] == "3:41"
    assert r["after"]["content"] == "payload one"
    assert r["after"]["extra"]["queue_key"] == "key1"
    assert r["after"]["extra"]["queue_offset"] == "41"
    assert r["pri"] == ["queue_topic", "queue_partition", "queue_offset"]
    assert out[1]["after"]["extra"]["queue_key"] is None


def test_customer_json_config_paths(spark):
    """customer_json_kafka: dotted-path config drives db/table/op/rows
    extraction; unmapped event types are dropped; missing old image
    defaults to the new image
    (/root/reference/plugin/driver/customer_json.go:173-215)."""
    from bifrost_spark.sources.kafka_formats import CustomerJsonConfig, decode_customer_json

    msgs = [
        {"m": {"db": "app", "tbl": "t", "op": "I"}, "d": {"new": {"repo": "r", "path": "a", "content": "v1"}}},
        {"m": {"db": "app", "tbl": "t", "op": "U"},
         "d": {"new": {"repo": "r", "path": "a", "content": "v2"}, "old": {"repo": "r", "path": "a", "content": "v1"}}},
        {"m": {"db": "app", "tbl": "t", "op": "U"}, "d": {"new": {"repo": "r", "path": "b", "content": "v9"}}},
        {"m": {"db": "app", "tbl": "t", "op": "D"}, "d": {"new": {"repo": "r", "path": "a", "content": "v2"}}},
        {"m": {"db": "app", "tbl": "t", "op": "NOISE"}, "d": {"new": {"repo": "x"}}},
    ]
    cfg = CustomerJsonConfig(
        database_path="m.db", table_path="m.tbl", pks=["repo", "path"],
        event_type_path="m.op", event_type_vals={"I": "insert", "U": "update", "D": "delete"},
        insert_path="d.new", update_new_path="d.new", update_old_path="d.old", delete_path="d.new",
    )
    kafka = _kafka(spark, [json.dumps(m) for m in msgs])
    out = decode_customer_json(kafka, cfg).orderBy("event_id").collect()
    assert [r["event_type"] for r in out] == ["insert", "update", "update", "delete"]  # NOISE dropped
    assert out[0]["schema_name"] == "app" and out[0]["table_name"] == "t"
    assert out[0]["before"] is None and out[0]["after"]["content"] == "v1"
    assert out[1]["before"]["content"] == "v1" and out[1]["after"]["content"] == "v2"
    # missing old image defaults to the new image (reference behavior)
    assert out[2]["before"]["content"] == "v9" and out[2]["after"]["content"] == "v9"
    assert out[3]["before"]["content"] == "v2" and out[3]["after"] is None
    assert out[0]["pri"] == ["repo", "path"]
