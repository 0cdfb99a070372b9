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
