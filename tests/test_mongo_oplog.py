"""S7 Mongo oplog source: op mapping, update before==after quirk, drop
commands as DDL, {"T","I"} gtid, (T<<32)|I ordering."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from bifrost_spark.sources.mongo_oplog import decode_mongo_oplog


def _oplog(spark, entries):
    rows = [(json.dumps(e),) for e in entries]
    return spark.createDataFrame(rows, "value string")


def test_iud_mapping_and_gtid(spark):
    entries = [
        {"ts": {"t": 100, "i": 1}, "op": "i", "ns": "app.repos",
         "doc": {"_id": "a1", "repo": "r1", "path": "p1", "content": "x"}},
        {"ts": {"t": 100, "i": 2}, "op": "u", "ns": "app.repos",
         "doc": {"_id": "a1", "repo": "r1", "path": "p1", "content": "y"}},
        {"ts": {"t": 101, "i": 1}, "op": "d", "ns": "app.repos",
         "doc": {"_id": "a1"}},
    ]
    out = decode_mongo_oplog(_oplog(spark, entries)).orderBy("event_id").collect()
    assert [r["event_type"] for r in out] == ["insert", "update", "delete"]
    ins, upd, dele = out

    assert ins["event_id"] == (100 << 32) + 1
    assert ins["gtid"] == '{"T":100,"I":1}'
    assert ins["pri"] == ["_id"]
    assert ins["schema_name"] == "app" and ins["table_name"] == "repos"
    assert ins["before"] is None
    assert ins["after"]["content"] == "x"
    assert ins["after"]["extra"] == {"_id": "a1"}  # _id rides in extra

    # oplog updates have no old image: before IS after (callback.go:75-81)
    assert upd["before"] == upd["after"]
    assert upd["after"]["content"] == "y"

    # delete carries only _id; after is null
    assert dele["after"] is None
    assert dele["before"]["extra"] == {"_id": "a1"}
    assert dele["before"]["repo"] is None


def test_drop_commands_become_ddl(spark):
    entries = [
        {"ts": {"t": 200, "i": 1}, "op": "c", "ns": "app.$cmd",
         "cmd": {"drop": "repos"}},
        {"ts": {"t": 200, "i": 2}, "op": "c", "ns": "app.$cmd",
         "cmd": {"dropDatabase": 1}},
        {"ts": {"t": 200, "i": 3}, "op": "c", "ns": "app.$cmd",
         "cmd": {}},  # unrecognized command → dropped (nil return)
        {"ts": {"t": 200, "i": 4}, "op": "n", "ns": "app.repos"},  # no-op
    ]
    out = decode_mongo_oplog(_oplog(spark, entries)).orderBy("event_id").collect()
    assert len(out) == 2
    drop_coll, drop_db = out
    assert drop_coll["event_type"] == "ddl"
    assert drop_coll["query"] == "DROP TABLE repos"
    assert drop_coll["table_name"] == "repos"
    assert drop_db["query"] == "DROP DATABASE app"
    assert drop_db["table_name"] == ""  # callback.go drop-database event


def test_ordering_is_bson_timestamp_order(spark):
    entries = [
        {"ts": {"t": 5, "i": 9}, "op": "i", "ns": "d.c", "doc": {"_id": "x"}},
        {"ts": {"t": 6, "i": 0}, "op": "i", "ns": "d.c", "doc": {"_id": "y"}},
        {"ts": {"t": 5, "i": 10}, "op": "i", "ns": "d.c", "doc": {"_id": "z"}},
    ]
    out = decode_mongo_oplog(_oplog(spark, entries)).orderBy("event_id").collect()
    assert [r["after"]["extra"]["_id"] for r in out] == ["x", "z", "y"]
    assert all(out[i]["event_id"] < out[i + 1]["event_id"] for i in range(2))


def test_payload_keys_split_from_extra(spark):
    entries = [{"ts": {"t": 1, "i": 1}, "op": "i", "ns": "d.c",
                "doc": {"_id": "k", "repo": "r", "path": "p", "commit": "c0",
                        "lang": "go", "content": "body", "stars": "42"}}]
    row = decode_mongo_oplog(_oplog(spark, entries)).first()
    after = row["after"]
    assert (after["repo"], after["path"], after["commit"], after["lang"], after["content"]) == \
        ("r", "p", "c0", "go", "body")
    assert after["extra"] == {"_id": "k", "stars": "42"}
