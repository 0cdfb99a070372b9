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


def test_oplog_stream_through_engine(spark, tmp_path):
    """S7 e2e: a full i/u/d oplog tail — decoded, re-keyed by _id
    (keyed_by_id: repo=collection, path=_id, the reference's Pri contract)
    — replayed through ReplayEngine into TargetTable; final state must
    frame-equal the sequential-apply oracle of the decoded events.  Covers
    the delete-carries-only-_id quirk end to end: without the adapter the
    delete's PK columns are null and the row could never be removed."""
    from bifrost_spark.operators.merge import TargetTable
    from bifrost_spark.oracle import content_sha_map, sequential_apply
    from bifrost_spark.pipelines.replay import ReplayEngine
    from bifrost_spark.sources.mongo_oplog import keyed_by_id

    entries = []
    t = 1000
    for k in range(60):  # inserts
        entries.append({"ts": {"t": t, "i": k}, "op": "i", "ns": "app.repos",
                        "doc": {"_id": f"id{k}", "repo": "ignored", "path": "ignored",
                                "commit": f"c{k}", "content": f"v{k}"}})
    for k in range(0, 60, 2):  # update every other doc (before == after)
        entries.append({"ts": {"t": t + 1, "i": k}, "op": "u", "ns": "app.repos",
                        "doc": {"_id": f"id{k}", "repo": "ignored", "path": "ignored",
                                "commit": f"c{k}bis", "content": f"w{k}"}})
    for k in range(0, 60, 3):  # delete every third — doc carries ONLY _id
        entries.append({"ts": {"t": t + 2, "i": k}, "op": "d", "ns": "app.repos",
                        "doc": {"_id": f"id{k}"}})

    events = keyed_by_id(decode_mongo_oplog(_oplog(spark, entries)))
    expected = sequential_apply(events.toPandas())
    assert len(expected) == 40  # 60 - 20 deleted
    table = TargetTable.create(spark, str(tmp_path / "tbl"), n_buckets=4)
    ReplayEngine(table, ordered=True).apply_batch(events)
    actual = table.to_pandas_sorted().reset_index(drop=True)
    assert content_sha_map(actual) == content_sha_map(expected)
    assert expected.equals(actual[expected.columns.tolist()])
    # updated docs carry the update's content; _id keying is the row identity
    row = actual[actual["path"] == "id2"].iloc[0]
    assert row["content"] == "w2" and row["repo"] == "repos"
