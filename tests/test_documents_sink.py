"""Document-store point-op emitters (M5 family): ES bulk + Mongo upsert wire
contracts.  Driver oracles cover the derived-stream entries; here the
hand-built edge shapes — PK-changing updates, the reference's last-pk doc-id
quirk, NDJSON rendering."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from bifrost_spark.schemas import EVENT_SCHEMA
from bifrost_spark.sinks.documents import es_bulk_ndjson, es_bulk_ops, mongo_ops

TS = __import__("datetime").datetime(2026, 1, 1)


def _events(spark):
    img = lambda repo, path, commit=None, content=None: {  # noqa: E731
        "repo": repo, "path": path, "commit": commit, "lang": None,
        "content": content, "extra": None}
    rows = [
        (2, 1, 2, "insert", "code", "repos", TS, None, None, None,
         img("r1", "a.py", "c1", "x"), None, 0),
        # PK-changing update: (r1, a.py) -> (r1, b.py)
        (4, 1, 4, "update", "code", "repos", TS, None, None,
         img("r1", "a.py", "c1", "x"), img("r1", "b.py", "c2", "y"), None, 0),
        (6, 1, 6, "delete", "code", "repos", TS, None, None,
         img("r1", "b.py"), None, None, 0),
        (7, 1, 7, "ddl", "code", "repos", TS, None, None, None, None,
         "ALTER TABLE code.repos ADD COLUMN z INT", 0),
    ]
    return spark.createDataFrame(rows, EVENT_SCHEMA)


def test_es_bulk_ops_contract(spark):
    ops = {r["event_id"]: r for r in es_bulk_ops(_events(spark)).collect()}
    assert len(ops) == 3  # DDL filtered
    sep = "\x01"
    assert ops[2]["action"] == "upsert" and ops[2]["doc_id"] == f"r1{sep}a.py"
    assert json.loads(ops[2]["doc_json"]) == {"repo": "r1", "path": "a.py",
                                              "commit": "c1", "content": "x"}
    # reference semantics: update indexes the AFTER id only
    assert ops[4]["action"] == "upsert" and ops[4]["doc_id"] == f"r1{sep}b.py"
    # delete keys from the BEFORE image
    assert ops[6]["action"] == "delete" and ops[6]["doc_id"] == f"r1{sep}b.py"
    assert ops[6]["doc_json"] is None
    assert ops[2]["index"] == "code.repos"


def test_es_pk_change_delete_and_last_pk_mode(spark):
    rows = es_bulk_ops(_events(spark), pk_change_delete=True).collect()
    moved = [r for r in rows if r["event_id"] == 4]
    # companion delete of the OLD id ordered before the upsert
    assert sorted((r["seq"], r["action"], r["doc_id"]) for r in moved) == [
        (0, "delete", "r1\x01a.py"), (1, "upsert", "r1\x01b.py")]
    # the reference's getDocID quirk: last primary key wins
    quirk = {r["event_id"]: r["doc_id"]
             for r in es_bulk_ops(_events(spark), doc_id_mode="last_pk").collect()}
    assert quirk[2] == "a.py" and quirk[6] == "b.py"
    with pytest.raises(ValueError, match="doc_id_mode"):
        es_bulk_ops(_events(spark), doc_id_mode="bogus").collect()


def test_es_bulk_ndjson_wire_lines(spark):
    lines = {r["event_id"]: r["lines"]
             for r in es_bulk_ndjson(es_bulk_ops(_events(spark))).collect()}
    meta = json.loads(lines[2][0])
    assert meta == {"update": {"_index": "code.repos", "_id": "r1\x01a.py"}}
    body = json.loads(lines[2][1])
    assert body["doc_as_upsert"] is True and body["doc"]["commit"] == "c1"
    assert len(lines[6]) == 1 and json.loads(lines[6][0])["delete"]["_id"] == "r1\x01b.py"


def test_mongo_ops_contract(spark):
    ops = {r["event_id"]: r for r in mongo_ops(_events(spark)).collect()}
    assert len(ops) == 3
    assert ops[2]["op"] == "upsert"
    assert json.loads(ops[2]["filter_json"]) == {"repo": "r1", "path": "a.py"}
    assert json.loads(ops[2]["doc_json"])["content"] == "x"
    # delete filters on the BEFORE image PKs, carries no doc
    assert ops[6]["op"] == "remove"
    assert json.loads(ops[6]["filter_json"]) == {"repo": "r1", "path": "b.py"}
    assert ops[6]["doc_json"] is None
    assert (ops[2]["db"], ops[2]["collection"]) == ("code", "repos")
    # the wire rows order per key for a pipelined executor exactly like the
    # redis contract — shared helper
    from bifrost_spark.sinks.keyvalue import ordered_for_pipeline

    ordered = ordered_for_pipeline(
        mongo_ops(_events(spark)).withColumnRenamed("filter_json", "key"), 4)
    assert ordered.count() == 3
