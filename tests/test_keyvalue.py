"""M5 key-value point-op emitter (Redis SET/DEL/LPUSH contract,
/root/reference/plugin/redis/src/redis.go:186-295)."""

import datetime
import json

import pytest

from bifrost_spark.schemas import EVENT_SCHEMA
from bifrost_spark.sinks.keyvalue import kv_commands, ordered_for_pipeline

TS = datetime.datetime(2026, 1, 1, 0, 0, 0)


def _events(spark):
    def payload(repo, path, commit=None, content=None):
        return {"repo": repo, "path": path, "commit": commit, "lang": None,
                "content": content, "extra": None}

    rows = [
        (2, 1, 2, "insert", "code", "repos", TS, None, None,
         None, payload("r1", "a.py", "c1", "v1"), None, 0),
        (4, 1, 4, "update", "code", "repos", TS, None, None,
         payload("r1", "a.py", "c1", "v1"), payload("r1", "a.py", "c2", "v2"), None, 0),
        (6, 1, 6, "delete", "code", "repos", TS, None, None,
         payload("r1", "a.py"), None, None, 0),
        (7, 1, 7, "ddl", "code", "repos", TS, None, None,
         None, None, "ALTER TABLE code.repos ADD COLUMN x INT", 0),
    ]
    return spark.createDataFrame(
        [(e[0], e[1], e[2], e[3], e[4], e[5], e[6], e[7], e[8], e[9], e[10], e[11], e[12])
         for e in rows], EVENT_SCHEMA)


def test_set_mode_commands(spark):
    out = {r["event_id"]: r for r in kv_commands(
        _events(spark),
        key_template="{$SchemaName}:{$TableName}:{$repo}:{$path}",
        val_template="{$commit}|{$content}",
        expire_s=60,
    ).collect()}
    assert set(out) == {2, 4, 6}  # DDL filtered in set mode
    assert out[2]["cmd"] == "SET" and out[2]["key"] == "code:repos:r1:a.py"
    assert out[2]["value"] == "c1|v1" and out[2]["expire_s"] == 60
    assert out[4]["value"] == "c2|v2"
    # delete → DEL, key templates from the BEFORE image, no value
    assert out[6]["cmd"] == "DEL" and out[6]["key"] == "code:repos:r1:a.py"
    assert out[6]["value"] is None


def test_set_mode_default_value_is_row_json(spark):
    out = {r["event_id"]: r for r in kv_commands(
        _events(spark), key_template="{$repo}/{$path}").collect()}
    v = json.loads(out[4]["value"])
    assert v["commit"] == "c2" and v["content"] == "v2"  # after image
    assert out[6]["value"] is None


def test_list_mode_enqueues_everything_as_bifrost_json(spark):
    out = kv_commands(_events(spark), key_template="q:{$TableName}",
                      kv_type="list", filter_query_events=False).collect()
    assert len(out) == 4 and all(r["cmd"] == "LPUSH" for r in out)
    by_id = {json.loads(r["value"])["EventID"]: json.loads(r["value"]) for r in out}
    assert by_id[2]["EventType"] == "insert"
    assert by_id[7]["EventType"] == "sql"  # DDL rides the queue in list mode
    assert by_id[4]["Rows"][0]["commit"] == "c1"  # before, after pair
    assert by_id[4]["Rows"][1]["commit"] == "c2"


def test_ordered_for_pipeline_keeps_per_key_order(spark):
    cmds = kv_commands(_events(spark), key_template="{$repo}/{$path}")
    parts = ordered_for_pipeline(cmds, n_partitions=4)
    seen = parts.rdd.mapPartitions(
        lambda it: [[(r["key"], r["event_id"]) for r in it]]
    ).collect()
    per_key = {}
    for part in seen:
        for key, eid in part:
            per_key.setdefault(key, []).append(eid)
    # one key here: all its commands on one partition, ascending event order
    assert per_key == {"r1/a.py": [2, 4, 6]}


def test_bad_kv_type_raises(spark):
    with pytest.raises(ValueError, match="set.*list"):
        kv_commands(_events(spark), key_template="k", kv_type="hash")


def test_no_shuffle_in_emitter_plan(spark):
    """The emitter itself must stay a narrow projection — any Exchange in
    its plan would mean a per-event shuffle before the sink."""
    plan = kv_commands(_events(spark), key_template="{$repo}").select(
        "cmd", "key", "value")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
