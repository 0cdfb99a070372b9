"""Filter/routing/projection operators (SURVEY.md §2.2) unit tests."""

import datetime

from pyspark.sql import functions as F

from bifrost_spark.operators.filters import (
    event_type_filter,
    field_list_projection,
    like_table_route,
    noop_update_filter,
    replicate_table_filter,
    split_rows,
    stale_event_filter,
    template_expr,
    template_projection,
)
from bifrost_spark.schemas import EVENT_SCHEMA

TS = datetime.datetime(2024, 1, 1)


def _events(spark, rows):
    return spark.createDataFrame(rows, EVENT_SCHEMA)


def _ev(eid, etype="insert", schema="code", table="repos", before=None, after=None, query=None):
    def pay(d):
        if d is None:
            return None
        return (d.get("repo"), d.get("path"), d.get("commit"), d.get("lang"), d.get("content"), d.get("extra"))

    return (eid, 1, eid * 10, etype, schema, table, TS, f"g:{eid}", ["repo", "path"], pay(before), pay(after), query, 0)


def test_replicate_table_filter_precedence(spark):
    df = _events(spark, [
        _ev(2, table="repos"), _ev(4, table="repos_archive"), _ev(6, schema="other", table="repos"),
        _ev(8, table="audit"),
    ])
    out = replicate_table_filter(df, do_tables=["code.repos*"], ignore_tables=["code.repos_archive"])
    assert sorted(r["event_id"] for r in out.collect()) == [2]
    out2 = replicate_table_filter(df, do_tables=["*.*"], ignore_tables=["code.audit"])
    assert sorted(r["event_id"] for r in out2.collect()) == [2, 4, 6]


def test_event_type_filter(spark):
    df = _events(spark, [_ev(2, "insert", after={"repo": "r", "path": "p"}), _ev(4, "ddl", query="BEGIN"),
                         _ev(6, "delete", before={"repo": "r", "path": "p"})])
    assert event_type_filter(df, ["insert", "delete"]).count() == 2


def test_like_table_route(spark):
    df = _events(spark, [_ev(2, table="tbl_001"), _ev(4, table="tbl_002"), _ev(6, table="users")])
    out = like_table_route(df, {"tbl_*": "tbl"})
    routes = {r["event_id"]: r["route"] for r in out.collect()}
    assert routes == {2: "tbl", 4: "tbl", 6: "users"}


def test_stale_event_filter(spark):
    df = _events(spark, [_ev(2), _ev(4), _ev(6)])
    assert sorted(r["event_id"] for r in stale_event_filter(df, 4).collect()) == [6]


def test_field_list_projection(spark):
    df = _events(spark, [_ev(2, "update",
                             before={"repo": "r", "path": "p", "content": "old"},
                             after={"repo": "r", "path": "p", "content": "new", "lang": "py"})])
    out = field_list_projection(df, ["repo", "path", "content"]).collect()[0]
    assert out["after"].asDict() == {"repo": "r", "path": "p", "content": "new"}
    assert out["before"]["content"] == "old"


def test_noop_update_suppression(spark):
    same = {"repo": "r", "path": "p", "content": "x"}
    df = _events(spark, [
        _ev(2, "update", before=same, after=same),
        _ev(4, "update", before=same, after={"repo": "r", "path": "p", "content": "y"}),
        _ev(6, "insert", after=same),
    ])
    out = noop_update_filter(df, compare_fields=["repo", "path", "content"])
    assert sorted(r["event_id"] for r in out.collect()) == [4, 6]


def test_split_rows(spark):
    packed = spark.createDataFrame(
        [(2, [({"repo": "r", "path": "a"}, {"repo": "r", "path": "a"}),
              ({"repo": "r", "path": "b"}, {"repo": "r", "path": "b"})])],
        "event_id long, rows array<struct<before:struct<repo:string,path:string>, after:struct<repo:string,path:string>>>",
    )
    out = split_rows(packed).collect()
    assert len(out) == 2
    assert [r["seq"] for r in out] == [2 * 4096, 2 * 4096 + 1]
    assert out[1]["after"]["path"] == "b"


def test_template_projection(spark):
    df = _events(spark, [_ev(2, "insert", after={"repo": "linux", "path": "a.c"},
                             query='{"meta": {"ids": [7, 8]}}')])
    out = template_projection(df, {
        "key": "{$TableName}-{$repo}/{$path}",
        "meta": "{$EventType}@{$BinlogFileNum}:{$BinlogPosition}#{$EventID}",
        "jpath": "{$json['meta']['ids'][1]}",
        "plain": "static",
    }).collect()[0]
    assert out["key"] == "repos-linux/a.c"
    assert out["meta"] == "insert@1:20#2"
    assert out["jpath"] == "8"
    assert out["plain"] == "static"


def test_template_null_tag(spark):
    df = _events(spark, [_ev(2, "insert", after={"repo": "r", "path": "p"})])
    col = template_expr("x{$BifrostNull}y")
    assert df.select(col.alias("v")).collect()[0]["v"] == "xy"
