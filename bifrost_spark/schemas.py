"""Canonical schemas: the change-event envelope and the repos payload.

The event envelope mirrors the reference's single universal record
``PluginDataType`` (/root/reference/plugin/driver/driver.go:29-45) with the
update before/after pair made explicit as two typed struct columns (the
reference interleaves before/after images in ``Rows[]``, even=before /
odd=after — /root/reference/server/to_server_consume.go:399-427).

The payload is the north-rule table: (repo, path, commit, lang, content),
primary key (repo, path).  Columns added later by DDL travel in the
``extra`` map<string,string> and are typed by the schema registry
(bifrost_spark/registry.py) — mirroring the reference's out-of-band
ColumnMapping (/root/reference/Bristol/mysql/parser.go:525-572).
"""

from __future__ import annotations

from pyspark.sql import types as T

PK_COLUMNS = ["repo", "path"]
PAYLOAD_COLUMNS = ["repo", "path", "commit", "lang", "content"]

PAYLOAD_STRUCT = T.StructType(
    [T.StructField(c, T.StringType()) for c in PAYLOAD_COLUMNS]
    + [T.StructField("extra", T.MapType(T.StringType(), T.StringType()))]
)

# event_type values; the reference uses "sql" for DDL
# (/root/reference/plugin/driver/driver.go:33); we use the clearer "ddl".
EVENT_TYPES = ("insert", "update", "delete", "ddl", "commit")

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), False),
        T.StructField("file_num", T.IntegerType(), False),
        T.StructField("pos", T.LongType(), False),
        T.StructField("event_type", T.StringType(), False),
        T.StructField("schema_name", T.StringType(), False),
        T.StructField("table_name", T.StringType(), False),
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("gtid", T.StringType(), True),
        T.StructField("pri", T.ArrayType(T.StringType()), True),
        T.StructField("before", PAYLOAD_STRUCT, True),
        T.StructField("after", PAYLOAD_STRUCT, True),
        T.StructField("query", T.StringType(), True),
        T.StructField("schema_version", T.IntegerType(), False),
    ]
)

# Target-table base schema (v0). `last_event_id` is the MERGE guard column
# (SURVEY.md §7 "What is hard": overlapping replays must not regress a row).
TARGET_BASE_FIELDS = [
    T.StructField("repo", T.StringType(), False),
    T.StructField("path", T.StringType(), False),
    T.StructField("commit", T.StringType(), True),
    T.StructField("lang", T.StringType(), True),
    T.StructField("content", T.StringType(), True),
    T.StructField("last_event_id", T.LongType(), False),
]

# Logical type names the registry accepts for DDL-added columns, and their
# Spark types.  Mirrors the reference's normalized ColumnMapping strings
# (/root/reference/Bristol/mysql/parser.go:525-572) reduced to what the
# north-rule payload needs.
LOGICAL_TYPES: dict[str, T.DataType] = {
    "int": T.IntegerType(),
    "bigint": T.LongType(),
    "double": T.DoubleType(),
    "string": T.StringType(),
    "boolean": T.BooleanType(),
    "timestamp": T.TimestampType(),
}
