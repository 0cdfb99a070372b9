"""Mongo oplog / change-stream source — SURVEY.md §2.1 S7.

The reference tails the Mongo oplog via gtm and normalizes each op into its
universal event record (/root/reference/input/mongo/input.go:34-80,
callback.go:29-120):

- ``i`` → insert with Rows=[doc]
- ``u`` → update with Rows=[doc, doc] — the oplog carries no old image, so
  the before image IS the after image (callback.go:75-81)
- ``d`` → delete with Rows=[doc] where doc is just the ``_id``
  (callback.go:84-92)
- commands: ``dropDatabase`` / ``drop`` (collection) become DDL query
  events (callback.go:36-42); everything else is ignored
- position/GTID is the BSON timestamp serialized as ``{"T":t,"I":i}``
  (position.go:26-31); ``Pri = ["_id"]``; BinlogFileNum=1, and ordering is
  the (T, I) pair.

Spark-first shape: the decoder is a pure ``from_json`` + projection over a
DataFrame of oplog entries — one JSON document per row in a ``value``
column, exactly what a change-stream relay (Kafka topic, file drop, or the
mongo-spark connector's raw stream) delivers — producing the canonical
EVENT_SCHEMA.  ``event_id = (T << 32) | I`` reproduces BSON-timestamp total
order as one monotone long, so resume/stale-skip/manifest machinery works
unchanged.  All JVM-side; no Python in the row path.

Document fields: keys matching the payload columns land in the typed
payload struct; every other key (``_id`` included) rides in the ``extra``
map — the same split the schema registry applies to DDL-added columns.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from bifrost_spark.schemas import PAYLOAD_COLUMNS

_DOC = T.MapType(T.StringType(), T.StringType())

# One oplog entry as relayed JSON: BSON timestamp {t, i}, op code, namespace
# "db.collection", the (full) document for i/u/d, and the command object for
# op="c" (gtm surfaces IsDropDatabase/IsDropCollection from it).
OPLOG_SCHEMA = T.StructType(
    [
        T.StructField("ts", T.StructType([
            T.StructField("t", T.LongType()),
            T.StructField("i", T.LongType()),
        ])),
        T.StructField("op", T.StringType()),  # i | u | d | c
        T.StructField("ns", T.StringType()),  # "db.collection" / "db.$cmd"
        T.StructField("doc", _DOC),
        T.StructField("cmd", T.StructType([
            T.StructField("drop", T.StringType()),          # collection name
            T.StructField("dropDatabase", T.LongType()),
        ])),
    ]
)


def _payload_from_doc(doc: Column) -> Column:
    """doc map → typed payload struct; unmapped keys (``_id`` included)
    travel in ``extra`` so no data is dropped (the reference keeps the whole
    doc as the row map)."""
    fields = [F.when(doc.isNotNull(), doc[c]).alias(c) for c in PAYLOAD_COLUMNS]
    extra = F.map_filter(doc, lambda k, _: ~k.isin(*PAYLOAD_COLUMNS)).alias("extra")
    return F.when(doc.isNotNull(), F.struct(*fields, extra))


def decode_mongo_oplog(oplog_json: DataFrame, value_col: str = "value") -> DataFrame:
    """Oplog JSON lines → canonical EVENT_SCHEMA events.

    Update semantics follow the reference exactly: before == after (no old
    image in the oplog), which the LWW/merge path treats as a plain upsert —
    correct because Mongo updates can't change ``_id`` (the PK).  Unhandled
    ops (no-ops, unrecognized commands) are dropped like the reference's
    nil return (callback.go:42,94)."""
    j = oplog_json.withColumn("o", F.from_json(F.col(value_col).cast("string"), OPLOG_SCHEMA))
    return _decode(j)


def _decode(j: DataFrame) -> DataFrame:
    op = F.col("o.op")
    is_cmd = op == "c"
    is_drop_db = is_cmd & F.col("o.cmd.dropDatabase").isNotNull()
    is_drop_coll = is_cmd & F.col("o.cmd.drop").isNotNull()
    known = op.isin("i", "u", "d") | is_drop_db | is_drop_coll

    event_id = (F.shiftleft(F.col("o.ts.t"), 32) + F.col("o.ts.i")).cast("long")
    db = F.split(F.col("o.ns"), r"\.").getItem(0)
    coll = F.when(is_drop_coll, F.col("o.cmd.drop")).otherwise(
        F.substring_index(F.col("o.ns"), ".", -1)
    )
    payload = _payload_from_doc(F.col("o.doc"))
    et = (
        F.when(op == "i", "insert")
        .when(op == "u", "update")
        .when(op == "d", "delete")
        .otherwise("ddl")
    )
    query = (
        F.when(is_drop_db, F.concat(F.lit("DROP DATABASE "), db))
        .when(is_drop_coll, F.concat(F.lit("DROP TABLE "), coll))
    )
    return j.filter(known).select(
        event_id.alias("event_id"),
        F.lit(1).alias("file_num"),  # input.go: BinlogFileNum=1
        event_id.alias("pos"),
        et.alias("event_type"),
        db.alias("schema_name"),
        F.when(is_drop_db, F.lit("")).otherwise(coll).alias("table_name"),
        F.timestamp_seconds(F.col("o.ts.t")).alias("ts"),
        F.format_string('{"T":%d,"I":%d}', F.col("o.ts.t"), F.col("o.ts.i")).alias("gtid"),
        F.array(F.lit("_id")).alias("pri"),
        F.when(op == "u", payload).when(op == "d", payload).alias("before"),
        F.when(op.isin("i", "u"), payload).alias("after"),
        query.alias("query"),
        F.lit(0).alias("schema_version"),
    )


def keyed_by_id(events: DataFrame) -> DataFrame:
    """Adapter for sinks keyed on the universal ``(repo, path)`` PK.

    Mongo's primary key is ``_id`` (``Pri=["_id"]`` in the reference —
    input.go:66), and a delete's doc carries ONLY ``_id``, so the typed
    payload PK columns are null exactly when the sink needs them.  The
    reference's sinks key directly off Pri; for the keyed TargetTable the
    equivalent configuration is this projection: ``repo`` := the collection
    (table_name), ``path`` := the document ``_id`` (from the extra map),
    applied to both images.  Pure column rewrite — no shuffle, no Python —
    so it composes with the decoder in the same narrow stage."""

    def rekey(img: str) -> Column:
        i = F.col(img)
        return F.when(
            i.isNotNull(),
            F.struct(
                F.col("table_name").alias("repo"),
                i["extra"]["_id"].alias("path"),
                i["commit"].alias("commit"),
                i["lang"].alias("lang"),
                i["content"].alias("content"),
                i["extra"].alias("extra"),
            ),
        )

    return events.withColumn("before", rekey("before")).withColumn("after", rekey("after"))
