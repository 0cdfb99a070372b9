"""Document-store point-op emitters — the last M5 sink family shapes.

Like sinks/keyvalue.py (Redis) and sinks/messages.py (Kafka), these rebuild
the reference's per-event sink DRIVERS as declarative wire contracts: a
narrow projection from change events to broker-ready operation rows that a
protocol executor ``foreachPartition``s.  No shuffle, no Python row path.

**Elasticsearch bulk** (/root/reference/plugin/Elasticsearch/src/sync.go:16-111,
es.go:261-417): insert/update → bulk *update-with-doc_as_upsert* of the
AFTER image at the PK-derived doc id; delete → bulk *delete* at the BEFORE
image's id.  The reference indexes a PK-changing update at the NEW id and
leaves the old document in place (makeUpdateRequest uses rows[i+1] only) —
mirrored by default, with ``pk_change_delete=True`` to also emit the delete
a lake-consistent sink wants.  ``es_bulk_ndjson`` renders the actual
_bulk-API wire lines.

Doc id: the reference's getDocID (sync.go:113-121) loops the primary keys
and OVERWRITES ``id`` each iteration — the LAST key's value wins, which
collides documents across repos for a composite (repo, path) key.  Default
here is the collision-free join of all PK values ('\\x01' separator);
``doc_id_mode="last_pk"`` reproduces the reference byte-for-byte.

**MongoDB upsert** (/root/reference/plugin/MongoDB/src/mongodb.go:170-260):
insert/update → ``Upsert(filter={pks from after}, doc=after)``; delete →
``Remove(filter={pks from before})``.  Emitted as (op, db, collection,
filter_json, doc_json, event_id) rows; db/collection are F14 templates
(the reference routes through TransfeResult the same way).

Per-key ordering for a parallel executor: reuse
``sinks.keyvalue.ordered_for_pipeline`` on the ``doc_id``/``filter`` column
— identical contract.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from bifrost_spark.operators.filters import template_expr
from bifrost_spark.schemas import PK_COLUMNS


def _image(which: str) -> Column:
    return F.col(which)


def _doc_id(img: Column, mode: str) -> Column:
    """PK-derived document id from a row image struct."""
    pks = [img.getField(c) for c in PK_COLUMNS]
    if mode == "last_pk":
        # reference quirk: getDocID overwrites per key — last PK wins
        return pks[-1]
    if mode == "joined":
        return F.concat_ws("\x01", *pks)
    raise ValueError(f"doc_id_mode must be 'joined' or 'last_pk', got {mode!r}")


def es_bulk_ops(
    events: DataFrame,
    index_template: str = "{$SchemaName}.{$TableName}",
    doc_id_mode: str = "joined",
    pk_change_delete: bool = False,
) -> DataFrame:
    """Change events → Elasticsearch bulk operation rows
    ``(action, index, doc_id, doc_json, event_id, seq)``.

    action ∈ upsert | delete.  ``seq`` orders multiple ops emitted by one
    event (the pk_change_delete companion) the way the reference's bulk
    list preserves append order."""
    src = events.filter(F.col("event_type").isin("insert", "update", "delete"))
    index = template_expr(index_template)
    after_id = _doc_id(F.col("after"), doc_id_mode)
    before_id = _doc_id(F.col("before"), doc_id_mode)
    is_del = F.col("event_type") == "delete"
    main = src.select(
        F.when(is_del, F.lit("delete")).otherwise(F.lit("upsert")).alias("action"),
        index.alias("index"),
        F.when(is_del, before_id).otherwise(after_id).alias("doc_id"),
        F.when(~is_del, F.to_json(F.col("after"))).alias("doc_json"),
        F.col("event_id").alias("event_id"),
        F.lit(1).alias("seq"),
    )
    if not pk_change_delete:
        return main
    # companion delete of the OLD id when an update moved the PK — emitted
    # BEFORE the upsert (seq 0 < 1) so a per-doc-ordered executor cannot
    # resurrect the old doc
    moved = src.filter(
        (F.col("event_type") == "update") & before_id.isNotNull() & (before_id != after_id)
    ).select(
        F.lit("delete").alias("action"),
        index.alias("index"),
        before_id.alias("doc_id"),
        F.lit(None).cast("string").alias("doc_json"),
        F.col("event_id").alias("event_id"),
        F.lit(0).alias("seq"),
    )
    return main.unionByName(moved)


def es_bulk_ndjson(ops: DataFrame) -> DataFrame:
    """Bulk-op rows → the actual _bulk API wire lines
    ``(index, event_id, seq, lines)``: the action-metadata JSON line, plus
    the source line for upserts (doc_as_upsert, matching the reference's
    NewBulkUpdateRequest.Doc(...).DocAsUpsert(true))."""
    # to_json, not string concat: doc ids may carry the \x01 PK separator
    # (or any user bytes), which JSON requires escaped as \u0001
    action_meta = F.struct(
        F.col("index").alias("_index"), F.col("doc_id").alias("_id"))
    meta_upsert = F.to_json(F.struct(action_meta.alias("update")))
    meta_delete = F.to_json(F.struct(action_meta.alias("delete")))
    body = F.concat(F.lit('{"doc":'), F.col("doc_json"), F.lit(',"doc_as_upsert":true}'))
    lines = F.when(
        F.col("action") == "delete", F.array(meta_delete)
    ).otherwise(F.array(meta_upsert, body))
    return ops.select("index", "event_id", "seq", lines.alias("lines"))


def mongo_ops(
    events: DataFrame,
    db_template: str = "{$SchemaName}",
    collection_template: str = "{$TableName}",
) -> DataFrame:
    """Change events → MongoDB point-operation rows
    ``(op, db, collection, filter_json, doc_json, event_id)``.

    op ∈ upsert | remove.  filter = PK fields from the operative image
    (after; before for deletes), doc = the full after image — exactly the
    reference's Upsert(k, data.Rows[n]) / Remove(k) calls."""
    src = events.filter(F.col("event_type").isin("insert", "update", "delete"))
    is_del = F.col("event_type") == "delete"
    img = F.when(is_del, F.col("before")).otherwise(F.col("after"))
    filt = F.to_json(F.struct(*[img.getField(c).alias(c) for c in PK_COLUMNS]))
    return src.select(
        F.when(is_del, F.lit("remove")).otherwise(F.lit("upsert")).alias("op"),
        template_expr(db_template).alias("db"),
        template_expr(collection_template).alias("collection"),
        filt.alias("filter_json"),
        F.when(~is_del, F.to_json(F.col("after"))).alias("doc_json"),
        F.col("event_id").alias("event_id"),
    )
