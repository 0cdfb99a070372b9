"""Incremental changelog read between two table snapshots (CDC *read*).

The engine's write side turns a change stream into table state; this is the
inverse surface a downstream consumer wants: "give me everything that
changed since snapshot X" — the Iceberg incremental-read / changelog-scan
model, and the lake-side analogue of the reference re-publishing applied
changes to a message sink (/root/reference/plugin/kafka/src/kafka.go — the
reference can only re-emit events as they pass through; a lake table can
answer the question retroactively for ANY retained snapshot pair).

Design for 100 TB: NO JOIN on the default path.  Every row in the table
carries ``last_event_id`` (the MERGE guard column), and every snapshot
manifest records the table-wide high-water mark, so the changelog between
``from_snapshot`` and ``to_snapshot`` is exactly the to-state rows
(tombstones included) with ``last_event_id`` above the from-state's mark:

- bucket pruning first: only buckets whose data directory moved between the
  two manifests can contain such rows (a bucket untouched by every batch in
  between keeps its directory), and the ``bucket=NN`` layout makes that a
  partition prune;
- then a pushed-down ``last_event_id > cutoff`` parquet filter — min/max
  footer stats skip whole files of cold rows inside rewritten buckets;
- no shuffle at all: scan → filter → project.

``with_pre_images=True`` additionally classifies insert vs update and
attaches the before image; that genuinely needs the from-state, so it joins
the changed rows against the from-snapshot read on (bucket, PKs) — still
restricted to changed buckets on BOTH sides.

Correctness guard: ``compact(tombstone_low_water_mark=N)`` purges tombstones
at-or-below N; a changelog whose cutoff lies below a purge mark would
silently miss deletes, so manifests record the high-water purge mark and
``table_changes`` refuses such reads instead of under-reporting.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bifrost_spark.metafs import metafs_for
from bifrost_spark.operators.merge import TargetTable
from bifrost_spark.schemas import PAYLOAD_COLUMNS, PK_COLUMNS


def _manifest(spark: SparkSession, path: str, snapshot: str) -> dict:
    fs = metafs_for(spark, path)
    p = os.path.join(path, "_state", f"{snapshot}.json")
    if not fs.exists(p):
        raise ValueError(f"unknown snapshot {snapshot!r} (no manifest at {p})")
    return json.loads(fs.read_text(p))


def table_changes(
    spark: SparkSession,
    path: str,
    from_snapshot: str,
    to_snapshot: str | None = None,
    with_pre_images: bool = False,
) -> DataFrame:
    """Rows that changed between ``from_snapshot`` (exclusive) and
    ``to_snapshot`` (inclusive; default CURRENT).

    Default shape: the to-state columns plus ``change_type`` ∈
    ``upsert | delete`` and the winning ``last_event_id`` — a delete is the
    retained tombstone (PKs + nulls).  With ``with_pre_images=True``:
    ``change_type`` ∈ ``insert | update | delete`` plus a ``before`` struct
    of the from-state row (null for inserts).

    Only the from-manifest is needed for the default path — its DATA may
    already be vacuumed; ``with_pre_images`` requires it readable."""
    from_state = _manifest(spark, path, from_snapshot)
    to_table = TargetTable(spark, path, at_snapshot=to_snapshot)
    cutoff = from_state["last_event_id"]
    if to_table.last_event_id < cutoff:
        raise ValueError(
            f"{to_snapshot or 'CURRENT'} (last_event_id={to_table.last_event_id}) is "
            f"not a descendant of {from_snapshot} (last_event_id={cutoff})"
        )
    purged = to_table.state.get("tombstone_lwm", -1)
    if purged > cutoff:
        raise ValueError(
            f"deletes in ({cutoff}, {purged}] were purged by compaction "
            f"(tombstone_lwm={purged}); changelog from {from_snapshot} would "
            "under-report deletes — read from a later snapshot or compact "
            "with a lower low-water mark"
        )
    # bucket pruning: a bucket whose data dir is identical in both manifests
    # was not rewritten by any batch in between, so it cannot hold a row
    # above the cutoff
    from_bmap: dict = from_state.get("buckets", {})
    to_bmap: dict = to_table.state.get("buckets", {})
    changed = [int(b) for b, snap in to_bmap.items() if from_bmap.get(b) != snap]
    cur = (
        to_table.read(buckets=changed, include_deleted=True)
        .drop("extra")
        .filter(F.col("last_event_id") > F.lit(cutoff))
    )
    if not with_pre_images:
        return cur.withColumn(
            "change_type",
            F.when(F.col("is_deleted"), F.lit("delete")).otherwise(F.lit("upsert")),
        ).drop("is_deleted")

    # pre-image path: the from-state of the SAME changed buckets, joined on
    # (bucket, PKs) — bucket is a pure function of the PKs, so including it
    # both prunes the scan and keeps the join keys aligned with the layout
    old_table = TargetTable(spark, path, at_snapshot=from_snapshot)
    old_full = old_table.read(buckets=changed)
    non_keys = [c for c in old_full.columns if c not in (*PK_COLUMNS, "bucket")]
    old = old_full.select(
        "bucket", *PK_COLUMNS, F.struct(*non_keys).alias("before"))
    joined = cur.join(old, on=["bucket", *PK_COLUMNS], how="left")
    return joined.withColumn(
        "change_type",
        F.when(F.col("is_deleted"), F.lit("delete"))
        .when(F.col("before").isNull(), F.lit("insert"))
        .otherwise(F.lit("update")),
    ).drop("is_deleted")


def changes_to_events(
    changelog: DataFrame,
    schema_name: str = "code",
    table_name: str = "repos",
    schema_version: int = 0,
) -> DataFrame:
    """Pre-image changelog rows → canonical EVENT_SCHEMA change events, so a
    snapshot-pair changelog can be RE-PUBLISHED through the M6 message
    encoders (sinks/messages.py) or driven into another TargetTable — the
    retroactive twin of the reference's Kafka sink re-emitting changes as
    they pass through (/root/reference/plugin/kafka/src/kafka.go); the lake
    table can answer it for any retained snapshot pair, after the fact.

    Input must come from ``table_changes(..., with_pre_images=True)`` (the
    insert/update/delete classification + before struct).  Deterministic by
    construction: ``ts`` is the epoch (the changelog stores no wall time),
    ``event_id`` is the winning event id, positions derive from it.  Extra
    (post-DDL) columns beyond the v0 payload ride the ``extra`` map, exactly
    like an unordered pre-DDL event would carry them."""
    known = {*PAYLOAD_COLUMNS, "bucket", "change_type", "before", "last_event_id"}
    extras = [c for c in changelog.columns if c not in known]
    extra_map = (
        F.map_filter(
            F.map_from_arrays(
                F.array(*[F.lit(c) for c in extras]),
                F.array(*[F.col(c).cast("string") for c in extras]),
            ),
            lambda _k, v: v.isNotNull(),
        )
        if extras
        else F.lit(None).cast("map<string,string>")
    )
    after_img = F.struct(
        *[F.col(c).alias(c) for c in PAYLOAD_COLUMNS], extra_map.alias("extra")
    )
    # delete/update pre-image: PKs from the key columns, the rest from the
    # joined before struct (null for inserts, or a tombstoned key that had
    # no from-state row)
    before_img = F.struct(
        *[F.col(c).alias(c) for c in PK_COLUMNS],
        *[
            F.col("before").getField(c).cast("string").alias(c)
            for c in PAYLOAD_COLUMNS
            if c not in PK_COLUMNS
        ],
        F.lit(None).cast("map<string,string>").alias("extra"),
    )
    ct = F.col("change_type")
    return changelog.select(
        F.col("last_event_id").alias("event_id"),
        F.lit(1).alias("file_num"),
        (F.col("last_event_id") * 8).alias("pos"),
        ct.alias("event_type"),
        F.lit(schema_name).alias("schema_name"),
        F.lit(table_name).alias("table_name"),
        F.to_timestamp(F.lit("1970-01-01 00:00:00")).alias("ts"),
        F.lit(None).cast("string").alias("gtid"),
        F.array(*[F.lit(c) for c in PK_COLUMNS]).alias("pri"),
        F.when(ct != "insert", before_img).alias("before"),
        F.when(ct != "delete", after_img).alias("after"),
        F.lit(None).cast("string").alias("query"),
        F.lit(schema_version).alias("schema_version"),
    )


def changelog_messages(
    spark: SparkSession,
    path: str,
    from_snapshot: str,
    to_snapshot: str | None = None,
    fmt: str = "bifrost",
    topic_template: str = "{$SchemaName}_{$TableName}",
    key_template: str | None = None,
    schema_name: str = "code",
    table_name: str = "repos",
) -> DataFrame:
    """One-call composition: changelog between two snapshots → broker-ready
    ``(topic, key, value)`` message rows in any M6 wire format."""
    from bifrost_spark.sinks.messages import kafka_messages

    events = changes_to_events(
        table_changes(spark, path, from_snapshot, to_snapshot, with_pre_images=True),
        schema_name=schema_name,
        table_name=table_name,
    )
    return kafka_messages(events, topic_template=topic_template,
                          key_template=key_template, fmt=fmt)
