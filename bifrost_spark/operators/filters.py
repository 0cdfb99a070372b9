"""Routing / filtering / projection operators — SURVEY.md §2.2 (F1-F14).

Each function is a declarative DataFrame transform so Catalyst pushes the
predicate/projection into the scan (the Spark analogue of the reference
skipping row decode entirely for non-replicated tables —
/root/reference/Bristol/mysql/parser.go:236-243).  All are narrow ops: no
shuffles in this layer.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


# F1/F7 — replicate-table filter with `*` wildcards and do/ignore lists
# (reference: Bristol/mysql/binlog_table_filter.go, input/driver/replicate.go:236-294,
#  server/channel_consume.go:247-263)
def table_pattern_pred(
    pat: str, schema_col: str = "schema_name", table_col: str = "table_name"
) -> Column:
    """One `schema.table` wildcard pattern → boolean Column (foldable regex,
    so Catalyst can push it into the scan).  Shared by F1/F7 filtering and
    the F8 fan-out sink matcher."""
    sch, tbl = pat.split(".", 1)
    pred = F.lit(True)
    if sch != "*":
        pred = pred & (F.col(schema_col) == sch)
    if tbl != "*":
        if "*" in tbl:
            rx = "^" + re.escape(tbl).replace(r"\*", ".*") + "$"
            pred = pred & F.col(table_col).rlike(rx)
        else:
            pred = pred & (F.col(table_col) == tbl)
    return pred


def replicate_table_filter(
    events: DataFrame,
    do_tables: list[str] | None = None,
    ignore_tables: list[str] | None = None,
    schema_col: str = "schema_name",
    table_col: str = "table_name",
) -> DataFrame:
    """Patterns are `schema.table` with `*` wildcards, precedence exact >
    schema.* > *.* (reference: server/callback.go:78-140 3-level routing)."""

    def pattern_pred(pat: str) -> Column:
        return table_pattern_pred(pat, schema_col, table_col)

    out = events
    if do_tables:
        allow = None
        for p in do_tables:
            allow = pattern_pred(p) if allow is None else (allow | pattern_pred(p))
        out = out.filter(allow)
    if ignore_tables:
        for p in ignore_tables:
            out = out.filter(~pattern_pred(p))
    return out


# F2/F12 — event-type subscription (reference: conn_dump.go:237-240 eventDo;
# FilterQuery channel_consume.go:295-299)
def event_type_filter(events: DataFrame, subscribed: list[str]) -> DataFrame:
    return events.filter(F.col("event_type").isin(subscribed))


# F6 — like-table wildcard expansion as a routing column
# (reference: server/db.go:371-397,680-762 TransferLikeTableReq)
def like_table_route(events: DataFrame, like_patterns: dict[str, str],
                     table_col: str = "table_name") -> DataFrame:
    """Adds `route`: first configured wildcard pattern the table matches
    (patterns like 'tbl_*' compiled to anchored regexes, as the reference
    compiles them), else the table name itself."""
    route = None
    for pat, target in like_patterns.items():
        rx = "^" + re.escape(pat).replace(r"\*", ".*") + "$"
        cond = F.col(table_col).rlike(rx)
        route = F.when(cond, F.lit(target)) if route is None else route.when(cond, F.lit(target))
    route = route.otherwise(F.col(table_col)) if route is not None else F.col(table_col)
    return events.withColumn("route", route)


# F9 — stale-event skip on redelivery (reference: channel_consume.go:300-314)
def stale_event_filter(events: DataFrame, last_committed_event_id: int) -> DataFrame:
    return events.filter(F.col("event_id") > F.lit(last_committed_event_id))


# F10 — column projection of the row images (reference FieldList:
# to_server_consume.go:486-574 — keeps configured fields in before AND after)
def field_list_projection(events: DataFrame, fields: list[str]) -> DataFrame:
    def prune(img: str) -> Column:
        return F.when(
            F.col(img).isNotNull(),
            F.struct(*[F.col(f"{img}.{f}").alias(f) for f in fields]),
        )

    return events.withColumn("before", prune("before")).withColumn("after", prune("after"))


# F11 — no-op update suppression (reference FilterUpdate:
# to_server_consume.go:532-569 deep-compares selected columns)
def noop_update_filter(events: DataFrame, compare_fields: list[str] | None = None) -> DataFrame:
    if compare_fields:
        b = F.struct(*[F.col(f"before.{f}") for f in compare_fields])
        a = F.struct(*[F.col(f"after.{f}") for f in compare_fields])
    else:
        b, a = F.col("before"), F.col("after")
    is_noop = (
        (F.col("event_type") == "update")
        & F.col("before").isNotNull()
        & (b == a)
    )
    return events.filter(~is_noop)


# F13 — multi-row event splitting (reference: to_server_consume.go:364-432
# splits N-row events into 1-row chunks, keeping binlog pos on the last).
def split_rows(packed: DataFrame, rows_col: str = "rows") -> DataFrame:
    """Input carries `rows: array<struct<before,after>>`; output is one event
    per element with `row_idx` and a total-order `seq` = event_id*4096+row_idx
    (intra-event order, mirrors the reference keeping position on the last
    chunk)."""
    return (
        packed.select(
            "*",
            F.posexplode(F.col(rows_col)).alias("row_idx", "_row"),
        )
        .drop(rows_col)
        .withColumn("before", F.col("_row.before"))
        .withColumn("after", F.col("_row.after"))
        .drop("_row")
        .withColumn("seq", F.col("event_id") * 4096 + F.col("row_idx"))
    )


# F14 — `{$tag}` template projection DSL (reference TransfeResult:
# plugin/driver/driver.go:143-284; used for Kafka topic/key + Redis keys).
_TAG_RE = re.compile(r"\{\$(\w+)(?:\[(?:'([^']+)'|(\d+))\])*\}|\{\$json\[([^\]]+)\][^}]*\}")


def template_expr(template: str) -> Column:
    """Compile a reference template string into ONE Column expression.

    Supported tags (driver.go:168-270): {$SchemaName} {$TableName}
    {$EventType} {$BinlogTimestamp} {$BinlogFileNum} {$BinlogPosition}
    {$EventID} {$GTID} {$BifrostNull} and {$<field>} row-field lookups from
    the after (fallback before) image, plus {$json['k']...} paths via
    get_json_object on the `query`/payload JSON.
    """
    meta = {
        "SchemaName": F.col("schema_name"),
        "TableName": F.col("table_name"),
        "EventType": F.col("event_type"),
        "BinlogTimestamp": F.unix_timestamp(F.col("ts")).cast("string"),
        "BinlogFileNum": F.col("file_num").cast("string"),
        "BinlogPosition": F.col("pos").cast("string"),
        "EventID": F.col("event_id").cast("string"),
        "GTID": F.col("gtid"),
        "BifrostNull": F.lit(None).cast("string"),
    }
    parts: list[Column] = []
    pos = 0
    for m in re.finditer(r"\{\$([A-Za-z_]\w*)((?:\[[^\]]+\])*)\}", template):
        if m.start() > pos:
            parts.append(F.lit(template[pos : m.start()]))
        name, path = m.group(1), m.group(2)
        if name == "json" and path:
            jpath = "$" + "".join(
                f".{p[1:-1]}" if p.startswith("'") else f"[{p}]"
                for p in re.findall(r"\[([^\]]+)\]", path)
            )
            parts.append(F.get_json_object(F.col("query"), jpath))
        elif name in meta:
            parts.append(meta[name])
        else:
            parts.append(F.coalesce(F.col(f"after.{name}"), F.col(f"before.{name}")))
        pos = m.end()
    if pos < len(template):
        parts.append(F.lit(template[pos:]))
    if not parts:
        return F.lit(template)
    return F.concat_ws("", *[F.coalesce(p.cast("string"), F.lit("")) for p in parts])


def template_projection(events: DataFrame, columns: dict[str, str]) -> DataFrame:
    """Add computed columns from template strings — e.g.
    {'kafka_key': '{$TableName}-{$repo}/{$path}'}."""
    out = events
    for name, tpl in columns.items():
        out = out.withColumn(name, template_expr(tpl))
    return out
