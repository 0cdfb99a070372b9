"""DDL classification and parsing.

Re-expresses the reference's lexical DDL classifier
(/root/reference/Bristol/mysql/binlog_query.go:20-196 — ALTER / TRUNCATE /
RENAME / DROP / CREATE detection with comment stripping) and the
ALTER-statement section parser used for sink-dialect transfer
(/root/reference/plugin/clickhouse/src/alter_sql.go:59-330 — ADD / MODIFY /
CHANGE / DROP COLUMN dispatch).  Here the output is a structured ``DDLOp``
consumed by the schema registry instead of a translated SQL string.

This is driver-side control-plane logic operating on a handful of DDL events
per replay — deliberately plain Python, never on the per-row data path.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

_COMMENT_RE = re.compile(r"/\*.*?\*/|--[^\n]*", re.DOTALL)


@dataclass(frozen=True)
class DDLOp:
    kind: str  # add_column | modify_column | change_column | drop_column | truncate | create_table | drop_table | rename_table | other
    schema_name: str | None = None
    table_name: str | None = None
    column: str | None = None
    new_column: str | None = None  # for CHANGE COLUMN renames
    logical_type: str | None = None
    is_ddl: bool = True
    raw: str = ""
    sections: tuple["DDLOp", ...] = field(default_factory=tuple)


def _strip(sql: str) -> str:
    return _COMMENT_RE.sub(" ", sql).strip().rstrip(";").strip()


def _split_ident(ident: str) -> tuple[str | None, str]:
    ident = ident.strip().strip("`")
    if "." in ident:
        s, t = ident.split(".", 1)
        return s.strip("`"), t.strip("`")
    return None, ident


_TYPE_NORM = {
    "int": "int",
    "integer": "int",
    "tinyint": "int",
    "smallint": "int",
    "mediumint": "int",
    "bigint": "bigint",
    "float": "double",
    "double": "double",
    "real": "double",
    "bool": "boolean",
    "boolean": "boolean",
    "timestamp": "timestamp",
    "datetime": "timestamp",
}


def _norm_type(type_sql: str) -> str:
    base = re.split(r"[(\s]", type_sql.strip().lower(), 1)[0]
    return _TYPE_NORM.get(base, "string")


def classify_query(sql: str) -> DDLOp:
    """Classify a raw query-event string.

    Returns ``is_ddl=False`` for BEGIN/COMMIT/DML/GRANT etc. (the reference
    filters GRANT and non-DDL the same way — binlog_query.go:20-60).
    """
    s = _strip(sql)
    low = s.lower()

    if re.match(r"^(begin|commit|grant|revoke|set|insert|update|delete|select|flush)\b", low):
        return DDLOp(kind="other", is_ddl=False, raw=sql)

    m = re.match(r"^truncate\s+(?:table\s+)?([\w.`]+)", low)
    if m:
        sch, tbl = _split_ident(s[m.start(1) : m.end(1)])
        return DDLOp(kind="truncate", schema_name=sch, table_name=tbl, raw=sql)

    m = re.match(r"^drop\s+table\s+(?:if\s+exists\s+)?([\w.`]+)", low)
    if m:
        sch, tbl = _split_ident(s[m.start(1) : m.end(1)])
        return DDLOp(kind="drop_table", schema_name=sch, table_name=tbl, raw=sql)

    # tail after the table name may be a column list, table options
    # (ENGINE=/CHARSET= — present on virtually every real MySQL CREATE),
    # LIKE other_table, or AS SELECT; only a leading parenthesized column
    # list yields sections (LIKE/CTAS classify as create_table with none).
    m = re.match(r"^create\s+table\s+(?:if\s+not\s+exists\s+)?([\w.`]+)\s*(.*)$", low, re.DOTALL)
    if m:
        sch, tbl = _split_ident(s[m.start(1) : m.end(1)])
        cols: list[DDLOp] = []
        rest = s[m.start(2):].strip()  # original case
        body = None
        if rest.startswith("("):
            depth = 0
            for i, ch in enumerate(rest):  # match the closing paren by depth
                if ch == "(":
                    depth += 1
                elif ch == ")":
                    depth -= 1
                    if depth == 0:
                        body = rest[1:i]
                        break
        if body:
            for sec in _split_toplevel_commas(body):
                cm = re.match(
                    r"^(?!primary\b|unique\b|key\b|index\b|constraint\b|foreign\b|fulltext\b)"
                    r"`?(\w+)`?\s+([\w()',\s]+?)(?:\s+(?:null|not\s+null|default\b.*|comment\b.*))?$",
                    sec.strip().lower(),
                )
                if cm:
                    cols.append(DDLOp("add_column", sch, tbl, column=cm.group(1),
                                      logical_type=_norm_type(cm.group(2)), raw=sql))
        return DDLOp(kind="create_table", schema_name=sch, table_name=tbl, raw=sql,
                     sections=tuple(cols))

    m = re.match(r"^rename\s+table\s+([\w.`]+)\s+to\s+([\w.`]+)", low)
    if m:
        sch, tbl = _split_ident(s[m.start(1) : m.end(1)])
        _, new = _split_ident(s[m.start(2) : m.end(2)])
        return DDLOp(kind="rename_table", schema_name=sch, table_name=tbl, new_column=new, raw=sql)

    m = re.match(r"^alter\s+table\s+([\w.`]+)\s+(.*)$", s, re.IGNORECASE | re.DOTALL)
    if m:
        sch, tbl = _split_ident(m.group(1))
        sections = _parse_alter_sections(m.group(2), sch, tbl, sql)
        if len(sections) == 1:
            return sections[0]
        return DDLOp(kind="alter_multi", schema_name=sch, table_name=tbl, raw=sql, sections=tuple(sections))

    return DDLOp(kind="other", is_ddl=True, raw=sql)


def _split_toplevel_commas(body: str) -> list[str]:
    sections: list[str] = []
    depth, cur = 0, []
    for ch in body:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            sections.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur:
        sections.append("".join(cur))
    return sections


def _parse_alter_sections(body: str, sch: str | None, tbl: str, raw: str) -> list[DDLOp]:
    """Split an ALTER body on top-level commas and parse each section —
    the same comma-section dispatch as alter_sql.go:59-186 (index/partition/
    FK sections are dropped there too)."""
    sections = _split_toplevel_commas(body)

    ops: list[DDLOp] = []
    for sec in sections:
        sec = sec.strip()
        low = sec.lower()
        m = re.match(
            r"^add\s+(?!index\b|key\b|primary\b|unique\b|constraint\b|foreign\b|fulltext\b|partition\b)"
            r"(?:column\s+)?`?(\w+)`?\s+([\w()',\s]+?)(?:\s+(?:null|not\s+null|default\b.*|first|after\b.*))?$",
            low,
        )
        if m:
            ops.append(DDLOp("add_column", sch, tbl, column=m.group(1), logical_type=_norm_type(m.group(2)), raw=raw))
            continue
        m = re.match(r"^modify\s+(?:column\s+)?`?(\w+)`?\s+([\w()',\s]+?)(?:\s+(?:null|not\s+null|default\b.*))?$", low)
        if m:
            ops.append(DDLOp("modify_column", sch, tbl, column=m.group(1), logical_type=_norm_type(m.group(2)), raw=raw))
            continue
        m = re.match(r"^change\s+(?:column\s+)?`?(\w+)`?\s+`?(\w+)`?\s+([\w()',\s]+?)(?:\s+(?:null|not\s+null|default\b.*))?$", low)
        if m:
            ops.append(
                DDLOp("change_column", sch, tbl, column=m.group(1), new_column=m.group(2), logical_type=_norm_type(m.group(3)), raw=raw)
            )
            continue
        m = re.match(r"^drop\s+(?:column\s+)?`?(\w+)`?$", low)
        if m and m.group(1) not in ("index", "key", "primary", "foreign", "partition"):
            ops.append(DDLOp("drop_column", sch, tbl, column=m.group(1), raw=raw))
            continue
        # index / key / partition / FK sections: intentionally dropped,
        # as in alter_sql.go (they don't affect the lake table).
    if not ops:
        ops.append(DDLOp("other", sch, tbl, raw=raw))
    return ops
