"""DDL classifier unit tests — mirrors the reference's table-driven tests
(/root/reference/Bristol/mysql/binlog_query_test.go,
/root/reference/plugin/clickhouse/src/alter_sql_test.go)."""

from bifrost_spark.ddl import classify_query
from bifrost_spark.registry import SchemaRegistry


def test_non_ddl():
    for q in ["BEGIN", "COMMIT", "GRANT ALL ON *.* TO x", "insert into t values (1)"]:
        assert classify_query(q).is_ddl is False


def test_add_column():
    op = classify_query("ALTER TABLE code.repos ADD COLUMN stars INT NULL")
    assert (op.kind, op.schema_name, op.table_name, op.column, op.logical_type) == (
        "add_column", "code", "repos", "stars", "int")


def test_add_column_no_kw_and_backticks():
    op = classify_query("alter table `code`.`repos` add `lines` bigint default 0")
    assert (op.kind, op.column, op.logical_type) == ("add_column", "lines", "bigint")


def test_modify_column():
    op = classify_query("ALTER TABLE code.repos MODIFY COLUMN stars BIGINT")
    assert (op.kind, op.column, op.logical_type) == ("modify_column", "stars", "bigint")


def test_change_column():
    op = classify_query("ALTER TABLE repos CHANGE COLUMN stars star_count BIGINT NOT NULL")
    assert (op.kind, op.column, op.new_column, op.logical_type) == (
        "change_column", "stars", "star_count", "bigint")


def test_drop_column():
    op = classify_query("ALTER TABLE code.repos DROP COLUMN stars")
    assert (op.kind, op.column) == ("drop_column", "stars")


def test_multi_section_alter_drops_index_sections():
    op = classify_query(
        "ALTER TABLE t ADD COLUMN a INT, ADD INDEX idx_a (a), DROP COLUMN b, ADD PRIMARY KEY (id)")
    assert op.kind == "alter_multi"
    kinds = [s.kind for s in op.sections]
    assert kinds == ["add_column", "drop_column"]


def test_truncate_drop_create_rename():
    assert classify_query("TRUNCATE TABLE code.repos").kind == "truncate"
    assert classify_query("truncate code.repos").kind == "truncate"
    assert classify_query("DROP TABLE IF EXISTS code.repos").kind == "drop_table"
    assert classify_query("CREATE TABLE code.repos (a int)").kind == "create_table"
    assert classify_query("RENAME TABLE code.repos TO code.repos2").kind == "rename_table"


def test_create_table_with_options_like_and_ctas():
    # real MySQL binlog CREATEs virtually always carry table options
    op = classify_query(
        "CREATE TABLE code.repos (repo VARCHAR(255), stars INT) "
        "ENGINE=InnoDB DEFAULT CHARSET=utf8mb4"
    )
    assert op.kind == "create_table" and op.table_name == "repos"
    assert [(c.column, c.logical_type) for c in op.sections] == [("repo", "string"), ("stars", "int")]
    assert classify_query("CREATE TABLE t2 LIKE code.repos").kind == "create_table"
    ctas = classify_query("CREATE TABLE t3 AS SELECT * FROM code.repos")
    assert ctas.kind == "create_table" and not ctas.sections


def test_comment_stripping():
    op = classify_query("/* gh-ost */ ALTER TABLE code.repos ADD COLUMN x INT -- trail")
    assert op.kind == "add_column" and op.column == "x"


def test_registry_evolution_roundtrip():
    reg = SchemaRegistry()
    reg.apply_ddl("ALTER TABLE code.repos ADD COLUMN stars INT")
    reg.apply_ddl("ALTER TABLE code.repos MODIFY COLUMN stars BIGINT")
    reg.apply_ddl("ALTER TABLE code.repos ADD COLUMN notes STRING")
    assert reg.extra_columns(1) == (("stars", "int"),)
    assert reg.extra_columns(2) == (("stars", "bigint"),)
    assert reg.extra_columns(3) == (("stars", "bigint"), ("notes", "string"))
    reg.apply_ddl("ALTER TABLE code.repos DROP COLUMN stars")
    assert reg.extra_columns(4) == (("notes", "string"),)
    reg2 = SchemaRegistry.from_dict(reg.to_dict())
    assert reg2.extra_columns(4) == reg.extra_columns(4)
    assert reg2.current_version == 4


def test_registry_truncate_flag():
    reg = SchemaRegistry()
    v = reg.apply_ddl("TRUNCATE TABLE code.repos")
    assert v.truncated is True


def test_align_arrow_rewrites_batches():
    """Arrow-batch rewrite at a DDL barrier: add → null-pad, change → rename
    +cast, drop → removed (north-star Arrow-backed registry requirement)."""
    import pyarrow as pa

    from bifrost_spark.registry import SchemaRegistry

    reg = SchemaRegistry()
    reg.apply_ddl("ALTER TABLE code.repos ADD COLUMN stars INT")
    b = pa.RecordBatch.from_arrays(
        [pa.array(["r1"]), pa.array(["p1"]), pa.array(["c"]), pa.array(["py"]), pa.array(["x"])],
        names=["repo", "path", "commit", "lang", "content"],
    )
    out = reg.align_arrow(b)
    assert out.schema.names[-1] == "stars"
    assert out.column("stars").null_count == 1
    assert out.column("stars").type == pa.int32()

    # batch already carrying stars as string gets cast to int32
    b2 = pa.RecordBatch.from_arrays(
        [pa.array(["r1"]), pa.array(["p1"]), pa.array(["c"]), pa.array(["py"]),
         pa.array(["x"]), pa.array(["7"])],
        names=["repo", "path", "commit", "lang", "content", "stars"],
    )
    out2 = reg.align_arrow(b2)
    assert out2.column("stars").to_pylist() == [7]

    reg.apply_ddl("ALTER TABLE code.repos DROP COLUMN stars")
    out3 = reg.align_arrow(b2)
    assert "stars" not in out3.schema.names

    # old version still addressable: align to v1 re-adds stars
    out4 = reg.align_arrow(b, v=1)
    assert "stars" in out4.schema.names


def test_create_table_parses_columns():
    from bifrost_spark.ddl import classify_query

    op = classify_query(
        "CREATE TABLE IF NOT EXISTS code.repos ("
        "repo VARCHAR(255) NOT NULL, path VARCHAR(512), commit CHAR(40), "
        "lang VARCHAR(16), content TEXT, stars INT DEFAULT 0, "
        "updated_at DATETIME, PRIMARY KEY (repo, path), KEY idx_lang (lang))"
    )
    assert op.kind == "create_table" and op.table_name == "repos"
    cols = {c.column: c.logical_type for c in op.sections}
    assert cols["stars"] == "int" and cols["updated_at"] == "timestamp"
    assert "idx_lang" not in cols  # constraint/index sections dropped


def test_registry_table_lifecycle():
    """DROP evicts the cached schema, CREATE reloads it fresh from the
    statement's own column list, RENAME moves the entry intact — mirroring
    /root/reference/Bristol/mysql/conn_dump.go:196-203."""
    from bifrost_spark.registry import SchemaRegistry

    reg = SchemaRegistry()
    reg.apply_ddl("ALTER TABLE code.repos ADD COLUMN stars INT")
    assert dict(reg.current.extras) == {"stars": "int"}

    v = reg.apply_ddl("RENAME TABLE code.repos TO code.repos_v2")
    assert dict(v.extras) == {"stars": "int"}  # schema survives the move
    assert reg.table_name == "repos_v2"

    v = reg.apply_ddl("DROP TABLE code.repos_v2")
    assert v.dropped and v.extras == ()

    v = reg.apply_ddl(
        "CREATE TABLE code.repos_v2 (repo VARCHAR(255), path VARCHAR(512), "
        "commit CHAR(40), lang VARCHAR(16), content TEXT, forks BIGINT)"
    )
    assert not v.dropped and dict(v.extras) == {"forks": "bigint"}
    assert reg.table_name == "repos_v2"

    # round-trips through snapshot serialization
    reg2 = SchemaRegistry.from_dict(reg.to_dict())
    assert dict(reg2.current.extras) == {"forks": "bigint"}
    assert reg2.table_name == "repos_v2"
    assert reg2.version(3).dropped
