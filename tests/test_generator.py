"""Generator properties: determinism, ordering, op mix, skew."""

from pyspark.sql import functions as F

from bifrost_spark.generator import GeneratorConfig, generate_events, generate_snapshot

CFG = GeneratorConfig(n_events=4000, n_keys=500, n_repos=40, seed=7,
                      ddl=[(2000, "ALTER TABLE code.repos ADD COLUMN stars INT")])


def test_deterministic(spark):
    a = generate_events(spark, CFG)
    b = generate_events(spark, CFG)
    def _h(df):
        return df.select(
            F.sum(F.xxhash64(F.to_json(F.struct(*df.columns))).cast("decimal(38,0)")).alias("h")
        ).collect()[0]["h"]

    ha, hb = _h(a), _h(b)
    assert ha == hb
    assert a.count() == CFG.n_events + 1


def test_event_ids_strictly_increasing_and_unique(spark):
    df = generate_events(spark, CFG)
    n = df.count()
    assert df.select("event_id").distinct().count() == n
    # data even / ddl odd, interleaved ordering matches (file_num, pos) order
    mono = df.orderBy("event_id").select("event_id", "file_num", "pos").collect()
    pairs = [(r["file_num"], r["pos"]) for r in mono]
    assert pairs == sorted(pairs)


def test_op_mix_and_phases(spark):
    df = generate_events(spark, CFG)
    mix = {r["event_type"]: r["count"] for r in df.groupBy("event_type").agg(F.count("*").alias("count")).collect()}
    assert mix["ddl"] == 1
    assert mix["delete"] > 0 and mix["update"] > 0
    # phase 1: the first `phase1` events are inserts of distinct keys
    p1 = df.filter(F.col("event_id") <= 2 * CFG.phase1).select("after.path").distinct().count()
    assert p1 == CFG.phase1


def test_payload_invariants(spark):
    df = generate_events(spark, CFG)
    data = df.filter(F.col("event_type") != "ddl")
    assert data.filter(F.col("after").isNull() & (F.col("event_type") != "delete")).count() == 0
    assert data.filter((F.col("event_type") == "delete") & F.col("before").isNull()).count() == 0
    # deletes/updates carry a PK-only before image
    assert data.filter((F.col("event_type") == "delete") & F.col("before.content").isNotNull()).count() == 0
    # extras appear only after the DDL (schema_version >= 1)
    assert data.filter((F.col("schema_version") == 0) & F.col("after.extra").isNotNull()).count() == 0
    assert data.filter((F.col("schema_version") == 1) & (F.col("event_type") != "delete")
                       & F.col("after.extra")["stars"].isNull()).count() == 0


def test_repo_skew(spark):
    df = generate_events(spark, CFG)
    top = (
        df.filter(F.col("event_type") != "ddl")
        .groupBy("after.repo").count().orderBy(F.desc("count")).limit(1).collect()
    )
    total = CFG.n_events
    assert top[0]["repo"] in ("linux", "chromium")
    assert top[0]["count"] > total * 0.2  # mega-repo hot key exists


def test_snapshot(spark):
    cfg = GeneratorConfig(n_events=10, n_keys=100, snapshot_keys=50, seed=7)
    snap = generate_snapshot(spark, cfg)
    assert snap.count() == 50
    assert snap.filter(F.col("last_event_id") != 0).count() == 0
    assert set(snap.columns) == {"repo", "path", "commit", "lang", "content", "last_event_id"}
