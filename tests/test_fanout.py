"""F8 multi-sink fan-out: per-sink table matching, FilterQuery, the
per-sink stale double guard, per-sink formats, and the one-pass plan shape
(reference semantics: server/channel_consume.go:265-317)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from bifrost_spark.generator import GeneratorConfig, generate_events
from bifrost_spark.sinks.fanout import SinkSpec, fanout, write_fanout
from bifrost_spark.sources.kafka_formats import decode_bifrost_json, decode_canal_json


def _events(spark, with_ddl=True, n=120):
    ddl = [(40, "ALTER TABLE code.repos ADD COLUMN stars bigint")] if with_ddl else []
    ev = generate_events(spark, GeneratorConfig(n_events=n, n_keys=25, n_repos=5, ddl=ddl))
    # spread data events over three tables so routing has something to route
    return ev.withColumn(
        "table_name",
        F.when(F.col("event_type") == "ddl", F.col("table_name")).otherwise(
            F.concat(F.lit("t"), F.pmod(F.col("event_id") / 2, F.lit(3)).cast("int"))
        ),
    )


def test_fanout_table_routing(spark):
    events = _events(spark, with_ddl=False)
    specs = [
        SinkSpec(name="a", tables=("code.t*",), ignore_tables=("code.t2",)),
        SinkSpec(name="b", tables=("*.*",)),
        SinkSpec(name="c", tables=("code.t2",)),
    ]
    out = fanout(events, specs).cache()
    n = events.count()
    n_t2 = events.filter(F.col("table_name") == "t2").count()
    by_sink = {r["sink"]: r["n"] for r in out.groupBy("sink").agg(F.count("*").alias("n")).collect()}
    assert by_sink == {"a": n - n_t2, "b": n, "c": n_t2}
    # replication factor is explicit in the row count (bytes x n_sinks accounting)
    assert out.count() == (n - n_t2) + n + n_t2
    out.unpersist()


def test_fanout_filter_query_drops_ddl(spark):
    events = _events(spark, with_ddl=True)
    specs = [
        SinkSpec(name="q", filter_query=True),
        SinkSpec(name="all", filter_query=False),
    ]
    out = fanout(events, specs)
    assert out.filter((F.col("sink") == "q") & (F.col("event_type") == "ddl")).count() == 0
    n_ddl = events.filter(F.col("event_type") == "ddl").count()
    assert n_ddl > 0
    assert out.filter((F.col("sink") == "all") & (F.col("event_type") == "ddl")).count() == n_ddl


def test_fanout_stale_double_guard(spark):
    events = _events(spark, with_ddl=False)
    far_future = 4102444800  # 2100-01-01
    specs = [
        # stale by id AND ts -> skipped below the id cut
        SinkSpec(name="cut", last_event_id=100, last_ts=far_future),
        # ts guard says fresh -> the id cut alone must NOT skip (the
        # reference's double guard against mis-computed event ids)
        SinkSpec(name="guarded", last_event_id=100, last_ts=0),
    ]
    out = fanout(events, specs).cache()
    n = events.count()
    n_fresh = events.filter(F.col("event_id") >= 100).count()
    assert out.filter(F.col("sink") == "cut").count() == n_fresh
    assert n_fresh < n
    assert out.filter(F.col("sink") == "guarded").count() == n
    out.unpersist()


def test_fanout_per_sink_formats_roundtrip(spark):
    events = _events(spark, with_ddl=False)
    specs = [
        SinkSpec(name="native", fmt="bifrost", key_template="{$repo}/{$path}"),
        SinkSpec(name="canal", fmt="canal", topic_template="cdc_{$TableName}"),
    ]
    out = fanout(events, specs).cache()

    def as_kafka(sink):
        return out.filter(F.col("sink") == sink).select(
            "topic", F.lit(0).alias("partition"),
            F.col("event_id").alias("offset"), "value",
        )

    src = events.select("event_id", "event_type", F.col("after.repo").alias("after_repo"))
    for sink, decoder in (("native", decode_bifrost_json), ("canal", decode_canal_json)):
        dec = decoder(as_kafka(sink)).select(
            "event_id", "event_type", F.col("after.repo").alias("after_repo")
        )
        assert dec.exceptAll(src).count() == 0 and src.exceptAll(dec).count() == 0
    # per-sink templates rendered independently
    assert out.filter((F.col("sink") == "canal") & ~F.col("topic").startswith("cdc_t")).count() == 0
    assert out.filter((F.col("sink") == "native") & ~F.col("key").contains("/")).count() == 0
    out.unpersist()


def test_fanout_is_one_pass_no_shuffle(spark):
    events = _events(spark, with_ddl=False)
    plan = fanout(events, [SinkSpec(name="a"), SinkSpec(name="b", fmt="canal")])._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # narrow: project + generate only


def test_write_fanout_partitions_by_sink(spark, tmp_path):
    events = _events(spark, with_ddl=False, n=40)
    out = fanout(events, [SinkSpec(name="a"), SinkSpec(name="b")])
    base = str(tmp_path / "sinks")
    write_fanout(out, base)
    assert sorted(d for d in os.listdir(base) if d.startswith("sink=")) == ["sink=a", "sink=b"]
    back = spark.read.parquet(base)
    assert back.count() == out.count()
