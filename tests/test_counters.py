"""Flow counters / min-position (SURVEY.md §2.4 A1-A3)."""

from pyspark.sql import functions as F

from bifrost_spark.generator import GeneratorConfig, generate_events
from bifrost_spark.operators.counters import flow_counters, min_position, table_counts


def test_flow_counters_partition_of_total(spark):
    cfg = GeneratorConfig(n_events=2000, n_keys=200, seed=3)
    ev = generate_events(spark, cfg)
    fc = flow_counters(ev, bucket_seconds=5)
    total = fc.agg(F.sum("events").alias("n"), F.sum("inserts").alias("i"),
                   F.sum("updates").alias("u"), F.sum("deletes").alias("d")).collect()[0]
    assert total["n"] == 2000
    assert total["i"] + total["u"] + total["d"] == 2000
    assert fc.filter(F.col("bytes") <= 0).count() == 0


def test_table_counts(spark):
    cfg = GeneratorConfig(n_events=1000, n_keys=100, seed=4)
    tc = {r["event_type"]: r["n"] for r in table_counts(generate_events(spark, cfg)).collect()}
    assert sum(tc.values()) == 1000


def test_min_position_skips_idle(spark):
    df = spark.createDataFrame(
        [("s1", False, 100), ("s2", False, 80), ("s3", True, 10)],
        "sink string, is_idle boolean, event_id long",
    )
    assert min_position(df).collect()[0]["ack_event_id"] == 80
    # all idle → max wins (offsets can advance past idle sinks)
    all_idle = spark.createDataFrame([("s1", True, 100), ("s2", True, 80)], "sink string, is_idle boolean, event_id long")
    assert min_position(all_idle).collect()[0]["ack_event_id"] == 100
