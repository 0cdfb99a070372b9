"""Streaming dedup: within-horizon duplicates suppressed, state evicted
after the watermark passes (bounded state), batch twin agrees."""

import json
import os

from pyspark.sql import functions as F

from bifrost_spark.streaming.dedup_stream import (
    content_fingerprint,
    dedup_stream,
    start_doc_dedup_stream,
)

T0 = "2026-01-01T00:00:00"


def _write_file(d: str, name: str, rows: list[dict]) -> None:
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, name), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def _doc(doc_id, minute, text, source="web"):
    return {"doc_id": doc_id, "ts": f"2026-01-01T00:{minute:02d}:00", "text": text, "source": source}


def test_fingerprint_normalizes(spark):
    df = spark.createDataFrame(
        [(1, "Hello,  World!"), (2, "hello world"), (3, "different entirely")],
        "doc_id long, text string",
    )
    fps = {r["doc_id"]: r["fp"] for r in
           df.select("doc_id", content_fingerprint(F.col("text")).alias("fp")).collect()}
    assert fps[1] == fps[2]  # case/punct/whitespace-insensitive
    assert fps[1] != fps[3]


def test_batch_twin_dedups(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "Alpha Beta gamma"), (3, "other text")],
        "doc_id long, text string",
    )
    out = dedup_stream(df)
    assert out.count() == 2
    assert out.select("content_fp").distinct().count() == 2


def test_stream_dedups_within_horizon_and_evicts_after(spark, tmp_path):
    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    # batch 1: A at t+0 (and an in-batch exact dup of A), B at t+1
    _write_file(src, "f1.json", [
        _doc(1, 0, "the shared boilerplate text body"),
        _doc(2, 0, "The  SHARED boilerplate text body!"),   # dup of 1 (normalized)
        _doc(3, 1, "a unique first document"),
    ])
    q = start_doc_dedup_stream(spark, src, out, ckpt, delay="5 minutes")
    q.processAllAvailable()

    # batch 2: another dup of A inside the horizon -> dropped; filler at
    # t+20 advances the watermark past t0+5m, evicting A's state
    _write_file(src, "f2.json", [
        _doc(4, 2, "the shared boilerplate text body"),
        _doc(5, 20, "watermark advancing filler document"),
    ])
    q.processAllAvailable()

    # batch 3: A re-arrives AFTER eviction -> re-emitted (bounded-state trade)
    _write_file(src, "f3.json", [
        _doc(6, 21, "the shared boilerplate text body"),
    ])
    q.processAllAvailable()
    q.stop()

    got = spark.read.parquet(out)
    by_id = {r["doc_id"]: r["content_fp"] for r in got.collect()}
    a_fp = [fp for i, fp in by_id.items() if i in (1, 2, 4, 6)]
    # exactly one of the within-horizon A arrivals (1/2/4) survived, plus
    # the post-eviction re-arrival (6)
    assert 6 in by_id
    assert len([i for i in by_id if i in (1, 2, 4)]) == 1
    assert len(set(a_fp)) == 1  # all A rows share the fingerprint
    assert 3 in by_id and 5 in by_id  # non-dups all pass
    assert got.count() == 4


def test_streaming_ingest_pipeline_matches_batch(spark, tmp_path):
    """Composite ingest under Structured Streaming semantics: quality gate
    (pure expressions ride the stream) → online dedup → parquet sink,
    single trigger — kept set must equal the batch composite on the same
    rows (quality_features filter + fingerprint dropDuplicates)."""
    from pyspark.sql import functions as F  # noqa: F811

    from bifrost_spark.functions.text import quality_features
    from bifrost_spark.streaming.dedup_stream import DOC_STREAM_SCHEMA

    rich = ("the quick brown fox jumps over the lazy dog and then it runs "
            "far away into the green hills for a long while afterwards")
    rows = [
        _doc(1, 0, rich),
        _doc(2, 1, rich + "!!"),        # near-identical after normalization -> dup of 1
        _doc(3, 2, "x x x"),            # fails the quality gate (too short)
        _doc(4, 3, rich + " different suffix words entirely here"),
    ]
    src = str(tmp_path / "in")
    _write_file(src, "f1.json", rows)

    def gate(df):
        return quality_features(df).filter(
            (F.col("n_tokens") >= 10) & (F.col("quality_score") >= 0.5)
        ).drop("n_tokens", "stopword_ratio", "distinct_ratio", "punct_ratio", "quality_score")

    stream = spark.readStream.schema(DOC_STREAM_SCHEMA).json(src)
    kept = dedup_stream(gate(stream), delay="5 minutes")
    out = str(tmp_path / "out")
    q = (kept.writeStream.format("parquet").option("path", out)
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .outputMode("append").start())
    q.processAllAvailable()
    q.stop()

    got = {r["doc_id"] for r in spark.read.parquet(out).collect()}
    batch = dedup_stream(gate(spark.createDataFrame(
        [(r["doc_id"], r["text"]) for r in rows], "doc_id long, text string")))
    batch_ids = {r["doc_id"] for r in batch.collect()}
    assert 3 not in got and len(got) == 2  # gate drops 3; 1/2 collapse; 4 kept
    assert len(got) == len(batch_ids)
    # same fingerprint groups survive either way (which member of a dup
    # group wins is arbitrary in both engines)
    assert got <= {1, 2, 4} and batch_ids <= {1, 2, 4}


def test_stream_simhash_mode_runs(spark, tmp_path):
    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    _write_file(src, "f1.json", [
        _doc(1, 0, "word one two three four five six seven"),
        _doc(2, 1, "word one two three four five six seven"),
        _doc(3, 2, "completely different content here now ok"),
    ])
    q = start_doc_dedup_stream(spark, src, out, str(tmp_path / "ckpt"),
                               delay="5 minutes", mode="simhash")
    q.processAllAvailable()
    q.stop()
    assert spark.read.parquet(out).count() == 2
