"""Streaming document dedup with BOUNDED state (watermark eviction).

The batch dedup operators (functions/dedup.py) see the whole corpus at
once; an ingest pipeline sees an unbounded stream and must decide
keep/drop ONLINE.  This operator keys arriving docs by a content
fingerprint — exact (token-normalized xxhash64) or near (SimHash) — and
drops re-arrivals inside the event-time watermark horizon via
``dropDuplicatesWithinWatermark``.  Per-key state is evicted once the
watermark passes, so state size is bounded by (horizon × arrival rate),
never by corpus size — the property that lets the job run forever at
100 TB/day where an unbounded ``dropDuplicates`` would OOM the state
store.

The trade is explicit and standard: a duplicate arriving AFTER its
original's state was evicted is re-emitted (cross-horizon dups are the
batch operators' job in the nightly compaction pass); duplicates within
the horizon are suppressed exactly once each.

The reference has no streaming dedup — this extends its CDC stream
surface (SURVEY.md §2, streaming/job.py) with the training-data ingest
shape the brief calls for.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

DOC_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("text", T.StringType()),
        T.StructField("source", T.StringType()),
    ]
)


def content_fingerprint(text_col: Column, mode: str = "exact", n_bits: int = 64) -> Column:
    """Content key for dedup: ``exact`` = xxhash64 over the normalized token
    stream (case/whitespace/punctuation-insensitive byte-identical dup);
    ``simhash`` = the near-dup fingerprint (collides for texts within a few
    token edits).  Pure expression — JVM-side in streaming and batch plans."""
    if mode == "exact":
        from bifrost_spark.functions.dedup import _tokens

        return F.xxhash64(F.concat_ws(" ", _tokens(text_col)))
    if mode == "simhash":
        from bifrost_spark.functions.dedup import simhash_col

        return simhash_col(text_col, n_bits=n_bits)
    raise ValueError(f"mode must be 'exact' or 'simhash', got {mode!r}")


def dedup_stream(
    docs: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    delay: str = "10 minutes",
    mode: str = "exact",
    fp_col: str = "content_fp",
) -> DataFrame:
    """First arrival per content fingerprint passes; re-arrivals within
    ``delay`` (event time) are dropped; state evicts as the watermark
    advances.  Works on streaming and batch frames alike (batch: plain
    dropDuplicates on the fingerprint)."""
    out = docs.withColumn(fp_col, content_fingerprint(F.col(text_col), mode=mode))
    if not out.isStreaming:
        return out.dropDuplicates([fp_col])
    return out.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark([fp_col])


def start_doc_dedup_stream(
    spark: SparkSession,
    in_path: str,
    out_path: str,
    checkpoint_dir: str,
    delay: str = "10 minutes",
    mode: str = "exact",
    schema: T.StructType = DOC_STREAM_SCHEMA,
    max_files_per_trigger: int | None = None,
) -> StreamingQuery:
    """File-source ingest → online dedup → append parquet sink.  Append
    mode is correct here: dropDuplicatesWithinWatermark emits a surviving
    row immediately (no window hold), so the sink is an immutable kept-doc
    log a downstream trainer can tail."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    docs = reader.json(in_path)
    kept = dedup_stream(docs, delay=delay, mode=mode)
    return (
        kept.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .start()
    )
