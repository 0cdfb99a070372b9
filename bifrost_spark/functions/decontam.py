"""Benchmark decontamination — the train/test-overlap gate every serious
training-data pipeline runs before a corpus ships (the n-gram-collision
method used for GPT-3/PaLM-style holdout scrubbing: a document is
contaminated if it shares any length-n token window with the benchmark).

Scale shape: benchmark gram sets are tiny next to the corpus (thousands of
eval documents vs billions of training docs), so the gram join BROADCASTS
the benchmark side and the corpus never shuffles — each corpus split
explodes its windows, probes the broadcast set, and aggregates per doc with
a map-side combine.  With ``hash_fn="xxhash64"`` the probe carries 8-byte
hashes instead of raw window strings (the production mode); ``"none"``
compares the window strings themselves, which any SQL engine reproduces
bit-exactly (the oracle mode).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from bifrost_spark.functions.spread import spread_for_compute


def _windows(text_col: Column, n: int) -> Column:
    """Distinct length-n token windows as strings; docs with fewer than n
    tokens yield NO windows (a truncated window would fabricate collisions
    between short docs and benchmark prefixes)."""
    toks = F.filter(F.split(F.lower(text_col), "[^a-z0-9]+"), lambda t: t != "")
    idx = F.when(F.size(toks) >= n, F.sequence(F.lit(0), F.size(toks) - n)).otherwise(
        F.array().cast("array<int>")
    )
    grams = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)))
    return F.array_distinct(grams)


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 13,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str | None = None,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Per-document benchmark-overlap report:
    (doc_id, n_windows, n_contaminated, contamination_ratio, is_contaminated).

    ``n=13`` is the published GPT-3 appendix-C choice; tests/oracles use a
    smaller n because the synthetic docs are short.  A doc with zero
    length-n windows (shorter than n tokens) reports 0/0 → ratio 0.0,
    uncontaminated — too short to collide."""
    gram = _windows(F.col(text_col), n)
    bgram = _windows(F.col(bench_text_col or text_col), n)
    if hash_fn == "xxhash64":
        key = lambda c: F.xxhash64(c)  # noqa: E731
    elif hash_fn == "none":
        key = lambda c: c  # noqa: E731
    else:
        raise ValueError(f"hash_fn must be 'xxhash64' or 'none', got {hash_fn!r}")

    bench_set = (
        benchmark.select(F.explode(bgram).alias("g")).select(key(F.col("g")).alias("bg")).distinct()
    )
    d = spread_for_compute(docs).select(
        F.col(id_col).alias("doc_id"), gram.alias("grams")
    )
    exploded = d.select(
        "doc_id", F.size("grams").alias("n_windows"), F.explode_outer("grams").alias("g")
    ).withColumn("gk", key(F.col("g")))
    hits = (
        exploded.join(F.broadcast(bench_set), exploded["gk"] == bench_set["bg"], "left")
        .groupBy("doc_id")
        .agg(
            F.max("n_windows").alias("n_windows"),
            F.count(F.col("bg")).alias("n_contaminated"),
        )
    )
    ratio = F.when(F.col("n_windows") > 0,
                   F.col("n_contaminated") / F.col("n_windows")).otherwise(F.lit(0.0))
    return hits.select(
        "doc_id",
        F.col("n_windows").cast("long").alias("n_windows"),
        F.col("n_contaminated").cast("long").alias("n_contaminated"),
        F.round(ratio, 6).alias("contamination_ratio"),
        (F.col("n_contaminated") > 0).alias("is_contaminated"),
    )


def contaminated_ids(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 13,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str | None = None,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Just the (doc_id) set that collides with the benchmark — the shape a
    scrub GATE wants (``decontaminate`` reports per-doc ratios, which costs
    a corpus-wide doc_id aggregation).  Here the corpus never shuffles:
    explode windows → broadcast LEFT SEMI probe against the benchmark gram
    set → distinct over the HITS only (sparse by construction — benchmark
    overlap is rare in a sane corpus), so the only exchange carries
    contaminated ids, not documents.  Pipelines consume it as a left-anti
    join, which AQE turns into a broadcast anti join when the hit set is
    small."""
    gram = _windows(F.col(text_col), n)
    bgram = _windows(F.col(bench_text_col or text_col), n)
    if hash_fn == "xxhash64":
        key = lambda c: F.xxhash64(c)  # noqa: E731
    elif hash_fn == "none":
        key = lambda c: c  # noqa: E731
    else:
        raise ValueError(f"hash_fn must be 'xxhash64' or 'none', got {hash_fn!r}")
    bench_set = (
        benchmark.select(F.explode(bgram).alias("g")).select(key(F.col("g")).alias("bg")).distinct()
    )
    exploded = spread_for_compute(docs).select(
        F.col(id_col).alias("doc_id"), F.explode(gram).alias("g")
    ).select("doc_id", key(F.col("g")).alias("gk"))
    return (
        exploded.join(F.broadcast(bench_set), exploded["gk"] == bench_set["bg"], "left_semi")
        .select("doc_id")
        .distinct()
    )
