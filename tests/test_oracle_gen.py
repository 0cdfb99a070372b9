"""The Spark-free numpy oracle (oracle_gen) must agree bit-for-bit with the
Spark generator and, end-to-end, with the distributed replay engine."""

import numpy as np
import pyspark.sql.functions as F
import pytest

from bifrost_spark.generator import GeneratorConfig
from bifrost_spark.oracle_gen import _u, expected_final_state, xxhash64


def test_xxhash64_matches_spark(spark):
    vals = list(range(0, 2000, 7)) + [2**40 + 3, 2**62 - 1]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    got_spark = [r[0] for r in df.select(F.xxhash64("v", F.lit(42), F.lit(9))).collect()]
    got_np = xxhash64((np.array(vals, dtype=np.uint64), "long"), (42, "int"), (9, "int"))
    assert got_np.astype(np.int64).tolist() == got_spark

    got_spark2 = [r[0] for r in df.select(F.xxhash64("v", F.col("v"), F.lit(5))).collect()]
    a = np.array(vals, dtype=np.uint64)
    got_np2 = xxhash64((a, "long"), (a, "long"), (5, "int"))
    assert got_np2.astype(np.int64).tolist() == got_spark2


def test_uniform_matches_spark(spark):
    from bifrost_spark.generator import _u as u_spark

    df = spark.range(5000).withColumnRenamed("id", "idx")
    got_spark = [r[0] for r in df.select(u_spark(F.col("idx"), 42, 2)).collect()]
    got_np = _u(np.arange(5000, dtype=np.uint64), 42, 2)
    assert got_np.tolist() == got_spark


@pytest.mark.parametrize("seed", [42, 7])
def test_generator_columns_match_numpy(spark, seed):
    """Column-by-column: the numpy re-derivation equals the Spark generator
    (event_type, key-derived repo/path, pk-change routing)."""
    from bifrost_spark.generator import generate_events

    cfg = GeneratorConfig(n_events=3000, n_keys=300, n_repos=20, seed=seed, snapshot_keys=100)
    ev = (
        generate_events(spark, cfg)
        .filter(F.col("event_type") != "ddl")
        .select(
            "event_id", "event_type",
            F.coalesce(F.col("after.repo"), F.col("before.repo")).alias("repo"),
            F.coalesce(F.col("after.path"), F.col("before.path")).alias("path"),
        )
        .orderBy("event_id")
        .toPandas()
    )
    import hashlib

    from bifrost_spark.oracle_gen import _path_of, _repo_of, _u as u_np

    idx = np.arange(cfg.n_events, dtype=np.uint64)
    u_op, u_key, u_pk = u_np(idx, seed, 1), u_np(idx, seed, 2), u_np(idx, seed, 3)
    phase1 = idx.astype(np.int64) < cfg.phase1
    p2_key = np.floor(np.power(u_key, cfg.key_skew_exp) * float(cfg.n_keys)).astype(np.int64)
    key = np.where(phase1, idx.astype(np.int64), p2_key)
    etype = np.where(phase1, "insert",
                     np.where(u_op >= 1.0 - cfg.delete_ratio, "delete",
                              np.where(u_op < 0.5, "update", "insert")))
    pk_change = (etype == "update") & (u_pk < cfg.pk_change_ratio)
    key2 = (key + 1 + (xxhash64((idx, "long"), (seed, "int"), (9, "int")).astype(np.int64)
                       % np.int64(997))) % cfg.n_keys
    shown_key = np.where(etype == "insert", np.where(pk_change, key2, key), key)
    # generator shows after-image for insert/update, before-image for delete;
    # for updates the coalesced after-image carries the pk-change target
    shown_key = np.where(etype == "update", np.where(pk_change, key2, key), shown_key)
    assert ev["event_type"].tolist() == etype.tolist()
    assert ev["repo"].tolist() == _repo_of(shown_key, cfg).tolist()
    assert ev["path"].tolist() == _path_of(shown_key, cfg).tolist()
    _ = hashlib  # imported for parity with oracle internals


def test_replay_engine_matches_numpy_oracle(spark, tmp_path):
    """End to end: chunked replay through LWW+MERGE+manifests equals the
    Spark-free sequential oracle (the driver-facing cdc_replay_e2e check)."""
    import os

    from bifrost_spark.generator import generate_events, generate_snapshot, write_event_log
    from bifrost_spark.operators.merge import TargetTable
    from bifrost_spark.pipelines.replay import replay_event_log

    cfg = GeneratorConfig(
        n_events=4000, n_keys=400, n_repos=20, seed=42, snapshot_keys=200,
        ddl=[(2000, "ALTER TABLE code.repos ADD COLUMN stars INT")],
    )
    log = str(tmp_path / "log")
    write_event_log(generate_events(spark, cfg), log, n_chunks=4)
    table = TargetTable.create(spark, str(tmp_path / "tbl"), n_buckets=8)
    table.bootstrap(generate_snapshot(spark, cfg))
    replay_event_log(spark, log, table)
    actual = (
        table.read().drop("bucket")
        .select("repo", "path", "commit", "lang",
                F.sha2(F.col("content"), 256).alias("content_sha"), "last_event_id")
        .orderBy("repo", "path")
        .toPandas()
    )
    expected = expected_final_state(cfg)
    assert len(actual) == len(expected)
    assert actual.reset_index(drop=True).equals(expected)
    _ = os
