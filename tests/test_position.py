"""C3 position validity check / nearest-right scan: shallow index answers,
deep event-boundary scan, purged-chunk resume, and the batch audit op."""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

from bifrost_spark.generator import (
    GeneratorConfig,
    generate_events,
    write_chunk_index,
    write_event_log,
)
from bifrost_spark.pipelines.position import check_position, nearest_valid_positions


def _log(spark, tmp_path, n=200):
    cfg = GeneratorConfig(n_events=n, n_keys=40, n_repos=5)
    events = generate_events(spark, cfg)
    path = str(tmp_path / "log")
    write_event_log(events, path, n_chunks=4, files_per_chunk=2)
    ids = sorted(
        r[0] for r in events.filter(
            F.col("event_type").isin("insert", "update", "delete")
        ).select("event_id").collect()
    )
    return path, ids


def test_valid_position_shallow_and_deep(spark, tmp_path):
    path, ids = _log(spark, tmp_path)
    probe = ids[len(ids) // 2]
    shallow = check_position(path, probe)
    assert shallow.valid and shallow.nearest_right == probe and shallow.reason == "in_segment"
    deep = check_position(path, probe, spark=spark, deep=True)
    assert deep.valid and deep.nearest_right == probe


def test_event_boundary_needs_deep_scan(spark, tmp_path):
    path, ids = _log(spark, tmp_path)
    # a position strictly inside a segment range but not an event boundary
    # (data ids stride by 2); shallow range check cannot see that
    gap = next(x + 1 for x in ids[:-1] if x + 1 not in set(ids) and x + 1 < ids[-1])
    assert check_position(path, gap).valid  # shallow: in range
    deep = check_position(path, gap, spark=spark, deep=True)
    assert not deep.valid and deep.nearest_right == min(x for x in ids if x >= gap)
    assert deep.reason == "gap"


def test_before_and_after_log(spark, tmp_path):
    path, ids = _log(spark, tmp_path)
    before = check_position(path, ids[0] - 1)
    assert not before.valid and before.nearest_right == ids[0] and before.reason == "before_log"
    after = check_position(path, ids[-1] + 10)
    assert not after.valid and after.nearest_right is None and after.reason == "after_log"


def test_purged_chunk_scans_forward(spark, tmp_path):
    """Retention deleted the oldest chunk (the MySQL purged-binlog case):
    a position saved inside it is invalid, and the nearest-right restart
    point is the first surviving chunk's low watermark."""
    path, ids = _log(spark, tmp_path)
    purged = check_position(path, ids[0])
    assert purged.valid
    shutil.rmtree(os.path.join(path, sorted(
        d for d in os.listdir(path) if d.startswith("chunk="))[0]))
    write_chunk_index(spark, path)  # retention job refreshes the index
    survivors = sorted(
        r[0] for r in spark.read.parquet(path)
        .filter(F.col("event_type").isin("insert", "update", "delete"))
        .select("event_id").collect()
    )
    res = check_position(path, ids[0])
    assert not res.valid and res.nearest_right == survivors[0]
    assert res.reason in ("before_log", "gap")


def test_no_index_is_invalid(spark, tmp_path):
    path, _ = _log(spark, tmp_path)
    os.remove(os.path.join(path, "_chunks.json"))
    res = check_position(path, 2)
    assert not res.valid and res.reason == "no_index"


def test_nearest_valid_positions_batch(spark, tmp_path):
    path, ids = _log(spark, tmp_path)
    df = spark.read.parquet(path).filter(
        F.col("event_type").isin("insert", "update", "delete"))
    probes = [ids[0] - 5, ids[0], ids[3] + 1, ids[-1], ids[-1] + 99]
    got = {r["requested"]: (r["valid"], r["nearest_right"])
           for r in nearest_valid_positions(df, probes).collect()}
    assert got[ids[0] - 5] == (False, ids[0])
    assert got[ids[0]] == (True, ids[0])
    assert got[ids[3] + 1] == (False, ids[4])
    assert got[ids[-1]] == (True, ids[-1])
    assert got[ids[-1] + 99] == (False, None)


def test_index_carries_distinct_key_estimate(spark, tmp_path):
    """Each segment of _chunks.json records keys_est (approx distinct LWW
    keys) — the signal the fused merge's cost-based hot-key pre-LWW uses."""
    from bifrost_spark.metafs import load_chunk_index

    path, ids = _log(spark, tmp_path)
    index = load_chunk_index(path, spark=spark)
    assert index
    for chunk, entry in index.items():
        for seg in entry["segments"]:
            # approx_count_distinct default rsd is 5% with NO hard bound —
            # the bound here only needs sanity (positive, same order as the
            # segment's event count), so leave generous headroom rather
            # than flake on a distinct-heavy segment
            assert 1 <= seg["keys_est"] <= int(seg["n_data"] * 1.3), (chunk, seg)
