"""Incremental changelog read between snapshots (operators/changes.py).

Oracle definition (engine-independent, from the event stream itself): a key
appears in changes(from, to) iff its LWW-winning event lies strictly after
the from-snapshot's high-water mark; the row is the final state (delete ⇒
the tombstone: PKs + nulls + winning event_id)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from bifrost_spark.generator import GeneratorConfig, generate_events, generate_snapshot, write_event_log
from bifrost_spark.operators.changes import table_changes
from bifrost_spark.operators.merge import TargetTable
from bifrost_spark.pipelines.replay import replay_event_log

CFG = GeneratorConfig(n_events=6_000, n_keys=500, n_repos=20, seed=11, snapshot_keys=300)


def _expected_changes(events_pdf: pd.DataFrame, cutoff: int) -> pd.DataFrame:
    """Pandas recompute: LWW per PK over the WHOLE stream, keep winners
    above the cutoff."""
    rows = {}
    for r in events_pdf.sort_values("event_id").itertuples():
        if r.event_type == "delete":
            key = (r.before["repo"], r.before["path"])
            rows[key] = ("delete", None, None, r.event_id)
        elif r.event_type in ("insert", "update"):
            if (r.event_type == "update" and r.before is not None
                    and (r.before["repo"], r.before["path"]) != (r.after["repo"], r.after["path"])):
                old = (r.before["repo"], r.before["path"])
                rows[old] = ("delete", None, None, r.event_id)
            key = (r.after["repo"], r.after["path"])
            rows[key] = ("upsert", r.after["commit"], r.after["content"], r.event_id)
    recs = [
        {"repo": k[0], "path": k[1], "change_type": ct, "commit": c,
         "content": content, "last_event_id": eid}
        for k, (ct, c, content, eid) in rows.items() if eid > cutoff
    ]
    return (pd.DataFrame(recs, columns=["repo", "path", "change_type", "commit",
                                        "content", "last_event_id"])
            .sort_values(["repo", "path"]).reset_index(drop=True))


@pytest.fixture(scope="module")
def replayed(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("changes")
    log = str(base / "log")
    events = generate_events(spark, CFG)
    write_event_log(events, log, n_chunks=4)
    table = TargetTable.create(spark, str(base / "tbl"), n_buckets=8)
    table.bootstrap(generate_snapshot(spark, CFG))
    replay_event_log(spark, log, table, end_chunk=2)
    mid_snap = table.state["snapshot"]
    mid_cutoff = table.last_event_id
    replay_event_log(spark, log, table)
    return table, mid_snap, mid_cutoff, events.toPandas()


def test_changes_matches_stream_oracle(spark, replayed):
    table, mid_snap, cutoff, events_pdf = replayed
    got = (
        table_changes(spark, table.path, from_snapshot=mid_snap)
        .select("repo", "path", "change_type", "commit", "content", "last_event_id")
        .toPandas().sort_values(["repo", "path"]).reset_index(drop=True)
    )
    exp = _expected_changes(events_pdf, cutoff)
    pd.testing.assert_frame_equal(got, exp)
    assert (got["change_type"] == "delete").any() and (got["change_type"] == "upsert").any()


def test_changes_scan_shape(spark, replayed):
    """Default path must be scan → filter → project: no join/shuffle in the
    plan, cutoff filter pushed to the parquet scan."""
    table, mid_snap, _, _ = replayed
    plan = table_changes(spark, table.path, from_snapshot=mid_snap)._jdf \
        .queryExecution().executedPlan().toString()
    assert "Join" not in plan and "Exchange" not in plan
    assert "last_event_id" in plan and "PushedFilters" in plan


def test_changes_pre_images(spark, replayed):
    table, mid_snap, cutoff, events_pdf = replayed
    got = table_changes(spark, table.path, from_snapshot=mid_snap,
                        with_pre_images=True)
    rows = {(r["repo"], r["path"]): r for r in got.collect()}
    exp = _expected_changes(events_pdf, cutoff)
    assert set(rows) == set(zip(exp["repo"], exp["path"]))
    # classification: insert ⇔ no before image; update carries the old row.
    # Pre-state = snapshot bootstrap rows FIRST, then the prefix events on
    # top (a snapshot key deleted pre-cutoff must stay deleted).
    snap = generate_snapshot(spark, CFG).toPandas()
    pre_state = {(s.repo, s.path): s.commit for s in snap.itertuples()}
    for r in events_pdf.sort_values("event_id").itertuples():
        if r.event_id > cutoff:
            break
        if r.event_type == "delete":
            pre_state.pop((r.before["repo"], r.before["path"]), None)
        elif r.event_type in ("insert", "update"):
            if (r.event_type == "update" and r.before is not None):
                pre_state.pop((r.before["repo"], r.before["path"]), None)
            pre_state[(r.after["repo"], r.after["path"])] = r.after["commit"]
    for key, r in rows.items():
        if r["change_type"] == "insert":
            assert r["before"] is None, key
            assert key not in pre_state, key
        elif r["change_type"] == "update":
            assert r["before"] is not None and key in pre_state, key
            assert r["before"]["commit"] == pre_state[key], key
        else:
            assert r["change_type"] == "delete"


def test_changes_guards(spark, replayed):
    table, mid_snap, _, _ = replayed
    # from must be an ancestor of to
    with pytest.raises(ValueError, match="not a descendant"):
        table_changes(spark, table.path, from_snapshot=table.state["snapshot"],
                      to_snapshot=mid_snap)
    with pytest.raises(ValueError, match="unknown snapshot"):
        table_changes(spark, table.path, from_snapshot="v99999999")


def test_changes_refuses_purged_deletes(spark, tmp_path):
    table = TargetTable.create(spark, str(tmp_path / "t"), n_buckets=4)
    eng_cfg = GeneratorConfig(n_events=400, n_keys=60, n_repos=6, seed=3,
                              snapshot_keys=40)
    log = str(tmp_path / "log")
    write_event_log(generate_events(spark, eng_cfg), log, n_chunks=2)
    table.bootstrap(generate_snapshot(spark, eng_cfg))
    replay_event_log(spark, log, table, end_chunk=1)
    early = table.state["snapshot"]
    replay_event_log(spark, log, table)
    table.compact(tombstone_low_water_mark=table.last_event_id)
    with pytest.raises(ValueError, match="purged by compaction"):
        table_changes(spark, table.path, from_snapshot=early)
    # but a changelog from the compacted snapshot onward is still fine
    post = table.state["snapshot"]
    assert table_changes(spark, table.path, from_snapshot=post).count() == 0


def test_changelog_moves_a_replica(spark, replayed, tmp_path):
    """The re-publication contract: a replica standing at the from-snapshot,
    fed ONLY the changelog events, must arrive at the exact to-state —
    including unchanged rows' guard column (bootstrap preserves it)."""
    import json as _json

    from bifrost_spark.operators.changes import (
        changelog_messages, changes_to_events)
    from bifrost_spark.pipelines.replay import ReplayEngine
    from bifrost_spark.schemas import EVENT_SCHEMA

    table, mid_snap, _, _ = replayed
    evts = changes_to_events(
        table_changes(spark, table.path, from_snapshot=mid_snap,
                      with_pre_images=True))
    assert [f.name for f in evts.schema.fields] == [f.name for f in EVENT_SCHEMA.fields]

    replica = TargetTable.create(spark, str(tmp_path / "replica"), n_buckets=8)
    mid_state = TargetTable(spark, table.path, at_snapshot=mid_snap).read().drop("bucket")
    replica.bootstrap(mid_state)
    ReplayEngine(replica).apply_batch(evts)
    pd.testing.assert_frame_equal(
        replica.to_pandas_sorted().reset_index(drop=True),
        table.to_pandas_sorted().reset_index(drop=True),
    )

    # and the one-call broker form renders parseable wire messages
    msgs = changelog_messages(spark, table.path, from_snapshot=mid_snap)
    row = msgs.limit(1).collect()[0]
    assert row["topic"] == "code_repos"
    assert _json.loads(row["value"])["EventType"] in ("insert", "update", "delete")
