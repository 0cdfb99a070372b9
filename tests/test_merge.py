"""TargetTable MERGE semantics: upsert/delete branches, guard, idempotency,
bucket pruning, bootstrap."""

import pyspark.sql.functions as F
import pytest

from bifrost_spark.operators.merge import TargetTable
from bifrost_spark.registry import SchemaRegistry


def _resolved(spark, rows):
    # rows: (repo, path, op, commit, lang, content, extra, event_id)
    return spark.createDataFrame(
        rows,
        "repo string, path string, op string, commit string, lang string, "
        "content string, extra map<string,string>, event_id long",
    )


@pytest.fixture()
def table(spark, tmp_path):
    return TargetTable.create(spark, str(tmp_path / "tbl"), n_buckets=8)


def _state(table):
    return {(r["repo"], r["path"]): r for r in table.read().collect()}


def test_insert_update_delete_branches(spark, table):
    r1 = table.merge(
        _resolved(spark, [("r", "a", "upsert", "c1", "py", "v1", None, 2),
                          ("r", "b", "upsert", "c2", "go", "b1", None, 4)]),
        batch_id="b1", batch_range=(2, 4),
    )
    assert r1["n_ops"] == 2
    s = _state(table)
    assert s[("r", "a")]["content"] == "v1" and len(s) == 2

    table.merge(
        _resolved(spark, [("r", "a", "upsert", "c3", "py", "v2", None, 6),
                          ("r", "b", "delete", None, None, None, None, 8),
                          ("r", "c", "upsert", "c4", "rs", "c1", None, 10)]),
        batch_id="b2", batch_range=(6, 10),
    )
    s = _state(table)
    assert set(s) == {("r", "a"), ("r", "c")}
    assert s[("r", "a")]["content"] == "v2" and s[("r", "a")]["last_event_id"] == 6


def test_merge_idempotent_replay(spark, table):
    src = _resolved(spark, [("r", "a", "upsert", "c1", "py", "v1", None, 2)])
    table.merge(src, batch_id="b1", batch_range=(2, 2))
    out = table.merge(src, batch_id="b1", batch_range=(2, 2))
    assert out["skipped"] is True
    assert len(table.state["applied"]) == 1


def test_event_id_guard_on_overlapping_replay(spark, table):
    table.merge(_resolved(spark, [("r", "a", "upsert", "c9", "py", "NEW", None, 100)]),
                batch_id="new", batch_range=(100, 100))
    # a stale batch replayed under a different batch_id must not regress the row
    table.merge(_resolved(spark, [("r", "a", "upsert", "c1", "py", "OLD", None, 50),
                                  ("r", "b", "delete", None, None, None, None, 60)]),
                batch_id="stale", batch_range=(50, 60))
    s = _state(table)
    assert s[("r", "a")]["content"] == "NEW" and s[("r", "a")]["last_event_id"] == 100


def test_delete_of_absent_key_is_noop(spark, table):
    table.merge(_resolved(spark, [("r", "zz", "delete", None, None, None, None, 2)]),
                batch_id="b1", batch_range=(2, 2))
    assert table.read().count() == 0


def test_bucket_pruning_rewrites_only_touched_buckets(spark, table):
    rows = [(f"repo{i}", f"p{i}", "upsert", "c", "py", f"v{i}", None, 2 + 2 * i) for i in range(64)]
    table.merge(_resolved(spark, rows), batch_id="seed", batch_range=(2, 200))
    snap_before = {b: s for b, s in table.state["buckets"].items()}
    out = table.merge(_resolved(spark, [("repo3", "p3", "upsert", "c", "py", "vX", None, 500)]),
                      batch_id="point", batch_range=(500, 500))
    assert out["buckets_rewritten"] == 1
    changed = [b for b, s in table.state["buckets"].items() if snap_before.get(b) != s]
    assert len(changed) == 1
    s = _state(table)
    assert s[("repo3", "p3")]["content"] == "vX" and s[("repo5", "p5")]["content"] == "v5"


def test_bootstrap_then_incremental(spark, tmp_path):
    table = TargetTable.create(spark, str(tmp_path / "t2"), n_buckets=8)
    snap = spark.createDataFrame(
        [("r", "a", "c0", "py", "base", 0), ("r", "b", "c0", "py", "base", 0)],
        "repo string, path string, commit string, lang string, content string, last_event_id long",
    )
    table.bootstrap(snap)
    assert table.bootstrap(snap)["skipped"] is True
    table.merge(_resolved(spark, [("r", "a", "upsert", "c1", "py", "inc", None, 2)]),
                batch_id="b1", batch_range=(2, 2))
    s = _state(table)
    assert s[("r", "a")]["content"] == "inc" and s[("r", "b")]["content"] == "base"
    # an EXPLICIT re-bootstrap under a fresh batch_id is an intentional
    # reload, not a replay — it must run (id-equality skip, not range
    # containment of (0,0)) and overwrite the incremental state
    snap2 = snap.withColumn("content", F.lit("reloaded"))
    assert table.bootstrap(snap2, batch_id="reload-1")["skipped"] is False
    s = _state(table)
    assert s[("r", "a")]["content"] == "reloaded"
    # ...and the fresh id is itself idempotent
    assert table.bootstrap(snap2, batch_id="reload-1")["skipped"] is True


def test_ddl_add_column_then_merge_and_metadata_only_read(spark, tmp_path):
    table = TargetTable.create(spark, str(tmp_path / "t3"), n_buckets=4)
    table.merge(_resolved(spark, [("r", "a", "upsert", "c1", "py", "v1", None, 2)]),
                batch_id="b1", batch_range=(2, 2))
    table.apply_ddl("ALTER TABLE code.repos ADD COLUMN stars INT", batch_id="ddl:3", event_id=3)
    # old rows read back with null stars (no rewrite)
    s = _state(table)
    assert s[("r", "a")]["stars"] is None
    table.merge(_resolved(spark, [("r", "b", "upsert", "c2", "go", "v2", {"stars": "42"}, 4)]),
                batch_id="b2", batch_range=(4, 4))
    s = _state(table)
    assert s[("r", "b")]["stars"] == 42 and s[("r", "a")]["stars"] is None
    # MODIFY widens on read
    table.apply_ddl("ALTER TABLE code.repos MODIFY COLUMN stars BIGINT", batch_id="ddl:5", event_id=5)
    row = table.read().filter(F.col("path") == "b").collect()[0]
    assert row["stars"] == 42
    # DROP prunes
    table.apply_ddl("ALTER TABLE code.repos DROP COLUMN stars", batch_id="ddl:6", event_id=6)
    assert "stars" not in table.read().columns


def test_truncate_clears(spark, tmp_path):
    table = TargetTable.create(spark, str(tmp_path / "t4"), n_buckets=4)
    table.merge(_resolved(spark, [("r", "a", "upsert", "c1", "py", "v1", None, 2)]),
                batch_id="b1", batch_range=(2, 2))
    table.apply_ddl("TRUNCATE TABLE code.repos", batch_id="ddl:3", event_id=3)
    assert table.read().count() == 0


def test_manifest_lineage_metrics(spark, table):
    table.merge(_resolved(spark, [("r", "a", "upsert", "c1", "py", "v1", None, 2),
                                  ("r", "b", "delete", None, None, None, None, 4)]),
                batch_id="b1", batch_range=(2, 4))
    entry = table.state["applied"][-1]
    assert entry["n_ops"] == 2
    lineage = table.lineage()["b1"]
    total = {"rows_in": 0, "upserts": 0, "deletes": 0}
    for m in lineage["metrics"]:
        for k in total:
            total[k] += m[k]
    assert total == {"rows_in": 2, "upserts": 1, "deletes": 1}
    assert "wall_ms" in entry and "wall_ms" in lineage


def test_reopen_from_disk(spark, tmp_path):
    p = str(tmp_path / "t5")
    t1 = TargetTable.create(spark, p, n_buckets=4, registry=SchemaRegistry())
    t1.merge(_resolved(spark, [("r", "a", "upsert", "c1", "py", "v1", None, 2)]),
             batch_id="b1", batch_range=(2, 2))
    t2 = TargetTable(spark, p)
    assert _state(t2)[("r", "a")]["content"] == "v1"
    assert "b1" in t2.applied_batch_ids


def test_out_of_order_batches_commute(spark, tmp_path):
    """Tombstoned deletes + event_id guard make merge commutative across
    disjoint batches: applying (later, earlier) equals (earlier, later)."""
    early = [("r", "a", "upsert", "c1", "py", "v1", None, 10),
             ("r", "b", "upsert", "c2", "go", "b1", None, 12),
             ("r", "c", "upsert", "c3", "rs", "c1", None, 14)]
    late = [("r", "a", "delete", None, None, None, None, 20),   # delete after upsert
            ("r", "b", "upsert", "c4", "go", "b2", None, 22)]

    def run(order):
        t = TargetTable.create(spark, str(tmp_path / f"t_{order}"), n_buckets=4)
        batches = [("early", early, (10, 14)), ("late", late, (20, 22))]
        if order == "reversed":
            batches = batches[::-1]
        for bid, rows, rng in batches:
            t.merge(_resolved(spark, rows), batch_id=bid, batch_range=rng)
        return _state(t)

    s1, s2 = run("forward"), run("reversed")
    assert set(s1) == set(s2) == {("r", "b"), ("r", "c")}  # 'a' stays deleted
    for k in s1:
        assert s1[k]["content"] == s2[k]["content"]
        assert s1[k]["last_event_id"] == s2[k]["last_event_id"]
    assert s1[("r", "b")]["content"] == "b2"


def test_tombstone_blocks_late_upsert(spark, tmp_path):
    """A key deleted at event 20 must NOT be resurrected by a late-arriving
    upsert with event_id 10 (the failure mode physical deletes would have)."""
    t = TargetTable.create(spark, str(tmp_path / "t_tomb"), n_buckets=4)
    t.merge(_resolved(spark, [("r", "a", "delete", None, None, None, None, 20)]),
            batch_id="del", batch_range=(20, 20))
    t.merge(_resolved(spark, [("r", "a", "upsert", "c1", "py", "OLD", None, 10)]),
            batch_id="late", batch_range=(10, 10))
    assert t.read().count() == 0
    tomb = t.read(include_deleted=True).collect()
    assert len(tomb) == 1 and tomb[0]["is_deleted"] and tomb[0]["last_event_id"] == 20


def _ops(spark, rows):
    # rows: (repo, path, op, commit, lang, content, extra, event_id) -> raw
    # (un-deduped) op rows as events_to_ops would emit them
    data = [(r, p, k, c, lang, v, x, eid, eid * 2 + (1 if k == "upsert" else 0), 0)
            for (r, p, k, c, lang, v, x, eid) in rows]
    return spark.createDataFrame(
        data,
        "repo string, path string, op string, commit string, lang string, "
        "content string, extra map<string,string>, event_id long, seq long, "
        "schema_version int",
    )


def test_fused_out_of_order_batches_commute(spark, tmp_path, monkeypatch):
    """The FUSED single-shuffle merge path must commute across disjoint
    batches exactly like the broadcast path (LWW union max is associative)."""
    monkeypatch.setenv("BIFROST_BROADCAST_MAX_BYTES", "0")  # force fused
    early = [("r", "a", "upsert", "c1", "py", "v1", None, 10),
             ("r", "a", "upsert", "c1b", "py", "v1b", None, 11),  # intra-batch dedup
             ("r", "b", "upsert", "c2", "go", "b1", None, 12)]
    late = [("r", "a", "delete", None, None, None, None, 20),
            ("r", "b", "upsert", "c4", "go", "b2", None, 22)]

    def run(order):
        t = TargetTable.create(spark, str(tmp_path / f"tf_{order}"), n_buckets=4)
        batches = [("early", early, (10, 12)), ("late", late, (20, 22))]
        if order == "reversed":
            batches = batches[::-1]
        for bid, rows, rng in batches:
            res = t.apply_ops(_ops(spark, rows), batch_id=bid, batch_range=rng, n_ops_hint=len(rows))
            assert res.get("fused"), res
        return _state(t)

    s1, s2 = run("forward"), run("reversed")
    assert set(s1) == set(s2) == {("r", "b")}
    assert s1[("r", "b")]["content"] == s2[("r", "b")]["content"] == "b2"
    assert s1[("r", "b")]["last_event_id"] == 22


def test_fused_prelww_knob_equal_state(spark, tmp_path, monkeypatch):
    """Pre-LWW on the fused path (hot-key mitigation: resolve LWW on the
    batch before the single-exchange fused union) must produce the exact
    same final state as the raw-ops fused path — and the choice is
    cost-based: a dup-heavy batch (ops >> distinct-keys estimate) enables it
    automatically, an even batch does not, and the env knob force-overrides
    in both directions."""
    monkeypatch.setenv("BIFROST_BROADCAST_MAX_BYTES", "0")  # force fused
    rows = [("r", "a", "upsert", f"c{i}", "py", f"v{i}", None, 10 + i) for i in range(20)]  # hot key
    rows += [("r", "b", "delete", None, None, None, None, 40),
             ("r", "c", "upsert", "c5", "go", "x1", None, 41)]

    def run(tag, env=None, n_keys_hint=None, extra_rows=()):
        monkeypatch.delenv("BIFROST_FUSED_PRELWW", raising=False)
        if env is not None:
            monkeypatch.setenv("BIFROST_FUSED_PRELWW", env)
        t = TargetTable.create(spark, str(tmp_path / f"tp_{tag}"), n_buckets=4)
        batch = rows + list(extra_rows)
        hi = max(r[-1] for r in batch)
        res = t.apply_ops(_ops(spark, batch), batch_id="b1", batch_range=(10, hi),
                          n_ops_hint=len(batch), n_keys_hint=n_keys_hint)
        assert res.get("fused"), res
        return res["pre_lww"], _state(t)

    on, s_forced = run("force_on", env="1")
    # size hint without a key hint: apply_ops self-estimates the distinct
    # keys (ADVICE round-3 — a lone n_ops_hint must not silently disarm the
    # guard).  This batch is 22 ops / 3 keys = 7.3 < ratio 8 → correctly off…
    unhinted_off, s_default = run("default")
    # …and piling 10 more dups onto the hot key (32 ops / 3 keys > 8) arms
    # it WITHOUT a key hint — proof the estimate actually ran.
    hot_extra = [("r", "a", "upsert", f"h{i}", "py", f"hv{i}", None, 50 + i)
                 for i in range(10)]
    unhinted_on, _ = run("default_hot", extra_rows=hot_extra)
    auto_on, s_auto = run("auto", n_keys_hint=2)       # 22 ops / 2 keys > 8
    auto_off, s_even = run("even", n_keys_hint=20)     # 22 ops / 20 keys < 8
    force_off, s_off = run("force_off", env="0", n_keys_hint=1)

    assert (on, unhinted_off, unhinted_on, auto_on, auto_off, force_off) == (
        True, False, True, True, False, False)
    assert s_forced == s_default == s_auto == s_even == s_off


def test_applied_ranges_stay_compact_and_skip_replay(spark, table, monkeypatch):
    """The commit manifest must stay O(1) over many ordered batches (merged
    interval set), and replay-skip must survive batch ids aging out of the
    bounded tail (range containment, ordered/range-exclusive delivery)."""
    monkeypatch.setenv("BIFROST_APPLIED_TAIL", "2")
    for i in range(6):
        lo = 2 + 4 * i
        table.merge(
            _resolved(spark, [("r", f"k{i}", "upsert", "c", "py", "v", None, lo)]),
            batch_id=f"b{i}", batch_range=(lo, lo + 3), range_exclusive=True,
        )
    # contiguous ordered ranges collapse to ONE interval; tail is bounded
    assert table.state["applied_ranges"] == [[2, 25]]
    assert len(table.state["applied"]) == 2
    assert table.state["n_commits"] == 6
    # b0 aged out of the tail but its range is covered -> still skipped
    assert "b0" not in table.applied_batch_ids
    out = table.merge(
        _resolved(spark, [("r", "k0", "upsert", "c", "py", "OLD", None, 2)]),
        batch_id="b0", batch_range=(2, 5), range_exclusive=True,
    )
    assert out["skipped"] is True
    # without range-exclusive delivery the same check must NOT skip
    assert not table.is_applied("other", (2, 5), range_exclusive=False)


def test_broadcast_gating_is_byte_based(spark, table, monkeypatch):
    """A batch of few-but-wide rows must take the shuffle path when its
    measured payload bytes exceed the broadcast cap, even though its row
    count is tiny (the row-count gate of round 1 would have broadcast it)."""
    table.merge(
        _resolved(spark, [("r", f"seed{i}", "upsert", "c", "py", "x" * 10, None, 2 + 2 * i)
                          for i in range(50)]),
        batch_id="seed", batch_range=(2, 100),
    )
    monkeypatch.setenv("BIFROST_BCAST_TGT_RATIO", "0")  # always prefer broadcast...
    monkeypatch.setenv("BIFROST_BROADCAST_MAX_BYTES", "5000")  # ...unless bytes exceed cap
    wide = _resolved(spark, [("r", f"w{i}", "upsert", "c", "py", "y" * 4000, None, 200 + 2 * i)
                             for i in range(3)])
    out = table.merge(wide, batch_id="wide", batch_range=(200, 204))
    assert out["merge_path"] == "shuffle" and out["src_bytes_est"] > 5000
    narrow = _resolved(spark, [("r", "n1", "upsert", "c", "py", "z", None, 300)])
    out2 = table.merge(narrow, batch_id="narrow", batch_range=(300, 300))
    assert out2["merge_path"] == "broadcast"
