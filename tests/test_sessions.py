"""Gap-based sessionization: hand-computed boundaries, single-shuffle plan."""

from datetime import datetime

from pyspark.sql import functions as F

from bifrost_spark.functions.sessions import session_stats, sessionize


def _rows():
    t = lambda m, s=0: datetime(2026, 1, 1, 0, m, s)  # noqa: E731
    return [
        # user 1: two sessions (gap at 45 min > 30)
        (1, t(0), 100, "click", 1.0),
        (2, t(10), 100, "click", 2.0),
        (3, t(55), 100, "buy", 3.0),
        # user 2: one session, events exactly 30 min apart (NOT > gap)
        (4, t(0), 200, "click", 1.5),
        (5, t(30), 200, "click", 2.5),
        # user 3: single event
        (6, t(7), 300, "view", 0.5),
    ]


def _df(spark):
    return spark.createDataFrame(
        _rows(), "event_id long, ts timestamp, user_id long, event_type string, value double"
    )


def test_sessionize_boundaries(spark):
    out = {r["event_id"]: r["session_seq"] for r in sessionize(_df(spark)).collect()}
    assert out == {1: 1, 2: 1, 3: 2, 4: 1, 5: 1, 6: 1}


def test_session_stats_rollup(spark):
    got = {(r["user_id"], r["session_seq"]): r for r in session_stats(_df(spark)).collect()}
    assert len(got) == 4
    s11 = got[(100, 1)]
    assert s11["n_events"] == 2 and s11["duration_sec"] == 600 and s11["sum_value"] == 3.0
    s12 = got[(100, 2)]
    assert s12["n_events"] == 1 and s12["duration_sec"] == 0
    s2 = got[(200, 1)]
    assert s2["n_events"] == 2 and s2["duration_sec"] == 1800  # 30:00 gap stays one session
    assert got[(300, 1)]["n_events"] == 1


def test_session_stats_single_shuffle(spark, tmp_path):
    # from a parquet scan (realistic input), the window AND the rollup share
    # one hashpartitioning(user_id) exchange
    p = str(tmp_path / "ev")
    _df(spark).write.parquet(p)
    plan = session_stats(spark.read.parquet(p))._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
