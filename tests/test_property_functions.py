"""Property tests (hypothesis) for the round-4 pipeline operators:

1. sessionize agrees with a sequential event-at-a-time fold on ANY event
   stream (random users, random gaps, duplicate timestamps);
2. training_mix is exactly per-stratum deterministic_sample — one op's
   semantics defined by the other's (and both by the salted hash).
"""

from __future__ import annotations

from datetime import datetime, timedelta

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from bifrost_spark.functions.sampling import deterministic_sample, training_mix
from bifrost_spark.functions.sessions import sessionize

GAP_MIN = 30


@st.composite
def event_streams(draw):
    n = draw(st.integers(min_value=1, max_value=40))
    rows = []
    for i in range(n):
        user = draw(st.integers(min_value=1, max_value=4))
        # offsets cluster around the gap boundary to probe the == edge
        off = draw(st.integers(min_value=0, max_value=3 * GAP_MIN * 60))
        rows.append((i + 1, datetime(2026, 1, 1) + timedelta(seconds=off), user))
    return rows


def _sequential_sessions(rows):
    """Event-at-a-time fold: sort each user's events by (ts, event_id),
    bump the session counter when the gap exceeds GAP_MIN minutes."""
    out = {}
    by_user: dict = {}
    for eid, ts, user in sorted(rows, key=lambda r: (r[2], r[1], r[0])):
        prev_ts, seq = by_user.get(user, (None, 0))
        if prev_ts is None or int(ts.timestamp()) - int(prev_ts.timestamp()) > GAP_MIN * 60:
            seq += 1
        by_user[user] = (ts, seq)
        out[eid] = seq
    return out


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(event_streams())
def test_sessionize_matches_sequential_fold(spark, rows):
    df = spark.createDataFrame(
        [(eid, ts, user, 0.0) for eid, ts, user in rows],
        "event_id long, ts timestamp, user_id long, value double",
    )
    got = {r["event_id"]: r["session_seq"] for r in sessionize(df, gap_minutes=GAP_MIN).collect()}
    assert got == _sequential_sessions(rows)


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.dictionaries(st.sampled_from(["a", "b", "c"]),
                       st.sampled_from([0.0, 0.25, 0.5, 1.0]),
                       min_size=1, max_size=3))
def test_training_mix_is_per_stratum_deterministic_sample(spark, rates):
    rows = [(i, ["a", "b", "c", "d"][i % 4]) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    got = {(r["doc_id"], r["source"]) for r in
           training_mix(df, rates, strata_col="source", default_rate=0.25,
                        hex_digits=4).collect()}
    expected = set()
    for stratum in ["a", "b", "c", "d"]:
        rate = rates.get(stratum, 0.25)
        sub = df.filter(df.source == stratum)
        if rate >= 1.0:
            kept = sub
        elif rate <= 0.0:
            continue
        else:
            kept = deterministic_sample(sub, threshold_hex=format(int(rate * 16 ** 4), "04x"))
        expected |= {(r["doc_id"], r["source"]) for r in kept.collect()}
    assert got == expected
