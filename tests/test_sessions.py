"""Gap-based sessionization: deterministic session assignment and
per-session rollups, checked against a hand-built expectation and for
tie-robustness on duplicate timestamps."""
import datetime

import pytest
from pyspark.sql import Row

from oroch_spark.operators import sessions


def _ts(s):
    return (datetime.datetime(2024, 1, 1)
            + datetime.timedelta(seconds=s))


@pytest.fixture(scope="module")
def events(spark):
    rows = [
        # user 1: three events in one session, then a >gap jump
        Row(user_id=1, event_id=1, ts=_ts(0)),
        Row(user_id=1, event_id=2, ts=_ts(10)),
        Row(user_id=1, event_id=3, ts=_ts(20)),
        Row(user_id=1, event_id=4, ts=_ts(200)),
        # user 2: duplicate timestamps — ties break on event_id
        Row(user_id=2, event_id=5, ts=_ts(0)),
        Row(user_id=2, event_id=6, ts=_ts(0)),
        Row(user_id=2, event_id=7, ts=_ts(500)),
    ]
    return spark.createDataFrame(rows)


def test_sessionize_assignment(events):
    got = {r["event_id"]: r["session_idx"]
           for r in sessions.sessionize(events, gap_seconds=60).collect()}
    assert got == {1: 0, 2: 0, 3: 0, 4: 1, 5: 0, 6: 0, 7: 1}


def test_session_stats(events):
    rows = sessions.session_stats(events, gap_seconds=60).collect()
    by_key = {(r["user_id"], r["session_idx"]): r for r in rows}
    s = by_key[(1, 0)]
    assert (s["n_events"], s["first_id"], s["last_id"],
            s["duration_s"]) == (3, 1, 3, 20.0)
    assert by_key[(1, 1)]["n_events"] == 1
    assert by_key[(2, 0)]["n_events"] == 2
    assert by_key[(2, 1)]["duration_s"] == 0.0


def test_exact_gap_stays_in_session(spark):
    rows = [Row(user_id=1, event_id=1, ts=_ts(0)),
            Row(user_id=1, event_id=2, ts=_ts(60))]
    got = sessions.sessionize(spark.createDataFrame(rows),
                              gap_seconds=60).collect()
    # gap == threshold is NOT a new session (strict >)
    assert {r["session_idx"] for r in got} == {0}
