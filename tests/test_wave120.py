"""Wave-120/121 operators: session gap tuning, time-axis gap audit."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from simple_vector_spark.operators import events as E


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp"
    )


def test_gap_tuning_monotone_in_threshold(spark, sf_dir):
    from simple_vector_spark.sources.loaders import load_table

    out = {
        r["gap_minutes"]: r
        for r in E.session_gap_tuning(load_table(spark, sf_dir, "events")).collect()
    }
    assert sorted(out) == sorted(E.SESSION_GAP_GRID_MIN)
    # a larger timeout can only merge sessions, never split them
    thresholds = sorted(out)
    for a, b in zip(thresholds, thresholds[1:]):
        assert out[b]["n_sessions"] <= out[a]["n_sessions"]
        assert out[b]["mean_session_events"] >= out[a]["mean_session_events"]


def test_gap_tuning_counts_on_planted_sessions(spark):
    # user 1: events at 0, 20, 100 minutes.
    # gap=15 -> 3 sessions (2 single: the 20 and 100 stand alone? no:
    #   0 and 20 are 20min apart > 15 -> sessions {0},{20},{100} all single)
    # gap=30 -> {0,20},{100} -> 2 sessions, 1 single
    # gap=120 -> one session, 0 single
    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        (0, 1, "v", t0),
        (1, 1, "v", t0 + datetime.timedelta(minutes=20)),
        (2, 1, "v", t0 + datetime.timedelta(minutes=100)),
    ]
    out = {r["gap_minutes"]: r for r in E.session_gap_tuning(_ev(spark, rows)).collect()}
    assert out[15]["n_sessions"] == 3 and out[15]["single_share"] == 1.0
    assert out[30]["n_sessions"] == 2 and out[30]["single_share"] == 0.5
    assert out[120]["n_sessions"] == 1 and out[120]["single_share"] == 0.0


def test_time_axis_gap_audit_counts_slots(spark):
    # events at minutes 0, 1, 10 -> span 11 slots, 3 occupied,
    # longest silent stretch 9 minutes (1 -> 10)
    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        (0, 1, "v", t0),
        (1, 1, "v", t0 + datetime.timedelta(minutes=1, seconds=30)),
        (2, 2, "v", t0 + datetime.timedelta(minutes=10)),
    ]
    out = E.time_axis_gap_audit(_ev(spark, rows)).collect()[0]
    assert out["n_slots"] == 11
    assert out["n_occupied"] == 3
    assert out["longest_gap_minutes"] == 9
    assert abs(out["coverage"] - 3 / 11) < 1e-6
