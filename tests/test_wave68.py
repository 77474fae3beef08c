"""Wave-68 operators: Mann-Whitney U, bounce rate."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from simple_vector_spark.operators import events as E
from simple_vector_spark.operators import relational as R


def test_mann_whitney_identical_groups_z_zero(spark):
    rows = [("R", float(v)) for v in (1, 2, 3, 4, 5)] * 10 + [
        ("N", float(v)) for v in (1, 2, 3, 4, 5)
    ] * 10
    li = spark.createDataFrame(rows, "l_returnflag string, l_quantity double")
    r = R.mann_whitney_u(li).collect()[0]
    # identical distributions: U = n_a*n_b/2, z = 0
    assert r["u_stat"] == r["n_a"] * r["n_b"] / 2
    assert r["z"] == 0.0
    assert r["reject_same_location"] is False


def test_mann_whitney_shifted_group_rejects(spark):
    rows = [("R", float(v)) for v in range(1, 6)] * 20 + [
        ("N", float(v + 10)) for v in range(1, 6)
    ] * 20
    li = spark.createDataFrame(rows, "l_returnflag string, l_quantity double")
    r = R.mann_whitney_u(li).collect()[0]
    assert r["u_stat"] == 0.0  # every R value below every N value
    assert r["reject_same_location"] is True


def test_bounce_rate_counts_single_event_sessions(spark):
    t0 = datetime.datetime(2024, 3, 1, 9, 0, 0)

    def ts(minutes):
        return t0 + datetime.timedelta(minutes=minutes)

    rows = [
        # u1: two events 5 min apart -> one 2-event session
        (1, 1, ts(0), 1.0), (2, 1, ts(5), 1.0),
        # u2: one lone event -> bounce
        (3, 2, ts(10), 1.0),
        # u3: two events 2h apart -> two 1-event sessions (both bounces)
        (4, 3, ts(0), 1.0), (5, 3, ts(120), 1.0),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double"
    )
    out = E.bounce_rate_daily(ev).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_sessions"] == 4
    assert r["n_bounce"] == 3
    assert abs(r["bounce_rate"] - 0.75) < 1e-9
