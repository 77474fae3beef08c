"""Wave-125 operators: session-type co-occurrence PMI."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from simple_vector_spark.operators import events as E


def test_session_pmi_detects_planted_coupling(spark):
    # 10 users x 1 session each: types 'a' and 'b' always co-occur;
    # 'c' appears alone in 5 other sessions -> (a,b) lift 2 on 20
    # sessions... construct: 10 sessions {a,b}, 10 sessions {c}.
    t0 = datetime.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for u in range(10):
        rows.append((eid, u, "a", t0 + datetime.timedelta(hours=u))); eid += 1
        rows.append((eid, u, "b", t0 + datetime.timedelta(hours=u, minutes=1))); eid += 1
    for u in range(10, 20):
        rows.append((eid, u, "c", t0 + datetime.timedelta(hours=u))); eid += 1
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp"
    )
    out = E.session_type_pmi(ev, min_support=2).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["type_a"], r["type_b"]) == ("a", "b")
    # 20 sessions, n_a = n_b = n_ab = 10 -> lift = 10*20/(10*10) = 2
    assert abs(r["lift"] - 2.0) < 1e-9
    assert abs(r["pmi_bits"] - 1.0) < 1e-9


def test_session_pmi_splits_sessions_on_gap(spark):
    # same user, two events 2h apart -> different sessions -> no pair
    t0 = datetime.datetime(2024, 1, 1)
    ev = spark.createDataFrame(
        [
            (0, 1, "a", t0),
            (1, 1, "b", t0 + datetime.timedelta(hours=2)),
        ],
        "event_id long, user_id long, event_type string, ts timestamp",
    )
    assert E.session_type_pmi(ev, min_support=1).count() == 0
