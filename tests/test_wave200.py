"""Wave-200 operator: feature-vs-label MI ranking."""

from __future__ import annotations

import datetime as dt

from simple_vector_spark.operators import events as E


def test_feature_mi_informative_feature_ranks_first(spark):
    # purchases happen ONLY at night hours (band h0) with value < 50:
    # hour_band and value_band both carry signal; weekend carries none
    # (all events on the same Wednesday)
    rows = []
    eid = 0
    for i in range(120):
        purchase = i % 3 == 0
        hour = 2 if purchase else 14
        value = 10.0 if purchase else 120.0
        rows.append(
            (eid, dt.datetime(2024, 1, 3, hour, 0, 0),
             "purchase" if purchase else "view", value)
        )
        eid += 1
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, value double"
    )
    out = {r["feature"]: r for r in E.feature_mi_ranking(ev).collect()}
    assert out["weekend"]["mi_bits"] == 0.0
    assert out["hour_band"]["mi_bits"] > 0.5
    assert out["value_band"]["mi_bits"] > 0.5
    assert out["weekend"]["rank"] == 3


def test_feature_mi_bounds(spark):
    # MI <= H(X): the mi_over_hx ratio stays in [0, 1]
    rows = [
        (i, dt.datetime(2024, 1, 1 + i % 7, i % 24, 0, 0),
         "purchase" if i % 5 == 0 else "click", float(i % 200))
        for i in range(200)
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, value double"
    )
    for r in E.feature_mi_ranking(ev).collect():
        assert -1e-9 <= r["mi_bits"]
        assert -1e-9 <= r["mi_over_hx"] <= 1.0 + 1e-9
