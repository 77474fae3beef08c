"""Wave-143 operators: activation analysis."""

from __future__ import annotations

import datetime

from simple_vector_spark.operators import events as E


def test_activation_detects_planted_relationship(spark):
    # users with deep first sessions stay active for more weeks
    t0 = datetime.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for u in range(6):
        depth = 1 if u < 3 else 6
        weeks = 1 if u < 3 else 4
        for i in range(depth):  # first session: minutes apart
            rows.append((eid, u, "view", t0 + datetime.timedelta(minutes=i)))
            eid += 1
        for wk in range(1, weeks):  # later weeks
            rows.append((eid, u, "view", t0 + datetime.timedelta(weeks=wk)))
            eid += 1
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp"
    )
    out = E.activation_analysis(ev).collect()[0]
    assert out["n_users"] == 6
    assert out["n_depth_1"] == 3 and out["n_depth_5p"] == 3
    assert out["weeks_depth_5p"] > out["weeks_depth_1"]
    assert out["depth_weeks_corr"] > 0.9


def test_activation_fixture_bounds(spark, sf_dir):
    from simple_vector_spark.sources.loaders import load_table

    out = E.activation_analysis(load_table(spark, sf_dir, "events")).collect()[0]
    assert out["n_users"] == (
        (out["n_depth_1"] or 0) + (out["n_depth_2_4"] or 0) + (out["n_depth_5p"] or 0)
    )
    if out["depth_weeks_corr"] is not None:
        assert -1 <= out["depth_weeks_corr"] <= 1
