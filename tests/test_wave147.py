"""Wave-147 operators: forecast baselines."""

from __future__ import annotations

import datetime

from simple_vector_spark.operators import events as E


def test_baselines_weekly_pattern_prefers_seasonal(spark):
    # 4 weeks of a strong weekly pattern: weekday counts [10,1,1,1,1,1,1]
    t0 = datetime.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for day in range(28):
        n = 10 if day % 7 == 0 else 1
        for k in range(n):
            rows.append((eid, k, "v", t0 + datetime.timedelta(days=day, minutes=k)))
            eid += 1
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp"
    )
    out = E.forecast_baseline_eval(ev).collect()[0]
    # seasonal-naive is EXACT on a perfectly periodic series
    assert out["mae_seasonal_7d"] == 0.0
    assert out["mae_naive_1d"] > 1.0
    assert out["weekly_seasonality_wins"]


def test_baselines_eval_window_size(spark, sf_dir):
    from simple_vector_spark.sources.loaders import load_table

    out = E.forecast_baseline_eval(load_table(spark, sf_dir, "events")).collect()[0]
    assert 1 <= out["n_days_eval"] <= E.FC_EVAL_DAYS
    assert out["mae_naive_1d"] >= 0 and out["mae_seasonal_7d"] >= 0
