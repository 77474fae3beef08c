"""Wave-173 operator: Holt-Winters additive seasonal smoothing."""

from __future__ import annotations

import datetime as dt

from simple_vector_spark.operators import relational as R


def _orders(spark, vals):
    # one order per month starting 2020-01
    rows = [
        (k, dt.date(2020 + k // 12, k % 12 + 1, 15), float(v))
        for k, v in enumerate(vals)
    ]
    return spark.createDataFrame(
        rows, "o_orderkey long, o_orderdate date, o_totalprice double"
    )


def test_hw_perfect_seasonal_series_is_fixed_point(spark):
    # y = 100 + s_j with zero-mean seasonal pattern, repeated 3 years:
    # the smoother is initialized exactly on the truth and never moves.
    pat = [j - 6.5 for j in range(1, 13)]
    vals = [100 + p for p in pat] * 3
    out = R.holt_winters_seasonal(_orders(spark, vals)).collect()[0]
    assert out["n_months"] == 36
    assert abs(out["level"] - 100.0) < 1e-6
    assert abs(out["trend"]) < 1e-9
    assert abs(out["mse_1step"]) < 1e-9
    # month 37 is season 1 -> forecast = 100 + pat[0]
    assert abs(out["forecast_1m"] - (100 + pat[0])) < 1e-6
    assert abs(out["seasonal_range"] - 11.0) < 1e-6


def test_hw_linear_trend_no_seasonality(spark):
    # y = 10t: year means differ by 120 -> b0 = 10; seasonals are the
    # within-year ramp; predictions stay exact -> mse 0, trend 10.
    vals = [10.0 * t for t in range(1, 25)]
    out = R.holt_winters_seasonal(_orders(spark, vals)).collect()[0]
    assert out["n_months"] == 24
    assert abs(out["trend"] - 10.0) < 1e-6
    assert abs(out["mse_1step"]) < 1e-9


def test_hw_tracks_level_shift(spark):
    # flat 100 for 2 years then a jump to 200 for year 3: the smoother
    # must move the level up and accumulate positive one-step error
    vals = [100.0] * 24 + [200.0] * 12
    out = R.holt_winters_seasonal(_orders(spark, vals)).collect()[0]
    assert out["level"] > 130.0
    assert out["mse_1step"] > 100.0
