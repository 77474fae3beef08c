"""Waves 177-178: AR(2) Yule-Walker fit, EWMA control chart."""

from __future__ import annotations

import datetime as dt

from simple_vector_spark.operators import relational as R


def test_ar2_alternating_series(spark):
    # monthly revenue 10,0,10,0,... (8 months): centered c = +-5,
    # r1 = -(n-1)/n = -7/8, r2 = (n-2)/n = 3/4
    rows = [
        (i, dt.date(2024, i + 1, 15), 10.0 if i % 2 == 0 else 0.0)
        for i in range(8)
    ]
    orders = spark.createDataFrame(
        rows, "o_orderkey long, o_orderdate date, o_totalprice double"
    )
    out = R.ar2_yule_walker(orders).collect()[0]
    assert out["n"] == 8
    assert abs(out["acf_lag1"] + 7.0 / 8.0) < 1e-6
    assert abs(out["acf_lag2"] - 6.0 / 8.0) < 1e-6
    # phi1 = r1(1-r2)/(1-r1^2), phi2 = (r2-r1^2)/(1-r1^2)
    assert abs(out["phi1"] + 0.933333) < 1e-5
    assert abs(out["phi2"] + 0.066667) < 1e-5
    assert out["stationary"] == 1


def _daily_orders(spark, counts):
    rows = []
    k = 0
    d0 = dt.date(2024, 1, 1)
    for day, c in enumerate(counts):
        for _ in range(c):
            rows.append((k, d0 + dt.timedelta(days=day), 1.0))
            k += 1
    return spark.createDataFrame(
        rows, "o_orderkey long, o_orderdate date, o_totalprice double"
    )


def test_ewma_chart_flat_series_no_breach(spark):
    out = R.ewma_control_chart(_daily_orders(spark, [5] * 20)).collect()[0]
    assert out["n_days"] == 20
    assert out["sigma_daily"] == 0.0
    assert out["n_out_of_control"] == 0
    assert out["first_breach_day"] == 0
    assert abs(out["ewma_final"] - 5.0) < 1e-9


def test_ewma_chart_detects_late_shift(spark):
    # 20 quiet days at 10/day then 10 days at 30/day: EWMA crosses the
    # upper limit a few days into the shift
    counts = [10] * 20 + [30] * 10
    out = R.ewma_control_chart(_daily_orders(spark, counts)).collect()[0]
    assert out["n_days"] == 30
    assert out["n_out_of_control"] >= 1
    assert 21 <= out["first_breach_day"] <= 30
    assert out["ewma_final"] > 20.0
