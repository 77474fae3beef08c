"""Wave-154 operator: Holt linear-trend smoothing."""

from __future__ import annotations

import datetime as dt
from decimal import Decimal

from simple_vector_spark.operators import relational as R


def _orders(spark, vals, start=(2020, 1)):
    y0, m0 = start
    rows = []
    for i, v in enumerate(vals):
        y, m = y0 + (m0 - 1 + i) // 12, (m0 - 1 + i) % 12 + 1
        rows.append((i, 1, dt.date(y, m, 10), Decimal(str(v))))
    return spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderdate date, o_totalprice decimal(18,2)",
    )


def _ref_holt(vals, a=R.HOLT_ALPHA, b=R.HOLT_BETA):
    l, t, sse = float(vals[0]), float(vals[1]) - float(vals[0]), 0.0
    for x in vals[1:]:
        pred = l + t
        newl = a * x + (1 - a) * pred
        t = b * (newl - l) + (1 - b) * t
        l = newl
        sse += (pred - x) * (pred - x)
    return l, t, sse


def test_holt_matches_reference_recursion(spark):
    vals = [100, 110, 125, 130, 150, 149, 170]
    row = R.holt_linear_trend(_orders(spark, vals)).collect()[0]
    l, t, sse = _ref_holt(vals)
    assert row["n_months"] == 7
    assert abs(row["level"] - round(l, 6)) < 1e-6
    assert abs(row["trend"] - round(t, 6)) < 1e-6
    assert abs(row["mse_1step"] - round(sse / 6, 6)) < 1e-6
    assert abs(row["forecast_1m"] - round(l + t, 6)) < 1e-6
    assert abs(row["forecast_3m"] - round(l + 3 * t, 6)) < 1e-6


def test_holt_exact_line_perfect_fit(spark):
    # y = 50 + 25*t: level lands on the line, trend = 25, zero error.
    vals = [50 + 25 * t for t in range(8)]
    row = R.holt_linear_trend(_orders(spark, vals)).collect()[0]
    assert abs(row["trend"] - 25.0) < 1e-9
    assert abs(row["mse_1step"]) < 1e-9
    assert abs(row["forecast_1m"] - (vals[-1] + 25)) < 1e-9


def test_holt_constant_series_flat_forecast(spark):
    vals = [42] * 6
    row = R.holt_linear_trend(_orders(spark, vals)).collect()[0]
    assert abs(row["trend"]) < 1e-9
    assert abs(row["forecast_3m"] - 42.0) < 1e-9
