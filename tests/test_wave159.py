"""Wave-159 operator: split-conformal forecast interval."""

from __future__ import annotations

import datetime as dt
from decimal import Decimal

from simple_vector_spark.operators import relational as R


def _orders(spark, vals):
    rows = []
    for i, v in enumerate(vals):
        y, m = 2015 + i // 12, i % 12 + 1
        rows.append((i, dt.date(y, m, 10), Decimal(str(round(v, 2)))))
    return spark.createDataFrame(
        rows, "o_orderkey long, o_orderdate date, o_totalprice decimal(18,2)"
    )


def test_conformal_perfect_line_zero_band(spark):
    # exactly linear series: every backtest residual is 0, so the band
    # collapses and the forecast continues the line.
    vals = [100 + 10 * t for t in range(30)]
    row = R.conformal_forecast(_orders(spark, vals)).collect()[0]
    assert row["h_backtest"] == R.CONFORMAL_H
    assert abs(row["q_hat"]) < 1e-6
    assert abs(row["forecast_next"] - (100 + 10 * 30)) < 1e-3
    assert abs(row["hi"] - row["lo"]) < 1e-5


def test_conformal_band_scales_with_noise(spark):
    # same line with +-30 alternating noise: band must be positive and
    # bracket the continued line.
    vals = [100 + 10 * t + (30 if t % 2 else -30) for t in range(30)]
    row = R.conformal_forecast(_orders(spark, vals)).collect()[0]
    assert row["q_hat"] > 10.0
    assert row["lo"] < 100 + 10 * 30 < row["hi"]


def test_conformal_interval_is_symmetric(spark):
    vals = [500 + 7 * t + ((t * 13) % 11) for t in range(40)]
    row = R.conformal_forecast(_orders(spark, vals)).collect()[0]
    assert abs((row["hi"] - row["forecast_next"]) - (row["forecast_next"] - row["lo"])) < 1e-5
    assert row["q_level"] == 0.9
