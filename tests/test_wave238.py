"""Wave 238: Brier decomposition and purchase-streak islands."""

from __future__ import annotations

import datetime as dt

from simple_vector_spark.operators import relational as R


def _brier(spark, rows):
    orders = spark.createDataFrame(
        rows, "o_totalprice double, o_orderpriority string"
    )
    return R.brier_decomposition(orders).collect()[0]


def test_brier_perfect_separation(spark):
    # low price <=> negative, high price <=> positive: a perfectly
    # calibrated, perfectly discriminating forecast.
    rows = [(100.0, "5-LOW")] * 50 + [(10000.0, "1-URGENT")] * 50
    out = _brier(spark, rows)
    assert out["n_orders"] == 100
    assert out["base_rate"] == 0.5
    assert out["uncertainty"] == 0.25
    assert out["brier_score"] == 0.0
    assert out["reliability"] == 0.0
    assert out["resolution"] == 0.25
    assert out["brier_binned"] == 0.0


def test_brier_useless_forecast(spark):
    # outcome independent of score: resolution ~ 0, reliability = the
    # squared gap between the bin mean score and the 50% base rate.
    rows = []
    for price in (100.0, 200.0, 9000.0, 9100.0):
        rows.append((price, "1-URGENT"))
        rows.append((price, "5-LOW"))
    out = _brier(spark, rows)
    assert out["base_rate"] == 0.5
    assert out["resolution"] == 0.0
    assert out["reliability"] > 0.1
    # identity: binned brier = rel - res + unc, and the raw brier
    # exceeds it by the (nonnegative) within-bin score variance
    assert abs(
        out["brier_binned"]
        - round(out["reliability"] - out["resolution"] + out["uncertainty"], 6)
    ) < 2e-6
    assert out["brier_score"] >= out["brier_binned"] - 1e-9


def test_order_streaks_islands(spark):
    rows = []
    # customer 1: months 1,2,3 then 5,6 -> longest streak 3
    for m in (1, 2, 3, 5, 6):
        rows.append((1, dt.date(2024, m, 10)))
    # second order in the same month must not break or extend a streak
    rows.append((1, dt.date(2024, 2, 20)))
    # customer 2: a single month -> streak 1
    rows.append((2, dt.date(2024, 7, 1)))
    # customer 3: Dec -> Jan across a year boundary is consecutive
    rows.append((3, dt.date(2023, 12, 5)))
    rows.append((3, dt.date(2024, 1, 5)))
    orders = spark.createDataFrame(rows, "o_custkey long, o_orderdate date")
    out = {r["streak_months"]: r for r in R.order_streaks(orders).collect()}
    assert out[3]["n_customers"] == 1
    assert out[1]["n_customers"] == 1
    assert out[2]["n_customers"] == 1
    assert abs(out[3]["share"] - 1 / 3) < 1e-6
