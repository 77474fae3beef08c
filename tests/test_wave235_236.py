"""Waves 235-236: gamma inter-purchase fit, price stickiness."""

from __future__ import annotations

import datetime as dt

from simple_vector_spark.operators import relational as R


def test_gamma_regular_cadence_high_shape(spark):
    # every customer orders exactly every 30 days -> v ~ 0 -> huge k
    rows = []
    for cid in range(10):
        for k in range(6):
            rows.append((cid * 10 + k, cid,
                         dt.date(2024, 1, 1) + dt.timedelta(days=30 * k)))
    orders = spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, o_orderdate date"
    )
    out = R.interpurchase_gamma_fit(orders).collect()[0]
    assert out["mean_gap_days"] == 30.0
    assert out["rhythm"] == "regular"


def test_gamma_bursty_cadence_low_shape(spark):
    # five 1-day gaps then one 295-day gap per customer: CV >> 1
    rows, ok = [], 0
    for cid in range(10):
        d = dt.date(2024, 1, 1)
        rows.append((ok, cid, d)); ok += 1
        for k in range(6):
            d = d + dt.timedelta(days=295 if k == 5 else 1)
            rows.append((ok, cid, d)); ok += 1
    orders = spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, o_orderdate date"
    )
    out = R.interpurchase_gamma_fit(orders).collect()[0]
    assert out["rhythm"] == "bursty"
    assert out["gamma_shape"] < 0.8


def _li(spark, rows):
    return spark.createDataFrame(
        rows,
        "l_partkey long, l_shipdate date, l_extendedprice double,"
        " l_quantity double",
    )


def test_price_stickiness_flags_only_real_changes(spark):
    rows = []
    # part 1: constant price over 6 months -> 0 changes, 5 pairs
    for k in range(6):
        rows.append((1, dt.date(2024, 1 + k, 10), 100.0, 10.0))
    # part 2: one >1% jump at month 4
    for k in range(6):
        price = 200.0 if k < 3 else 230.0
        rows.append((2, dt.date(2024, 1 + k, 10), price, 10.0))
    out = R.price_stickiness(_li(spark, rows)).collect()[0]
    assert out["n_adjacent_pairs"] == 10
    assert out["n_changes"] == 1
    assert abs(out["monthly_change_freq"] - 0.1) < 1e-9
    assert abs(out["mean_spell_months"] - 10.0) < 1e-9


def test_price_stickiness_gap_months_not_paired(spark):
    # months 1 and 3 are not adjacent: no pair
    rows = [(1, dt.date(2024, 1, 10), 100.0, 10.0),
            (1, dt.date(2024, 3, 10), 150.0, 10.0)]
    out = R.price_stickiness(_li(spark, rows)).collect()[0]
    assert out["n_adjacent_pairs"] == 0
