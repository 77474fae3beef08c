"""Waves 230-231: Ljung-Box test, concentration ratios."""

from __future__ import annotations

import datetime as dt
import random

from simple_vector_spark.operators import relational as R


def _orders(spark, vals):
    rows = [
        (k, dt.date(2018 + k // 12, k % 12 + 1, 15), float(v))
        for k, v in enumerate(vals)
    ]
    return spark.createDataFrame(
        rows, "o_orderkey long, o_orderdate date, o_totalprice double"
    )


def test_ljung_box_alternating_series_rejects(spark):
    # strict alternation: r1 ~ -1 -> enormous Q
    out = R.ljung_box_test(
        _orders(spark, [10, 0] * 24)
    ).collect()[0]
    assert out["autocorrelated"] == 1
    assert out["ljung_box_q"] > out["crit_5pct"]


def test_ljung_box_scrambled_series_passes(spark):
    rng = random.Random(5)
    vals = [rng.uniform(0, 100) for _ in range(48)]
    out = R.ljung_box_test(_orders(spark, vals)).collect()[0]
    assert out["autocorrelated"] == 0
    assert out["lags"] == 6


def test_concentration_ratios_known_shares(spark):
    # nations with revenues 50, 20, 10, 10, 5, 2, 2, 1 (total 100):
    # CR4 = 0.9, CR8 = 1.0
    revs = [50.0, 20.0, 10.0, 10.0, 5.0, 2.0, 2.0, 1.0]
    orders = spark.createDataFrame(
        [(i, i, r) for i, r in enumerate(revs)],
        "o_orderkey long, o_custkey long, o_totalprice double",
    )
    customer = spark.createDataFrame(
        [(i, i) for i in range(len(revs))],
        "c_custkey long, c_nationkey long",
    )
    out = R.concentration_ratios(orders, customer).collect()[0]
    assert out["n_players"] == 8
    assert abs(out["cr4"] - 0.9) < 1e-9
    assert abs(out["cr8"] - 1.0) < 1e-9
