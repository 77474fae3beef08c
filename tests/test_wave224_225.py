"""Waves 224-225: WoE information value, tail dependence."""

from __future__ import annotations

import datetime as dt

from simple_vector_spark.operators import events as E
from simple_vector_spark.operators import relational as R


def test_iv_strong_vs_useless_feature(spark):
    rows = []
    for i in range(200):
        purchase = i % 4 == 0
        hour = 2 if purchase else 14     # hour_band fully separates
        rows.append(
            (i, dt.datetime(2024, 1, 3, hour, 0, 0),
             "purchase" if purchase else "view", 100.0)  # value constant
        )
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, value double"
    )
    out = {r["feature"]: r for r in E.woe_information_value(ev).collect()}
    assert out["hour_band"]["strength"] == "strong"
    assert out["weekend"]["information_value"] < 0.02
    assert out["weekend"]["strength"] == "useless"
    assert out["value_band"]["strength"] == "useless"


def _li(spark, qp):
    return spark.createDataFrame(
        [(i, 1, float(q), float(p)) for i, (q, p) in enumerate(qp)],
        "l_orderkey long, l_linenumber int, l_quantity double,"
        " l_extendedprice double",
    )


def test_tail_dependence_comonotone(spark):
    # perfectly comonotone: the top decile of one IS the top decile of
    # the other -> lambda_upper = lambda_lower = 1
    out = R.tail_dependence(
        _li(spark, [(i, i * 2) for i in range(1, 101)])
    ).collect()[0]
    assert out["lambda_upper"] == 1.0
    assert out["lambda_lower"] == 1.0


def test_tail_dependence_antimonotone_zero(spark):
    # perfectly anti-monotone: joint upper extremes never co-occur
    out = R.tail_dependence(
        _li(spark, [(i, 1000 - i) for i in range(1, 101)])
    ).collect()[0]
    assert out["lambda_upper"] == 0.0
    assert out["lambda_lower"] == 0.0
