"""Wave-169 operator: Mann-Kendall monotone-trend test."""

from __future__ import annotations

import datetime as dt

from simple_vector_spark.operators import relational as R


def _orders(spark, month_revs):
    rows = [
        (i, dt.date(2024, mth, 10), float(rev))
        for i, (mth, rev) in enumerate(month_revs)
    ]
    return spark.createDataFrame(
        rows, "o_orderkey long, o_orderdate date, o_totalprice double"
    )


def test_mk_strictly_increasing(spark):
    # 4 months, rev 1<2<3<4: S = 6, var = 4*3*13/18, z = 5/sqrt(var)
    out = R.mann_kendall_trend(
        _orders(spark, [(1, 1), (2, 2), (3, 3), (4, 4)])
    ).collect()[0]
    assert out["n_months"] == 4
    assert out["s_stat"] == 6
    assert abs(out["var_s"] - 26.0 / 3.0) < 1e-6
    assert abs(out["z_score"] - 5.0 / (26.0 / 3.0) ** 0.5) < 1e-5
    assert out["trend"] == "increasing"


def test_mk_decreasing_symmetry(spark):
    up = R.mann_kendall_trend(
        _orders(spark, [(1, 1), (2, 2), (3, 3), (4, 4)])
    ).collect()[0]
    down = R.mann_kendall_trend(
        _orders(spark, [(1, 4), (2, 3), (3, 2), (4, 1)])
    ).collect()[0]
    assert down["s_stat"] == -up["s_stat"]
    assert abs(down["z_score"] + up["z_score"]) < 1e-9
    assert down["trend"] == "decreasing"


def test_mk_ties_reduce_variance(spark):
    # equal revenues in two months form a tie group: t=2 contributes
    # t(t-1)(2t+5) = 18 -> var = (4*3*13 - 18)/18 = 138/18
    out = R.mann_kendall_trend(
        _orders(spark, [(1, 1), (2, 2), (3, 2), (4, 4)])
    ).collect()[0]
    assert abs(out["var_s"] - 138.0 / 18.0) < 1e-6
    # S: pairs (1,2)+ (1,2)+ (1,4)+ (2,2)0 (2,4)+ (2,4)+ = 5
    assert out["s_stat"] == 5


def test_mk_flat_series_none(spark):
    out = R.mann_kendall_trend(
        _orders(spark, [(1, 7), (2, 7), (3, 7)])
    ).collect()[0]
    assert out["s_stat"] == 0
    assert out["z_score"] == 0.0
    assert out["trend"] == "none"
