"""Waves 181-182: Welch's t-test, Durbin-Levinson PACF."""

from __future__ import annotations

import datetime as dt

from simple_vector_spark.operators import relational as R


def _lineitem(spark, rows):
    return spark.createDataFrame(
        rows, "l_returnflag string, l_quantity double"
    )


def test_welch_hand_computed(spark):
    # R = {1,2,3}: m=2, v=1; N = {10,14}: m=12, v=8
    # se2 = 1/3 + 4 = 13/3; t = -10/sqrt(13/3)
    rows = [("R", 1.0), ("R", 2.0), ("R", 3.0), ("N", 10.0), ("N", 14.0)]
    out = R.welch_ttest(_lineitem(spark, rows)).collect()[0]
    assert (out["n_a"], out["n_b"]) == (3, 2)
    assert out["mean_a"] == 2.0 and out["mean_b"] == 12.0
    assert abs(out["t_stat"] + 10.0 / (13.0 / 3.0) ** 0.5) < 1e-5
    # Welch df = (13/3)^2 / ((1/3)^2/2 + 4^2/1) = (169/9)/(1/18 + 16)
    exp_df = (13.0 / 3.0) ** 2 / ((1.0 / 9.0) / 2.0 + 16.0)
    assert abs(out["welch_df"] - exp_df) < 1e-4


def test_welch_identical_groups(spark):
    rows = [("R", 5.0), ("R", 7.0), ("N", 5.0), ("N", 7.0)]
    out = R.welch_ttest(_lineitem(spark, rows)).collect()[0]
    assert out["t_stat"] == 0.0
    assert abs(out["p_value"] - 1.0) < 1e-6


def _orders(spark, vals):
    rows = [
        (k, dt.date(2020 + k // 12, k % 12 + 1, 15), float(v))
        for k, v in enumerate(vals)
    ]
    return spark.createDataFrame(
        rows, "o_orderkey long, o_orderdate date, o_totalprice double"
    )


def test_pacf_alternating_series(spark):
    # c = +-1 pattern: r_k = (-1)^k (n-k)/n for n=8
    out = R.pacf_durbin_levinson(
        _orders(spark, [10, 0, 10, 0, 10, 0, 10, 0])
    ).collect()[0]
    r1, r2, r3 = -7 / 8, 6 / 8, -5 / 8
    p11 = r1
    p22 = (r2 - r1 * r1) / (1 - r1 * r1)
    a21 = p11 - p22 * p11
    p33 = (r3 - a21 * r2 - p22 * r1) / (1 - a21 * r1 - p22 * r2)
    assert abs(out["pacf_1"] - round(p11, 6)) < 1e-6
    assert abs(out["pacf_2"] - round(p22, 6)) < 2e-6
    assert abs(out["pacf_3"] - round(p33, 6)) < 2e-6


def test_pacf_white_noise_small(spark):
    # an uncorrelated-ish planted series: pacf_2/3 stay modest while
    # the function stays finite and deterministic
    vals = [13, 7, 11, 5, 17, 3, 9, 15, 6, 12, 8, 14]
    out = R.pacf_durbin_levinson(_orders(spark, vals)).collect()[0]
    assert out["n"] == 12
    for k in ("pacf_1", "pacf_2", "pacf_3"):
        assert abs(out[k]) <= 1.0
