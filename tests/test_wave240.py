"""Wave 240: Granger causality and Cp/Cpk process capability."""

from __future__ import annotations

import datetime as dt
import math

from simple_vector_spark.operators import relational as R


def _orders(spark, month_plan):
    """month_plan: list of (month, n_orders, price_each)."""
    rows, ok = [], 0
    for (month, n, price) in month_plan:
        for _ in range(n):
            rows.append((ok, dt.date(2024, month, 10), price)); ok += 1
    return spark.createDataFrame(
        rows, "o_orderkey long, o_orderdate date, o_totalprice double"
    )


def test_granger_count_drives_revenue(spark):
    # revenue_t = 1000 * count_{t-1}: the cross lag is the whole story
    z = [1, 2, 3, 1, 2, 3, 1, 2]
    plan = [(1, z[0], 500.0)]
    for k in range(1, 8):
        plan.append((k + 1, z[k], round(1000.0 * z[k - 1] / z[k], 2)))
    out = R.granger_revenue(_orders(spark, plan)).collect()[0]
    assert out["n_obs"] == 7
    assert out["r2_unrestricted"] > 0.999
    assert out["r2_unrestricted"] >= out["r2_restricted"] - 1e-9
    assert out["f_stat"] > 10.0
    assert out["p_value"] < 0.01


def test_granger_unrelated_count_adds_little(spark):
    # revenue follows its own AR path; count wiggles independently
    y = [100, 180, 150, 210, 170, 230, 190, 250, 205, 260]
    z = [3, 4, 3, 4, 4, 3, 4, 3, 3, 4]
    plan = [(k + 1, z[k], round(y[k] * 1.0 / z[k], 2)) for k in range(10)]
    out = R.granger_revenue(_orders(spark, plan)).collect()[0]
    gain = out["r2_unrestricted"] - out["r2_restricted"]
    assert gain < 0.2
    assert out["f_stat"] < 10.0


def test_process_capability_centered(spark):
    rows = [(20.0,)] * 50 + [(30.0,)] * 50
    li = spark.createDataFrame(rows, "l_quantity double")
    out = R.process_capability(li).collect()[0]
    n, m = 100, 25.0
    var = (50 * 400.0 + 50 * 900.0 - n * m * m) / (n - 1)
    sd = math.sqrt(var)
    assert out["mean_qty"] == 25.0
    assert abs(out["sd_qty"] - round(sd, 6)) < 1e-9
    assert abs(out["cp"] - round(49.0 / (6 * sd), 6)) < 1e-6
    assert abs(out["cpk"] - round(24.0 / (3 * sd), 6)) < 1e-6
    assert out["observed_oos_ppm"] == 0.0


def test_process_capability_flags_out_of_spec(spark):
    rows = [(25.0,)] * 99 + [(60.0,)]
    li = spark.createDataFrame(rows, "l_quantity double")
    out = R.process_capability(li).collect()[0]
    assert abs(out["observed_oos_ppm"] - round(1e6 / 100, 6)) < 1e-6
