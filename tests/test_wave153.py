"""Wave-153 operator: Theil-Sen robust trend."""

from __future__ import annotations

import datetime as dt
from decimal import Decimal

from simple_vector_spark.operators import relational as R


def _orders(spark, month_rev):
    rows = []
    oid = 0
    for (y, m), rev in month_rev.items():
        rows.append((oid, 1, dt.date(y, m, 15), Decimal(str(rev))))
        oid += 1
    return spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, o_orderdate date, o_totalprice decimal(18,2)"
    )


def test_theil_sen_exact_line(spark):
    # perfectly linear y = 100 + 10*i -> both slopes are exactly 10.
    rev = {(2020, m): 100 + 10 * (m - 1) for m in range(1, 7)}
    row = R.theil_sen_trend(_orders(spark, rev)).collect()[0]
    assert row["n_months"] == 6
    assert row["n_pairs"] == 15
    assert abs(row["theil_slope"] - 10.0) < 1e-9
    assert abs(row["ols_slope"] - 10.0) < 1e-9
    assert abs(row["theil_intercept"] - 100.0) < 1e-9


def test_theil_sen_resists_outlier_ols_does_not(spark):
    # linear slope 10 with one wild outlier month: Theil-Sen stays
    # near 10, OLS gets dragged far away.
    rev = {(2020, m): 100 + 10 * (m - 1) for m in range(1, 13)}
    rev[(2020, 6)] = 100000
    row = R.theil_sen_trend(_orders(spark, rev)).collect()[0]
    assert abs(row["theil_slope"] - 10.0) < 1.0
    assert abs(row["ols_slope"] - 10.0) > 100.0


def test_theil_sen_even_pair_count_median(spark):
    # 4 months -> 6 pairs (even): median = mean of two middle slopes.
    rev = {(2020, 1): 0, (2020, 2): 10, (2020, 3): 40, (2020, 4): 41}
    row = R.theil_sen_trend(_orders(spark, rev)).collect()[0]
    # slopes: (10,20,30,1,15.5,13.6667) sorted ->
    # [1, 10, 13.6667, 15.5, 20, 30]; median = (13.6667+15.5)/2
    assert row["n_pairs"] == 6
    assert abs(row["theil_slope"] - round((41 / 3 + 15.5) / 2, 6)) < 1e-6
