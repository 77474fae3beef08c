"""Log-rank survival test and Croston/SBA forecasting unit tests (restored from the original wave-237 file after it was repurposed in round 3 — ADVICE r03)."""

from __future__ import annotations

import datetime as dt

from simple_vector_spark.operators import relational as R


def _surv(spark, rows_orders, rows_cust):
    orders = spark.createDataFrame(
        rows_orders, "o_orderkey long, o_custkey long, o_orderdate date"
    )
    cust = spark.createDataFrame(
        rows_cust, "c_custkey long, c_mktsegment string"
    )
    return R.logrank_test(orders, cust).collect()[0]


def test_logrank_separated_groups_significant(spark):
    # A churns at ~2 months, B at ~18 months; an anchor customer pushes
    # the dataset end far enough out that every lifetime is an observed
    # churn event (not censored).
    o, c, ok = [], [], 0
    for cid in range(20):  # group A: short lives
        o.append((ok, cid, dt.date(2020, 1, 1))); ok += 1
        o.append((ok, cid, dt.date(2020, 3, 1))); ok += 1
        c.append((cid, "BUILDING"))
    for cid in range(20, 40):  # group B: long lives
        o.append((ok, cid, dt.date(2020, 1, 1))); ok += 1
        o.append((ok, cid, dt.date(2021, 7, 1))); ok += 1
        c.append((cid, "MACHINERY"))
    o.append((ok, 99, dt.date(2022, 6, 1)))  # anchor sets dataset end
    c.append((99, "MACHINERY"))
    out = _surv(spark, o, c)
    assert out["n_group_a"] == 20
    assert out["n_group_b"] == 21
    assert out["observed_a"] == 20
    # all 20 A-deaths happen first while 40+ are at risk -> E1 ~ half
    assert out["chi2"] > 10.0
    assert out["p_value"] < 0.01


def test_logrank_identical_groups_null(spark):
    # perfectly symmetric groups -> observed == expected, chi2 == 0
    o, c, ok = [], [], 0
    for cid in range(30):
        seg = "BUILDING" if cid % 2 == 0 else "HOUSEHOLD"
        life = 30 * (cid // 2 % 5 + 1)  # same lifetime mix per group
        o.append((ok, cid, dt.date(2020, 1, 1))); ok += 1
        o.append((ok, cid, dt.date(2020, 1, 1) + dt.timedelta(days=life)))
        ok += 1
    for cid in range(30):
        c.append((cid, "BUILDING" if cid % 2 == 0 else "HOUSEHOLD"))
    o.append((ok, 99, dt.date(2022, 1, 1)))
    c.append((99, "AUTOMOBILE"))
    out = _surv(spark, o, c)
    assert out["n_group_a"] == 15
    assert abs(out["observed_a"] - out["expected_a"]) < 1e-6
    assert out["chi2"] == 0.0
    assert out["p_value"] > 0.9


def _croston(spark, rows):
    li = spark.createDataFrame(
        rows, "l_partkey long, l_shipdate date, l_quantity double"
    )
    return {r["part_id"]: r for r in R.croston_forecast(li).collect()}


def _ses(xs, a=R.CROSTON_ALPHA):
    acc = xs[0]
    for x in xs[1:]:
        acc = a * x + (1.0 - a) * acc
    return acc


def test_croston_steady_and_intermittent(spark):
    rows = []
    # part 1: demand 10 every month for 6 months -> z=10, p=1
    for k in range(6):
        rows.append((1, dt.date(2024, 1 + k, 5), 10.0))
    # part 2: demand 20 every OTHER month (months 1,3,5,7,9,11)
    for k in range(6):
        rows.append((2, dt.date(2024, 1 + 2 * k, 5), 20.0))
    # part 3: only 3 demand months -> below CROSTON_MIN_MONTHS, skipped
    for k in range(3):
        rows.append((3, dt.date(2024, 1 + k, 5), 5.0))
    out = _croston(spark, rows)
    assert set(out) == {1, 2}
    p1, p2 = out[1], out[2]
    assert p1["z_hat"] == 10.0 and p1["p_hat"] == 1.0
    assert p1["croston_fc"] == 10.0 and p1["sba_fc"] == 9.0
    # part 2 intervals: first month is the global min -> gap 1, then 2s
    exp_p = _ses([1.0, 2.0, 2.0, 2.0, 2.0, 2.0])
    assert abs(p2["p_hat"] - round(exp_p, 6)) < 1e-9
    assert abs(p2["croston_fc"] - round(20.0 / exp_p, 6)) < 1e-6
    assert p2["n_demand_months"] == 6


def test_croston_first_interval_counts_lead_in(spark):
    rows = []
    # global min month is 2024-01 (part 9); part 5 starts in 2024-04
    for k in range(6):
        rows.append((9, dt.date(2024, 1 + k, 5), 7.0))
    for k in range(4):
        rows.append((5, dt.date(2024, 4 + k, 5), 12.0))
    out = _croston(spark, rows)
    # part 5 first gap = months since 2024-01 + 1 = 4, then 1,1,1
    exp_p = _ses([4.0, 1.0, 1.0, 1.0])
    assert abs(out[5]["p_hat"] - round(exp_p, 6)) < 1e-9
