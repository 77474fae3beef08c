"""Wave-69 operators: CUSUM, IQR fences, Cramér's V extension."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from simple_vector_spark.operators import relational as R


def test_cusum_peaks_at_level_shift(spark):
    # revenue 100/day for 5 days then 500/day for 5 days: the CUSUM
    # deviation peaks exactly at the last low day
    rows = []
    k = 0
    for i in range(10):
        amount = 100.0 if i < 5 else 500.0
        rows.append((k, amount, datetime.datetime(2024, 1, 1 + i)))
        k += 1
    orders = spark.createDataFrame(
        rows, "o_orderkey long, o_totalprice double, o_orderdate timestamp"
    )
    r = R.cusum_detect(orders).collect()[0]
    assert r["peak_day"] == datetime.date(2024, 1, 5)
    # mean is 300: after 5 low days S = 5*(100-300) = -1000
    assert r["peak_dev_dollars"] == -1000.0


def test_iqr_outliers_flag_extreme_price(spark):
    prices = [10.0, 11.0, 12.0, 13.0, 14.0, 15.0, 16.0, 500.0]
    part = spark.createDataFrame(
        [(i, "B1", p) for i, p in enumerate(prices)],
        "p_partkey long, p_brand string, p_retailprice double",
    )
    r = R.price_iqr_outliers(part).collect()[0]
    assert r["n_parts"] == 8
    assert r["n_outliers"] == 1  # the 500.0


def test_cramers_v_perfect_association(spark):
    # nation fully determines segment -> V = 1
    rows = [(i, 0, "A") for i in range(20)] + [(i + 100, 1, "B") for i in range(20)]
    customer = spark.createDataFrame(
        rows, "c_custkey long, c_nationkey long, c_mktsegment string"
    )
    r = R.chi2_independence(customer).collect()[0]
    assert abs(r["cramers_v"] - 1.0) < 1e-6
