"""Wave-123 operators: Cohen's kappa segment stability."""

from __future__ import annotations

from pyspark.sql import functions as F

from simple_vector_spark.operators import relational as R


def _orders(spark, rows):
    return spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, o_orderdate string, o_totalprice double"
    ).select(
        "o_orderkey",
        "o_custkey",
        F.to_date("o_orderdate").alias("o_orderdate"),
        F.col("o_totalprice").cast("decimal(15,2)").alias("o_totalprice"),
    )


def test_kappa_is_one_for_perfectly_sticky_segments(spark):
    # same spend ORDER both years -> identical terciles -> kappa 1
    rows = []
    key = 0
    for cust in range(9):
        for year in (1995, 1996):
            rows.append((key, cust, f"{year}-06-01", 1000.0 - 100 * cust))
            key += 1
    out = R.segment_stability_kappa(_orders(spark, rows)).collect()[0]
    assert out["n_customers_both_years"] == 9
    assert out["observed_agreement"] == 1.0
    assert out["kappa"] == 1.0


def test_kappa_is_negative_for_cyclic_shift(spark):
    # year-2 ranks cyclically shifted one tercile: zero customers keep
    # their segment -> kappa = (0 - 1/3)/(1 - 1/3) = -0.5.  (A full
    # REVERSAL would score kappa 0: the middle tercile maps to itself
    # and agreement exactly matches chance.)
    rows = []
    key = 0
    for cust in range(9):
        rows.append((key, cust, "1995-06-01", 1000.0 - 100 * cust)); key += 1
        rows.append((key, cust, "1996-06-01", 1000.0 - 100 * ((cust + 3) % 9))); key += 1
    out = R.segment_stability_kappa(_orders(spark, rows)).collect()[0]
    assert out["observed_agreement"] == 0.0
    assert abs(out["kappa"] - (-0.5)) < 1e-6
