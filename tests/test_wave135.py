"""Wave-135 operators: quarterly Gini trend."""

from __future__ import annotations

from pyspark.sql import functions as F

from simple_vector_spark.operators import relational as R


def test_gini_trend_detects_concentration_shift(spark):
    # Q1: equal spend (gini 0); Q2: one whale takes nearly everything.
    rows = []
    key = 0
    for cust in range(10):
        rows.append((key, cust, "1995-02-01", 100.0)); key += 1
    rows.append((key, 0, "1995-05-01", 1000.0)); key += 1
    for cust in range(1, 10):
        rows.append((key, cust, "1995-05-01", 1.0)); key += 1
    orders = spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, o_orderdate string, o_totalprice double"
    ).select(
        "o_orderkey",
        "o_custkey",
        F.to_date("o_orderdate").alias("o_orderdate"),
        F.col("o_totalprice").cast("decimal(15,2)").alias("o_totalprice"),
    )
    out = {r["q"]: r for r in R.gini_trend_by_quarter(orders).collect()}
    assert out["1995-1"]["gini"] == 0.0
    assert out["1995-1"]["qoq_delta"] is None
    assert out["1995-2"]["gini"] > 0.8
    assert out["1995-2"]["qoq_delta"] > 0.8


def test_gini_trend_fixture_bounds(spark, sf_dir):
    from simple_vector_spark.sources.loaders import load_table

    out = R.gini_trend_by_quarter(load_table(spark, sf_dir, "orders")).collect()
    assert len(out) >= 4
    for r in out:
        assert -0.01 <= r["gini"] <= 1
