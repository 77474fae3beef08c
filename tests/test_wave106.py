"""Wave-106/107/108 operators: Theil decomposition, runs test, join
strategy advisor."""

from __future__ import annotations

from pyspark.sql import functions as F

from simple_vector_spark.operators import relational as R
from simple_vector_spark.sources.loaders import load_table


def test_theil_decomposition_adds_up(spark, sf_dir):
    out = R.theil_decomposition(
        load_table(spark, sf_dir, "orders"), load_table(spark, sf_dir, "customer")
    ).collect()[0]
    assert out["theil_total"] >= 0
    assert out["theil_between"] >= 0
    assert out["theil_within"] >= 0
    # additive decomposition holds to rounding noise
    assert abs(out["residual"]) < 1e-4


def test_theil_zero_on_equal_spend(spark):
    orders = spark.createDataFrame(
        [(i, i % 4, 100.0) for i in range(8)],
        "o_orderkey long, o_custkey long, o_totalprice double",
    ).withColumn("o_totalprice", F.col("o_totalprice").cast("decimal(15,2)"))
    customer = spark.createDataFrame(
        [(i, i % 2) for i in range(4)], "c_custkey long, c_nationkey long"
    )
    out = R.theil_decomposition(orders, customer).collect()[0]
    assert out["theil_total"] == 0.0
    assert out["theil_between"] == 0.0
    assert out["theil_within"] == 0.0


def test_runs_test_alternating_series_is_excess_runs(spark):
    # Daily revenue strictly alternating above/below median -> maximum
    # possible runs -> strongly positive z.
    rows = [(i, f"2024-01-{i+1:02d}", (10.0 + i) if i % 2 else (1000.0 + i)) for i in range(20)]
    orders = spark.createDataFrame(
        rows, "o_orderkey long, o_orderdate string, o_totalprice double"
    ).select(
        "o_orderkey",
        F.to_date("o_orderdate").alias("o_orderdate"),
        F.col("o_totalprice").cast("decimal(15,2)").alias("o_totalprice"),
    )
    out = R.daily_runs_test(orders).collect()[0]
    assert out["runs"] == out["n_days_used"]  # every step flips
    assert out["z"] > 2.0


def test_runs_test_blocked_series_is_deficit_runs(spark):
    # First half all low, second half all high -> exactly 2 runs ->
    # strongly negative z.
    rows = [(i, f"2024-01-{i+1:02d}", (1000.0 + i) if i >= 10 else (10.0 + i)) for i in range(20)]
    orders = spark.createDataFrame(
        rows, "o_orderkey long, o_orderdate string, o_totalprice double"
    ).select(
        "o_orderkey",
        F.to_date("o_orderdate").alias("o_orderdate"),
        F.col("o_totalprice").cast("decimal(15,2)").alias("o_totalprice"),
    )
    out = R.daily_runs_test(orders).collect()[0]
    assert out["runs"] == 2
    assert out["z"] < -2.0


def test_join_advisor_broadcasts_dims_at_fixture_scale(spark, sf_dir):
    tables = {
        t: load_table(spark, sf_dir, t)
        for t in ("orders", "lineitem", "customer", "supplier", "part",
                  "nation", "region")
    }
    out = {r["edge"]: r for r in R.join_strategy_advisor(tables).collect()}
    assert len(out) == 6
    # at sf0.001 every parent fits under the broadcast threshold
    assert all(r["strategy"] == "broadcast_parent" for r in out.values())
    # bytes arithmetic is rows * width exactly
    w = {**R.ROW_WIDTH_BYTES, **R.DIM_WIDTH_BYTES}
    assert (
        out["orders->customer"]["parent_bytes"]
        == out["orders->customer"]["parent_rows"] * w["customer"]
    )
