"""Wave-111 operators: backlog aging."""

from __future__ import annotations

from pyspark.sql import functions as F

from simple_vector_spark.operators import relational as R
from simple_vector_spark.sources.loaders import load_table


def test_backlog_aging_bands_and_shares(spark):
    rows = [
        (1, "O", "2024-06-01", 100.0),  # age 30 vs asof 2024-07-01
        (2, "O", "2023-06-01", 200.0),  # age ~396 -> 366-730d
        (3, "O", "2020-01-01", 300.0),  # age > 730 -> tail
        (4, "F", "2019-01-01", 999.0),  # closed: excluded
        (5, "P", "2024-07-01", 999.0),  # pending: excluded, sets asof
    ]
    orders = spark.createDataFrame(
        rows, "o_orderkey long, o_orderstatus string, o_orderdate string, o_totalprice double"
    ).select(
        "o_orderkey",
        "o_orderstatus",
        F.to_date("o_orderdate").alias("o_orderdate"),
        F.col("o_totalprice").cast("decimal(15,2)").alias("o_totalprice"),
    )
    out = {r["age_band"]: r for r in R.backlog_aging(orders).collect()}
    assert set(out) == {"000-090d", "366-730d", "730d+"}
    assert out["000-090d"]["n_orders"] == 1
    assert float(out["730d+"]["backlog_value"]) == 300.0
    assert abs(sum(r["value_share"] for r in out.values()) - 1.0) < 1e-6


def test_backlog_aging_fixture_totals(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    out = R.backlog_aging(orders).collect()
    n_open = orders.filter(F.col("o_orderstatus") == "O").count()
    assert sum(r["n_orders"] for r in out) == n_open
    assert all(r["mean_age_days"] >= 0 for r in out)
