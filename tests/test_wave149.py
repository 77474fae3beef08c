"""Wave-149 operators: bullwhip ratio."""

from __future__ import annotations

from pyspark.sql import functions as F

from simple_vector_spark.operators import relational as R


def test_bullwhip_amplification_detected(spark):
    # demand (order months) is constant; shipments alternate heavy/light
    # -> cv2_order ~ 0 but guarded, ship variance positive
    orders = spark.createDataFrame(
        [(k, f"2024-{m:02d}-15") for k, m in enumerate([1, 2, 3, 4], 1)],
        "o_orderkey long, o_orderdate string",
    ).select("o_orderkey", F.to_date("o_orderdate").alias("o_orderdate"))
    li = []
    for k, m in enumerate([1, 2, 3, 4], 1):
        qty = 10.0  # constant demand
        ship_qty_month = m
        li.append((k, qty, f"2024-{m:02d}-20"))
    lineitem = spark.createDataFrame(
        li, "l_orderkey long, l_quantity double, l_shipdate string"
    ).select(
        "l_orderkey", "l_quantity", F.to_date("l_shipdate").alias("l_shipdate")
    )
    out = R.bullwhip_ratio(orders, lineitem).collect()[0]
    # identical per-month quantities both sides here -> ratio 1 when defined
    assert out["n_months_order"] == 4 and out["n_months_ship"] == 4
    if out["cv2_order"] and out["cv2_order"] > 0:
        assert out["bullwhip_ratio"] is not None


def test_bullwhip_fixture_is_positive(spark, sf_dir):
    from simple_vector_spark.sources.loaders import load_table

    out = R.bullwhip_ratio(
        load_table(spark, sf_dir, "orders"), load_table(spark, sf_dir, "lineitem")
    ).collect()[0]
    assert out["cv2_order"] >= 0 and out["cv2_ship"] >= 0
    assert out["bullwhip_ratio"] is None or out["bullwhip_ratio"] > 0
