"""Wave-145 operators: repeat-purchase rate."""

from __future__ import annotations

from simple_vector_spark.operators import relational as R


def test_repeat_purchase_separates_consumables(spark):
    # part 1: 5 customers, all repeat (2 orders each)
    # part 2: 5 customers, none repeat
    orders, lineitem = [], []
    ok = 0
    for cust in range(5):
        ok += 1; orders.append((ok, cust)); lineitem.append((ok, 1))
        ok += 1; orders.append((ok, cust)); lineitem.append((ok, 1))
        ok += 1; orders.append((ok, cust)); lineitem.append((ok, 2))
    odf = spark.createDataFrame(orders, "o_orderkey long, o_custkey long")
    ldf = spark.createDataFrame(lineitem, "l_orderkey long, l_partkey long")
    out = {r["part_id"]: r for r in R.part_repeat_purchase(odf, ldf).collect()}
    assert out[1]["repeat_rate"] == 1.0
    assert out[2]["repeat_rate"] == 0.0
    assert out[1]["n_customers"] == out[2]["n_customers"] == 5


def test_repeat_purchase_support_floor(spark):
    # a part with fewer than min_customers buyers is excluded
    odf = spark.createDataFrame([(1, 1), (2, 1)], "o_orderkey long, o_custkey long")
    ldf = spark.createDataFrame([(1, 9), (2, 9)], "l_orderkey long, l_partkey long")
    assert R.part_repeat_purchase(odf, ldf).count() == 0
