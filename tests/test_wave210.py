"""Wave-210 operator: candidate-key discovery."""

from __future__ import annotations

from simple_vector_spark.operators import relational as R


def test_key_discovery_verdicts(spark):
    tables = {
        "orders": spark.createDataFrame(
            [(1, 10, "a"), (2, 10, "b"), (3, 11, None)],
            "o_orderkey long, o_custkey long, o_orderdate string",
        ),
        "customer": spark.createDataFrame(
            [(1, 5, "X"), (2, 5, "X")],
            "c_custkey long, c_nationkey long, c_mktsegment string",
        ),
        "part": spark.createDataFrame(
            [(1, "t1"), (2, "t2")], "p_partkey long, p_type string"
        ),
        "supplier": spark.createDataFrame(
            [(1, 3)], "s_suppkey long, s_nationkey long"
        ),
    }
    out = {
        (r["table_name"], r["column_name"]): r
        for r in R.key_discovery(tables).collect()
    }
    assert out[("orders", "o_orderkey")]["is_key"] == 1
    assert out[("orders", "o_custkey")]["is_key"] == 0
    # a NULL disqualifies a key even when non-null values are unique
    r = out[("orders", "o_orderdate")]
    assert r["is_key"] == 0 and r["n_nulls"] == 1
    assert r["is_near_key"] == 1  # unique among the non-null rows
    assert out[("customer", "c_nationkey")]["uniqueness"] == 0.5
    assert out[("supplier", "s_suppkey")]["is_key"] == 1
