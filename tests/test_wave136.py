"""Wave-136 operators: new-vs-returning revenue split."""

from __future__ import annotations

from pyspark.sql import functions as F

from simple_vector_spark.operators import relational as R


def test_new_vs_returning_classifies_by_first_quarter(spark):
    rows = [
        (1, 1, "1995-02-01", 100.0),   # cust 1 new in Q1
        (2, 1, "1995-05-01", 50.0),    # returning in Q2
        (3, 2, "1995-05-01", 200.0),   # cust 2 new in Q2
    ]
    orders = spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, o_orderdate string, o_totalprice double"
    ).select(
        "o_orderkey",
        "o_custkey",
        F.to_date("o_orderdate").alias("o_orderdate"),
        F.col("o_totalprice").cast("decimal(15,2)").alias("o_totalprice"),
    )
    out = {r["q"]: r for r in R.new_vs_returning_revenue(orders).collect()}
    q1, q2 = out["1995-1"], out["1995-2"]
    assert q1["n_new_customers"] == 1 and q1["n_returning"] == 0
    assert float(q1["new_revenue"]) == 100.0
    assert q2["n_new_customers"] == 1 and q2["n_returning"] == 1
    assert float(q2["new_revenue"]) == 200.0
    assert float(q2["returning_revenue"]) == 50.0
    assert abs(q2["new_share"] - 0.8) < 1e-9


def test_new_vs_returning_first_quarter_all_new(spark, sf_dir):
    from simple_vector_spark.sources.loaders import load_table

    out = R.new_vs_returning_revenue(load_table(spark, sf_dir, "orders")).collect()
    first = min(out, key=lambda r: r["q"])
    assert first["n_returning"] == 0
    assert first["new_share"] == 1.0
