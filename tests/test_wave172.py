"""Wave-172 operator: Observation-API piggybacked quality metrics."""

from __future__ import annotations

from decimal import Decimal

from simple_vector_spark.operators import relational as R


def _orders(spark, rows):
    return spark.createDataFrame(
        rows, "o_orderkey long, o_orderpriority string, o_totalprice double"
    )


def test_observed_metrics_match_data(spark):
    orders = _orders(
        spark,
        [(1, "A", 10.0), (2, "A", 30.0), (3, "B", 20.0), (4, "B", None)],
    )
    out = R.observed_quality_metrics(orders).collect()[0]
    assert out["n_rows"] == 4
    assert out["null_prices"] == 1
    assert out["min_price"] == Decimal("10.00")
    assert out["max_price"] == Decimal("30.00")
    assert out["priority_groups"] == 2


def test_observed_metrics_single_job(spark):
    # the whole point: metrics ride the workload's job; a fresh call
    # on a tiny frame still works end to end and is self-consistent
    orders = _orders(spark, [(1, "X", 5.0)])
    out = R.observed_quality_metrics(orders).collect()[0]
    assert out["n_rows"] == 1 and out["priority_groups"] == 1
    assert out["min_price"] == out["max_price"] == Decimal("5.00")
