"""Wave-55 operators: session-window TVF, LATERAL, DDSketch, FD
discovery, IVM join delta."""

from __future__ import annotations

from pyspark.sql import functions as F

from simple_vector_spark import registry as REG
from simple_vector_spark.operators import relational as R
from simple_vector_spark.operators import sketches as SK


def test_session_window_tvf_equals_hand_rolled(spark, sf_dir):
    tvf = {tuple(r) for r in REG.events_session_window_tvf(spark, sf_dir).collect()}
    hand = {tuple(r) for r in REG.events_sessionize(spark, sf_dir).collect()}
    assert tvf == hand


def test_ddsketch_respects_relative_error_bound(spark, sf_dir):
    from simple_vector_spark.sources.loaders import load_table

    out = SK.ddsketch_quantile_audit(load_table(spark, sf_dir, "orders"))
    for r in out.collect():
        # DDSketch guarantee: relative error < (gamma-1)/(gamma+1) * ~1
        assert r["rel_err"] <= (SK.DDSKETCH_GAMMA - 1.0), r


def test_fd_discovery_flags_planted_violation(spark):
    orders = spark.createDataFrame(
        [(1, 10, "A"), (2, 10, "B"), (3, 11, "A")],
        "o_orderkey long, o_custkey long, o_orderpriority string",
    )
    lineitem = spark.createDataFrame(
        [(1, 1, 1, "N")], "l_orderkey long, l_partkey long, l_suppkey long, l_returnflag string"
    )
    customer = spark.createDataFrame(
        [(10, 0, "S1"), (11, 0, "S2")],
        "c_custkey long, c_nationkey long, c_mktsegment string",
    )
    out = {
        r["fd"]: r
        for r in R.fd_discovery_audit(
            {"orders": orders, "lineitem": lineitem, "customer": customer}
        ).collect()
    }
    assert out["o_orderkey->o_custkey"]["holds"] is True
    # custkey 10 maps to priorities {A, B} -> violated
    assert out["o_custkey->o_orderpriority"]["n_violating"] == 1
    assert out["o_custkey->o_orderpriority"]["holds"] is False
    # nationkey 0 maps to segments {S1, S2} -> violated
    assert out["c_nationkey->c_mktsegment"]["holds"] is False


def test_ivm_join_delta_equals_full_recompute(spark):
    # keys chosen to hit all four delta terms: base/delta orders x
    # base/delta customers (mods 10 and 7)
    orders = spark.createDataFrame(
        [
            (1, 100, 10.0),    # base order, base cust
            (10, 100, 20.0),   # delta order, base cust
            (2, 700, 40.0),    # base order, delta cust
            (20, 700, 80.0),   # delta order, delta cust
        ],
        "o_orderkey long, o_custkey long, o_totalprice double",
    )
    customer = spark.createDataFrame(
        [(100, 0), (700, 1)], "c_custkey long, c_nationkey long"
    )
    nation = spark.createDataFrame(
        [(0, "ZERO"), (1, "ONE")], "n_nationkey long, n_name string"
    )
    out = {r["n_name"]: r for r in R.ivm_join_delta(orders, customer, nation).collect()}
    assert out["ZERO"]["n_orders"] == 2
    assert out["ZERO"]["revenue"] == 30.0
    assert out["ONE"]["n_orders"] == 2
    assert out["ONE"]["revenue"] == 120.0


def test_lateral_topk_is_per_customer_max(spark, sf_dir):
    out = REG.lateral_topk_orders(spark, sf_dir)
    per_cust = out.groupBy("c_custkey").agg(
        F.count("*").alias("k"), F.max("price").alias("top_price")
    )
    assert per_cust.filter(F.col("k") > 2).count() == 0
    from simple_vector_spark.sources.loaders import load_table

    orders = load_table(spark, sf_dir, "orders")
    true_max = orders.groupBy(F.col("o_custkey").alias("c_custkey")).agg(
        F.max(F.col("o_totalprice").cast("decimal(15,2)")).alias("mx")
    )
    joined = per_cust.join(true_max, "c_custkey")
    assert joined.filter(F.col("top_price") != F.col("mx")).count() == 0
