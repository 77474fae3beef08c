"""Wave-157 operator: trade-graph modularity."""

from __future__ import annotations

from decimal import Decimal

from simple_vector_spark.operators import relational as R


def _tables(spark, edges, nation_region):
    """edges: list of (src_nation, dst_nation, weight) -> synthesized
    lineitem/orders/customer/supplier tables producing exactly those
    edge weights (one customer+supplier per nation, w lineitems)."""
    nations = sorted(nation_region)
    nation = spark.createDataFrame(
        [(n, f"N{n}", r) for n, r in nation_region.items()],
        "n_nationkey long, n_name string, n_regionkey long",
    )
    customer = spark.createDataFrame(
        [(n, n) for n in nations], "c_custkey long, c_nationkey long"
    )
    supplier = spark.createDataFrame(
        [(n, n) for n in nations], "s_suppkey long, s_nationkey long"
    )
    orows, lrows, ok = [], [], 0
    for src, dst, w in edges:
        orows.append((ok, dst))
        for i in range(w):
            lrows.append((ok, src, i + 1, Decimal("1.00")))
        ok += 1
    orders = spark.createDataFrame(orows, "o_orderkey long, o_custkey long")
    lineitem = spark.createDataFrame(
        lrows,
        "l_orderkey long, l_suppkey long, l_linenumber long, l_quantity decimal(18,2)",
    )
    return lineitem, orders, customer, supplier, nation


def test_modularity_perfect_communities(spark):
    # two regions, all trade intra-region and balanced -> Q = 0.5
    # (classic two-block value: 1 - 2*(1/2)^2).
    edges = [(0, 1, 10), (1, 0, 10), (2, 3, 10), (3, 2, 10)]
    regions = {0: 0, 1: 0, 2: 1, 3: 1}
    out = {r["region_key"]: r for r in
           R.nation_trade_modularity(*_tables(spark, edges, regions)).collect()}
    assert abs(out[-1]["q_contrib"] - 0.5) < 1e-9
    assert out[0]["w_in"] == 20 and out[1]["w_in"] == 20
    assert out[-1]["w_in"] == 40


def test_modularity_anti_communities_negative(spark):
    # ALL trade crosses regions -> w_in = 0 per region, Q < 0.
    edges = [(0, 2, 5), (2, 0, 5), (1, 3, 5), (3, 1, 5)]
    regions = {0: 0, 1: 0, 2: 1, 3: 1}
    out = {r["region_key"]: r for r in
           R.nation_trade_modularity(*_tables(spark, edges, regions)).collect()}
    assert out[0]["w_in"] == 0 and out[1]["w_in"] == 0
    assert out[-1]["q_contrib"] < 0


def test_modularity_single_community_zero(spark):
    # one region holding everything: Q = W/W - (W*W)/W^2 = 0.
    edges = [(0, 1, 7), (1, 0, 3)]
    regions = {0: 0, 1: 0}
    out = {r["region_key"]: r for r in
           R.nation_trade_modularity(*_tables(spark, edges, regions)).collect()}
    assert abs(out[-1]["q_contrib"]) < 1e-9
