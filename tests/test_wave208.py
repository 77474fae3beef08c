"""Wave-208 operator: trade-graph link prediction."""

from __future__ import annotations

import math

from simple_vector_spark.operators import relational as R


def test_link_prediction_square_graph(spark):
    # major lanes form the 4-cycle 0-1, 0-2, 1-3, 2-3: the two
    # diagonals (0,3) and (1,2) are the only predicted links, each
    # with two common neighbors of degree 2
    nation = spark.createDataFrame(
        [(i, f"N{i}") for i in range(4)], "n_nationkey long, n_name string"
    )
    # supplier nation -> customer nation flows with multiplicities
    flows = [(0, 1, 10), (0, 2, 9), (3, 1, 5), (3, 2, 4)]
    suppliers, customers, orders, lineitem = [], [], [], []
    ok = 0
    for sidx, (su, cu, wgt) in enumerate(flows):
        skey, ckey = 100 + sidx, 200 + sidx
        suppliers.append((skey, su))
        customers.append((ckey, cu))
        orders.append((1000 + sidx, ckey))
        for k in range(wgt):
            lineitem.append((1000 + sidx, skey, k))
    out = R.trade_link_prediction(
        spark.createDataFrame(lineitem, "l_orderkey long, l_suppkey long, l_linenumber int"),
        spark.createDataFrame(orders, "o_orderkey long, o_custkey long"),
        spark.createDataFrame(customers, "c_custkey long, c_nationkey long"),
        spark.createDataFrame(suppliers, "s_suppkey long, s_nationkey long"),
        nation,
    ).collect()
    pairs = {(r["nation_a"], r["nation_b"]): r for r in out}
    assert set(pairs) == {("N0", "N3"), ("N1", "N2")}
    for r in pairs.values():
        assert r["common"] == 2
        assert r["jaccard"] == 1.0
        assert abs(r["adamic_adar"] - 2.0 / math.log(2.0)) < 1e-5
