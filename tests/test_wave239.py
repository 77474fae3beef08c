"""Wave 239: Kendall tau-b and trade-graph closeness centrality."""

from __future__ import annotations

import datetime as dt

from simple_vector_spark.operators import relational as R


def _orders(spark, month_counts_prices):
    rows, ok = [], 0
    for (month, n, price) in month_counts_prices:
        for _ in range(n):
            rows.append((ok, dt.date(2024, month, 10), price)); ok += 1
    return spark.createDataFrame(
        rows, "o_orderkey long, o_orderdate date, o_totalprice double"
    )


def test_kendall_perfect_concordance(spark):
    # count and revenue both strictly increase month over month
    out = R.kendall_tau_monthly(
        _orders(spark, [(m, m, 100.0) for m in range(1, 7)])
    ).collect()[0]
    assert out["n_months"] == 6
    assert out["tau_b"] == 1.0
    assert out["discordant"] == 0
    assert out["p_value"] < 0.05


def test_kendall_perfect_discordance(spark):
    # count increases while total revenue k*(1200/k - 100) decreases
    out = R.kendall_tau_monthly(
        _orders(spark, [(k, k, 1200.0 / k - 100.0) for k in range(1, 5)])
    ).collect()[0]
    assert out["tau_b"] == -1.0
    assert out["concordant"] == 0


def test_kendall_ties_shrink_denominator(spark):
    # months 1,2 share the same count (tie in x) but differ in revenue
    out = R.kendall_tau_monthly(
        _orders(spark, [(1, 2, 50.0), (2, 2, 60.0), (3, 3, 70.0)])
    ).collect()[0]
    assert out["ties_x"] == 1
    # remaining pairs all concordant: tau_b = (2-0)/sqrt((3-1)*(3-0))
    assert abs(out["tau_b"] - round(2.0 / (2.0 * 3.0) ** 0.5, 6)) < 1e-9


def _graph(spark, edges):
    """Build the 4 tables so the directed (u, v) edges exist with one
    lineitem each (every nation has <=3 partners, so top-3 keeps all)."""
    li, od, cu, su = [], [], {}, {}
    for i, (u, v) in enumerate(edges):
        li.append((i, 1000 + u))
        od.append((i, 2000 + v))
        cu[2000 + v] = v
        su[1000 + u] = u
    return (
        spark.createDataFrame(li, "l_orderkey long, l_suppkey long"),
        spark.createDataFrame(od, "o_orderkey long, o_custkey long"),
        spark.createDataFrame(
            list(cu.items()), "c_custkey long, c_nationkey long"
        ),
        spark.createDataFrame(
            list(su.items()), "s_suppkey long, s_nationkey long"
        ),
    )


def test_closeness_on_path_graph(spark):
    # undirected path 0-1-2-3
    out = {
        r["nation_key"]: r
        for r in R.trade_closeness(
            *_graph(spark, [(0, 1), (1, 2), (2, 3)])
        ).collect()
    }
    assert out[0]["n_reachable"] == 3
    assert abs(out[0]["harmonic_centrality"] - round(1 + 0.5 + 1 / 3, 6)) < 1e-6
    assert out[0]["closeness"] == 0.5  # 3 reachable / distance sum 6
    assert out[1]["closeness"] == 0.75  # distances 1,1,2
    assert out[1]["harmonic_centrality"] == 2.5


def test_closeness_disconnected_components(spark):
    # two disjoint edges: each node reaches only its partner
    out = {
        r["nation_key"]: r
        for r in R.trade_closeness(
            *_graph(spark, [(0, 1), (2, 3)])
        ).collect()
    }
    for k in (0, 1, 2, 3):
        assert out[k]["n_reachable"] == 1
        assert out[k]["closeness"] == 1.0
        assert out[k]["harmonic_centrality"] == 1.0
