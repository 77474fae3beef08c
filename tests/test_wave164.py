"""Wave-164 operators: tie-averaged rank statistics (Spearman rho,
Kruskal-Wallis H) on the scale-safe avg_rank2 primitive."""

from __future__ import annotations

from pyspark.sql import functions as F

from simple_vector_spark.operators import relational as R
from simple_vector_spark.operators.ranking import avg_rank2


def _lineitem(spark, qp):
    rows = [(i, 1, float(q), float(p)) for i, (q, p) in enumerate(qp)]
    return spark.createDataFrame(
        rows,
        "l_orderkey long, l_linenumber int, l_quantity double,"
        " l_extendedprice double",
    )


def _orders(spark, gv):
    rows = [(i, g, float(v)) for i, (g, v) in enumerate(gv)]
    return spark.createDataFrame(
        rows, "o_orderkey long, o_orderpriority string, o_totalprice double"
    )


def test_avg_rank2_tie_averaging(spark):
    # values 10, 20, 20, 30 -> fractional ranks 1, 2.5, 2.5, 4
    df = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, 20.0), (4, 30.0)], "id long, v double"
    )
    out = {
        r["v"]: r["a2"]
        for r in avg_rank2(df, "v", [F.col("id").asc()], "a2").collect()
    }
    assert out == {10.0: 2, 20.0: 5, 30.0: 8}


def test_avg_rank2_survives_duplicate_tiebreak(spark):
    # avg2 depends only on the value: identical (v, id) rows still get
    # the correct tie-averaged rank (the fixture's row key is not
    # unique, so this is a load-bearing property).
    df = spark.createDataFrame(
        [(1, 5.0), (1, 5.0), (2, 7.0)], "id long, v double"
    )
    out = [r["a2"] for r in avg_rank2(df, "v", [F.col("id").asc()], "a2").collect()]
    assert sorted(out) == [3, 3, 6]  # avg ranks 1.5, 1.5, 3


def test_spearman_perfect_monotone(spark):
    li = _lineitem(spark, [(1, 10), (2, 20), (3, 30), (4, 40)])
    row = R.spearman_quantity_price(li).collect()[0]
    assert row["n"] == 4
    assert row["spearman_rho"] == 1.0
    assert row["pearson_r"] == 1.0


def test_spearman_anti_monotone_and_outlier_robust(spark):
    # monotone decreasing but convex: rho pins at -1, |pearson| < 1
    li = _lineitem(spark, [(1, 1000), (2, 90), (3, 80), (4, 70)])
    row = R.spearman_quantity_price(li).collect()[0]
    assert row["spearman_rho"] == -1.0
    assert -1.0 < row["pearson_r"] < -0.7


def test_spearman_with_ties_hand_computed(spark):
    # q = [1,1,2] -> avg2 = [3,3,6]; p = [10,20,30] -> avg2 = [2,4,6]
    # rho = 18 / (sqrt(18)*sqrt(24)) = 0.866025
    li = _lineitem(spark, [(1, 10), (1, 20), (2, 30)])
    row = R.spearman_quantity_price(li).collect()[0]
    assert abs(row["spearman_rho"] - 0.866025) < 1e-6


def test_kruskal_wallis_textbook_no_ties(spark):
    # g1 = {1,2,3}, g2 = {4,5,6}: H = 12/42 * (12 + 75) - 21 = 27/7
    orders = _orders(
        spark,
        [("A", 1), ("A", 2), ("A", 3), ("B", 4), ("B", 5), ("B", 6)],
    )
    rows = R.kruskal_wallis_priority(orders).collect()
    assert len(rows) == 2
    by_g = {r["priority"]: r for r in rows}
    assert by_g["A"]["mean_rank"] == 2.0 and by_g["B"]["mean_rank"] == 5.0
    for r in rows:
        assert abs(r["h_stat"] - 27.0 / 7.0) < 1e-5
        assert r["h_tie_corrected"] == r["h_stat"]  # no ties
        assert r["df"] == 1 and r["n_total"] == 6


def test_kruskal_wallis_identical_groups_h_zero(spark):
    orders = _orders(
        spark, [("A", 10), ("A", 20), ("B", 10), ("B", 20)]
    )
    row = R.kruskal_wallis_priority(orders).collect()[0]
    assert abs(row["h_stat"]) < 1e-6
    # all-tied pairs: tie correction inflates but stays finite
    assert abs(row["h_tie_corrected"]) < 1e-5
