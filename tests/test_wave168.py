"""Wave-168 operators: MAD modified z-scores, Brown-Forsythe test."""

from __future__ import annotations

from simple_vector_spark.operators import relational as R


def _orders(spark, gv):
    rows = [(i, g, float(v)) for i, (g, v) in enumerate(gv)]
    return spark.createDataFrame(
        rows, "o_orderkey long, o_orderpriority string, o_totalprice double"
    )


def test_mad_flags_extreme_value(spark):
    # A: median 3.5, MAD 1.5 -> x=100 has |z| ~ 43 (flagged), x=1 ~ 1.1
    orders = _orders(spark, [("A", v) for v in (1, 2, 3, 4, 5, 100)])
    rows = R.robust_price_outliers(orders, topk=10).collect()
    top = rows[0]
    assert float(top["o_totalprice"]) == 100.0
    assert top["is_outlier"] == 1
    assert abs(top["robust_z"] - 0.6745 * 96.5 / 1.5) < 1e-3
    flagged = [r for r in rows if r["is_outlier"] == 1]
    assert len(flagged) == 1


def test_mad_zero_mad_rows_dropped_not_errored(spark):
    # constant group -> MAD 0 -> robust_z NULL -> excluded, no ANSI /0
    orders = _orders(spark, [("A", 5), ("A", 5), ("A", 5)])
    assert R.robust_price_outliers(orders).count() == 0


def test_brown_forsythe_hand_computed(spark):
    # A = {0,10,20}, B = {9,10,11}: same medians, very different spread
    # SSB = 54, SSW = 202/3, F = 54 / ((202/3)/4) = 648/202
    orders = _orders(
        spark, [("A", 0), ("A", 10), ("A", 20), ("B", 9), ("B", 10), ("B", 11)]
    )
    rows = R.brown_forsythe_priority(orders).collect()
    by_g = {r["priority"]: r for r in rows}
    assert by_g["A"]["group_median"] == 10.0
    assert abs(by_g["A"]["mean_absdev"] - 20.0 / 3.0) < 1e-5
    for r in rows:
        assert r["df1"] == 1 and r["df2"] == 4
        assert abs(r["f_stat"] - 648.0 / 202.0) < 1e-4


def test_brown_forsythe_equal_spreads_f_zero(spark):
    orders = _orders(
        spark,
        [("A", 0), ("A", 10), ("A", 20), ("B", 100), ("B", 110), ("B", 120)],
    )
    row = R.brown_forsythe_priority(orders).collect()[0]
    assert abs(row["f_stat"]) < 1e-9
