"""Wave-71 operators: hierarchy shares, Cohen's d, JS divergence."""

from __future__ import annotations

from pyspark.sql import functions as F

from simple_vector_spark.operators import relational as R
from simple_vector_spark.operators import text_analysis as T


def test_hierarchy_shares_sum_to_one(spark, sf_dir):
    from simple_vector_spark.sources.loaders import load_table

    out = R.revenue_share_hierarchy(
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "nation"),
        load_table(spark, sf_dir, "region"),
    ).collect()
    assert abs(sum(r["share_of_total"] for r in out) - 1.0) < 1e-3
    by_region: dict[str, float] = {}
    for r in out:
        by_region[r["r_name"]] = by_region.get(r["r_name"], 0.0) + r["share_of_region"]
    for share_sum in by_region.values():
        assert abs(share_sum - 1.0) < 1e-3


def test_cohens_d_known_shift(spark):
    # group A = {1..5}, group B = {11..15}: means differ by 10, both
    # have stddev sqrt(2.5) -> d = 10/sqrt(2.5)
    rows = [("R", float(v)) for v in range(1, 6)] * 10 + [
        ("N", float(v + 10)) for v in range(1, 6)
    ] * 10
    li = spark.createDataFrame(rows, "l_returnflag string, l_quantity double")
    r = R.cohens_d(li).collect()[0]
    assert abs(r["mean_a"] - 3.0) < 1e-9
    assert abs(r["mean_b"] - 13.0) < 1e-9
    import math

    # pooled stddev: SS = 100*2.0 per group wait — compute directly
    # values 1..5 x10: mean 3, SS = 10 * (4+1+0+1+4) = 100 each side
    sp = math.sqrt((100 + 100) / (100 - 2))
    assert abs(r["cohens_d"] - (-10.0 / sp)) < 1e-4


def test_js_divergence_identical_and_disjoint(spark):
    same = spark.createDataFrame(
        [(1, "a b c", "src1"), (2, "a b c", "src4")],
        "doc_id long, text string, source string",
    )
    r = T.js_divergence(same).collect()[0]
    assert r["js_divergence"] == 0.0
    disjoint = spark.createDataFrame(
        [(1, "a a b", "src1"), (2, "x y z", "src4")],
        "doc_id long, text string, source string",
    )
    r2 = T.js_divergence(disjoint).collect()[0]
    assert abs(r2["normalized"] - 1.0) < 1e-6  # fully disjoint = ln 2


def test_top_movers_picks_biggest_delta(spark):
    import datetime

    rows = []
    k = 0
    for cust, y1_rev, y2_rev in ((1, 100.0, 1000.0), (2, 500.0, 510.0), (3, 900.0, 100.0)):
        for year, rev in ((2023, y1_rev), (2024, y2_rev)):
            rows.append((k, cust, rev, datetime.datetime(year, 6, 1)))
            k += 1
    orders = spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, o_totalprice double, o_orderdate timestamp"
    )
    out = R.customers_top_movers(orders, k=2).collect()
    assert [r["o_custkey"] for r in out] == [1, 3]  # |900| then |-800|
    assert out[0]["delta"] == 900.0
    assert out[1]["delta"] == -800.0


def test_wilson_interval_brackets_rate_and_shrinks(spark):
    li = spark.createDataFrame(
        [(1, "R")] * 30 + [(1, "N")] * 70 + [(2, "R")] * 1 + [(2, "N")] * 1,
        "l_suppkey long, l_returnflag string",
    )
    sup = spark.createDataFrame([(1, 0), (2, 1)], "s_suppkey long, s_nationkey long")
    out = {r["s_nationkey"]: r for r in R.return_rate_wilson(li, sup).collect()}
    big, small = out[0], out[1]
    assert big["wilson_lo"] < big["rate"] < big["wilson_hi"]
    # small n -> much wider interval
    assert (small["wilson_hi"] - small["wilson_lo"]) > (
        big["wilson_hi"] - big["wilson_lo"]
    )
    # Wilson stays inside [0, 1] even at n=2
    assert 0.0 <= small["wilson_lo"] and small["wilson_hi"] <= 1.0
