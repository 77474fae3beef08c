"""Wave-3 relational operators: Q13/Q18/Q19/Q22 shapes, cheapest
supplier window, decimal-exact corr, inter-arrival gaps, bigrams."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from simple_vector_spark.operators import events as E
from simple_vector_spark.operators import relational as R
from simple_vector_spark.operators import text_analysis as T


def _ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


def test_order_count_distribution_includes_zero(spark):
    customer = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "c_custkey long, c_name string"
    )
    orders = spark.createDataFrame(
        [(10, 1), (11, 1), (12, 2)], "o_orderkey long, o_custkey long"
    )
    got = {r.c_count: r.custdist for r in R.order_count_distribution(customer, orders).collect()}
    assert got == {2: 1, 1: 1, 0: 1}


def test_large_orders_threshold_is_exclusive(spark):
    customer = spark.createDataFrame([(1, "a")], "c_custkey long, c_name string")
    orders = spark.createDataFrame(
        [(10, 1, _ts("1996-01-01T00:00:00"), 5.0), (11, 1, _ts("1996-01-02T00:00:00"), 6.0)],
        "o_orderkey long, o_custkey long, o_orderdate timestamp, o_totalprice double",
    )
    lineitem = spark.createDataFrame(
        [(10, 200.0), (10, 100.0), (11, 301.0)], "l_orderkey long, l_quantity double"
    )
    rows = R.large_orders(customer, orders, lineitem, qty_threshold=300).collect()
    assert {r.orderkey for r in rows} == {11}  # 300.0 exactly is excluded
    assert rows[0].sum_qty == 301.0


def test_disjunctive_bands_are_disjoint_filters(spark):
    part = spark.createDataFrame(
        [(1, "Brand#12", 5), (2, "Brand#23", 15), (3, "Brand#99", 1)],
        "p_partkey long, p_brand string, p_size int",
    )
    lineitem = spark.createDataFrame(
        [
            (1, 5.0, 100.0, 0.0),   # band 1 hit
            (1, 50.0, 100.0, 0.0),  # qty outside band 1
            (2, 15.0, 200.0, 0.5),  # band 2 hit
            (3, 5.0, 999.0, 0.0),   # brand matches nothing
        ],
        "l_partkey long, l_quantity double, l_extendedprice double, l_discount double",
    )
    row = R.disjunctive_promo_revenue(lineitem, part).collect()[0]
    assert row.n_lines == 2
    assert row.revenue == 200.0  # 100*1.0 + 200*0.5


def test_idle_rich_customers_recency_and_balance(spark):
    customer = spark.createDataFrame(
        [(1, 0, 1000.0), (2, 0, 10.0), (3, 1, 1000.0)],
        "c_custkey long, c_nationkey int, c_acctbal double",
    )
    orders = spark.createDataFrame(
        [(10, 1, _ts("2001-05-01T00:00:00")), (11, 3, _ts("1999-01-01T00:00:00"))],
        "o_orderkey long, o_custkey long, o_orderdate timestamp",
    )
    # avg balance = 670; rich = {1, 3}; 1 has a recent order -> only 3
    got = {r.nationkey: (r.numcust, r.totacctbal) for r in
           R.idle_rich_customers(customer, orders).collect()}
    assert got == {1: (1, 1000.0)}


def test_cheapest_supplier_tiebreak_by_suppkey(spark):
    lineitem = spark.createDataFrame(
        [
            (1, 20, 10.0, 1.0),  # part 1: supplier 20 and 10 tie at unit cost 10
            (1, 10, 20.0, 2.0),
            (2, 30, 5.0, 1.0),
        ],
        "l_partkey long, l_suppkey long, l_extendedprice double, l_quantity double",
    )
    supplier = spark.createDataFrame(
        [(10, "s10"), (20, "s20"), (30, "s30")], "s_suppkey long, s_name string"
    )
    got = {r.suppkey: r.n_parts_won for r in
           R.cheapest_supplier_parts(lineitem, supplier).collect()}
    assert got == {10: 1, 30: 1}  # supplier 10 wins the tie, 20 absent


def test_flag_corr_matches_numpy(spark):
    import numpy as np

    qty = [1.0, 2.0, 3.0, 4.0, 5.0]
    price = [2.0, 4.1, 5.9, 8.2, 9.8]
    lineitem = spark.createDataFrame(
        [("A", q, p) for q, p in zip(qty, price)],
        "l_returnflag string, l_quantity double, l_extendedprice double",
    )
    row = R.flag_corr_stats(lineitem).collect()[0]
    assert abs(row.corr_qty_price - np.corrcoef(qty, price)[0, 1]) < 1e-6
    assert abs(row.stddev_qty - np.std(qty, ddof=1)) < 1e-6


def test_interarrival_gaps_per_user_not_global(spark):
    events = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T00:00:00"), 1, "a"),
            (2, _ts("2024-01-01T00:00:10"), 1, "a"),
            (3, _ts("2024-01-01T00:00:05"), 2, "a"),  # other user: no gap row
        ],
        "event_id long, ts timestamp, user_id long, event_type string",
    )
    rows = E.interarrival_stats(events).collect()
    assert len(rows) == 1
    assert rows[0].n_gaps == 1 and rows[0].avg_gap_sec == 10.0


def test_bigrams_counts_and_short_docs(spark):
    docs = spark.createDataFrame(
        [("a b a b",), ("a b",), ("solo",), ("",)], "text string"
    )
    got = {r.bigram: r.n for r in T.bigram_topn(docs, 10).collect()}
    assert got == {"a b": 3, "b a": 1}
