"""Wave-9 TPC-H shapes (Q6/Q8/Q11/Q12/Q15/Q17/Q20) on hand-computed
micro-fixtures: boundary semantics (strict compares, DECIMAL
exactness, ties) that the sf oracle can't isolate."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from simple_vector_spark.operators import relational as R


def _ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


LI_SCHEMA = (
    "l_orderkey long, l_partkey long, l_suppkey long, l_quantity double, "
    "l_extendedprice double, l_discount double, l_shipdate timestamp"
)


def _li(spark, rows):
    return spark.createDataFrame(rows, LI_SCHEMA)


def test_forecast_revenue_change_bounds(spark):
    li = _li(
        spark,
        [
            # in: 100 * 0.05 = 5.00
            (1, 1, 1, 10.0, 100.0, 0.05, _ts("1996-06-01T00:00:00")),
            # in: 200 * 0.07 = 14.00 (inclusive upper bound)
            (2, 1, 1, 23.0, 200.0, 0.07, _ts("1996-12-31T00:00:00")),
            # out: discount below band
            (3, 1, 1, 10.0, 100.0, 0.04, _ts("1996-06-01T00:00:00")),
            # out: quantity not < 24
            (4, 1, 1, 24.0, 100.0, 0.06, _ts("1996-06-01T00:00:00")),
            # out: shipped 1997
            (5, 1, 1, 10.0, 100.0, 0.06, _ts("1997-01-01T00:00:00")),
        ],
    )
    [row] = R.forecast_revenue_change(li).collect()
    assert row.revenue == 19.0


def test_value_concentration_mean_threshold(spark):
    # revenues 10, 20, 60 -> total 90, n=3, mean 30: only part 3 passes
    # (strict >; part 2 at 20*3=60 < 90, part at exactly mean would fail).
    li = _li(
        spark,
        [
            (1, 1, 1, 1.0, 10.0, 0.0, _ts("1996-01-01T00:00:00")),
            (2, 2, 1, 1.0, 20.0, 0.0, _ts("1996-01-01T00:00:00")),
            (3, 3, 1, 1.0, 60.0, 0.0, _ts("1996-01-01T00:00:00")),
        ],
    )
    got = {r.partkey: r.value for r in R.value_concentration(li).collect()}
    assert got == {3: 60.0}


def test_value_concentration_exactly_mean_excluded(spark):
    li = _li(
        spark,
        [
            (1, 1, 1, 1.0, 30.0, 0.0, _ts("1996-01-01T00:00:00")),
            (2, 2, 1, 1.0, 30.0, 0.0, _ts("1996-01-01T00:00:00")),
        ],
    )
    assert R.value_concentration(li).count() == 0


def test_priority_line_counts(spark):
    li = _li(
        spark,
        [
            (1, 1, 1, 1.0, 1.0, 0.0, _ts("1996-02-01T00:00:00")),
            (2, 1, 1, 1.0, 1.0, 0.0, _ts("1996-03-01T00:00:00")),
            (3, 1, 1, 1.0, 1.0, 0.0, _ts("1995-12-31T00:00:00")),  # out of window
        ],
    ).withColumn("l_linestatus", F.lit("F"))
    orders = spark.createDataFrame(
        [(1, "1-URGENT"), (2, "5-LOW"), (3, "1-URGENT")],
        "o_orderkey long, o_orderpriority string",
    )
    [row] = R.priority_line_counts(li, orders).collect()
    assert (row.l_linestatus, row.high_line_count, row.low_line_count) == ("F", 1, 1)


def test_top_revenue_supplier_keeps_ties(spark):
    li = _li(
        spark,
        [
            (1, 1, 10, 1.0, 100.0, 0.0, _ts("1996-02-01T00:00:00")),
            (2, 1, 20, 1.0, 100.0, 0.0, _ts("1996-02-01T00:00:00")),
            (3, 1, 30, 1.0, 50.0, 0.0, _ts("1996-02-01T00:00:00")),
            (4, 1, 10, 1.0, 999.0, 0.0, _ts("1996-05-01T00:00:00")),  # outside Q1
        ],
    )
    supplier = spark.createDataFrame(
        [(10, "s10"), (20, "s20"), (30, "s30")], "s_suppkey long, s_name string"
    )
    got = sorted((r.suppkey, r.total_rev) for r in R.top_revenue_supplier(li, supplier).collect())
    assert got == [(10, 100.0), (20, 100.0)]


def test_small_quantity_revenue_strict_compare(spark):
    # part 1: quantities 1, 9 -> sum 10, cnt 2. Threshold: qty*10 < 10,
    # so qty=1 line fails (10 == 10 not <)... use qty 0.5: 0.5*10=5 < 10 passes.
    li = _li(
        spark,
        [
            (1, 1, 1, 0.5, 70.0, 0.0, _ts("1996-01-01T00:00:00")),
            (2, 1, 1, 1.0, 999.0, 0.0, _ts("1996-01-01T00:00:00")),  # 1*10 == 10: excluded
            (3, 1, 1, 8.5, 999.0, 0.0, _ts("1996-01-01T00:00:00")),
        ],
    )
    part = spark.createDataFrame([(1, "PROMO")], "p_partkey long, p_type string")
    [row] = R.small_quantity_revenue(li, part).collect()
    assert row.avg_yearly == 10.0  # 70 / 7


def test_promo_heavy_suppliers_threshold_and_nation(spark):
    li = _li(
        spark,
        [
            (1, 1, 10, 401.0, 1.0, 0.0, _ts("1996-02-01T00:00:00")),  # qualifies
            (2, 1, 20, 400.0, 1.0, 0.0, _ts("1996-02-01T00:00:00")),  # == 400: no
            (3, 2, 30, 999.0, 1.0, 0.0, _ts("1996-02-01T00:00:00")),  # non-promo part
            (4, 1, 40, 500.0, 1.0, 0.0, _ts("1995-02-01T00:00:00")),  # outside 1996
            (5, 1, 50, 500.0, 1.0, 0.0, _ts("1996-02-01T00:00:00")),  # wrong nation
        ],
    )
    part = spark.createDataFrame(
        [(1, "PROMO"), (2, "LARGE")], "p_partkey long, p_type string"
    )
    supplier = spark.createDataFrame(
        [(10, "s10", 3), (20, "s20", 3), (30, "s30", 3), (40, "s40", 3), (50, "s50", 9)],
        "s_suppkey long, s_name string, s_nationkey long",
    )
    nation = spark.createDataFrame(
        [(3, "NATION_3"), (9, "NATION_9")], "n_nationkey long, n_name string"
    )
    got = [(r.suppkey, r.nation) for r in R.promo_heavy_suppliers(li, part, supplier, nation).collect()]
    assert got == [(10, "NATION_3")]


def test_nation_market_share_conditional_ratio(spark):
    li = _li(
        spark,
        [
            (1, 1, 10, 1.0, 100.0, 0.0, _ts("1996-02-01T00:00:00")),
            (1, 1, 20, 1.0, 300.0, 0.0, _ts("1996-02-01T00:00:00")),
        ],
    )
    orders = spark.createDataFrame(
        [(1, 5, _ts("1996-03-01T00:00:00"))],
        "o_orderkey long, o_custkey long, o_orderdate timestamp",
    )
    customer = spark.createDataFrame([(5, 7)], "c_custkey long, c_nationkey long")
    supplier = spark.createDataFrame(
        [(10, 3), (20, 9)], "s_suppkey long, s_nationkey long"
    )
    part = spark.createDataFrame([(1, "PROMO")], "p_partkey long, p_type string")
    nation = spark.createDataFrame(
        [(3, "NATION_3", 0), (9, "NATION_9", 0), (7, "NATION_7", 1)],
        "n_nationkey long, n_name string, n_regionkey long",
    )
    region = spark.createDataFrame(
        [(1, "ASIA"), (0, "EUROPE")], "r_regionkey long, r_name string"
    )
    [row] = R.nation_market_share(
        li, orders, customer, supplier, part, nation, region
    ).collect()
    assert (row.o_year, row.mkt_share) == (1996, 0.25)


# --- wave 11: funnel + cohort retention ---------------------------------
from simple_vector_spark.operators import events as EV  # noqa: E402


def test_funnel_strictly_after(spark):
    ev = spark.createDataFrame(
        [
            # u1 completes the funnel in order
            (1, _ts("2024-01-01T10:00:00"), 1, "view"),
            (2, _ts("2024-01-01T11:00:00"), 1, "click"),
            (3, _ts("2024-01-01T12:00:00"), 1, "purchase"),
            # u2: click BEFORE first view -> not counted at click step
            (4, _ts("2024-01-02T09:00:00"), 2, "click"),
            (5, _ts("2024-01-02T10:00:00"), 2, "view"),
            (6, _ts("2024-01-02T11:00:00"), 2, "purchase"),  # no click-after -> drop
            # u3: view only
            (7, _ts("2024-01-03T10:00:00"), 3, "view"),
        ],
        "event_id long, ts timestamp, user_id long, event_type string",
    )
    [row] = EV.funnel_steps(ev).collect()
    assert (row.n_view, row.n_click_after, row.n_purchase_after) == (3, 1, 1)


def test_funnel_equal_ts_not_counted(spark):
    ev = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T10:00:00"), 1, "view"),
            (2, _ts("2024-01-01T10:00:00"), 1, "click"),  # same instant: strict >
        ],
        "event_id long, ts timestamp, user_id long, event_type string",
    )
    [row] = EV.funnel_steps(ev).collect()
    assert (row.n_view, row.n_click_after) == (1, 0)


def test_cohort_retention_offsets(spark):
    ev = spark.createDataFrame(
        [
            # u1 first active Mon 2024-01-01 week, returns 2 weeks later
            (1, _ts("2024-01-02T10:00:00"), 1, "view"),
            (2, _ts("2024-01-16T10:00:00"), 1, "view"),
            # u2 same cohort, week 0 only (two events, one distinct week)
            (3, _ts("2024-01-03T10:00:00"), 2, "view"),
            (4, _ts("2024-01-04T10:00:00"), 2, "view"),
        ],
        "event_id long, ts timestamp, user_id long, event_type string",
    )
    got = {(str(r.cohort_week), r.week_offset): r.n_users
           for r in EV.cohort_retention(ev).collect()}
    assert got == {("2024-01-01", 0): 2, ("2024-01-01", 2): 1}


# --- wave 13: set ops + rank-distribution windows ------------------------
def _orders(spark, rows):
    return spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, o_totalprice double, "
              "o_orderdate timestamp, o_orderpriority string"
    )


def test_retained_and_churned_partition_customers(spark):
    od = _orders(
        spark,
        [
            (1, 10, 5.0, _ts("1995-03-01T00:00:00"), "5-LOW"),
            (2, 10, 5.0, _ts("1996-03-01T00:00:00"), "5-LOW"),  # retained
            (3, 20, 5.0, _ts("1995-06-01T00:00:00"), "5-LOW"),  # churned
            (4, 20, 5.0, _ts("1995-07-01T00:00:00"), "5-LOW"),  # dup year: set semantics
            (5, 30, 5.0, _ts("1996-01-01T00:00:00"), "5-LOW"),  # new in 96: neither
        ],
    )
    assert [r.custkey for r in R.retained_customers(od).collect()] == [10]
    assert [r.custkey for r in R.churned_customers(od).collect()] == [20]


def test_order_value_distribution_ties(spark):
    od = _orders(
        spark,
        [
            (1, 1, 10.0, _ts("1996-01-01T00:00:00"), "5-LOW"),
            (2, 1, 20.0, _ts("1996-01-02T00:00:00"), "5-LOW"),
            (3, 1, 20.0, _ts("1996-01-03T00:00:00"), "5-LOW"),  # tie with 2
            (4, 1, 30.0, _ts("1996-01-04T00:00:00"), "5-LOW"),
            (5, 1, 99.0, _ts("1995-01-04T00:00:00"), "5-LOW"),  # filtered out
        ],
    )
    got = {r.orderkey: (r.pct_rank, r.cume) for r in
           R.order_value_distribution(od).collect()}
    # ties share percent_rank ((rank-1)/(n-1)) and take greatest cume_dist
    assert got == {1: (0.0, 0.25), 2: (round(1/3, 6), 0.75),
                   3: (round(1/3, 6), 0.75), 4: (1.0, 1.0)}
