"""Relational extension operators: as-of join semantics, decimal money
math, window top-k, set ops."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from simple_vector_spark.operators import relational as R


def _ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


def test_asof_join_picks_latest_at_or_before(spark):
    left = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T10:00:00"), 100),
            (1, _ts("2024-01-01T12:00:00"), 101),
            (2, _ts("2024-01-01T09:00:00"), 200),
        ],
        "user_id long, ts timestamp, event_id long",
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T09:30:00"), 7, 1.5),
            (1, _ts("2024-01-01T11:00:00"), 8, 2.5),
            (2, _ts("2024-01-01T09:00:00"), 9, 3.5),  # exact tie: >= matches
        ],
        "user_id long, ts timestamp, cp_event_id long, cp_value double",
    )
    out = R.asof_join(left, right, ["user_id"], "ts", ["cp_event_id", "cp_value"])
    got = {r.event_id: (r.cp_event_id, r.cp_value) for r in out.collect()}
    assert got == {100: (7, 1.5), 101: (8, 2.5), 200: (9, 3.5)}


def test_asof_join_null_before_first_checkpoint(spark):
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01T08:00:00"), 1)],
        "user_id long, ts timestamp, event_id long",
    )
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01T09:00:00"), 7, 1.0)],
        "user_id long, ts timestamp, cp_event_id long, cp_value double",
    )
    out = R.asof_join(left, right, ["user_id"], "ts", ["cp_event_id", "cp_value"])
    row = out.collect()[0]
    assert row.cp_event_id is None and row.cp_value is None


def test_pricing_summary_exact_decimal(spark):
    li = spark.createDataFrame(
        [
            (1, 10.0, 100.0, 0.1, 0.05, "A", "F", _ts("1998-01-01T00:00:00")),
            (2, 20.0, 200.0, 0.2, 0.10, "A", "F", _ts("1998-01-02T00:00:00")),
            (3, 5.0, 50.0, 0.0, 0.00, "R", "O", _ts("1999-01-01T00:00:00")),  # cut off
        ],
        "l_orderkey long, l_quantity double, l_extendedprice double, "
        "l_discount double, l_tax double, l_returnflag string, "
        "l_linestatus string, l_shipdate timestamp",
    )
    out = {(r.l_returnflag, r.l_linestatus): r for r in R.pricing_summary(li).collect()}
    af = out[("A", "F")]
    assert af.count_order == 2
    assert af.sum_qty == 30.0
    assert af.sum_base_price == 300.0
    # 100*0.9 + 200*0.8 = 250 exactly (decimal, no float drift)
    assert af.sum_disc_price == 250.0
    # 90*1.05 + 160*1.1 = 94.5 + 176 = 270.5
    assert af.sum_charge == 270.5
    assert ("R", "O") not in out


def test_top_orders_per_customer_plan_uses_group_limit(spark, sf_dir):
    from simple_vector_spark.sources.loaders import load_table

    orders = load_table(spark, sf_dir, "orders")
    out = R.top_orders_per_customer(orders, 3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # Spark >=3.5 inserts WindowGroupLimit: partial top-k before shuffle
    assert "WindowGroupLimit" in plan


def test_set_ops(spark):
    cust = spark.createDataFrame([(i,) for i in range(5)], "c_custkey long")
    orders = spark.createDataFrame([(1,), (1,), (3,)], "o_custkey long")
    without = R.customers_without_orders(cust, orders)
    withord = R.customers_with_orders(cust, orders)
    assert sorted(r.custkey for r in without.collect()) == [0, 2, 4]
    assert sorted(r.custkey for r in withord.collect()) == [1, 3]


def test_semi_anti_partition_orders(spark, sf_dir):
    """Every order is in exactly one of EXISTS / NOT EXISTS — the
    semi+anti pair partitions the orders table."""
    from simple_vector_spark.operators import relational as R
    from simple_vector_spark.registry import load_table

    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    semi = R.orders_with_returns(orders, li)
    anti = R.orders_without_returns(orders, li)
    both = {
        r.o_orderpriority: r.total
        for r in semi.unionByName(anti)
        .groupBy("o_orderpriority")
        .agg(F.sum("n_orders").alias("total"))
        .collect()
    }
    expect = {
        r.o_orderpriority: r.n
        for r in orders.groupBy("o_orderpriority").agg(F.count("*").alias("n")).collect()
    }
    assert both == expect


def test_above_avg_excludes_singletons(spark):
    """A customer with one order can never beat their own average
    (strict >), and within a group only above-average orders survive."""
    from simple_vector_spark.operators import relational as R

    orders = spark.createDataFrame(
        [(1, 100, 10.0), (2, 100, 20.0), (3, 100, 30.0), (4, 200, 55.5)],
        "o_orderkey long, o_custkey long, o_totalprice double",
    )
    got = sorted(r.o_orderkey for r in R.orders_above_customer_avg(orders).collect())
    assert got == [3]


def test_rolling_range_avg_time_frame_not_row_frame(spark):
    """Events at +0min, +30min, +2h: the third event's trailing-hour
    window holds only itself — a 2-row ROWS frame would wrongly
    include the +30min event."""
    from datetime import datetime

    from simple_vector_spark.operators import events as E

    t0 = datetime(2024, 1, 1, 12, 0, 0)
    ev = spark.createDataFrame(
        [
            (1, 7, t0.replace(minute=0), 1.0),
            (2, 7, t0.replace(minute=30), 2.0),
            (3, 7, t0.replace(hour=14), 4.0),
        ],
        "event_id long, user_id long, ts timestamp, value double",
    )
    got = {r.event_id: r.trail_avg for r in E.rolling_range_avg(ev).collect()}
    assert got == {1: 1.0, 2: 1.5, 3: 4.0}
