"""Wave-118/119 operators: p-chart, trade balance."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from simple_vector_spark.operators import events as E
from simple_vector_spark.operators import relational as R
from simple_vector_spark.sources.loaders import load_table


def test_pchart_flags_planted_broken_day(spark):
    t0 = datetime.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for d in range(10):
        for k in range(100):
            # baseline 2% errors; day 7 spikes to 30%
            is_err = (k < 30) if d == 7 else (k < 2)
            rows.append(
                (eid, k % 11, "error" if is_err else "view",
                 t0 + datetime.timedelta(days=d, minutes=k))
            )
            eid += 1
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp"
    )
    out = {str(r["day"]): r for r in E.error_rate_pchart(ev).collect()}
    assert out["2024-01-08"]["out_of_control"]
    assert sum(r["out_of_control"] for r in out.values()) == 1
    for r in out.values():
        assert r["lcl"] >= 0 and r["ucl"] <= 1.5


def test_trade_balance_sums_to_zero(spark, sf_dir):
    out = R.trade_flow_balance(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "supplier"),
        load_table(spark, sf_dir, "nation"),
    ).collect()
    assert len(out) == 25
    # every export is someone's import: net balances sum to zero
    assert abs(sum(float(r["net_balance"]) for r in out)) < 1e-6
    for r in out:
        if r["imbalance"] is not None:
            assert -1 <= r["imbalance"] <= 1
