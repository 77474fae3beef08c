"""Waves 218-220: panel FE, parity audit, expected shortfall."""

from __future__ import annotations

import datetime as dt

from simple_vector_spark.operators import relational as R


def test_panel_fe_removes_part_and_month_confounding(spark):
    # y = 2*x + part_effect + month_effect exactly: pooled OLS would be
    # polluted by the FE structure; the within slope must be exactly 2
    parts = [(1,), (2,), (3,)]
    part = spark.createDataFrame(parts, "p_partkey long")
    rows = []
    part_fx = {1: 0.0, 2: 50.0, 3: 100.0}
    month_fx = {1: 0.0, 2: 30.0}
    for pk in (1, 2, 3):
        for m in (1, 2):
            for k, x in enumerate((0.0, 0.05, 0.1)):
                y = 2.0 * x + part_fx[pk] + month_fx[m]
                rows.append((pk, dt.date(2024, m, 10 + k), x, y))
    li = spark.createDataFrame(
        rows,
        "l_partkey long, l_shipdate date, l_discount double, l_quantity double",
    )
    out = R.panel_fixed_effects(li, part).collect()[0]
    assert abs(out["fe_slope"] - 2.0) < 1e-4
    assert abs(out["within_r2"] - 1.0) < 1e-6


def test_parity_flags_disfavored_segment(spark):
    orders = spark.createDataFrame(
        [(i, i % 2, "1-URGENT" if (i % 2 == 0 and i % 10 < 8) or
          (i % 2 == 1 and i % 10 < 3) else "5-LOW")
         for i in range(200)],
        "o_orderkey long, o_custkey long, o_orderpriority string",
    )
    customer = spark.createDataFrame(
        [(0, "FAVORED"), (1, "OTHER")], "c_custkey long, c_mktsegment string"
    )
    out = {r["segment"]: r for r in
           R.priority_parity_audit(orders, customer).collect()}
    assert out["FAVORED"]["impact_ratio"] == 1.0
    assert out["FAVORED"]["four_fifths_flag"] == 0
    assert out["OTHER"]["impact_ratio"] < 0.5
    assert out["OTHER"]["four_fifths_flag"] == 1


def test_expected_shortfall_exceeds_var(spark):
    vals = [float(v) for v in range(1, 101)]
    orders = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)],
        "o_orderkey long, o_totalprice double",
    )
    out = R.expected_shortfall(orders).collect()[0]
    # VaR95 of 1..100 ~ 95.05; tail = {96..100}, ES = 98
    assert 94.0 < out["var_95"] < 96.0
    assert out["n_tail"] == 5
    assert abs(out["expected_shortfall"] - 98.0) < 1e-6
    assert out["es_to_var_ratio"] > 1.0
