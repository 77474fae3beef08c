"""Wave-155 operator: DFT periodogram."""

from __future__ import annotations

import datetime as dt
import math
from decimal import Decimal

from simple_vector_spark.operators import relational as R


def _orders(spark, vals):
    rows = []
    for i, v in enumerate(vals):
        y, m = 2015 + i // 12, i % 12 + 1
        rows.append((i, 1, dt.date(y, m, 10), Decimal(str(round(v, 2)))))
    return spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderdate date, o_totalprice decimal(18,2)",
    )


def test_periodogram_finds_planted_annual_cycle(spark):
    # 48 months of pure 12-month sinusoid -> dominant frequency k =
    # 48/12 = 4 with essentially all the power.
    vals = [1000 + 300 * math.sin(2 * math.pi * t / 12) for t in range(48)]
    rows = R.revenue_periodogram(_orders(spark, vals)).collect()
    top = next(r for r in rows if r["rnk"] == 1)
    assert top["freq_k"] == 4
    assert abs(top["period_months"] - 12.0) < 1e-9
    assert top["power_share"] > 0.99


def test_periodogram_two_tones_ranked_by_amplitude(spark):
    # 6-month cycle twice the amplitude of the 24-month cycle ->
    # k=60/6=10 ranks above k=60/24=2.5 -> nearest bins.
    vals = [
        500
        + 200 * math.sin(2 * math.pi * t / 6)
        + 80 * math.sin(2 * math.pi * t / 20)
        for t in range(60)
    ]
    rows = R.revenue_periodogram(_orders(spark, vals)).collect()
    by_rank = {r["rnk"]: r for r in rows}
    assert by_rank[1]["freq_k"] == 10  # 6-month tone
    assert by_rank[2]["freq_k"] == 3  # 20-month tone
    assert by_rank[1]["power_share"] > by_rank[2]["power_share"]


def test_periodogram_shares_sum_below_one(spark):
    vals = [100 + 7 * ((t * 13) % 11) for t in range(36)]
    rows = R.revenue_periodogram(_orders(spark, vals)).collect()
    assert len(rows) == R.PERIODOGRAM_TOPK
    assert sum(r["power_share"] for r in rows) <= 1.0 + 1e-6
    assert all(r["power_share"] >= 0 for r in rows)
