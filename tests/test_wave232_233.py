"""Waves 232-233: forecast-error family, part lifecycle staging."""

from __future__ import annotations

import datetime as dt

from simple_vector_spark.operators import events as E
from simple_vector_spark.operators import relational as R


def test_forecast_errors_perfect_weekly_pattern(spark):
    # exact weekly periodicity: seasonal-naive is perfect -> all error
    # metrics 0, MASE 0, beats the naive forecaster
    rows, eid = [], 0
    pat = [5, 1, 1, 1, 1, 1, 3]
    for day in range(28):
        for _ in range(pat[day % 7]):
            rows.append((eid, dt.datetime(2024, 1, 1) + dt.timedelta(days=day)))
            eid += 1
    ev = spark.createDataFrame(rows, "event_id long, ts timestamp")
    out = E.forecast_error_metrics(ev).collect()[0]
    assert out["mae"] == 0.0
    assert out["wape"] == 0.0
    assert out["smape"] == 0.0
    assert out["mase"] == 0.0
    assert out["beats_naive"] == 1


def _li(spark, rows):
    return spark.createDataFrame(
        rows, "l_partkey long, l_shipdate date, l_quantity double"
    )


def test_lifecycle_stages_planted(spark):
    rows = []
    # growth: ramps up over 2023-2024
    for k, q in enumerate([1, 1, 2, 2, 8, 9, 10, 10]):
        rows.append((1, dt.date(2023, 1 + k, 15) if k < 12 else None, float(q)))
    # decline: ramps down
    for k, q in enumerate([10, 10, 9, 8, 2, 2, 1, 1]):
        rows.append((2, dt.date(2023, 1 + k, 15), float(q)))
    # mature: flat
    for k in range(8):
        rows.append((3, dt.date(2023, 1 + k, 15), 5.0))
    # launch: first seen in the final quarter of the horizon
    rows.append((4, dt.date(2023, 8, 15), 3.0))
    out = {r["stage"]: r for r in R.part_lifecycle_stages(_li(spark, rows)).collect()}
    assert out["growth"]["n_parts"] == 1
    assert out["decline"]["n_parts"] == 1
    assert out["mature"]["n_parts"] == 1
    assert out["launch"]["n_parts"] == 1
    assert abs(sum(r["share"] for r in out.values()) - 1.0) < 1e-6
