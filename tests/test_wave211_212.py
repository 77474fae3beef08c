"""Waves 211-212: lognormal session fit, recency hazard table."""

from __future__ import annotations

import datetime as dt
import math

from simple_vector_spark.operators import events as E
from simple_vector_spark.operators import relational as R


def test_lognormal_recovers_planted_params(spark):
    # sessions with durations from a lognormal grid: ln d on a uniform
    # normal-quantile-ish spread around mu=4, sigma=1
    rows, eid = [], 0
    base = dt.datetime(2024, 1, 1)
    for uid in range(100):
        u = (uid + 0.5) / 100
        # rough normal quantile via inverse CDF approximation on a grid
        z = -2.0 + 4.0 * u  # uniform spread stand-in, sigma ~ 1.155
        d = math.exp(4.0 + z)
        start = base + dt.timedelta(hours=uid * 2)
        rows.append((eid, start, uid)); eid += 1
        rows.append((eid, start + dt.timedelta(seconds=d), uid)); eid += 1
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long"
    )
    out = E.session_lognormal_fit(ev).collect()[0]
    assert out["n_sessions"] == 100
    assert abs(out["mu_ln"] - 4.0) < 0.1
    assert 1.0 < out["sigma_ln"] < 1.3
    # lognormal mean must exceed median (skew), and the model mean
    # should be in the ballpark of the empirical mean
    assert out["mean_model_s"] > out["median_model_s"]
    assert 0.5 < out["mean_model_s"] / out["mean_empirical_s"] < 2.0


def test_lognormal_single_event_sessions_counted(spark):
    base = dt.datetime(2024, 1, 1)
    rows = [(0, base, 1), (1, base + dt.timedelta(hours=5), 1),
            (2, base, 2), (3, base + dt.timedelta(seconds=60), 2)]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long"
    )
    out = E.session_lognormal_fit(ev).collect()[0]
    assert out["n_single"] == 2  # user 1's two isolated events
    assert out["n_sessions"] == 1


def test_recency_hazard_monotone_on_planted_behavior(spark):
    # recent customers repurchase, stale ones don't
    rows, ok = [], 0
    end = dt.date(2024, 12, 31)
    for cid in range(40):
        recent = cid < 20
        last = end - dt.timedelta(days=40 if recent else 450)
        rows.append((ok, cid, last)); ok += 1
        if recent:
            rows.append((ok, cid, end - dt.timedelta(days=5))); ok += 1
    orders = spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, o_orderdate date"
    )
    out = {r["recency_bucket"]: r for r in
           R.recency_purchase_hazard(orders).collect()}
    # recent bucket converts at 100%, stale at 0%
    recent_bucket = [b for b in out if b.startswith(("a", "b"))][0]
    assert out[recent_bucket]["next30_rate"] == 1.0
    assert out["e_365_plus"]["next30_rate"] == 0.0
    assert out[recent_bucket]["lift_vs_base"] > 1.5
