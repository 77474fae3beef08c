"""Waves 197-198: permutation test, Weibull retention fit."""

from __future__ import annotations

import datetime as dt
import math

from pyspark.sql import functions as F

from simple_vector_spark.functions.text import md5_int
from simple_vector_spark.operators import events as E


def _armed_events(spark, n_users, convert):
    ids = spark.range(n_users).select(F.col("user_id")) if False else \
        spark.range(n_users).withColumnRenamed("id", "user_id")
    arms = {
        r["user_id"]: r["arm"]
        for r in ids.select(
            "user_id",
            (md5_int(F.col("user_id").cast("string")) % 2).cast("int").alias("arm"),
        ).collect()
    }
    rows = []
    eid = 0
    for uid, arm in arms.items():
        rows.append((eid, dt.datetime(2024, 1, 1), uid, "view"))
        eid += 1
        if convert(uid, arm):
            rows.append((eid, dt.datetime(2024, 1, 2), uid, "purchase"))
            eid += 1
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )


def test_permutation_null_is_insignificant(spark):
    # conversion independent of arm -> p must not be tiny
    ev = _armed_events(spark, 60, lambda u, a: u % 3 == 0)
    out = E.permutation_test_conversion(ev).collect()[0]
    assert out["p_value"] > 0.05


def test_permutation_strong_effect_significant(spark):
    # arm decides conversion entirely -> only extreme relabelings tie
    ev = _armed_events(spark, 80, lambda u, a: a == 1)
    out = E.permutation_test_conversion(ev).collect()[0]
    assert out["p_value"] < 0.02
    assert out["abs_diff"] == 1.0


def _span_events(spark, spans):
    rows = []
    eid = 0
    for uid, span in enumerate(spans):
        d0 = dt.datetime(2024, 1, 1)
        rows.append((eid, d0, uid, "view")); eid += 1
        rows.append((eid, d0 + dt.timedelta(days=span), uid, "view")); eid += 1
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )


def test_weibull_recovers_planted_shape(spark):
    # plant lifetimes from a Weibull CDF inversion on a uniform grid:
    # t_i = lam * (-ln(1 - u_i))^(1/k) with k = 0.6 (front-loaded)
    k, lam = 0.6, 10.0
    spans = [
        max(1, round(lam * (-math.log(1 - (i + 0.5) / 200)) ** (1 / k)))
        for i in range(200)
    ]
    out = E.weibull_retention_fit(_span_events(spark, spans)).collect()[0]
    assert 0.4 < out["weibull_k"] < 0.8
    assert out["churn_shape"] == "front_loaded"
    assert out["r2"] > 0.9


def test_weibull_constant_hazard_exponential(spark):
    # exponential lifetimes (k = 1): fit should sit near 1
    lam = 8.0
    spans = [
        max(1, round(-lam * math.log(1 - (i + 0.5) / 300)))
        for i in range(300)
    ]
    out = E.weibull_retention_fit(_span_events(spark, spans)).collect()[0]
    assert 0.85 < out["weibull_k"] < 1.15
