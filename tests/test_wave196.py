"""Wave-196 operator: Bayesian beta-binomial A/B readout."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from simple_vector_spark.functions.text import md5_int
from simple_vector_spark.operators import events as E


def _arms(spark, n=80):
    ids = spark.range(n).select(F.col("id").alias("user_id"))
    return {
        r["user_id"]: r["arm"]
        for r in ids.select(
            "user_id",
            (md5_int(F.col("user_id").cast("string")) % 2).cast("int").alias(
                "arm"
            ),
        ).collect()
    }


def _events(spark, arm_map, conv_by_arm):
    rows = []
    eid = 0
    for uid, arm in arm_map.items():
        rows.append((eid, dt.datetime(2024, 1, 1), uid, "view"))
        eid += 1
        if conv_by_arm[arm](uid):
            rows.append((eid, dt.datetime(2024, 1, 2), uid, "purchase"))
            eid += 1
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )


def test_bayes_ab_detects_better_arm(spark):
    arms = _arms(spark)
    # arm 1 converts always, arm 0 never
    ev = _events(spark, arms, {0: lambda u: False, 1: lambda u: True})
    out = E.bayes_ab_conversion(ev).collect()[0]
    assert out["c_a"] == 0 and out["c_b"] == out["n_b"]
    assert out["post_mean_b"] > 0.9 > 0.1 > out["post_mean_a"]
    assert out["p_b_beats_a"] > 0.999


def test_bayes_ab_symmetric_arms_near_half(spark):
    arms = _arms(spark)
    # both arms convert on even user ids (hash-independent ~50%)
    ev = _events(
        spark, arms,
        {0: lambda u: u % 2 == 0, 1: lambda u: u % 2 == 0},
    )
    out = E.bayes_ab_conversion(ev).collect()[0]
    assert 0.05 < out["p_b_beats_a"] < 0.95
    # priors keep the posterior off the raw MLE
    assert 0.0 < out["post_mean_a"] < 1.0
    # counts add up
    assert out["n_a"] + out["n_b"] == 80
