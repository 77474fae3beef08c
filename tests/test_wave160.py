"""Wave-160 operator: token-bucket rate-limit replay."""

from __future__ import annotations

import datetime as dt

from simple_vector_spark.operators import events as E


def _ev(spark, times, uid=1):
    base = dt.datetime(2024, 1, 1)
    return spark.createDataFrame(
        [
            (i, base + dt.timedelta(seconds=s), uid, "view", None, None)
            for i, s in enumerate(times)
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )


def _run(spark, times):
    return E.rate_limit_audit(_ev(spark, times)).collect()[0]


def test_burst_over_capacity_rejected(spark):
    # 5 events in the same second, capacity 3: 3 admitted, 2 rejected.
    out = _run(spark, [0, 0, 0, 0, 0])
    assert out["n_admitted"] == 3
    assert out["n_rejected"] == 2
    assert abs(out["rejected_share"] - 0.4) < 1e-9


def test_refill_admits_after_wait(spark):
    # drain the bucket, then one event per refill period: all admitted.
    times = [0, 0, 0] + [E.RL_REFILL_SECONDS * k for k in (1, 2, 3)]
    out = _run(spark, times)
    assert out["n_rejected"] == 0
    assert out["n_admitted"] == 6


def test_partial_refill_still_rejects(spark):
    # drain 3, wait HALF a refill period, next event rejected; a full
    # period later it passes.
    half = E.RL_REFILL_SECONDS // 2
    out = _run(spark, [0, 0, 0, half, E.RL_REFILL_SECONDS + half])
    assert out["n_rejected"] == 1
    assert out["n_admitted"] == 4


def test_full_bucket_discards_idle_time(spark):
    # long idle with a full bucket must NOT bank more than capacity:
    # after 10 refill periods idle, a 5-burst still rejects 2.
    idle = E.RL_REFILL_SECONDS * 10
    out = _run(spark, [idle, idle, idle, idle, idle])
    assert out["n_admitted"] == 3
    assert out["n_rejected"] == 2


def test_users_independent(spark):
    a = _ev(spark, [0, 0, 0, 0], uid=1)
    b = _ev(spark, [0], uid=2)
    df = a.unionByName(b)
    # event_ids collide across users; make them unique
    from pyspark.sql import functions as F

    df = df.withColumn(
        "event_id", F.col("event_id") + F.col("user_id") * 100
    )
    out = {r["user_id"]: r for r in E.rate_limit_audit(df).collect()}
    assert out[1]["n_rejected"] == 1
    assert out[2]["n_rejected"] == 0
