"""Wave-156 operator: Wald SPRT sequential monitor."""

from __future__ import annotations

import datetime as dt
import math

from pyspark.sql import functions as F

from simple_vector_spark.functions.text import md5_int
from simple_vector_spark.operators import events as E


def _arms(spark, uids):
    df = spark.createDataFrame([(u,) for u in uids], "user_id long")
    rows = df.select(
        "user_id", (md5_int(F.col("user_id").cast("string")) % 2).alias("arm")
    ).collect()
    return {r["user_id"]: r["arm"] for r in rows}


def _ev(spark, rows):
    return spark.createDataFrame(
        [
            (i, dt.datetime.fromisoformat(ts), uid, et, None, None)
            for i, (ts, uid, et) in enumerate(rows)
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )


def test_sprt_llr_matches_reference(spark):
    arms = _arms(spark, range(40))
    treated = [u for u in range(40) if arms[u] == 1]
    # day 1: first half of treated users, every other one converts;
    # day 2: the rest, all converting.
    d1, d2 = treated[: len(treated) // 2], treated[len(treated) // 2 :]
    rows = []
    for j, u in enumerate(d1):
        rows.append(("2024-03-01T10:00:00", u, "view"))
        if j % 2 == 0:
            rows.append(("2024-03-01T11:00:00", u, "purchase"))
    for u in d2:
        rows.append(("2024-03-02T10:00:00", u, "view"))
        rows.append(("2024-03-02T11:00:00", u, "purchase"))
    # control users must be ignored entirely
    ctrl = [u for u in range(40) if arms[u] == 0][:3]
    for u in ctrl:
        rows.append(("2024-03-01T09:00:00", u, "purchase"))

    out = {r["day"]: r for r in E.sprt_monitor(_ev(spark, rows)).collect()}
    la = math.log(E.SPRT_P1 / E.SPRT_P0)
    lb = math.log((1 - E.SPRT_P1) / (1 - E.SPRT_P0))
    c1 = (len(d1) + 1) // 2
    day1 = out[dt.date(2024, 3, 1)]
    assert day1["n_users_cum"] == len(d1)
    assert day1["n_conv_cum"] == c1
    assert abs(day1["llr"] - round(la * c1 + lb * (len(d1) - c1), 6)) < 1e-9
    day2 = out[dt.date(2024, 3, 2)]
    assert day2["n_users_cum"] == len(treated)
    assert day2["n_conv_cum"] == c1 + len(d2)


def test_sprt_decision_boundaries(spark):
    arms = _arms(spark, range(400))
    treated = [u for u in range(400) if arms[u] == 1]
    # all treated users convert -> LLR climbs by ln(p1/p0) per user and
    # must cross the accept_h1 boundary with a few hundred users.
    rows = []
    for u in treated:
        rows.append(("2024-03-01T10:00:00", u, "purchase"))
    out = E.sprt_monitor(_ev(spark, rows)).collect()
    assert out[-1]["decision"] == "accept_h1"
    # none converting -> LLR falls by |ln((1-p1)/(1-p0))| per user.
    rows0 = [("2024-03-01T10:00:00", u, "view") for u in treated]
    out0 = E.sprt_monitor(_ev(spark, rows0)).collect()
    assert out0[-1]["decision"] == "accept_h0"
