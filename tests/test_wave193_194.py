"""Waves 193-194: burstiness coefficient, UMass coherence."""

from __future__ import annotations

import datetime as dt

from simple_vector_spark.operators import events as E
from simple_vector_spark.operators import text_analysis as T


def _events(spark, user_times):
    rows = []
    eid = 0
    for uid, secs in user_times.items():
        for s in secs:
            rows.append(
                (eid, dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s), uid)
            )
            eid += 1
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long"
    )


def test_burstiness_periodic_user_is_minus_one(spark):
    # perfectly periodic gaps -> sigma 0 -> B = -1
    out = E.interarrival_burstiness(
        _events(spark, {1: list(range(0, 70, 10))}), min_gaps=5
    ).collect()[0]
    assert out["n_users"] == 1
    assert abs(out["mean_burstiness"] + 1.0) < 1e-6
    assert out["n_bursty"] == 0


def test_burstiness_bursty_user_positive(spark):
    # five rapid-fire events then a huge gap repeated: high variance
    times = [0, 1, 2, 3, 4, 1000, 1001, 1002, 1003, 1004, 2000]
    out = E.interarrival_burstiness(
        _events(spark, {1: times}), min_gaps=5
    ).collect()[0]
    assert out["mean_burstiness"] > 0.3
    assert out["n_bursty"] == 1


def test_burstiness_min_gap_filter(spark):
    out = E.interarrival_burstiness(
        _events(spark, {1: [0, 10], 2: list(range(0, 100, 10))}), min_gaps=5
    ).collect()[0]
    assert out["n_users"] == 1  # user 1 has a single gap: excluded


def test_umass_coherent_vs_incoherent(spark):
    # corpus A: top terms always co-occur; corpus B: never
    co = spark.createDataFrame(
        [(i, "apple banana cherry") for i in range(10)],
        "doc_id long, text string",
    )
    solo = spark.createDataFrame(
        [(i, ["apple", "banana", "cherry"][i % 3] + " filler" + str(i))
         for i in range(12)],
        "doc_id long, text string",
    )
    ca = T.umass_coherence(co, topn=3).collect()
    cb = T.umass_coherence(solo, topn=3).collect()
    # co-occurring: each pair log((10+1)/10) > 0; disjoint: log(1/4) < 0
    assert ca[0]["umass_coherence"] > 0
    assert cb[0]["umass_coherence"] < -3
    # rank-1 term contributes no w_i rows: 2 rows for topn=3
    assert len(ca) == 2
