"""Wave-57 operators: Benford audit, Kaplan-Meier, inverted postings,
phrase search."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from simple_vector_spark.operators import relational as R
from simple_vector_spark.operators import text_analysis as T


def test_benford_shares_sum_to_one(spark):
    orders = spark.createDataFrame(
        [(float(v),) for v in (19.0, 120.0, 135.5, 29.0, 310.0, 95.0)],
        "o_totalprice double",
    )
    rows = R.benford_audit(orders).collect()
    assert abs(sum(r["obs_share"] for r in rows) - 1.0) < 1e-4
    d1 = {r["digit"]: r for r in rows}
    assert d1[1]["n"] == 3  # 19, 120, 135.5
    assert abs(d1[1]["benford_share"] - 0.301030) < 1e-6


def _ts(day: int) -> datetime.datetime:
    return datetime.datetime(2024, 1, day)


def test_kaplan_meier_hand_computed(spark):
    # 4 users: u1 purchases day2 (dur 1), u2 purchases day3 (dur 2),
    # u3 censored at dur 2, u4 censored at dur 3
    rows = [
        (1, _ts(1), "view"), (1, _ts(2), "purchase"),
        (2, _ts(1), "view"), (2, _ts(3), "purchase"),
        (3, _ts(1), "view"), (3, _ts(3), "view"),
        (4, _ts(1), "view"), (4, _ts(4), "view"),
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    out = {r["t"]: r for r in R.kaplan_meier(ev).collect()}
    # t=1: n_risk 4, d 1 -> S = 0.75
    assert out[1]["n_risk"] == 4 and out[1]["n_events"] == 1
    assert abs(out[1]["surv"] - 0.75) < 1e-6
    # t=2: n_risk 3 (u2 at 2 as event, u3 censored AT 2 still at risk),
    # d 1 -> S = 0.75 * (1 - 1/3) = 0.5
    assert out[2]["n_risk"] == 3 and out[2]["n_events"] == 1
    assert abs(out[2]["surv"] - 0.5) < 1e-5


def test_kaplan_meier_total_conversion_hits_zero(spark):
    rows = [
        (1, _ts(1), "view"), (1, _ts(2), "purchase"),
        (2, _ts(1), "view"), (2, _ts(2), "purchase"),
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    out = R.kaplan_meier(ev).collect()
    assert len(out) == 1
    assert out[0]["surv"] == 0.0


def test_inverted_postings_head_and_counts(spark):
    docs = spark.createDataFrame(
        [(i, "alpha beta alpha") for i in range(1, 15)] + [(99, "beta")],
        "doc_id long, text string",
    )
    out = {r["term"]: r for r in T.inverted_postings(docs).collect()}
    assert out["alpha"]["df"] == 14
    assert out["alpha"]["total_tf"] == 28
    # head is a comma-joined STRING since round 5 (driver-canon flat
    # schema contract), truncated to POSTINGS_K ascending ids
    assert out["alpha"]["postings_head"] == ",".join(
        str(i) for i in range(1, 11)
    )
    assert out["beta"]["df"] == 15


def test_phrase_search_adjacency_only(spark):
    docs = spark.createDataFrame(
        [
            (1, "full table scan now"),       # phrase present
            (2, "table full scan"),            # words present, not adjacent
            (3, "table scan table scan"),      # twice
        ],
        "doc_id long, text string",
    )
    r = T.phrase_search(docs, ("table", "scan")).collect()[0]
    assert r["n_docs"] == 2
    assert r["n_occurrences"] == 3
