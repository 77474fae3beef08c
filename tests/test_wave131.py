"""Wave-131/132 operators: language-mix entropy, retention half-life."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from simple_vector_spark.operators import events as E
from simple_vector_spark.operators import text_analysis as T


def test_source_lang_entropy_monolingual_is_zero(spark):
    docs = spark.createDataFrame(
        [
            (1, "the and is with that", "pure"),
            (2, "the of and to in", "pure"),
            (3, "der und die das nicht", "mixed"),
            (4, "the and is of to", "mixed"),
        ],
        "doc_id long, text string, source string",
    )
    out = {r["source"]: r for r in T.source_language_entropy(docs).collect()}
    assert out["pure"]["lang_entropy_bits"] == 0.0
    assert out["pure"]["dominant_lang"] == "en"
    assert out["pure"]["dominant_share"] == 1.0
    # 50/50 en/de -> 1 bit
    assert abs(out["mixed"]["lang_entropy_bits"] - 1.0) < 1e-6


def test_retention_halflife_recovers_planted_decay(spark):
    # one cohort, 64 users at week 0, halving every week -> half-life 1
    t0 = datetime.datetime(2024, 1, 1)  # a Monday
    rows = []
    eid = 0
    for wk in range(5):
        for u in range(64 >> wk):
            rows.append((eid, u, "view", t0 + datetime.timedelta(weeks=wk)))
            eid += 1
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp"
    )
    out = E.retention_halflife(ev).collect()[0]
    assert out["n_points"] == 4
    assert abs(out["r1_share"] - 0.5) < 1e-6
    assert abs(out["half_life_weeks"] - 1.0) < 0.01


def test_retention_halflife_no_decay_is_null(spark):
    # everyone active every week -> slope 0 -> NULL half-life
    t0 = datetime.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for wk in range(5):
        for u in range(10):
            rows.append((eid, u, "view", t0 + datetime.timedelta(weeks=wk)))
            eid += 1
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp"
    )
    out = E.retention_halflife(ev).collect()[0]
    assert out["decay_slope"] == 0.0
    assert out["half_life_weeks"] is None
