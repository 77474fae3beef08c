"""Waves 206-207: bot screen, payload entropy sniff."""

from __future__ import annotations

import datetime as dt
import zlib

from simple_vector_spark.operators import events as E
from simple_vector_spark.operators import multimodal as MM


def test_bot_screen_ranks_scripted_user_first(spark):
    rows = []
    eid = 0
    # bot: 60 events, one type, exactly every 10 seconds, one day
    for i in range(60):
        rows.append((eid, dt.datetime(2024, 1, 1, 0, 0, 0)
                     + dt.timedelta(seconds=10 * i), 1, "click"))
        eid += 1
    # human: mixed types, irregular gaps, spread over days
    human_times = [0, 45, 300, 3600, 4000, 90000, 91000, 180000, 200000]
    types = ["view", "click", "purchase", "view", "error",
             "signup", "view", "click", "view"]
    for s, t in zip(human_times, types):
        rows.append((eid, dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s),
                     2, t))
        eid += 1
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    out = E.bot_detection_screen(ev).collect()
    assert out[0]["user_id"] == 1
    assert out[0]["type_entropy"] == 0.0
    assert abs(out[0]["burstiness"] + 1.0) < 1e-6  # clockwork
    assert out[0]["bot_score"] > out[1]["bot_score"] + 2


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def test_entropy_sniff_separates_text_from_noise(spark):
    # latin-1-safe pseudo-compressed bytes so encode() round-trips
    noise = bytes(zlib.compress(b"some repetitive payload " * 50)).decode(
        "latin-1"
    )
    docs = _docs(
        spark,
        [(0, "text", "the quick brown fox jumps over the lazy dog " * 10),
         (1, "blob", noise),
         (2, "junk", "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa")],
    )
    out = {r["source"]: r for r in MM.payload_entropy_sniff(docs).collect()}
    assert out["junk"]["avg_entropy_bits"] < 1.0
    assert out["text"]["avg_entropy_bits"] < 5.0
    # UTF-8 re-encoding splits high bytes, so compressed content tops
    # out lower than raw binary would — the ORDERING is the contract
    assert (out["blob"]["avg_entropy_bits"]
            > out["text"]["avg_entropy_bits"]
            > out["junk"]["avg_entropy_bits"])
    assert out["junk"]["n_high_entropy"] == 0
