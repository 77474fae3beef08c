"""Waves 221-222: PVM revenue bridge, fightin'-words log-odds."""

from __future__ import annotations

import datetime as dt

from simple_vector_spark.operators import relational as R
from simple_vector_spark.operators import text_analysis as T


def _li(spark, rows):
    return spark.createDataFrame(
        rows,
        "l_partkey long, l_shipdate date, l_extendedprice double,"
        " l_quantity double",
    )


def test_pvm_identity_and_pure_cases(spark):
    d0, d1 = dt.date(1996, 6, 1), dt.date(1997, 6, 1)
    # pure price move: same quantities, price of part 1 +10%
    rows = [
        (1, d0, 100.0, 10.0), (1, d1, 110.0, 10.0),
        (2, d0, 200.0, 20.0), (2, d1, 200.0, 20.0),
    ]
    out = R.pvm_revenue_bridge(_li(spark, rows)).collect()[0]
    assert abs(out["delta_total"] - 10.0) < 1e-6
    assert abs(out["price_effect"] - 10.0) < 1e-6
    assert abs(out["volume_effect"]) < 1e-6
    assert abs(out["mix_effect"]) < 1e-6
    # identity holds in a mixed scenario too
    rows2 = [
        (1, d0, 100.0, 10.0), (1, d1, 90.0, 6.0),
        (2, d0, 50.0, 5.0), (2, d1, 120.0, 10.0),
    ]
    out2 = R.pvm_revenue_bridge(_li(spark, rows2)).collect()[0]
    s = out2["price_effect"] + out2["volume_effect"] + out2["mix_effect"]
    assert abs(s - out2["delta_total"]) < 0.02  # rounding at cents


def test_fightin_words_flags_house_phrase(spark):
    docs = spark.createDataFrame(
        [(i, "aaa_src", "delve tapestry moreover the cat sat " * 3)
         for i in range(5)]
        + [(10 + i, "zzz_src", "the cat sat on the mat " * 3)
           for i in range(5)],
        "doc_id long, source string, text string",
    )
    rows = T.fightin_words(docs).collect()
    assert rows[0]["target_source"] == "aaa_src"
    top_words = [r["w"] for r in rows[:3]]
    assert {"delve", "tapestry", "moreover"} <= set(top_words)
    # shared words must not top the list
    assert rows[0]["z_score"] > 0
