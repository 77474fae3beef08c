"""Waves 186-187: RAKE keyphrases, price indices."""

from __future__ import annotations

import datetime as dt

from simple_vector_spark.operators import relational as R
from simple_vector_spark.operators import text_analysis as T


def test_rake_scores_hand_computed(spark):
    # "red apple" twice, "apple" once, stopword 'the' splits phrases.
    # freq(red)=2 deg(red)=4; freq(apple)=3 deg(apple)=5
    # ws(red)=2, ws(apple)=5/3; score("red apple")=2+5/3 per occurrence
    docs = spark.createDataFrame(
        [(0, "red apple the red apple the apple")],
        "doc_id long, text string",
    )
    out = {r["phrase"]: r for r in T.rake_keyphrases(docs).collect()}
    assert set(out) == {"red apple", "apple"}
    # two occurrences of "red apple": raw = 2*(2 + 5/3) = 22/3
    assert abs(out["red apple"]["score"] - 22.0 / 3.0) < 1e-5
    assert out["red apple"]["n_occurrences"] == 4  # word rows
    assert abs(out["apple"]["score"] - 5.0 / 3.0) < 1e-5


def test_rake_multiword_phrases_outrank_singles(spark):
    docs = spark.createDataFrame(
        [(0, "deep neural network of deep neural network of cat")],
        "doc_id long, text string",
    )
    rows = T.rake_keyphrases(docs).collect()
    assert rows[0]["phrase"] == "deep neural network"
    assert rows[0]["score"] > rows[-1]["score"]


def _lineitem(spark, rows):
    return spark.createDataFrame(
        rows,
        "l_partkey long, l_shipdate date, l_extendedprice double,"
        " l_quantity double",
    )


def test_price_indices_pure_inflation(spark):
    # every part's unit price doubles, quantities change: all three
    # indices = 2 exactly
    d0, d1 = dt.date(1996, 6, 1), dt.date(1997, 6, 1)
    rows = [
        (1, d0, 100.0, 10.0), (1, d1, 120.0, 6.0),   # 10 -> 20
        (2, d0, 50.0, 10.0), (2, d1, 30.0, 3.0),     # 5 -> 10
    ]
    out = R.price_indices(_lineitem(spark, rows)).collect()[0]
    assert out["n_parts"] == 2
    assert abs(out["laspeyres"] - 2.0) < 1e-6
    assert abs(out["paasche"] - 2.0) < 1e-6
    assert abs(out["fisher"] - 2.0) < 1e-6


def test_price_indices_mix_shift_bounds(spark):
    # price of part 1 doubles, part 2 halves; current basket shifts
    # toward the cheaper part -> Paasche < Laspeyres, Fisher between
    d0, d1 = dt.date(1996, 6, 1), dt.date(1997, 6, 1)
    rows = [
        (1, d0, 100.0, 10.0), (1, d1, 40.0, 2.0),    # 10 -> 20
        (2, d0, 100.0, 10.0), (2, d1, 100.0, 20.0),  # 10 -> 5
    ]
    out = R.price_indices(_lineitem(spark, rows)).collect()[0]
    assert out["paasche"] < out["fisher"] < out["laspeyres"]
    # common-basket-only: a part present in one year is excluded
    rows.append((3, d0, 999.0, 1.0))
    out2 = R.price_indices(_lineitem(spark, rows)).collect()[0]
    assert out2["n_parts"] == 2
    assert out2["laspeyres"] == out["laspeyres"]
