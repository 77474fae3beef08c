"""Wave-70 operators: zlib quality signal, hapax ratio, dispersion."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from simple_vector_spark.operators import events as E
from simple_vector_spark.operators import text_analysis as T


def test_zlib_ratio_orders_repetitive_below_prose(spark):
    docs = spark.createDataFrame(
        [
            (1, "spam " * 200, "template"),
            (2, "the quick brown fox jumps over a lazy dog while seven "
                "wizards brew unique potions of quite different strength",
             "prose"),
        ],
        "doc_id long, text string, source string",
    )
    out = {r["source"]: r for r in T.zlib_ratio_quality(docs).collect()}
    assert out["template"]["mean_ratio"] < out["prose"]["mean_ratio"]
    assert 0.0 < out["template"]["mean_ratio"] < 0.2   # highly compressible
    assert 0.4 < out["prose"]["mean_ratio"] <= 1.1


def test_hapax_all_unique_vs_all_repeat(spark):
    docs = spark.createDataFrame(
        [
            (1, "a b c d e", "uniq"),       # every term once
            (2, "x x x x x", "rep"),        # one term, five tokens
        ],
        "doc_id long, text string, source string",
    )
    out = {r["source"]: r for r in T.hapax_ratio(docs).collect()}
    assert out["uniq"]["hapax_share"] == 1.0
    assert out["uniq"]["type_token_ratio"] == 1.0
    assert out["rep"]["n_types"] == 1
    assert out["rep"]["hapax_share"] == 0.0
    assert out["rep"]["type_token_ratio"] == 0.2


def test_dispersion_constant_vs_bursty(spark):
    def mk(day_counts):
        rows, eid = [], 0
        for day, c in enumerate(day_counts, start=1):
            for _ in range(c):
                rows.append((eid, datetime.datetime(2024, 1, day, 12)))
                eid += 1
        return spark.createDataFrame(rows, "event_id long, ts timestamp")

    flat = E.dispersion_index(mk([10] * 8)).collect()[0]
    assert flat["var_daily"] == 0.0
    assert flat["dispersion_index"] == 0.0
    bursty = E.dispersion_index(mk([1, 1, 1, 1, 50, 1, 1, 1])).collect()[0]
    assert bursty["overdispersed"] is True
    assert bursty["dispersion_index"] > 10
