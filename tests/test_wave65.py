"""Wave-65 operators: double-charge screen, KWIC, watermark dedup."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from simple_vector_spark.operators import relational as R
from simple_vector_spark.operators import text_analysis as T


def test_double_charge_blocking_and_window(spark):
    d0 = datetime.datetime(2024, 1, 1)

    def day(n):
        return d0 + datetime.timedelta(days=n)

    rows = [
        (1, 100, 1500.00, day(0)),
        (2, 100, 1500.00, day(3)),    # same cust/band, 3 days -> flagged
        (3, 100, 1500.00, day(200)),  # outside the window
        (4, 200, 1500.00, day(1)),    # other customer
        (5, 100, 9500.00, day(2)),    # other amount band
    ]
    orders = spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, o_totalprice double, o_orderdate timestamp"
    )
    out = R.double_charge_screen(orders).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["order_a"], r["order_b"]) == (1, 2)
    assert r["day_gap"] == 3
    assert r["cents_diff"] == 0


def test_kwic_window_and_edges(spark):
    docs = spark.createDataFrame(
        [
            (1, "a b vector c d e"),
            (2, "vector x y"),               # term at position 0: clipped left
            (3, "no match here"),
            (4, "q vector r vector s"),      # first occurrence wins
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in T.kwic_snippets(docs).collect()}
    assert out[1]["snippet"] == "a b vector c d"
    assert out[2]["snippet"] == "vector x y"
    assert out[4]["first_pos"] == 1
    assert out[4]["snippet"] == "q vector r vector"
    assert 3 not in out


def test_dedup_within_watermark_equals_exact_distinct(spark, sf_dir):
    from simple_vector_spark import registry as REG

    got = {tuple(r) for r in REG.stream_dedup_within_watermark(spark, sf_dir).collect()}
    exact = {tuple(r) for r in REG.stream_dedup_counts(spark, sf_dir).collect()}
    assert got == exact
