"""Wave-124 operators: unit-price consistency, sentence stats."""

from __future__ import annotations

from pyspark.sql import functions as F

from simple_vector_spark.operators import text_analysis as T
from simple_vector_spark.operators import validate as V


def test_unit_price_audit_flags_planted_inconsistency(spark):
    rows = [
        (1, 100, 2.0, 20.0),   # unit 10.00
        (2, 100, 3.0, 30.0),   # unit 10.00 -> consistent part
        (3, 200, 2.0, 20.0),   # unit 10.00
        (4, 200, 2.0, 25.0),   # unit 12.50 -> inconsistent part
    ]
    li = spark.createDataFrame(
        rows, "l_orderkey long, l_partkey long, l_quantity double, l_extendedprice double"
    ).select(
        "l_orderkey",
        "l_partkey",
        F.col("l_quantity").cast("decimal(15,2)").alias("l_quantity"),
        F.col("l_extendedprice").cast("decimal(15,2)").alias("l_extendedprice"),
    )
    out = V.unit_price_consistency(li).collect()[0]
    assert out["n_parts"] == 2
    assert out["n_consistent"] == 1
    assert out["consistent_share"] == 0.5
    assert out["max_distinct_units"] == 2
    assert abs(out["max_unit_spread"] - 2.5) < 1e-9


def test_sentence_stats_counts_segments(spark):
    docs = spark.createDataFrame(
        [
            (1, "One two three. Four five! Six?", "a"),   # 3 sents, 6 words
            (2, "no terminal punctuation here", "a"),      # 1 sent, 4 words
            (3, "", "b"),                                   # 0 sents, 0 words
        ],
        "doc_id long, text string, source string",
    )
    out = {r["source"]: r for r in T.sentence_stats(docs).collect()}
    assert out["a"]["n_sentences"] == 4
    assert abs(out["a"]["sentences_per_doc"] - 2.0) < 1e-9
    assert abs(out["a"]["words_per_sentence"] - 10 / 4) < 1e-9
    assert out["b"]["n_sentences"] == 0
    assert out["b"]["words_per_sentence"] is None
