"""Wave-226 operator: MSTTR lexical diversity."""

from __future__ import annotations

from simple_vector_spark.operators import text_analysis as T


def test_msttr_repetition_vs_variety(spark):
    varied = " ".join(f"w{i}" for i in range(100))          # all distinct
    repet = " ".join(["spam"] * 100)                         # one type
    docs = spark.createDataFrame(
        [(0, "varied", varied), (1, "repet", repet)],
        "doc_id long, source string, text string",
    )
    out = {r["source"]: r for r in T.msttr_diversity(docs).collect()}
    assert out["varied"]["msttr"] == 1.0
    assert abs(out["repet"]["msttr"] - 1.0 / 50.0) < 1e-6
    assert out["varied"]["n_segments"] == 2


def test_msttr_corrects_length_bias(spark):
    # same local diversity pattern, 10x the length: raw TTR collapses,
    # MSTTR stays put
    unit = " ".join(f"t{i}" for i in range(50))
    docs = spark.createDataFrame(
        [(0, "short", unit), (1, "long", " ".join([unit] * 10))],
        "doc_id long, source string, text string",
    )
    out = {r["source"]: r for r in T.msttr_diversity(docs).collect()}
    assert out["long"]["raw_ttr"] < 0.2 < out["short"]["raw_ttr"]
    assert abs(out["long"]["msttr"] - out["short"]["msttr"]) < 1e-6


def test_msttr_ragged_tail_dropped(spark):
    docs = spark.createDataFrame(
        [(0, "s", " ".join(f"x{i}" for i in range(75)))],
        "doc_id long, source string, text string",
    )
    out = T.msttr_diversity(docs).collect()[0]
    assert out["n_segments"] == 1  # the 25-token tail is dropped
