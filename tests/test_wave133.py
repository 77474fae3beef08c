"""Wave-133 operators: composite quality gate."""

from __future__ import annotations

from simple_vector_spark.operators import text_analysis as T


def test_quality_gate_attributes_failures(spark):
    good = "the quick brown fox jumps over the lazy dog and runs on with many fine words"
    docs = spark.createDataFrame(
        [
            (1, good, "s"),
            (2, "tiny", "s"),  # fails length (and stopword floor)
            (3, "spam " * 40, "s"),  # fails repetition + stopword
            (4, "def f(x){return(x==1);} " * 5 + good, "s"),  # fails symbols
            (5, "", "s"),  # fails empty (and length, stopword, repetition)
        ],
        "doc_id long, text string, source string",
    )
    out = {r["source"]: r for r in T.quality_gate(docs).collect()}["s"]
    assert out["n_docs"] == 5
    assert out["n_pass"] == 1
    assert out["fail_empty"] == 1
    assert out["fail_symbols"] >= 1
    assert out["fail_repetition"] >= 1
    assert out["fail_length"] >= 2


def test_quality_gate_fixture_rates_are_sane(spark, sf_dir):
    from simple_vector_spark.sources.loaders import load_table

    out = T.quality_gate(load_table(spark, sf_dir, "documents")).collect()
    for r in out:
        assert 0 <= r["pass_rate"] <= 1
        assert r["n_pass"] <= r["n_docs"]
