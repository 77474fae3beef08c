"""Wave-170 operator: Heaps-law vocabulary-growth fit."""

from __future__ import annotations

from simple_vector_spark.operators import text_analysis as T


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_heaps_counts_and_pure_power_law(spark):
    # Every token new in every doc: V(N) = N exactly -> beta = 1, K = 1
    docs = _docs(spark, ["a b", "c d", "e f", "g h"])
    out = T.heaps_law_fit(docs).collect()[0]
    assert out["n_docs"] == 4
    assert out["total_tokens"] == 8
    assert out["vocab_size"] == 8
    assert abs(out["heaps_beta"] - 1.0) < 1e-6
    assert abs(out["heaps_k"] - 1.0) < 1e-6
    assert abs(out["r2"] - 1.0) < 1e-6


def test_heaps_pure_duplication_beta_zero(spark):
    # Same single token everywhere: V is flat at 1 -> beta = 0
    docs = _docs(spark, ["x x", "x x", "x", "x x x"])
    out = T.heaps_law_fit(docs).collect()[0]
    assert out["vocab_size"] == 1
    assert abs(out["heaps_beta"]) < 1e-6
    assert abs(out["heaps_k"] - 1.0) < 1e-6


def test_heaps_mixed_sublinear(spark):
    # growing corpus with heavy reuse -> 0 < beta < 1
    docs = _docs(
        spark,
        [
            "the cat sat",
            "the dog sat on the mat",
            "the cat and the dog",
            "a cat a dog a mat and a hat",
        ],
    )
    out = T.heaps_law_fit(docs).collect()[0]
    assert 0.0 < out["heaps_beta"] < 1.0
    # V and N totals consistent with the data
    # distinct: the cat sat dog on mat and a hat = 9 terms
    assert out["vocab_size"] == 9
    assert out["total_tokens"] == 3 + 6 + 5 + 9


def test_heaps_tokenizer_case_folding(spark):
    # "The" and "the" are one term (lowercased tokenizer)
    docs = _docs(spark, ["The the THE", "the"])
    out = T.heaps_law_fit(docs).collect()[0]
    assert out["vocab_size"] == 1
