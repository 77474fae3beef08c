"""Wave-209 operator: held-out lambda sweep for the bigram LM."""

from __future__ import annotations

from simple_vector_spark.operators import text_analysis as T


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_sweep_shape_and_flag(spark):
    docs = _docs(
        spark,
        ["the cat sat on the mat " * 3] * 20
        + ["a dog ran to a park " * 3] * 20,
    )
    rows = T.bigram_lambda_sweep(docs).collect()
    assert [r["lam"] for r in rows] == [0.1, 0.3, 0.5, 0.7, 0.9]
    assert sum(r["is_best"] for r in rows) == 1
    assert all(r["n_scored"] == rows[0]["n_scored"] for r in rows)
    assert all(r["perplexity"] > 1.0 for r in rows)


def test_sweep_repetitive_corpus_prefers_bigram_weight(spark):
    # held-out docs repeat the training bigrams exactly: higher lambda
    # (more bigram mass) must win
    docs = _docs(spark, ["alpha beta gamma delta " * 5] * 30)
    rows = {r["lam"]: r for r in T.bigram_lambda_sweep(docs).collect()}
    best = [lam for lam, r in rows.items() if r["is_best"] == 1][0]
    assert best == 0.9
    assert rows[0.9]["perplexity"] < rows[0.1]["perplexity"]
