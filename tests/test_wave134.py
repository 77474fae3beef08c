"""Wave-134 operators: OOV-rate tokenizer-fit audit."""

from __future__ import annotations

from simple_vector_spark.operators import text_analysis as T


def test_oov_rate_flags_divergent_slice(spark):
    # 'common' vocabulary dominates the corpus; the 'weird' slice uses
    # disjoint rare tokens -> its OOV rate is high, the main slice's 0.
    rows = [(i, "alpha beta gamma delta", "main") for i in range(20)]
    rows += [(100 + i, f"zzz{i}q yyy{i}w", "weird") for i in range(5)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {r["source"]: r for r in T.source_oov_rate(docs, vocab=4).collect()}
    assert out["main"]["oov_token_rate"] == 0.0
    assert out["weird"]["oov_token_rate"] == 1.0
    assert out["weird"]["n_oov_types"] == out["weird"]["n_types"]


def test_oov_rate_fixture_bounds(spark, sf_dir):
    from simple_vector_spark.sources.loaders import load_table

    out = T.source_oov_rate(load_table(spark, sf_dir, "documents")).collect()
    for r in out:
        assert 0 <= r["oov_token_rate"] <= 1
        assert r["n_oov_tokens"] <= r["n_tokens"]
        # occurrence-weighted OOV is never above type-level OOV for a
        # head-heavy vocab... not guaranteed in general — just bounds
        assert r["n_oov_types"] <= r["n_types"]
