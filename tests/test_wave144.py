"""Wave-144 operators: vocabulary frequency spectrum."""

from __future__ import annotations

from simple_vector_spark.operators import text_analysis as T


def test_freq_spectrum_counts_hapaxes(spark):
    # 'a' x4, 'b' x2, and three singletons
    docs = spark.createDataFrame(
        [(1, "a a b x", "s"), (2, "a a b y z", "s")],
        "doc_id long, text string, source string",
    )
    out = {r["k"]: r for r in T.vocab_frequency_spectrum(docs).collect()}
    assert out[1]["n_types"] == 3
    assert out[2]["n_types"] == 1
    assert out[4]["n_types"] == 1
    r = out[1]
    assert r["vocab_size"] == 5
    assert r["n_tokens"] == 9
    assert abs(r["hapax_share"] - 3 / 5) < 1e-6
    assert abs(r["good_turing_p0"] - 3 / 9) < 1e-6


def test_freq_spectrum_mass_accounting(spark, sf_dir):
    from simple_vector_spark.sources.loaders import load_table

    out = T.vocab_frequency_spectrum(load_table(spark, sf_dir, "documents")).collect()
    assert 1 <= len(out) <= T.SPECTRUM_TOP
    r = out[0]
    assert 0 <= r["hapax_share"] <= 1
    assert 0 <= r["good_turing_p0"] <= 1
