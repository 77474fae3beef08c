"""Wave-117 operators: measured LSH S-curve."""

from __future__ import annotations

from pyspark.sql import functions as F

from simple_vector_spark.operators import dedup as D


def _planted(spark):
    # near-identical pairs (high jaccard), moderately similar pairs,
    # and unrelated docs — all in one source block
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (1, base, "s"),
        (2, base + " extra", "s"),  # very high jaccard with 1
        (3, "alpha beta gamma delta epsilon completely different tail here now", "s"),
        (4, "unrelated words that share nothing with the others at all okay", "s"),
        (5, "totally distinct vocabulary nothing matching anything else here", "s"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_scurve_high_jaccard_pairs_are_caught(spark):
    out = {r["jacc_band"]: r for r in D.lsh_scurve(_planted(spark)).collect()}
    # the near-identical pair lands in a high band and must be caught
    top_band = max(out)
    assert top_band >= 7
    assert out[top_band]["hit_rate"] == 1.0
    # signature estimate tracks the band: high-band mean estimate is high
    assert out[top_band]["mean_sig_jaccard"] >= 0.5


def test_scurve_rates_are_shares(spark):
    for r in D.lsh_scurve(_planted(spark)).collect():
        assert 0 <= r["hit_rate"] <= 1
        assert 0 <= r["mean_sig_jaccard"] <= 1
        assert r["n_candidates"] <= r["n_pairs"]
