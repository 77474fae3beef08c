"""Wave-40: perceptual-hash near-dup over the binary media column."""

from __future__ import annotations

from pyspark.sql import functions as F

from simple_vector_spark.operators import multimodal as MM


def test_phash_identical_payloads_pair_at_zero(spark):
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog " * 4),
            (2, "the quick brown fox jumps over the lazy dog " * 4),
            (3, "completely different content with other bytes entirely " * 3),
        ],
        "doc_id long, text string",
    )
    pairs = MM.phash_neardup_pairs(MM.with_payload(docs)).collect()
    got = {(r["doc_a"], r["doc_b"]): r["hamming"] for r in pairs}
    assert got.get((1, 2)) == 0
    assert (1, 3) not in got and (2, 3) not in got


def test_phash_near_but_not_exact_still_pairs(spark):
    base = "aaaa bbbb cccc dddd eeee ffff gggg hhhh " * 8
    # a tiny payload edit flips few raster sums -> low Hamming, still
    # caught through an agreeing band
    edited = base[:-1] + "x"
    docs = spark.createDataFrame(
        [(1, base), (2, edited)], "doc_id long, text string"
    )
    pairs = MM.phash_neardup_pairs(MM.with_payload(docs), max_hamming=16).collect()
    assert len(pairs) == 1
    assert pairs[0]["hamming"] <= 16


def test_phash_registry_query_finds_planted_dups(spark, sf_dir):
    from simple_vector_spark.registry import PLANT_SHIFT, queries

    out = queries()["multimodal_phash_neardup"](spark, sf_dir).collect()
    planted = {(r["doc_a"], r["doc_b"]) for r in out if r["doc_b"] - r["doc_a"] == PLANT_SHIFT}
    # every planted copy is byte-identical -> must appear at hamming 0
    zero = {(r["doc_a"], r["doc_b"]) for r in out if r["hamming"] == 0}
    assert planted and planted <= zero
