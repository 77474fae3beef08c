"""Wave-33 operators on hand-computed micro-fixtures: context-window
packing, Bloom runtime-filter pruning, temperature mixture weights,
perplexity buckets, curriculum deciles."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from simple_vector_spark.operators import curation as CU
from simple_vector_spark.operators import pipeline as PL
from simple_vector_spark.operators import sketches as SK
from simple_vector_spark.operators import text_analysis as T


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def test_pack_context_windows_boundaries(spark):
    # capacity 4, one source/shard: token counts 3,3,2 -> cum_before
    # 0,3,6 -> packs 0,0,1; doc 2 straddles (pack 0 holds 6 tokens).
    docs = _docs(
        spark,
        [
            (1, "s", "a b c"),
            (2, "s", "d e f"),
            (3, "s", "g h"),
        ],
    )
    out = PL.pack_context_windows(docs, capacity=4, shard_docs=100).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["n_docs"], r["n_tokens"], r["n_packs"]) == (3, 8, 2)
    assert abs(r["docs_per_pack"] - 1.5) < 1e-9
    assert abs(r["fill_ratio"] - 8 / 8) < 1e-9


def test_pack_windows_shard_resets_cumsum(spark):
    # shard_docs=2 -> docs {0,1} and {2,3} pack independently: each
    # shard restarts at cum 0, so 4 docs of 3 tokens at capacity 4
    # give packs 0,0 per shard (cum_before 0,3) -> 2 packs total.
    docs = _docs(spark, [(i, "s", "x y z") for i in range(4)])
    r = PL.pack_context_windows(docs, capacity=4, shard_docs=2).collect()[0]
    assert r["n_packs"] == 2
    assert r["n_docs"] == 4


def test_bloom_prune_no_false_negatives_and_fp_bounded(spark):
    build = spark.createDataFrame([(i,) for i in range(20)], "k long")
    probe = spark.createDataFrame([(i,) for i in range(500)], "k long")
    r = SK.bloom_prune_audit(build, probe, "k", "k").collect()[0]
    assert r["n_probe"] == 500
    # every true member passes (no false negatives)
    assert r["n_true"] == 20
    assert r["n_pass"] >= 20
    assert r["n_false_pos"] == r["n_pass"] - 20
    # 80 bits set of 8192 -> per-hash hit ~1%, 4 hashes -> fp ~1e-8;
    # anything over 5% would mean broken hashing
    assert r["fp_rate"] < 0.05


def test_mixture_temperature_flattens(spark):
    # source a: 9 tokens, source b: 1 token. sqrt flattening must boost
    # b (share 0.1 -> 0.25) and damp a (0.9 -> 0.75).
    docs = _docs(
        spark,
        [(1, "a", "t t t t t t t t t"), (2, "b", "t")],
    )
    out = {r["source"]: r for r in CU.mixture_temperature(docs).collect()}
    assert abs(out["a"]["nat_share"] - 0.9) < 1e-9
    assert abs(out["a"]["temp_share"] - 0.75) < 1e-6
    assert abs(out["b"]["temp_share"] - 0.25) < 1e-6
    assert out["b"]["boost"] > 1.0 > out["a"]["boost"]


def test_perplexity_buckets_histogram(spark):
    # 4 docs of common token + 1 rare-token doc: the rare doc's
    # avg_logprob is far lower -> lands in a strictly lower bucket.
    docs = _docs(
        spark,
        [(i, "s", "the the the the") for i in range(4)] + [(9, "s", "qq")],
    )
    rows = T.perplexity_buckets(docs.select("doc_id", "text")).collect()
    assert sum(r["n_docs"] for r in rows) == 5
    assert sum(r["n_tokens"] for r in rows) == 17
    assert abs(sum(r["token_share"] for r in rows) - 1.0) < 1e-5
    buckets = sorted(rows, key=lambda r: r["bucket"])
    assert buckets[0]["n_docs"] == 1  # the gibberish doc isolated low
    # lo_edge consistent with bucket id
    for r in rows:
        assert abs(r["lo_edge"] - r["bucket"] * T.PPL_BUCKET_WIDTH) < 1e-9


def test_curriculum_deciles_partition_and_order(spark):
    docs = _docs(
        spark,
        [(i, "s", ("the and of to a " * (1 + i % 5)).strip()) for i in range(40)],
    ).select("doc_id", "text")
    rows = PL.curriculum_deciles(docs).collect()
    assert len(rows) == 10
    assert sum(r["n_docs"] for r in rows) == 40
    assert all(r["n_docs"] == 4 for r in rows)  # 40/10 exact
    # quality must be non-increasing across buckets
    by_bucket = sorted(rows, key=lambda r: r["bucket"])
    for prev, nxt in zip(by_bucket, by_bucket[1:]):
        assert prev["min_quality"] >= nxt["max_quality"] - 1e-9
