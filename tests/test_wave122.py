"""Wave-122 operators: hashing-trick dense retrieval."""

from __future__ import annotations

from pyspark.sql import functions as F

from simple_vector_spark.operators import text_analysis as T


def test_hash_embed_identical_text_scores_one(spark):
    docs = spark.createDataFrame(
        [
            (1, T.HASH_EMBED_QUERY, "s"),
            (2, "entirely unrelated vocabulary about gardens and tulips", "s"),
        ],
        "doc_id long, text string, source string",
    )
    out = {r["doc_id"]: r["cos"] for r in T.hash_embed_search(docs).collect()}
    assert out[1] == 1.0
    assert out.get(2, 0.0) < 1.0


def test_hash_embed_ranks_overlapping_text_higher(spark):
    docs = spark.createDataFrame(
        [
            (1, "system error rate spikes under heavy load today", "s"),
            (2, "gardens tulips rainfall pollination bees nectar", "s"),
        ],
        "doc_id long, text string, source string",
    )
    rows = T.hash_embed_search(docs).collect()
    top = rows[0] if rows[0]["cos"] >= rows[-1]["cos"] else rows[-1]
    by_id = {r["doc_id"]: r["cos"] for r in rows}
    assert by_id[1] > by_id.get(2, -1.0)


def test_hash_embedding_is_integer_valued_and_fixed_dim(spark):
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma", "s")], "doc_id long, text string, source string"
    )
    vec = docs.select(T.hash_embedding(F.col("text")).alias("v")).collect()[0]["v"]
    assert len(vec) == T.HASH_EMBED_DIM
    assert all(isinstance(x, int) for x in vec)
    # three tokens -> total absolute mass 3
    assert sum(abs(x) for x in vec) == 3
