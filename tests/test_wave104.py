"""Wave-104 operators: TextRank keyword extraction."""

from __future__ import annotations

from pyspark.sql import functions as F

from simple_vector_spark.operators import text_analysis as T


def test_textrank_hub_term_outranks_equal_frequency_term(spark):
    # "core" co-occurs with many distinct terms; "echo" repeats in one
    # fixed pair context with similar frequency.  Centrality must
    # separate them even though raw counts are close.
    docs = spark.createDataFrame(
        [
            (1, "core alpha core beta core gamma core delta", "s"),
            (2, "core epsilon core zeta core eta core theta", "s"),
            (3, "echo filler echo filler echo filler echo filler", "s"),
        ],
        "doc_id long, text string, source string",
    )
    out = {r["token"]: r["textrank"] for r in T.textrank_keywords(docs).collect()}
    assert out["core"] > out["echo"]


def test_textrank_is_deterministic_and_bounded(spark, sf_dir):
    from simple_vector_spark.sources.loaders import load_table

    docs = load_table(spark, sf_dir, "documents")
    a = T.textrank_keywords(docs).collect()
    b = T.textrank_keywords(docs).collect()
    assert a == b
    assert len(a) == T.TEXTRANK_TOPK
    # ranks descend with the declared tiebreak
    pairs = [(r["textrank"], r["token"]) for r in a]
    assert pairs == sorted(pairs, key=lambda x: (-x[0], x[1]))


def test_textrank_single_token_docs_have_no_edges(spark):
    # No adjacency at all -> every node gets the teleport mass only;
    # operator must not crash on an empty edge table.
    docs = spark.createDataFrame(
        [(1, "one", "s"), (2, "two", "s")],
        "doc_id long, text string, source string",
    )
    out = T.textrank_keywords(docs).collect()
    assert len(out) == 2
    assert all(abs(r["textrank"] - out[0]["textrank"]) < 1e-9 for r in out)
