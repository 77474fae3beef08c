"""Wave-102/103 operators: code-vs-prose gate, pair-graph assortativity."""

from __future__ import annotations

from pyspark.sql import functions as F

from simple_vector_spark.operators import dedup as D
from simple_vector_spark.operators import text_analysis as T


def test_code_detect_flags_planted_code(spark):
    prose = [(i, "the quick brown fox jumps over the lazy dog again", "web")
             for i in range(5)]
    code = [(10 + i, "def f(x){ return (x==1) ? g(x) : h(x); } // y<z", "crawl")
            for i in range(5)]
    docs = spark.createDataFrame(
        prose + code, "doc_id long, text string, source string"
    )
    out = {r["source"]: r for r in T.code_detect(docs).collect()}
    assert out["web"]["n_code"] == 0
    assert out["crawl"]["n_code"] == 5
    assert out["crawl"]["code_share"] == 1.0
    assert out["crawl"]["symbol_density"] > out["web"]["symbol_density"]


def test_code_detect_empty_text_is_not_code(spark):
    docs = spark.createDataFrame(
        [(1, "", "s"), (2, "plain words", "s")],
        "doc_id long, text string, source string",
    )
    out = T.code_detect(docs).collect()[0]
    assert out["n_code"] == 0


def test_assortativity_star_graph_is_disassortative(spark):
    # star: hub 0 linked to leaves 1..5 -> hub degree 5, leaves 1;
    # every edge pairs (5,1) -> perfect negative correlation r = -1.
    pairs = spark.createDataFrame(
        [(0, i) for i in range(1, 6)], "doc_a long, doc_b long"
    )
    out = D.pair_graph_assortativity(pairs).collect()[0]
    assert out["n_nodes"] == 6
    assert out["n_edges"] == 5
    assert abs(out["assortativity"] - (-1.0)) < 1e-9


def test_assortativity_regular_graph_is_degenerate(spark):
    # 4-cycle: every degree 2, zero variance -> NULL (0/0) in both
    # engines; the operator must not crash and must report the edge
    # count correctly.
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (0, 3)], "doc_a long, doc_b long"
    )
    out = D.pair_graph_assortativity(pairs).collect()[0]
    assert out["n_edges"] == 4
    assert out["assortativity"] is None or abs(out["assortativity"]) < 1e-9
