"""Waves 179-180: HITS hubs/authorities, Dirichlet query likelihood."""

from __future__ import annotations

from simple_vector_spark.operators import relational as R
from simple_vector_spark.operators import text_analysis as T


def test_hits_star_exporter(spark):
    nation = spark.createDataFrame(
        [(0, "NA"), (1, "NB"), (2, "NC")], "n_nationkey long, n_name string"
    )
    supplier = spark.createDataFrame([(10, 0)], "s_suppkey long, s_nationkey long")
    customer = spark.createDataFrame(
        [(20, 1), (21, 2)], "c_custkey long, c_nationkey long"
    )
    orders = spark.createDataFrame(
        [(100, 20), (101, 21)], "o_orderkey long, o_custkey long"
    )
    lineitem = spark.createDataFrame(
        [(100, 10, 1), (100, 10, 2), (101, 10, 1)],
        "l_orderkey long, l_suppkey long, l_linenumber int",
    )
    out = {
        r["nation"]: r
        for r in R.nation_trade_hits(
            lineitem, orders, customer, supplier, nation
        ).collect()
    }
    # sole exporter is the (only) hub; importers split authority 2:1
    assert out["NA"]["hub"] == 1.0
    assert out["NA"]["authority"] == 0.0
    assert abs(out["NB"]["authority"] - 2.0 / 3.0) < 1e-6
    assert abs(out["NC"]["authority"] - 1.0 / 3.0) < 1e-6
    assert out["NB"]["hub"] == 0.0 and out["NC"]["hub"] == 0.0


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_ql_more_matching_terms_scores_higher(spark):
    docs = _docs(
        spark,
        [
            "vector hash scan filler",      # all 3 query terms
            "vector filler filler filler",  # 1 term, same length
            "nothing relevant here at",     # no term -> not a candidate
        ],
    )
    rows = T.lm_dirichlet_search(docs, ["vector", "hash", "scan"]).collect()
    ids = [r["doc_id"] for r in rows]
    assert ids[0] == 0
    assert 2 not in ids
    assert rows[0]["score"] > rows[1]["score"]


def test_ql_length_normalization(spark):
    # same single matching tf, longer doc scores lower
    docs = _docs(
        spark,
        ["vector short", "vector " + "pad " * 50],
    )
    rows = {r["doc_id"]: r["score"] for r in T.lm_dirichlet_search(
        docs, ["vector", "hash", "scan"]
    ).collect()}
    assert rows[0] > rows[1]
