"""Waves 174-176: AQE skew join result semantics, DSIR selection,
negative-binomial fit."""

from __future__ import annotations

from simple_vector_spark.operators import relational as R
from simple_vector_spark.operators import text_analysis as T


def test_dsir_ranks_target_like_docs_first(spark):
    # 'en' target talks about cats; candidate d1 is cat-like, d2 is not
    docs = spark.createDataFrame(
        [
            (0, "cat cat feline cat", "en"),
            (1, "cat feline cat cat", "en"),
            (2, "cat feline", "de"),
            (3, "hund auto haus", "de"),
        ],
        "doc_id long, text string, lang string",
    )
    rows = T.dsir_importance_weights(docs).collect()
    assert [r["doc_id"] for r in rows] == [2, 3]
    assert rows[0]["dsir_weight"] > rows[1]["dsir_weight"]
    # the cat-like candidate must score ABOVE zero (target-like),
    # the unrelated one below (every token unseen in target)
    assert rows[0]["dsir_weight"] > 0 > rows[1]["dsir_weight"]


def test_dsir_excludes_target_docs(spark):
    docs = spark.createDataFrame(
        [(0, "a b", "en"), (1, "a b", "fr")],
        "doc_id long, text string, lang string",
    )
    rows = T.dsir_importance_weights(docs).collect()
    assert [r["doc_id"] for r in rows] == [1]


def test_nbinom_hand_computed(spark):
    # per-order counts 1,2,3,6: m=3, v=14/3, disp=14/9, r=27/5, p=9/14
    rows = []
    for ok, cnt in [(1, 1), (2, 2), (3, 3), (4, 6)]:
        rows += [(ok, i) for i in range(cnt)]
    li = spark.createDataFrame(rows, "l_orderkey long, l_linenumber int")
    out = R.nbinom_lines_fit(li).collect()[0]
    assert out["n_orders"] == 4
    assert abs(out["mean_lines"] - 3.0) < 1e-9
    assert abs(out["var_lines"] - 14.0 / 3.0) < 1e-6
    assert abs(out["dispersion"] - 14.0 / 9.0) < 1e-6
    assert abs(out["nb_r"] - 5.4) < 1e-6
    assert abs(out["nb_p"] - 9.0 / 14.0) < 1e-6


def test_nbinom_underdispersed_yields_null_fit(spark):
    # constant counts: v = 0 < m -> dispersion 0, NULL r/p
    rows = [(ok, i) for ok in (1, 2, 3) for i in range(2)]
    li = spark.createDataFrame(rows, "l_orderkey long, l_linenumber int")
    out = R.nbinom_lines_fit(li).collect()[0]
    assert out["dispersion"] == 0.0
    assert out["nb_r"] is None and out["nb_p"] is None
