"""Wave-183 operator: large-star/small-star connected components."""

from __future__ import annotations

from simple_vector_spark.operators import dedup as D


def _pairs(spark, edges):
    return spark.createDataFrame(edges, "doc_a long, doc_b long")


def _labels(df):
    return {r["node"]: r["cluster"] for r in df.collect()}


def test_star_cc_matches_components(spark):
    # components: {1,2,3}, {10,11}, chain {20..24}
    edges = [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 23), (23, 24)]
    out = _labels(D.dup_clusters_star(_pairs(spark, edges)))
    assert {out[n] for n in (1, 2, 3)} == {1}
    assert {out[n] for n in (10, 11)} == {10}
    assert {out[n] for n in (20, 21, 22, 23, 24)} == {20}
    assert len(out) == 10


def test_star_cc_long_chain_few_rounds(spark):
    # a 64-node chain: diameter 63, but star rounds collapse it within
    # the 12-round cap (label propagation would need ~63)
    edges = [(i, i + 1) for i in range(64)]
    out = _labels(D.dup_clusters_star(_pairs(spark, edges), max_iter=12))
    assert set(out.values()) == {0}
    assert len(out) == 65


def test_star_cc_agrees_with_label_propagation(spark):
    edges = [(5, 9), (9, 3), (14, 2), (2, 8), (8, 5), (30, 31)]
    a = _labels(D.dup_clusters_star(_pairs(spark, edges)))
    b = _labels(D.dup_clusters(_pairs(spark, edges)))
    assert a == b
