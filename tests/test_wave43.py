"""Wave-43 operators: retrieval metrics (MRR/nDCG), nucleus audit."""

from __future__ import annotations

from pyspark.sql import functions as F

from simple_vector_spark.operators import knn as K
from simple_vector_spark.operators import text_analysis as T


def test_retrieval_metrics_perfect_and_worst(spark):
    # label 0: a tight clump near the two queries -> all top hits
    # relevant (ndcg 1, rr 1). label 1: far away.
    rows = []
    for i in range(12):
        rows.append((i, [0.0 + 0.01 * i, 0.0], 0))
    for i in range(12, 24):
        rows.append((i, [50.0 + 0.01 * i, 50.0], 1))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    out = {r["query_id"]: r for r in K.retrieval_metrics(emb, n_queries=2, k=5).collect()}
    for q in (0, 1):
        assert out[q]["first_rel_rank"] == 1
        assert out[q]["rr"] == 1.0
        assert out[q]["ndcg"] == 1.0


def test_retrieval_metrics_no_relevant_in_topk(spark):
    # query label 0 has exactly one other member, placed far beyond 10
    # closer label-1 vectors -> first_rel_rank 0, rr 0, ndcg 0
    rows = [(0, [0.0, 0.0], 0)]
    for i in range(1, 13):
        rows.append((i, [0.1 * i, 0.0], 1))
    rows.append((99, [100.0, 0.0], 0))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    out = {r["query_id"]: r for r in K.retrieval_metrics(emb, n_queries=1, k=10).collect()}
    assert out[0]["first_rel_rank"] == 0
    assert out[0]["rr"] == 0.0
    assert out[0]["ndcg"] == 0.0


def test_nucleus_audit_spiky_vs_flat(spark):
    # context 'a': next token 'x' 9 times, 'y' once -> nucleus at 0.9
    # is just {x}. context 'b': 4 distinct nexts equally -> nucleus 4
    # (0.25 each; cum-pp < .9 for all four).
    docs = spark.createDataFrame(
        [(1, "a x " * 9 + "a y"), (2, "b p b q b r b s")],
        "doc_id long, text string",
    )
    out = {
        r["ctx"]: r
        for r in T.bigram_nucleus_audit(docs, n_contexts=4).collect()
    }
    assert out["a"]["n_occurrences"] == 10
    assert out["a"]["nucleus_size"] == 1
    assert abs(out["a"]["nucleus_mass"] - 0.9) < 1e-9
    assert out["b"]["nucleus_size"] == 4
    assert abs(out["b"]["nucleus_mass"] - 1.0) < 1e-9
