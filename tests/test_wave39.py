"""Wave-39 operators: keep-best dedup, centroid classifier eval,
revenue forecast, vocab coverage curve."""

from __future__ import annotations

from pyspark.sql import functions as F

from simple_vector_spark.operators import dedup as D
from simple_vector_spark.operators import knn as K
from simple_vector_spark.operators import relational as R
from simple_vector_spark.operators import text_analysis as T


def test_keep_best_picks_highest_quality(spark):
    labels = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (10, 10), (11, 10)], "node long, cluster long"
    )
    scored = spark.createDataFrame(
        [(1, 0.2), (2, 0.9), (3, 0.5), (10, 0.4), (11, 0.4)],
        "doc_id long, quality double",
    )
    out = {r["cluster"]: r for r in D.cluster_keep_best(labels, scored).collect()}
    assert out[1]["keeper"] == 2 and out[1]["n_members"] == 3
    assert abs(out[1]["keeper_quality"] - 0.9) < 1e-9
    # tie on quality -> min node wins
    assert out[10]["keeper"] == 10 and out[10]["n_members"] == 2


def test_centroid_accuracy_separable_labels(spark):
    # two well-separated label blobs -> 100% accuracy for both
    rows = [(i, [0.0 + 0.01 * i, 0.0], 0) for i in range(5)] + [
        (10 + i, [5.0 + 0.01 * i, 5.0], 1) for i in range(5)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    out = {r["label"]: r for r in K.label_centroid_accuracy(emb).collect()}
    assert out[0]["accuracy"] == 1.0 and out[1]["accuracy"] == 1.0
    assert out[0]["n"] == 5 and out[0]["n_correct"] == 5


def test_centroid_accuracy_mislabeled_point(spark):
    # one label-1 point sits inside the label-0 blob -> misclassified
    rows = [(i, [0.0, 0.0 + 0.01 * i], 0) for i in range(5)] + [
        (10 + i, [5.0, 5.0 + 0.01 * i], 1) for i in range(4)
    ] + [(99, [0.0, 0.02], 1)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    out = {r["label"]: r for r in K.label_centroid_accuracy(emb).collect()}
    assert out[1]["n"] == 5 and out[1]["n_correct"] == 4
    assert abs(out[1]["accuracy"] - 0.8) < 1e-9


def test_forecast_recovers_exact_linear_trend(spark):
    # revenue = 100 + 10*t exactly -> slope 10, intercept 100
    import datetime as dt

    rows = []
    oid = 0
    for t in range(6):
        # month t has one order worth 100 + 10t
        d = dt.date(1992, 1 + t, 15)
        rows.append((oid, d, float(100 + 10 * t)))
        oid += 1
    orders = spark.createDataFrame(
        rows, "o_orderkey long, o_orderdate date, o_totalprice double"
    )
    r = R.monthly_revenue_forecast(orders).collect()[0]
    assert r["n"] == 6
    assert abs(r["slope"] - 10.0) < 1e-6
    assert abs(r["intercept"] - 100.0) < 1e-6
    assert abs(r["forecast_next"] - 160.0) < 1e-6


def test_vocab_coverage_monotone_and_exact(spark):
    docs = spark.createDataFrame(
        [(1, "a a a a b b c"), (2, "a b d")], "doc_id long, text string"
    )
    rows = {r["top_k"]: r for r in T.vocab_coverage_curve(docs, points=(1, 2, 10)).collect()}
    # a:5 b:3 c:1 d:1, total 10
    assert rows[1]["covered_tokens"] == 5 and abs(rows[1]["coverage"] - 0.5) < 1e-9
    assert rows[2]["covered_tokens"] == 8 and abs(rows[2]["coverage"] - 0.8) < 1e-9
    assert rows[10]["n_types"] == 4 and rows[10]["coverage"] == 1.0
