"""Wave-192 operator: leave-one-out kNN classifier evaluation."""

from __future__ import annotations

from simple_vector_spark.operators import knn as K


def _emb(spark, rows):
    return spark.createDataFrame(
        [(i, [float(x) for x in v], lab) for i, (v, lab) in enumerate(rows)],
        "vec_id long, embedding array<double>, label int",
    )


def test_loo_separable_clusters_perfect(spark):
    # two tight clusters far apart: every vector's 3 neighbors share
    # its label -> accuracy 1.0 for both labels
    rows = [([0.0, 0.0], 0), ([0.1, 0.0], 0), ([0.0, 0.1], 0),
            ([0.1, 0.1], 0),
            ([9.0, 9.0], 1), ([9.1, 9.0], 1), ([9.0, 9.1], 1),
            ([9.1, 9.1], 1)]
    out = {r["label"]: r for r in K.knn_loo_accuracy(_emb(spark, rows), k=3).collect()}
    assert out[0]["accuracy"] == 1.0 and out[1]["accuracy"] == 1.0
    assert out[0]["n"] == 4 and out[1]["n"] == 4


def test_loo_isolated_point_misclassified(spark):
    # a lone label-1 point inside a label-0 cluster: its neighbors are
    # all label 0 -> label 1 accuracy 0, label 0 still 1.0
    rows = [([0.0, 0.0], 0), ([0.2, 0.0], 0), ([0.0, 0.2], 0),
            ([0.2, 0.2], 0), ([0.1, 0.1], 1)]
    out = {r["label"]: r for r in K.knn_loo_accuracy(_emb(spark, rows), k=3).collect()}
    assert out[1]["n"] == 1 and out[1]["n_correct"] == 0
    assert out[0]["accuracy"] == 1.0


def test_loo_vote_tiebreak_smaller_label(spark):
    # k=2 with one neighbor of each label -> tie -> smaller label wins
    rows = [([0.0], 5), ([1.0], 3), ([2.0], 9)]
    out = {r["label"]: r for r in K.knn_loo_accuracy(_emb(spark, rows), k=2).collect()}
    # middle vector (label 3) has neighbors {5, 9}: tie -> predict 5
    assert out[3]["n_correct"] == 0
