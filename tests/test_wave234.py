"""Wave-234 operator: per-label silhouette."""

from __future__ import annotations

from simple_vector_spark.operators import knn as K


def _emb(spark, rows):
    return spark.createDataFrame(
        [(i, [float(x) for x in v], lab) for i, (v, lab) in enumerate(rows)],
        "vec_id long, embedding array<double>, label int",
    )


def test_silhouette_separated_clusters_near_one(spark):
    rows = [([0.0, 0.0], 0), ([0.1, 0.0], 0), ([0.0, 0.1], 0),
            ([50.0, 50.0], 1), ([50.1, 50.0], 1), ([50.0, 50.1], 1)]
    out = {r["label"]: r for r in K.label_silhouette(_emb(spark, rows)).collect()}
    assert out[0]["mean_silhouette"] > 0.99
    assert out[1]["mean_silhouette"] > 0.99
    assert out[0]["negative_share"] == 0.0


def test_silhouette_misfiled_point_negative(spark):
    # a label-1 point inside the label-0 cluster scores negative
    rows = [([0.0, 0.0], 0), ([0.2, 0.0], 0), ([0.0, 0.2], 0),
            ([0.1, 0.1], 1), ([50.0, 50.0], 1), ([50.2, 50.0], 1)]
    out = {r["label"]: r for r in K.label_silhouette(_emb(spark, rows)).collect()}
    assert out[1]["negative_share"] > 0.3
    assert out[1]["mean_silhouette"] < out[0]["mean_silhouette"]
