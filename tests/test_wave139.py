"""Wave-139 operators: graph-ANN index health."""

from __future__ import annotations

import random

from simple_vector_spark.operators import ann as A


def test_graph_health_invariants(spark, sf_dir):
    from simple_vector_spark.sources.loaders import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    out = A.knn_graph_health(emb, A.fit_vectors(emb, A.CENTROID_IDS)).collect()[0]
    assert 0 <= out["reciprocity"] <= 1
    assert out["n_mutual"] <= out["n_edges"]
    assert out["max_in_degree"] >= 1
    assert 0 <= out["orphan_share"] < 1
    # every node has out-degree <= GRAPH_DEGREE, so edges <= nodes * degree
    assert out["n_edges"] <= out["n_nodes"] * A.GRAPH_DEGREE


def test_graph_health_clustered_data_is_reciprocal(spark):
    # tight, well-separated clusters: neighborhoods are symmetric, so
    # reciprocity should be high and hubs mild
    rng = random.Random(7)
    rows = [
        (vid, [10.0 * (vid // 40) + 0.5 * rng.random() for _ in range(8)])
        for vid in range(200)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = A.fit_vectors(emb, [0, 40, 80, 120, 160])
    out = A.knn_graph_health(emb, cents).collect()[0]
    assert out["reciprocity"] > 0.5
    assert out["orphan_share"] < 0.3
