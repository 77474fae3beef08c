"""Wave-228 operator: hubness audit."""

from __future__ import annotations

from simple_vector_spark.operators import knn as K


def _emb(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )


def test_hubness_uniform_ring_low_skew(spark):
    # evenly spaced 1-D line: everyone has ~the same k-occurrence
    out = K.hubness_audit(
        _emb(spark, [[float(i)] for i in range(40)]), k=2
    ).collect()[0]
    assert abs(out["nk_skewness"]) < 1.0
    assert out["max_nk"] <= 4


def test_hubness_planted_hub(spark):
    # a central point inside several far-apart satellite pairs: the
    # center joins many neighbor lists -> positive skew, big max hub
    vecs = [[0.0, 0.0]]
    import math
    for j in range(4):
        ang = 2 * math.pi * j / 4
        # pairs far apart from each other, each closer to the center
        # than to any other pair
        vecs.append([10 * math.cos(ang), 10 * math.sin(ang)])
        vecs.append([11 * math.cos(ang), 11 * math.sin(ang)])
    out = K.hubness_audit(_emb(spark, vecs), k=2).collect()[0]
    assert out["n_vecs"] == 9
    assert out["max_nk"] == 8  # the center is in every satellite's 2-NN
    assert out["nk_skewness"] > 1.0
