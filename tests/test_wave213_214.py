"""Waves 213-214: kNN-OOD scores, GPD tail fit."""

from __future__ import annotations

from simple_vector_spark.operators import knn as K
from simple_vector_spark.operators import relational as R


def test_knn_ood_isolated_point_first(spark):
    vecs = [(i, [float(i % 5) * 0.1, float(i // 5) * 0.1]) for i in range(25)]
    vecs.append((99, [50.0, 50.0]))  # far away
    emb = spark.createDataFrame(
        [(i, v) for i, v in vecs], "vec_id long, embedding array<double>"
    )
    out = K.knn_ood_scores(emb).collect()
    assert out[0]["vec_id"] == 99
    assert out[0]["ood_score"] > 10 * out[1]["ood_score"]
    # isolated point: even its FIRST neighbor is far
    assert out[0]["dist_nn1"] > 50.0


def _orders(spark, vals):
    return spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(vals)],
        "o_orderkey long, o_totalprice double",
    )


def test_gpd_bounded_tail_negative_xi(spark):
    # body uniform [0,100], tail uniform [100,150]: GPD xi for a
    # uniform exceedance distribution is -1
    body = [100.0 * (i + 0.5) / 1900 for i in range(1900)]
    tail = [100.0 + 50.0 * (i + 0.5) / 100 for i in range(100)]
    out = R.gpd_tail_fit(_orders(spark, body + tail)).collect()[0]
    assert out["gpd_xi"] < -0.5
    assert out["tail_class"] == "bounded"
    # bounded tail: 10N return level cannot blow far past the max
    assert out["return_level_10n"] < 200.0


def test_gpd_heavy_tail_positive_xi(spark):
    # Pareto-type exceedances with xi = 0.5
    body = [100.0 * (i + 0.5) / 1900 for i in range(1900)]
    tail = [
        100.0 + 10.0 * ((1 - (i + 0.5) / 100) ** -0.5 - 1.0)
        for i in range(100)
    ]
    out = R.gpd_tail_fit(_orders(spark, body + tail)).collect()[0]
    assert out["gpd_xi"] > 0.2
    assert out["tail_class"] == "heavy"
    assert out["return_level_10n"] > max(tail)
