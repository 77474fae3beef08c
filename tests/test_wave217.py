"""Wave-217 operator: linear CKA between embedding views."""

from __future__ import annotations

import random

from simple_vector_spark.operators import ann as A


def _emb(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )


def test_cka_identity_when_tail_dims_are_noise_free_copies(spark):
    # variance lives ONLY in the first 16 dims; dims 17..64 constant:
    # truncation loses nothing -> CKA = 1 for both views
    rng = random.Random(11)
    vecs = [
        [rng.uniform(-1, 1) for _ in range(16)] + [0.5] * 48
        for _ in range(120)
    ]
    out = A.linear_cka_views(_emb(spark, vecs)).collect()[0]
    assert abs(out["cka_dim32"] - 1.0) < 1e-6
    assert abs(out["cka_dim16"] - 1.0) < 1e-6
    assert out["n_vecs"] == 120


def test_cka_drops_when_information_is_in_the_tail(spark):
    # independent variance everywhere: the 16-dim view keeps less of
    # the geometry than the 32-dim view; ordering must hold
    rng = random.Random(12)
    vecs = [[rng.uniform(-1, 1) for _ in range(64)] for _ in range(150)]
    out = A.linear_cka_views(_emb(spark, vecs)).collect()[0]
    assert 0.0 < out["cka_dim16"] < out["cka_dim32"] < 1.0
