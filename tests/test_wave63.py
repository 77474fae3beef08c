"""Wave-63 operators: streaming z-score, isotropy, PSI drift."""

from __future__ import annotations

from pyspark.sql import functions as F

from simple_vector_spark.operators import ann as A
from simple_vector_spark.operators import relational as R


def test_stream_zscore_matches_batch(spark, sf_dir):
    from simple_vector_spark import registry as REG

    stream = {tuple(r) for r in REG.stream_anomaly_zscore(spark, sf_dir).collect()}
    batch = {tuple(r) for r in REG.events_anomaly_zscore(spark, sf_dir).collect()}
    assert stream == batch


def test_isotropy_centered_vs_collapsed(spark):
    # symmetric point cloud -> mean ~ 0 -> tiny ratio
    sym = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [-1.0, 0.0]), (3, [0.0, 1.0]), (4, [0.0, -1.0])],
        "vec_id long, embedding array<double>",
    )
    r = A.isotropy_audit(sym).collect()[0]
    assert r["mean_vec_norm"] == 0.0
    assert r["anisotropy_ratio"] == 0.0
    assert abs(r["avg_vec_norm"] - 1.0) < 1e-6
    # collapsed cloud: every vector identical -> ratio 1
    col = spark.createDataFrame(
        [(i, [3.0, 4.0]) for i in range(4)], "vec_id long, embedding array<double>"
    )
    r2 = A.isotropy_audit(col).collect()[0]
    assert abs(r2["anisotropy_ratio"] - 1.0) < 1e-5
    assert abs(r2["mean_vec_norm"] - 5.0) < 1e-5


def test_psi_identical_halves_near_zero(spark):
    # both halves drawn from the same values -> PSI ~ 0; shares sum to 1
    rows = [(k, 100.0 + (k % 50)) for k in range(2000)]
    orders = spark.createDataFrame(rows, "o_orderkey long, o_totalprice double")
    out = R.psi_drift(orders).collect()
    total_psi = float(sum(r["psi_term"] for r in out))
    assert total_psi < 0.02  # hash halves of one population are stable
    assert abs(sum(r["share_a"] for r in out) - 1.0) < 1e-4
    assert abs(sum(r["share_b"] for r in out) - 1.0) < 1e-4
