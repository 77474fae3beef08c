"""Wave-166 operator: closed-form multiple OLS via Cramer's rule."""

from __future__ import annotations

from simple_vector_spark.operators import relational as R


def _lineitem(spark, rows):
    return spark.createDataFrame(
        [(float(q), float(d), float(p)) for q, d, p in rows],
        "l_quantity double, l_discount double, l_extendedprice double",
    )


def test_ols_recovers_exact_plane(spark):
    # p = 2 + 3q - 5d exactly -> betas recovered, R^2 == 1
    rows = [
        (q, d, 2 + 3 * q - 5 * d)
        for q in (1, 2, 3, 4)
        for d in (0.0, 0.5, 1.0)
    ]
    out = R.ols_price_model(_lineitem(spark, rows)).collect()[0]
    assert out["n"] == 12
    assert abs(out["b0_intercept"] - 2.0) < 1e-5
    assert abs(out["b1_quantity"] - 3.0) < 1e-5
    assert abs(out["b2_discount"] + 5.0) < 1e-5
    assert abs(out["r2"] - 1.0) < 1e-6


def test_ols_pure_noise_r2_near_zero(spark):
    # y unrelated to (q, d): R^2 must be far from 1 and >= 0
    rows = [
        (1, 0.0, 10), (2, 0.0, -10), (3, 0.0, 10), (4, 0.0, -10),
        (1, 1.0, -10), (2, 1.0, 10), (3, 1.0, -10), (4, 1.0, 10),
    ]
    out = R.ols_price_model(_lineitem(spark, rows)).collect()[0]
    assert -1e-6 <= out["r2"] < 0.5


def test_ols_singular_design_yields_nulls(spark):
    # discount constant AND quantity constant -> X'X singular -> NULL
    # betas rather than an ANSI divide-by-zero failure
    rows = [(2, 0.1, 5), (2, 0.1, 7), (2, 0.1, 9)]
    out = R.ols_price_model(_lineitem(spark, rows)).collect()[0]
    assert out["b1_quantity"] is None and out["b2_discount"] is None
