"""Wave-188 operator: Cochran-Mantel-Haenszel stratified test."""

from __future__ import annotations

import datetime as dt

from simple_vector_spark.operators import relational as R


def _tables(spark, strata):
    # strata: {year: (a, b, c, d)} with exposure = PROMO, outcome = 'R'
    part = spark.createDataFrame(
        [(1, "PROMO BRUSHED"), (2, "STANDARD BURNISHED")],
        "p_partkey long, p_type string",
    )
    rows = []
    for yr, (a, b, c, d) in strata.items():
        date = dt.date(yr, 6, 1)
        rows += [(1, date, "R")] * a
        rows += [(1, date, "N")] * b
        rows += [(2, date, "R")] * c
        rows += [(2, date, "N")] * d
    li = spark.createDataFrame(
        rows, "l_partkey long, l_shipdate date, l_returnflag string"
    )
    return li, part


def test_cmh_pure_confounding_adjusts_to_null(spark):
    # within each year OR = 1, but pooling both inflates the crude OR:
    # CMH must report chi2 ~ 0 and OR_MH = 1 while or_crude >> 1
    li, part = _tables(
        spark, {1996: (16, 4, 4, 1), 1997: (1, 4, 4, 16)}
    )
    out = R.cmh_promo_returns(li, part).collect()[0]
    assert out["n_strata"] == 2
    assert abs(out["cmh_chi2"]) < 1e-9
    assert abs(out["or_mh"] - 1.0) < 1e-6
    assert out["or_crude"] > 4.0


def test_cmh_detects_real_stratified_effect(spark):
    # promo lines return 3x as often in BOTH years -> chi2 large,
    # OR_MH near the common odds ratio
    li, part = _tables(
        spark, {1996: (30, 10, 10, 10), 1997: (30, 10, 10, 10)}
    )
    out = R.cmh_promo_returns(li, part).collect()[0]
    assert out["cmh_chi2"] > 3.84  # p < 0.05 at 1 df
    assert out["or_mh"] > 2.0
