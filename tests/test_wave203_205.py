"""Waves 203-205: Leontief multipliers, Dickey-Fuller, intrinsic dim."""

from __future__ import annotations

import datetime as dt
import math
import random

from simple_vector_spark.operators import knn as K
from simple_vector_spark.operators import relational as R


def test_leontief_two_nation_chain(spark):
    # single flow A -> B with damp 0.8: a_AB = 0.8
    # v0 = (1,1); vk = (0, 0.8^k applied from A's supply into B)
    # multiplier_B = 1 + 0.8 + 0 + ... (A feeds B once; A has no input)
    nation = spark.createDataFrame(
        [(0, "NA"), (1, "NB")], "n_nationkey long, n_name string"
    )
    supplier = spark.createDataFrame([(10, 0)], "s_suppkey long, s_nationkey long")
    customer = spark.createDataFrame([(20, 1)], "c_custkey long, c_nationkey long")
    orders = spark.createDataFrame([(100, 20)], "o_orderkey long, o_custkey long")
    lineitem = spark.createDataFrame(
        [(100, 10, 50.0)], "l_orderkey long, l_suppkey long, l_extendedprice double"
    )
    out = {r["nation"]: r for r in R.leontief_multipliers(
        lineitem, orders, customer, supplier, nation
    ).collect()}
    # demand in B pulls 0.8 units through A once: m_B = 1.8; m_A = 1.0
    assert abs(out["NB"]["output_multiplier"] - 1.8) < 1e-6
    assert abs(out["NA"]["output_multiplier"] - 1.0) < 1e-6


def _orders(spark, vals):
    rows = [
        (k, dt.date(2018 + k // 12, k % 12 + 1, 15), float(v))
        for k, v in enumerate(vals)
    ]
    return spark.createDataFrame(
        rows, "o_orderkey long, o_orderdate date, o_totalprice double"
    )


def test_dickey_fuller_mean_reverting_vs_walk(spark):
    rng = random.Random(7)
    # strongly mean-reverting AR(1) with phi = 0.2
    y, series_mr = 100.0, []
    for _ in range(60):
        y = 50 + 0.2 * y + rng.uniform(-5, 5)
        series_mr.append(y + 100)
    out_mr = R.dickey_fuller_test(_orders(spark, series_mr)).collect()[0]
    assert out_mr["stationary_5pct"] == 1
    assert out_mr["df_tau"] < -2.86
    # a near-random-walk (phi ~ 1) must NOT reject
    y, series_rw = 100.0, []
    for _ in range(60):
        y = y + rng.uniform(-2, 2)
        series_rw.append(y + 1000)
    out_rw = R.dickey_fuller_test(_orders(spark, series_rw)).collect()[0]
    assert out_rw["stationary_5pct"] == 0


def _emb(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )


def test_intrinsic_dim_recovers_planted_dimension(spark):
    rng = random.Random(3)
    # 300 points uniform in a 2-D square embedded in 8-D ambient space
    vecs = [[rng.uniform(0, 1), rng.uniform(0, 1)] + [0.0] * 6
            for _ in range(300)]
    out = K.twonn_intrinsic_dim(_emb(spark, vecs)).collect()[0]
    assert 1.4 < out["intrinsic_dim"] < 2.8
    assert out["n_dupes"] == 0
    # 1-D line in the same ambient space
    vecs1 = [[rng.uniform(0, 100)] + [0.0] * 7 for _ in range(300)]
    out1 = K.twonn_intrinsic_dim(_emb(spark, vecs1)).collect()[0]
    assert 0.6 < out1["intrinsic_dim"] < 1.5


def test_intrinsic_dim_duplicates_excluded(spark):
    vecs = [[0.0, 0.0], [0.0, 0.0], [1.0, 0.0], [2.0, 1.0], [3.0, 2.0]]
    out = K.twonn_intrinsic_dim(_emb(spark, vecs)).collect()[0]
    assert out["n_dupes"] == 2
    assert out["n_valid"] == 3
