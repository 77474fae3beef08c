"""Wave-100/101 operators: trimmed/winsorized means, DP release."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from simple_vector_spark.operators import curation as CU
from simple_vector_spark.operators import relational as R
from simple_vector_spark.sources.loaders import load_table


def test_trimmed_mean_is_outlier_tolerant(spark):
    # 18 values of 100 plus outliers 1 and 10000: the 5%-trim (floor
    # of 20*0.05 = 1 from each tail) removes exactly the outliers.
    rows = [(i, 1, "N", 100.00) for i in range(18)]
    rows += [(98, 1, "N", 1.00), (99, 1, "N", 10000.00)]
    li = spark.createDataFrame(
        rows, "l_orderkey long, l_linenumber int, l_returnflag string, l_extendedprice double"
    ).withColumn(
        "l_extendedprice", F.col("l_extendedprice").cast("decimal(15,2)")
    )
    out = R.trimmed_winsorized_stats(li).collect()[0]
    assert out["n"] == 20
    assert out["n_trimmed_each"] == 1
    assert abs(out["trimmed_mean"] - 100.0) < 1e-9
    # winsorized: tails clamped to the surviving bounds (100, 100)
    assert abs(out["winsorized_mean"] - 100.0) < 1e-9
    # plain mean is dragged by the 10000 outlier
    assert out["mean"] > 500


def test_trimmed_mean_ordering_invariants(spark, sf_dir):
    out = {
        r["flag"]: r
        for r in R.trimmed_winsorized_stats(
            load_table(spark, sf_dir, "lineitem")
        ).collect()
    }
    for r in out.values():
        # winsorized lies between trimmed and plain-mean extremes
        lo, hi = sorted((r["trimmed_mean"], r["mean"]))
        assert r["n_trimmed_each"] == math.floor(r["n"] * R.TRIM_FRAC)
        assert r["winsorized_mean"] > 0


def test_dp_release_noise_magnitude_scales_with_epsilon(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    tight = CU.dp_noisy_counts(orders, customer, nation, eps=1.0).collect()
    loose = CU.dp_noisy_counts(orders, customer, nation, eps=0.1).collect()
    t = {r["nation"]: r["abs_err"] for r in tight}
    l = {r["nation"]: r["abs_err"] for r in loose}
    for nat in t:
        # same uniform draw, 10x smaller epsilon -> 10x the noise
        assert abs(l[nat] - 10 * t[nat]) < 1e-4, nat
    # true counts never change and noise is deterministic
    again = CU.dp_noisy_counts(orders, customer, nation, eps=1.0).collect()
    assert sorted(map(tuple, tight)) == sorted(map(tuple, again))
