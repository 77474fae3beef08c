"""Wave-114/115/116 operators: SimHash bit balance, Hill tail index,
categorical mutual information."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from simple_vector_spark.operators import dedup as D
from simple_vector_spark.operators import relational as R
from simple_vector_spark.sources.loaders import load_table


def test_simhash_bit_balance_covers_all_bits(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text", "source")
    out = D.simhash_bit_balance(docs).collect()
    assert sorted(r["bit"] for r in out) == list(range(16))
    n = out[0]["n_docs"]
    for r in out:
        assert r["n_docs"] == n
        assert 0 <= r["share_set"] <= 1
        assert abs(r["abs_dev"] - abs(r["share_set"] - 0.5)) < 1e-9


def test_simhash_bit_balance_detects_pinned_bit(spark):
    # identical docs -> every bit identical across the corpus -> every
    # bit fully pinned (share 0 or 1, abs_dev 0.5)
    docs = spark.createDataFrame(
        [(i, "the same exact words here every time", "s") for i in range(8)],
        "doc_id long, text string, source string",
    )
    out = D.simhash_bit_balance(docs).collect()
    assert all(r["abs_dev"] == 0.5 for r in out)


def test_hill_estimator_recovers_pareto_alpha(spark):
    # x = scale / U^(1/alpha) draws with alpha = 2: the Hill estimate
    # over the top-100 of 2000 deterministic inverse-CDF samples must
    # land near 2.
    alpha = 2.0
    rows = [
        (i, 100.0 / ((1.0 - (i + 0.5) / 2000.0) ** (1.0 / alpha)))
        for i in range(2000)
    ]
    orders = spark.createDataFrame(
        rows, "o_orderkey long, o_totalprice double"
    ).withColumn("o_totalprice", F.col("o_totalprice").cast("decimal(15,2)"))
    out = R.hill_tail_index(orders).collect()[0]
    assert out["k"] == R.HILL_K
    assert 1.5 < out["tail_alpha"] < 2.6, out


def test_mutual_info_bounds_and_independence(spark):
    # y == x (perfect dependence): MI = H(x) = H(y), NMI = 1
    dep = spark.createDataFrame(
        [(i, f"b{i % 4}", f"t{i % 4}") for i in range(40)],
        "p_partkey long, p_brand string, p_type string",
    )
    out = R.categorical_mutual_info(dep).collect()[0]
    assert abs(out["mi_bits"] - out["h_x_bits"]) < 1e-6
    assert abs(out["nmi"] - 1.0) < 1e-6
    # independent uniform grid: MI = 0
    ind = spark.createDataFrame(
        [(i, f"b{i % 4}", f"t{(i // 4) % 4}") for i in range(160)],
        "p_partkey long, p_brand string, p_type string",
    )
    out2 = R.categorical_mutual_info(ind).collect()[0]
    assert abs(out2["mi_bits"]) < 1e-6
