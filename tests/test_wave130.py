"""Wave-130 operators: RFM k-means segmentation."""

from __future__ import annotations

from pyspark.sql import functions as F

from simple_vector_spark.operators import relational as R
from simple_vector_spark.sources.loaders import load_table


def test_rfm_kmeans_partitions_all_customers(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    out = R.rfm_kmeans_segments(orders).collect()
    n_cust = orders.select("o_custkey").distinct().count()
    assert sum(r["n_customers"] for r in out) == n_cust
    assert len(out) <= len(R.RFM_KMEANS_SEEDS)
    # z-scored centroids stay within a few sigma
    for r in out:
        for c in ("centroid_recency_z", "centroid_frequency_z", "centroid_monetary_z"):
            assert abs(r[c]) < 6


def test_rfm_kmeans_is_deterministic(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    a = sorted(map(tuple, R.rfm_kmeans_segments(orders).collect()))
    b = sorted(map(tuple, R.rfm_kmeans_segments(orders).collect()))
    assert a == b
