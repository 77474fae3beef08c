"""Wave-60 operators: streaming PIT, k-anonymity, calibration bins."""

from __future__ import annotations

from pyspark.sql import functions as F

from simple_vector_spark.operators import curation as CU
from simple_vector_spark.operators import relational as R


def test_stream_pit_matches_batch_pit(spark, sf_dir):
    from simple_vector_spark import registry as REG

    stream = {tuple(r) for r in REG.stream_pit_enrich(spark, sf_dir).collect()}
    batch = {tuple(r) for r in REG.events_pit_user_state(spark, sf_dir).collect()}
    assert stream == batch


def test_k_anonymity_flags_small_classes(spark):
    rows = [(i, 0, "SEG_A") for i in range(10)] + [(100, 1, "SEG_B")]
    customer = spark.createDataFrame(
        rows, "c_custkey long, c_nationkey long, c_mktsegment string"
    )
    r = CU.k_anonymity_audit(customer, k=5).collect()[0]
    assert r["n_classes"] == 2
    assert r["min_class_size"] == 1
    assert r["rows_below_k"] == 1       # the singleton class
    assert r["k_anonymous"] is False
    assert r["min_l_diversity"] == 1


def test_calibration_bins_monotone_score_and_bounds(spark):
    rows = []
    for i in range(100):
        price = 100.0 + i * 10           # spread across bins
        prio = "1-URGENT" if i >= 50 else "5-LOW"  # top half positive
        rows.append((float(price), prio))
    orders = spark.createDataFrame(rows, "o_totalprice double, o_orderpriority string")
    out = sorted(R.calibration_bins(orders).collect(), key=lambda r: r["bin"])
    assert [r["bin"] for r in out] == list(range(10))
    assert sum(r["n"] for r in out) == 100
    # mean_score must rise with the bin, scores within [0,1]
    means = [r["mean_score"] for r in out]
    assert means == sorted(means)
    assert all(0.0 <= m <= 1.0 for m in means)
    # bottom bins all negative, top bins all positive
    assert out[0]["pos_rate"] == 0.0
    assert out[9]["pos_rate"] == 1.0
