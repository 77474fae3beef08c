"""Waves 215-216: Burrows' Delta, quantile treatment effects."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from simple_vector_spark.functions.text import md5_int
from simple_vector_spark.operators import events as E
from simple_vector_spark.operators import text_analysis as T


def test_burrows_delta_mirrored_sources_most_similar(spark):
    style_a = "the quick brown fox and the lazy dog run in the park "
    style_b = "alpha beta gamma delta epsilon zeta eta theta iota kappa "
    docs = spark.createDataFrame(
        [(0, "mirror1", style_a * 5), (1, "mirror2", style_a * 5),
         (2, "other", style_b * 5)],
        "doc_id long, source string, text string",
    )
    rows = T.burrows_delta_pairs(docs).collect()
    assert (rows[0]["source_a"], rows[0]["source_b"]) == ("mirror1", "mirror2")
    assert rows[0]["delta"] < rows[-1]["delta"] or len(rows) == 1
    assert abs(rows[0]["delta"]) < 1e-6  # identical style -> Delta 0


def test_qte_uniform_vs_tail_shift(spark):
    # build users, find their arms, then give TREATMENT users +100
    # only in the top half of their base value -> QTE grows with decile
    ids = spark.range(200).withColumnRenamed("id", "user_id")
    arms = {
        r["user_id"]: r["arm"]
        for r in ids.select(
            "user_id",
            (md5_int(F.col("user_id").cast("string")) % 2).cast("int").alias("arm"),
        ).collect()
    }
    rows, eid = [], 0
    for uid, arm in arms.items():
        base_v = float(uid % 100)
        v = base_v + (100.0 if arm == 1 and base_v >= 50 else 0.0)
        rows.append((eid, dt.datetime(2024, 1, 1), uid, v)); eid += 1
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double"
    )
    out = {r["decile"]: r for r in E.quantile_treatment_effects(ev).collect()}
    assert len(out) == 9
    # low deciles: no effect; high deciles: ~+100
    assert abs(out[10]["qte"]) < 15.0
    assert out[90]["qte"] > 60.0
    assert out[90]["qte"] > out[10]["qte"]
