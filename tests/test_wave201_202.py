"""Waves 201-202: Kneser-Ney bigram LM, IPS/SNIPS off-policy eval."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from simple_vector_spark.functions.text import md5_int
from simple_vector_spark.operators import events as E
from simple_vector_spark.operators import text_analysis as T


def test_kn_repetitive_source_lower_perplexity(spark):
    docs = spark.createDataFrame(
        [(i, "rep", "the cat sat on the mat") for i in range(5)]
        + [(10 + i, "mix", t) for i, t in enumerate(
            ["blue fish ran", "green dog flew high", "red bird swam low",
             "odd word salad here now"]
        )],
        "doc_id long, source string, text string",
    )
    out = {r["source"]: r for r in T.bigram_kneser_ney(docs).collect()}
    assert out["rep"]["perplexity"] < out["mix"]["perplexity"]
    assert out["rep"]["n_bigrams"] == 25  # 5 docs x 5 bigrams


def test_kn_probabilities_subadditive(spark):
    # avg ln prob must be negative and perplexity > 1 on any real mix
    docs = spark.createDataFrame(
        [(0, "s", "a b a c a b")], "doc_id long, source string, text string"
    )
    r = T.bigram_kneser_ney(docs).collect()[0]
    assert r["avg_ln_prob"] < 0
    assert r["perplexity"] > 1.0


def _armed_events(spark, n, conv):
    ids = spark.range(n).withColumnRenamed("id", "user_id")
    arms = {
        r["user_id"]: r["arm"]
        for r in ids.select(
            "user_id",
            (md5_int(F.col("user_id").cast("string")) % 2).cast("int").alias("arm"),
        ).collect()
    }
    rows = []
    eid = 0
    for uid, arm in arms.items():
        rows.append((eid, dt.datetime(2024, 1, 1), uid, "view")); eid += 1
        if conv(uid, arm):
            rows.append((eid, dt.datetime(2024, 1, 2), uid, "purchase"))
            eid += 1
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    ), arms


def test_ips_snips_recover_arm_b_value(spark):
    # arm B always converts, arm A never: true V(B-only) = 1
    ev, arms = _armed_events(spark, 100, lambda u, a: a == 1)
    out = E.offpolicy_eval_ips(ev).collect()[0]
    nb = sum(1 for a in arms.values() if a == 1)
    assert out["v_snips"] == 1.0            # unbiased given propensities
    assert abs(out["v_ips"] - 2.0 * nb / 100) < 1e-9  # sampling noise shows
    assert abs(out["ess"] - nb) < 1e-6      # only matched users count
    assert out["v_behavior"] < 1.0


def test_snips_equals_matched_mean(spark):
    ev, arms = _armed_events(spark, 60, lambda u, a: u % 2 == 0)
    out = E.offpolicy_eval_ips(ev).collect()[0]
    matched = [u for u, a in arms.items() if a == 1]
    exp = sum(1 for u in matched if u % 2 == 0) / len(matched)
    assert abs(out["v_snips"] - round(exp, 6)) < 1e-6
