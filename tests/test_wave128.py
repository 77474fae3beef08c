"""Wave-128/129 operators: Markov accuracy, covisit holdout eval."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from simple_vector_spark.operators import events as E
from simple_vector_spark.operators import relational as R
from simple_vector_spark.sources.loaders import load_table


def test_markov_accuracy_perfect_on_deterministic_chain(spark):
    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        (i, 1, "abc"[i % 3], t0 + datetime.timedelta(minutes=i)) for i in range(30)
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp"
    )
    out = E.markov_prediction_accuracy(ev).collect()[0]
    assert out["markov_accuracy"] == 1.0
    # a->b->c->a cycle: majority baseline is ~1/3
    assert out["baseline_accuracy"] < 0.4
    assert out["lift"] > 0.5


def test_markov_accuracy_bounds_on_fixture(spark, sf_dir):
    out = E.markov_prediction_accuracy(load_table(spark, sf_dir, "events")).collect()[0]
    assert 0 <= out["baseline_accuracy"] <= out["markov_accuracy"] <= 1
    assert abs(
        out["lift"] - round(out["markov_accuracy"] - out["baseline_accuracy"], 6)
    ) <= 1e-6


def test_covisit_holdout_recovers_planted_bundle(spark):
    # every customer buys the SAME 3-part bundle: whichever part is
    # held out, the other two recommend it back -> hit rate 1.0
    orders, lineitem = [], []
    for cust in range(8):
        ok = cust + 1
        orders.append((ok, cust))
        lineitem += [(ok, 101), (ok, 102), (ok, 103)]
    odf = spark.createDataFrame(orders, "o_orderkey long, o_custkey long")
    ldf = spark.createDataFrame(lineitem, "l_orderkey long, l_partkey long")
    out = R.covisit_holdout_eval(odf, ldf).collect()[0]
    assert out["n_users_eval"] == 8
    assert out["n_hits"] == 8
    assert out["hit_rate_at_3"] == 1.0
