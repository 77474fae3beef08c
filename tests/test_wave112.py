"""Wave-112/113 operators: CUPED adjustment, Markov entropy rate."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from simple_vector_spark.operators import events as E
from simple_vector_spark.sources.loaders import load_table


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp"
    )


def test_cuped_reduces_variance_when_correlated(spark, sf_dir):
    out = E.cuped_adjustment(load_table(spark, sf_dir, "events")).collect()[0]
    # pre/post activity of the same users is positively correlated in
    # any realistic event stream
    assert out["theta"] is not None and out["theta"] > 0
    assert 0 <= out["var_reduction"] <= 1
    # adjusted means exist for both arms
    assert out["mean_a_adj"] is not None and out["mean_b_adj"] is not None


def test_cuped_identity_when_covariate_constant(spark):
    # Every user has exactly one pre event and varying post events:
    # var(x) = 0 -> theta NULL, raw means still reported.
    t0 = datetime.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for u in range(6):
        rows.append((eid, u, "view", t0)); eid += 1
        for k in range(u % 3 + 1):
            rows.append((eid, u, "view", t0 + datetime.timedelta(days=10, hours=k)))
            eid += 1
    out = E.cuped_adjustment(_ev(spark, rows)).collect()[0]
    assert out["theta"] is None
    assert out["mean_a"] is not None


def test_entropy_rate_deterministic_chain_is_zero_bits(spark):
    # a->b->a->b...: next is fully determined by prev -> H(next|prev)=0
    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        (i, 1, "a" if i % 2 == 0 else "b", t0 + datetime.timedelta(minutes=i))
        for i in range(40)
    ]
    out = E.markov_entropy_rate(_ev(spark, rows)).collect()[0]
    assert out["h_conditional_bits"] == 0.0
    # marginal is a near-fair coin over 39 transitions -> ~1 bit
    assert abs(out["h_marginal_bits"] - 1.0) < 0.01
    assert abs(out["predictability_gain"] - out["h_marginal_bits"]) < 1e-9


def test_entropy_rate_gain_nonnegative_on_fixture(spark, sf_dir):
    out = E.markov_entropy_rate(load_table(spark, sf_dir, "events")).collect()[0]
    # conditioning never increases entropy (up to rounding)
    assert out["predictability_gain"] >= -1e-6
    assert out["h_conditional_bits"] >= 0
