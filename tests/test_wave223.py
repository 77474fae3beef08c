"""Wave-223 operator: absorbing-chain funnel quantities."""

from __future__ import annotations

import datetime as dt

from simple_vector_spark.operators import events as E


def _events(spark, journeys):
    rows, eid = [], 0
    for uid, seq in enumerate(journeys):
        for k, t in enumerate(seq):
            rows.append(
                (eid, dt.datetime(2024, 1, 1) + dt.timedelta(minutes=k), uid, t)
            )
            eid += 1
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )


def test_absorbing_deterministic_chain(spark):
    # every journey: view -> click -> purchase.  From 'view':
    # expected 2 more events, P(purchase) = 1; from 'click': 1 and 1.
    ev = _events(spark, [["view", "click", "purchase"]] * 10)
    out = {r["state"]: r for r in E.absorbing_chain_funnel(ev).collect()}
    assert abs(out["view"]["expected_steps"] - 2.0) < 1e-6
    assert abs(out["click"]["expected_steps"] - 1.0) < 1e-6
    assert abs(out["view"]["p_end_in_purchase"] - 1.0) < 1e-6
    assert out["view"]["p_exit_next"] == 0.0


def test_absorbing_split_paths(spark):
    # from 'view': half the journeys purchase, half exit immediately
    ev = _events(
        spark, [["view", "purchase"]] * 5 + [["view"]] * 5
    )
    out = {r["state"]: r for r in E.absorbing_chain_funnel(ev).collect()}
    v = out["view"]
    assert abs(v["p_end_in_purchase"] - 0.5) < 1e-6
    assert abs(v["p_exit_next"] - 0.5) < 1e-6
    assert abs(v["expected_steps"] - 1.0) < 1e-6


def test_absorbing_loop_state_geometric(spark):
    # click loops to itself with p=0.5 then purchases: expected steps
    # = 1/(1-0.5) = 2, purchase prob 1
    ev = _events(
        spark,
        [["click", "click", "click", "purchase"],
         ["click", "purchase"]],
    )
    out = {r["state"]: r for r in E.absorbing_chain_funnel(ev).collect()}
    c = out["click"]
    # transitions from click: 3x to click? no: journeys give
    # click->click (2), click->purchase (2) -> p_loop = 0.5
    assert abs(c["expected_steps"] - 2.0) < 1e-3
    assert abs(c["p_end_in_purchase"] - 1.0) < 1e-3
