"""Wave-190 operator: exact Shapley conversion attribution."""

from __future__ import annotations

import datetime as dt

from simple_vector_spark.operators import events as E


def _events(spark, journeys):
    # journeys: list of (touch_types, converted)
    rows = []
    eid = 0
    for uid, (touches, conv) in enumerate(journeys):
        for t in touches:
            rows.append((eid, dt.datetime(2024, 1, 1), uid, t))
            eid += 1
        if conv:
            rows.append((eid, dt.datetime(2024, 1, 2), uid, "purchase"))
            eid += 1
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )


def test_shapley_single_channel_gets_everything(spark):
    # every conversion touched only 'click': click earns all of it
    ev = _events(
        spark,
        [(["click"], True), (["click"], True), (["view"], False)],
    )
    out = {r["channel"]: r["shapley_conversions"] for r in
           E.shapley_attribution(ev).collect()}
    assert abs(out["click"] - 2.0) < 1e-6
    assert abs(out["view"]) < 1e-6
    assert abs(out["error"]) < 1e-6


def test_shapley_symmetric_channels_split_evenly(spark):
    # conversions always touched {click, view} together: symmetry
    # forces an even split
    ev = _events(
        spark,
        [(["click", "view"], True), (["click", "view"], True)],
    )
    out = {r["channel"]: r["shapley_conversions"] for r in
           E.shapley_attribution(ev).collect()}
    assert abs(out["click"] - 1.0) < 1e-6
    assert abs(out["view"] - 1.0) < 1e-6


def test_shapley_efficiency_axiom(spark):
    # sum of attributions = v(full) - v(empty)
    # v(empty) counts purchase-only users (baseline, unattributable)
    ev = _events(
        spark,
        [
            (["click"], True),
            (["view", "signup"], True),
            (["error", "click", "view"], True),
            ([], True),          # baseline conversion
            (["view"], False),
        ],
    )
    out = {r["channel"]: r["shapley_conversions"] for r in
           E.shapley_attribution(ev).collect()}
    assert abs(sum(out.values()) - 3.0) < 1e-5  # 4 conv - 1 baseline
