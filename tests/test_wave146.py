"""Wave-146 operators: daily forward-fill."""

from __future__ import annotations

import datetime

from simple_vector_spark.operators import events as E


def test_forward_fill_carries_last_observation(spark):
    t0 = datetime.datetime(2024, 1, 1)
    rows = []
    eid = 0
    # 3 events day 0, 1 event day 3 — days 1-2 are gaps
    for _ in range(3):
        rows.append((eid, 1, "v", t0)); eid += 1
    rows.append((eid, 1, "v", t0 + datetime.timedelta(days=3)))
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp"
    )
    out = {str(r["d"]): r for r in E.daily_forward_fill(ev).collect()}
    assert len(out) == 4
    assert out["2024-01-01"]["observed"] == 3 and not out["2024-01-01"]["was_gap"]
    assert out["2024-01-02"]["observed"] is None and out["2024-01-02"]["was_gap"]
    assert out["2024-01-02"]["filled"] == 3
    assert out["2024-01-03"]["filled"] == 3
    assert out["2024-01-04"]["observed"] == 1 and out["2024-01-04"]["filled"] == 1


def test_forward_fill_dense_fixture_has_no_gaps(spark, sf_dir):
    from simple_vector_spark.sources.loaders import load_table

    out = E.daily_forward_fill(load_table(spark, sf_dir, "events")).collect()
    assert len(out) == E.FFILL_HEAD_DAYS
    # the synthetic stream is daily-dense: filled == observed everywhere
    assert all(r["filled"] == r["observed"] for r in out if not r["was_gap"])
