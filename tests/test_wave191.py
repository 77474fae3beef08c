"""Wave-191: streaming CDC apply with tombstones (batch-equivalent
semantics on planted multi-batch-shaped data)."""

from __future__ import annotations

from pyspark.sql import functions as F

from simple_vector_spark.operators.mutation import apply_upserts


def _state(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, event_id long, ts long, value double, op string"
    )


def test_tombstone_wins_across_merges(spark):
    # batch 1: upsert u1; batch 2: delete u1 (later ts) -> u1 gone;
    # batch 3: re-upsert u1 (even later) -> u1 back.  This is the
    # incremental path cdc_apply_stream's merge runs per micro-batch.
    empty = _state(spark, [])
    b1 = _state(spark, [(1, 10, 100, 1.0, "u"), (2, 11, 100, 2.0, "u")])
    s1 = apply_upserts(empty, b1, ["user_id"], ["ts", "event_id"])
    b2 = _state(spark, [(1, 12, 200, 0.0, "d")])
    s2 = apply_upserts(s1, b2, ["user_id"], ["ts", "event_id"])
    visible2 = {r["user_id"] for r in s2.filter(F.col("op") != "d").collect()}
    assert visible2 == {2}
    # the tombstone row itself must be RETAINED in state
    assert s2.filter(F.col("user_id") == 1).count() == 1
    b3 = _state(spark, [(1, 13, 300, 7.0, "u")])
    s3 = apply_upserts(s2, b3, ["user_id"], ["ts", "event_id"])
    rows = {r["user_id"]: r for r in s3.filter(F.col("op") != "d").collect()}
    assert set(rows) == {1, 2}
    assert rows[1]["value"] == 7.0


def test_out_of_order_delete_loses_to_newer_upsert(spark):
    # a LATE-arriving tombstone older than the current row must lose
    cur = _state(spark, [(1, 20, 500, 5.0, "u")])
    late_del = _state(spark, [(1, 15, 300, 0.0, "d")])
    out = apply_upserts(cur, late_del, ["user_id"], ["ts", "event_id"])
    rows = out.collect()
    assert len(rows) == 1 and rows[0]["op"] == "u" and rows[0]["value"] == 5.0
