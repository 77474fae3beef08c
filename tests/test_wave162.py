"""Wave-162 operator: empirical-Bayes return-rate shrinkage."""

from __future__ import annotations

from simple_vector_spark.operators import relational as R


def _li(spark, parts):
    """parts: {part_id: (n, returned)}"""
    rows = []
    for pid, (n, ret) in parts.items():
        for j in range(n):
            rows.append((pid, "R" if j < ret else "N"))
    return spark.createDataFrame(rows, "l_partkey long, l_returnflag string")


def test_shrinkage_pulls_small_samples_hardest(spark):
    # many stable parts at ~25% plus one tiny 2/3 outlier part: the
    # tiny part must move far toward the mean, the big parts barely.
    parts = {i: (400, 100) for i in range(30)}
    parts[99] = (3, 2)
    out = {r["part_id"]: r for r in R.return_rate_shrunk(_li(spark, parts)).collect()}
    tiny = out[99]
    assert tiny["raw_rate"] > 0.6
    assert tiny["shrunk_rate"] < tiny["raw_rate"]  # pulled down
    # tiny part is the biggest mover
    assert max(out, key=lambda k: out[k]["shrink_delta"]) == 99
    big = out.get(0)
    if big is not None:
        assert big["shrink_delta"] < tiny["shrink_delta"]


def test_shrinkage_keeps_rates_in_unit_interval_and_order(spark):
    parts = {i: (5 + i, i % 4) for i in range(1, 40)}
    rows = R.return_rate_shrunk(_li(spark, parts)).collect()
    assert 0 < len(rows) <= R.EB_TOPK
    for r in rows:
        assert 0.0 <= r["shrunk_rate"] <= 1.0
    deltas = [r["shrink_delta"] for r in rows]
    assert deltas == sorted(deltas, reverse=True)


def test_shrinkage_identical_parts_no_movement(spark):
    # all parts identical -> every raw rate equals the mean, shrinkage
    # is a no-op regardless of prior strength.
    parts = {i: (20, 5) for i in range(10)}
    rows = R.return_rate_shrunk(_li(spark, parts)).collect()
    for r in rows:
        assert abs(r["shrunk_rate"] - r["raw_rate"]) < 1e-5
