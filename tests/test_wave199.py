"""Wave-199 operator: Syntetos-Boylan demand classification."""

from __future__ import annotations

import datetime as dt

from simple_vector_spark.operators import relational as R


def test_sbc_all_four_quadrants(spark):
    rows = []
    # A: every month, constant size -> smooth (ADI 1, CV2 0)
    for m in range(12):
        rows.append((1, dt.date(2024, m + 1, 10), 10.0))
    # B: every other month, constant -> intermittent (ADI 2, CV2 0)
    for m in range(0, 12, 2):
        rows.append((2, dt.date(2024, m + 1, 10), 10.0))
    # C: every month, alternating 1/100 -> erratic (ADI 1, CV2 ~1)
    for m in range(12):
        rows.append((3, dt.date(2024, m + 1, 10), 1.0 if m % 2 else 100.0))
    # D: four months, one huge spike -> lumpy
    for m, q in [(0, 1.0), (3, 1.0), (6, 1.0), (9, 97.0)]:
        rows.append((4, dt.date(2024, m + 1, 10), q))
    li = spark.createDataFrame(
        rows, "l_partkey long, l_shipdate date, l_quantity double"
    )
    out = {r["demand_class"]: r for r in
           R.sbc_demand_classification(li).collect()}
    assert set(out) == {"smooth", "intermittent", "erratic", "lumpy"}
    for r in out.values():
        assert r["n_parts"] == 1
        assert abs(r["share"] - 0.25) < 1e-9
    assert abs(out["smooth"]["avg_adi"] - 1.0) < 1e-6
    assert abs(out["intermittent"]["avg_adi"] - 2.0) < 1e-6
    assert out["erratic"]["avg_cv2"] > 0.49
    assert out["lumpy"]["avg_adi"] >= 1.32


def test_sbc_single_observation_part_is_smoothish(spark):
    # p = 1: variance defined as 0 -> CV2 0; ADI = M/1
    li = spark.createDataFrame(
        [(1, dt.date(2024, 1, 10), 5.0), (2, dt.date(2024, 1, 10), 5.0),
         (2, dt.date(2024, 2, 10), 5.0)],
        "l_partkey long, l_shipdate date, l_quantity double",
    )
    out = {r["demand_class"]: r for r in
           R.sbc_demand_classification(li).collect()}
    # part 1: ADI = 2/1 = 2, cv2 = 0 -> intermittent; part 2 smooth
    assert out["intermittent"]["n_parts"] == 1
    assert out["smooth"]["n_parts"] == 1
