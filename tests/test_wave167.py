"""Wave-167 operator: Benjamini-Hochberg FDR over per-type z-tests."""

from __future__ import annotations

import datetime as dt

from simple_vector_spark.operators import events as E


def _events(spark, rows):
    # rows: (event_type, weekday_count, weekend_count)
    data = []
    i = 0
    for et, wd, we in rows:
        for _ in range(wd):
            data.append((i, dt.datetime(2024, 1, 3, 12, 0, 0), et))  # Wed
            i += 1
        for _ in range(we):
            data.append((i, dt.datetime(2024, 1, 6, 12, 0, 0), et))  # Sat
            i += 1
    return spark.createDataFrame(
        data, "event_id long, ts timestamp, event_type string"
    )


def test_fdr_flags_the_shifted_type_only(spark):
    # a small all-weekend type against three near-pooled types (the
    # pooled share is what each type is tested against, so the nulls
    # must sit close to it)
    out = {
        r["event_type"]: r
        for r in E.fdr_weekend_shift(
            _events(
                spark,
                [("a", 75, 25), ("b", 75, 25), ("c", 75, 25), ("d", 0, 10)],
            )
        ).collect()
    }
    assert out["d"]["discovery"] == 1 and out["d"]["bh_rank"] == 1
    assert out["d"]["p_value"] < 0.001
    for t in ("a", "b", "c"):
        assert out[t]["discovery"] == 0


def test_fdr_null_data_no_discoveries(spark):
    # identical weekend shares everywhere -> z == 0, p == 1, none pass
    rows = [("a", 50, 50), ("b", 50, 50), ("c", 50, 50)]
    out = E.fdr_weekend_shift(_events(spark, rows)).collect()
    assert all(r["discovery"] == 0 for r in out)
    assert all(abs(r["p_value"] - 1.0) < 1e-6 for r in out)


def test_fdr_step_up_includes_borderline_below_kstar(spark):
    # BH discovers every rank <= k*, even a test whose own threshold
    # failed, as long as a later rank passed.  Build two strong shifts
    # and one null: both shifted types discovered, null not.
    out = {
        r["event_type"]: r
        for r in E.fdr_weekend_shift(
            _events(
                spark,
                [("null1", 50, 50), ("up", 5, 95), ("down", 95, 5),
                 ("null2", 50, 50)],
            )
        ).collect()
    }
    assert out["up"]["discovery"] == 1
    assert out["down"]["discovery"] == 1
    assert out["null1"]["discovery"] == 0
    assert out["null2"]["discovery"] == 0


def test_norm_sf2_matches_known_quantiles(spark):
    # 2*(1-Phi(1.96)) = 0.05, 2*(1-Phi(2.5758)) = 0.01
    from pyspark.sql import functions as F

    df = spark.range(1).select(
        E._norm_sf2(F.lit(1.959964)).alias("p05"),
        E._norm_sf2(F.lit(2.575829)).alias("p01"),
        E._norm_sf2(F.lit(0.0)).alias("p100"),
    )
    row = df.collect()[0]
    assert abs(row["p05"] - 0.05) < 1e-4
    assert abs(row["p01"] - 0.01) < 1e-4
    assert abs(row["p100"] - 1.0) < 1e-6
