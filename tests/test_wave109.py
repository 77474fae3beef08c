"""Wave-109/110 operators: frame-semantics demo, CMS width curve."""

from __future__ import annotations

from pyspark.sql import functions as F

from simple_vector_spark.operators import relational as R
from simple_vector_spark.operators import sketches as SK
from simple_vector_spark.sources.loaders import load_table


def test_frame_semantics_divergence_is_tie_mass(spark):
    # 2024-01-01 has three orders (5, 10, 15); RANGE sees all 30 at any
    # row, ROWS at the first order (min orderkey -> 5) sees only 5.
    orders = spark.createDataFrame(
        [
            (1, "2024-01-01", 5.0),
            (2, "2024-01-01", 10.0),
            (3, "2024-01-01", 15.0),
            (4, "2024-01-02", 7.0),
        ],
        "o_orderkey long, o_orderdate string, o_totalprice double",
    ).select(
        "o_orderkey",
        F.to_date("o_orderdate").alias("o_orderdate"),
        F.col("o_totalprice").cast("decimal(15,2)").alias("o_totalprice"),
    )
    out = {str(r["d"]): r for r in R.window_frame_semantics(orders).collect()}
    day1 = out["2024-01-01"]
    assert float(day1["range_total"]) == 30.0
    assert float(day1["rows_total_at_first"]) == 5.0
    assert float(day1["divergence"]) == 25.0
    day2 = out["2024-01-02"]
    assert float(day2["divergence"]) == 0.0  # single order: frames agree


def test_cms_width_curve_error_shrinks_with_width(spark, sf_dir):
    out = {
        r["width"]: r
        for r in SK.cms_width_curve(load_table(spark, sf_dir, "documents")).collect()
    }
    assert sorted(out) == sorted(SK.CMS_WIDTHS)
    # CMS is one-sided: overcounts never negative
    assert all(r["mean_overcount"] >= 0 for r in out.values())
    # wider sketch, no worse mean error (monotone up to hash luck: the
    # endpoints of a 8x width range must improve)
    assert out[512]["mean_overcount"] <= out[64]["mean_overcount"]
    assert out[512]["exact_share"] >= out[64]["exact_share"]
