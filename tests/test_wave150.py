"""Wave-150 operators: uplift-by-band table."""

from __future__ import annotations

from simple_vector_spark.operators import events as E
from simple_vector_spark.sources.loaders import load_table


def test_uplift_bands_placebo_near_zero(spark, sf_dir):
    out = E.uplift_by_activity_band(load_table(spark, sf_dir, "events")).collect()
    assert 1 <= len(out) <= E.UPLIFT_DECILES
    for r in out:
        assert 0 <= r["rate_a"] <= 1 and 0 <= r["rate_b"] <= 1
        # untreated stream: the md5 split is a placebo — uplift is
        # residual imbalance, bounded well away from a real effect
        assert abs(r["uplift"]) < 0.5
        assert abs(r["uplift"] - round(r["rate_b"] - r["rate_a"], 6)) <= 1e-6


def test_uplift_bands_cover_all_users(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    out = E.uplift_by_activity_band(ev).collect()
    n_users = ev.select("user_id").distinct().count()
    assert sum(r["n_arm_a"] + r["n_arm_b"] for r in out) == n_users
