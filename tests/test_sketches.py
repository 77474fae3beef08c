"""Sketch-operator contracts: CMS one-sidedness and GK rank error."""

from __future__ import annotations

from pyspark.sql import functions as F

from simple_vector_spark.operators import sketches as SK
from simple_vector_spark.sources.loaders import load_table


def test_cms_estimates_are_one_sided(spark, sf_dir):
    rows = SK.cms_heavy_hitters(load_table(spark, sf_dir, "documents")).collect()
    assert len(rows) == 20
    for r in rows:
        assert r["cms_est"] >= r["true_cnt"]
        assert r["overcount"] == r["cms_est"] - r["true_cnt"]


def test_cms_exact_when_no_collision_dominates(spark, sf_dir):
    """With W=256 and a fixture vocabulary of a few hundred tokens, the
    min over 4 rows should keep median overcount well under the true
    count of heavy hitters — the sketch must be usable, not just
    one-sided."""
    rows = SK.cms_heavy_hitters(load_table(spark, sf_dir, "documents")).collect()
    over = sorted(r["overcount"] / r["true_cnt"] for r in rows)
    assert over[len(over) // 2] < 1.0  # median relative overcount < 100%


def test_quantile_audit_rank_error_within_contract(spark, sf_dir):
    out = SK.approx_quantile_audit(load_table(spark, sf_dir, "orders")).collect()
    assert [r["p"] for r in out] == [0.25, 0.5, 0.75, 0.95]
    for r in out:
        # GK guarantees rank error <= rel_err (=0.01); allow the
        # ceiling effect of a small fixture (rank granularity 1/n)
        assert r["rank_err"] <= 0.02, r
        assert r["approx_value"] <= r["exact_value"] * 1.5
