"""Wave-148 operators: Poisson goodness-of-fit."""

from __future__ import annotations

import math
import random

from simple_vector_spark.operators import relational as R


def test_poisson_fit_accepts_planted_poisson(spark):
    # draw shifted counts from a real Poisson(2): chi2 should be small
    rng = random.Random(11)
    rows = []
    ok = 0
    for _ in range(2000):
        ok += 1
        # inverse-CDF Poisson draw
        u, k, p, cum = rng.random(), 0, math.exp(-2.0), 0.0
        cum = p
        while u > cum:
            k += 1
            p *= 2.0 / k
            cum += p
        for ln in range(k + 1):
            rows.append((ok, ln + 1))
    li = spark.createDataFrame(rows, "l_orderkey long, l_linenumber int")
    out = R.lines_poisson_fit(li).collect()
    chi2 = out[0]["chi2"]
    # 7 dof at alpha=0.01 -> 18.48; a true Poisson sample stays under
    assert chi2 < 18.5, chi2
    assert abs(out[0]["lambda_hat"] - 2.0) < 0.15


def test_poisson_fit_cells_account_for_all_orders(spark, sf_dir):
    from simple_vector_spark.sources.loaders import load_table

    out = R.lines_poisson_fit(load_table(spark, sf_dir, "lineitem")).collect()
    assert len(out) == R.POISSON_CELLS
    n_orders = sum(r["observed"] for r in out)
    exp_total = sum(r["expected"] for r in out)
    assert abs(exp_total - n_orders) < 0.01  # expected mass sums to N
