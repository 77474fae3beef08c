"""Wave-161 operator: Neyman stratified-sample allocation."""

from __future__ import annotations

from simple_vector_spark.operators import curation as CU


def _docs(spark, strata):
    """strata: {source: list of n_chars}"""
    rows = []
    did = 0
    for src, lens in strata.items():
        for n in lens:
            rows.append((did, "x", "en", src, n))
            did += 1
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )


def test_neyman_favors_high_variance_stratum(spark):
    # equal sizes, 'wild' has much higher spread -> gets a larger
    # allocation than 'calm' despite identical N_h; proportional
    # allocation splits evenly.
    calm = [100, 101, 99, 100] * 25
    wild = [10, 500, 20, 900] * 25
    out = {r["source"]: r for r in
           CU.neyman_allocation(_docs(spark, {"calm": calm, "wild": wild})).collect()}
    assert out["wild"]["alloc_neyman"] > out["calm"]["alloc_neyman"]
    assert abs(out["wild"]["alloc_prop"] - out["calm"]["alloc_prop"]) <= 1
    tot = out["__total__"]
    assert tot["efficiency"] >= 1.0  # Neyman never loses to proportional
    assert tot["var_neyman"] <= tot["var_prop"] + 1e-12


def test_neyman_equal_strata_matches_proportional(spark):
    # identical strata -> the two allocations coincide (up to floor).
    s = [50, 150, 250, 350] * 10
    out = {r["source"]: r for r in
           CU.neyman_allocation(_docs(spark, {"a": list(s), "b": list(s)})).collect()}
    assert abs(out["a"]["alloc_neyman"] - out["a"]["alloc_prop"]) <= 1
    assert abs(out["__total__"]["efficiency"] - 1.0) < 1e-6


def test_neyman_budget_roughly_exhausted(spark):
    strata = {f"s{i}": [100 + 13 * i * (j % 5) for j in range(40)] for i in range(1, 6)}
    tot = {r["source"]: r for r in
           CU.neyman_allocation(_docs(spark, strata)).collect()}["__total__"]
    # floors lose at most one doc per stratum
    assert CU.NEYMAN_BUDGET - 5 <= tot["alloc_neyman"] <= CU.NEYMAN_BUDGET + 5
    assert CU.NEYMAN_BUDGET - 5 <= tot["alloc_prop"] <= CU.NEYMAN_BUDGET + 5
