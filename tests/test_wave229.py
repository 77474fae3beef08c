"""Wave-229 operator: gravity-model trade fit."""

from __future__ import annotations

from simple_vector_spark.operators import relational as R


def test_gravity_recovers_multiplicative_flows(spark):
    # flows z_ij = m_i * m_j exactly (in arbitrary units): both
    # elasticities must be ~1 and R^2 ~ 1 (the gravity benchmark)
    # many nations with comparable masses keep the marginal-mass
    # distortion (mass_i = m_i * (S - m_i), i=j excluded) small
    masses = {k: 1.0 + 0.2 * k for k in range(8)}
    suppliers, customers, orders, lineitem = [], [], [], []
    sidx = 0
    for i, mi in masses.items():
        for j, mj in masses.items():
            if i == j:
                continue
            skey, ckey, okey = 100 + sidx, 200 + sidx, 300 + sidx
            suppliers.append((skey, i))
            customers.append((ckey, j))
            orders.append((okey, ckey))
            lineitem.append((okey, skey, float(mi * mj)))
            sidx += 1
    out = R.gravity_model_fit(
        spark.createDataFrame(
            lineitem, "l_orderkey long, l_suppkey long, l_extendedprice double"
        ),
        spark.createDataFrame(orders, "o_orderkey long, o_custkey long"),
        spark.createDataFrame(customers, "c_custkey long, c_nationkey long"),
        spark.createDataFrame(suppliers, "s_suppkey long, s_nationkey long"),
    ).collect()[0]
    assert out["n_lanes"] == 56
    # masses are flow MARGINALS (i=j excluded), which shades the
    # planted unit elasticity down slightly; the gravity benchmark
    # still shows through with near-perfect fit
    assert 0.6 < out["export_elasticity"] < 1.4
    assert 0.6 < out["import_elasticity"] < 1.4
    assert out["r2"] > 0.95
