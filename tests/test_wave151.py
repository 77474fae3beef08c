"""Wave-151 operator: Kaplan-Meier customer-lifetime survival."""

from __future__ import annotations

import datetime as dt

from simple_vector_spark.operators import relational as R


def _orders(spark, rows):
    return spark.createDataFrame(
        [(c, dt.date.fromisoformat(d)) for c, d in rows],
        "o_custkey long, o_orderdate date",
    )


def test_km_survival_planted_curve(spark):
    # end of data = 2021-01-01.  A: t=2 event; B: t=0 event;
    # C: t=11 censored (31d from end); D: t=0 censored (0d from end).
    orders = _orders(
        spark,
        [
            (1, "2020-01-01"),
            (1, "2020-03-01"),
            (2, "2020-01-01"),
            (3, "2020-01-01"),
            (3, "2020-12-01"),
            (4, "2021-01-01"),
        ],
    )
    out = {r["t_months"]: r for r in R.km_survival(orders).collect()}
    assert set(out) == {0, 2, 11}
    assert out[0]["n_risk"] == 4
    assert out[0]["n_events"] == 1 and out[0]["n_censored"] == 1
    assert abs(out[0]["km_survival"] - 0.75) < 1e-9
    assert out[2]["n_risk"] == 2 and out[2]["n_events"] == 1
    assert abs(out[2]["km_survival"] - 0.375) < 1e-9
    # censoring does NOT drop the curve: S stays flat at t=11
    assert out[11]["n_risk"] == 1 and out[11]["n_events"] == 0
    assert abs(out[11]["km_survival"] - 0.375) < 1e-9


def test_km_survival_all_censored_stays_at_one(spark):
    # every customer's last order is the dataset end -> all censored,
    # survival never leaves 1.0.
    orders = _orders(
        spark,
        [
            (1, "2020-11-01"),
            (1, "2021-01-01"),
            (2, "2021-01-01"),
        ],
    )
    rows = R.km_survival(orders).collect()
    assert all(r["n_events"] == 0 for r in rows)
    assert all(abs(r["km_survival"] - 1.0) < 1e-9 for r in rows)


def test_km_survival_monotone(spark):
    # survival is non-increasing in t and n_risk strictly decreases
    # across distinct lifetimes.
    orders = _orders(
        spark,
        [
            (c, d)
            for c, d in [
                (1, "2019-01-01"),
                (1, "2019-02-15"),
                (2, "2019-01-01"),
                (2, "2019-06-01"),
                (3, "2019-01-01"),
                (3, "2020-06-01"),
                (4, "2019-01-01"),
                (5, "2019-01-01"),
                (5, "2020-12-31"),
            ]
        ],
    )
    rows = sorted(R.km_survival(orders).collect(), key=lambda r: r["t_months"])
    surv = [r["km_survival"] for r in rows]
    assert surv == sorted(surv, reverse=True)
    risk = [r["n_risk"] for r in rows]
    assert risk == sorted(risk, reverse=True)
