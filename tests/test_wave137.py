"""Wave-137/138 operators: line-number integrity, props schema drift."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from simple_vector_spark.operators import events as E
from simple_vector_spark.operators import validate as V


def test_linenumber_audit_classifies_violations(spark):
    rows = [
        (1, 1), (1, 2), (1, 3),      # contiguous
        (2, 1), (2, 1),              # duplicate
        (3, 2), (3, 3),              # bad base
        (4, 1), (4, 3),              # gapped (max != n, distinct, base ok)
    ]
    li = spark.createDataFrame(rows, "l_orderkey long, l_linenumber int")
    out = V.line_number_integrity(li).collect()[0]
    assert out["n_orders"] == 4
    assert out["n_contiguous"] == 1
    assert out["n_duplicate_lines"] == 1
    assert out["n_bad_base"] == 1
    assert out["n_gapped"] == 1
    assert abs(out["contiguous_share"] - 0.25) < 1e-9


def test_linenumber_audit_fixture_accounting(spark, sf_dir):
    # the synthetic fixture does NOT follow TPC-H's contiguous line
    # numbering — the audit's job is to SAY so; assert the class
    # accounting is complete and consistent instead
    from simple_vector_spark.sources.loaders import load_table

    out = V.line_number_integrity(load_table(spark, sf_dir, "lineitem")).collect()[0]
    assert 0 <= out["contiguous_share"] <= 1
    classified = (
        out["n_contiguous"] + out["n_gapped"]
    )
    # every order is contiguous, duplicate, bad-base, or gapped — the
    # dup/bad-base classes may overlap neither contiguous nor gapped
    assert classified <= out["n_orders"]
    assert out["n_contiguous"] == round(out["contiguous_share"] * out["n_orders"])


def test_props_drift_flags_half_gated_key(spark):
    t0 = datetime.datetime(2024, 1, 1)
    from simple_vector_spark.functions.text import md5_int

    # find user ids landing in each md5 half deterministically
    probe = spark.range(100).select(
        "id", (md5_int(F.col("id").cast("string")) % 2).alias("h")
    ).collect()
    a_users = [r["id"] for r in probe if r["h"] == 0][:5]
    b_users = [r["id"] for r in probe if r["h"] == 1][:5]
    rows = []
    eid = 0
    for u in a_users:
        rows.append((eid, u, '{"old_key": "1"}', t0)); eid += 1
    for u in b_users:
        rows.append((eid, u, '{"old_key": "1", "new_key": "2"}', t0)); eid += 1
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, props string, ts timestamp"
    )
    out = {r["prop_key"]: r for r in E.props_schema_drift(ev).collect()}
    assert out["old_key"]["abs_drift"] == 0.0
    # new_key exists only in half B -> full drift
    assert out["new_key"]["share_a"] == 0.0
    assert out["new_key"]["share_b"] == 1.0
    assert out["new_key"]["abs_drift"] == 1.0
