"""Wave-36 operators: sequence-pattern matching, KMV cardinality
sketch, column-encoding advisor."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from simple_vector_spark.operators import events as E
from simple_vector_spark.operators import relational as R
from simple_vector_spark.operators import sketches as SK


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )


def test_pattern_match_counts(spark):
    t0 = dt.datetime(2024, 1, 1)

    def seq(uid, types, start):
        return [
            (uid * 100 + i, t0 + dt.timedelta(minutes=start + i), uid, t)
            for i, t in enumerate(types)
        ]

    rows = (
        seq(1, ["view", "click", "purchase"], 0)        # direct + eventual
        + seq(2, ["view", "error", "click", "purchase"], 0)  # eventual only
        + seq(3, ["error", "error"], 0)                 # error pair
        + seq(4, ["purchase", "view"], 0)               # nothing
    )
    out = {r["pattern"]: r["n_users"] for r in E.sequence_pattern_match(_ev(spark, rows)).collect()}
    assert out == {"direct_funnel": 1, "eventual_funnel": 2, "error_pair": 1}


def test_pattern_match_order_is_ts_then_id(spark):
    # same timestamp: event_id breaks the tie -> 'vcp' not 'cvp'
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, t0, 9, "view"),
        (2, t0, 9, "click"),
        (3, t0, 9, "purchase"),
    ]
    out = {r["pattern"]: r["n_users"] for r in E.sequence_pattern_match(_ev(spark, rows)).collect()}
    assert out["direct_funnel"] == 1


def test_kmv_small_sets_are_exact(spark):
    # sets smaller than K: the sketch holds everything -> est == exact
    t0 = dt.datetime(2024, 1, 1)
    rows = [(i, t0, i % 10, "view") for i in range(50)] + [
        (100 + i, t0, 5 + i % 8, "purchase") for i in range(40)
    ]
    out = {r["set_name"]: r for r in SK.kmv_cardinality_audit(_ev(spark, rows)).collect()}
    assert out["view"]["exact"] == 10 and out["view"]["est"] == 10.0
    assert out["purchase"]["exact"] == 8 and out["purchase"]["est"] == 8.0
    assert out["union"]["exact"] == 13 and out["union"]["est"] == 13.0
    assert all(r["rel_err"] == 0.0 for r in out.values())


def test_kmv_estimates_within_error(spark, sf_dir):
    from simple_vector_spark.sources.loaders import load_table

    out = {
        r["set_name"]: r
        for r in SK.kmv_cardinality_audit(load_table(spark, sf_dir, "events")).collect()
    }
    assert set(out) == {"view", "purchase", "union"}
    for r in out.values():
        # KMV with k=64: relative std err ~ 1/sqrt(62) ~ 13%; allow 4 sigma
        assert r["rel_err"] < 0.5, r


def test_encoding_advisor_recommendations(spark):
    # col a: single value -> long runs -> rle; col b: unique per row ->
    # plain (65 distinct > dict max with runs of 1).
    rows = [(1, i, "x", f"v{i}") for i in range(65)]
    df = spark.createDataFrame(
        rows, "l_orderkey long, l_linenumber long, l_returnflag string, l_linestatus string"
    ).withColumn("l_shipdate", F.lit("1995-01-01"))
    out = {r["col_name"]: r for r in R.column_encoding_advisor(df).collect()}
    assert out["l_returnflag"]["encoding"] == "rle"
    assert out["l_returnflag"]["n_runs"] == 1
    assert out["l_linestatus"]["encoding"] == "plain"
    assert out["l_linestatus"]["n_runs"] == 65
    assert out["l_shipdate"]["encoding"] == "rle"


def test_changepoint_finds_planted_shift(spark):
    # 10 days at ~5/day then 10 days at ~20/day -> split at day 11
    t0 = dt.datetime(2024, 3, 1)
    rows = []
    eid = 0
    for day in range(20):
        n = 5 if day < 10 else 20
        for i in range(n):
            rows.append((eid, t0 + dt.timedelta(days=day, minutes=i), 1, "view"))
            eid += 1
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    r = E.changepoint_detect(ev).collect()[0]
    assert r["split_date"] == "2024-03-10"  # last day of the low segment
    assert abs(r["mean_before"] - 5.0) < 1e-9
    assert abs(r["mean_after"] - 20.0) < 1e-9
    assert r["sse"] == 0.0 and r["sse_reduction"] == 1.0


def test_pit_state_no_fanout_and_none_bucket(spark):
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        # user 1: view at t0, click at t0+2h; errors inside each state
        (1, t0, 1, "view"),
        (2, t0 + dt.timedelta(hours=1), 1, "error"),   # during 'view'
        (3, t0 + dt.timedelta(hours=2), 1, "click"),
        (4, t0 + dt.timedelta(hours=3), 1, "error"),   # during 'click'
        # user 2: error before any tracked state -> 'none'
        (5, t0, 2, "error"),
        (6, t0 + dt.timedelta(hours=1), 2, "view"),
    ]
    ev = _ev(spark, rows)
    out = {r["state"]: r["n_errors"] for r in E.point_in_time_state(ev).collect()}
    assert out == {"view": 1, "click": 1, "none": 1}


def test_time_to_convert_exact_quartiles(spark):
    t0 = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    # 4 users converting in 10, 20, 30, 40 seconds; 1 non-converter
    for u, delta in enumerate([10, 20, 30, 40]):
        rows.append((eid, t0, u, "view")); eid += 1
        rows.append((eid, t0 + dt.timedelta(seconds=delta), u, "purchase")); eid += 1
    rows.append((eid, t0, 99, "view"))
    ev = _ev(spark, rows)
    r = E.time_to_convert(ev).collect()[0]
    assert r["n_converted"] == 4
    assert r["p25"] == 17.5 and r["p50"] == 25.0 and r["p75"] == 32.5


def test_discount_elasticity_planted_slope(spark):
    # qty = 5 + 2 * discount_pct exactly -> slope 2, intercept 5
    rows = [("A", d / 100.0, float(5 + 2 * d)) for d in range(0, 11) for _ in range(3)]
    li = spark.createDataFrame(rows, "l_returnflag string, l_discount double, l_quantity double")
    out = R.discount_elasticity(li).collect()
    assert len(out) == 1
    r = out[0]
    assert abs(r["qty_per_discount_pct"] - 2.0) < 1e-9
    assert abs(r["base_qty"] - 5.0) < 1e-9


def test_touch_attribution_models(spark):
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        # user 1: view -> click -> purchase(10): last=click, first=view
        (1, t0, 1, "view", 0.0),
        (2, t0 + dt.timedelta(minutes=1), 1, "click", 0.0),
        (3, t0 + dt.timedelta(minutes=2), 1, "purchase", 10.0),
        # user 2: purchase(5) with no prior touch -> none/none
        (4, t0, 2, "purchase", 5.0),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    out = {(r["model"], r["touch"]): r for r in E.touch_attribution(ev).collect()}
    assert out[("last", "click")]["value"] == 10.0
    assert out[("first", "view")]["value"] == 10.0
    assert out[("last", "none")]["n_purchases"] == 1
    assert out[("first", "none")]["n_purchases"] == 1
    assert ("last", "view") not in out


def test_naaj_semantics_on_fixture(spark, sf_dir):
    from simple_vector_spark.registry import queries

    r = queries()["null_aware_anti_join"](spark, sf_dir).collect()[0]
    # a NULL in the NOT IN list empties the result; stripping it
    # restores the anti-join count, which ignores NULLs by definition
    assert r["n_not_in_with_null"] == 0
    assert r["n_not_in_null_free"] == r["n_anti_join"]
    assert r["n_customers"] > 0


def test_props_key_stats_discovers_keys(spark):
    ev = spark.createDataFrame(
        [(1, '{"k": 5, "extra": "x"}'), (2, '{"k": 7}')],
        "event_id long, props string",
    )
    from simple_vector_spark.registry import events_props_key_stats  # noqa: F401
    from pyspark.sql import functions as F

    kv = ev.select(F.explode(F.from_json("props", "map<string,string>")).alias("k", "v"))
    out = {r["k"]: r for r in kv.groupBy("k").agg(
        F.count("*").cast("long").alias("n_rows"),
        F.countDistinct("v").cast("long").alias("n_distinct"),
        F.min(F.col("v").try_cast("long")).alias("min_num"),
        F.max(F.col("v").try_cast("long")).alias("max_num"),
    ).collect()}
    assert out["k"]["n_rows"] == 2 and out["k"]["min_num"] == 5 and out["k"]["max_num"] == 7
    assert out["extra"]["n_rows"] == 1 and out["extra"]["min_num"] is None


def test_max_concurrent_sessions_sweep(spark):
    t0 = dt.datetime(2024, 1, 1, 12, 0)
    rows = [
        # three users whose sessions overlap around t0+10m..t0+20m
        (1, t0, 1, "view"),
        (2, t0 + dt.timedelta(minutes=10), 2, "view"),
        (3, t0 + dt.timedelta(minutes=20), 3, "view"),
        # user 9 much later: never overlaps
        (4, t0 + dt.timedelta(hours=5), 9, "view"),
    ]
    ev = _ev(spark, rows)
    r = E.max_concurrent_sessions(ev).collect()[0]
    # sessions: [12:00,12:30) [12:10,12:40) [12:20,12:50) and the late one
    assert r["n_sessions"] == 4
    assert r["peak"] == 3
    assert r["peak_ts"] == "2024-01-01 12:20:00"


def test_session_paths_prefix_and_ranking(spark):
    t0 = dt.datetime(2024, 1, 1)

    def sess(uid, types, start_h):
        return [
            (uid * 100 + i, t0 + dt.timedelta(hours=start_h, minutes=i), uid, t)
            for i, t in enumerate(types)
        ]

    rows = (
        sess(1, ["view", "click", "purchase", "view"], 0)  # path 'vcp' (prefix 3)
        + sess(1, ["view", "click", "purchase"], 5)        # new session (gap) 'vcp'
        + sess(2, ["error", "error"], 0)                   # 'ee'
    )
    ev = _ev(spark, rows)
    out = E.session_paths(ev).collect()
    top = out[0]
    assert top["path"] == "vcp" and top["n_sessions"] == 2
    assert {r["path"] for r in out} == {"vcp", "ee"}
