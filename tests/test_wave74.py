"""Wave-74: percolation, PMI collocations."""

from __future__ import annotations

from pyspark.sql import functions as F

from simple_vector_spark.operators import text_analysis as T


def test_percolate_and_semantics(spark):
    docs = spark.createDataFrame(
        [
            (1, "full table scan happening now"),   # fires q_table_scan
            (2, "table only no second term"),        # partial -> no fire
            (3, "scan table reversed order fine"),   # AND ignores order
            (4, "hash and join words"),              # fires q_hash_join
        ],
        "doc_id long, text string",
    )
    out = {r["query_name"]: r["n_docs_fired"] for r in T.saved_search_percolate(docs).collect()}
    assert out["q_table_scan"] == 2   # docs 1 and 3
    assert out["q_hash_join"] == 1
    assert out["q_sort_merge"] == 0   # present with zero count
    assert set(out) == {name for name, _ in T.PERCOLATE_QUERIES}


def test_pmi_rewards_exclusive_pairs(spark):
    # 'alpha beta' always co-occur exclusively; 'the x' pairs are mixed
    docs = spark.createDataFrame(
        [(i, "alpha beta " * 6) for i in range(3)]
        + [(100 + i, "the a the b the c the d the e") for i in range(3)],
        "doc_id long, text string",
    )
    out = T.pmi_bigrams(docs, min_count=5, k=5).collect()
    assert out[0]["w1"] == "alpha" and out[0]["w2"] == "beta"
    assert out[0]["pmi"] > 0


def test_storage_savings_counts_non_keepers(spark):
    from simple_vector_spark.operators import dedup as D

    docs = spark.createDataFrame(
        [
            (1, "aaaa", "s1"),       # cluster 1 keeper
            (2, "bbbbbb", "s1"),     # cluster 1 redundant (6 bytes)
            (3, "cc", "s2"),         # cluster 1 redundant (2 bytes)
            (9, "zzzz", "s2"),       # not clustered
        ],
        "doc_id long, text string, source string",
    )
    labels = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1)], "node long, cluster long"
    )
    out = {r["source"]: r for r in D.storage_savings(docs, labels).collect()}
    assert out["s1"]["n_redundant"] == 1
    assert out["s1"]["bytes_reclaimable"] == 6
    assert out["s2"]["n_redundant"] == 1
    assert out["s2"]["bytes_reclaimable"] == 2
    assert "s2" in out and out["s2"]["n_clustered_docs"] == 1


def test_srm_balanced_hash_split_passes(spark):
    from simple_vector_spark.operators import events as E

    ev = spark.createDataFrame(
        [(i, i % 500) for i in range(2000)], "event_id long, user_id long"
    )
    r = E.srm_check(ev).collect()[0]
    assert r["n_a"] + r["n_b"] == 500
    assert r["srm_detected"] is False  # hash split of 500 users is fair


def test_simpson_audit_detects_reversal(spark):
    from simple_vector_spark.operators import relational as R

    # stratum A: positive corr; stratum B: positive corr; but B sits at
    # high qty / low discount -> pooled corr flips negative
    rows = []
    for i in range(50):
        rows.append(("A", 1.0 + i * 0.1, 0.01 + i * 0.001))
        rows.append(("B", 40.0 + i * 0.1, 0.001 + i * 0.0001))
    li = spark.createDataFrame(
        rows, "l_returnflag string, l_quantity double, l_discount double"
    )
    out = {r["l_returnflag"]: r for r in R.simpson_audit(li).collect()}
    assert out["A"]["stratum_corr"] > 0.99
    assert out["B"]["stratum_corr"] > 0.99
    assert out["A"]["global_corr"] < 0  # pooled reverses
    assert out["A"]["reverses"] is True


def test_month_end_uniform_data_has_unit_lift(spark):
    import datetime

    rows = []
    k = 0
    for day in range(1, 31):  # April 2024: 30 days, equal revenue daily
        rows.append((k, 100.0, datetime.datetime(2024, 4, day)))
        k += 1
    orders = spark.createDataFrame(
        rows, "o_orderkey long, o_totalprice double, o_orderdate timestamp"
    )
    from simple_vector_spark.operators import relational as R

    r = R.month_end_effect(orders).collect()[0]
    assert abs(r["tail_share"] - 0.1) < 1e-6    # 3/30 of revenue
    assert abs(r["lift"] - 1.0) < 1e-6


def test_mde_shrinks_with_traffic(spark):
    from simple_vector_spark.operators import events as E

    def mk(n_users):
        rows = []
        for u in range(n_users):
            rows.append((u * 2, u, "view"))
            if u % 10 == 0:
                rows.append((u * 2 + 1, u, "purchase"))
        return spark.createDataFrame(rows, "event_id long, user_id long, event_type string")

    small = E.mde_power(mk(100)).collect()[0]
    big = E.mde_power(mk(1000)).collect()[0]
    assert abs(small["baseline_rate"] - 0.1) < 1e-6
    assert big["mde_abs"] < small["mde_abs"]  # more traffic, finer MDE


def test_burstiness_flags_stuffed_term(spark):
    from simple_vector_spark.operators import text_analysis as T

    docs = spark.createDataFrame(
        # 'stuffed' appears 10x in half its docs, 1x in the rest;
        # 'even' appears exactly twice everywhere
        [(i, ("stuffed " * 10 if i % 2 == 0 else "stuffed ") + "even even")
         for i in range(20)],
        "doc_id long, text string",
    )
    out = {r["term"]: r for r in T.term_burstiness(docs, min_df=10, k=5).collect()}
    assert out["stuffed"]["burstiness"] > 1.0
    assert out["even"]["burstiness"] == 0.0
    assert out["stuffed"]["df"] == 20


def test_price_endings_spot_the_9s(spark):
    rows = [(k, 10.99) for k in range(60)] + [(100 + k, 10.0 + k) for k in range(40)]
    orders = spark.createDataFrame(rows, "o_orderkey long, o_totalprice double")
    from simple_vector_spark.operators import relational as R

    out = R.price_endings(orders).collect()
    assert out[0]["ending"] == 99
    assert out[0]["n"] == 60
    assert abs(out[0]["share"] - 0.6) < 1e-9
    assert abs(out[0]["lift_vs_uniform"] - 60.0) < 1e-6


def test_abc_xyz_classes(spark):
    import datetime

    from simple_vector_spark.operators import relational as R

    rows = []
    # part 1: 60% of revenue, steady monthly qty -> A/X (cum share 0.6)
    for m in range(1, 7):
        rows.append((1, 10.0, 10.0, datetime.datetime(2024, m, 5)))
    # part 2: the 40% tail, single month -> C/Z (cum share 1.0)
    rows.append((2, 5.0, 40.0, datetime.datetime(2024, 3, 5)))
    li = spark.createDataFrame(
        rows,
        "l_partkey long, l_quantity double, l_extendedprice double, l_shipdate timestamp",
    )
    out = {(r["abc"], r["xyz"]): r["n_parts"] for r in R.abc_xyz_matrix(li).collect()}
    assert out[("A", "X")] == 1
    assert out[("C", "Z")] == 1


def test_sla_attainment_tiers(spark):
    import datetime

    from simple_vector_spark.operators import relational as R

    orders = spark.createDataFrame(
        [(1, "1-URGENT", datetime.datetime(2024, 1, 1)),
         (2, "1-URGENT", datetime.datetime(2024, 1, 1))],
        "o_orderkey long, o_orderpriority string, o_orderdate timestamp",
    )
    li = spark.createDataFrame(
        [
            (1, datetime.datetime(2024, 1, 5)),    # 4 days
            (1, datetime.datetime(2024, 2, 1)),    # later line ignored (min)
            (2, datetime.datetime(2024, 1, 20)),   # 19 days
        ],
        "l_orderkey long, l_shipdate timestamp",
    )
    r = R.sla_attainment(orders, li).collect()[0]
    assert r["n_orders"] == 2
    assert r["within_7d"] == 0.5
    assert r["within_14d"] == 0.5
    assert r["within_30d"] == 1.0


def test_forecast_backtest_perfect_linear_series(spark):
    import datetime

    from simple_vector_spark.operators import relational as R

    # perfectly linear monthly revenue -> zero APE on every point
    rows = []
    k = 0
    for m in range(1, 13):
        for _ in range(2):
            rows.append((k, 500.0 * m, datetime.datetime(2024, m, 10)))
            k += 1
    orders = spark.createDataFrame(
        rows, "o_orderkey long, o_totalprice double, o_orderdate timestamp"
    )
    out = R.forecast_backtest(orders).collect()
    assert len(out) == R.BACKTEST_POINTS
    for r in out:
        assert r["ape"] < 1e-9
        assert abs(r["predicted"] - r["actual"]) < 0.01


def test_hll_union_error_bound(spark, sf_dir):
    from simple_vector_spark.operators import events as E
    from simple_vector_spark.sources.loaders import load_table

    out = E.hll_sketch_union_weekly(load_table(spark, sf_dir, "events")).collect()
    assert len(out) > 0
    for r in out:
        assert r["rel_err"] < 0.05  # HLL++ accuracy contract
        assert r["n_days"] >= 1


def test_range_constraints_flag_planted_violation(spark):
    from simple_vector_spark.operators import validate as V

    li = spark.createDataFrame(
        [
            (10.0, 0.05, 0.04, 100.0),
            (60.0, 0.05, 0.04, 100.0),     # quantity over 50
            (10.0, 0.5, 0.04, 100.0),      # discount over 0.1
            (10.0, 0.05, None, 100.0),     # NULL tax violates
        ],
        "l_quantity double, l_discount double, l_tax double, l_extendedprice double",
    )
    out = {r["constraint"]: r for r in V.range_constraint_audit(li).collect()}
    assert out["l_quantity_1_50"]["n_violations"] == 1
    assert out["l_discount_0_to_0p1"]["n_violations"] == 1
    assert out["l_tax_0_to_0p08"]["n_violations"] == 1
    assert out["l_extendedprice_pos"]["holds"] is True


def test_accepted_values_flags_rogue_status(spark):
    from simple_vector_spark.operators import validate as V

    orders = spark.createDataFrame(
        [("F", "1-URGENT"), ("X", "1-URGENT"), (None, "5-LOW")],
        "o_orderstatus string, o_orderpriority string",
    )
    out = {r["column_name"]: r for r in V.accepted_values_audit(orders).collect()}
    assert out["o_orderstatus"]["n_violations"] == 2  # 'X' and NULL
    assert out["o_orderstatus"]["holds"] is False
    assert out["o_orderpriority"]["holds"] is True
