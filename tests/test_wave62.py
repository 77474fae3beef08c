"""Wave-62 operators: replica bucket diff, k-core peel, id gaps."""

from __future__ import annotations

from pyspark.sql import functions as F

from simple_vector_spark.operators import dedup as D
from simple_vector_spark.operators import validate as V


def test_replica_diff_finds_only_tampered_buckets(spark):
    # keys chosen so exactly one is a multiple of the tamper mod
    rows = [(k, "F", 100.0) for k in (1, 2, 3, V.REPLICA_TAMPER_MOD)]
    orders = spark.createDataFrame(
        rows, "o_orderkey long, o_orderstatus string, o_totalprice double"
    )
    out = V.replica_bucket_diff(orders).collect()
    assert len(out) == 1  # only the tampered key's bucket differs
    r = out[0]
    assert r["n_rows_a"] == r["n_rows_b"]  # update, not insert/delete
    assert r["fp_a"] != r["fp_b"]


def test_kcore_peels_pendant_chain_keeps_triangle(spark):
    # triangle (1,2,3) survives k=2 peeling; pendant chain 4-5 dies
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5)], "doc_a long, doc_b long"
    )
    out = {r["round"]: r for r in D.kcore_peel(pairs).collect()}
    assert out[0]["n_nodes"] == 5 and out[0]["n_edges"] == 5
    # round 1: node 5 (deg 1) dropped -> edge (4,5) gone; 4 now deg 1
    assert out[1]["n_edges"] == 4
    # round 2: node 4 dropped -> only the triangle remains
    assert out[2]["n_nodes"] == 3 and out[2]["n_edges"] == 3


def test_id_gaps_counts_starts_and_missing(spark):
    docs = spark.createDataFrame(
        [(i,) for i in (1, 2, 3, 7, 8, 12)], "doc_id long"
    )
    r = V.id_gap_audit(docs).collect()[0]
    assert r["min_id"] == 1 and r["max_id"] == 12
    assert r["n_present"] == 6
    assert r["n_missing"] == 6   # 4,5,6,9,10,11
    assert r["n_gap_starts"] == 2  # gaps start after 3 and after 8


def test_id_gaps_contiguous_is_clean(spark):
    docs = spark.createDataFrame([(i,) for i in range(10)], "doc_id long")
    r = V.id_gap_audit(docs).collect()[0]
    assert r["n_missing"] == 0
    assert r["n_gap_starts"] == 0


def test_matcher_eval_perfect_and_missed(spark):
    # truth: (0,1000000), (100,1000100); candidates hit one of them
    # plus one false positive
    docs = spark.createDataFrame(
        [(0,), (100,), (1_000_000,), (1_000_100,), (5,), (7,)], "doc_id long"
    )
    pairs = spark.createDataFrame(
        [(0, 1_000_000), (5, 7)], "doc_a long, doc_b long"
    )
    r = D.matcher_eval(pairs, docs, 100, 1_000_000).collect()[0]
    assert r["tp"] == 1 and r["fp"] == 1 and r["fn"] == 1
    assert r["precision"] == 0.5 and r["recall"] == 0.5
    assert r["f1"] == 0.5


def test_chi2_independent_table_is_zero(spark):
    # perfectly proportional table -> chi2 exactly 0
    rows = []
    for nat in (0, 1):
        for seg, mult in (("A", 2), ("B", 3)):
            rows += [(i, nat, seg) for i in range(mult * (nat + 1) * 10)]
    from simple_vector_spark.operators import relational as R

    customer = spark.createDataFrame(
        [(i, n, s) for i, (_, n, s) in enumerate(rows)],
        "c_custkey long, c_nationkey long, c_mktsegment string",
    )
    r = R.chi2_independence(customer).collect()[0]
    assert r["chi2"] == 0.0
    assert r["dof"] == 1


def test_hhi_monopoly_vs_uniform(spark):
    from simple_vector_spark.operators import relational as R

    li = spark.createDataFrame(
        [(1, 10.0), (1, 10.0), (2, 10.0), (3, 10.0)],
        "l_suppkey long, l_quantity double",
    )
    sup = spark.createDataFrame(
        [(1, 0), (2, 0), (3, 0), (4, 1)], "s_suppkey long, s_nationkey long"
    )
    # nation 0: shares 1/2, 1/4, 1/4 -> HHI = 10000*(0.25+0.0625+0.0625)
    out = {r["s_nationkey"]: r for r in R.supplier_hhi(li, sup).collect()}
    assert abs(out[0]["hhi"] - 3750.0) < 1e-6
    assert out[0]["n_suppliers"] == 3
    assert 1 not in out  # supplier 4 shipped nothing


def test_binary_dedup_reclaims_copies(spark):
    from simple_vector_spark.operators import multimodal as MM

    docs = spark.createDataFrame(
        [(1, "same text"), (2, "same text"), (3, "same text"), (4, "unique")],
        "doc_id long, text string",
    )
    out = MM.exact_binary_dedup(docs).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_copies"] == 3
    assert r["keeper"] == 1
    assert r["reclaimable_bytes"] == 2 * len("same text")
