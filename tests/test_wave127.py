"""Wave-127 operators: item-item co-visitation recommendations."""

from __future__ import annotations

from pyspark.sql import functions as F

from simple_vector_spark.operators import relational as R


def test_covisit_recs_rank_planted_bundle_first(spark):
    # parts 1+2 co-bought by 4 customers; 1+3 by 2; 3 alone elsewhere.
    orders, lineitem = [], []
    ok = 0
    for cust in range(4):
        ok += 1; orders.append((ok, cust)); lineitem += [(ok, 1), (ok, 2)]
    for cust in range(4, 6):
        ok += 1; orders.append((ok, cust)); lineitem += [(ok, 1), (ok, 3)]
    for cust in range(6, 10):
        ok += 1; orders.append((ok, cust)); lineitem += [(ok, 3)]
    odf = spark.createDataFrame(orders, "o_orderkey long, o_custkey long")
    ldf = spark.createDataFrame(lineitem, "l_orderkey long, l_partkey long")
    out = R.item_covisit_recs(odf, ldf).collect()
    recs = {(r["part_id"], r["rnk"]): r for r in out}
    # part 1's best rec is part 2 (cos = 4/sqrt(6*4)) over part 3
    assert recs[(1, 1)]["rec_part_id"] == 2
    assert recs[(1, 2)]["rec_part_id"] == 3
    assert recs[(1, 1)]["cosine"] > recs[(1, 2)]["cosine"]
    # symmetry: part 2's best rec is part 1 with the same cosine
    assert recs[(2, 1)]["rec_part_id"] == 1
    assert recs[(2, 1)]["cosine"] == recs[(1, 1)]["cosine"]


def test_covisit_respects_min_co(spark):
    # a single co-purchase is below the support floor -> no rows
    odf = spark.createDataFrame([(1, 1)], "o_orderkey long, o_custkey long")
    ldf = spark.createDataFrame([(1, 7), (1, 8)], "l_orderkey long, l_partkey long")
    assert R.item_covisit_recs(odf, ldf).count() == 0
