"""Second coverage wave: sharded NumPy k-NN, WAL replay, id allocation,
sessionization, sampling/vocab/histogram, stateful streaming."""

from __future__ import annotations

from pyspark.sql import functions as F

from simple_vector_spark.operators import events as E
from simple_vector_spark.operators import knn as K
from simple_vector_spark.operators import mutation as M
from simple_vector_spark.operators import text_analysis as T
from simple_vector_spark.sources.loaders import load_table


def test_knn_shard_topk_equals_expression_form(spark, sf_dir):
    """The NumPy shard path is exact: identical ids+distances to the
    expression form."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == 0)
    expr = {(r.vec_id, r.dist) for r in K.knn_topk(emb, q, 10, "sqL2").collect()}
    shard = {(r.vec_id, r.dist) for r in K.knn_shard_topk(emb, q, 10).collect()}
    assert shard == expr


def test_wal_replay_drops_tombstoned_keys(spark):
    log = spark.createDataFrame(
        [
            (1, 1, "upsert", 10.0),
            (1, 2, "delete", 0.0),
            (2, 1, "upsert", 20.0),
            (2, 2, "delete", 0.0),
            (2, 3, "upsert", 30.0),
        ],
        "id long, seq long, op string, v double",
    )
    state = M.wal_replay(log, ["id"], ["seq"], "op", "delete").collect()
    assert {r.id: r.v for r in state} == {2: 30.0}


def test_allocate_ids_dense_and_ordered(spark):
    df = spark.createDataFrame(
        [("b", 10), ("a", 20), ("a", 5)], "grp string, k long"
    )
    out = M.allocate_ids(df, ["grp", "k"]).collect()
    got = {(r.grp, r.k): r.new_id for r in out}
    assert got == {("a", 5): 1, ("a", 20): 2, ("b", 10): 3}


def test_partitioned_snapshot_prunes_and_roundtrips(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, i % 3) for i in range(30)], "id long, label int"
    )
    path = str(tmp_path / "snap")
    M.snapshot(df, path, partition_by=["label"])
    back = M.restore(spark, path).filter(F.col("label") == 1)
    assert sorted(r.id for r in back.collect()) == [i for i in range(30) if i % 3 == 1]
    # partition pruning visible in the plan
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "label" in plan


def test_sessionize_gap_semantics(spark):
    ev = spark.createDataFrame(
        [
            (1, "2024-01-01 00:00:00", 1.0),
            (1, "2024-01-01 00:10:00", 2.0),  # same session (<30m)
            (1, "2024-01-01 01:00:00", 3.0),  # new session (50m gap)
            (2, "2024-01-01 00:00:00", 4.0),
        ],
        "user_id long, ts string, value double",
    ).withColumn("ts", F.to_timestamp("ts"))
    out = E.sessionize(ev, "30 minutes").collect()
    by_user = {}
    for r in out:
        by_user.setdefault(r.user_id, []).append((r.session_start, r.n))
    assert len(by_user[1]) == 2
    assert sorted(by_user[1]) == [
        ("2024-01-01 00:00:00", 2),
        ("2024-01-01 01:00:00", 1),
    ]
    assert by_user[2] == [("2024-01-01 00:00:00", 1)]


def test_hash_sample_deterministic_and_stratified(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    s1 = T.hash_sample(docs, {"en": 25}, 60)
    s2 = T.hash_sample(docs.repartition(7), {"en": 25}, 60)
    ids1 = sorted(r.doc_id for r in s1.select("doc_id").collect())
    ids2 = sorted(r.doc_id for r in s2.select("doc_id").collect())
    assert ids1 == ids2  # partitioning-independent
    # strata rates roughly honored (hash-uniform)
    tot = docs.groupBy("lang").count().collect()
    kept = s1.groupBy("lang").count().collect()
    tot_m = {r.lang: r["count"] for r in tot}
    kept_m = {r.lang: r["count"] for r in kept}
    en_rate = kept_m.get("en", 0) / tot_m["en"]
    assert 0.05 < en_rate < 0.45


def test_vocab_and_histogram_shapes(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    vocab = T.vocab_topn(docs, 10).collect()
    assert len(vocab) == 10
    assert all(vocab[i].n >= vocab[i + 1].n for i in range(9))
    hist = T.length_histogram(docs).collect()
    assert sum(r.n for r in hist) == docs.count()


def test_stateful_user_totals_matches_batch(spark, sf_dir):
    from simple_vector_spark.streaming import jobs as SJ

    got = {
        r.user_id: (r.n, r.sum_value)
        for r in SJ.stateful_user_totals(spark, sf_dir).collect()
    }
    want = {
        r.user_id: (r.n, r.sum_value)
        for r in load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 6).alias("sum_value"))
        .collect()
    }
    assert set(got) == set(want)
    for u in want:
        assert got[u][0] == want[u][0]
        assert abs(got[u][1] - want[u][1]) < 1e-5


def test_knn_shard_join_equals_expression_form(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    qs = emb.filter(F.col("vec_id") < 8)
    expr = {
        (r.query_id, r.vec_id, r.dist, r.rnk)
        for r in K.knn_join(emb, qs, 5, "sqL2").collect()
    }
    shard = {
        (r.query_id, r.vec_id, r.dist, r.rnk)
        for r in K.knn_shard_join(emb, qs, 5).collect()
    }
    assert shard == expr


def test_salted_join_equals_plain_join(spark):
    from simple_vector_spark.operators import relational as R

    # skewed big side: 90% of rows share key 0
    big = spark.createDataFrame(
        [(0 if i % 10 else i % 5, i) for i in range(1000)], "k long, v long"
    )
    small = spark.createDataFrame([(i, f"dim{i}") for i in range(5)], "k long, name string")
    plain = {(r.k, r.v, r.name) for r in big.join(small, "k").collect()}
    salted = {(r.k, r.v, r.name) for r in R.salted_join(big, small, "k", 8).collect()}
    assert salted == plain
