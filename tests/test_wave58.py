"""Wave-58 operators: binary-Hamming ANN, BPE encode, higher moments,
cluster split."""

from __future__ import annotations

from pyspark.sql import functions as F

from simple_vector_spark.operators import ann as A
from simple_vector_spark.operators import relational as R
from simple_vector_spark.operators import text_analysis as T


def test_sign_pack_and_hamming_identity(spark):
    # a vector is Hamming-0 from itself; flipping one sign costs 1 bit
    base = [1.0 if d % 3 == 0 else -1.0 for d in range(64)]
    flip = list(base)
    flip[5] = -flip[5]
    emb = spark.createDataFrame(
        [(0, base), (1, flip), (2, [-x for x in base])],
        "vec_id long, embedding array<double>",
    )
    out = {r["vec_id"]: r for r in A.binary_hamming_search(emb, base, 3).collect()}
    assert out[0]["hamming"] == 0
    assert out[1]["hamming"] == 1
    assert out[2]["hamming"] == 64
    assert out[0]["dist"] == 0.0


def test_bpe_apply_compresses_repeated_words(spark):
    docs = spark.createDataFrame(
        [(1, "banana banana banana", "s1"), (2, "banana band", "s2")],
        "doc_id long, text string, source string",
    )
    out = {r["source"]: r for r in T.bpe_apply_encode(docs).collect()}
    # 'banana' has 6 chars; 3 merges can at best reduce to 3 symbols
    assert out["s1"]["n_tokens"] == 3
    assert out["s1"]["n_symbols"] < 6 * 3
    assert out["s2"]["n_tokens"] == 2
    # every source's avg must be below the raw char length average
    for r in out.values():
        assert r["avg_symbols_per_token"] < 6.0


def test_higher_moments_symmetric_distribution(spark):
    # symmetric values -> skewness 0; two-point mass -> kurtosis -2
    rows = [("A", 1.0), ("A", 3.0)] * 50
    li = spark.createDataFrame(rows, "l_returnflag string, l_quantity double")
    r = R.higher_moments(li).collect()[0]
    assert r["mean_qty"] == 2.0
    assert abs(r["skewness"]) < 1e-9
    assert abs(r["excess_kurtosis"] + 2.0) < 1e-6


def test_cluster_split_never_leaks(spark, sf_dir):
    from simple_vector_spark import registry as REG

    labels = REG._dup_cluster_labels(spark, sf_dir)
    docs = REG._docs_plus_spark(spark, sf_dir).select("doc_id")
    from simple_vector_spark.functions.text import md5_int

    lab = labels.select(F.col("node").alias("doc_id"), "cluster")
    dc = docs.join(lab, "doc_id", "left").select(
        "doc_id", F.coalesce("cluster", F.col("doc_id")).alias("cluster")
    )
    h = md5_int(F.col("cluster").cast("string")) % 100
    gated = dc.withColumn(
        "split",
        F.when(h < 90, "train").when(h < 95, "val").otherwise("test"),
    )
    leaky = (
        gated.groupBy("cluster")
        .agg(F.countDistinct("split").alias("ns"))
        .filter(F.col("ns") > 1)
        .count()
    )
    assert leaky == 0
