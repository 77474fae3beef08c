"""Wave-141/142 operators: hash-partition balance, chargram langid."""

from __future__ import annotations

from pyspark.sql import functions as F

from simple_vector_spark.operators import relational as R
from simple_vector_spark.operators import text_analysis as T


def test_hash_balance_uniform_keys(spark, sf_dir):
    from simple_vector_spark.sources.loaders import load_table

    out = R.hash_partition_balance(load_table(spark, sf_dir, "orders")).collect()[0]
    assert out["n_buckets"] <= R.HASH_PARTITIONS
    assert out["min_rows"] <= out["avg_rows"] <= out["max_rows"]
    # uniform synthetic keys hash close to balanced
    assert out["imbalance_ratio"] < 2.0
    assert abs(out["max_bucket_share"] * out["n_buckets"] - out["imbalance_ratio"]) < 0.05


def test_hash_balance_single_key_is_maximal_skew(spark):
    orders = spark.createDataFrame(
        [(i, 7) for i in range(100)], "o_orderkey long, o_custkey long"
    )
    out = R.hash_partition_balance(orders).collect()[0]
    assert out["n_buckets"] == 1
    assert out["max_bucket_share"] == 1.0


def test_chargram_agreement_on_distinct_languages(spark):
    docs = spark.createDataFrame(
        [
            (1, "the cat and the dog with the hat", "en", "s"),
            (2, "the sun and the moon with the star", "en", "s"),
            (3, "der hund und die katze mit der maus", "de", "s"),
            (4, "der berg und das tal mit der sonne", "de", "s"),
        ],
        "doc_id long, text string, lang string, source string",
    )
    out = T.chargram_langid_agreement(docs).collect()
    # both classifiers should label every doc -> all cells agree on
    # these cleanly-separated corpora
    agree_docs = sum(r["n_docs"] for r in out if r["agree"])
    assert agree_docs == 4


def test_chargram_unk_for_profileless_text(spark):
    docs = spark.createDataFrame(
        [(1, "xq", "en", "s")],  # too short for any trigram
        "doc_id long, text string, lang string, source string",
    )
    out = T.chargram_langid_agreement(docs).collect()
    assert out[0]["chargram_pred"] == "unk"
