"""Dedup suite semantics: exact groups, minhash LSH recall on known
dups, jaccard exactness, simhash locality, cosine pairs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from simple_vector_spark.operators import dedup as D


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog", "s1"),
        (2, "the quick brown fox jumps over the lazy dog", "s1"),  # exact dup of 1
        (3, "the quick brown fox jumps over the sleepy dog", "s1"),  # near dup
        (4, "completely different text about spark engines here", "s1"),
        (5, "another unrelated document mentioning databases only", "s2"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_exact_dedup_groups(docs):
    out = D.exact_dedup_groups(docs).collect()
    assert len(out) == 1
    assert out[0].n_copies == 2 and out[0].keeper == 1


def test_minhash_identical_docs_share_all_bands(docs):
    pairs = {(r.doc_a, r.doc_b) for r in D.minhash_candidate_pairs(docs).collect()}
    assert (1, 2) in pairs  # exact dups always collide


def test_minhash_signature_equal_for_equal_text(docs):
    sigs = {r.doc_id: tuple(r)[1:] for r in D.minhash_signatures(docs).collect()}
    assert sigs[1] == sigs[2]
    assert sigs[1] != sigs[4]


def test_ngram_jaccard_exact_value(docs):
    out = {(r.doc_a, r.doc_b): r.jacc for r in D.ngram_jaccard_pairs(docs, 0.3).collect()}
    assert out[(1, 2)] == 1.0
    # docs 1 and 3 differ in word 8 of 9: the changed word hits the 2
    # shingles starting at 6 and 7, so 5 of 7 shingles are shared ->
    # jacc = 5 / (7 + 7 - 5) = 5/9
    assert out[(1, 3)] == pytest.approx(5 / 9, abs=1e-6)
    # cross-source pairs are blocked
    assert all(a != 5 and b != 5 for a, b in out)


def test_simhash_close_for_near_dup(docs):
    fps = {r.doc_id: r.simhash for r in D.simhash_fingerprints(docs).collect()}
    assert fps[1] == fps[2]
    ham_near = bin(fps[1] ^ fps[3]).count("1")
    ham_far = bin(fps[1] ^ fps[5]).count("1")
    assert ham_near < ham_far


def test_embedding_cosine_pairs(spark):
    emb = spark.createDataFrame(
        [
            (1, [1.0, 0.0]),
            (2, [0.9, 0.1]),
            (3, [0.0, 1.0]),
        ],
        "vec_id long, embedding array<float>",
    )
    out = {(r.ia, r.ib): r.sim for r in D.embedding_cosine_pairs(emb, 0.9).collect()}
    assert (1, 2) in out and (1, 3) not in out
    assert out[(1, 2)] > 0.99


def test_dedup_audit_hll_within_error_bound(spark, sf_dir):
    """The HLL estimate must stay within ~5% of exact distinct."""
    from simple_vector_spark.operators import dedup as D
    from simple_vector_spark.sources.loaders import load_table

    docs = load_table(spark, sf_dir, "documents")
    row = D.dedup_audit(docs).collect()[0]
    assert row.n_rows == docs.count()
    rel_err = abs(row.approx_distinct - row.exact_distinct) / row.exact_distinct
    assert rel_err < 0.05


def test_dup_clusters_chain_and_islands(spark):
    """A 5-node chain (diameter > 1 iteration) plus a separate pair and
    an untouched pair must resolve to min-id cluster labels."""
    from simple_vector_spark.operators import dedup as D

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11), (20, 21)],
        "doc_a long, doc_b long",
    )
    out = {r.node: r.cluster for r in D.dup_clusters(pairs).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 10: 10, 11: 10, 20: 20, 21: 20}


def test_keep_canonical_accounting(spark):
    """Two clusters (sizes 3 and 2) in a 10-doc corpus: survivors =
    10 - 5 members + 2 clusters = 7."""
    from simple_vector_spark.operators import dedup as D

    docs = spark.range(10).withColumnRenamed("id", "doc_id")
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (5, 6)], "doc_a long, doc_b long"
    )
    row = D.keep_canonical_summary(
        docs, D.dup_clusters(pairs)
    ).collect()[0]
    assert (row.n_docs, row.n_dup_members, row.n_clusters, row.n_surviving) == (
        10, 5, 2, 7,
    )
