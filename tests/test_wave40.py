"""Wave-40: perceptual-hash near-dup over the binary media column."""

from __future__ import annotations

from pyspark.sql import functions as F

from simple_vector_spark.operators import multimodal as MM


def test_phash_identical_payloads_pair_at_zero(spark):
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog " * 4),
            (2, "the quick brown fox jumps over the lazy dog " * 4),
            (3, "completely different content with other bytes entirely " * 3),
        ],
        "doc_id long, text string",
    )
    pairs = MM.phash_neardup_pairs(MM.with_payload(docs)).collect()
    got = {(r["doc_a"], r["doc_b"]): r["hamming"] for r in pairs}
    assert got.get((1, 2)) == 0
    assert (1, 3) not in got and (2, 3) not in got


def test_phash_near_but_not_exact_still_pairs(spark):
    base = "aaaa bbbb cccc dddd eeee ffff gggg hhhh " * 8
    # a tiny payload edit flips few raster sums -> low Hamming, still
    # caught through an agreeing band
    edited = base[:-1] + "x"
    docs = spark.createDataFrame(
        [(1, base), (2, edited)], "doc_id long, text string"
    )
    pairs = MM.phash_neardup_pairs(MM.with_payload(docs), max_hamming=16).collect()
    assert len(pairs) == 1
    assert pairs[0]["hamming"] <= 16


def test_phash_registry_query_finds_planted_dups(spark, sf_dir):
    from simple_vector_spark.registry import PLANT_SHIFT, queries

    out = queries()["multimodal_phash_neardup"](spark, sf_dir).collect()
    planted = {(r["doc_a"], r["doc_b"]) for r in out if r["doc_b"] - r["doc_a"] == PLANT_SHIFT}
    # every planted copy is byte-identical -> must appear at hamming 0
    zero = {(r["doc_a"], r["doc_b"]) for r in out if r["hamming"] == 0}
    assert planted and planted <= zero


def test_simhash_pairs_identical_docs_hamming_zero(spark):
    from simple_vector_spark.operators import dedup as D

    base = "alpha beta gamma delta epsilon zeta eta theta"
    docs = spark.createDataFrame(
        [(1, base), (2, base), (3, "totally different words entirely here now")],
        "doc_id long, text string",
    )
    pairs = {(r["doc_a"], r["doc_b"]): r["hamming"]
             for r in D.simhash_candidate_pairs(docs).collect()}
    assert pairs.get((1, 2)) == 0


def test_abc_classification_shares(spark):
    from simple_vector_spark.operators import relational as R

    # one whale part (80 revenue), 4 mid (4 each), 4 dust (1 each)
    rows = []
    rows += [(1, 80.0)]
    rows += [(10 + i, 4.0) for i in range(4)]
    rows += [(20 + i, 1.0) for i in range(4)]
    li = spark.createDataFrame(rows, "l_partkey long, l_extendedprice double")
    out = {r["abc"]: r for r in R.parts_abc_classification(li).collect()}
    # total 100: whale cum .8 -> A; mids to .96: first 3 mids cum .84/.88/.92 <= .95 -> B,
    # 4th mid cum .96 > .95 -> C along with dust
    assert out["A"]["n_parts"] == 1
    assert out["B"]["n_parts"] == 3
    assert out["C"]["n_parts"] == 5
    assert abs(sum(r["revenue_share"] for r in out.values()) - 1.0) < 1e-6


def test_triangle_census_known_graph(spark):
    from simple_vector_spark.operators import dedup as D

    # K3 triangle {1,2,3} plus a pendant edge 3-4: 1 triangle,
    # triads = C(2,2)+C(2,2)+C(3,2)+C(1,2) hmm degrees 2,2,3,1 ->
    # triads 1+1+3+0 = 5, coeff = 3/5
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (3, 4)], "doc_a long, doc_b long"
    )
    r = D.pair_graph_triangles(pairs).collect()[0]
    assert r["n_nodes"] == 4 and r["n_edges"] == 4
    assert r["n_triangles"] == 1
    assert abs(r["clustering_coeff"] - 0.6) < 1e-9


def test_triangle_census_no_triangles(spark):
    from simple_vector_spark.operators import dedup as D

    pairs = spark.createDataFrame([(1, 2), (2, 3), (3, 4)], "doc_a long, doc_b long")
    r = D.pair_graph_triangles(pairs).collect()[0]
    assert r["n_triangles"] == 0
    assert r["clustering_coeff"] == 0.0
