"""Wave-54 operators: grid spatial join, TF-IDF verification, BPE
merge training."""

from __future__ import annotations

from pyspark.sql import functions as F

from simple_vector_spark.operators import ann as A
from simple_vector_spark.operators import dedup as D
from simple_vector_spark.operators import text_analysis as T


def test_grid_neighbors_cross_cell_and_cutoff(spark):
    eps = 0.01
    rows = [
        (1, [0.0095, 0.0, 0.0]),   # cell 0, near the boundary
        (2, [0.0104, 0.0, 0.0]),   # cell 1 -> found via neighbor explode
        (3, [0.5, 0.5, 0.0]),      # far away
        (4, [0.0, 0.0, 0.0]),      # 0.0095 from 1, 0.0104 (> eps) from 2
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {(r["vec_a"], r["vec_b"]) for r in A.grid_neighbor_pairs(emb, eps).collect()}
    assert (1, 2) in out        # crosses a cell boundary
    assert (1, 4) in out        # same cell, within eps
    assert (2, 4) not in out    # adjacent cells but euclidean dist > eps
    assert all(3 not in pair for pair in out)


def test_tfidf_verify_identical_docs_score_one(spark):
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),
            (2, "alpha beta gamma delta"),
            (3, "alpha zzz yyy xxx"),
            (4, "completely different words here"),
        ],
        "doc_id long, text string",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3)], "doc_a long, doc_b long"
    )
    out = {(r["doc_a"], r["doc_b"]): r for r in D.tfidf_verify_pairs(docs, pairs).collect()}
    assert abs(out[(1, 2)]["cosine"] - 1.0) < 1e-6
    assert out[(1, 2)]["n_shared_terms"] == 4
    # (1,3) share only 'alpha', which appears in 3 of 4 docs -> low weight
    assert out[(1, 3)]["n_shared_terms"] == 1
    assert out[(1, 3)]["cosine"] < 0.5


def _reference_bpe(word_counts: dict[str, int], rounds: int):
    words = {tuple(w): n for w, n in word_counts.items()}
    merges = []
    for r in range(1, rounds + 1):
        counts: dict[tuple[str, str], int] = {}
        for syms, n in words.items():
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] = (
                    counts.get((syms[i], syms[i + 1]), 0) + n
                )
        (left, right), cnt = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0])
        )
        merges.append((r, left, right, left + right, cnt))
        new_words = {}
        for syms, n in words.items():
            out = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                    out.append(left + right)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_words[tuple(out)] = new_words.get(tuple(out), 0) + n
        words = new_words
    return merges


def test_bpe_merges_match_reference_trainer(spark):
    corpus = [
        (1, "banana bandana"),
        (2, "banana banana band"),
        (3, "ana banana"),
    ]
    docs = spark.createDataFrame(corpus, "doc_id long, text string")
    got = [
        (r["rank"], r["left_sym"], r["right_sym"], r["merged"], r["cnt"])
        for r in T.bpe_train_merges(docs).orderBy("rank").collect()
    ]
    counts: dict[str, int] = {}
    for _, text in corpus:
        for w in text.split():
            counts[w] = counts.get(w, 0) + 1
    assert got == _reference_bpe(counts, T.BPE_MERGE_ROUNDS)
