"""Waves 184-185: Misra-Gries heavy hitters, SymSpell suggestions."""

from __future__ import annotations

import datetime as dt

from simple_vector_spark.operators import sketches as SK
from simple_vector_spark.operators import text_analysis as T


def _events(spark, user_counts):
    rows = []
    i = 0
    for u, c in user_counts.items():
        for _ in range(c):
            rows.append((i, dt.datetime(2024, 1, 1, 0, 0, 0), u))
            i += 1
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long"
    )


def test_mg_exact_threshold_semantics(spark):
    # n = 100, k = 10 -> keep users with f*10 > 100, i.e. f >= 11
    ev = _events(spark, {1: 40, 2: 25, 3: 11, 4: 10, 5: 14})
    out = SK.misra_gries_heavy_users(ev, k=10).collect()
    got = {(r["user_id"], r["n_events"]) for r in out}
    assert got == {(1, 40), (2, 25), (3, 11), (5, 14)}
    assert [r["user_id"] for r in out] == [1, 2, 5, 3]  # freq desc order
    shares = {r["user_id"]: r["share"] for r in out}
    assert abs(shares[1] - 0.4) < 1e-9


def test_mg_survives_tiny_counter_budget(spark):
    # k=3 (2 counters) across many distractors: the 60%-heavy user
    # must still surface — the MG guarantee under pressure
    counts = {100: 120}
    counts.update({u: 2 for u in range(40)})
    ev = _events(spark, counts)  # n = 200, threshold f*3 > 200 -> f >= 67
    out = SK.misra_gries_heavy_users(ev, k=3).collect()
    assert [(r["user_id"], r["n_events"]) for r in out] == [(100, 120)]


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_symspell_finds_all_edit1_kinds(spark):
    docs = _docs(spark, ["vector vector hash scan cache the the the"])
    out = T.symspell_candidates(
        docs, queries=["vektor", "hashh", "scann", "cach"]
    ).collect()
    got = {(r["query"], r["suggestion"]) for r in out}
    # substitution, deletion-of-typo-char, insertion-in-typo, deletion
    assert ("vektor", "vector") in got      # substitution
    assert ("hashh", "hash") in got         # extra char typed
    assert ("scann", "scan") in got
    assert ("cach", "cache") in got         # missing char typed
    # no suggestion may be more than 1 edit away or equal to the query
    for r in out:
        assert r["query"] != r["suggestion"]


def test_symspell_ranks_by_corpus_frequency(spark):
    # 'cat' (freq 3) beats 'car' (freq 1) for query 'caf'
    docs = _docs(spark, ["cat cat cat car"])
    out = T.symspell_candidates(docs, queries=["caf"]).collect()
    assert [r["suggestion"] for r in out] == ["cat", "car"]
    assert [r["rnk"] for r in out] == [1, 2]
