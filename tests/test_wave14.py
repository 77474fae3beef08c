"""Wave-14 operators on hand-computed micro-fixtures: unigram-LM
quality scoring, BPE merge candidates, PCA power iteration, per-user
anomaly z-scores."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from simple_vector_spark.operators import ann as A
from simple_vector_spark.operators import events as E
from simple_vector_spark.operators import text_analysis as T


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_unigram_logprob_common_beats_rare(spark):
    # corpus: 'the' appears 6x, 'zyzzyva' once -> doc of common words
    # must score strictly higher than the doc holding the rare token
    docs = _docs(
        spark,
        [
            (1, "the the the"),
            (2, "the the zyzzyva"),
        ],
    )
    out = {r["doc_id"]: r for r in T.unigram_logprob(docs).collect()}
    assert out[1]["n_tokens"] == 3 and out[2]["n_tokens"] == 3
    assert out[1]["avg_logprob"] > out[2]["avg_logprob"]
    # exact: doc 1 = ln(5/6) avg; doc 2 = (2*ln(5/6) + ln(1/6)) / 3
    assert abs(out[1]["avg_logprob"] - round(math.log(5 / 6), 4)) < 1e-9
    expect2 = round((2 * math.log(5 / 6) + math.log(1 / 6)) / 3, 4)
    assert abs(out[2]["avg_logprob"] - expect2) < 1e-9


def test_bpe_pairs_counts_and_order(spark):
    # 'abab' -> ab, ba, ab ; 'ab' -> ab ; single char 'x' -> none
    docs = _docs(spark, [(1, "abab ab"), (2, "x")])
    rows = T.bpe_pair_candidates(docs, 10).collect()
    got = {r["pair"]: r["n"] for r in rows}
    assert got == {"ab": 3, "ba": 1}
    # order: count desc then pair asc
    assert [r["pair"] for r in rows] == ["ab", "ba"]


def test_pca_power_iter_finds_dominant_axis(spark):
    # variance concentrated on dim 0: power step from v0=ones must tilt
    # the direction overwhelmingly onto dim 0, and the output is unit-norm
    emb = spark.createDataFrame(
        [(i, [float(10 + (i % 3)), 0.1, 0.1, 0.1]) for i in range(12)],
        "vec_id long, embedding array<float>",
    )
    comp = {r["pos"]: r["component"] for r in A.pca_power_iteration(emb).collect()}
    assert set(comp) == {0, 1, 2, 3}
    norm = math.sqrt(sum(c * c for c in comp.values()))
    assert abs(norm - 1.0) < 1e-4
    assert comp[0] > 0.99
    assert all(abs(comp[d]) < 0.1 for d in (1, 2, 3))


def test_anomaly_zscore_flags_planted_outlier(spark):
    # user 1: nine 10.0s and one 100.0 -> the 100 is far beyond 2 sigma
    # user 2: constant stream -> std 0, no outliers
    rows = [(i, 1, 10.0) for i in range(9)] + [(9, 1, 100.0)]
    rows += [(100 + i, 2, 5.0) for i in range(4)]
    ev = spark.createDataFrame(rows, "event_id long, user_id long, value double")
    out = {r["user_id"]: r for r in E.value_anomaly_zscore(ev).collect()}
    assert out[1]["n_events"] == 10 and out[1]["n_outliers"] == 1
    assert abs(out[1]["mean_value"] - 19.0) < 1e-6
    assert out[2]["n_outliers"] == 0 and out[2]["std_value"] == 0.0
