"""Validation (O2), centroid rollup, and the curation composite."""

from __future__ import annotations

from pyspark.sql import functions as F

from simple_vector_spark.operators import knn as K
from simple_vector_spark.operators import pipeline as P
from simple_vector_spark.operators import validate as V
from simple_vector_spark.sources.loaders import load_table


def test_validation_classifies_all_cases(spark):
    df = spark.createDataFrame(
        [
            (1, [0.1, 0.2]),
            (2, [0.1]),  # bad_dim
            (None, [0.1, 0.2]),  # null_id
            (4, None),  # null_vec
        ],
        "vec_id long, embedding array<float>",
    )
    rep = {r.status: r.n for r in V.validation_report(df, 2).collect()}
    assert rep == {"ok": 1, "bad_dim": 1, "null_id": 1, "null_vec": 1}
    ok = V.valid_rows(df, 2).collect()
    assert [r.vec_id for r in ok] == [1]


def test_label_centroid_topk_ranks_within_labels(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    out = K.label_centroid_topk(emb, 3).collect()
    by_label = {}
    for r in out:
        by_label.setdefault(r.label, []).append((r.rnk, r.dist))
    for label, rows in by_label.items():
        rows.sort()
        assert [rk for rk, _ in rows] == list(range(1, len(rows) + 1))
        dists = [d for _, d in rows]
        assert dists == sorted(dists)


def test_exact_dedup_keepers_keeps_min_id(spark):
    docs = spark.createDataFrame(
        [(1, "same"), (5, "same"), (3, "other")], "doc_id long, text string"
    )
    kept = sorted(r.doc_id for r in P.exact_dedup_keepers(docs).collect())
    assert kept == [1, 3]


def test_curate_stages_compose(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text", "source")
    emb = load_table(spark, sf_dir, "embeddings")
    out = P.curate(docs, emb, quality_floor=-10.0, sample_pct=100)
    # no-op gates -> every doc with an embedding survives
    assert out.count() == docs.join(emb, docs.doc_id == emb.vec_id).count()
    gated = P.curate(docs, emb, quality_floor=0.15, sample_pct=50)
    assert 0 < gated.count() < out.count()
