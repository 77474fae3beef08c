"""End-to-end curation pipeline composite — the north-star showcase.

One declared query chaining the curation stages a 100-TB training-data
build actually runs, in the order that minimizes work per stage:

  exact dedup (keep group keeper)           -- shuffle on content digest
  -> quality scoring + threshold            -- map-side expressions
  -> deterministic hash sampling            -- map-side predicate
  -> join to the embedding table            -- the only key shuffle

Each stage drops rows BEFORE the next pays for them: dedup halves
first, the quality gate is a pure scan-stage filter, sampling gates
before the join moves any data.  Every stage is an operator declared
elsewhere (dedup.py / text_analysis.py) — this module only composes,
proving the operators are pipeline-ready rather than demo-shaped.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text_analysis import hash_sample, token_quality


def exact_dedup_keepers(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep one row per distinct text: the group keeper (min id).
    Window form (rank over digest) so the full row survives without a
    self-join back."""
    w = Window.partitionBy(F.md5(F.col(text_col))).orderBy(F.col(id_col).asc())
    return (
        docs.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def hybrid_rrf(
    docs: DataFrame,
    emb: DataFrame,
    query: DataFrame,
    terms: list[str],
    k: int = 20,
    pool: int = 100,
    c: int = 60,
) -> DataFrame:
    """Hybrid retrieval: reciprocal-rank fusion of the vector k-NN list
    and the BM25 keyword list — score(id) = sum over lists of
    1/(c + rank), missing from a list contributes 0.

    Plan: both candidate lists are pool-sized (top-100), so the rank
    windows and the full-outer fusion join run on request-sized data —
    the corpus-scale work is exactly one k-NN scan + one BM25 pass,
    both already distributed.  This is the standard hybrid-search
    shape (vector recall + lexical precision) a retrieval stack runs
    on top of this engine."""
    from .knn import knn_topk
    from .text_analysis import bm25_search

    from .ranking import ranked_global

    vec = knn_topk(emb, query, pool, "sqL2")
    vecrank = ranked_global(
        vec, [F.col("dist").asc(), F.col("vec_id").asc()], rank_name="rv"
    ).select(F.col("vec_id").alias("id"), "rv")
    bm = bm25_search(docs, terms, pool)
    bmrank = ranked_global(
        bm, [F.col("score").desc(), F.col("doc_id").asc()], rank_name="rb"
    ).select(F.col("doc_id").alias("id"), "rb")
    fused = vecrank.join(bmrank, "id", "full_outer").select(
        "id",
        F.round(
            F.coalesce(F.lit(1.0) / (F.lit(c) + F.col("rv")), F.lit(0.0))
            + F.coalesce(F.lit(1.0) / (F.lit(c) + F.col("rb")), F.lit(0.0)),
            6,
        ).alias("rrf"),
    )
    return fused.orderBy(F.col("rrf").desc(), F.col("id").asc()).limit(k)


def curate(
    docs: DataFrame,
    emb: DataFrame,
    quality_floor: float = 0.15,
    sample_pct: int = 50,
) -> DataFrame:
    """dedup -> quality gate -> hash sample -> embedding join.
    Output: (doc_id, label, n_tokens, quality) — the curated training
    subset with its vectors attached."""
    uniq = exact_dedup_keepers(docs)
    scored = token_quality(uniq).filter(F.col("quality") >= quality_floor)
    sampled = hash_sample(scored, rates={}, default_rate=sample_pct, strata_col="doc_id")
    return (
        sampled.join(emb, sampled.doc_id == emb.vec_id)
        .select("doc_id", "label", "n_tokens", "quality")
    )
