"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

Implementation lives in ``simple_vector_spark/``; the declared-query
registry is the ``simple_vector_spark/registry`` package (domain-named core parts + numbered extension-wave parts, imported in registration order).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from simple_vector_spark import registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: filtered batch k-NN —
    scan -> pushed-down filter -> broadcast query join -> windowed
    top-k (the reference's whole /search surface in one plan)."""
    from simple_vector_spark.operators import knn as K
    from simple_vector_spark.sources.loaders import load_table

    from pyspark.sql import functions as F

    sf_dir = "/root/testdata/sf0.001"
    emb = load_table(spark, sf_dir, "embeddings")
    out = K.knn_join(
        emb,
        emb.filter(F.col("vec_id") < registry.N_QUERIES),
        registry.BATCH_K,
        "sqL2",
        pred=K.ne_filter("label", registry.FILTER_LABEL),
    )
    return out.select("query_id", "vec_id", "dist", "rnk")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted => rows-only check)."""
    return registry.oracle_sql()
