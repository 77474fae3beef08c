"""The two-phase global-rank helpers (operators/ranking.py) must be
value-identical to the single-partition window functions they replace,
and the rewritten queries must no longer contain the one plan shape
that cannot survive a 100x scale-up: a Sort or Window feeding off an
``Exchange SinglePartition``."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from simple_vector_spark.operators.ranking import (
    grouped_ntile,
    ntile_from_rank,
    ranked_global,
)
from simple_vector_spark.registry import queries

QS = queries()


def _mkdf(spark, n=97, groups=4):
    # deterministic pseudo-random values with ties, plus a unique tiebreak
    return spark.range(n).select(
        F.col("id"),
        (F.col("id") % groups).alias("g"),
        ((F.col("id") * 37) % 13).alias("v"),
    )


def test_ranked_global_matches_row_number(spark):
    df = _mkdf(spark)
    sort = [F.col("v").asc(), F.col("id").asc()]
    got = {
        r["id"]: r["rk"]
        for r in ranked_global(df, sort, rank_name="rk").collect()
    }
    want = {
        r["id"]: r["rk"]
        for r in df.withColumn(
            "rk", F.row_number().over(Window.orderBy(*sort)).cast("long")
        ).collect()
    }
    assert got == want


def test_ranked_global_grouped_matches_row_number(spark):
    df = _mkdf(spark)
    sort = [F.col("v").desc(), F.col("id").asc()]
    got = {
        r["id"]: (r["rk"], r["n"])
        for r in ranked_global(
            df, sort, group_cols=["g"], rank_name="rk", total_name="n"
        ).collect()
    }
    w = Window.partitionBy("g").orderBy(*sort)
    cw = Window.partitionBy("g")
    want = {
        r["id"]: (r["rk"], r["n"])
        for r in df.withColumn("rk", F.row_number().over(w).cast("long"))
        .withColumn("n", F.count("*").over(cw).cast("long"))
        .collect()
    }
    assert got == want


@pytest.mark.parametrize("n,k", [(1, 4), (3, 4), (10, 4), (97, 10), (25, 25), (7, 10)])
def test_ntile_from_rank_matches_spark_ntile(spark, n, k):
    df = spark.range(n)
    sort = [F.col("id").asc()]
    got = {
        r["id"]: r["t"]
        for r in grouped_ntile(df, sort, k, "t").collect()
    }
    want = {
        r["id"]: r["t"]
        for r in df.withColumn(
            "t", F.ntile(k).over(Window.orderBy(*sort)).cast("int")
        ).collect()
    }
    assert got == want


def test_grouped_ntile_matches_partitioned_ntile(spark):
    df = _mkdf(spark, n=83, groups=5)
    sort = [F.col("v").asc(), F.col("id").asc()]
    got = {
        r["id"]: r["t"]
        for r in grouped_ntile(df, sort, 4, "t", group_cols=["g"]).collect()
    }
    want = {
        r["id"]: r["t"]
        for r in df.withColumn(
            "t", F.ntile(4).over(Window.partitionBy("g").orderBy(*sort)).cast("int")
        ).collect()
    }
    assert got == want


# ---------------------------------------------------------------------------
# Plan audits: no Sort/Window riding a single-partition exchange.
# ---------------------------------------------------------------------------

_NODE = re.compile(r"(?:\*\(\d+\) )?(Sort |Window|WindowGroupLimit)")


def _single_partition_sort_parents(plan: str) -> list[str]:
    """Lines that are the tree-parent of an ``Exchange SinglePartition``
    and are a Sort/Window node.  A global aggregate above the exchange
    (partial -> final HashAggregate) is the legitimate user of
    SinglePartition and is not flagged."""
    lines = plan.splitlines()
    offenders = []
    for i, line in enumerate(lines):
        if "Exchange SinglePartition" not in line:
            continue
        off = len(line) - len(line.lstrip(" +-:"))
        for j in range(i - 1, -1, -1):
            poff = len(lines[j]) - len(lines[j].lstrip(" +-:"))
            if poff < off and lines[j].strip(" +-:"):
                if _NODE.match(lines[j].lstrip(" +-:")):
                    offenders.append(lines[j].strip())
                break
    return offenders


# every query the round-1 verdict graded "weak" for the single-partition
# window family, plus the helpers' other call sites
REWRITTEN = [
    "orders_pareto_share",
    "orders_rfm_segments",
    "orders_spend_gini",
    "order_value_distribution",
    "order_value_quartiles",
    "allocate_doc_ids",
    "vocab_zipf_slope",
    "hybrid_rrf_search",
    "tpch_q15_top_supplier",
]


@pytest.mark.parametrize("name", REWRITTEN)
def test_no_single_partition_window(spark, sf_dir, name):
    plan = QS[name](spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    offenders = _single_partition_sort_parents(plan)
    assert not offenders, f"{name}: global sort/window over SinglePartition: {offenders}"
