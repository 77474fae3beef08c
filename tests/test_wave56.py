"""Wave-56 operators: recursive CTE BFS, SQL UDF, parameterized SQL,
Levenshtein matching."""

from __future__ import annotations

from pyspark.sql import functions as F

from simple_vector_spark import registry as REG


def test_recursive_bfs_hop_semantics(spark):
    # chain 0->1->2->3 plus a shortcut 0->2: min_hops(0,3)=2 via
    # shortcut; enumerated paths to 3 from 0 within 3 hops = 2
    spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (0, 2)], "src long, dst long"
    ).createOrReplaceTempView("edges")
    out = {
        (r["src"], r["dst"]): r
        for r in spark.sql(
            f"WITH RECURSIVE {REG._BFS_RECURSIVE_SQL}"
        ).collect()
    }
    assert out[(0, 3)]["min_hops"] == 2
    assert out[(0, 3)]["n_paths"] == 2  # 0-2-3 and 0-1-2-3
    assert out[(0, 1)]["min_hops"] == 1
    assert (0, 0) not in out  # no cycles in this DAG
    # hop bound respected: nothing beyond 3 hops can appear
    assert all(r["min_hops"] <= REG.BFS_MAX_HOPS for r in out.values())


def test_sql_udf_matches_inline_case(spark, sf_dir):
    out = {r["band"]: r["n_orders"] for r in REG.sql_udf_price_band(spark, sf_dir).collect()}
    from simple_vector_spark.sources.loaders import load_table

    orders = load_table(spark, sf_dir, "orders")
    p = F.col("o_totalprice").cast("decimal(15,2)")
    inline = {
        r["band"]: r["n"]
        for r in orders.select(
            F.when(p > 200000, "high").when(p > 100000, "mid").otherwise("low").alias("band")
        )
        .groupBy("band")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert out == inline


def test_param_query_binds_literals(spark, sf_dir):
    out = REG.sql_param_filter(spark, sf_dir)
    from simple_vector_spark.sources.loaders import load_table

    orders = load_table(spark, sf_dir, "orders")
    expect = (
        orders.filter(
            (F.col("o_orderstatus") == REG.PARAM_STATUS)
            & (F.col("o_totalprice").cast("double") >= REG.PARAM_MIN_PRICE)
        ).count()
    )
    assert sum(r["n"] for r in out.collect()) == expect


def test_levenshtein_blocked_pairs(spark):
    part = spark.createDataFrame(
        [
            (1, "misty olive salmon", "B1", "T", 5),
            (2, "misty olive salmot", "B1", "T", 5),   # 1 edit
            (3, "completely other name", "B1", "T", 5),
            (4, "misty olive salmon", "B2", "T", 5),   # other block
        ],
        "p_partkey long, p_name string, p_brand string, p_type string, p_size int",
    )
    part.createOrReplaceTempView("_unused")
    from simple_vector_spark.registry import LEV_MAX

    a = part.select(
        F.col("p_partkey").alias("pa"), F.col("p_name").alias("na"),
        "p_brand", "p_type", "p_size",
    )
    b = part.select(
        F.col("p_partkey").alias("pb"), F.col("p_name").alias("nb"),
        "p_brand", "p_type", "p_size",
    )
    lev = F.levenshtein(F.col("na"), F.col("nb"))
    out = {
        (r["pa"], r["pb"]): r["lev"]
        for r in a.join(b, ["p_brand", "p_type", "p_size"])
        .filter(F.col("pa") < F.col("pb"))
        .filter(lev <= LEV_MAX)
        .select("pa", "pb", lev.cast("int").alias("lev"))
        .collect()
    }
    assert out[(1, 2)] == 1
    assert (1, 4) not in out   # blocked away by brand
    assert (1, 3) not in out   # distance above threshold
