"""Wave-52 operators: the Spark-4 surface — XML source, VARIANT
extraction, SQL pipe syntax, string collations."""

from __future__ import annotations

from pyspark.sql import functions as F

from simple_vector_spark import registry as REG


def test_xml_roundtrip_losslessness(spark, tmp_path):
    # markup-sensitive characters must survive the XML writer's
    # entity-escaping and come back byte-identical
    df = spark.createDataFrame(
        [(1, 'a <b> & "c"', 10), (2, "plain", 20)],
        "id long, txt string, v long",
    )
    path = str(tmp_path / "xml")
    (
        df.write.mode("overwrite")
        .option("rootTag", "rows")
        .option("rowTag", "row")
        .format("xml")
        .save(path)
    )
    back = (
        spark.read.option("rowTag", "row")
        .schema(df.schema)
        .format("xml")
        .load(path)
    )
    assert sorted(back.collect()) == sorted(df.collect())


def test_variant_extract_typed_and_missing(spark):
    df = spark.createDataFrame(
        [('{"k": 7}',), ('{"k": 0}',), ('{"other": 1}',), (None,)],
        "props string",
    )
    out = df.select(
        F.variant_get(F.try_parse_json("props"), "$.k", "long").alias("k")
    ).collect()
    vals = sorted((r["k"] for r in out), key=lambda x: (x is None, x))
    assert vals == [0, 7, None, None]


def test_pipe_syntax_matches_nested_form(spark, sf_dir):
    out = REG.sql_pipe_revenue(spark, sf_dir)
    assert set(out.columns) == {"o_orderpriority", "n_orders", "revenue"}
    rows = {r["o_orderpriority"]: r for r in out.collect()}
    # cross-check one group against the plain DataFrame form
    from simple_vector_spark.sources.loaders import load_table

    orders = load_table(spark, sf_dir, "orders")
    expect = (
        orders.filter(F.col("o_orderstatus") == "F")
        .groupBy("o_orderpriority")
        .count()
        .collect()
    )
    for r in expect:
        assert rows[r["o_orderpriority"]]["n_orders"] == r["count"]


def test_collated_equality_is_case_insensitive(spark):
    df = spark.createDataFrame(
        [("click",), ("CLICK",), ("Click",), ("clack",)], "s string"
    )
    n_ci = df.filter(
        F.collate(F.col("s"), "UTF8_LCASE")
        == F.collate(F.lit("cLiCk"), "UTF8_LCASE")
    ).count()
    n_exact = df.filter(F.col("s") == "cLiCk").count()
    assert n_ci == 3
    assert n_exact == 0


def test_transform_with_state_gate_or_run(spark, sf_dir):
    """transformWithStateInPandas: runs for real when protobuf is
    available; otherwise the operator must fail fast with the
    capability message (not crash mid-stream)."""
    import pytest

    from simple_vector_spark.streaming import jobs as J

    if not J.has_transform_with_state():
        with pytest.raises(RuntimeError, match="protobuf"):
            J.transform_with_state_totals(spark, sf_dir)
        pytest.skip("google.protobuf not installed in this runtime")
    out = J.transform_with_state_totals(spark, sf_dir)
    from simple_vector_spark.sources.loaders import load_table

    expect = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    got = {r["user_id"]: r["n"] for r in out.collect()}
    for r in expect:
        assert got[r["user_id"]] == r["n"]
