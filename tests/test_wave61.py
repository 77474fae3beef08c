"""Wave-61 operators: mixture epochs, malformed ingest, grouping_id."""

from __future__ import annotations

from pyspark.sql import functions as F

from simple_vector_spark.operators import curation as CU


def test_epoch_solver_caps_and_conserves(spark):
    # tiny source gets a big sqrt boost -> hits the epoch cap
    docs = spark.createDataFrame(
        [(1, "one two", "small")] + [(i, "a b c d e f g h", "big") for i in range(2, 200)],
        "doc_id long, text string, source string",
    )
    out = {r["source"]: r for r in CU.mixture_epoch_solver(docs).collect()}
    small, big = out["small"], out["big"]
    assert small["epochs"] <= CU.MIX_MAX_EPOCHS
    assert small["epochs_uncapped"] > small["epochs"]  # cap engaged
    assert small["forfeited_tokens"] > 0
    assert big["epochs"] < CU.MIX_MAX_EPOCHS
    assert big["forfeited_tokens"] == 0.0
    # weights sum to 1
    assert abs(sum(r["weight"] for r in out.values()) - 1.0) < 1e-5


def test_malformed_json_quarantined_not_fatal(spark, sf_dir):
    from simple_vector_spark import registry as REG

    out = {r["status"]: r for r in REG.json_malformed_audit(spark, sf_dir).collect()}
    assert out["corrupt"]["n_rows"] > 0
    assert out["corrupt"]["sum_chars"] is None  # fields nulled on corrupt rows
    assert out["ok"]["n_rows"] > out["corrupt"]["n_rows"]


def test_grouping_id_separates_subtotals_from_data(spark):
    orders = spark.createDataFrame(
        [(None, "P1"), ("F", "P1"), ("F", None)],
        "o_orderstatus string, o_orderpriority string",
    )
    rows = orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.grouping_id().cast("int").alias("gid"), F.count("*").alias("n")
    ).collect()
    # the (NULL, 'P1') DATA row has gid 0; the subtotal over status has
    # gid 2 — same NULL in o_orderstatus, different meaning
    data_null = [r for r in rows if r["o_orderstatus"] is None and r["o_orderpriority"] == "P1" and r["gid"] == 0]
    subtotal = [r for r in rows if r["o_orderpriority"] == "P1" and r["gid"] == 2]
    assert len(data_null) == 1 and data_null[0]["n"] == 1
    assert len(subtotal) == 1 and subtotal[0]["n"] == 2  # NULL + 'F'
