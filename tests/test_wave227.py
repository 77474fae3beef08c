"""Wave-227: streaming dead-letter split (batch-rule equivalence)."""

from __future__ import annotations

from pyspark.sql import functions as F

from simple_vector_spark.functions.text import md5_int


def test_dlq_gate_rule_consistency(spark):
    # the parse gate quarantines exactly the truncated-props rows:
    # verify the rule the stream applies, batch-side, on planted rows
    df = spark.createDataFrame(
        [(1, '{"k": 5}'), (2, '{"k'), (3, '{"x": 1}'), (4, "{}")],
        "event_id long, props string",
    )
    gated = df.withColumn(
        "ok",
        F.from_json(F.col("props"), "k INT").isNotNull()
        & F.get_json_object(F.col("props"), "$.k").isNotNull(),
    )
    out = {r["event_id"]: r["ok"] for r in gated.collect()}
    assert out[1] is True          # valid with k
    assert out[2] is False         # truncated json
    assert out[3] is False         # valid json, missing k
    assert out[4] is False         # empty object, missing k


def test_dlq_poison_gate_rate(spark):
    # the md5 injection gate hits a stable, small share of ids
    ids = spark.range(10000).select(F.col("id").cast("string").alias("s"))
    n = ids.filter(md5_int(F.col("s")) % 19 == 0).count()
    assert 350 < n < 700  # ~1/19 of 10k
