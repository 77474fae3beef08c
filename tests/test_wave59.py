"""Wave-59 operators: CEP negation, RM3 expansion, table fingerprints."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from simple_vector_spark.operators import events as E
from simple_vector_spark.operators import text_analysis as T
from simple_vector_spark.operators import validate as V


def _ev(uid, minute, etype, eid):
    return (eid, datetime.datetime(2024, 1, 1, 10, minute), uid, etype)


def test_negation_pattern_semantics(spark):
    rows = [
        # u1: view -> purchase, clean           -> matches no-error path
        _ev(1, 0, "view", 1), _ev(1, 5, "purchase", 2),
        # u2: view -> error -> purchase         -> negation kills it
        _ev(2, 0, "view", 3), _ev(2, 2, "error", 4), _ev(2, 5, "purchase", 5),
        # u3: error, never purchases            -> error_never_recovered
        _ev(3, 0, "error", 6), _ev(3, 2, "view", 7),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    out = {r["pattern"]: r["n_users"] for r in E.sequence_pattern_negation(ev).collect()}
    assert out["view_then_purchase_no_error"] == 1  # only u1
    assert out["error_never_recovered"] == 1        # only u3 (u2 recovered)


def test_rm3_excludes_query_terms_and_ranks(spark):
    docs = spark.createDataFrame(
        [
            (1, "vector scan apple apple apple"),
            (2, "vector hash banana"),
            (3, "unrelated words only here"),
        ],
        "doc_id long, text string",
    )
    out = T.rm3_expansion(docs, ["vector", "hash", "scan"], n_feedback=2, k=3).collect()
    terms = [r["term"] for r in out]
    assert "vector" not in terms and "hash" not in terms and "scan" not in terms
    assert terms[0] == "apple"  # dominates tf in the top feedback doc


def test_fingerprint_order_insensitive_and_sensitive_to_change(spark):
    a = spark.createDataFrame([(1, "x"), (2, "y")], "k long, v string")
    b = spark.createDataFrame([(2, "y"), (1, "x")], "k long, v string")
    c = spark.createDataFrame([(1, "x"), (2, "z")], "k long, v string")
    cols = [F.col("k").cast("string"), F.col("v")]
    fa = V.table_fingerprint(a, cols, "t").collect()[0]
    fb = V.table_fingerprint(b, cols, "t").collect()[0]
    fc = V.table_fingerprint(c, cols, "t").collect()[0]
    assert fa["fingerprint"] == fb["fingerprint"]  # row order irrelevant
    assert fa["fingerprint"] != fc["fingerprint"]  # content change detected
    assert fa["n_rows"] == 2
