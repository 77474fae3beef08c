"""Round-9 optimization guards: the restructured operators must keep
their exact semantics (parity with the legacy forms) and their
improved plan shapes (no reintroduced explodes / windows / extra doc
joins)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from simple_vector_spark.operators import multimodal as MM
from simple_vector_spark.operators import text_analysis as T
from simple_vector_spark.sources.loaders import load_table

SF = "/root/testdata/sf0.001"


def _legacy_entropy_h6(docs):
    """The pre-r09 explode + (doc,byte) count + per-doc re-aggregate
    form of payload_entropy_sniff's per-doc h6 micro-bits, kept as the
    semantic reference for the array run-length-encode rewrite."""

    def l9(col):
        return F.round(F.log2(col.cast("double")), 9).cast("decimal(18,9)")

    payload = F.encode(F.col("text"), "UTF-8")
    base = docs.select(
        "doc_id",
        "source",
        F.substring(F.hex(payload), 1, 2 * MM.ENTROPY_PREFIX_BYTES).alias("hx"),
    )
    n = (F.length("hx") / 2).cast("int")
    bytes_ = base.filter(n > 0).select(
        "doc_id",
        "source",
        n.alias("nb"),
        F.explode(
            F.transform(
                F.sequence(F.lit(1), n),
                lambda i: F.substr(
                    F.col("hx"), (i - F.lit(1)) * F.lit(2) + F.lit(1), F.lit(2)
                ),
            )
        ).alias("b"),
    )
    cnt = bytes_.groupBy("doc_id", "source", "nb", "b").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    cl = (F.col("c").cast("decimal(9,0)") * l9(F.col("c"))).cast("decimal(28,9)")
    nbl = (F.col("nb").cast("decimal(9,0)") * l9(F.col("nb"))).cast(
        "decimal(28,9)"
    )
    return (
        cnt.select("doc_id", "source", "nb", cl.alias("cl"))
        .groupBy("doc_id", "source", "nb")
        .agg(F.sum("cl").cast("decimal(18,9)").alias("s"))
        .select(
            "doc_id",
            "source",
            ((nbl.cast("decimal(18,9)") - F.col("s")) * 1_000_000_000)
            .cast("decimal(38,0)")
            .alias("num_nanos"),
            "nb",
        )
        .select(
            "doc_id",
            "source",
            F.expr(
                "CAST((2 * num_nanos + 1000 * nb) DIV (2000 * nb) AS BIGINT)"
            ).alias("h6"),
        )
    )


def test_entropy_sniff_matches_legacy_explode_form(spark):
    """payload_entropy_sniff's final table must be row-identical to the
    explode/shuffle form's rollup — the per-doc run-length-encoded
    counts are the same multiset, so every exact-integer h6 matches."""
    docs = load_table(spark, SF, "documents")
    new = MM.payload_entropy_sniff(docs).collect()
    legacy_ent = _legacy_entropy_h6(docs)
    high_micros = int(round(MM.ENTROPY_HIGH_BITS * 1_000_000))
    old = (
        legacy_ent.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("h6").cast("decimal(38,0)").alias("_sm"),
            (F.max("h6").cast("double") / F.lit(1_000_000.0)).alias(
                "max_entropy_bits"
            ),
            F.sum((F.col("h6") > F.lit(high_micros)).cast("int"))
            .cast("long")
            .alias("n_high_entropy"),
        )
        .select(
            "source",
            "n_docs",
            (
                F.expr("CAST((2 * _sm + n_docs) DIV (2 * n_docs) AS BIGINT)")
                .cast("double")
                / F.lit(1_000_000.0)
            ).alias("avg_entropy_bits"),
            "max_entropy_bits",
            "n_high_entropy",
        )
        .orderBy("source")
        .collect()
    )
    assert sorted(map(tuple, new)) == sorted(map(tuple, old))


def test_entropy_sniff_plan_has_no_generate(spark):
    """The byte explode (Generate) and the two corpus-sized Exchanges
    must not come back: per-doc entropy is row-local arithmetic."""
    docs = load_table(spark, SF, "documents")
    plan = (
        MM.payload_entropy_sniff(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Generate" not in plan


def test_chargram_agreement_argmax_matches_window_form(spark):
    """The min-over-(-hits, plang)-structs argmax must pick exactly the
    row_number(hits desc, plang asc) == 1 row per doc."""
    docs = load_table(spark, SF, "documents")
    doc_grams = T._char_trigram_rows(docs, ["doc_id", "lang"]).localCheckpoint()
    lang_counts = doc_grams.groupBy("lang", "g").agg(
        F.count(F.lit(1)).alias("n")
    )
    wp = Window.partitionBy("lang").orderBy(F.col("n").desc(), F.col("g").asc())
    profiles = (
        lang_counts.withColumn("_r", F.row_number().over(wp))
        .filter(F.col("_r") <= T.CHARGRAM_TOP)
        .select(F.col("lang").alias("plang"), "g")
        .localCheckpoint()
    )
    scores = (
        doc_grams.join(F.broadcast(profiles), "g")
        .groupBy("doc_id", "plang")
        .agg(F.count(F.lit(1)).alias("hits"))
        .localCheckpoint()
    )
    new = scores.groupBy("doc_id").agg(
        F.min(
            F.struct((-F.col("hits")).alias("_nh"), F.col("plang").alias("_p"))
        )["_p"].alias("cg")
    )
    wd = Window.partitionBy("doc_id").orderBy(
        F.col("hits").desc(), F.col("plang").asc()
    )
    old = (
        scores.withColumn("_r", F.row_number().over(wd))
        .filter(F.col("_r") == 1)
        .select("doc_id", F.col("plang").alias("cg"))
    )
    assert sorted(map(tuple, new.collect())) == sorted(
        map(tuple, old.collect())
    )


def test_chargram_agreement_single_docs_scan(spark):
    """The fused spine (word prediction rides the join's left side)
    must keep exactly ONE parquet scan of documents — the former
    doc_id-spine scan and its extra join must not come back."""
    docs = load_table(spark, SF, "documents")
    plan = (
        T.chargram_langid_agreement(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Scan parquet") == 1
    assert "Window" not in plan
