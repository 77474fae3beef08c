"""Wave-126 operators: LSA dominant topic axis."""

from __future__ import annotations

from simple_vector_spark.operators import text_analysis as T


def test_lsa_axis_tracks_dominant_topic(spark):
    # 4 kernel docs, 2 cooking docs, 6 unique-noise docs: the kernel
    # cluster has both multiplicity and tf-weight, so the dominant
    # singular direction is its vocabulary.  (Topic terms must NOT
    # appear in most docs — idf would zero them out.)
    rows = [(i, "kernel kernel scheduler memory interrupt paging", "s")
            for i in range(4)]
    rows += [(10, "saffron braising shallots reduction", "s"),
             (11, "saffron braising shallots reduction", "s")]
    rows += [(20 + i, f"noise{i}a noise{i}b noise{i}c", "s") for i in range(6)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = T.lsa_power_iteration(docs, topk=3).collect()
    top_terms = {r["term"] for r in out}
    assert top_terms <= {"kernel", "scheduler", "memory", "interrupt", "paging"}
    # loadings are a unit-normalized nonnegative direction
    assert all(0 <= r["loading"] <= 1 for r in out)


def test_lsa_is_deterministic(spark, sf_dir):
    from simple_vector_spark.sources.loaders import load_table

    docs = load_table(spark, sf_dir, "documents")
    a = T.lsa_power_iteration(docs).collect()
    b = T.lsa_power_iteration(docs).collect()
    assert a == b
    assert len(a) == T.LSA_TOPK
