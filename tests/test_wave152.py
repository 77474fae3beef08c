"""Wave-152 operators: URL parsing + canonicalization."""

from __future__ import annotations

from pyspark.sql import functions as F

from simple_vector_spark.operators import text_analysis as T


def _norm(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [
        r["n"] for r in df.select(T.normalize_url(F.col("url")).alias("n")).collect()
    ]


def test_normalize_url_case_port_www_fragment(spark):
    # host lowercased, www. and explicit port stripped, fragment gone
    out = _norm(spark, ["https://WWW.Site.COM:443/A/b?x=1#frag"])
    assert out == ["site.com/A/b?x=1"]


def test_normalize_url_drops_tracking_and_sorts_params(spark):
    a, b = _norm(
        spark,
        [
            "https://s.com/p?utm_source=x&b=2&a=1&utm_campaign=y",
            "https://s.com/p?a=1&b=2",
        ],
    )
    assert a == b == "s.com/p?a=1&b=2"


def test_normalize_url_distinguishes_meaningful_params(spark):
    a, b = _norm(spark, ["https://s.com/p?ref=1", "https://s.com/p?ref=2"])
    assert a != b


def test_doc_urls_formula_round_trips_through_parser(spark):
    docs = spark.createDataFrame(
        [(i, "t", "en", f"src{i % 3}", 1) for i in range(20)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    urls = T.doc_urls(docs)
    # every 5th doc carries :443; parse_url HOST must strip it
    hosts = urls.select(
        F.parse_url("url", F.lit("HOST")).alias("h"),
        F.col("url").contains(":443").alias("p"),
    ).collect()
    assert any(r["p"] for r in hosts)
    assert all(":443" not in r["h"] for r in hosts)


def test_url_normalize_audit_collapses_variants(spark):
    # 12 docs in one source: raw URLs all distinct (fragment cycles),
    # normalized keeps only (path-bucket, ref) -> fewer distinct.
    docs = spark.createDataFrame(
        [(i, "t", "en", "srcA", 1) for i in range(12)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    row = T.url_normalize_audit(docs).collect()[0]
    assert row["domain"] == "srca.example.com"
    assert row["n_urls"] == 12
    assert row["n_norm_distinct"] <= row["n_raw_distinct"]
    # doc_ids 0..11: path bucket = id%50 = id, so path is unique per
    # doc -> norm distinct = 12 here; force a collapse via id%50 wrap
    docs2 = spark.createDataFrame(
        [(i, "t", "en", "srcA", 1) for i in [0, 50, 100, 150]],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    row2 = T.url_normalize_audit(docs2).collect()[0]
    # ids 0/50/100/150: path bucket 0 always; ref = id%7 in {0,1,2,3};
    # ports differ (all %5==0 -> :443) but normalization strips them.
    assert row2["n_raw_distinct"] == 4
    assert row2["n_norm_distinct"] == 4  # ref still distinguishes
    docs3 = spark.createDataFrame(
        [(i, "t", "en", "srcA", 1) for i in [0, 1050, 2100]],  # id%7==0, %50==0
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    row3 = T.url_normalize_audit(docs3).collect()[0]
    assert row3["n_norm_distinct"] == 1
    assert abs(row3["collapse_share"] - (1 - 1 / row3["n_raw_distinct"])) < 1e-9
