"""Wave-39 operators: keep-best dedup, centroid classifier eval,
revenue forecast, vocab coverage curve."""

from __future__ import annotations

from pyspark.sql import functions as F

from simple_vector_spark.operators import dedup as D
from simple_vector_spark.operators import knn as K
from simple_vector_spark.operators import relational as R
from simple_vector_spark.operators import text_analysis as T


def test_keep_best_picks_highest_quality(spark):
    labels = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (10, 10), (11, 10)], "node long, cluster long"
    )
    scored = spark.createDataFrame(
        [(1, 0.2), (2, 0.9), (3, 0.5), (10, 0.4), (11, 0.4)],
        "doc_id long, quality double",
    )
    out = {r["cluster"]: r for r in D.cluster_keep_best(labels, scored).collect()}
    assert out[1]["keeper"] == 2 and out[1]["n_members"] == 3
    assert abs(out[1]["keeper_quality"] - 0.9) < 1e-9
    # tie on quality -> min node wins
    assert out[10]["keeper"] == 10 and out[10]["n_members"] == 2


def test_centroid_accuracy_separable_labels(spark):
    # two well-separated label blobs -> 100% accuracy for both
    rows = [(i, [0.0 + 0.01 * i, 0.0], 0) for i in range(5)] + [
        (10 + i, [5.0 + 0.01 * i, 5.0], 1) for i in range(5)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    out = {r["label"]: r for r in K.label_centroid_accuracy(emb).collect()}
    assert out[0]["accuracy"] == 1.0 and out[1]["accuracy"] == 1.0
    assert out[0]["n"] == 5 and out[0]["n_correct"] == 5


def test_centroid_accuracy_mislabeled_point(spark):
    # one label-1 point sits inside the label-0 blob -> misclassified
    rows = [(i, [0.0, 0.0 + 0.01 * i], 0) for i in range(5)] + [
        (10 + i, [5.0, 5.0 + 0.01 * i], 1) for i in range(4)
    ] + [(99, [0.0, 0.02], 1)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    out = {r["label"]: r for r in K.label_centroid_accuracy(emb).collect()}
    assert out[1]["n"] == 5 and out[1]["n_correct"] == 4
    assert abs(out[1]["accuracy"] - 0.8) < 1e-9


def test_forecast_recovers_exact_linear_trend(spark):
    # revenue = 100 + 10*t exactly -> slope 10, intercept 100
    import datetime as dt

    rows = []
    oid = 0
    for t in range(6):
        # month t has one order worth 100 + 10t
        d = dt.date(1992, 1 + t, 15)
        rows.append((oid, d, float(100 + 10 * t)))
        oid += 1
    orders = spark.createDataFrame(
        rows, "o_orderkey long, o_orderdate date, o_totalprice double"
    )
    r = R.monthly_revenue_forecast(orders).collect()[0]
    assert r["n"] == 6
    assert abs(r["slope"] - 10.0) < 1e-6
    assert abs(r["intercept"] - 100.0) < 1e-6
    assert abs(r["forecast_next"] - 160.0) < 1e-6


def test_vocab_coverage_monotone_and_exact(spark):
    docs = spark.createDataFrame(
        [(1, "a a a a b b c"), (2, "a b d")], "doc_id long, text string"
    )
    rows = {r["top_k"]: r for r in T.vocab_coverage_curve(docs, points=(1, 2, 10)).collect()}
    # a:5 b:3 c:1 d:1, total 10
    assert rows[1]["covered_tokens"] == 5 and abs(rows[1]["coverage"] - 0.5) < 1e-9
    assert rows[2]["covered_tokens"] == 8 and abs(rows[2]["coverage"] - 0.8) < 1e-9
    assert rows[10]["n_types"] == 4 and rows[10]["coverage"] == 1.0


def test_anova_identical_groups_f_zero(spark):
    import datetime as dt

    # same values every day -> SSB 0 -> F = 0, eta² = 0
    rows = [(i, dt.date(1995, 1, 1 + i % 7), 100.0) for i in range(70)]
    orders = spark.createDataFrame(
        rows, "o_orderkey long, o_orderdate date, o_totalprice double"
    )
    r = R.dow_revenue_anova(orders).collect()[0]
    assert r["n_groups"] == 7 and r["n_orders"] == 70
    assert r["f_stat"] is None and r["eta_sq"] == 0.0


def test_anova_strong_group_effect(spark):
    import datetime as dt

    # weekends pay 10x -> eta² near 1
    rows = []
    for i in range(140):
        d = dt.date(1995, 1, 1 + i % 14)
        price = (1000.0 if d.weekday() >= 5 else 100.0) + (i % 3)  # slight noise
        rows.append((i, d, price))
    orders = spark.createDataFrame(
        rows, "o_orderkey long, o_orderdate date, o_totalprice double"
    )
    r = R.dow_revenue_anova(orders).collect()[0]
    assert r["eta_sq"] > 0.95
    assert r["f_stat"] > 100


def test_weighted_sample_favors_heavy_docs(spark):
    from simple_vector_spark.operators import curation as CU

    # weight 1000 vs weight 1: heavy docs should dominate the sample
    docs = spark.createDataFrame(
        [(i, 1000 if i < 50 else 1) for i in range(500)],
        "doc_id long, n_chars long",
    )
    out = CU.weighted_sample_ares(docs, k=20)
    rows = out.collect()
    assert len(rows) == 20
    heavy = sum(1 for r in rows if r["weight"] == 1000)
    assert heavy >= 15  # 50 heavy docs at 1000x weight dominate
    # deterministic across runs
    again = CU.weighted_sample_ares(docs, k=20).collect()
    assert [r["doc_id"] for r in rows] == [r["doc_id"] for r in again]


def test_seasonal_decompose_pure_trend_is_flat(spark):
    import datetime as dt

    # pure linear trend, no seasonality -> every seasonal index ~0
    rows = []
    oid = 0
    for t in range(24):
        d = dt.date(1992 + t // 12, 1 + t % 12, 10)
        rows.append((oid, d, float(100 + 10 * t)))
        oid += 1
    orders = spark.createDataFrame(
        rows, "o_orderkey long, o_orderdate date, o_totalprice double"
    )
    out = R.seasonal_decompose(orders).collect()
    assert len(out) == 12
    for r in out:
        assert abs(r["seasonal"]) < 1e-6


def test_segment_migration_totals(spark, sf_dir):
    from simple_vector_spark.sources.loaders import load_table

    orders = load_table(spark, sf_dir, "orders")
    out = R.customer_segment_migration(orders).collect()
    total = sum(r["n_customers"] for r in out)
    import pyspark.sql.functions as F

    y1 = orders.filter(F.year("o_orderdate") == 1995).select("o_custkey").distinct()
    y2 = orders.filter(F.year("o_orderdate") == 1996).select("o_custkey").distinct()
    n_union = y1.union(y2).distinct().count()
    assert total == n_union
    assert not any(r["seg_from"] == "none" and r["seg_to"] == "none" for r in out)


def test_equidepth_histogram_contiguous_buckets(spark):
    rows = [(i, float(i)) for i in range(80)]
    orders = spark.createDataFrame(rows, "o_orderkey long, o_totalprice double")
    out = sorted(R.equidepth_histogram(orders).collect(), key=lambda r: r["bucket"])
    assert len(out) == 8
    assert all(r["n_rows"] == 10 for r in out)
    for prev, nxt in zip(out, out[1:]):
        assert prev["hi"] < nxt["lo"]  # non-overlapping, ordered
    assert float(out[0]["lo"]) == 0.0 and float(out[-1]["hi"]) == 79.0
