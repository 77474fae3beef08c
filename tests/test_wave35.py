"""Wave-35 operators: blocked k-NN graph, daily autocorrelation,
nation-trade PageRank."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from simple_vector_spark.operators import ann as A
from simple_vector_spark.operators import events as E
from simple_vector_spark.operators import relational as R


def test_knn_graph_blocked_stays_in_cell(spark):
    # two tight clusters around (0,0) and (10,10); centroids = members
    # of each cluster -> cells split the clusters; every neighbor edge
    # must stay within the source's cluster.
    rows = []
    for i in range(5):
        rows.append((i, [0.0 + i * 0.01, 0.0], 0))
    for i in range(5, 10):
        rows.append((i, [10.0 + i * 0.01, 10.0], 1))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    cells = A.with_cells(emb, A.fit_vectors(emb, [0, 5]))
    out = A.knn_graph_blocked(cells, k=2).collect()
    assert len(out) == 20  # 10 nodes x 2 neighbors
    for r in out:
        same = (r["vec_id"] < 5) == (r["nbr_id"] < 5)
        assert same, r
        assert r["rnk"] in (1, 2)
        assert r["dist"] >= 0


def test_daily_autocorr_weekly_cycle(spark):
    # 8 weeks of a strict 7-day pattern: lag-7 correlation is exactly 1;
    # the pattern is chosen so lag-1 is far below 1.
    pattern = [5, 1, 1, 1, 1, 1, 9]
    rows = []
    base = dt.datetime(2024, 1, 1)
    for day in range(56):
        for i in range(pattern[day % 7]):
            rows.append((day * 1000 + i, base + dt.timedelta(days=day, hours=i % 24)))
    ev = spark.createDataFrame(rows, "event_id long, ts timestamp")
    out = {r["lag"]: r for r in E.daily_autocorrelation(ev).collect()}
    assert out[7]["autocorr"] == 1.0
    assert out[7]["n_pairs"] == 49
    assert out[1]["autocorr"] < 0.5
    assert out[1]["n_pairs"] == 55


def test_pagerank_mass_and_determinism(spark, sf_dir):
    from simple_vector_spark.sources.loaders import load_table

    args = [
        load_table(spark, sf_dir, t)
        for t in ("lineitem", "orders", "customer", "supplier", "nation")
    ]
    r1 = {r["nation"]: r["pagerank"] for r in R.nation_trade_pagerank(*args).collect()}
    assert len(r1) == 25
    assert all(v > 0 for v in r1.values())
    # dangling mass may leak but total never exceeds 1
    assert sum(r1.values()) <= 1.0 + 1e-6
    # deterministic across runs (fixed iterations + per-iteration ROUND)
    r2 = {r["nation"]: r["pagerank"] for r in R.nation_trade_pagerank(*args).collect()}
    assert r1 == r2
