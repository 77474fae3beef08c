"""Wave-99 operators: WebDataset-style shard packing."""

from __future__ import annotations

from pyspark.sql import functions as F

from simple_vector_spark.operators import multimodal as MM


def _docs(spark, sizes, source="web"):
    rows = [(i, "x" * n, source) for i, n in enumerate(sizes)]
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_shard_pack_respects_capacity_accounting(spark):
    # 10 items of 100 bytes at capacity 250: packing is greedy by
    # bytes-before (floor(cum/250)) -> shards of 3,3,3,1 items.
    out = MM.shard_pack_audit(
        _docs(spark, [100] * 10), capacity=250, group_docs=1000
    ).collect()[0]
    assert out["n_items"] == 10
    assert out["n_bytes"] == 1000
    assert out["n_shards"] == 4
    assert out["n_over_capacity"] == 2  # the two 3x100=300-byte shards
    # 3 of 4 shards hold 300 bytes (> capacity); fill = 1000/(4*250)
    assert abs(out["fill_ratio"] - 1.0) < 1e-9


def test_shard_pack_oversize_item_gets_own_shard(spark):
    # A single 600-byte payload at capacity 250 starts its own shard
    # (bytes_before=0 -> shard 0) and the NEXT item starts shard 2.
    out = MM.shard_pack_audit(
        _docs(spark, [600, 50]), capacity=250, group_docs=1000
    ).collect()[0]
    assert out["n_shards"] == 2
    assert out["n_over_capacity"] == 1


def test_shard_pack_groups_bound_the_window(spark):
    # group_docs=2: ids {0,1} and {2,3} pack independently — the
    # bounded-window contract (no per-source global cumsum).
    out = MM.shard_pack_audit(
        _docs(spark, [200, 200, 200, 200]), capacity=250, group_docs=2
    ).collect()[0]
    # each group: item0 -> shard0, item1 (200 before) -> shard0? no:
    # floor(200/250)=0 -> same shard of 400 bytes; two groups -> 2 shards
    assert out["n_shards"] == 2
    assert out["n_items"] == 4


def test_shard_pack_sources_pack_independently(spark):
    a = _docs(spark, [100] * 4, "a")
    b = _docs(spark, [100] * 4, "b")
    out = {
        r["source"]: r
        for r in MM.shard_pack_audit(
            a.unionByName(b), capacity=200, group_docs=1000
        ).collect()
    }
    assert set(out) == {"a", "b"}
    assert out["a"]["n_shards"] == out["b"]["n_shards"] == 2
