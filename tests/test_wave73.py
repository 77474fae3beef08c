"""Wave-73: Arrow IPC custom source, Hamming recall curve."""

from __future__ import annotations

from pyspark.sql import functions as F

from simple_vector_spark.sources.arrow_ipc_source import (
    ArrowIpcDataSource,
    write_arrow_ipc,
)


def test_arrow_ipc_roundtrip_exact(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, [float(i), float(i) * 0.5], f"s{i % 3}") for i in range(100)],
        "vec_id long, embedding array<double>, tag string",
    ).repartition(4)
    out = str(tmp_path / "ipc")
    n = write_arrow_ipc(df, out)
    assert n == 100
    try:
        spark.dataSource.register(ArrowIpcDataSource)
    except Exception:
        pass  # already registered in this session
    back = (
        spark.read.format("arrow_ipc")
        .schema(df.schema)
        .option("path", out)
        .load()
    )
    assert back.count() == 100
    def key(r):
        return (r["vec_id"], tuple(r["embedding"]), r["tag"])

    a = {key(r) for r in df.collect()}
    b = {key(r) for r in back.collect()}
    assert a == b


def test_hamming_recall_curve_monotone(spark, sf_dir):
    from simple_vector_spark import registry as REG

    rows = {r["shortlist"]: r for r in REG.ann_hamming_recall_curve(spark, sf_dir).collect()}
    assert sorted(rows) == sorted(REG.HAMMING_CURVE_RS)
    recalls = [rows[r]["recall"] for r in sorted(rows)]
    # a larger shortlist can only help
    assert recalls == sorted(recalls)
    assert all(0.0 <= x <= 1.0 for x in recalls)
