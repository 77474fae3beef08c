"""Parquet sources for the driver fixtures.

The reference's only ingress is HTTP JSON (src/http_server.cc:14-38) and
its store is RocksDB (src/scalar_storage.cc:20-53); in the Spark engine
the source of truth is a columnar Parquet table per collection — the
scan IS the index input and the doc store at once (SURVEY.md §1.4).

At 100 TB the same loaders point at a partitioned table; everything
downstream is expressed against the DataFrame so partition pruning,
predicate pushdown and column pruning reach the scan via Catalyst.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # The engine's timestamp semantics are UTC (FIXTURES.md §C: the
    # DuckDB oracle sees naive/UTC timestamps).  The driver brings its
    # own session, so pin the session timezone here — every declared
    # query loads through this function.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    path = os.path.join(sf_dir, f"{name}.parquet")
    # Resolved-relation cache, stored ON the session object: every
    # spark.read.parquet re-lists the directory and re-reads footers for
    # schema — a driver-side job worth ~50-150 ms that the bench pays
    # ~2000x (514 queries x ~2 tables x 2 laps).  The fixture tables are
    # immutable for a session's lifetime and a DataFrame is an immutable
    # logical plan, so sharing is safe — but only WITHIN one session: a
    # DataFrame is bound to the SQLConf of the session that created it,
    # and spark.newSession() twins (same applicationId, private conf —
    # bloom_filter_join uses one) must not see each other's relations,
    # so the cache lives as an attribute that dies with its session.
    cache = getattr(spark, "_sv_relation_cache", None)
    if cache is None:
        cache = {}
        spark._sv_relation_cache = cache
    key = os.path.abspath(path)
    cached = cache.get(key)
    if cached is not None:
        return cached
    df = _read_table(spark, path, name)
    cache[key] = df
    return df


def _read_table(spark: SparkSession, path: str, name: str) -> DataFrame:
    if name == "events":
        # Fixture vintages differ on events.ts: some are nanosecond
        # parquet timestamps (which the Spark reader rejects — read as a
        # raw long and INTEGER-truncate to micros, matching DuckDB's
        # ns->us truncation), newer ones are plain us timestamps the
        # reader handles natively.  Adapt to whichever is on disk.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        # native-us fixtures arrive as TIMESTAMP_NTZ; normalize to the
        # session-UTC TimestampType every downstream operator was built
        # against (identical instants under the pinned UTC session tz)
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return spark.read.parquet(path)


def fan_out(df: DataFrame, min_ratio: float = 0.5) -> DataFrame:
    """Round-robin repartition to full core count when the scan produced
    too few splits to keep the cluster busy.

    The driver fixtures are single-row-group parquet files, so Spark's
    split planner (``spark.sql.files.maxPartitionBytes``) can only give
    1-2 tasks — per-row heavy work (MinHash, shingling, distance exprs)
    would then run on 2 of 32 cores.  On a real 100-TB table the scan
    itself yields thousands of splits and this is a no-op (the
    ``min_ratio`` guard), so no extra shuffle is paid at scale."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= max(1, int(target * min_ratio)):
        return df
    return df.repartition(target)


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every fixture table as a temp view (for the SQL API)."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs


def schema_evolution_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution ingest path: two parquet drops of the customer
    dimension written under one table directory with DIFFERENT schemas
    (the v2 drop adds c_acctbal), read back with mergeSchema — old
    rows surface the new column as NULL, exactly how a long-lived
    100-TB table accretes columns without rewriting history.

    The split is deterministic (even custkeys = v1 vintage, odd = v2)
    so the NULL pattern is oracle-expressible; the read itself proves
    the merged-footer path, not just the happy same-schema union."""
    import tempfile

    cust = load_table(spark, sf_dir, "customer")
    base = tempfile.mkdtemp(prefix="svs_evo_")
    cust.filter(F.col("c_custkey") % 2 == 0).select(
        "c_custkey", "c_nationkey"
    ).coalesce(1).write.mode("overwrite").parquet(base + "/v1")
    cust.filter(F.col("c_custkey") % 2 == 1).select(
        "c_custkey", "c_nationkey", "c_acctbal"
    ).coalesce(1).write.mode("overwrite").parquet(base + "/v2")
    merged = spark.read.option("mergeSchema", "true").option(
        "recursiveFileLookup", "true"
    ).parquet(base)
    return (
        merged.groupBy(F.col("c_nationkey").cast("int").alias("nationkey"))
        .agg(
            F.count("*").cast("bigint").alias("n_rows"),
            F.count("c_acctbal").cast("bigint").alias("n_with_bal"),
            F.round(
                F.sum(F.col("c_acctbal").cast("decimal(15,2)")).cast("double"), 2
            ).alias("sum_bal"),
        )
    )
