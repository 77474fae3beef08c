"""SparkSession factory tuned for the test/bench environment.

Local mode (``local[N]``) is a single JVM; the configs below are chosen
so the same code is correct on a real cluster: AQE on (runtime re-plan,
skew-join handling), shuffle partitions sized to cores locally (on a
cluster you would size to ~2-3x total cores), UTC session timezone so
timestamps compare exactly against the DuckDB oracle, and Arrow enabled
for the Pandas-UDF paths.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "simple-vector-spark") -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = f"local[{cpus}]"
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    # local[N] is ONE JVM: shuffle/broadcast/cached-block bytes never
    # cross a network, so LZ4 framing is pure CPU overhead here
    # (measured 5-8% total, up to 1.8x on shuffle-heavy queries at
    # sf0.1).  Gated on the master actually being local so a future
    # cluster master keeps the defaults (ON) — there the shuffle is
    # network/disk-bound and compression wins.
    if master.startswith("local"):
        builder = (
            builder.config("spark.shuffle.compress", "false")
            .config("spark.shuffle.spill.compress", "false")
            .config("spark.rdd.compress", "false")
            .config("spark.broadcast.compress", "false")
        )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
