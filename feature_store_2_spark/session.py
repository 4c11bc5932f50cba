"""SparkSession factory.

Local-mode defaults tuned for the test harness (local[N], single JVM)
while keeping every setting cluster-safe: AQE handles runtime re-planning
(skew joins, partition coalescing) on a real cluster exactly as it does
locally, and shuffle-partition count is only a starting hint once AQE is
on.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "feature_store_2_spark") -> SparkSession:
    """Build (or reuse) the engine's SparkSession.

    Scale notes: on a real cluster, ``master``/memory come from
    spark-submit and these ``local[*]`` defaults are ignored; the
    sql-conf block below is what matters at 100 TB — AQE on (runtime
    skew-join handling + post-shuffle coalescing), partition-size caps
    so scans parallelize, and Arrow for any Pandas-UDF exchange.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(max(int(cpus) * 2, 8)))
        # Split large parquet files so scans parallelize even with few files.
        .config("spark.sql.files.maxPartitionBytes", "32m")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Shuffle compression stays on the lz4 default: zstd was
        # measured both ways (BENCH_NOTES 9b) — at the 100x replica it
        # cuts shuffle bytes ~40% and wall 19% on the spill-bound
        # graph entry, but at sf0.1 the CPU overhead costs ~9% total
        # bench time for zero benefit (small shuffles never touch
        # disk). On a real cluster submit with
        # --conf spark.io.compression.codec=zstd for shuffle-heavy
        # dedup/graph jobs; the bytes cut is network, the scarcest
        # 100 TB resource.
        .config("spark.ui.enabled", "false")
    )
    if not os.environ.get("SPARK_GRAFT_ON_CLUSTER"):
        builder = builder.master(f"local[{cpus}]").config(
            "spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g")
        )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
