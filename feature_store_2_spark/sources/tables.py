"""Batch sources: the driver's parquet star schema.

Equivalent of the reference's ingest surface (app.py:17-44 accepts one
event at a time over HTTP); here the batch materialization is a parquet
scan, which at 100 TB is where Catalyst's predicate pushdown, column
pruning and partition pruning do the heavy lifting — so loading stays a
bare declarative ``spark.read.parquet`` with no eager caching.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

DEFAULT_SF_DIR = "/root/testdata/sf0.001"

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

# Dimension tables small enough to broadcast at any realistic scale
# (region=5 rows, nation=25 rows; supplier/part grow with SF but stay
# orders of magnitude under fact tables).
BROADCAST_DIMS = frozenset({"region", "nation"})


def load_table(spark: SparkSession, name: str, sf_dir: str | None = None) -> DataFrame:
    """Read one testdata table. Declarative scan — filters/projections
    applied by callers push down into this parquet read.

    Timestamp normalization for ``events.ts``: the parquet stores
    ``Timestamp(isAdjustedToUTC=false)`` micros, which Spark ≥4.x reads
    as TIMESTAMP_NTZ. Downstream operators use instant functions
    (``unix_micros``, numeric casts, range frames) that require
    TIMESTAMP, so we cast once here. The session time zone is pinned UTC
    (session.py), making the cast value-identical — same wall-clock
    field values, same epoch micros. Older runtimes that surfaced the
    column as nanos-as-long get the equivalent rebuild.
    """
    if name not in TABLES:
        raise ValueError(f"unknown table {name!r}; expected one of {TABLES}")
    sf_dir = sf_dir or os.environ.get("SPARK_GRAFT_SF_DIR", DEFAULT_SF_DIR)
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        ts_type = dict(df.dtypes).get("ts")
        from pyspark.sql import functions as F

        if ts_type == "bigint":
            # integer div: ns values (~1.7e18) overflow double precision
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def register_views(spark: SparkSession, sf_dir: str | None = None) -> None:
    """Register every table as a temp view so SQL-form queries work."""
    for name in TABLES:
        load_table(spark, name, sf_dir).createOrReplaceTempView(name)
