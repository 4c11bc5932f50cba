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

    The events table stores TIMESTAMP(NANOS), which Spark's vectorized
    parquet reader rejects; we read nanos as long (runtime conf) and
    rebuild the timestamp. The testdata's nanos are all exactly
    microsecond-aligned, so the conversion is lossless.
    """
    if name not in TABLES:
        raise ValueError(f"unknown table {name!r}; expected one of {TABLES}")
    sf_dir = sf_dir or os.environ.get("SPARK_GRAFT_SF_DIR", DEFAULT_SF_DIR)
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if dict(df.dtypes).get("ts") == "bigint":
            from pyspark.sql import functions as F

            # integer div: ns values (~1.7e18) overflow double precision
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def register_views(spark: SparkSession, sf_dir: str | None = None) -> None:
    """Register every table as a temp view so SQL-form queries work."""
    for name in TABLES:
        load_table(spark, name, sf_dir).createOrReplaceTempView(name)
