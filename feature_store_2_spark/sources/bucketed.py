"""Bucketed table storage — shuffle-free co-located joins.

Reference parity: the reference keeps every per-user structure in ONE
process's heap, so "co-location" is free (/root/reference/services/
user_feature.py:22, models/aggregate.py:50). At 100 TB the equivalent is
hash-bucketed storage: write both sides of a recurring join bucketed by
the join key into the same number of buckets, and every subsequent join
or aggregation on that key runs with ZERO shuffle — each task reads
bucket i of both tables. This is the storage-layer complement to
runtime `repartition`: pay the shuffle once at write time, amortize it
over every downstream query.

Spark specifics: `bucketBy(n, key)` + `saveAsTable` records bucket spec
in the catalog; the reader plans a sort-merge join with no Exchange when
bucket counts match (`spark.sql.sources.bucketing.enabled`, on by
default). `sortBy` within buckets additionally removes the per-task
Sort before the merge join.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    name: str,
    path: str,
    bucket_col: str,
    n_buckets: int,
    sort: bool = True,
) -> None:
    """Register ``df`` as external bucketed table ``name`` at ``path``.

    Idempotent: re-registers (DROP + overwrite) so repeated driver runs
    in one session are safe.
    """
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    writer = (
        df.write.mode("overwrite")
        .option("path", os.path.abspath(path))
        .bucketBy(n_buckets, bucket_col)
    )
    if sort:
        writer = writer.sortBy(bucket_col)
    writer.saveAsTable(name)


def bucketed_pair(
    spark: SparkSession,
    left: DataFrame,
    right: DataFrame,
    left_name: str,
    right_name: str,
    root: str,
    left_key: str,
    right_key: str,
    n_buckets: int = 8,
) -> tuple[DataFrame, DataFrame]:
    """Materialize two DataFrames bucketed on their join keys (same
    bucket count) and return the catalog-backed readers whose join on
    those keys is shuffle-free."""
    write_bucketed(left, left_name, os.path.join(root, left_name), left_key, n_buckets)
    write_bucketed(
        right, right_name, os.path.join(root, right_name), right_key, n_buckets
    )
    return spark.table(left_name), spark.table(right_name)


def physical_plan(df: DataFrame) -> str:
    """Formatted physical plan string (for shuffle audits in tests)."""
    spark = df.sparkSession
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
